"""NativeJpegLoader vs the PIL DataLoader: float-identical batches on a
fake JPEG ImageFolder (the hermetic integration backend)."""
import tempfile

import numpy as np
import pytest

pytest.importorskip("diffvit_tpu.data.native_decode")

from diffvit_tpu.data.imagenet import (DataLoader, ImageFolder,  # noqa: E402
                                       NativeJpegLoader, build_transform)
from diffvit_tpu.data.synthetic import make_fake_imagefolder  # noqa: E402


def test_native_loader_matches_pil_loader():
    from diffvit_tpu.data import native_decode

    try:
        native_decode.load_library()
    except Exception as e:
        pytest.skip(f"native decode unavailable: {e}")
    with tempfile.TemporaryDirectory() as root:
        make_fake_imagefolder(root, num_classes=3, per_class=4, size=256)
        ds = ImageFolder(root, build_transform())
        ref = list(DataLoader(ds, batch_size=5, num_workers=2))
        got = list(NativeJpegLoader(ds, batch_size=5))
        assert len(got) == len(ref)
        for (gi, gl), (ri, rl) in zip(got, ref):
            np.testing.assert_array_equal(gl, rl)
            np.testing.assert_array_equal(gi, ri)
