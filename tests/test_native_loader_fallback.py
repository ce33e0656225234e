"""NativeJpegLoader's mixed-content path: a batch containing a non-JPEG
image (PNG under a .png extension — ImageFolder accepts it, libjpeg does
not) must fall back to the dataset's PIL transform for that item and stay
float-identical to the pure-PIL DataLoader."""
import os
import tempfile

import numpy as np
import pytest
from PIL import Image

pytest.importorskip("diffvit_tpu.data.native_decode")

from diffvit_tpu.data.imagenet import (DataLoader, ImageFolder,  # noqa: E402
                                       NativeJpegLoader, build_transform)
from diffvit_tpu.data.synthetic import make_fake_imagefolder  # noqa: E402


def test_native_loader_falls_back_on_non_jpeg():
    from diffvit_tpu.data import native_decode

    try:
        native_decode.load_library()
    except Exception as e:
        pytest.skip(f"native decode unavailable: {e}")
    rng = np.random.default_rng(0)
    with tempfile.TemporaryDirectory() as root:
        make_fake_imagefolder(root, num_classes=2, per_class=3, size=256)
        # drop a PNG into class 0 — decodable by PIL, rejected by libjpeg
        cls = sorted(os.listdir(root))[0]
        arr = rng.integers(0, 256, (250, 270, 3), dtype=np.uint8)
        Image.fromarray(arr, "RGB").save(
            os.path.join(root, cls, "odd_one.png"))
        ds = ImageFolder(root, build_transform())
        ref = list(DataLoader(ds, batch_size=4, num_workers=2))
        got = list(NativeJpegLoader(ds, batch_size=4))
        assert len(got) == len(ref)
        for (gi, gl), (ri, rl) in zip(got, ref):
            np.testing.assert_array_equal(gl, rl)
            np.testing.assert_array_equal(gi, ri)


def test_native_loader_derives_and_validates_transform_params():
    from diffvit_tpu.data import native_decode

    try:
        native_decode.load_library()
    except Exception as e:
        pytest.skip(f"native decode unavailable: {e}")
    with tempfile.TemporaryDirectory() as root:
        make_fake_imagefolder(root, num_classes=1, per_class=2, size=64)
        # non-default transform: loader must DERIVE matching kw from it
        tf = build_transform(mean=(0.5, 0.5, 0.5), std=(0.5, 0.5, 0.5),
                             crop_pct=0.9)
        ds = ImageFolder(root, tf)
        loader = NativeJpegLoader(ds, batch_size=2)
        assert loader.kw["crop_pct"] == 0.9
        assert loader.kw["mean"] == (0.5, 0.5, 0.5)
        ref = list(DataLoader(ds, batch_size=2, num_workers=1))
        got = list(loader)
        np.testing.assert_array_equal(got[0][0], ref[0][0])
        # explicit kwargs that contradict the dataset transform must raise
        with pytest.raises(ValueError, match="disagrees"):
            NativeJpegLoader(ds, batch_size=2, crop_pct=0.875)
        # non-bicubic transforms are outside the native pipeline
        ds2 = ImageFolder(root, build_transform(interpolation="bilinear"))
        with pytest.raises(ValueError, match="bicubic"):
            NativeJpegLoader(ds2, batch_size=2)
