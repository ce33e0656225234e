"""Native (C++) preprocessing vs the PIL reference path — bit parity."""
import numpy as np
import pytest
from PIL import Image

from diffvit_tpu.data.imagenet import build_transform

native = pytest.importorskip("diffvit_tpu.data.native_preproc")

try:
    native.load_library()
    HAVE_LIB = True
except Exception as e:  # pragma: no cover - toolchain missing
    HAVE_LIB = False

pytestmark = pytest.mark.skipif(not HAVE_LIB, reason="g++ build failed")


@pytest.mark.parametrize("shape", [(300, 400), (400, 300), (224, 224),
                                   (257, 311), (120, 500)])
def test_native_matches_pil_bicubic(shape, rng):
    h, w = shape
    rgb = rng.integers(0, 256, size=(h, w, 3)).astype(np.uint8)
    img = Image.fromarray(rgb)

    pil_tf = build_transform(crop_pct=0.875)
    ref = pil_tf(img)
    got = native.preprocess_array(rgb, crop_pct=0.875)
    # identical uint8 resample -> identical floats
    np.testing.assert_array_equal(got, ref)


def test_native_batch(rng):
    imgs = [rng.integers(0, 256, size=(rng.integers(200, 400),
                                       rng.integers(200, 400), 3)
                         ).astype(np.uint8) for _ in range(5)]
    out = native.preprocess_batch(imgs)
    assert out.shape == (5, 3, 224, 224)
    ref0 = native.preprocess_array(imgs[0])
    np.testing.assert_array_equal(out[0], ref0)


def test_native_vit_constants(rng):
    rgb = rng.integers(0, 256, size=(300, 280, 3)).astype(np.uint8)
    ref = build_transform(mean=(0.5,) * 3, std=(0.5,) * 3, crop_pct=0.9)(
        Image.fromarray(rgb))
    got = native.preprocess_array(rgb, crop_pct=0.9, mean=(0.5,) * 3,
                                  std=(0.5,) * 3)
    np.testing.assert_array_equal(got, ref)
