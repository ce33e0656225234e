"""DCT-scaled fast decode (native/decode.cpp jpeg_decode_preprocess_fast):
decodes near the resample target via libjpeg scale_num/scale_denom, then
the exact-Pillow resample/crop/normalize.  Explicitly non-bit-exact vs the
full decode on large images — but must be CLOSE (same content), must fall
back to the exact path when no downscale applies (short side <= target),
and batch/fast flags must route correctly."""
import os
import tempfile

import numpy as np
import pytest

pytest.importorskip("diffvit_tpu.data.native_decode")

from diffvit_tpu.data import native_decode  # noqa: E402


@pytest.fixture(scope="module")
def lib():
    try:
        native_decode.load_library()
    except Exception as e:
        pytest.skip(f"native decode unavailable: {e}")
    return native_decode


def test_fast_close_to_exact_on_large_image(lib, smooth_jpeg):
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "big.jpg")
        smooth_jpeg(p, 1024, 768)
        exact = lib.decode_preprocess(p)
        fast = lib.decode_preprocess(p, fast=True)
        assert exact.shape == fast.shape == (3, 224, 224)
        # scaled decode differs from full decode, but only slightly
        assert not np.array_equal(exact, fast)
        # normalized units (std ~0.225): 0.05 ~= 1.1% of the pixel range
        assert np.abs(exact - fast).mean() < 0.05
        corr = np.corrcoef(exact.reshape(-1), fast.reshape(-1))[0, 1]
        assert corr > 0.998, corr


def test_fast_equals_exact_when_no_downscale_applies(lib, smooth_jpeg):
    # short side below resize target (256) -> scale stays 8/8 -> the fast
    # path IS the exact path
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "small.jpg")
        smooth_jpeg(p, 300, 200)
        np.testing.assert_array_equal(lib.decode_preprocess(p),
                                      lib.decode_preprocess(p, fast=True))


def test_fast_batch_matches_per_item(lib, smooth_jpeg):
    with tempfile.TemporaryDirectory() as d:
        paths = []
        for i, (w, h) in enumerate([(1024, 768), (640, 480), (300, 200)]):
            p = os.path.join(d, f"im{i}.jpg")
            smooth_jpeg(p, w, h, seed=i)
            paths.append(p)
        batch = lib.decode_preprocess_batch(paths, fast=True)
        for i, p in enumerate(paths):
            np.testing.assert_array_equal(
                batch[i], lib.decode_preprocess(p, fast=True))
        # and the default batch stays the exact mode
        exact_batch = lib.decode_preprocess_batch(paths)
        np.testing.assert_array_equal(
            exact_batch[0], lib.decode_preprocess(paths[0]))


def test_native_loader_fast_mode(lib, smooth_jpeg):
    from diffvit_tpu.data.imagenet import (ImageFolder, NativeJpegLoader,
                                           build_transform)

    with tempfile.TemporaryDirectory() as root:
        os.makedirs(os.path.join(root, "c0"))
        for i in range(4):
            smooth_jpeg(os.path.join(root, "c0", f"{i}.jpg"),
                        700, 500, seed=i)
        ds = ImageFolder(root, build_transform())
        exact = list(NativeJpegLoader(ds, batch_size=4))
        fast = list(NativeJpegLoader(ds, batch_size=4, fast=True))
        np.testing.assert_array_equal(exact[0][1], fast[0][1])
        assert np.abs(exact[0][0] - fast[0][0]).mean() < 0.05
