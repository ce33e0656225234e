"""Native JPEG decode (native/decode.cpp) vs PIL: pixel parity and the
fused decode->preprocess path vs the PIL+numpy transform."""
import io
import os
import tempfile

import numpy as np
import pytest
from PIL import Image

native = pytest.importorskip("diffvit_tpu.data.native_decode")

from diffvit_tpu.data.imagenet import build_transform  # noqa: E402


@pytest.fixture(scope="module")
def lib():
    try:
        return native.load_library()
    except Exception as e:  # no g++ / libjpeg in some environments
        pytest.skip(f"native decode unavailable: {e}")


def _jpeg_bytes(rng, h=256, w=300, quality=85, mode="RGB"):
    arr = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    img = Image.fromarray(arr, "RGB").convert(mode)
    buf = io.BytesIO()
    img.save(buf, "JPEG", quality=quality)
    return buf.getvalue()


def test_decode_matches_pil(lib):
    rng = np.random.default_rng(0)
    for q in (70, 85, 95):
        data = _jpeg_bytes(rng, quality=q)
        got = native.decode_rgb(data)
        want = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
        # PIL bundles libjpeg-turbo, the system lib may be a different
        # build; JDCT_ISLOW output is specified to match across them
        np.testing.assert_array_equal(got, want)


def test_decode_grayscale_jpeg(lib):
    rng = np.random.default_rng(1)
    data = _jpeg_bytes(rng, mode="L")
    got = native.decode_rgb(data)
    want = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
    np.testing.assert_array_equal(got, want)


def test_decode_preprocess_matches_pil_pipeline(lib):
    rng = np.random.default_rng(2)
    data = _jpeg_bytes(rng, h=311, w=243)
    got = native.decode_preprocess(data)
    tf = build_transform()
    want = tf(Image.open(io.BytesIO(data)))
    # resample is bit-exact Pillow (test_native_preproc); normalize order
    # matches too — identical floats
    np.testing.assert_array_equal(got, np.asarray(want))


def test_decode_preprocess_batch_and_errors(lib):
    rng = np.random.default_rng(3)
    datas = [_jpeg_bytes(rng, h=260 + i, w=280 - i) for i in range(4)]
    got = native.decode_preprocess_batch(datas)
    tf = build_transform()
    for i, d in enumerate(datas):
        want = tf(Image.open(io.BytesIO(d)))
        np.testing.assert_array_equal(got[i], np.asarray(want))
    with pytest.raises(ValueError):
        native.decode_preprocess(b"not a jpeg")


def test_decode_from_path(lib):
    rng = np.random.default_rng(4)
    data = _jpeg_bytes(rng)
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "x.jpg")
        with open(p, "wb") as f:
            f.write(data)
        got = native.decode_rgb(p)
    want = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
    np.testing.assert_array_equal(got, want)
