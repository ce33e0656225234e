"""uint8 wire-format pipeline: loaders emit the pre-normalize uint8 crop
(4x fewer host->device bytes) and the device applies the identical
(x/255 - mean)/std in f32 (data/imagenet.device_normalize) — the model
input must be BIT-exact vs the f32-emitting path in every mode (native
batch, native per-item, PIL fallback, plain transform), and the engine's
jitted forwards must accept uint8 batches transparently.
"""
import os
import tempfile

import numpy as np
import pytest
from PIL import Image

from diffvit_tpu.data.imagenet import (ImageFolder, NativeJpegLoader,
                                       build_transform, device_normalize)

pytest.importorskip("diffvit_tpu.data.native_decode")
from diffvit_tpu.data import native_decode  # noqa: E402


@pytest.fixture(scope="module")
def lib():
    try:
        native_decode.load_library()
    except Exception as e:
        pytest.skip(f"native decode unavailable: {e}")
    return native_decode


@pytest.fixture(scope="module")
def jpeg_root(lib, smooth_jpeg):
    with tempfile.TemporaryDirectory() as root:
        os.makedirs(os.path.join(root, "c0"))
        for i, (w, h) in enumerate([(500, 375), (300, 200), (640, 480),
                                    (224, 224)]):
            smooth_jpeg(os.path.join(root, "c0", f"{i}.jpg"), w, h, seed=i)
        yield root


def test_transform_u8_plus_device_normalize_bitexact(jpeg_root):
    tf32 = build_transform()
    tfu8 = build_transform(normalize=False)
    p = os.path.join(jpeg_root, "c0", "0.jpg")
    with Image.open(p) as img:
        ref = tf32(img)
    with Image.open(p) as img:
        u8 = tfu8(img)
    assert u8.dtype == np.uint8 and u8.shape == (3, 224, 224)
    got = np.asarray(device_normalize(u8))
    np.testing.assert_array_equal(got, ref)


def test_native_u8_batch_bitexact_vs_f32(lib, jpeg_root):
    paths = [os.path.join(jpeg_root, "c0", f"{i}.jpg") for i in range(4)]
    f32 = lib.decode_preprocess_batch(paths)
    u8 = lib.decode_preprocess_batch_u8(paths)
    assert u8.dtype == np.uint8
    np.testing.assert_array_equal(np.asarray(device_normalize(u8)), f32)
    # per-item entry point agrees with the batch one
    np.testing.assert_array_equal(u8[1], lib.decode_preprocess_u8(paths[1]))
    # fast mode routes through the same u8 tail
    u8f = lib.decode_preprocess_batch_u8(paths, fast=True)
    f32f = lib.decode_preprocess_batch(paths, fast=True)
    np.testing.assert_array_equal(np.asarray(device_normalize(u8f)), f32f)


def test_native_loader_u8_mode(lib, jpeg_root):
    ds = ImageFolder(jpeg_root, build_transform())
    (f32, lab32), = list(NativeJpegLoader(ds, batch_size=4))
    (u8, lab8), = list(NativeJpegLoader(ds, batch_size=4, emit="u8"))
    assert u8.dtype == np.uint8
    np.testing.assert_array_equal(lab32, lab8)
    np.testing.assert_array_equal(np.asarray(device_normalize(u8)), f32)


def test_native_loader_u8_pil_fallback(lib, smooth_jpeg):
    """A PNG in the folder forces the per-item path; its PIL fallback must
    produce the same uint8 crop geometry and normalize to the f32 value."""
    with tempfile.TemporaryDirectory() as root:
        os.makedirs(os.path.join(root, "c0"))
        for i in range(2):
            smooth_jpeg(os.path.join(root, "c0", f"{i}.jpg"), 300, 240,
                        seed=i)
        rng = np.random.default_rng(7)
        Image.fromarray(rng.integers(0, 256, (250, 300, 3), np.uint8),
                        "RGB").save(os.path.join(root, "c0", "zz.png"))
        ds = ImageFolder(root, build_transform())
        (f32, _), = list(NativeJpegLoader(ds, batch_size=3))
        (u8, _), = list(NativeJpegLoader(ds, batch_size=3, emit="u8"))
        assert u8.dtype == np.uint8
        np.testing.assert_array_equal(np.asarray(device_normalize(u8)), f32)


def test_engine_accepts_u8_batches():
    """QuantizedViT's jitted forwards prepend device_normalize: a uint8
    batch must produce the exact logits of its f32-normalized twin on the
    fake-quant, int, and bit-traced paths."""
    import jax

    from diffvit_tpu.config import QuantConfig
    from diffvit_tpu.engine import QuantizedViT
    from diffvit_tpu.models import vit

    spec = vit.ViTSpec("u8t", embed_dim=64, depth=2, num_heads=2,
                       num_classes=10, img_size=56, patch_size=8)
    params = vit.init_params(spec, jax.random.PRNGKey(0))
    m = QuantizedViT(spec, QuantConfig(), params=params)
    rng = np.random.default_rng(0)
    u8 = rng.integers(0, 256, (2, 3, 56, 56), np.uint8)
    f32 = np.asarray(device_normalize(u8))
    m.calibrate(f32)
    for kw in (dict(quant=False), dict(), dict(use_int=True)):
        ref = np.asarray(m(f32, **kw))
        got = np.asarray(m(u8, **kw))
        np.testing.assert_array_equal(got, ref, err_msg=str(kw))
    bits = np.asarray([[4] * vit.num_bit_slots(spec),
                       [8] * vit.num_bit_slots(spec)], np.int32)
    np.testing.assert_array_equal(np.asarray(m.forward_bits(u8, bits)),
                                  np.asarray(m.forward_bits(f32, bits)))
    # calibrating directly on the u8 batch gives the same scales
    m2 = QuantizedViT(spec, QuantConfig(), params=params)
    m2.calibrate(u8)
    for k in m.qparams:
        np.testing.assert_array_equal(np.asarray(m2.qparams[k]),
                                      np.asarray(m.qparams[k]), err_msg=k)
