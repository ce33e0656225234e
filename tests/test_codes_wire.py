"""Codes wire: ship int8 qact_input CODES instead of uint8 pixels.

The u8 wire's on-device LUT normalize is a per-pixel gather that costs
~322 ms/step at b256 on the round-5 axon backend (the entire
misattributed 'dispatch wire tax' — scripts/ab_depth_bisect.py,
docs/PERF_ANALYSIS.md round-5 correction).  Since the integer path
immediately quantizes its input (vit_int._embed_front:
``_requant_i8(patchify(fake_quant(normalize(x))))``), the whole chain
composes into one host-side 768-entry table (data/imagenet.
input_code_lut) whose int8 output feeds the int forward directly —
same wire bytes, zero device ingest, bit-identical logits.

These tests pin the bit-identity on CPU, where f32 division is exact
(the same caveat the u8 wire already carries for TPU, CLAUDE.md)."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffvit_tpu import QuantConfig
from diffvit_tpu.data.imagenet import (CodesLoader, device_normalize,
                                       encode_input, input_code_lut)
from diffvit_tpu.models import swin, swin_int, vit, vit_int
from diffvit_tpu.ops.quant import fake_quant

TINY = vit.ViTSpec("codes_tiny", embed_dim=64, depth=2, num_heads=2,
                   num_classes=10)
SWIN_TINY = swin.SwinSpec("codes_swin", embed_dim=32, depths=(1, 1),
                          num_heads=(2, 4), window=7, img_size=56,
                          num_classes=10)


def _u8_batch(shape, seed=0):
    return np.random.default_rng(seed).integers(
        0, 256, shape, dtype=np.uint8)


def _calibrated_vit(spec, cfg, xu8, bits=8):
    params = vit.init_params(spec, jax.random.PRNGKey(0))
    xf = device_normalize(jnp.asarray(xu8))
    qp, _ = vit.calibrate(params, spec, cfg, xf)
    nb = vit.num_bit_slots(spec)
    bit_config = (bits,) * nb if np.isscalar(bits) else bits
    return vit_int.prepare_int(params, qp, spec, cfg, bit_config), qp, xf


def _lut_for(qp, cfg):
    bt = cfg.bit_a
    return input_code_lut(np.asarray(qp["qact_input.scale"]),
                          np.asarray(qp["qact_input.zp"]),
                          qmin=bt.lower_bound, qmax=bt.upper_bound)


@pytest.mark.quick
def test_lut_matches_device_composition():
    """lut[c][v] == _requant_i8(fake_quant(device_normalize(v))) for ALL
    768 (channel, value) pairs — the exhaustive bit-identity that makes
    every downstream equality structural."""
    cfg = QuantConfig()
    scale, zp = np.float32(0.017), np.float32(0.0)
    lut = input_code_lut(scale, zp, qmin=cfg.bit_a.lower_bound,
                         qmax=cfg.bit_a.upper_bound)
    # device path on the same exhaustive value grid: one 'image' whose
    # rows enumerate all 256 values in each channel
    v = np.tile(np.arange(256, dtype=np.uint8), (3, 1))[:, None, :]
    xf = device_normalize(jnp.asarray(v))  # (3,1,256) f32
    xq = fake_quant(xf, scale, zp, cfg.bit_a)
    codes_dev = np.asarray(jnp.clip(jnp.round(xq / scale), -128, 127),
                           np.int8)
    np.testing.assert_array_equal(codes_dev[:, 0, :], lut)


@pytest.mark.quick
def test_vit_codes_wire_bitexact():
    cfg = QuantConfig()
    xu8 = _u8_batch((3, 3, 224, 224))
    ip, qp, xf = _calibrated_vit(TINY, cfg, xu8)
    logits_u8 = vit_int.forward_q_int(ip, TINY, cfg, xf)
    codes = encode_input(xu8, _lut_for(qp, cfg))
    assert codes.dtype == np.int8 and codes.shape == xu8.shape
    logits_codes = vit_int.forward_q_int(ip, TINY, cfg, jnp.asarray(codes))
    np.testing.assert_array_equal(np.asarray(logits_u8),
                                  np.asarray(logits_codes))


@pytest.mark.quick
def test_vit_codes_wire_fp_patch_slot():
    """bit_config[0] = -1 keeps the patch conv in f32: the codes path's
    (codes * scale) @ W.T must still equal the u8 wire exactly."""
    cfg = QuantConfig()
    xu8 = _u8_batch((2, 3, 224, 224), seed=1)
    nb = vit.num_bit_slots(TINY)
    ip, qp, xf = _calibrated_vit(TINY, cfg, xu8,
                                 bits=(-1,) + (8,) * (nb - 1))
    assert ip["patch"]["fp"]
    logits_u8 = vit_int.forward_q_int(ip, TINY, cfg, xf)
    codes = encode_input(xu8, _lut_for(qp, cfg))
    logits_codes = vit_int.forward_q_int(ip, TINY, cfg, jnp.asarray(codes))
    np.testing.assert_array_equal(np.asarray(logits_u8),
                                  np.asarray(logits_codes))


@pytest.mark.quick
def test_swin_codes_wire_bitexact():
    cfg = QuantConfig()
    xu8 = _u8_batch((2, 3, 56, 56), seed=2)
    params = swin.init_swin_params(SWIN_TINY, jax.random.PRNGKey(0))
    xf = device_normalize(jnp.asarray(xu8))
    qp, _ = swin.calibrate(params, SWIN_TINY, cfg, xf)
    ip = swin_int.prepare_int(params, qp, SWIN_TINY, cfg)
    logits_u8 = swin_int.forward_q_int(ip, SWIN_TINY, cfg, xf)
    codes = encode_input(xu8, _lut_for(qp, cfg))
    logits_codes = swin_int.forward_q_int(ip, SWIN_TINY, cfg,
                                          jnp.asarray(codes))
    np.testing.assert_array_equal(np.asarray(logits_u8),
                                  np.asarray(logits_codes))


@pytest.mark.quick
def test_unquantized_input_model_rejects_codes():
    cfg = QuantConfig()
    spec = dataclasses.replace(TINY, input_quant=False)
    xu8 = _u8_batch((2, 3, 224, 224), seed=3)
    params = vit.init_params(spec, jax.random.PRNGKey(0))
    xf = device_normalize(jnp.asarray(xu8))
    qp, _ = vit.calibrate(params, spec, cfg, xf)
    ip = vit_int.prepare_int(params, qp, spec, cfg)
    with pytest.raises(ValueError, match="input_quant"):
        vit_int.forward_q_int(ip, spec, cfg,
                              jnp.zeros((2, 3, 224, 224), jnp.int8))


@pytest.mark.quick
def test_intmodel_encode_roundtrip():
    """IntModel.input_lut / .encode and the int8 __call__ path: logits
    exactly equal the uint8-wire __call__ on the same crops."""
    from diffvit_tpu.engine import QuantizedViT

    cfg = QuantConfig()
    xu8 = _u8_batch((2, 3, 224, 224), seed=4)
    params = vit.init_params(TINY, jax.random.PRNGKey(0))
    m = QuantizedViT(TINY, cfg, params=params)
    m.calibrate(np.asarray(device_normalize(jnp.asarray(xu8))))
    import os
    import tempfile

    from diffvit_tpu.engine import load_int_model

    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "m.npz")
        m.save_int_model(p)
        im = load_int_model(p)
    logits_u8 = np.asarray(im(xu8))
    codes = im.encode(xu8)
    assert codes.dtype == np.int8
    np.testing.assert_array_equal(np.asarray(im(codes)), logits_u8)


@pytest.mark.quick
def test_native_encode_matches_numpy():
    """native/preproc.cpp apply_code_lut == the numpy fancy-index
    fallback, NCHW and CHW."""
    from diffvit_tpu.data import native_decode

    try:
        native_decode.load_library()
    except Exception as e:
        pytest.skip(f"native library unavailable: {e}")
    lut = input_code_lut(np.float32(0.013), np.float32(0.0))
    for shape in ((2, 3, 17, 31), (3, 9, 9)):
        x = _u8_batch(shape, seed=5)
        ref = (np.stack([lut[c][x[c]] for c in range(3)], 0) if x.ndim == 3
               else np.stack([lut[c][x[:, c]] for c in range(3)], 1))
        got = native_decode.apply_code_lut(x, lut)
        assert got.dtype == np.int8
        np.testing.assert_array_equal(got, ref)


def test_native_loader_codes_emit():
    """NativeJpegLoader(emit='codes') == encode_input(u8 batches)."""
    import tempfile

    from diffvit_tpu.data import native_decode
    from diffvit_tpu.data.imagenet import (ImageFolder, NativeJpegLoader,
                                           build_transform)
    from diffvit_tpu.data.synthetic import make_fake_imagefolder

    try:
        native_decode.load_library()
    except Exception as e:
        pytest.skip(f"native decode unavailable: {e}")
    lut = input_code_lut(np.float32(0.02), np.float32(0.0))
    with tempfile.TemporaryDirectory() as root:
        make_fake_imagefolder(root, num_classes=2, per_class=3, size=256)
        ds = ImageFolder(root, build_transform(normalize=False))
        u8 = list(NativeJpegLoader(ds, batch_size=3, emit="u8"))
        codes = list(NativeJpegLoader(ds, batch_size=3, emit="codes",
                                      code_lut=lut))
        assert len(codes) == len(u8)
        for (ci, cl), (ui, ul) in zip(codes, u8):
            np.testing.assert_array_equal(cl, ul)
            np.testing.assert_array_equal(ci, encode_input(ui, lut))
    with pytest.raises(ValueError, match="code_lut"):
        NativeJpegLoader(ds, batch_size=3, emit="codes")
    with pytest.raises(ValueError, match="code_lut"):
        NativeJpegLoader(ds, batch_size=3, emit="u8", code_lut=lut)


@pytest.mark.quick
def test_codes_loader_wraps_batches():
    lut = input_code_lut(np.float32(0.02), np.float32(0.0))
    batches = [(_u8_batch((2, 3, 8, 8), seed=i), np.array([0, 1]))
               for i in range(2)]
    wrapped = list(CodesLoader(batches, lut))
    assert len(wrapped) == len(batches)
    for (raw, lab), (enc, lab2) in zip(batches, wrapped):
        assert enc.dtype == np.int8
        np.testing.assert_array_equal(enc, encode_input(raw, lut))
        assert lab is lab2
