"""DFQ-style bias correction (calib/biascorr.py) — beyond-the-reference.

Pins the contracts: every biased linear's per-channel output mean matches
the float path exactly on the correction batch afterwards (bias enters
the output additively, so the empirical fold is exact in-sample), the
quantized logits move closer to FP, weights are untouched, and the pass
composes with AdaRound.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffvit_tpu.config import QuantConfig
from diffvit_tpu.models import vit
from diffvit_tpu.calib.biascorr import bias_correct

TINY = vit.ViTSpec("test_tiny", embed_dim=64, depth=2, num_heads=2,
                   num_classes=10)


@pytest.fixture(scope="module")
def setup():
    params = vit.init_params(TINY, jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 3, 224, 224))
    cfg = QuantConfig()
    qp, _ = vit.calibrate(params, TINY, cfg, x)
    bc = (4,) * vit.num_bit_slots(TINY)
    return params, qp, cfg, x, bc


def test_vit_bias_correction(setup):
    params, qp, cfg, x, bc = setup
    new_params, report = bias_correct(params, qp, TINY, cfg, x, bc)
    assert len(report) == 4 * TINY.depth + 2
    for name, (before, after) in report.items():
        assert after <= before + 1e-7, (name, before, after)
        assert after < 1e-5, (name, after)  # exact in-sample fold
    fp = vit.forward_fp(params, TINY, x)
    e = lambda p: float(jnp.linalg.norm(
        vit.forward_q(p, qp, TINY, cfg, x, bc) - fp) / jnp.linalg.norm(fp))
    assert e(new_params) < e(params) * 0.75, (e(params), e(new_params))
    # weights untouched — only biases move
    np.testing.assert_array_equal(
        np.asarray(new_params["blocks"][0]["qkv"]["w"]),
        np.asarray(params["blocks"][0]["qkv"]["w"]))
    assert not np.array_equal(np.asarray(new_params["blocks"][0]["qkv"]["b"]),
                              np.asarray(params["blocks"][0]["qkv"]["b"]))


def test_composes_with_adaround(setup):
    from diffvit_tpu.calib.adaround import adaround_vit

    params, qp, cfg, x, bc = setup
    ar_params, _ = adaround_vit(params, qp, TINY, cfg, x, bc,
                                steps=200, max_rows=512)
    # the float anchor MUST be the original weights: the float forward of
    # the rounded pytree is not the FP model (measured: correcting toward
    # it degrades 0.075 -> 0.224 rel err)
    both_params, _ = bias_correct(ar_params, qp, TINY, cfg, x, bc,
                                  fp_params=params)
    fp = vit.forward_fp(params, TINY, x)
    e = lambda p: float(jnp.linalg.norm(
        vit.forward_q(p, qp, TINY, cfg, x, bc) - fp) / jnp.linalg.norm(fp))
    assert e(both_params) < e(ar_params), (e(ar_params), e(both_params))
    assert e(both_params) < e(params) * 0.5


def test_swin_bias_correction():
    from diffvit_tpu.models import swin

    spec = swin.SwinSpec("swin_bc_test", embed_dim=32, depths=(1, 1),
                         num_heads=(2, 2), window=7, img_size=56,
                         num_classes=10)
    params = swin.init_swin_params(spec, jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 3, 56, 56))
    cfg = QuantConfig()
    qp, _ = swin.calibrate(params, spec, cfg, x)
    new_params, report = bias_correct(params, qp, spec, cfg, x, 4)
    # patch + 4/block + head; reductions are bias-free and skipped
    assert len(report) == 2 + 4 * sum(spec.depths)
    for name, (before, after) in report.items():
        assert after <= before + 1e-7, (name, before, after)
    fp = swin.forward_fp(params, spec, x)
    e = lambda p: float(jnp.linalg.norm(
        swin.forward_q(p, qp, spec, cfg, x, 4) - fp) / jnp.linalg.norm(fp))
    assert e(new_params) < e(params), (e(params), e(new_params))
