"""AdaRound learned-rounding reconstruction (calib/adaround.py).

Beyond-the-reference capability (the reference rounds every weight to
nearest, /root/reference/models/ptq/quantizer/uniform.py:50-56); these
tests pin the three contracts the module promises:

* every site's reconstruction MSE is <= nearest-rounding's (the learned
  decision can always fall back to nearest),
* the whole-model quantized logits move closer to the FP logits,
* the returned pytree is a drop-in weight replacement: re-quantizing it
  with the calibrated scales reproduces it bit-exactly (so forward_q,
  forward_q_bits and prepare_int all consume the learned codes).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffvit_tpu.config import QuantConfig
from diffvit_tpu.models import vit
from diffvit_tpu.calib.adaround import adaround_vit
from diffvit_tpu.ops.bit_types import BIT_TYPE_DICT
from diffvit_tpu.ops.quant import fake_quant

TINY = vit.ViTSpec("test_tiny", embed_dim=64, depth=2, num_heads=2,
                   num_classes=10)


@pytest.fixture(scope="module")
def setup():
    params = vit.init_params(TINY, jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 3, 224, 224))
    cfg = QuantConfig()
    qp, _ = vit.calibrate(params, TINY, cfg, x)
    bc = (4,) * vit.num_bit_slots(TINY)
    new_params, report = adaround_vit(params, qp, TINY, cfg, x, bc,
                                      steps=200, max_rows=512)
    return params, qp, cfg, x, bc, new_params, report


def test_every_site_improves(setup):
    _, _, _, _, _, _, report = setup
    assert len(report) == 4 * TINY.depth + 2
    for name, (mse_near, mse_learned) in report.items():
        assert mse_learned <= mse_near * 1.001, (name, mse_near, mse_learned)


def test_logits_closer_to_fp(setup):
    params, qp, cfg, x, bc, new_params, _ = setup
    fp = vit.forward_fp(params, TINY, x)
    e0 = float(jnp.linalg.norm(vit.forward_q(params, qp, TINY, cfg, x, bc)
                               - fp) / jnp.linalg.norm(fp))
    e1 = float(jnp.linalg.norm(vit.forward_q(new_params, qp, TINY, cfg, x, bc)
                               - fp) / jnp.linalg.norm(fp))
    assert e1 < e0 * 0.8, (e0, e1)


def test_reconstructed_weights_reround_bit_exactly(setup):
    """forward_q re-quantizes weights from params every call; the learned
    pytree must survive that round trip exactly or the 'reconstructed
    weights' abstraction leaks.  Checked in each site's own frame
    (smoothed for qkv/fc1, plain otherwise), PoT scales make it exact."""
    params, qp, cfg, _, bc, new_params, _ = setup
    bt = BIT_TYPE_DICT["int4"]
    idx = cfg.bit_pool.index(4)
    for i in range(TINY.depth):
        blk, p = new_params["blocks"][i], f"blocks.{i}"
        # plain site: proj
        s = qp[f"{p}.attn.proj.w.{bt.name}.scale"]
        s = s[:, None] if s.ndim == 1 else s
        w = blk["proj"]["w"]
        np.testing.assert_array_equal(np.asarray(fake_quant(w, s, 0.0, bt)),
                                      np.asarray(w))
        # smoothed site: qkv (round trip through w*ch like _q_smooth_linear)
        ch = qp[f"{p}.attn.qkv.sq.channel_scale"][idx]
        s = qp[f"{p}.attn.qkv.w.{bt.name}.scale"][idx]
        s = s[:, None] if s.ndim == 1 else s
        ws = blk["qkv"]["w"] * ch
        codes = np.asarray(ws / s)
        np.testing.assert_array_equal(codes, np.round(codes))


def test_engine_adaround_method(setup):
    """engine.QuantizedViT.adaround replaces params, invalidates the
    compiled-forward cache, and the int execution path picks up the
    learned codes (prepare_int re-quantizes from params)."""
    from diffvit_tpu.engine import QuantizedViT

    params, _, cfg, x, bc, _, _ = setup
    model = QuantizedViT(TINY, cfg, params=params)
    model.calibrate(x)
    fp = vit.forward_fp(params, TINY, x)
    q0 = model(x, tuple(bc))
    qi0 = model(x, tuple(bc), use_int=True)
    report = model.adaround(x, tuple(bc), steps=200, max_rows=512)
    assert len(report) == 4 * TINY.depth + 2
    q1 = model(x, tuple(bc))
    qi1 = model(x, tuple(bc), use_int=True)
    e = lambda q: float(jnp.linalg.norm(q - fp) / jnp.linalg.norm(fp))
    assert e(q1) < e(q0) * 0.8, (e(q0), e(q1))
    assert e(qi1) < e(qi0) * 0.8, (e(qi0), e(qi1))


def test_swin_adaround(setup_swin):
    """adaround_swin covers every slot of the generalized Swin bit_config
    contract (patch + 4/block + per-stage reduction + head) and improves
    both per-site MSE and whole-model logits error."""
    from diffvit_tpu.models import swin
    from diffvit_tpu.calib.adaround import adaround_swin

    params, qp, cfg, x, spec = setup_swin
    new_params, report = adaround_swin(params, qp, spec, cfg, x, 4,
                                       steps=200, max_rows=512)
    assert len(report) == swin.num_bit_slots(spec)
    for name, (m0, m1) in report.items():
        assert m1 <= m0 * 1.001, (name, m0, m1)
    fp = swin.forward_fp(params, spec, x)
    e = lambda p: float(jnp.linalg.norm(
        swin.forward_q(p, qp, spec, cfg, x, 4) - fp) / jnp.linalg.norm(fp))
    assert e(new_params) < e(params), (e(params), e(new_params))


@pytest.fixture(scope="module")
def setup_swin():
    from diffvit_tpu.models import swin

    spec = swin.SwinSpec("swin_ar_test", embed_dim=32, depths=(1, 1),
                         num_heads=(2, 2), window=7, img_size=56,
                         num_classes=10)
    params = swin.init_swin_params(spec, jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 3, 56, 56))
    cfg = QuantConfig()
    qp, _ = swin.calibrate(params, spec, cfg, x)
    return params, qp, cfg, x, spec


def test_minus_one_slots_skip_sites(setup):
    params, qp, cfg, x, _, _, _ = setup
    bc = list((4,) * vit.num_bit_slots(TINY))
    bc[2] = -1  # blocks.0 proj in float
    new_params, report = adaround_vit(params, qp, TINY, cfg, x, tuple(bc),
                                      steps=50, max_rows=256)
    assert "blocks.0.attn.proj" not in report
    np.testing.assert_array_equal(
        np.asarray(new_params["blocks"][0]["proj"]["w"]),
        np.asarray(params["blocks"][0]["proj"]["w"]))
    assert "blocks.0.attn.qkv" in report
