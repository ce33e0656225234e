"""STE-threaded quantized forward + distillation QAT (calib/qat.py).

Beyond-the-reference; the contracts pinned here:

* ``ste=True`` changes NO primal value — bit-exact against the default
  forward at int4 and int8 (the x + stop_grad(round(x) - x) form is
  exact in f32: the inner difference is Sterbenz-exact, so the outer add
  reconstructs round(x) precisely),
* gradients flow to every parameter class through the STE path and are
  zero through the default path (rounding kills them — the reference's
  own DDV-Hessian note),
* a short distillation run reduces both the distill MSE and the
  quantized-vs-FP logits error.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffvit_tpu.config import QuantConfig
from diffvit_tpu.models import vit
from diffvit_tpu.calib.qat import qat_distill

TINY = vit.ViTSpec("test_tiny", embed_dim=64, depth=2, num_heads=2,
                   num_classes=10)


@pytest.fixture(scope="module")
def setup():
    params = vit.init_params(TINY, jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 3, 224, 224))
    cfg = QuantConfig()
    qp, _ = vit.calibrate(params, TINY, cfg, x)
    return params, qp, cfg, x


def test_ste_primal_bit_exact(setup):
    params, qp, cfg, x = setup
    for bits in (4, 8):
        bc = (bits,) * vit.num_bit_slots(TINY)
        q = vit.forward_q(params, qp, TINY, cfg, x, bc)
        q_ste = vit.forward_q(params, qp, TINY, cfg, x, bc, ste=True)
        np.testing.assert_array_equal(np.asarray(q), np.asarray(q_ste))


def test_ste_gradients_flow(setup):
    params, qp, cfg, x = setup
    bc = (4,) * vit.num_bit_slots(TINY)

    def loss(p, ste):
        return jnp.mean(vit.forward_q(p, qp, TINY, cfg, x, bc, ste=ste)**2)

    g = jax.grad(loss)(params, True)
    for leaf in [g["patch_embed"]["w"], g["blocks"][0]["qkv"]["w"],
                 g["blocks"][1]["fc2"]["w"], g["head"]["w"],
                 g["blocks"][0]["norm1"]["w"], g["cls_token"],
                 g["pos_embed"]]:
        assert float(jnp.linalg.norm(leaf)) > 0
    g0 = jax.grad(loss)(params, False)
    assert float(jnp.linalg.norm(g0["blocks"][0]["qkv"]["w"])) == 0.0


def test_qat_distill_improves(setup):
    params, qp, cfg, x = setup
    bc = (4,) * vit.num_bit_slots(TINY)
    fp = vit.forward_fp(params, TINY, x)
    new_params, losses = qat_distill(params, qp, TINY, cfg, x, bc,
                                     steps=100, lr=1e-4)
    assert losses[-1] < losses[0] * 0.7, (losses[0], losses[-1])
    e = lambda p: float(jnp.linalg.norm(
        vit.forward_q(p, qp, TINY, cfg, x, bc) - fp) / jnp.linalg.norm(fp))
    assert e(new_params) < e(params) * 0.9, (e(params), e(new_params))


def test_swin_ste_and_qat():
    """Swin's quantized body is STE-threaded too: primal bit-exact,
    gradients flow, short distillation improves."""
    from diffvit_tpu.models import swin

    spec = swin.SwinSpec("swin_qat_test", embed_dim=32, depths=(1, 1),
                         num_heads=(2, 2), window=7, img_size=56,
                         num_classes=10)
    params = swin.init_swin_params(spec, jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 3, 56, 56))
    cfg = QuantConfig()
    qp, _ = swin.calibrate(params, spec, cfg, x)
    q = swin.forward_q(params, qp, spec, cfg, x, 4)
    q_ste = swin.forward_q(params, qp, spec, cfg, x, 4, ste=True)
    np.testing.assert_array_equal(np.asarray(q), np.asarray(q_ste))

    g = jax.grad(lambda p: jnp.mean(
        swin.forward_q(p, qp, spec, cfg, x, 4, ste=True)**2))(params)
    blk = g["layers"][0]["blocks"][0]
    for leaf in [g["patch_embed"]["proj"]["w"], blk["qkv"]["w"],
                 blk["fc2"]["w"], blk["rel_bias_table"],
                 g["layers"][0]["downsample"]["reduction"]["w"],
                 g["head"]["w"]]:
        assert float(jnp.linalg.norm(leaf)) > 0

    fp = swin.forward_fp(params, spec, x)
    new_params, losses = qat_distill(params, qp, spec, cfg, x, 4,
                                     steps=60, lr=1e-4)
    assert losses[-1] < losses[0], (losses[0], losses[-1])
    e = lambda p: float(jnp.linalg.norm(
        swin.forward_q(p, qp, spec, cfg, x, 4) - fp) / jnp.linalg.norm(fp))
    assert e(new_params) < e(params), (e(params), e(new_params))


def test_remat_bit_identical_primal_and_grads(setup):
    """remat=True is pure recompute: primal AND gradients bit-identical
    to remat=False on the TINY spec (the docstring claim, now pinned)."""
    params, qp, cfg, x = setup
    bc = (4,) * vit.num_bit_slots(TINY)

    def loss(p, remat):
        return jnp.mean(vit.forward_q(p, qp, TINY, cfg, x, bc, ste=True,
                                      remat=remat) ** 2)

    y0 = vit.forward_q(params, qp, TINY, cfg, x, bc, remat=False)
    y1 = vit.forward_q(params, qp, TINY, cfg, x, bc, remat=True)
    np.testing.assert_array_equal(np.asarray(y0), np.asarray(y1))

    g0 = jax.grad(loss)(params, False)
    g1 = jax.grad(loss)(params, True)
    for l0, l1 in zip(jax.tree_util.tree_leaves(g0),
                      jax.tree_util.tree_leaves(g1)):
        np.testing.assert_array_equal(np.asarray(l0), np.asarray(l1))


def test_remat_rejects_taps_before_mutating_them(setup):
    """The taps guard fires before any tap is appended (caller lists stay
    unmutated on error) and raises ValueError, not a strippable assert."""
    params, qp, cfg, x = setup
    taps: list = []
    with pytest.raises(ValueError, match="remat"):
        vit.forward_q(params, qp, TINY, cfg, x, remat=True, taps=taps)
    assert taps == []

    from diffvit_tpu.models import swin

    spec = swin.SwinSpec("swin_remat_test", embed_dim=32, depths=(1, 1),
                         num_heads=(2, 2), window=7, img_size=56,
                         num_classes=10)
    sp = swin.init_swin_params(spec, jax.random.PRNGKey(0))
    with pytest.raises(NotImplementedError, match="remat"):
        qat_distill(sp, {}, spec, cfg, x, 4, steps=1, remat=True)


def test_qat_remat_trajectory_identical(setup):
    """A short qat_distill run produces the identical loss trajectory with
    remat on and off, and Engine.qat forwards the flag."""
    params, qp, cfg, x = setup
    bc = (4,) * vit.num_bit_slots(TINY)
    _, l0 = qat_distill(params, qp, TINY, cfg, x, bc, steps=10, lr=1e-4)
    _, l1 = qat_distill(params, qp, TINY, cfg, x, bc, steps=10, lr=1e-4,
                        remat=True)
    np.testing.assert_array_equal(np.asarray(l0), np.asarray(l1))

    from diffvit_tpu.engine import QuantizedViT

    model = QuantizedViT(TINY, cfg, params=params)
    model.calibrate(x)
    l2 = model.qat(x, bc, steps=10, lr=1e-4, remat=True)
    assert len(l2) == 10 and np.isfinite(l2).all()


def test_engine_qat_method(setup):
    from diffvit_tpu.engine import QuantizedViT

    params, _, cfg, x = setup
    model = QuantizedViT(TINY, cfg, params=params)
    model.calibrate(x)
    bc = (4,) * vit.num_bit_slots(TINY)
    fp = vit.forward_fp(params, TINY, x)
    e0 = float(jnp.linalg.norm(model(x, bc) - fp))
    losses = model.qat(x, bc, steps=60, lr=1e-4)
    assert losses[-1] < losses[0]
    assert float(jnp.linalg.norm(model(x, bc) - fp)) < e0
    # the original float anchor is untouched by the update
    np.testing.assert_array_equal(
        np.asarray(model.fp_params["blocks"][0]["qkv"]["w"]),
        np.asarray(params["blocks"][0]["qkv"]["w"]))
