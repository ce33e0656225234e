"""Bit-traced INTEGER-path mixed-precision eval (models/vit_int.
prepare_int_bits / select_int_bits, engine.forward_bits_int /
validate_bits_int) vs the statically-baked prepare_int path.

The search substrate contract: for every {4,8} candidate, the one jitted
select-then-forward program must reproduce prepare_int(bit_config)'s
forward BIT-FOR-BIT (same ops, same order — the select only swaps which
baked arrays flow in).  Parity with the reference's fake-quant search
driver stays on forward_q_bits (tests/test_mixed_precision.py); this is
the fast path behind CLI --search-path int.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffvit_tpu.config import QuantConfig
from diffvit_tpu.engine import QuantizedViT, validate_bits_int
from diffvit_tpu.models import vit, vit_int

pytestmark = pytest.mark.quick

TINY = vit.ViTSpec("test_tiny", embed_dim=64, depth=2, num_heads=2,
                   num_classes=10)
NIQ = vit.ViTSpec("test_niq", embed_dim=64, depth=1, num_heads=2,
                  num_classes=10, input_quant=False)


@pytest.fixture(scope="module")
def setup():
    params = vit.init_params(TINY, jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 3, 224, 224))
    cfg = QuantConfig()
    qp, _ = vit.calibrate(params, TINY, cfg, x)
    variants, sym = vit_int.prepare_int_bits(params, qp, TINY, cfg)
    return params, qp, cfg, x, variants, sym


def _selected_forward(variants, sym, spec, cfg):
    return jax.jit(lambda v, b, xf: vit_int.forward_q_int(
        vit_int.select_int_bits(v, b, sym, spec, cfg), spec, cfg, xf))


N = vit.num_bit_slots(TINY)


@pytest.mark.parametrize("bc", [
    (4,) * N,
    (8,) * N,
    # both mixed phases of the (b_qkv, b_fc1) norm2 cross-coupling
    (8,) + (4, 8) * (2 * TINY.depth) + (4,),
    (8,) + (8, 4) * (2 * TINY.depth) + (8,),
])
def test_select_matches_prepare_bitwise(setup, bc):
    params, qp, cfg, x, variants, sym = setup
    ref = vit_int.forward_q_int(
        vit_int.prepare_int(params, qp, TINY, cfg, bc), TINY, cfg, x)
    got = _selected_forward(variants, sym, TINY, cfg)(
        variants, jnp.asarray(bc, jnp.int32), x)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_fp_patch_spec(setup):
    """vit_large's input_quant=False keeps a dequantized-f32 patch matmul;
    the select path must reproduce prepare_int's fp-patch branch too."""
    params = vit.init_params(NIQ, jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 3, 224, 224))
    cfg = QuantConfig()
    qp, _ = vit.calibrate(params, NIQ, cfg, x)
    variants, sym = vit_int.prepare_int_bits(params, qp, NIQ, cfg)
    n = vit.num_bit_slots(NIQ)
    for bc in [(4,) * n, (8, 4, 8, 4, 8, 8)[:n]]:
        ref = vit_int.forward_q_int(
            vit_int.prepare_int(params, qp, NIQ, cfg, bc), NIQ, cfg, x)
        got = _selected_forward(variants, sym, NIQ, cfg)(
            variants, jnp.asarray(bc, jnp.int32), x)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


@pytest.fixture(scope="module")
def engine():
    m = QuantizedViT(TINY, QuantConfig(),
                     params=vit.init_params(TINY, jax.random.PRNGKey(0)))
    rng = np.random.default_rng(0)
    m.calibrate(rng.standard_normal((2, 3, 224, 224)).astype("float32"))
    return m, rng


def test_engine_forward_bits_int(engine):
    m, rng = engine
    x = rng.standard_normal((4, 3, 224, 224)).astype("float32")
    bc = (8,) + (4, 8) * (2 * TINY.depth) + (8,)
    ref = m(x, bc, use_int=True)
    got = m.forward_bits_int(x, jnp.asarray(bc, jnp.int32))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_validate_bits_int_matches_per_config_int_validate(engine):
    m, rng = engine
    val = [(rng.standard_normal((8, 3, 224, 224)).astype("float32"),
            rng.integers(0, 10, 8)) for _ in range(2)]
    configs = [[4] * N, [8] * N,
               [8] + [4, 8] * (2 * TINY.depth) + [8]]
    got = validate_bits_int(m, val, configs, log=lambda *_: None)
    exp = []
    for c in configs:
        corr = sum(
            int((np.asarray(m(d, tuple(c), use_int=True)).argmax(-1)
                 == np.asarray(t)).sum()) for d, t in val)
        exp.append(100.0 * corr / 16)
    assert got == pytest.approx(exp)


def test_guards(engine):
    m, _ = engine
    # uncalibrated
    m2 = QuantizedViT(TINY, QuantConfig(),
                      params=vit.init_params(TINY, jax.random.PRNGKey(2)))
    with pytest.raises(RuntimeError, match="calibrate"):
        m2.forward_bits_int(np.zeros((1, 3, 224, 224), np.float32),
                            jnp.asarray([8] * N))
