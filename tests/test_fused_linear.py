"""fused_int_linear (ops/pallas/linear.py, interpret mode) vs the plain
XLA int linear + epilogue it replaces."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffvit_tpu.ops.pallas.linear import fused_int_linear


@pytest.mark.parametrize("bf16_dot", [True, False])
@pytest.mark.parametrize("mode", ["raw", "fq", "codes"])
def test_fused_int_linear_matches_xla(mode, bf16_dot):
    rng = np.random.default_rng(0)
    r, k, n = 512, 96, 160
    x = jnp.asarray(rng.integers(-128, 128, (r, k)), jnp.int8)
    w = jnp.asarray(rng.integers(-8, 8, (k, n)), jnp.int8)
    mult = jnp.asarray(rng.uniform(0.001, 0.01, (n,)), jnp.float32)
    bias = jnp.asarray(rng.standard_normal(n), jnp.float32)
    out_scale = jnp.float32(0.05)

    acc = jax.lax.dot_general(
        x.astype(jnp.int32), w.astype(jnp.int32),
        (((1,), (0,)), ((), ()))).astype(jnp.float32)
    y = acc * mult + bias
    codes = jnp.clip(jnp.round(y / out_scale), -128.0, 127.0)

    if mode == "raw":
        got = fused_int_linear(x, w, mult, bias, bf16_dot=bf16_dot,
                               interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(y),
                                   rtol=0, atol=1e-4)
    elif mode == "fq":
        got = fused_int_linear(x, w, mult, bias, out_scale=out_scale,
                               bf16_dot=bf16_dot, interpret=True)
        np.testing.assert_array_equal(np.asarray(got),
                                      np.asarray(codes * out_scale))
    else:
        got = fused_int_linear(x, w, mult, bias, out_scale=out_scale,
                               emit_codes=True, bf16_dot=bf16_dot,
                               interpret=True)
        np.testing.assert_array_equal(np.asarray(got),
                                      np.asarray(codes, np.int8))
