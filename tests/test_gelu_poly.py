"""_gelu_poly (ops/pallas/mlp.py): the degree-12 Chebyshev GELU must stay
on the saturated-tail error floor, 4.8*(1-Phi(4.8)) = 3.8e-6 — the bound
its VPU-pass-count argument depends on (docs/PERF_ANALYSIS.md)."""
import jax.numpy as jnp
import numpy as np
from scipy.special import erf

from diffvit_tpu.ops.pallas.mlp import _gelu_poly


def test_gelu_poly_error_bound():
    x = jnp.asarray(np.linspace(-8.0, 8.0, 400001), jnp.float32)
    got = _gelu_poly(x)
    # genuine f64 oracle (jnp f64 silently truncates to f32 without
    # jax_enable_x64): exact-erf GELU on numpy float64
    xd = np.asarray(x, np.float64)
    want = 0.5 * xd * (1.0 + erf(xd / np.sqrt(2.0)))
    err = np.abs(np.asarray(got, np.float64) - want)
    assert err.max() < 4.5e-6, err.max()


def test_gelu_poly_exact_regions():
    # deep negative tail saturates to exactly 0, large positive to x
    x = jnp.asarray([-8.0, -6.0, 6.0, 8.0], jnp.float32)
    got = np.asarray(_gelu_poly(x))
    np.testing.assert_array_equal(got[:2], [0.0, 0.0])
    np.testing.assert_array_equal(got[2:], [6.0, 8.0])
