"""Log-Int-Softmax (LIS).

Functional rebuild of ``QIntSoftmax`` (/root/reference/models/ptq/
layers.py:295-395): i-BERT-style polynomial integer exp (int_polynomial /
int_exp, layers.py:334-358), integer softmax inversion, log2 rounding
(log_round, layers.py:323-329), 4-bit log quantization and 2^-q dequant with
saturation-to-zero.

The attention kernel consumes the dequantized output; a fused Pallas
attention kernel with the same math lives in ops/pallas/.
"""
from __future__ import annotations

import jax.numpy as jnp

from .bit_types import BitType


def log_round(x):
    """Nearest-power-of-two exponent, biased like the reference: bump the
    floor exponent iff (x - 2^f) >= 2^(f-1) (layers.py:323-329).

    Note: exact bitcast exponent-field forms of exp2/floor-log2 were
    measured SLOWER than the transcendentals on both the XLA path and in
    Mosaic kernels — this TPU's VPU exp2/log2 hardware beats the
    int<->float relayout cost.  Keeping the transcendental forms."""
    f = jnp.floor(jnp.log2(x))
    bump = (x - 2.0**f) >= 2.0 ** (f - 1.0)
    return f + bump.astype(f.dtype)


def _int_polynomial(x_int, scaling_factor):
    """2nd-order polynomial approx of exp on [-ln2, 0] (layers.py:334-344)."""
    a, b, c = 0.35815147, 0.96963238, 1.0
    b = b / a
    c = c / a
    b_int = jnp.floor(b / scaling_factor)
    c_int = jnp.floor(c / (scaling_factor**2))
    z = x_int * (x_int + b_int) + c_int
    return z, a * scaling_factor**2


def _int_exp(x_int, scaling_factor, n: int = 32):
    """Integer exp via range reduction x = q·(-ln2) + r (layers.py:346-358)."""
    x0 = -0.6931  # -ln2
    x0_int = jnp.floor(x0 / scaling_factor)
    x_int = jnp.maximum(x_int, n * x0_int)
    q = jnp.floor(x_int / x0_int)
    r = x_int - x0_int * q
    exp_int, exp_sf = _int_polynomial(r, scaling_factor)
    exp_int = jnp.maximum(jnp.floor(exp_int * 2.0 ** (n - q)), 0.0)
    return exp_int, exp_sf / 2.0**n


def int_softmax(x, scaling_factor):
    """(exp_int, exp_int_sum) of the shifted input (layers.py:331-365)."""
    return int_softmax_from_int(x / scaling_factor, scaling_factor)


def int_softmax_from_int(x_int, scaling_factor):
    """Same, but taking the integer representation directly (the integer
    pipeline's attention scores arrive as int codes already)."""
    x_int = x_int - jnp.max(x_int, axis=-1, keepdims=True)
    exp_int, _ = _int_exp(x_int, scaling_factor)
    exp_sum = jnp.sum(exp_int, axis=-1, keepdims=True)
    return exp_int, exp_sum


def _lis_tail(exp_int, exp_sum, bit_type: BitType):
    softmax_inv = jnp.round(exp_sum / exp_int)
    # log_round(m) == floor(log2(2m/3)) + 1 for every integer m >= 1:
    # the bump condition m >= 1.5*2^f folds into the shifted log.  Exact in
    # f32 — at the boundaries m = 3*2^k the quotient 2m/3 = 2^(k+1) is
    # computed exactly (representable result of a correctly-rounded divide),
    # elsewhere the quotient is >= 1/3 away from any power of two while the
    # rounding error is < 2^(j-24) (saturation at rounds >= 2^bits caps the
    # relevant m far below the fuzzy regime).  Saves two exp2 per element vs
    # the literal floor/bump form — LIS is the VPU bottleneck of the
    # integer attention.
    rounds = jnp.floor(jnp.log2(2.0 * softmax_inv / 3.0)) + 1.0
    mask = rounds >= 2**bit_type.bits
    qlog = jnp.clip(rounds, 0, 2**bit_type.bits - 1)
    deq = 2.0 ** (-qlog)
    return jnp.where(mask, 0.0, deq)


def log_int_softmax(x, scaling_factor, bit_type: BitType):
    """Full LIS: integer softmax → log2 quantize to ``bit_type`` → dequantize
    2^-q with saturation mask → 0 (layers.py:367-376).

    x: attention logits already fake-quantized on ``scaling_factor`` grid.
    Returns the dequantized softmax output in float.
    """
    return _lis_tail(*int_softmax(x, scaling_factor), bit_type)


def log_int_softmax_from_int(x_int, scaling_factor, bit_type: BitType):
    """LIS taking integer attention scores (x / scaling_factor) directly."""
    return _lis_tail(*int_softmax_from_int(x_int, scaling_factor), bit_type)
