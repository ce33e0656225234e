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
from .quant import floor_fn, round_fn


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


def _int_exp(x_int, scaling_factor, n: int = 32, ste: bool = False):
    """Integer exp via range reduction x = q·(-ln2) + r (layers.py:346-358).
    With ``ste`` only the final floor passes gradient through.  The
    range-reduction index q must stay HARD: an STE q would make
    dr/dx = 1 - x0·(1/x0) = 0 and kill the gradient into the polynomial;
    with q hard, dr/dx = 1 and the surrogate gradient is
    poly'(r)·2^(n-q) ∝ exp(x) locally — exactly the right shape."""
    x0 = -0.6931  # -ln2
    x0_int = jnp.floor(x0 / scaling_factor)
    x_int = jnp.maximum(x_int, n * x0_int)
    q = jnp.floor(x_int / x0_int)  # zero-gradient by construction
    r = x_int - x0_int * q
    exp_int, exp_sf = _int_polynomial(r, scaling_factor)
    exp_int = jnp.maximum(floor_fn(ste)(exp_int * 2.0 ** (n - q)), 0.0)
    return exp_int, exp_sf / 2.0**n


def int_softmax(x, scaling_factor, ste: bool = False):
    """(exp_int, exp_int_sum) of the shifted input (layers.py:331-365)."""
    return int_softmax_from_int(x / scaling_factor, scaling_factor, ste)


def int_softmax_from_int(x_int, scaling_factor, ste: bool = False):
    """Same, but taking the integer representation directly (the integer
    pipeline's attention scores arrive as int codes already)."""
    x_int = x_int - jnp.max(x_int, axis=-1, keepdims=True)
    exp_int, _ = _int_exp(x_int, scaling_factor, ste=ste)
    exp_sum = jnp.sum(exp_int, axis=-1, keepdims=True)
    return exp_int, exp_sum


def _lis_tail(exp_int, exp_sum, bit_type: BitType, ste: bool = False):
    # Reference LIS width is uint4; wider codes would need compare-correct
    # integer thresholds (3*2^k) because near 2^(2^bits) the 4/3 integer gap
    # is relatively tiny and hardware log2 error can flip the floor — see
    # ops/pallas/attention._lis_body for the measured margins.
    if bit_type.bits > 4:
        raise NotImplementedError(
            "LIS tail is hardened for bits<=4 only (reference BIT_TYPE_S is "
            "uint4); bits>4 needs compare-correct 3*2^k thresholds")
    softmax_inv = round_fn(ste)(exp_sum / exp_int)
    # log_round(m) == floor(log2(2m/3)) + 1 == floor(log2(4m/3)) for every
    # integer m >= 1: the bump condition m >= 1.5*2^f folds into the shifted
    # log.  The (1 + 2^-17) nudge guards the fold against hardware log2
    # undershoot at the exact power-of-two boundaries y = 4*(3*2^k)/3 = 2^(k+2)
    # (TPU log2(2^k) errs ±1.9e-6 on XLA, 0..+3.8e-6 in Mosaic — an undershoot
    # would drop the floor by one; margins measured in ops/pallas/attention
    # _lis_body).  Saves two exp2 per element vs the literal floor/bump form —
    # LIS is the VPU bottleneck of the integer attention.  Saturation compares
    # y (not rounds): y >= 2^(2^bits) <=> rounds >= 2^bits, and the 4/3
    # absolute gap at the boundary dwarfs the nudge.
    y = softmax_inv * (4.0 / 3.0 * (1.0 + 2.0**-17))
    sat = y >= 2.0 ** (2.0**bit_type.bits)
    deq = jnp.exp2(-floor_fn(ste)(jnp.log2(y)))
    return jnp.where(sat, 0.0, deq)


def log_int_softmax(x, scaling_factor, bit_type: BitType,
                    ste: bool = False):
    """Full LIS: integer softmax → log2 quantize to ``bit_type`` → dequantize
    2^-q with saturation mask → 0 (layers.py:367-376).

    x: attention logits already fake-quantized on ``scaling_factor`` grid.
    Returns the dequantized softmax output in float.  ``ste``: QAT-path
    straight-through rounding (grad-wise the tail behaves like
    (3/4)·exp_int/exp_sum — the softmax shape).
    """
    return _lis_tail(*int_softmax(x, scaling_factor, ste), bit_type, ste)


def log_int_softmax_from_int(x_int, scaling_factor, bit_type: BitType):
    """LIS taking integer attention scores (x / scaling_factor) directly."""
    return _lis_tail(*int_softmax_from_int(x_int, scaling_factor), bit_type)
