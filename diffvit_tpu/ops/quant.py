"""Pure quantize/dequantize primitives.

Functional equivalents of the reference's ``UniformQuantizer.quant /
dequantize`` (/root/reference/models/ptq/quantizer/uniform.py:50-127) and
``Log2Quantizer`` (quantizer/log2.py:17-26).  Scales/zero-points are plain
arrays; broadcasting replaces the reference's ``get_reshape_range``
(quantizer/base.py:14-31).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .bit_types import BitType


def ste_round(x):
    """round(x) forward, identity gradient (straight-through estimator).
    The QAT path's rounding surrogate — no reference equivalent (the
    reference never differentiates through its quantizers)."""
    return x + jax.lax.stop_gradient(jnp.round(x) - x)


def ste_floor(x):
    """floor(x) forward, identity gradient."""
    return x + jax.lax.stop_gradient(jnp.floor(x) - x)


def round_fn(ste: bool):
    return ste_round if ste else jnp.round


def floor_fn(ste: bool):
    return ste_floor if ste else jnp.floor


def reshape_range(shape_len: int, module_type: str):
    """Broadcast shape for a per-channel scale, mirroring
    quantizer/base.py:14-31.  ``module_type`` in {'conv_weight',
    'linear_weight', 'activation'}.  Activations are channels-last here
    (TPU-native layout), so the 4-D activation case broadcasts over the last
    axis rather than torch's NCHW axis 1."""
    if module_type == "conv_weight":
        return (-1, 1, 1, 1)
    if module_type == "linear_weight":
        return (-1, 1)
    if module_type == "activation":
        # channels-last: scale broadcasts over the trailing channel dim
        return (1,) * (shape_len - 1) + (-1,)
    raise NotImplementedError(module_type)


def quantize(x, scale, zero_point, bit_type: BitType, ste: bool = False):
    """x -> integer grid (still float dtype), clamped to the bit-type bounds.
    ``ste=True`` makes the round a straight-through estimator (clip still
    zeroes out-of-range gradients — clipped STE) for the QAT path."""
    q = round_fn(ste)(x / scale + zero_point)
    return jnp.clip(q, bit_type.lower_bound, bit_type.upper_bound)


def dequantize(q, scale, zero_point):
    return (q - zero_point) * scale


def fake_quant(x, scale, zero_point, bit_type: BitType, ste: bool = False):
    """quantize-then-dequantize (uniform.py via base.py:42-45 forward)."""
    return dequantize(quantize(x, scale, zero_point, bit_type, ste),
                      scale, zero_point)


def log2_quant(x, bit_type: BitType):
    """Log2 quantization of softmax outputs (quantizer/log2.py:17-22).

    Returns (codes, mask): codes = clamp(round(-log2 x), 0, 2^bits - 1);
    mask marks saturated entries that dequantize to 0."""
    rounds = jnp.round(-jnp.log2(x))
    mask = rounds >= 2**bit_type.bits
    codes = jnp.clip(rounds, 0, 2**bit_type.bits - 1)
    return codes, mask


def log2_dequant(codes, mask):
    """quantizer/log2.py:24-26: 2^-code with saturated entries zeroed."""
    out = 2.0 ** (-codes)
    return jnp.where(mask, 0.0, out)


def round_ln(x, mode: str | None = None):
    """PoT exponent of ``x``: floor/ceil/nearest-in-linear-space log2.

    Mirrors the reference's ``round_ln`` (observer/minmax.py:65-73): 'round'
    picks floor(log2 x) + 1 iff (x - 2^y) > (2^(y+1) - x), i.e. nearest power
    of two measured linearly, not in log space."""
    if mode == "ceil":
        return jnp.ceil(jnp.log2(x))
    if mode == "floor":
        return jnp.floor(jnp.log2(x))
    y = jnp.floor(jnp.log2(x))
    out = (x - 2.0**y) > (2.0 ** (y + 1) - x)
    return out.astype(y.dtype) + y


def lp_loss(pred, tgt, p: float = 2.0, reduction: str = "none"):
    """L_p error metric (observer/utils.py:2-9)."""
    if reduction == "none":
        return jnp.mean(jnp.sum(jnp.abs(pred - tgt) ** p, axis=1))
    return jnp.mean(jnp.abs(pred - tgt) ** p)
