"""Integer LayerNorm (I-LayerNorm) — the fixed-point M·2^-N scheme.

Functional rebuild of ``QIntLayerNorm`` (/root/reference/models/ptq/
layers.py:226-291).  The input arrives fake-quantized on a per-channel PTF
grid ``in_scale``; the kernel reconstructs the integer representation, does an
integer mean/std, folds the affine transform and the output requantization
into a per-channel fixed-point multiplier M·2^-N (get_MN, layers.py:234-238),
and emits the output already on the consumer's quantization grid
``out_scale`` (optionally multiplied by a SmoothQuant channel scale).

This file is the XLA-fusable jnp implementation; a Pallas kernel with the
same signature lives in ops/pallas/.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .quant import floor_fn, round_fn


def get_mn(x, ste: bool = False):
    """Fixed-point decomposition A ≈ M · 2^-N with a 7-bit mantissa
    (layers.py:234-238).  With ``ste`` the mantissa floor passes gradient
    through (N is an exponent choice — kept non-differentiable)."""
    bit = 7
    n = jnp.clip(bit - jnp.floor(jnp.log2(jax.lax.stop_gradient(x)
                                          if ste else x)), 0, 31)
    m = jnp.clip(floor_fn(ste)(x * (2.0**n)), 0, 2 ** (bit + 1) - 1)
    return m, n


def int_layernorm(x, weight, bias, in_scale, out_scale, *,
                  out_scale_channel=None, in_scale_expand: int = 1,
                  ste: bool = False):
    """Integer LayerNorm over the last axis.

    x:            (..., C) fake-quantized input (float holding grid values)
    weight, bias: (C,) LN affine parameters
    in_scale:     per-channel input quant scale — (C,) for PTF, scalar else
    out_scale:    the consumer QAct's scale (scalar, or (C,) for PTF)
    out_scale_channel: optional per-channel multiplier folded into out_scale
                  (the SmoothQuant channel scale of the consuming linear,
                  layers.py:264-267)
    in_scale_expand: replicate in_scale k× channel-interleaved for Swin patch
                  merging's 4-way concat (layers.py:257-259)
    """
    c = x.shape[-1]
    in_scale = jnp.asarray(in_scale)
    if in_scale_expand != 1:
        # torch: in_scale.unsqueeze(-1).expand(-1, k).T.reshape(-1)
        # => out[i] = in_scale[i % C0]  (tile, not repeat_interleave)
        in_scale = jnp.tile(in_scale, in_scale_expand)
    in_scale = jnp.broadcast_to(in_scale, (c,))

    out_scale = jnp.asarray(out_scale)
    if out_scale_channel is not None:
        out_scale = out_scale * out_scale_channel
    out_scale = jnp.broadcast_to(out_scale, (c,))

    x_q = round_fn(ste)(x / in_scale)
    in_scale1 = jnp.min(in_scale)
    scale_mask = jnp.round(in_scale / in_scale1)
    x_q = x_q * scale_mask  # integers on the common in_scale1 grid

    sum_x = jnp.sum(x_q, axis=-1)
    sum_x2 = jnp.sum(x_q**2, axis=-1)
    mean_x_q = (sum_x / c) * in_scale1
    std_x_q = (in_scale1 / c) * jnp.sqrt(c * sum_x2 - sum_x**2)

    a = (in_scale1 / std_x_q)[..., None] * weight / out_scale
    a_sign = jnp.sign(a)
    m, n = get_mn(jnp.abs(a), ste)
    b = round_fn(ste)(
        (bias - (mean_x_q / std_x_q)[..., None] * weight) / out_scale * (2.0**n)
    )
    x_q = round_fn(ste)((a_sign * m * x_q + b) / (2.0**n))
    return x_q * out_scale


def float_layernorm(x, weight, bias, eps: float = 1e-6):
    """Plain float LayerNorm ('ln' mode, layers.py:252-254)."""
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mean) / jnp.sqrt(var + eps) * weight + bias
