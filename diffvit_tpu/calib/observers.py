"""Calibration observers as pure functions.

TPU-native rebuild of /root/reference/models/ptq/observer/*.py.  Instead of
stateful observer objects mutated during a forward pass, each observer here is
a pure function ``(tensor[, aux]) -> (scale, zero_point)`` that can be traced
under ``jax.jit``.  The reference's per-channel / per-candidate Python loops
become batched candidate scoring (a handful of full-tensor ops or matmuls),
which is how the search maps onto the MXU/VPU instead of a host loop.

Semantics notes (verified against the reference source):

* Weight observers are built once with a *signed* bit type, so
  ``self.symmetric`` stays True even when the calibration sweep retags the
  observer with uint3/uint4 (layers.py:156 mutates ``bit_type`` but never
  ``symmetric``).  Hence weights are ALWAYS quantized symmetrically (zp=0),
  including the unsigned bit types whose [0, 2^b-1] clamp discards negatives.
  We replicate that exactly.
* The minmax PoT search (minmax.py:180-242) scores 4 candidate exponents
  [floor(log2 s)-1 .. floor(log2 s)+2] by the L2 error of the layer *output*
  reconstructed with the candidate-quantized weight; per-channel selection
  decomposes per output channel, so we batch it as 4 matmuls + a per-column
  argmin.
* The calibration protocol is single-batch (test_quant.py:245-246): the same
  batch feeds both the min/max statistics and the candidate scoring, so these
  functions take the calibration tensor directly.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.bit_types import BitType
from ..ops.quant import fake_quant, round_ln

_EPS = float(jnp.finfo(jnp.float32).eps)


# ---------------------------------------------------------------------------
# Stats helpers (BaseObserver.reshape_tensor + min/max, observer/base.py:16-29)
# ---------------------------------------------------------------------------

def weight_minmax(w2d, channel_wise: bool):
    """w2d: weight reshaped to (Cout, -1).  Returns per-channel (or scalar)
    running max/min — single-batch, so 'running' == current."""
    mx = jnp.max(w2d, axis=1)
    mn = jnp.min(w2d, axis=1)
    if not channel_wise:
        mx = jnp.max(mx)
        mn = jnp.min(mn)
    return mx, mn


def act_minmax(x, channel_wise: bool):
    """x: activation (..., C) channels-last.  Per-channel max/min over all
    leading dims; layer-wise collapses to scalars."""
    flat = x.reshape(-1, x.shape[-1])
    mx = jnp.max(flat, axis=0)
    mn = jnp.min(flat, axis=0)
    if not channel_wise:
        mx = jnp.max(mx)
        mn = jnp.min(mn)
    return mx, mn


def _symmetric_base_scale(mx, mn, bit_type: BitType):
    """scale = max(|min|, max) / ((qmax - qmin)/2)   (minmax.py:244-247)."""
    m = jnp.maximum(-mn, mx)
    return m / ((bit_type.upper_bound - bit_type.lower_bound) / 2.0)


# ---------------------------------------------------------------------------
# Minmax observer with PoT output-aware exponent search (the P2-ViT core)
# ---------------------------------------------------------------------------

_POT_OFFSETS = (-1.0, 0.0, 1.0, 2.0)  # candidate set, minmax.py:215-228


def minmax_weight_qparams(w2d, x_in, bit_type: BitType, channel_wise: bool):
    """Scale/zp for a weight site via the minmax + PoT output search.

    w2d:  (Cout, K) weight (linear: K=Cin; conv flattened to K=kh*kw*Cin —
          the rebuild implements patchify convs as matmuls so the linear
          reconstruction applies uniformly).
    x_in: (..., K) the layer's calibration input (FP / smoothed).
    Returns (scale, zero_point); scale shape (Cout,) if channel_wise else ().
    Bias cancels in the L2 difference so it is omitted from reconstruction.
    """
    mx, mn = weight_minmax(w2d, channel_wise)
    base = _symmetric_base_scale(mx, mn, bit_type)
    af = round_ln(base, "floor")

    X = x_in.reshape(-1, w2d.shape[1])
    Y = X @ w2d.T  # FP reference output, (B*, Cout)

    scores = []
    for off in _POT_OFFSETS:
        s = 2.0 ** (af + off)
        s_b = s[:, None] if channel_wise else s
        wq = fake_quant(w2d, s_b, 0.0, bit_type)
        Yq = X @ wq.T
        err = (Yq - Y) ** 2
        # per-channel score = mean over rows (matches lp_loss(...,'all') on the
        # single-channel slice); layer-wise score = global mean
        scores.append(jnp.mean(err, axis=0) if channel_wise else jnp.mean(err))
    score = jnp.stack(scores)          # (4, Cout) or (4,)
    idx = jnp.argmin(score, axis=0)
    alpha = af - 1.0 + idx.astype(af.dtype)
    scale = jnp.maximum(2.0**alpha, _EPS)
    zp = jnp.zeros_like(scale)
    return scale, zp


def make_attn_replay(num_heads: int, dim: int, scale: float):
    """The observer's attention replay (get_attn, minmax.py:77-117): treat
    the tensor as a (B, N, 3C) qkv output, replay heads-split q@k^T*scale ->
    float softmax -> @v, and score the PoT candidate through that output.
    ``attn_para=[num_heads, C, scale]`` in the reference call sites
    (models/ptq/layers.py:164, vit_fquant.py:254)."""

    def replay(x):
        b, n, _ = x.shape
        hd = dim // num_heads
        qkv = x.reshape(b, n, 3, num_heads, hd).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = (q @ k.transpose(0, 1, 3, 2)) * scale
        attn = jax.nn.softmax(attn, axis=-1)
        return (attn @ v).transpose(0, 2, 1, 3).reshape(b, n, dim)

    return replay


def minmax_act_qparams(x, bit_type: BitType, attn_replay=None, stats=None):
    """Scale/zp for an activation site (layer-wise, symmetric) via minmax +
    PoT search scoring the (optionally attention-replayed) tensor itself
    (minmax.py:139-152,180-242 activation path).

    attn_replay: optional fn(x)->tensor replaying qkv->softmax->v so the
    candidate is scored through attention (get_attn, minmax.py:77-117).
    stats: optional running (max, min) from multi-batch observation; the
    candidate scoring always uses the final batch ``x`` (the reference's
    self.input).
    """
    mx, mn = stats if stats is not None else act_minmax(x, channel_wise=False)
    base = _symmetric_base_scale(mx, mn, bit_type)
    af = round_ln(base, "floor")

    ref = attn_replay(x) if attn_replay is not None else x
    scores = []
    for off in _POT_OFFSETS:
        s = 2.0 ** (af + off)
        xq = fake_quant(x, s, 0.0, bit_type)
        out = attn_replay(xq) if attn_replay is not None else xq
        scores.append(jnp.mean((out - ref) ** 2))
    idx = jnp.argmin(jnp.stack(scores))
    alpha = af - 1.0 + idx.astype(af.dtype)
    scale = jnp.maximum(2.0**alpha, _EPS)
    return scale, jnp.zeros_like(scale)


def minmax_act_qparams_asymmetric(x, bit_type: BitType, stats=None):
    """The uint8 asymmetric QAct path (layers.py:207-212 retags the site's
    observer/quantizer to uint8 with ``symmetric=False`` when
    ``asymmetric=True``; minmax.py:263-271 is the non-symmetric branch):
    scale = (max-min)/(qmax-qmin), zp = clamp(qmin - round(min/scale)),
    then the same 4-candidate PoT search scores fake-quant WITH the zero
    point.  Unused by every active reference call site (all pass
    asymmetric=False) but part of the published QAct surface."""
    mx, mn = stats if stats is not None else act_minmax(x, channel_wise=False)
    qmax, qmin = bit_type.upper_bound, bit_type.lower_bound
    base = jnp.maximum((mx - mn) / float(qmax - qmin), _EPS)
    zp = jnp.clip(qmin - jnp.round(mn / base), qmin, qmax)
    af = round_ln(base, "floor")
    scores = []
    for off in _POT_OFFSETS:
        s = 2.0 ** (af + off)
        xq = fake_quant(x, s, zp, bit_type)
        scores.append(jnp.mean((xq - x) ** 2))
    idx = jnp.argmin(jnp.stack(scores))
    alpha = af - 1.0 + idx.astype(af.dtype)
    return jnp.maximum(2.0**alpha, _EPS), zp


# ---------------------------------------------------------------------------
# EMA / percentile observers (plain scales, no PoT — ema.py:38-58,
# percentile.py:51-71).  Single calibration batch ⇒ the EMA reduces to the
# current batch's stats.
# ---------------------------------------------------------------------------

def _plain_symmetric(mx, mn, bit_type: BitType):
    m = jnp.maximum(-mn, mx)
    scale = jnp.maximum(m / ((bit_type.upper_bound - bit_type.lower_bound) / 2.0), _EPS)
    return scale, jnp.zeros_like(scale)


def ema_act_qparams(x, bit_type: BitType, stats=None):
    mx, mn = stats if stats is not None else act_minmax(x, channel_wise=False)
    return _plain_symmetric(mx, mn, bit_type)


def percentile_act_qparams(x, bit_type: BitType, alpha: float = 0.99999,
                           stats=None):
    if stats is not None:
        mx, mn = stats
    else:
        flat = x.reshape(-1)
        mx = jnp.quantile(flat, alpha)
        mn = jnp.quantile(flat, 1.0 - alpha)
    return _plain_symmetric(mx, mn, bit_type)


# ---------------------------------------------------------------------------
# OMSE observer (omse.py:31-56): 90-step range shrink minimizing L2 error.
# Always the asymmetric scale/zp formula, even for signed types.
# ---------------------------------------------------------------------------

def omse_act_qparams(x, bit_type: BitType, stats=None):
    mx, mn = stats if stats is not None else act_minmax(x, channel_wise=False)
    qmax, qmin = bit_type.upper_bound, bit_type.lower_bound

    def step(i, best):
        best_score, best_scale, best_zp = best
        shrink = 1.0 - i.astype(jnp.float32) * 0.01
        new_max, new_min = mx * shrink, mn * shrink
        scale = jnp.maximum((new_max - new_min) / float(qmax - qmin), _EPS)
        zp = jnp.clip(qmin - jnp.round(new_min / scale), qmin, qmax)
        xq = fake_quant(x, scale, zp, bit_type)
        score = jnp.mean((x - xq) ** 2)
        better = score < best_score
        return (
            jnp.where(better, score, best_score),
            jnp.where(better, scale, best_scale),
            jnp.where(better, zp, best_zp),
        )

    init = (jnp.asarray(1e10, jnp.float32), jnp.asarray(1.0, jnp.float32),
            jnp.asarray(0.0, jnp.float32))
    _, scale, zp = jax.lax.fori_loop(0, 90, step, init)
    return scale, zp


# ---------------------------------------------------------------------------
# PTF observer (ptf.py:34-134): FQ-ViT Power-of-Two-Factor for LayerNorm input
# activations.  One global symmetric base scale (scale8, NOT PoT-rounded in
# the active reference code) and a per-channel factor mask ∈ {1,2,4,8}.
# ---------------------------------------------------------------------------

def ptf_act_qparams(x, bit_type: BitType, stats=None):
    """x: (..., C).  Returns (scale (C,), zero_point scalar 0).
    scale = scale1 * mask where scale1 = scale8/8 and per-channel mask chooses
    among {scale1, scale2, scale4, scale8} by L2 quantization error
    (ptf.py:96-133).  The per-channel loop decomposes per channel, so we score
    4 full-tensor quantizations and argmin per column."""
    qmax, qmin = bit_type.upper_bound, bit_type.lower_bound
    flat = x.reshape(-1, x.shape[-1])
    if stats is not None:
        max_t = jnp.maximum(-jnp.min(stats[1]), jnp.max(stats[0]))
    else:
        max_t = jnp.maximum(-jnp.min(flat), jnp.max(flat))
    scale8 = jnp.maximum(2.0 * max_t / float(qmax - qmin), _EPS)
    scale1 = scale8 / 8.0

    scores = []
    for k in range(4):
        s = scale1 * (2.0**k)
        xq = fake_quant(flat, s, 0.0, bit_type)
        scores.append(jnp.mean((flat - xq) ** 2, axis=0))  # per channel
    idx = jnp.argmin(jnp.stack(scores), axis=0)            # (C,)
    mask = 2.0 ** idx.astype(jnp.float32)
    scale = scale1 * mask
    return scale, jnp.zeros(())


# ---------------------------------------------------------------------------
# Dispatch
# ---------------------------------------------------------------------------

ACT_OBSERVERS = {
    "minmax": minmax_act_qparams,
    "ema": ema_act_qparams,
    "omse": omse_act_qparams,
    "percentile": percentile_act_qparams,
    "ptf": ptf_act_qparams,
}


def act_qparams(observer: str, x, bit_type: BitType, attn_replay=None,
                stats=None):
    """Compute (scale, zp) for an activation site with the named observer.
    Only minmax consumes ``attn_replay`` (minmax.py:142-152).  ``stats``:
    optional running observation state (multi-batch calibration)."""
    if observer == "minmax":
        return minmax_act_qparams(x, bit_type, attn_replay=attn_replay,
                                  stats=stats)
    return ACT_OBSERVERS[observer](x, bit_type, stats=stats)


# ---------------------------------------------------------------------------
# Multi-batch observation state (the reference's commented-out calib loop,
# test_quant.py:238-243: observers update on every batch, the last batch
# finalizes).  State semantics per observer class:
#   minmax/omse: running max/min (minmax.py:24-39, omse.py:14-29)
#   ptf:         running per-channel max/min (ptf.py:14-31)
#   ema:         EMA with sigma=0.01 (ema.py:19-36)
#   percentile:  EMA of the quantiles (percentile.py:23-49)
# ---------------------------------------------------------------------------

def act_stats_update(observer: str, state, x, percentile_alpha=0.99999):
    if observer in ("minmax", "omse", "ema"):
        mx, mn = act_minmax(x, channel_wise=False)
    elif observer == "ptf":
        mx, mn = act_minmax(x, channel_wise=True)
    elif observer == "percentile":
        flat = x.reshape(-1)
        mx = jnp.quantile(flat, percentile_alpha)
        mn = jnp.quantile(flat, 1.0 - percentile_alpha)
    else:
        raise KeyError(observer)
    if state is None:
        return (mx, mn)
    if observer in ("ema", "percentile"):
        return (state[0] + 0.01 * (mx - state[0]),
                state[1] + 0.01 * (mn - state[1]))
    return (jnp.maximum(state[0], mx), jnp.minimum(state[1], mn))


# Jitted entry points: calibration is orchestrated eagerly at the model level
# so that the 12 structurally-identical blocks reuse one compiled kernel per
# (site shape, observer, bit type) instead of tracing a monolithic graph —
# this cuts full-model calibration compile time from minutes to seconds.
minmax_weight_qparams = jax.jit(
    minmax_weight_qparams, static_argnames=("bit_type", "channel_wise"))
minmax_act_qparams = jax.jit(
    minmax_act_qparams, static_argnames=("bit_type", "attn_replay"))
ema_act_qparams = jax.jit(ema_act_qparams, static_argnames=("bit_type",))
omse_act_qparams = jax.jit(omse_act_qparams, static_argnames=("bit_type",))
percentile_act_qparams = jax.jit(
    percentile_act_qparams, static_argnames=("bit_type", "alpha"))
ptf_act_qparams = jax.jit(ptf_act_qparams, static_argnames=("bit_type",))
ACT_OBSERVERS = {
    "minmax": minmax_act_qparams,
    "ema": ema_act_qparams,
    "omse": omse_act_qparams,
    "percentile": percentile_act_qparams,
    "ptf": ptf_act_qparams,
}
