"""Fused quantized attention kernel (Pallas/Mosaic, TPU).

Fuses the whole attention inner loop of the integer path —

    scores_i32 = q_i8 @ k_i8^T
    a_int      = clip(round(scores * s1^2*attn_scale/s_a))     (qact_attn1)
    attn       = LogIntSoftmax(a_int)                          (2^-q codes)
    out        = clip(round((attn @ v_i8) * s1/s2))            (qact2 requant)

— into one kernel, so the (B, H, N, N) score and attention matrices never
touch HBM (for DeiT-S at batch 256 that's ~1 GB of round trips per step on
the XLA path).

Layout: q/k/v arrive as one (B, 3, H, N_pad, D) int8 array (the transposed,
requantized qkv linear output); the kernel grid is (B/G, H) with per-program
blocks of G batch elements × one head — G amortizes DMA and fixed program
overhead over G (N,D)-sized matmul pairs.  Output is (B, H, N_pad, D) int8.

The sequence is padded to a multiple of 128 tokens; padded key columns are
masked out of the integer softmax (their exp_int is zeroed, which makes the
LIS inversion saturate and dequantize to exactly 0, matching the reference's
saturation semantics).  Padded query rows produce garbage the caller slices
off.

int8 operands are exact in bfloat16 (|x| <= 128 < 2^8), products and f32
partial sums stay below 2^24, so the bf16 MXU matmuls here are bit-exact
integer arithmetic.

Reference semantics: QIntSoftmax.int_softmax + log_round
(/root/reference/models/ptq/layers.py:323-376).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _lis_body(a_int, scale, bits, col_ok):
    """Log-Int-Softmax on integer scores (f32 carrier), cols masked by
    ``col_ok``.  Returns bf16 attention weights.

    (A bitcast-based exp2/log2 variant was measured slower than the VPU
    transcendentals here — the int<->float relayouts cost more than the
    transcendental units; keeping the jnp forms.)"""
    neg_inf_rows = jnp.where(col_ok, a_int, -jnp.inf)
    x_int = a_int - jnp.max(neg_inf_rows, axis=-1, keepdims=True)
    # int_exp (layers.py:346-358), n = 32
    x0 = -0.6931
    n = 32.0
    x0_int = jnp.floor(x0 / scale)
    x_int = jnp.maximum(x_int, n * x0_int)
    q = jnp.floor(x_int / x0_int)
    r = x_int - x0_int * q
    # int_polynomial (layers.py:334-344)
    b_int = jnp.floor((0.96963238 / 0.35815147) / scale)
    c_int = jnp.floor((1.0 / 0.35815147) / (scale * scale))
    poly = r * (r + b_int) + c_int
    exp_int = jnp.maximum(jnp.floor(poly * jnp.exp2(n - q)), 0.0)
    exp_int = jnp.where(col_ok, exp_int, 0.0)
    exp_sum = jnp.sum(exp_int, axis=-1, keepdims=True)
    # log2 quantization (layers.py:367-376); exp_int == 0 -> inf -> masked 0
    # log_round(m) == floor(log2(2m/3)) + 1, bit-exact (see ops/lis.py)
    softmax_inv = jnp.round(exp_sum / exp_int)
    rounds = jnp.floor(jnp.log2(2.0 * softmax_inv / 3.0)) + 1.0
    sat = rounds >= 2.0**bits
    qlog = jnp.clip(rounds, 0.0, 2.0**bits - 1.0)
    deq = jnp.where(sat, 0.0, jnp.exp2(-qlog))
    return deq.astype(jnp.bfloat16)


def _attn_kernel(qkv_ref, scal_ref, out_ref, *, n_real, bits, lis, group):
    # qkv_ref: (G, 3, 1, N, D) int8 — G batch elements, one head
    # scal_ref: SMEM (3,) f32 = [c1, s1_over_s2, s_a]
    # out_ref: (G, 1, N, D) int8
    c1 = scal_ref[0]
    s1_over_s2 = scal_ref[1]
    s_a = scal_ref[2]

    npad = qkv_ref.shape[3]
    col = jax.lax.broadcasted_iota(jnp.int32, (npad, npad), dimension=1)
    col_ok = col < n_real

    for g in range(group):
        q = qkv_ref[g, 0, 0, :, :].astype(jnp.bfloat16)
        k = qkv_ref[g, 1, 0, :, :].astype(jnp.bfloat16)
        v = qkv_ref[g, 2, 0, :, :].astype(jnp.bfloat16)

        scores = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        a_int = jnp.clip(jnp.round(scores * c1), -128.0, 127.0)

        if lis:
            attn = _lis_body(a_int, s_a, bits, col_ok)
        else:
            logits = jnp.where(col_ok, a_int * s_a, -jnp.inf)
            attn = jax.nn.softmax(logits, axis=-1).astype(jnp.bfloat16)

        o = jax.lax.dot_general(
            attn, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        o = jnp.clip(jnp.round(o * s1_over_s2), -128.0, 127.0)
        out_ref[g, 0, :, :] = o.astype(jnp.int8)


def _qkv_attn_kernel(x_ref, wq_ref, wk_ref, wv_ref, mult_ref, bias_ref,
                     scal_ref, out_ref, *, n_real, bits, lis, nheads):
    # x_ref:   (1, N, Cin) int8 — LN output codes, one batch element
    # w*_ref:  (H, Cin, D) int8 — per-head q/k/v weight blocks
    # mult_ref:(3, H, D) f32 — int32->f32 output multipliers (s_x * s_w)
    # bias_ref:(3, H, D) f32
    # scal_ref: SMEM (4,) f32 = [s_a, c1, 1/s1, s1/s2]
    # out_ref: (1, H, N, D) int8 on the qact2 grid
    #
    # One program per batch element computes every head, software-pipelined:
    # head h+1's projections/scores (MXU) carry no dependency on head h's
    # LIS (VPU), so issuing them before the LIS lets the scheduler overlap
    # the units (~7% measured).
    s_a = scal_ref[0]
    c1 = scal_ref[1]
    s1_inv = scal_ref[2]
    s1_over_s2 = scal_ref[3]

    x = x_ref[0]  # (N, Cin) int8
    npad = x.shape[0]
    col = jax.lax.broadcasted_iota(jnp.int32, (npad, npad), dimension=1)
    col_ok = col < n_real

    def head_proj(w_ref, slot, h):
        acc = jax.lax.dot_general(
            x, w_ref[h], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        y = acc.astype(jnp.float32) * mult_ref[slot, h][None, :] \
            + bias_ref[slot, h][None, :]
        # qact1 requant (the attention operates on the qact1 int grid)
        return jnp.clip(jnp.round(y * s1_inv), -128.0, 127.0) \
            .astype(jnp.bfloat16)

    def scores_of(h):
        q = head_proj(wq_ref, 0, h)
        k = head_proj(wk_ref, 1, h)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        return jnp.clip(jnp.round(s * c1), -128.0, 127.0)

    # deeper pipeline: v(h+1) and scores(h+1) (MXU) are both issued before
    # LIS(h) (VPU) so the whole next head's matmul burst overlaps this
    # head's vector work (~13% measured over the shallow pipeline)
    a_cur = scores_of(0)
    v_cur = head_proj(wv_ref, 2, 0)
    for h in range(nheads):
        a_next = scores_of(h + 1) if h + 1 < nheads else None
        v_next = head_proj(wv_ref, 2, h + 1) if h + 1 < nheads else None
        if lis:
            attn = _lis_body(a_cur, s_a, bits, col_ok)
        else:
            logits = jnp.where(col_ok, a_cur * s_a, -jnp.inf)
            attn = jax.nn.softmax(logits, axis=-1).astype(jnp.bfloat16)
        o = jax.lax.dot_general(
            attn, v_cur, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        o = jnp.clip(jnp.round(o * s1_over_s2), -128.0, 127.0)
        out_ref[0, h] = o.astype(jnp.int8)
        a_cur, v_cur = a_next, v_next


def _attn_block_kernel(x_ref, h_ref, wq_ref, wk_ref, wv_ref, wp_ref,
                       mult_ref, bias_ref, pvec_ref, scal_ref, out_ref, *,
                       n_real, bits, lis, nheads):
    # Everything _qkv_attn_kernel does, plus the proj matmul accumulated
    # across heads and the qact3 / residual-add / qact2 fences — the whole
    # attention half of a block in one kernel.
    # h_ref:   (1, N, C) f32 — residual stream
    # wp_ref:  (H, D, C) int8 — per-head proj weight blocks
    # pvec_ref:(4, C) f32 — [mult_p (s2*s_wp), bias_p, qact3 scale (PTF),
    #          qact2 scale (PTF)]
    # out_ref: (1, N, C) f32 — the updated residual stream
    s_a = scal_ref[0]
    c1 = scal_ref[1]
    s1_inv = scal_ref[2]
    s1_over_s2 = scal_ref[3]

    x = x_ref[0]
    npad = x.shape[0]
    col = jax.lax.broadcasted_iota(jnp.int32, (npad, npad), dimension=1)
    col_ok = col < n_real

    def head_proj(w_ref, slot, h):
        acc = jax.lax.dot_general(
            x, w_ref[h], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        y = acc.astype(jnp.float32) * mult_ref[slot, h][None, :] \
            + bias_ref[slot, h][None, :]
        return jnp.clip(jnp.round(y * s1_inv), -128.0, 127.0) \
            .astype(jnp.bfloat16)

    def scores_of(h):
        q = head_proj(wq_ref, 0, h)
        k = head_proj(wk_ref, 1, h)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        return jnp.clip(jnp.round(s * c1), -128.0, 127.0)

    a_cur = scores_of(0)
    v_cur = head_proj(wv_ref, 2, 0)
    proj_acc = None
    for h in range(nheads):
        a_next = scores_of(h + 1) if h + 1 < nheads else None
        v_next = head_proj(wv_ref, 2, h + 1) if h + 1 < nheads else None
        if lis:
            attn = _lis_body(a_cur, s_a, bits, col_ok)
        else:
            logits = jnp.where(col_ok, a_cur * s_a, -jnp.inf)
            attn = jax.nn.softmax(logits, axis=-1).astype(jnp.bfloat16)
        o = jax.lax.dot_general(
            attn, v_cur, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        o_i8 = jnp.clip(jnp.round(o * s1_over_s2), -128.0, 127.0) \
            .astype(jnp.int8)
        # accumulate this head's slice of the proj matmul (int32)
        part = jax.lax.dot_general(
            o_i8, wp_ref[h], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        proj_acc = part if proj_acc is None else proj_acc + part
        a_cur, v_cur = a_next, v_next

    mult_p = pvec_ref[0][None, :]
    bias_p = pvec_ref[1][None, :]
    s3 = pvec_ref[2][None, :]
    s_blk2 = pvec_ref[3][None, :]
    y = proj_acc.astype(jnp.float32) * mult_p + bias_p
    y = jnp.clip(jnp.round(y / s3), -128.0, 127.0) * s3      # attn.qact3
    hn = h_ref[0] + y                                        # residual
    hn = jnp.clip(jnp.round(hn / s_blk2), -128.0, 127.0) * s_blk2  # qact2
    out_ref[0] = hn


def fused_attention_block(x_i8, h, wq, wk, wv, wp, mult, bias, pvec, scalars,
                          *, n_real, bits=4, lis=True, interpret=False):
    """Whole attention half-block: per-head qkv projection, LIS attention,
    proj, qact3, residual add and the block-level qact2 fence, fused.
    x_i8: (B, N_pad, Cin) int8 LN codes; h: (B, N_pad, C) f32 residual.
    wp: (H, D, C) int8; pvec: (4, C) f32 [mult_p, bias_p, s_qact3, s_qact2].
    Returns the updated residual stream (B, N_pad, C) f32."""
    b, npad, cin = x_i8.shape
    hh, _, d = wq.shape
    c = wp.shape[2]
    kernel = functools.partial(_attn_block_kernel, n_real=n_real, bits=bits,
                               lis=lis, nheads=hh)
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, npad, cin), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, npad, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # wq
            pl.BlockSpec(memory_space=pltpu.VMEM),  # wk
            pl.BlockSpec(memory_space=pltpu.VMEM),  # wv
            pl.BlockSpec(memory_space=pltpu.VMEM),  # wp
            pl.BlockSpec(memory_space=pltpu.VMEM),  # mult
            pl.BlockSpec(memory_space=pltpu.VMEM),  # bias
            pl.BlockSpec(memory_space=pltpu.VMEM),  # pvec
            pl.BlockSpec(memory_space=pltpu.SMEM),  # scalars
        ],
        out_specs=pl.BlockSpec((1, npad, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, npad, c), jnp.float32),
        interpret=interpret,
    )(x_i8, h, wq, wk, wv, wp, mult, bias, pvec, scalars)


def fused_qkv_attention(x_i8, wq, wk, wv, mult, bias, scalars, *, n_real,
                        bits=4, lis=True, interpret=False):
    """Fully-fused attention: per-head qkv projection + requant + scores +
    LIS + attn@v + output requant in one kernel.

    x_i8:    (B, N_pad, Cin) int8 — integer LayerNorm output codes (the
             qkv in_scale grid).  No transposes anywhere: the per-head
             weight layout (H, Cin, D) is prepared once on the host, and
             the (B, H, N_pad, D) output is consumed by the proj matmul as
             a joint (H, D) contraction.
    wq/wk/wv: (H, Cin, D) int8.
    mult/bias: (3, H, D) f32 — [q, k, v] output multiplier / bias.
    scalars: (4,) f32 [s_a, s1^2*attn_scale/s_a, 1/s1, s1/s2].
    Returns (B, H, N_pad, D) int8 on the qact2 grid.
    """
    b, npad, cin = x_i8.shape
    h, _, d = wq.shape
    kernel = functools.partial(_qkv_attn_kernel, n_real=n_real, bits=bits,
                               lis=lis, nheads=h)
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, npad, cin), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # wq (full)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # wk
            pl.BlockSpec(memory_space=pltpu.VMEM),  # wv
            pl.BlockSpec(memory_space=pltpu.VMEM),  # mult
            pl.BlockSpec(memory_space=pltpu.VMEM),  # bias
            pl.BlockSpec(memory_space=pltpu.SMEM),  # scalars
        ],
        out_specs=pl.BlockSpec((1, h, npad, d), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, npad, d), jnp.int8),
        interpret=interpret,
    )(x_i8, wq, wk, wv, mult, bias, scalars)


def fused_int_attention(qkv_i8, scalars, *, num_heads, n_real, bits=4,
                        lis=True, group=8, interpret=False):
    """qkv_i8: (B, 3, H, N_pad, D) int8 on the qact1 grid.
    scalars: (3,) f32 [s1^2*attn_scale/s_a, s1/s2, s_a].
    Returns (B, H, N_pad, D) int8 on the qact2 grid."""
    b, three, h, npad, d = qkv_i8.shape
    assert three == 3 and h == num_heads
    while b % group:
        group //= 2
    kernel = functools.partial(_attn_kernel, n_real=n_real, bits=bits,
                               lis=lis, group=group)
    return pl.pallas_call(
        kernel,
        grid=(b // group, h),
        in_specs=[
            pl.BlockSpec((group, 3, 1, npad, d), lambda i, j: (i, 0, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((group, 1, npad, d), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, npad, d), jnp.int8),
        interpret=interpret,
    )(qkv_i8, scalars)
