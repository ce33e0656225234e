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
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def lis_fast_ok(scale_value: float) -> bool:
    """Concrete-scale validity window for ``_lis_body(fast=True)``'s
    provably-no-op floor/max elision (see its docstring) — the ONE place
    the bound lives; vit_int._block_int, pallas/serve.prepare_resident
    and parallel/pipeline.prepare_pp all gate through it."""
    return 2.0**-10 <= scale_value <= 0.6931


def _lis_body(a_int, scale, bits, col_ok, fast=False):
    """Log-Int-Softmax on integer scores (f32 carrier), cols masked by
    ``col_ok``.  Returns bf16 attention weights.

    (A bitcast-based exp2/log2 variant was measured slower than the VPU
    transcendentals here — the int<->float relayouts cost more than the
    transcendental units; keeping the jnp forms.)

    VPU pass-count cuts, each provably value-identical to the literal
    reference form (layers.py:323-376):

    * ``q = floor((x - 0.5)/x0)`` replaces ``floor(x / x0)``: x and x0 are
      integer-valued with x/x0 in [0, 32] and x0 < 0, so the true quotient
      is either an exact multiple or at least 1/|x0| above one; the shifted
      numerator places the computed value 0.5/|x0| above the true quotient
      with total rounding error <= 33*2^-23, so floor agrees whenever
      0.5/|x0| is larger than both that error and 1 - (|x0|-0.5)/|x0| —
      i.e. for every |x0_int| in (0.5, 1.2e5), which s_a >= 2^-17
      guarantees.  One fma replaces a multi-pass divide.
    * ``minimum(rounds, 2^bits-1)`` replaces the two-sided clip: m =
      round(exp_sum/exp_int) >= 1 always (the sum includes the element), so
      rounds = floor(log2(2m/3)) + 1 >= floor(log2(2/3)) + 1 = 0.
    * ``fast=True`` (caller asserts s_a in [2^-10, ln2]) additionally drops
      ``maximum(floor(poly * 2^(n-q)), 0)``: poly = r(r+b_int)+c_int is a
      positive integer < 2^24 on the clamped r range (minimum over
      r in (x0_int, 0] is ~1.39/s_a^2 > 0, maximum ~4.7/s_a^2 < 2^24 for
      s_a >= 2^-10, so it is exactly representable), and 2^(n-q) with
      integer q in [0, 32] is an exact power of two >= 1 — the product is
      already an exact non-negative integer-valued f32."""
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
    if fast:
        exp_int = poly * jnp.exp2(n - q)
    else:
        exp_int = jnp.maximum(jnp.floor(poly * jnp.exp2(n - q)), 0.0)
    exp_int = jnp.where(col_ok, exp_int, 0.0)
    exp_sum = jnp.sum(exp_int, axis=-1, keepdims=True)
    # log2 quantization (layers.py:367-376); exp_int == 0 -> inf -> masked 0
    # log_round(m) == floor(log2(2m/3)) + 1, bit-exact (see ops/lis.py).
    # Tail folded to y = 4m/3: floor(log2(2m/3)) + 1 == floor(log2(4m/3))
    # (adding 1 inside the floor of a log2 is multiplying by 2), and the
    # saturation test rounds >= 2^bits == y >= 2^(2^bits), so the +1, the
    # minimum() clamp and one extra mul drop out (3 VPU passes over the
    # (.., N, N) scores).
    #
    # The (1 + 2^-17) nudge folded into the constant defends the floor
    # against hardware log2 approximation error: y = 4m/3 lands EXACTLY on
    # a power of two whenever m = 3*2^k (m = 49152 is the bits=4
    # saturation boundary itself), and measured log2(2^k) error at powers
    # is -1.9e-6..+1.9e-6 on XLA CPU/TPU and 0..+3.8e-6 in Mosaic — an
    # undershoot there drops the floor by one (the UNFOLDED 2m/3 form had
    # the same latent bug at m = 3*2^14: XLA's log2(32768) = 14.999999
    # yields 2^-15 where the reference saturates to 0).  Margins: the
    # nudge lifts exact-power y by 7.6e-6 rel (4x the worst undershoot),
    # while integer-m y values below a power sit >= 4/3 absolute away —
    # relative >= 2e-5 over the whole bits<=4 non-saturated range
    # (y < 2^16), 2.6x the nudge+overshoot — and the saturation compare is
    # unaffected (gap 4/3 vs shift 0.5 at the boundary).  Those margins
    # collapse for bits > 4 (non-saturated y reaches 2^(2^bits), where the
    # 4/3 gap is relatively tiny), so wider-than-reference LIS codes keep
    # the literal chain.  tests/test_lis_tailfold.py sweeps every m
    # through the f64-exact reference.  Masked columns: exp_int 0 ->
    # m = inf -> saturated -> 0, as before.
    if bits > 4:
        # would silently reintroduce floor-flip at 3*2^k boundaries: for
        # bits > 4 non-saturated y reaches 2^(2^bits) where the 4/3 integer
        # gap is relatively tiny vs the hardware log2 error — needs
        # compare-correct integer thresholds before widening
        raise NotImplementedError(
            "LIS kernel tail supports bits<=4 only (reference BIT_TYPE_S "
            "is uint4)")
    softmax_inv = jnp.round(exp_sum / exp_int)
    y = softmax_inv * (4.0 / 3.0 * (1.0 + 2.0**-17))
    sat = y >= 2.0 ** (2.0**bits)
    deq = jnp.where(sat, 0.0, jnp.exp2(-jnp.floor(jnp.log2(y))))
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


def _qkv_attn_kernel_v2(x_ref, w_ref, mb_ref, scal_ref, out_ref, *,
                        n_real, bits, lis, nheads, head_dim,
                        lis_fast=False):
    # v2 of the fully-fused attention: the qkv projection runs as ONE
    # full-width (N, Cin) @ (Cin, 3C) int8 matmul instead of 3*H per-head
    # (N, Cin) @ (Cin, D) slices.  D=64 output lanes fill only half the
    # 128-wide MXU, so the per-head form runs the projection (the dominant
    # MXU term, ~70% of attention MACs) at ~half efficiency; the full-width
    # form restores it.  Per-head scores/LIS/attn@v keep the software
    # pipeline (scores(h+1) issued before LIS(h)).
    #
    # x_ref:   (1, N, Cin) int8 — LN output codes, one batch element
    # w_ref:   (Cin, 3C) int8 — columns ordered [slot(3), head, d]
    # mb_ref:  (2, 3C) f32 — [mult*1/s1, bias*1/s1] (requant grid folded in
    #          by the wrapper: saves one full pass over the (N, 3C) stream)
    # scal_ref: SMEM (4,) f32 = [s_a, c1, 1/s1, s1/s2]
    # out_ref: (1, H, N, D) int8 on the qact2 grid
    s_a = scal_ref[0]
    c1 = scal_ref[1]
    s1_over_s2 = scal_ref[3]

    x = x_ref[0]  # (N, Cin) int8
    npad = x.shape[0]
    c = nheads * head_dim
    col = jax.lax.broadcasted_iota(jnp.int32, (npad, npad), dimension=1)
    col_ok = col < n_real

    acc = jax.lax.dot_general(
        x, w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * mb_ref[0][None, :] + mb_ref[1][None, :]
    qkv = jnp.clip(jnp.round(y), -128.0, 127.0).astype(jnp.bfloat16)

    def sl(slot, h):
        lo = slot * c + h * head_dim
        return jax.lax.slice(qkv, (0, lo), (npad, lo + head_dim))

    def scores_of(h):
        s = jax.lax.dot_general(
            sl(0, h), sl(1, h), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        return jnp.clip(jnp.round(s * c1), -128.0, 127.0)

    a_cur = scores_of(0)
    for h in range(nheads):
        a_next = scores_of(h + 1) if h + 1 < nheads else None
        if lis:
            attn = _lis_body(a_cur, s_a, bits, col_ok, fast=lis_fast)
        else:
            logits = jnp.where(col_ok, a_cur * s_a, -jnp.inf)
            attn = jax.nn.softmax(logits, axis=-1).astype(jnp.bfloat16)
        o = jax.lax.dot_general(
            attn, sl(2, h), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        o = jnp.clip(jnp.round(o * s1_over_s2), -128.0, 127.0)
        out_ref[0, h] = o.astype(jnp.int8)
        a_cur = a_next


def fused_qkv_attention_v2(x_i8, w_all, mult, bias, scalars, *, num_heads,
                           head_dim, n_real, bits=4, lis=True, lis_fast=False,
                           interpret=False):
    """v2 fully-fused attention: full-width qkv matmul + per-head LIS loop.

    x_i8: (B, N_pad, Cin) int8 LN codes; w_all: (Cin, 3C) int8 with columns
    ordered [slot, head, d] (prepare_int's w_int layout); mult/bias: (3C,)
    f32.  scalars: (4,) f32 [s_a, c1, 1/s1, s1/s2].
    lis_fast: caller guarantees s_a in [2^-10, ln2] (see _lis_body).
    Returns (B, H, N_pad, D) int8 on the qact2 grid."""
    b, npad, cin = x_i8.shape
    c3 = w_all.shape[1]
    s1_inv = scalars[2]
    mb = jnp.stack([jnp.broadcast_to(mult, (c3,)) * s1_inv,
                    jnp.broadcast_to(bias, (c3,)) * s1_inv]) \
        .astype(jnp.float32)
    kernel = functools.partial(_qkv_attn_kernel_v2, n_real=n_real, bits=bits,
                               lis=lis, nheads=num_heads, head_dim=head_dim,
                               lis_fast=lis_fast)
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, npad, cin), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # w_all
            pl.BlockSpec(memory_space=pltpu.VMEM),  # mb
            pl.BlockSpec(memory_space=pltpu.SMEM),  # scalars
        ],
        out_specs=pl.BlockSpec((1, num_heads, npad, head_dim),
                               lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, num_heads, npad, head_dim),
                                       jnp.int8),
        interpret=interpret,
    )(x_i8, w_all, mb, scalars)


def _qkv_attn_kernel_v3(x_ref, w_ref, mb_ref, scal_ref, out_ref,
                        acc_ref, *,
                        n_real, bits, lis, nheads, head_dim, nelems):
    # v3: v2 + cross-grid-step software pipelining.  TPU Pallas grid steps
    # run sequentially on the core with persistent VMEM scratch, so program
    # i issues batch-element i's full-width qkv matmul (MXU) into a
    # double-buffered int32 scratch and then runs element i-1's
    # scores/LIS/attn@v loop (VPU-heavy) out of the other buffer: the big
    # projection matmul of the NEXT element hides under the CURRENT
    # element's LIS chain.  v2 measured the LIS VPU delta (+4.4 ms/step at
    # DeiT-S b192) completely unoverlapped; this recovers it.
    i = pl.program_id(0)
    last = pl.num_programs(0) - 1  # == nelems
    s_a = scal_ref[0]
    c1 = scal_ref[1]
    s1_inv = scal_ref[2]
    s1_over_s2 = scal_ref[3]

    npad = x_ref.shape[1]
    c = nheads * head_dim

    # -- produce: qkv int32 accumulator for element i into slot i%2 --
    @pl.when(i < last)
    def _produce():
        acc = jax.lax.dot_general(
            x_ref[0], w_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        acc_ref[jax.lax.rem(i, 2)] = acc

    # -- consume: element i-1 from slot (i-1)%2 --
    @pl.when(i > 0)
    def _consume():
        acc = acc_ref[jax.lax.rem(i + 1, 2)]
        y = acc.astype(jnp.float32) * mb_ref[0][None, :] + mb_ref[1][None, :]
        qkv = jnp.clip(jnp.round(y * s1_inv), -128.0, 127.0) \
            .astype(jnp.bfloat16)
        col = jax.lax.broadcasted_iota(jnp.int32, (npad, npad), dimension=1)
        col_ok = col < n_real

        def sl(slot, h):
            lo = slot * c + h * head_dim
            return jax.lax.slice(qkv, (0, lo), (npad, lo + head_dim))

        def scores_of(h):
            s = jax.lax.dot_general(
                sl(0, h), sl(1, h), (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            return jnp.clip(jnp.round(s * c1), -128.0, 127.0)

        a_cur = scores_of(0)
        for h in range(nheads):
            a_next = scores_of(h + 1) if h + 1 < nheads else None
            if lis:
                attn = _lis_body(a_cur, s_a, bits, col_ok)
            else:
                logits = jnp.where(col_ok, a_cur * s_a, -jnp.inf)
                attn = jax.nn.softmax(logits, axis=-1).astype(jnp.bfloat16)
            o = jax.lax.dot_general(
                attn, sl(2, h), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            o = jnp.clip(jnp.round(o * s1_over_s2), -128.0, 127.0)
            out_ref[0, h] = o.astype(jnp.int8)
            a_cur = a_next


def fused_qkv_attention_v3(x_i8, w_all, mult, bias, scalars, *, num_heads,
                           head_dim, n_real, bits=4, lis=True,
                           interpret=False):
    """Grid-pipelined fully-fused attention (see _qkv_attn_kernel_v3).

    Same contract as fused_qkv_attention_v2."""
    b, npad, cin = x_i8.shape
    c3 = w_all.shape[1]
    mb = jnp.stack([jnp.broadcast_to(mult, (c3,)),
                    jnp.broadcast_to(bias, (c3,))]).astype(jnp.float32)
    kernel = functools.partial(_qkv_attn_kernel_v3, n_real=n_real, bits=bits,
                               lis=lis, nheads=num_heads, head_dim=head_dim,
                               nelems=b)
    bm1 = b - 1
    return pl.pallas_call(
        kernel,
        grid=(b + 1,),
        in_specs=[
            pl.BlockSpec((1, npad, cin),
                         lambda i: (jnp.minimum(i, bm1), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # w_all
            pl.BlockSpec(memory_space=pltpu.VMEM),  # mb
            pl.BlockSpec(memory_space=pltpu.SMEM),  # scalars
        ],
        out_specs=pl.BlockSpec((1, num_heads, npad, head_dim),
                               lambda i: (jnp.maximum(i - 1, 0), 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, num_heads, npad, head_dim),
                                       jnp.int8),
        scratch_shapes=[
            pltpu.VMEM((2, npad, c3), jnp.int32),
        ],
        interpret=interpret,
    )(x_i8, w_all, mb, scalars)


def _qkv_attn_kernel_v4(x_ref, w_ref, mb_ref, scal_ref, out_ref, *,
                        n_real, bits, lis, nheads, head_dim, group):
    # v4: v2 with GROUP batch elements per program.  All full-width qkv
    # matmuls (MXU) are issued before any element's requant/LIS loop (VPU),
    # so element g+1's projection hides under element g's LIS chain, and
    # the per-head scores/attn@v pipeline interleaves across elements.
    s_a = scal_ref[0]
    c1 = scal_ref[1]
    s1_inv = scal_ref[2]
    s1_over_s2 = scal_ref[3]

    npad = x_ref.shape[1]
    c = nheads * head_dim
    col = jax.lax.broadcasted_iota(jnp.int32, (npad, npad), dimension=1)
    col_ok = col < n_real

    # issue every element's projection first: MXU bursts the VPU work of
    # earlier elements can hide under
    accs = [jax.lax.dot_general(
        x_ref[g], w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32) for g in range(group)]

    for g in range(group):
        y = accs[g].astype(jnp.float32) * mb_ref[0][None, :] \
            + mb_ref[1][None, :]
        qkv = jnp.clip(jnp.round(y * s1_inv), -128.0, 127.0) \
            .astype(jnp.bfloat16)

        def sl(slot, h, q=qkv):
            lo = slot * c + h * head_dim
            return jax.lax.slice(q, (0, lo), (npad, lo + head_dim))

        def scores_of(h, q=qkv):
            s = jax.lax.dot_general(
                sl(0, h, q), sl(1, h, q), (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            return jnp.clip(jnp.round(s * c1), -128.0, 127.0)

        a_cur = scores_of(0)
        for h in range(nheads):
            a_next = scores_of(h + 1) if h + 1 < nheads else None
            if lis:
                attn = _lis_body(a_cur, s_a, bits, col_ok)
            else:
                logits = jnp.where(col_ok, a_cur * s_a, -jnp.inf)
                attn = jax.nn.softmax(logits, axis=-1).astype(jnp.bfloat16)
            o = jax.lax.dot_general(
                attn, sl(2, h), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            o = jnp.clip(jnp.round(o * s1_over_s2), -128.0, 127.0)
            out_ref[g, h] = o.astype(jnp.int8)
            a_cur = a_next


def fused_qkv_attention_v4(x_i8, w_all, mult, bias, scalars, *, num_heads,
                           head_dim, n_real, bits=4, lis=True, group=2,
                           interpret=False):
    """v4: v2 with multi-element programs (see _qkv_attn_kernel_v4).
    Same contract as fused_qkv_attention_v2; b must be divisible by group
    (callers pad the batch or pick group=1)."""
    b, npad, cin = x_i8.shape
    c3 = w_all.shape[1]
    while b % group:
        group //= 2
    mb = jnp.stack([jnp.broadcast_to(mult, (c3,)),
                    jnp.broadcast_to(bias, (c3,))]).astype(jnp.float32)
    kernel = functools.partial(_qkv_attn_kernel_v4, n_real=n_real, bits=bits,
                               lis=lis, nheads=num_heads, head_dim=head_dim,
                               group=group)
    return pl.pallas_call(
        kernel,
        grid=(b // group,),
        in_specs=[
            pl.BlockSpec((group, npad, cin), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # w_all
            pl.BlockSpec(memory_space=pltpu.VMEM),  # mb
            pl.BlockSpec(memory_space=pltpu.SMEM),  # scalars
        ],
        out_specs=pl.BlockSpec((group, num_heads, npad, head_dim),
                               lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, num_heads, npad, head_dim),
                                       jnp.int8),
        interpret=interpret,
    )(x_i8, w_all, mb, scalars)


def _qkv_attn_kernel_v5(x_ref, w_ref, mb_ref, scal_ref, out_ref, *,
                        n_real, bits, lis, nheads, head_dim):
    # v5 experiment: two elements per program, element B's full-width qkv
    # matmul issued in column chunks INTERLEAVED between element A's
    # per-head LIS calls (forcing fine-grained MXU/VPU alternation in the
    # instruction stream).
    s_a = scal_ref[0]
    c1 = scal_ref[1]
    s1_inv = scal_ref[2]
    s1_over_s2 = scal_ref[3]

    npad = x_ref.shape[1]
    c = nheads * head_dim
    c3 = 3 * c
    col = jax.lax.broadcasted_iota(jnp.int32, (npad, npad), dimension=1)
    col_ok = col < n_real
    nchunk = 2 * nheads  # B-matmul chunks to scatter through A's loop
    csz = c3 // nchunk

    def requant(acc):
        y = acc.astype(jnp.float32) * mb_ref[0][None, :] + mb_ref[1][None, :]
        return jnp.clip(jnp.round(y * s1_inv), -128.0, 127.0) \
            .astype(jnp.bfloat16)

    def chunk_dot(g, j):
        wj = jax.lax.slice(w_ref[...], (0, j * csz), (c, (j + 1) * csz))
        return jax.lax.dot_general(
            x_ref[g], wj, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)

    def head_loop(qkv, g):
        def sl(slot, h):
            lo = slot * c + h * head_dim
            return jax.lax.slice(qkv, (0, lo), (npad, lo + head_dim))

        def scores_of(h):
            s = jax.lax.dot_general(
                sl(0, h), sl(1, h), (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            return jnp.clip(jnp.round(s * c1), -128.0, 127.0)

        a_cur = scores_of(0)
        outs = []
        for h in range(nheads):
            if g == 0:
                # scatter two chunks of B's projection before each LIS
                yield ("mxu", 2 * h)
                yield ("mxu", 2 * h + 1)
            a_next = scores_of(h + 1) if h + 1 < nheads else None
            if lis:
                attn = _lis_body(a_cur, s_a, bits, col_ok)
            else:
                logits = jnp.where(col_ok, a_cur * s_a, -jnp.inf)
                attn = jax.nn.softmax(logits, axis=-1).astype(jnp.bfloat16)
            o = jax.lax.dot_general(
                attn, sl(2, h), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            o = jnp.clip(jnp.round(o * s1_over_s2), -128.0, 127.0)
            out_ref[g, h] = o.astype(jnp.int8)
            a_cur = a_next

    # element A: projection + requant up front
    qkv_a = requant(jax.lax.dot_general(
        x_ref[0], w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32))
    # drive A's loop, issuing B's chunks at the yield points
    b_chunks = [None] * nchunk
    for tag, j in head_loop(qkv_a, 0):
        b_chunks[j] = chunk_dot(1, j)
    qkv_b = requant(jnp.concatenate(b_chunks, axis=1))
    for _ in head_loop(qkv_b, 1):
        pass


def fused_qkv_attention_v5(x_i8, w_all, mult, bias, scalars, *, num_heads,
                           head_dim, n_real, bits=4, lis=True,
                           interpret=False):
    """v5 experiment (see _qkv_attn_kernel_v5)."""
    b, npad, cin = x_i8.shape
    c3 = w_all.shape[1]
    mb = jnp.stack([jnp.broadcast_to(mult, (c3,)),
                    jnp.broadcast_to(bias, (c3,))]).astype(jnp.float32)
    kernel = functools.partial(_qkv_attn_kernel_v5, n_real=n_real, bits=bits,
                               lis=lis, nheads=num_heads, head_dim=head_dim)
    return pl.pallas_call(
        kernel,
        grid=(b // 2,),
        in_specs=[
            pl.BlockSpec((2, npad, cin), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((2, num_heads, npad, head_dim),
                               lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, num_heads, npad, head_dim),
                                       jnp.int8),
        interpret=interpret,
    )(x_i8, w_all, mb, scalars)


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


def _swin_attn_kernel(qkv_ref, bias_ref, mask_ref, scal_ref, out_ref, *,
                      n_real, bits, lis, group, has_mask):
    # Swin window attention core (swin_int.forward_q_int semantics):
    #   scores = q@k^T * (s1^2 * hd^-0.5)      -> qact_attn1 fake-quant
    #   + relative-position bias (fake-quanted) -> qact2 fake-quant
    #   + shift mask                            -> LIS on the qact2 grid
    #   attn @ v                                -> int8 codes on qact3 grid
    # qkv_ref:  (G, 3, 1, npad, D) int8 on the attn.qact1 grid
    # bias_ref: (1, npad, npad) f32 — this head's fake-quanted bias
    # mask_ref: (G, npad, npad) f32 — shift mask pre-divided by s_a2
    # scal_ref: SMEM (5,) f32 = [c1 (s1^2*hd^-0.5/s_a1), s_a1, 1/s_a2,
    #           s_a2, c2 (s1/s_a3)]
    # out_ref:  (G, 1, npad, D) int8 on the qact3 grid
    c1 = scal_ref[0]
    s_a1 = scal_ref[1]
    inv_s2 = scal_ref[2]
    s_a2 = scal_ref[3]
    c2 = scal_ref[4]

    npad = qkv_ref.shape[3]
    col = jax.lax.broadcasted_iota(jnp.int32, (npad, npad), dimension=1)
    col_ok = col < n_real
    bias = bias_ref[0]

    for g in range(group):
        q = qkv_ref[g, 0, 0, :, :].astype(jnp.bfloat16)
        k = qkv_ref[g, 1, 0, :, :].astype(jnp.bfloat16)
        v = qkv_ref[g, 2, 0, :, :].astype(jnp.bfloat16)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        a1c = jnp.clip(jnp.round(s * c1), -128.0, 127.0)   # qact_attn1
        af = a1c * s_a1 + bias
        a2c = jnp.clip(jnp.round(af * inv_s2), -128.0, 127.0)  # qact2
        am = a2c + mask_ref[g] if has_mask else a2c
        if lis:
            attn = _lis_body(am, s_a2, bits, col_ok)
        else:
            logits = jnp.where(col_ok, am * s_a2, -jnp.inf)
            attn = jax.nn.softmax(logits, axis=-1).astype(jnp.bfloat16)
        o = jax.lax.dot_general(
            attn, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        o = jnp.clip(jnp.round(o * c2), -128.0, 127.0)
        out_ref[g, 0, :, :] = o.astype(jnp.int8)


def fused_swin_attention(qkv_i8, bias_q, mask_div, scalars, *, num_heads,
                         n_real, n_windows, bits=4, lis=True,
                         interpret=False):
    """Fused Swin window attention (see _swin_attn_kernel).

    qkv_i8: (Bw, 3, H, npad, D) int8 on the attn.qact1 grid (padded window
    rows zeroed by the caller's pad).  bias_q: (H, npad, npad) f32
    fake-quanted relative-position bias.  mask_div: (nW, npad, npad) f32
    shift mask divided by s_a2, or None.  n_windows: nW (window count per
    image; window index w uses mask w % nW).
    Returns (Bw, H, npad, D) int8 codes on the qact3 grid."""
    bw, three, h, npad, d = qkv_i8.shape
    assert three == 3 and h == num_heads
    has_mask = mask_div is not None
    group = 32  # measured best of 16/32/64 at swin_tiny b64
    while bw % group:
        group //= 2
    if has_mask and n_windows < group:
        reps = group // n_windows
        mask_div = jnp.tile(mask_div, (reps, 1, 1))
    if not has_mask:
        mask_div = jnp.zeros((group, npad, npad), jnp.float32)
    mdiv = max(mask_div.shape[0] // group, 1)

    kernel = functools.partial(_swin_attn_kernel, n_real=n_real, bits=bits,
                               lis=lis, group=group, has_mask=has_mask)
    return pl.pallas_call(
        kernel,
        grid=(bw // group, h),
        in_specs=[
            pl.BlockSpec((group, 3, 1, npad, d),
                         lambda i, j: (i, 0, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, npad, npad), lambda i, j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((group, npad, npad),
                         lambda i, j: (jax.lax.rem(i, mdiv), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((group, 1, npad, d),
                               lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bw, h, npad, d), jnp.int8),
        interpret=interpret,
    )(qkv_i8, bias_q, mask_div, scalars)


def _swin_attn_kernel_v2(qkv_ref, sel_ref, selt_ref, bias_ref, mask_ref,
                         scal_ref, out_ref, *, n_real, bits, lis, group,
                         has_mask, nheads):
    # Same math as _swin_attn_kernel; qkv arrives in the NATURAL
    # (group, npad, 3C) layout of the qkv matmul output, so the
    # (Bw,npad,3C) -> (Bw,3,H,npad,D) XLA relayout the v1 kernel required
    # (a full int8 r/w of the widest stream in the block) no longer
    # exists.  Heads are extracted with constant 0/1 SELECTION-MATRIX
    # matmuls (sel: (3H, 3C, D); selt: (H, D, C)) — "slice via MXU":
    # zero VPU cost, zero relayout, exact on integer codes — instead of
    # lane-offset slices (measured catastrophic in-register, and
    # unsupported as sub-128 BlockSpec lane blocks).  Per-head outputs
    # are placed back into natural (npad, C) lanes the same way.
    c1 = scal_ref[0]
    s_a1 = scal_ref[1]
    inv_s2 = scal_ref[2]
    s_a2 = scal_ref[3]
    c2 = scal_ref[4]

    npad = qkv_ref.shape[1]
    col = jax.lax.broadcasted_iota(jnp.int32, (npad, npad), dimension=1)
    col_ok = col < n_real

    for g in range(group):
        xw = qkv_ref[g].astype(jnp.bfloat16)  # int8 codes, exact in bf16
        acc = None
        for h in range(nheads):
            q = jax.lax.dot_general(
                xw, sel_ref[h], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(jnp.bfloat16)
            k = jax.lax.dot_general(
                xw, sel_ref[nheads + h], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(jnp.bfloat16)
            v = jax.lax.dot_general(
                xw, sel_ref[2 * nheads + h], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(jnp.bfloat16)
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            a1c = jnp.clip(jnp.round(s * c1), -128.0, 127.0)  # qact_attn1
            af = a1c * s_a1 + bias_ref[h]
            a2c = jnp.clip(jnp.round(af * inv_s2), -128.0, 127.0)  # qact2
            am = a2c + mask_ref[g] if has_mask else a2c
            if lis:
                attn = _lis_body(am, s_a2, bits, col_ok)
            else:
                logits = jnp.where(col_ok, am * s_a2, -jnp.inf)
                attn = jax.nn.softmax(logits, axis=-1).astype(jnp.bfloat16)
            o = jax.lax.dot_general(
                attn, v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            o = jnp.clip(jnp.round(o * c2), -128.0, 127.0)  # qact3 codes
            part = jax.lax.dot_general(   # place head lanes: o @ selt[h]
                o.astype(jnp.bfloat16), selt_ref[h],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            acc = part if acc is None else acc + part
        out_ref[g] = acc.astype(jnp.int8)  # disjoint lanes: exact codes


def fused_swin_attention_v2(qkv_i8, bias_q, mask_div, scalars, *, num_heads,
                            head_dim, n_real, n_windows, bits=4, lis=True,
                            interpret=False):
    """Fused Swin window attention, natural-layout qkv (see
    _swin_attn_kernel_v2).

    qkv_i8: (Bw, npad, 3C) int8 on the attn.qact1 grid — the qkv linear's
    requantized output with torch column order [q|k|v] x head x head_dim,
    window rows padded to npad BEFORE the matmul (pad rows carry bias
    codes; they only ever feed masked key columns / sliced-off query
    rows).  bias_q: (H, npad, npad) f32 fake-quanted relative-position
    bias.  mask_div: (nW, npad, npad) f32 shift mask divided by s_a2, or
    None.  Returns (Bw, npad, C) int8 codes on the qact3 grid with the
    same head-major column order — directly consumable by the proj
    matmul, no transposes anywhere.
    """
    bw, npad, c3 = qkv_i8.shape
    c = num_heads * head_dim
    assert c3 == 3 * c
    has_mask = mask_div is not None
    group = 32  # measured best of 16/32/64 at swin_tiny b64 (v1)
    while bw % group:
        group //= 2
    if has_mask and n_windows < group:
        mask_div = jnp.tile(mask_div, (group // n_windows, 1, 1))
    if not has_mask:
        mask_div = jnp.zeros((group, npad, npad), jnp.float32)
    mdiv = max(mask_div.shape[0] // group, 1)

    # constant selection matrices: sel[s*H+h] = I_{3C}[:, s*C + h*D : +D]
    # (extract), selt[h] = I_C[h*D : (h+1)*D, :] (place row d at col h*D+d)
    eye3 = np.eye(c3, dtype=np.float32)
    sel = np.stack([
        eye3[:, s * c + h * head_dim:s * c + (h + 1) * head_dim]
        for s in range(3) for h in range(num_heads)])
    selt = np.stack([np.eye(c, dtype=np.float32)[h * head_dim:
                                                 (h + 1) * head_dim]
                     for h in range(num_heads)])

    kernel = functools.partial(_swin_attn_kernel_v2, n_real=n_real,
                               bits=bits, lis=lis, group=group,
                               has_mask=has_mask, nheads=num_heads)
    return pl.pallas_call(
        kernel,
        grid=(bw // group,),
        in_specs=[
            pl.BlockSpec((group, npad, c3), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # sel
            pl.BlockSpec(memory_space=pltpu.VMEM),  # selt
            pl.BlockSpec(memory_space=pltpu.VMEM),  # bias (all heads)
            pl.BlockSpec((group, npad, npad),
                         lambda i: (jax.lax.rem(i, mdiv), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((group, npad, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bw, npad, c), jnp.int8),
        interpret=interpret,
    )(qkv_i8, jnp.asarray(sel, jnp.bfloat16), jnp.asarray(selt,
                                                          jnp.bfloat16),
      bias_q, mask_div, scalars)


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
