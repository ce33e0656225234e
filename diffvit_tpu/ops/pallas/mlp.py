"""Fused integer MLP kernel (Pallas/Mosaic, TPU).

Fuses fc1 -> GELU -> qact1 requant -> fc2 -> qact2 (PTF) requant for the
integer path, keeping the (rows, hidden) stream out of HBM.  On this
backend VPU work that consumes matmul results cannot overlap the MXU
(docs/PERF_ANALYSIS.md), so kernel time is additive MXU + VPU and the
design minimizes VPU *passes*: a division/exp-free polynomial GELU
(_gelu_poly), a reciprocal-multiply PTF fence, and 256-row sub-blocks that
amortize per-op overhead (measured best of 32/64/128/256).

Numerics match models/vit_int's XLA path (int8 matmuls accumulate in int32,
epilogues in f32) except GELU: Mosaic has no erf primitive, so the kernel
uses a degree-12 odd Chebyshev fit (max |gelu error| 3.8e-6, the
saturated-tail floor of the |x| <= 4.8 window — orders of magnitude below
half a qact1 step; downstream int8 codes match the exact-erf path except
on rare exact-boundary elements).

Reference semantics: Mlp.forward (layers_quant.py:318-350) — fc1, GELU,
qact1, fc2, qact2.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..int_layernorm import get_mn


# Chebyshev fit of P(u) = (Phi(sqrt(u)) - 0.5)/sqrt(u) on u in [0, 4.8^2],
# monomial form in s = 2u/4.8^2 - 1 (see scripts/fit_gelu_poly rationale in
# the _gelu_poly docstring).  Degree 12: the saturated tail past |x| = 4.8
# contributes 4.8*(1-Phi(4.8)) = 3.8e-6 of gelu error no matter the
# degree, and deg 12 already sits on that floor (measured equal to deg 14
# to 1e-7), so the last two Horner fmas per element were pure waste —
# ~0.5 ms/step of VPU at DeiT-S b256.
_GELU_P = (
    1.472124915e-01, -7.297722655e-02, 5.292239887e-02, -4.063959391e-02,
    3.055344378e-02, -2.162323356e-02, 1.431964120e-02, -9.132027657e-03,
    5.130726935e-03, -2.055695227e-03, 1.023744687e-03, -9.600747865e-04,
    3.919371191e-04,
)
_GELU_B2 = 4.8 * 4.8


def _gelu_poly(x):
    """Division/exp-free GELU: Phi(x) = clip(0.5 + x*P(min(x^2, 4.8^2)), 0, 1)
    with P the degree-12 Chebyshev fit above; gelu = x*Phi(x).

    Phi(x) - 0.5 is odd, so x*P(x^2) halves the polynomial length.  Beyond
    |x| > 4.8 the clamped argument makes 0.5 + x*P monotone past the [0,1]
    bounds, so the clip reproduces the saturated tails exactly (the true
    tail error there is 1-Phi(4.8) = 7.9e-7).  Max |gelu error| 4.2e-7 in
    f32 — same class as the A&S rational erf, but every op is a
    single-pass fma on the VPU: no divide, no exp, no sign/abs.  On this
    backend VPU work that consumes matmul results cannot overlap the MXU
    (see docs/PERF_ANALYSIS.md), so the GELU chain is pure exposed time —
    measured ~1.3 ms/step cheaper than the A&S form at DeiT-S b192."""
    u = jnp.minimum(x * x, _GELU_B2)
    s = u * (2.0 / _GELU_B2) - 1.0
    p = _GELU_P[-1]
    for coef in _GELU_P[-2::-1]:
        p = p * s + coef
    phi = jnp.clip(0.5 + x * p, 0.0, 1.0)
    return x * phi


def _gelu_exact_approx(x):
    """GELU with the Abramowitz-Stegun 7.1.26 rational erf (Mosaic has no
    erf/erfc primitive).  |erf error| <= 1.5e-7, so |GELU error| <=
    7.5e-8*|x| — orders of magnitude below half a qact1 quantization step,
    i.e. the downstream int8 codes match the exact-erf path except on a
    ~1e-4 fraction of elements sitting exactly on a rounding boundary."""
    z = x * 0.7071067811865476
    s = jnp.sign(z)
    a = jnp.abs(z)
    t = 1.0 / (1.0 + 0.3275911 * a)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (1.421413741
               + t * (-1.453152027 + t * 1.061405429))))
    erf = s * (1.0 - poly * jnp.exp(-a * a))
    return 0.5 * x * (1.0 + erf)


def _mlp_kernel(x_ref, w1_ref, w2_ref, v1_ref, v2_ref, scal_ref, out_ref, *,
                sub, n_sub, emit_codes=False):
    # x_ref:  (M, Cin) int8 — row block of LN output codes
    # w1_ref: (Cin, Hid) int8;  w2_ref: (Hid, Cout) int8
    # v1_ref: (2, Hid) f32 — [mult1 (in_scale*s_w1), bias1]
    # v2_ref: (4, Cout) f32 — [mult2 (s_q1*s_w2), bias2, out_scale (PTF),
    #         1/out_scale] (reciprocal precomputed: one VPU mul instead of a
    #         multi-pass per-channel divide in the fence)
    # scal_ref: SMEM (1,) f32 — [1/s_q1]
    # out_ref: (M, Cout) f32 — qact2-quantized MLP output; with
    #          emit_codes=True, (M, Cout) int8 — the qact2 CODES (the caller
    #          owns the dequant): drops one VPU pass and 4x the output DMA
    s_q1_inv = scal_ref[0]
    mult1 = v1_ref[0][None, :]
    bias1 = v1_ref[1][None, :]
    mult2 = v2_ref[0][None, :]
    bias2 = v2_ref[1][None, :]
    out_scale = v2_ref[2][None, :]
    inv_out_scale = v2_ref[3][None, :]

    def fc1(i):
        xs = x_ref[pl.ds(i * sub, sub), :]
        acc = jax.lax.dot_general(
            xs, w1_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        return acc.astype(jnp.float32) * mult1 + bias1

    def gelu_requant(mid):
        g = _gelu_poly(mid)
        return jnp.clip(jnp.round(g * s_q1_inv), -128.0, 127.0) \
            .astype(jnp.int8)

    def fc2(g_i8, i):
        acc = jax.lax.dot_general(
            g_i8, w2_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        y = acc.astype(jnp.float32) * mult2 + bias2
        # mlp.qact2 fence (PTF per-channel)
        codes = jnp.clip(jnp.round(y * inv_out_scale), -128.0, 127.0)
        if emit_codes:
            out_ref[pl.ds(i * sub, sub), :] = codes.astype(jnp.int8)
        else:
            out_ref[pl.ds(i * sub, sub), :] = codes * out_scale

    mid_cur = fc1(0)
    for i in range(n_sub):
        mid_next = fc1(i + 1) if i + 1 < n_sub else None
        g = gelu_requant(mid_cur)  # VPU — overlaps mid_next's MXU work
        fc2(g, i)
        mid_cur = mid_next


def _mlp_block_kernel(y_ref, h_ref, v_ref, w1_ref, w2_ref, v1_ref, v2_ref,
                      scal_ref, out_ref, *, sub, n_sub):
    # Whole MLP half-block including the residual fences and the integer
    # LayerNorm: qact3(y) -> h + . -> qact2 -> int-LN2 (int8 codes) ->
    # fc1 -> GELU -> qact1 requant -> fc2 -> mlp.qact2 fence -> residual
    # add -> qact4.  Keeps the (rows, C) streams out of the separate XLA
    # fence passes (~150 MB/layer of HBM round trips at DeiT-S b192).
    #
    # y_ref: (M, C) f32 — attention proj output (pre-qact3)
    # h_ref: (M, C) f32 — residual stream entering the fence
    # v_ref: (10, C) f32 — [inv_s3, s3, inv_s2, s2, inv_s4, s4,
    #        r (LN in-scale/in-scale1 code expansion), lnw/out_scale,
    #        lnb/out_scale, ln rescale (ones when absent)]
    # v1_ref/v2_ref/w1_ref/w2_ref: as _mlp_kernel
    # scal_ref: SMEM (3,) f32 — [s2min (min LN in-scale), 1/s_q1, C]
    # out_ref: (M, C) f32 — residual stream after the block
    inv_s3 = v_ref[0][None, :]
    s3 = v_ref[1][None, :]
    inv_s2 = v_ref[2][None, :]
    s2 = v_ref[3][None, :]
    inv_s4 = v_ref[4][None, :]
    s4 = v_ref[5][None, :]
    r_exp = v_ref[6][None, :]
    lnw_out = v_ref[7][None, :]
    lnb_out = v_ref[8][None, :]
    rescale = v_ref[9][None, :]
    s2min = scal_ref[0]
    s_q1_inv = scal_ref[1]
    c = scal_ref[2]

    mult1 = v1_ref[0][None, :]
    bias1 = v1_ref[1][None, :]
    mult2 = v2_ref[0][None, :]
    bias2 = v2_ref[1][None, :]
    out_scale = v2_ref[2][None, :]
    inv_out_scale = v2_ref[3][None, :]

    def fences_ln(i):
        sl = pl.ds(i * sub, sub)
        yq = jnp.clip(jnp.round(y_ref[sl, :] * inv_s3), -128.0, 127.0) * s3
        codes2 = jnp.clip(jnp.round((h_ref[sl, :] + yq) * inv_s2),
                          -128.0, 127.0)
        h2 = codes2 * s2
        # integer LayerNorm (vit_int._ln_int8 math; codes2 IS round(h2/s2))
        x_q = codes2 * r_exp
        sum_x = jnp.sum(x_q, axis=-1, keepdims=True)
        sum_x2 = jnp.sum(x_q * x_q, axis=-1, keepdims=True)
        mean = (sum_x / c) * s2min
        std = (s2min / c) * jnp.sqrt(c * sum_x2 - sum_x * sum_x)
        a = (s2min / std) * lnw_out
        m, n = get_mn(jnp.abs(a))
        b = jnp.round((lnb_out - (mean / std) * lnw_out) * (2.0**n))
        yl = jnp.round((jnp.sign(a) * m * x_q + b) / (2.0**n))
        yl = jnp.round(yl * rescale)
        x_i8 = jnp.clip(yl, -128.0, 127.0).astype(jnp.int8)
        return h2, x_i8

    def fc1(x_i8):
        acc = jax.lax.dot_general(
            x_i8, w1_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        return acc.astype(jnp.float32) * mult1 + bias1

    def gelu_requant(mid):
        g = _gelu_poly(mid)
        return jnp.clip(jnp.round(g * s_q1_inv), -128.0, 127.0) \
            .astype(jnp.int8)

    def fc2_fences(g_i8, h2, i):
        acc = jax.lax.dot_general(
            g_i8, w2_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        ym = acc.astype(jnp.float32) * mult2 + bias2
        ym = jnp.clip(jnp.round(ym * inv_out_scale), -128.0, 127.0) \
            * out_scale                                # mlp.qact2 (PTF)
        hn = h2 + ym
        hn = jnp.clip(jnp.round(hn * inv_s4), -128.0, 127.0) * s4  # qact4
        out_ref[pl.ds(i * sub, sub), :] = hn

    h2_cur, x_cur = fences_ln(0)
    mid_cur = fc1(x_cur)
    for i in range(n_sub):
        if i + 1 < n_sub:
            h2_next, x_next = fences_ln(i + 1)
            mid_next = fc1(x_next)
        else:
            h2_next = mid_next = None
        g = gelu_requant(mid_cur)
        fc2_fences(g, h2_cur, i)
        h2_cur, mid_cur = h2_next, mid_next


def fused_int_mlp_block(y, h, w1, w2, mult1, bias1, mult2, bias2,
                        mlp_out_scale, s_q1, *, ln, ln_in_scale,
                        ln_out_scale, ln_rescale, s3, s2_vec, s4_vec,
                        block_rows=512, sub=256, interpret=False):
    """Whole MLP half-block with fences + integer LN fused (see
    _mlp_block_kernel).  y/h: (R, C) f32 (R padded to block_rows).
    ln: {"w","b"}; ln_in_scale: the qact2 PTF scale vector (LN input grid);
    ln_out_scale: fc1 input grid (possibly the attention channel grid);
    ln_rescale: optional channel-grid conversion (norm2 quirk) or None.
    Returns (R, C) f32 — the residual stream after qact4."""
    rows, cin = y.shape
    hid = w1.shape[1]
    cout = w2.shape[1]
    assert rows % block_rows == 0 and block_rows % sub == 0

    bc = lambda t: jnp.broadcast_to(jnp.asarray(t, jnp.float32), (cin,))
    in_scale = bc(ln_in_scale)
    s2min = jnp.min(in_scale)
    out_sc = bc(ln_out_scale)
    v = jnp.stack([
        1.0 / bc(s3), bc(s3), 1.0 / in_scale, in_scale,
        1.0 / bc(s4_vec), bc(s4_vec),
        jnp.round(in_scale / s2min),
        bc(ln["w"]) / out_sc, bc(ln["b"]) / out_sc,
        bc(ln_rescale) if ln_rescale is not None else jnp.ones((cin,)),
    ]).astype(jnp.float32)
    v1 = jnp.stack([jnp.broadcast_to(mult1, (hid,)),
                    jnp.broadcast_to(bias1, (hid,))]).astype(jnp.float32)
    out_b = jnp.broadcast_to(mlp_out_scale, (cout,))
    v2 = jnp.stack([jnp.broadcast_to(mult2, (cout,)),
                    jnp.broadcast_to(bias2, (cout,)),
                    out_b, 1.0 / out_b]).astype(jnp.float32)
    scal = jnp.stack([s2min, 1.0 / jnp.asarray(s_q1, jnp.float32),
                      jnp.asarray(float(cin), jnp.float32)])

    kernel = functools.partial(_mlp_block_kernel, sub=sub,
                               n_sub=block_rows // sub)
    return pl.pallas_call(
        kernel,
        grid=(rows // block_rows,),
        in_specs=[
            pl.BlockSpec((block_rows, cin), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rows, cin), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # v
            pl.BlockSpec(memory_space=pltpu.VMEM),  # w1
            pl.BlockSpec(memory_space=pltpu.VMEM),  # w2
            pl.BlockSpec(memory_space=pltpu.VMEM),  # v1
            pl.BlockSpec(memory_space=pltpu.VMEM),  # v2
            pl.BlockSpec(memory_space=pltpu.SMEM),  # scal
        ],
        out_specs=pl.BlockSpec((block_rows, cin), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, cin), jnp.float32),
        interpret=interpret,
    )(y, h, v, w1, w2, v1, v2, scal)


def fused_int_mlp(x_i8, w1, w2, mult1, bias1, mult2, bias2, out_scale,
                  s_q1, *, block_rows=512, sub=256, emit_codes=False,
                  interpret=False):
    """x_i8: (R, Cin) int8 row-major tokens (R padded to block_rows).
    w1: (Cin, Hid) int8; w2: (Hid, Cout) int8.
    Returns (R, Cout) f32, already on the mlp.qact2 grid — or, with
    emit_codes=True, the (R, Cout) int8 mlp.qact2 codes (value =
    codes * out_scale), for callers carrying an int8 residual stream."""
    r, cin = x_i8.shape
    hid = w1.shape[1]
    cout = w2.shape[1]
    assert r % block_rows == 0 and block_rows % sub == 0
    v1 = jnp.stack([jnp.broadcast_to(mult1, (hid,)),
                    jnp.broadcast_to(bias1, (hid,))]).astype(jnp.float32)
    out_b = jnp.broadcast_to(out_scale, (cout,))
    v2 = jnp.stack([jnp.broadcast_to(mult2, (cout,)),
                    jnp.broadcast_to(bias2, (cout,)),
                    out_b, 1.0 / out_b]).astype(jnp.float32)
    scal = jnp.asarray([1.0 / s_q1], jnp.float32)

    kernel = functools.partial(_mlp_kernel, sub=sub,
                               n_sub=block_rows // sub,
                               emit_codes=emit_codes)
    return pl.pallas_call(
        kernel,
        grid=(r // block_rows,),
        in_specs=[
            pl.BlockSpec((block_rows, cin), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((block_rows, cout), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (r, cout), jnp.int8 if emit_codes else jnp.float32),
        interpret=interpret,
    )(x_i8, w1, w2, v1, v2, scal)
