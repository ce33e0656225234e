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
uses a degree-14 odd Chebyshev fit (max |gelu error| 4.2e-7 — orders of
magnitude below half a qact1 step; downstream int8 codes match the
exact-erf path except on rare exact-boundary elements).

Reference semantics: Mlp.forward (layers_quant.py:318-350) — fc1, GELU,
qact1, fc2, qact2.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# Chebyshev fit of P(u) = (Phi(sqrt(u)) - 0.5)/sqrt(u) on u in [0, 4.8^2],
# monomial form in s = 2u/4.8^2 - 1 (see scripts/fit_gelu_poly rationale in
# the _gelu_poly docstring).  Degree 14; f32 Horner max |gelu error| 4.2e-7.
_GELU_P = (
    1.472124849e-01, -7.297769847e-02, 5.292304092e-02, -4.062639499e-02,
    3.054318039e-02, -2.172870993e-02, 1.438116675e-02, -8.770775982e-03,
    4.955091684e-03, -2.657164160e-03, 1.281126147e-03, -4.793797861e-04,
    2.049043369e-04, -1.477622323e-04, 5.339506681e-05,
)
_GELU_B2 = 4.8 * 4.8


def _gelu_poly(x):
    """Division/exp-free GELU: Phi(x) = clip(0.5 + x*P(min(x^2, 4.8^2)), 0, 1)
    with P the degree-14 Chebyshev fit above; gelu = x*Phi(x).

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
                sub, n_sub):
    # x_ref:  (M, Cin) int8 — row block of LN output codes
    # w1_ref: (Cin, Hid) int8;  w2_ref: (Hid, Cout) int8
    # v1_ref: (2, Hid) f32 — [mult1 (in_scale*s_w1), bias1]
    # v2_ref: (4, Cout) f32 — [mult2 (s_q1*s_w2), bias2, out_scale (PTF),
    #         1/out_scale] (reciprocal precomputed: one VPU mul instead of a
    #         multi-pass per-channel divide in the fence)
    # scal_ref: SMEM (1,) f32 — [1/s_q1]
    # out_ref: (M, Cout) f32 — qact2-quantized MLP output
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
        y = jnp.clip(jnp.round(y * inv_out_scale), -128.0, 127.0) * out_scale
        out_ref[pl.ds(i * sub, sub), :] = y

    mid_cur = fc1(0)
    for i in range(n_sub):
        mid_next = fc1(i + 1) if i + 1 < n_sub else None
        g = gelu_requant(mid_cur)  # VPU — overlaps mid_next's MXU work
        fc2(g, i)
        mid_cur = mid_next


def fused_int_mlp(x_i8, w1, w2, mult1, bias1, mult2, bias2, out_scale,
                  s_q1, *, block_rows=512, sub=256, interpret=False):
    """x_i8: (R, Cin) int8 row-major tokens (R padded to block_rows).
    w1: (Cin, Hid) int8; w2: (Hid, Cout) int8.
    Returns (R, Cout) f32, already on the mlp.qact2 grid."""
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
                               n_sub=block_rows // sub)
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
        out_shape=jax.ShapeDtypeStruct((r, cout), jnp.float32),
        interpret=interpret,
    )(x_i8, w1, w2, v1, v2, scal)
