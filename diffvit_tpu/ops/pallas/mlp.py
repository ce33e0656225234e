"""Fused integer MLP kernel (Pallas/Mosaic, TPU).

Fuses fc1 -> exact GELU -> qact1 requant -> fc2 -> qact2 (PTF) requant for
the integer path.  Exact erf GELU costs ~9 ms/step on the VPU for DeiT-S at
batch 192 — more than the MLP matmuls themselves — so the kernel
software-pipelines row sub-blocks: sub-block i+1's fc1 (MXU) is issued
before sub-block i's GELU/requant (VPU), and fc2 (MXU) follows, letting
Mosaic overlap the units exactly like the fused attention kernel.

Numerics match models/vit_int's XLA path (int8 matmuls accumulate in int32,
epilogues in f32) except GELU: Mosaic has no erf primitive, so the kernel
uses the Abramowitz-Stegun 7.1.26 rational erf (|gelu error| <= 7.5e-8*|x|,
orders of magnitude below half a qact1 step — downstream int8 codes match
the exact-erf path except on rare exact-boundary elements).

Reference semantics: Mlp.forward (layers_quant.py:318-350) — fc1, GELU,
qact1, fc2, qact2.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


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
    # v2_ref: (3, Cout) f32 — [mult2 (s_q1*s_w2), bias2, out_scale (PTF)]
    # scal_ref: SMEM (1,) f32 — [1/s_q1]
    # out_ref: (M, Cout) f32 — qact2-quantized MLP output
    s_q1_inv = scal_ref[0]
    mult1 = v1_ref[0][None, :]
    bias1 = v1_ref[1][None, :]
    mult2 = v2_ref[0][None, :]
    bias2 = v2_ref[1][None, :]
    out_scale = v2_ref[2][None, :]

    def fc1(i):
        xs = x_ref[pl.ds(i * sub, sub), :]
        acc = jax.lax.dot_general(
            xs, w1_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        return acc.astype(jnp.float32) * mult1 + bias1

    def gelu_requant(mid):
        g = _gelu_exact_approx(mid)
        return jnp.clip(jnp.round(g * s_q1_inv), -128.0, 127.0) \
            .astype(jnp.int8)

    def fc2(g_i8, i):
        acc = jax.lax.dot_general(
            g_i8, w2_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        y = acc.astype(jnp.float32) * mult2 + bias2
        # mlp.qact2 fence (PTF per-channel)
        y = jnp.clip(jnp.round(y / out_scale), -128.0, 127.0) * out_scale
        out_ref[pl.ds(i * sub, sub), :] = y

    mid_cur = fc1(0)
    for i in range(n_sub):
        mid_next = fc1(i + 1) if i + 1 < n_sub else None
        g = gelu_requant(mid_cur)  # VPU — overlaps mid_next's MXU work
        fc2(g, i)
        mid_cur = mid_next


def fused_int_mlp(x_i8, w1, w2, mult1, bias1, mult2, bias2, out_scale,
                  s_q1, *, block_rows=512, sub=128, interpret=False):
    """x_i8: (R, Cin) int8 row-major tokens (R padded to block_rows).
    w1: (Cin, Hid) int8; w2: (Hid, Cout) int8.
    Returns (R, Cout) f32, already on the mlp.qact2 grid."""
    r, cin = x_i8.shape
    hid = w1.shape[1]
    cout = w2.shape[1]
    assert r % block_rows == 0 and block_rows % sub == 0
    v1 = jnp.stack([jnp.broadcast_to(mult1, (hid,)),
                    jnp.broadcast_to(bias1, (hid,))]).astype(jnp.float32)
    v2 = jnp.stack([jnp.broadcast_to(mult2, (cout,)),
                    jnp.broadcast_to(bias2, (cout,)),
                    jnp.broadcast_to(out_scale, (cout,))]).astype(jnp.float32)
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
