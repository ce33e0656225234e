#!/usr/bin/env python
"""Round-3 re-audit of the attention-kernel scheduling law.

Round 2 measured that VPU chains consuming in-kernel matmul results
serialize with the MXU (docs/PERF_ANALYSIS.md "scheduling law"), which
killed the v3 (grid-pipelined), v4 (multi-element program) and v5
(interleaved-chunk) attention variants.  The round-3 MLP probe
(scripts/overlap_probe_mlp.py) measured GELU-from-dot ~ GELU-from-input,
suggesting the law changed with a toolchain update.  This re-runs the
attention A/B at production geometry (DeiT-S b256, x12 depth):

  v2        production (full-width qkv, in-program per-head pipeline)
  v2-sm     v2 with float softmax instead of LIS (cheaper VPU chain)
  v2-nv     v2 with a near-zero-VPU attention (attn = a*const) -> the
            MXU + requant floor; v2 - v2nv isolates the LIS chain cost
  v3        cross-grid-step pipeline (qkv(i+1) under LIS(i))
  v4 g2/g4  multi-element programs (all projections before any LIS)
  v5        chunk-interleaved MXU/VPU instruction stream

If v3/v4/v5 now beat v2, or v2 ~ v2-nv (LIS hidden), the law is dead and
the production kernel choice must be revisited.
"""
from __future__ import annotations

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def chain_host(fn, x, steps=20, warmup=2):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def step(c):
        out = fn(c)
        return c * (1.0 + 1e-12 * jnp.sum(out.astype(jnp.float32)))

    c = x
    for _ in range(warmup):
        c = step(c)
    c.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(steps):
        c = step(c)
    c.block_until_ready()
    return (time.perf_counter() - t0) / steps


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from diffvit_tpu.ops.pallas import attention as A

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    NP, N, H, D = 200, 197, 6, 64
    C = H * D
    depth = 12
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(-128, 128, (B, NP, C)), jnp.float32)
    w_all = jnp.asarray(rng.integers(-8, 8, (C, 3 * C)), jnp.int8)
    mult = jnp.full((3 * C,), 2.0**-9, jnp.float32)
    bias = jnp.asarray(rng.standard_normal(3 * C) * 0.01, jnp.float32)
    scal = jnp.asarray([2.0**-4, 0.05, 24.0, 1.3], jnp.float32)

    # near-zero-VPU control: v2 structure, attn = a * const (no LIS chain)
    def _nv_kernel(x_ref, w_ref, mb_ref, scal_ref, out_ref):
        c1 = scal_ref[1]
        s1_over_s2 = scal_ref[3]
        xx = x_ref[0]
        npad = xx.shape[0]
        acc = jax.lax.dot_general(
            xx, w_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        y = acc.astype(jnp.float32) * mb_ref[0][None, :] + mb_ref[1][None, :]
        qkv = jnp.clip(jnp.round(y), -128.0, 127.0).astype(jnp.bfloat16)

        def sl(slot, h):
            lo = slot * C + h * D
            return jax.lax.slice(qkv, (0, lo), (npad, lo + D))

        for h in range(H):
            s = jax.lax.dot_general(
                sl(0, h), sl(1, h), (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            a = jnp.clip(jnp.round(s * c1), -128.0, 127.0)
            attn = (a * 2.0**-7).astype(jnp.bfloat16)
            o = jax.lax.dot_general(
                attn, sl(2, h), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            o = jnp.clip(jnp.round(o * s1_over_s2), -128.0, 127.0)
            out_ref[0, h] = o.astype(jnp.int8)

    def v2_nv(x_i8):
        s1_inv = scal[2]
        mb = jnp.stack([mult * s1_inv, bias * s1_inv]).astype(jnp.float32)
        return pl.pallas_call(
            _nv_kernel,
            grid=(B,),
            in_specs=[
                pl.BlockSpec((1, NP, C), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec((1, H, NP, D), lambda i: (i, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, H, NP, D), jnp.int8),
        )(x_i8, w_all, mb, scal)

    variants = [
        ("v2 (production LIS)",
         lambda xi: A.fused_qkv_attention_v2(
             xi, w_all, mult, bias, scal, num_heads=H, head_dim=D,
             n_real=N, bits=4, lis=True, lis_fast=True)),
        ("v2 softmax",
         lambda xi: A.fused_qkv_attention_v2(
             xi, w_all, mult, bias, scal, num_heads=H, head_dim=D,
             n_real=N, bits=4, lis=False)),
        ("v2 near-zero-VPU", v2_nv),
        ("v3 grid-pipelined",
         lambda xi: A.fused_qkv_attention_v3(
             xi, w_all, mult, bias, scal, num_heads=H, head_dim=D,
             n_real=N, bits=4, lis=True)),
        ("v4 group=2",
         lambda xi: A.fused_qkv_attention_v4(
             xi, w_all, mult, bias, scal, num_heads=H, head_dim=D,
             n_real=N, bits=4, lis=True, group=2)),
        ("v4 group=4",
         lambda xi: A.fused_qkv_attention_v4(
             xi, w_all, mult, bias, scal, num_heads=H, head_dim=D,
             n_real=N, bits=4, lis=True, group=4)),
        ("v5 chunk-interleave",
         lambda xi: A.fused_qkv_attention_v5(
             xi, w_all, mult, bias, scal, num_heads=H, head_dim=D,
             n_real=N, bits=4, lis=True)),
    ]

    for name, call in variants:
        def run(xf, _c=call):
            x_i8 = xf.astype(jnp.int8)
            o = None
            for _ in range(depth):
                o = _c(x_i8)
                x_i8 = o.transpose(0, 2, 1, 3).reshape(B, NP, C)
            return o
        try:
            t = chain_host(run, x)
            print(f"{name:24s} x{depth}: {t*1e3:8.2f} ms")
        except Exception as e:  # noqa: BLE001 — report and move on
            print(f"{name:24s} x{depth}: FAILED {type(e).__name__}: "
                  f"{str(e)[:120]}")


if __name__ == "__main__":
    main()
