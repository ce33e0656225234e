#!/usr/bin/env python
"""Cross-KERNEL ping-pong feasibility probe (round 3).

Every negative overlap experiment so far (docs/PERF_ANALYSIS.md
"scheduling law" structures 1-7, v3/v4/v5 re-audit) kept producer and
consumer in ONE kernel — and the law's own positive control #3 measured
that LIS reading prepared scores from a kernel INPUT overlaps in-kernel
matmuls essentially perfectly (3.48 + 3.27 -> 3.53 ms).

Untried structure: make the scores a *kernel boundary*.  Split the batch
into two half-streams A/B and pair, in one kernel,

  * stream B's MXU phase: full-width qkv matmul + per-head score dots +
    requant -> scores_B written to HBM (int8), and
  * stream A's VPU phase: LIS on scores_A read from HBM (INPUT-ROOTED)
    -> attn@v dot -> output codes.

If the paired kernel runs at ~max(producer, consumer) instead of their
sum, the ~7 ms/step LIS chain hides under the MXU for ~0.9 ms of extra
scores DMA, and the production attention should be restructured this way
(estimated 8.2k -> ~10k img/s DeiT-S int4 b256).

Measures (chained, x12 depth-equivalent iterations):
  producer-only | consumer-only | paired | sum | max
"""
from __future__ import annotations

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def chain_host(fn, x, steps=12, warmup=2):
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

    from diffvit_tpu.ops.pallas.attention import _lis_body

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 128  # per half-stream
    NP, N, H, D = 200, 197, 6, 64
    C = H * D
    depth = 12
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(-128, 128, (B, NP, C)), jnp.float32)
    scores_a = jnp.asarray(rng.integers(-128, 128, (B, H, NP, NP)), jnp.int8)
    v_a = jnp.asarray(rng.integers(-128, 128, (B, H, NP, D)), jnp.int8)
    w_all = jnp.asarray(rng.integers(-8, 8, (C, 3 * C)), jnp.int8)
    mult = jnp.full((3 * C,), 2.0**-9, jnp.float32)
    bias = jnp.asarray(rng.standard_normal(3 * C) * 0.01, jnp.float32)
    # [s_a, c1, 1/s1, s1/s2] like production
    scal = jnp.asarray([2.0**-4, 0.05, 24.0, 1.3], jnp.float32)

    def producer_part(x_ref, w_ref, mb_ref, scal_ref, sco_ref):
        """Stream B MXU phase: qkv matmul + per-head scores + requant."""
        c1 = scal_ref[1]
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
            sco_ref[0, h] = a.astype(jnp.int8)

    def consumer_part(sa_ref, va_ref, scal_ref, out_ref, *, n_real, bits):
        """Stream A VPU phase: LIS on INPUT scores -> attn@v -> codes."""
        s_a = scal_ref[0]
        s1_over_s2 = scal_ref[3]
        npad = sa_ref.shape[2]
        col = jax.lax.broadcasted_iota(jnp.int32, (npad, npad), dimension=1)
        col_ok = col < n_real
        for h in range(H):
            a_int = sa_ref[0, h].astype(jnp.float32)
            attn = _lis_body(a_int, s_a, bits, col_ok, fast=True)
            v = va_ref[0, h].astype(jnp.bfloat16)
            o = jax.lax.dot_general(
                attn, v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            o = jnp.clip(jnp.round(o * s1_over_s2), -128.0, 127.0)
            out_ref[0, h] = o.astype(jnp.int8)

    def paired_kernel(x_ref, w_ref, mb_ref, sa_ref, va_ref, scal_ref,
                      sco_ref, out_ref, *, n_real, bits):
        producer_part(x_ref, w_ref, mb_ref, scal_ref, sco_ref)
        consumer_part(sa_ref, va_ref, scal_ref, out_ref,
                      n_real=n_real, bits=bits)

    s1_inv = scal[2]
    mb = jnp.stack([mult * s1_inv, bias * s1_inv]).astype(jnp.float32)

    x_spec = pl.BlockSpec((1, NP, C), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    sa_spec = pl.BlockSpec((1, H, NP, NP), lambda i: (i, 0, 0, 0),
                           memory_space=pltpu.VMEM)
    va_spec = pl.BlockSpec((1, H, NP, D), lambda i: (i, 0, 0, 0),
                           memory_space=pltpu.VMEM)
    sco_out = jax.ShapeDtypeStruct((B, H, NP, NP), jnp.int8)
    o_out = jax.ShapeDtypeStruct((B, H, NP, D), jnp.int8)

    def run_producer(xf):
        x_i8 = xf.astype(jnp.int8)
        o = None
        for _ in range(depth):
            o = pl.pallas_call(
                producer_part, grid=(B,),
                in_specs=[x_spec,
                          pl.BlockSpec(memory_space=pltpu.VMEM),
                          pl.BlockSpec(memory_space=pltpu.VMEM),
                          pl.BlockSpec(memory_space=pltpu.SMEM)],
                out_specs=sa_spec, out_shape=sco_out,
            )(x_i8, w_all, mb, scal)
            x_i8 = jnp.clip(o[:, 0, :, :C // 8 * 8].astype(jnp.int32), -128,
                            127).astype(jnp.int8)
            x_i8 = jnp.pad(x_i8, ((0, 0), (0, 0), (0, C - x_i8.shape[2])))
        return o

    def run_consumer(xf):
        # data-dependent chain through the scores operand
        sa = scores_a
        o = None
        for _ in range(depth):
            o = pl.pallas_call(
                functools.partial(consumer_part, n_real=N, bits=4),
                grid=(B,),
                in_specs=[sa_spec, va_spec,
                          pl.BlockSpec(memory_space=pltpu.SMEM)],
                out_specs=va_spec, out_shape=o_out,
            )(sa, v_a, scal)
            # fold output back into scores to chain (cheap XLA glue)
            sa = (sa.astype(jnp.int32)
                  + jnp.pad(o, ((0, 0), (0, 0), (0, 0), (0, NP - D)))
                  .astype(jnp.int32) * 0).astype(jnp.int8)
        return o

    def run_paired(xf):
        x_i8 = xf.astype(jnp.int8)
        sa = scores_a
        o = None
        for _ in range(depth):
            sco, o = pl.pallas_call(
                functools.partial(paired_kernel, n_real=N, bits=4),
                grid=(B,),
                in_specs=[x_spec,
                          pl.BlockSpec(memory_space=pltpu.VMEM),
                          pl.BlockSpec(memory_space=pltpu.VMEM),
                          sa_spec, va_spec,
                          pl.BlockSpec(memory_space=pltpu.SMEM)],
                out_specs=(sa_spec, va_spec),
                out_shape=(sco_out, o_out),
            )(x_i8, w_all, mb, sa, v_a, scal)
            sa = sco  # next tick consumes what this tick produced
            x_i8 = jnp.clip(o[:, 0, :, :D].astype(jnp.int32), -128,
                            127).astype(jnp.int8)
            x_i8 = jnp.pad(x_i8, ((0, 0), (0, 0), (0, C - D)))
        return o

    for name, fn in [("producer only (MXU)", run_producer),
                     ("consumer only (LIS+attn@v)", run_consumer),
                     ("paired ping-pong", run_paired)]:
        t = chain_host(fn, x)
        print(f"{name:28s} x{depth}: {t*1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
