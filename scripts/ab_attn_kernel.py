#!/usr/bin/env python
"""A/B the fully-fused attention kernel variants (v1 per-head qkv matmuls
vs v2 full-width qkv matmul) at DeiT-S batch-192 shapes."""
from __future__ import annotations

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

    from diffvit_tpu.ops.pallas.attention import (fused_qkv_attention,
                                                  fused_qkv_attention_v2)

    B, NP, N, H, D = 192, 200, 197, 6, 64
    C = H * D
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(-128, 128, (B, NP, C)), jnp.float32)
    w_all = jnp.asarray(rng.integers(-8, 8, (C, 3 * C)), jnp.int8)
    mult = jnp.full((3 * C,), 2.0**-9, jnp.float32)
    bias = jnp.asarray(rng.standard_normal(3 * C) * 0.01, jnp.float32)
    scal = jnp.asarray([2.0**-4, 0.05, 24.0, 1.3], jnp.float32)

    # v1 layout
    codes = w_all.T.reshape(3, H, D, C).transpose(0, 1, 3, 2)
    wq, wk, wv = codes[0], codes[1], codes[2]
    mult_h = mult.reshape(3, H, D)
    bias_h = bias.reshape(3, H, D)
    scal_v1 = jnp.asarray([scal[0], scal[1], scal[2], scal[3]], jnp.float32)

    interp = jax.default_backend() == "cpu"
    depth = 12

    def run_v1(xf):
        x_i8 = xf.astype(jnp.int8)
        o = None
        for _ in range(depth):
            o = fused_qkv_attention(x_i8, wq, wk, wv, mult_h, bias_h,
                                    scal_v1, n_real=N, bits=4, lis=True,
                                    interpret=interp)
            x_i8 = o.transpose(0, 2, 1, 3).reshape(B, NP, C)
        return o

    def run_v2(xf):
        x_i8 = xf.astype(jnp.int8)
        o = None
        for _ in range(depth):
            o = fused_qkv_attention_v2(x_i8, w_all, mult, bias, scal,
                                       num_heads=H, head_dim=D, n_real=N,
                                       bits=4, lis=True, interpret=interp)
            x_i8 = o.transpose(0, 2, 1, 3).reshape(B, NP, C)
        return o

    # correctness
    x_small = x[:2]
    o1 = fused_qkv_attention(x_small.astype(jnp.int8), wq, wk, wv, mult_h,
                             bias_h, scal_v1, n_real=N, bits=4, lis=True,
                             interpret=interp)
    o2 = fused_qkv_attention_v2(x_small.astype(jnp.int8), w_all, mult, bias,
                                scal, num_heads=H, head_dim=D, n_real=N,
                                bits=4, lis=True, interpret=interp)
    a1, a2 = np.asarray(o1, np.int32), np.asarray(o2, np.int32)
    eq = (a1 == a2).mean()
    print(f"agreement v1 vs v2: {eq:.6f}  maxdiff {np.abs(a1-a2).max()}")

    if jax.default_backend() != "cpu":
        t1 = chain_host(run_v1, x)
        print(f"v1 (per-head qkv)  x{depth}: {t1*1e3:8.2f} ms")
        t2 = chain_host(run_v2, x)
        print(f"v2 (full-width qkv) x{depth}: {t2*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
