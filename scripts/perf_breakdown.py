#!/usr/bin/env python
"""Per-component chained-timing breakdown of the DeiT-S integer step.

Times each hot component in isolation with the same honest chained loops
bench.py uses (fire-and-forget lies on the axon backend — CLAUDE.md).
Components are sized exactly as they appear in the batch-192 step so the
sum can be compared against the full-step time.

Usage: python scripts/perf_breakdown.py [--batch 192]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def chain_host(fn, x, steps=20, warmup=2):
    """Host-dispatched chained timing (pallas-safe on axon)."""
    import jax.numpy as jnp

    import jax

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
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=192)
    ap.add_argument("--steps", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from diffvit_tpu.config import QuantConfig
    from diffvit_tpu.models import vit, vit_int
    from diffvit_tpu.ops.pallas.attention import fused_qkv_attention_v2
    from diffvit_tpu.ops.pallas.mlp import fused_int_mlp

    B = args.batch
    spec = vit.VIT_SPECS["deit_small"]
    cfg = QuantConfig()
    rng = np.random.default_rng(0)
    params = vit.init_params(spec, jax.random.PRNGKey(0))
    calib = jnp.asarray(rng.standard_normal((8, 3, 224, 224)), jnp.float32)
    qp_shapes, _ = jax.eval_shape(
        lambda p, b: vit.calibrate(p, spec, cfg, b), params, calib)
    qp = {k: (jnp.zeros(v.shape, v.dtype) if k.endswith(".zp")
              else jnp.full(v.shape, 2.0**-6, v.dtype))
          for k, v in qp_shapes.items()}
    ip = vit_int.prepare_int(params, qp, spec, cfg,
                             (4,) * vit.num_bit_slots(spec))

    N, C, H, D = 197, spec.embed_dim, spec.num_heads, spec.head_dim
    NP = 200  # padded rows
    depth = spec.depth
    rows = B * N
    rpad = (rows + 511) // 512 * 512

    x_img = jnp.asarray(rng.standard_normal((B, 3, 224, 224)), jnp.float32)
    t_full = chain_host(
        lambda x: vit_int.forward_q_int(ip, spec, cfg, x), x_img, args.steps)
    print(f"full step                 : {t_full*1e3:8.2f} ms   "
          f"({B/t_full:.0f} img/s)")

    blk = ip["blocks"][0]
    qs = blk["qkv"]
    s1 = blk["attn.qact1"]["scale"]
    s_a = blk["attn.qact_attn1"]["scale"]
    s2 = blk["attn.qact2"]["scale"]
    scalars2 = jnp.stack([s_a, s1 * s1 * spec.attn_scale / s_a,
                          1.0 / s1, s1 / s2]).astype(jnp.float32)

    x_i8f = jnp.asarray(rng.integers(-128, 128, (B, NP, C)), jnp.float32)

    def attn_x12(xf, lis=True):
        x_i8 = xf.astype(jnp.int8)
        o = None
        for _ in range(depth):
            o = fused_qkv_attention_v2(
                x_i8, qs["w_int"], qs["mult"], qs["b"], scalars2,
                num_heads=H, head_dim=D, n_real=N, bits=4, lis=lis,
                lis_fast=True)
            x_i8 = o.transpose(0, 2, 1, 3).reshape(B, NP, C)
        return o

    t_attn = chain_host(lambda xf: attn_x12(xf, True), x_i8f, args.steps)
    print(f"attn kernel x{depth} (LIS)    : {t_attn*1e3:8.2f} ms")
    t_attn_sm = chain_host(lambda xf: attn_x12(xf, False), x_i8f, args.steps)
    print(f"attn kernel x{depth} (softmax): {t_attn_sm*1e3:8.2f} ms")

    f1, f2 = blk["fc1"], blk["fc2"]
    xr = jnp.asarray(rng.integers(-128, 128, (rpad, C)), jnp.float32)

    def mlp_x12(xf):
        x_i8 = xf.astype(jnp.int8)
        y = None
        for _ in range(depth):
            y = fused_int_mlp(
                x_i8, f1["w_int"], f2["w_int"], f1["mult"], f1["b"],
                f2["mult"], f2["b"], blk["mlp.qact2"]["scale"],
                blk["mlp.qact1"]["scale"], block_rows=512)
            x_i8 = jnp.clip(jnp.round(y), -128, 127).astype(jnp.int8)
        return y

    t_mlp = chain_host(mlp_x12, xr, args.steps)
    print(f"mlp kernel x{depth}           : {t_mlp*1e3:8.2f} ms")

    # proj matmul + epilogue as in forward_q_int fused2 path
    ps = blk["proj"]
    w_hdc = ps["w_int"].reshape(H, D, C)
    o_i8f = jnp.asarray(rng.integers(-128, 128, (B, H, N, D)), jnp.float32)

    def proj_x12(of):
        o_i8 = of.astype(jnp.int8)
        y = None
        for _ in range(depth):
            y = jax.lax.dot_general(
                o_i8, w_hdc, (((1, 3), (0, 1)), ((), ())),
                preferred_element_type=jnp.int32).astype(jnp.float32) \
                * ps["mult"] + ps["b"]
        return y

    t_proj = chain_host(proj_x12, o_i8f, args.steps)
    print(f"proj matmul x{depth}          : {t_proj*1e3:8.2f} ms")

    # fence chain: qact3 -> residual add -> qact2 -> int LN (norm2) as in step
    from diffvit_tpu.models.vit_int import _fq_site, _ln_int8

    h0 = jnp.asarray(rng.standard_normal((B, N, C)), jnp.float32)
    y0 = jnp.asarray(rng.standard_normal((B, N, C)), jnp.float32)
    bt_a = cfg.bit_a

    def fence_x12(y):
        h = h0
        out = None
        for _ in range(depth):
            yq = _fq_site(blk["attn.qact3"], y, bt_a)
            h = _fq_site(blk["qact2"], h + yq, bt_a)
            out = _ln_int8(h, blk["norm2"], blk["qact2"]["scale"],
                           f1.get("ln_out_scale", f1["in_scale"]),
                           spec.ln_eps, rescale=f1.get("ln_rescale"))
            y = y * (1.0 + 1e-12)
        return out

    t_fence = chain_host(fence_x12, y0, args.steps)
    print(f"fence+LN x{depth}             : {t_fence*1e3:8.2f} ms")

    named = t_attn + t_mlp + t_proj + t_fence
    print(f"sum of components         : {named*1e3:8.2f} ms "
          f"(full-step residual {max(t_full-named,0)*1e3:.2f} ms = "
          f"patch/pos/head/other fences/dispatch)")


if __name__ == "__main__":
    main()
