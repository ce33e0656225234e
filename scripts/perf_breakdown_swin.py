#!/usr/bin/env python
"""Per-component chained-timing breakdown of the Swin-T integer step.

Same honest chained-loop methodology as scripts/perf_breakdown.py (the
axon backend overlaps independent dispatches — CLAUDE.md).  Components
are sized exactly as they appear in the batch-B step, per stage, so the
sum can be compared against the full-step time and the dominant stage is
visible.

Usage: python scripts/perf_breakdown_swin.py [--batch 128]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def chain_host(fn, x, steps=10, warmup=2):
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
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--lis", type=int, default=1)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from diffvit_tpu.config import QuantConfig
    from diffvit_tpu.models import swin, swin_int
    from diffvit_tpu.models.swin import block_geometry
    from diffvit_tpu.ops.pallas.attention import fused_swin_attention
    from diffvit_tpu.ops.pallas.mlp import fused_int_mlp

    B = args.batch
    spec = swin.SWIN_SPECS["swin_tiny"]
    cfg = QuantConfig()
    rng = np.random.default_rng(0)
    # setup on the CPU backend: hundreds of tiny init/bake ops would
    # each pay the tunnel's ~24 ms per-dispatch RPC (bench._setup_on_cpu)
    import bench

    def build():
        params = swin.init_swin_params(spec, jax.random.PRNGKey(0))
        calib = jnp.asarray(rng.standard_normal((2, 3, 224, 224)),
                            jnp.float32)
        qp_shapes, _ = jax.eval_shape(
            lambda p, b: swin.calibrate(p, spec, cfg, b), params, calib)
        qp = {k: (jnp.zeros(v.shape, v.dtype) if k.endswith(".zp")
                  else jnp.full(v.shape, 2.0**-6, v.dtype))
              for k, v in qp_shapes.items()}
        return qp, swin_int.prepare_int(params, qp, spec, cfg, 8)

    qp, ip = bench._setup_on_cpu(build)

    x_img = jnp.asarray(rng.standard_normal((B, 3, 224, 224)), jnp.float32)
    t_full = chain_host(
        lambda x: swin_int.forward_q_int(ip, spec, cfg, x), x_img, args.steps)
    print(f"full step               : {t_full*1e3:8.2f} ms   "
          f"({B/t_full:.0f} img/s)")

    named = 0.0
    for si in range(spec.num_layers):
        nblk = spec.depths[si]
        res = spec.stage_resolution(si)
        _, ws, _, mask = block_geometry(spec, si, min(1, nblk - 1))
        n = ws * ws
        npad = (n + 7) // 8 * 8
        c = spec.stage_dim(si)
        nh = spec.num_heads[si]
        hd = c // nh
        nwin = (res[0] // ws) * (res[1] // ws)
        bw = B * nwin
        st = ip["layers"][si]
        ib = st["blocks"][0]
        p = f"layers.{si}.blocks.0"

        def s(path):
            return qp[f"{path}.scale"]

        # ---- window attention kernel, sized as one block of this stage ----
        qkvf = jnp.asarray(rng.integers(-128, 128, (bw, 3, nh, npad, hd)),
                           jnp.float32)
        idx = swin.relative_position_index(ws).reshape(-1)
        table_q = ib["rel_bias_table"]
        bias = table_q[idx].reshape(n, n, nh).transpose(2, 0, 1)
        bias_p = jnp.pad(bias, ((0, 0), (0, npad - n), (0, npad - n)))
        s_a2 = s(f"{p}.attn.qact2")
        mask_div = None
        nw = 1
        if mask is not None:
            nw = mask.shape[0]
            mask_div = jnp.pad(jnp.asarray(mask),
                               ((0, 0), (0, npad - n), (0, npad - n))) / s_a2
        s1 = s(f"{p}.attn.qact1")
        scalars = jnp.stack([
            s1 * s1 * hd**-0.5 / s(f"{p}.attn.qact_attn1"),
            s(f"{p}.attn.qact_attn1"), 1.0 / s_a2, s_a2,
            s1 / s(f"{p}.attn.qact3"),
        ]).astype(jnp.float32)

        def attn_xn(qf, lis=bool(args.lis)):
            q_i8 = qf.astype(jnp.int8)
            o = None
            for _ in range(nblk):
                o = fused_swin_attention(
                    q_i8, bias_p, mask_div, scalars, num_heads=nh,
                    n_real=n, n_windows=nw, bits=4, lis=lis)
                q_i8 = jnp.broadcast_to(o[:, None], (bw, 3, nh, npad, hd))
            return o

        t_attn = chain_host(attn_xn, qkvf, args.steps)
        t_attn_sm = chain_host(lambda q: attn_xn(q, False), qkvf, args.steps)

        # ---- qkv + proj int_linear (bf16 dots), sized per block ----
        wq, wp = ib["qkv"], ib["proj"]
        xwf = jnp.asarray(rng.integers(-128, 128, (bw, n, c)), jnp.float32)

        def lin_xn(xf):
            x_i8 = xf.astype(jnp.bfloat16)
            y = None
            for _ in range(nblk):
                y = jax.lax.dot_general(
                    x_i8, wq["w_int"].astype(jnp.bfloat16),
                    (((2,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                o = jnp.clip(jnp.round(y[..., :c] * 0.01), -128, 127) \
                    .astype(jnp.bfloat16)
                y = jax.lax.dot_general(
                    o, wp["w_int"].astype(jnp.bfloat16),
                    (((2,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                x_i8 = jnp.clip(jnp.round(y * 0.01), -128, 127) \
                    .astype(jnp.bfloat16)
            return y

        t_lin = chain_host(lin_xn, xwf, args.steps)

        # ---- MLP kernel, sized per block ----
        rows = B * res[0] * res[1]
        rpad = (rows + 511) // 512 * 512
        f1, f2 = ib["fc1"], ib["fc2"]
        xr = jnp.asarray(rng.integers(-128, 128, (rpad, c)), jnp.float32)

        def mlp_xn(xf):
            x_i8 = xf.astype(jnp.int8)
            y = None
            for _ in range(nblk):
                y = fused_int_mlp(
                    x_i8, f1["w_int"], f2["w_int"],
                    s(f"{p}.qact3") * f1["sw"], f1["b"],
                    s(f"{p}.mlp.qact1") * f2["sw"], f2["b"],
                    s(f"{p}.mlp.qact2"), s(f"{p}.mlp.qact1"),
                    block_rows=512, emit_codes=True)
                x_i8 = y
            return y

        t_mlp = chain_host(mlp_xn, xr, args.steps)

        # ---- fences + integer LNs, sized per block (codes path) ----
        hcf = jnp.asarray(rng.integers(-128, 128, (B, res[0] * res[1], c)),
                          jnp.float32)
        yf = jnp.asarray(rng.standard_normal((bw, n, c)), jnp.float32)

        def fence_xn(hf):
            hc = hf.astype(jnp.int8)
            out = None
            for _ in range(nblk):
                x_i8 = swin_int._ln_int8(None, ib["norm1"], s(f"{p}.qact4"),
                                         s(f"{p}.qact1"), spec.ln_eps,
                                         x_codes=hc)
                yq = jnp.clip(jnp.round(yf * 0.01), -128, 127)
                hs = hc.astype(jnp.float32) * s(f"{p}.qact4") \
                    + swin_int._unwindows(yq, res, ws, 0, B) * 0.01
                hc = jnp.clip(jnp.round(hs / s(f"{p}.qact2")), -128, 127) \
                    .astype(jnp.int8)
                out = x_i8
            return out

        t_fence = chain_host(fence_xn, hcf, args.steps)

        stage_sum = t_attn + t_lin + t_mlp + t_fence
        named += stage_sum
        print(f"stage {si} (x{nblk} blk, {nwin:3d} win/img, C={c:4d}): "
              f"attn {t_attn*1e3:6.2f} (sm {t_attn_sm*1e3:6.2f}) "
              f"lin {t_lin*1e3:6.2f} mlp {t_mlp*1e3:6.2f} "
              f"fence {t_fence*1e3:6.2f} | sum {stage_sum*1e3:6.2f} ms")

    print(f"sum of components       : {named*1e3:8.2f} ms "
          f"(full-step residual {max(t_full-named,0)*1e3:.2f} ms)")


if __name__ == "__main__":
    main()
