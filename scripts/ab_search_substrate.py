#!/usr/bin/env python
"""A/B the mixed-precision search's eval substrate on the real chip, and
decompose where the fake-quant path burns time (VERDICT r3 weak #4).

Three measurements on deit_small (chained dispatch throughout — the only
honest timing on the axon tunnel, CLAUDE.md):

1. fp32 forward             — the no-quant skeleton (matmul + LN + softmax)
2. fake-quant forward       — + every fake_quant VPU pass (the reference's
                              simulation semantics, search substrate today)
3. int path (static bake)   — the deployment path (BENCH headline)
4. vmapped fake forward_bits, ncand candidates — per-candidate-image rate
   of the CURRENT search substrate
5. forward_bits_int         — per-candidate-image rate of the NEW
                              integer-path search substrate
                              (select_int_bits, one jitted program)

fake − fp32 isolates the fake-quant VPU overhead; fp32 − int isolates the
bf16-vs-int8 MXU rate + the fused LIS/LN wins.  4 vs 5 is the search-user
delta the --search-path flag buys.

Usage: python scripts/ab_search_substrate.py [--batch 192] [--ncand 8]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=192)
    ap.add_argument("--ncand", type=int, default=8)
    ap.add_argument("--steps", type=int, default=12)
    ap.add_argument("--model", default="deit_small")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from diffvit_tpu.config import QuantConfig
    from diffvit_tpu.engine import QuantizedViT
    from diffvit_tpu.models import vit

    spec = vit.VIT_SPECS[args.model]
    cfg = QuantConfig()
    m = QuantizedViT(spec, cfg,
                     params=vit.init_params(spec, jax.random.PRNGKey(0)))
    rng = np.random.default_rng(0)
    m.calibrate(rng.standard_normal((8, 3, 224, 224)).astype("float32"))

    B = args.batch
    x = jnp.asarray(rng.standard_normal((B, 3, 224, 224)), jnp.float32)
    x = jax.device_put(x)
    nslots = vit.num_bit_slots(spec)
    bc48 = (8,) + (4, 8) * (2 * spec.depth) + (8,)
    bits_one = jnp.asarray(bc48, jnp.int32)
    # candidate batch: alternate phases so the select paths aren't constant
    cands = np.stack([np.roll([4, 8] * (nslots // 2) + [8] * (nslots % 2), i)
                      for i in range(args.ncand)]).astype(np.int32)
    cands[:, 0] = 8
    cands_dev = jnp.asarray(cands)

    def timed(label, call, images_per_step, steps=None):
        steps = steps or args.steps
        y = call()
        jax.block_until_ready(y)
        y = call()
        jax.block_until_ready(y)
        t0 = time.perf_counter()
        for _ in range(steps):
            y = call()
        jax.block_until_ready(y)
        dt = (time.perf_counter() - t0) / steps
        print(f"  {label:34s} {dt*1e3:8.2f} ms/step  "
              f"{images_per_step/dt:10.1f} img/s")
        return dt

    print(f"model={args.model} b={B} ncand={args.ncand} "
          f"(chained dispatch; candidate-image rates for 4/5)")
    t_fp = timed("1 fp32 forward", lambda: m(x, quant=False), B)
    t_fake = timed("2 fake-quant forward (bc 4/8 mix)",
                   lambda: m(x, bc48, quant=True), B)
    t_int = timed("3 int path (static bake)",
                  lambda: m(x, bc48, quant=True, use_int=True), B)
    t_vf = timed("4 vmapped fake forward_bits",
                 lambda: m.forward_bits(x, cands_dev), B * args.ncand)
    t_ib = timed("5 forward_bits_int (select)",
                 lambda: m.forward_bits_int(x, bits_one), B)

    print("\ndecomposition:")
    print(f"  fake-quant VPU overhead (2-1): {1e3*(t_fake-t_fp):7.2f} ms/step")
    print(f"  int-path win vs fp32   (1-3): {1e3*(t_fp-t_int):7.2f} ms/step")
    print(f"  search substrate: fake {B*args.ncand/t_vf:.0f} vs "
          f"int {B/t_ib:.0f} cand-img/s  "
          f"({(B/t_ib)/(B*args.ncand/t_vf):.2f}x)")


if __name__ == "__main__":
    main()
