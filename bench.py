#!/usr/bin/env python
"""Benchmark: quantized DeiT-S forward throughput on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: the BASELINE.json north-star target of 5000 images/sec/chip for
PoT-quantized DeiT-S end-to-end eval on v5e-1 (the reference itself publishes
no throughput numbers — its GPU eval wall-clock is ~150-190 s for a 5k-image
sweep entry ≈ 30 img/s, BASELINE.md).
"""
from __future__ import annotations

import argparse
import json
import time

import numpy as np

TARGET_IMG_PER_SEC = 5000.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="deit_small")
    ap.add_argument("--bits", default=4, type=int)
    ap.add_argument("--batch", default=192, type=int,
                    help="192 is the measured throughput sweet spot on v5e-1")
    ap.add_argument("--steps", default=30, type=int)
    ap.add_argument("--warmup", default=5, type=int)
    ap.add_argument("--path", default="int", choices=["int", "fake"],
                    help="int = real int8 MXU kernels; fake = reference-style "
                         "simulated quantization")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from diffvit_tpu.config import QuantConfig
    from diffvit_tpu.models import vit

    spec = vit.VIT_SPECS[args.model]
    cfg = QuantConfig()
    params = vit.init_params(spec, jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)

    # Synthesize structurally-real qparams via eval_shape — scale *values*
    # don't affect throughput, and this keeps the bench from paying the
    # calibration trace on every run.
    calib = jnp.asarray(rng.standard_normal((8, 3, 224, 224)), jnp.float32)
    qp_shapes, _ = jax.eval_shape(
        lambda p, b: vit.calibrate(p, spec, cfg, b), params, calib)
    qp = {k: (jnp.zeros(v.shape, v.dtype) if k.endswith(".zp")
              else jnp.full(v.shape, 2.0**-6, v.dtype))
          for k, v in qp_shapes.items()}

    bit_config = (args.bits,) * vit.num_bit_slots(spec)

    if args.path == "int":
        from diffvit_tpu.models import vit_int

        ip = vit_int.prepare_int(params, qp, spec, cfg, bit_config)
        # ip mixes arrays with static metadata (bit_config, fp flags) —
        # close over it so jit treats the statics as Python constants
        step = jax.jit(lambda x: vit_int.forward_q_int(ip, spec, cfg, x))
        run = step
    else:
        @jax.jit
        def step(params, qp, x):
            return vit.forward_q(params, qp, spec, cfg, x, bit_config)

        run = lambda x: step(params, qp, x)

    x = jnp.asarray(rng.standard_normal((args.batch, 3, 224, 224)), jnp.float32)

    # Chained, data-dependent steps: on virtualized TPU backends,
    # independent dispatches of the same executable can overlap across
    # backing hardware, making fire-and-forget timing meaningless.  Feeding
    # a (negligible) function of step i's output into step i+1 forces true
    # sequential single-chip execution.  Host-dispatched (not fori_loop) so
    # the Pallas attention kernel path works (see models/vit_int.py note);
    # the ~1 ms/step dispatch overhead makes this slightly conservative.

    @jax.jit
    def step_chained(x):
        logits = run(x)
        return x * (1.0 + 1e-12 * jnp.sum(logits))

    x = step_chained(x)
    x.block_until_ready()  # compile + warm
    t0 = time.perf_counter()
    for _ in range(args.steps):
        x = step_chained(x)
    x.block_until_ready()
    dt = time.perf_counter() - t0

    img_per_sec = args.batch * args.steps / dt
    print(json.dumps({
        "metric": f"{args.model}_int{args.bits}_{args.path}_throughput",
        "value": round(img_per_sec, 1),
        "unit": "images/sec/chip",
        "vs_baseline": round(img_per_sec / TARGET_IMG_PER_SEC, 4),
    }))


if __name__ == "__main__":
    main()
