#!/usr/bin/env python
"""A/B the resident whole-model serving kernel vs the per-kernel integer
path at serving batch sizes (DeiT-S).  The b1 step is dispatch-bound
(docs/PERF_ANALYSIS.md "Batch-1 serving anatomy"); the resident kernel
collapses ~24 kernel launches + XLA glue into one pallas_call."""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def chain(run, batch, steps=30, warmup=3):
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((batch, 3, 224, 224)), jnp.float32)

    @jax.jit
    def step(x):
        logits = run(x)
        return x * (1.0 + 1e-12 * jnp.sum(logits))

    for _ in range(warmup):
        x = step(x)
    x.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(steps):
        x = step(x)
    x.block_until_ready()
    return (time.perf_counter() - t0) / steps


def main():
    import jax

    from bench import _synth_qp
    from diffvit_tpu.config import QuantConfig
    from diffvit_tpu.models import vit, vit_int
    from diffvit_tpu.ops.pallas.serve import prepare_resident

    model = sys.argv[1] if len(sys.argv) > 1 else "deit_small"
    spec = vit.VIT_SPECS[model]
    cfg = QuantConfig()
    params = vit.init_params(spec, jax.random.PRNGKey(0))
    qp = _synth_qp(lambda p, b: vit.calibrate(p, spec, cfg, b), params)
    bc = (4,) * vit.num_bit_slots(spec)
    ip = vit_int.prepare_int(params, qp, spec, cfg, bc)
    packed = prepare_resident(ip, spec, cfg)

    for b in (1, 8, 16):
        t_prod = chain(lambda x: vit_int.forward_q_int(ip, spec, cfg, x), b)
        t_serve = chain(lambda x: vit_int.forward_q_int_serve(
            ip, spec, cfg, x, packed=packed), b)
        print(f"b{b:<3d} production {t_prod*1e3:7.3f} ms ({b/t_prod:7.0f} "
              f"img/s)   resident {t_serve*1e3:7.3f} ms ({b/t_serve:7.0f} "
              f"img/s)   {t_prod/t_serve:5.2f}x")


if __name__ == "__main__":
    main()
