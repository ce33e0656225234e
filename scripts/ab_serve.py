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


def chain_fori(run, batch, steps=100):
    """Device-side chaining: ONE dispatch drives `steps` data-dependent
    iterations in a lax.fori_loop — no host/tunnel involvement per step.
    Sub-millisecond host-dispatched rows are enqueue-bound on this rig
    (production b1 reads 0.80-1.34 ms across runs); this measures the
    chip."""
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((batch, 3, 224, 224)), jnp.float32)

    @jax.jit
    def many(x):
        def body(_, c):
            logits = run(c)
            return c * (1.0 + 1e-12 * jnp.sum(logits))
        return jax.lax.fori_loop(0, steps, body, x)

    many(x).block_until_ready()  # compile + warm
    t0 = time.perf_counter()
    many(x).block_until_ready()
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

    timer = chain_fori if "--fori" in sys.argv else chain
    for b in (1, 8):
        t_prod = timer(lambda x: vit_int.forward_q_int(ip, spec, cfg, x), b)
        t_serve = timer(lambda x: vit_int.forward_q_int_serve(
            ip, spec, cfg, x, packed=packed), b)
        print(f"b{b:<3d} production {t_prod*1e3:7.3f} ms ({b/t_prod:7.0f} "
              f"img/s)   resident {t_serve*1e3:7.3f} ms ({b/t_serve:7.0f} "
              f"img/s)   {t_prod/t_serve:5.2f}x", flush=True)


if __name__ == "__main__":
    main()
