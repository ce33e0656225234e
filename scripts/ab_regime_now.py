"""Minimal full-model tunnel-regime check (round-5 end).

Legs (deit_small int4, u8 wire, b256):
  B  chain-token over FRESH PRE-PUT buffers  (wire-bound: ~353 ms/step,
     fast: ~chip rate)
  C  carry-threaded x->x loop                (chip floor, ~31.4 ms/step)

Uses bench._setup_on_cpu so setup doesn't pay per-op tunnel RPCs.
Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/ab_regime_now.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402

import bench  # noqa: E402


def main(steps=12, batch=256):
    import jax
    import jax.numpy as jnp

    from diffvit_tpu.config import QuantConfig
    from diffvit_tpu.data.imagenet import device_normalize
    from diffvit_tpu.models import vit, vit_int

    spec = vit.VIT_SPECS["deit_small"]
    cfg = QuantConfig()

    def build():
        params = vit.init_params(spec, jax.random.PRNGKey(0))
        qp = bench._synth_qp(
            lambda p, b: vit.calibrate(p, spec, cfg, b), params)
        return vit_int.prepare_int(params, qp, spec, cfg,
                                   (4,) * vit.num_bit_slots(spec))

    print("setup (cpu-side)...", flush=True)
    ip = bench._setup_on_cpu(build)

    @jax.jit
    def chained(x, tok):
        xf = device_normalize(x) + 0.0 * tok
        logits = vit_int.forward_q_int(ip, spec, cfg, xf)
        return logits, 1e-12 * jnp.nan_to_num(jnp.sum(logits))

    print("putting fresh buffers...", flush=True)
    rng = np.random.default_rng(0)
    t0 = time.perf_counter()
    xs = [jax.device_put(jnp.asarray(
        rng.integers(0, 255, (batch, 3, 224, 224), np.uint8)))
        for _ in range(steps)]
    for x in xs:
        x.block_until_ready()
    put_dt = (time.perf_counter() - t0) / steps
    mb = batch * 3 * 224 * 224 / 1e6
    print(f"  put: {put_dt*1e3:.0f} ms/batch ({mb/put_dt:.0f} MB/s)",
          flush=True)

    print("compiling chain...", flush=True)
    tok = jnp.float32(0.0)
    y, tok = chained(xs[0], tok)
    y.block_until_ready()
    tok = jnp.float32(0.0)
    t0 = time.perf_counter()
    outs = []
    for x in xs:
        y, tok = chained(x, tok)
        outs.append(y)
    for o in outs:
        o.block_until_ready()
    dt = (time.perf_counter() - t0) / steps
    print(f"B fresh-preput chain : {dt*1e3:7.1f} ms/step "
          f"({batch/dt:7.0f} img/s)", flush=True)

    @jax.jit
    def carry_step(x):
        logits = vit_int.forward_q_int(ip, spec, cfg, x)
        return x * (1.0 + 1e-12 * jnp.sum(logits))

    c = jnp.asarray(rng.standard_normal((batch, 3, 224, 224)), jnp.float32)
    c = carry_step(c)
    c.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(steps):
        c = carry_step(c)
    c.block_until_ready()
    dt_c = (time.perf_counter() - t0) / steps
    print(f"C carry-threaded     : {dt_c*1e3:7.1f} ms/step "
          f"({batch/dt_c:7.0f} img/s)", flush=True)
    print(f"ratio B/C = {dt/dt_c:.1f}  ->  "
          f"{'wire-bound' if dt/dt_c >= 4 else 'fast'} regime", flush=True)


if __name__ == "__main__":
    main()
