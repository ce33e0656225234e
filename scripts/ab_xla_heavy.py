"""Is the wire tax triggered by Mosaic custom calls or by executable
weight?  Heavy PURE-XLA executables, token-chained, fresh host-put bufs.

  H1  synthetic bf16 matmul chain (~10 ms compute, no Mosaic)
  H2  full int model with use_pallas=False (XLA-only, no Mosaic)
  H2c carry-threaded H2 (its chip floor, for reference)

If H1/H2 ride free while the Pallas model pays ~354 ms/step on the same
bufs, the tax binds to MOSAIC CUSTOM CALLS and the XLA fallback path is
an e2e lever in the wire-bound regime.

Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/ab_xla_heavy.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402

import bench  # noqa: E402


def main(steps=8, batch=256):
    import jax
    import jax.numpy as jnp

    from diffvit_tpu.config import QuantConfig
    from diffvit_tpu.data.imagenet import device_normalize
    from diffvit_tpu.models import vit, vit_int

    rng = np.random.default_rng(0)
    shape = (batch, 3, 224, 224)
    mb = batch * 3 * 224 * 224 / 1e6

    def fresh_bufs():
        xs = [jax.device_put(rng.integers(0, 255, shape).astype(np.uint8))
              for _ in range(steps)]
        for x in xs:
            x.block_until_ready()
        return xs

    def run_chain(label, fn, xs):
        tok = jnp.float32(0.0)
        out, tok = fn(xs[0], tok)
        out.block_until_ready()
        tok = jnp.float32(0.0)
        outs = []
        t0 = time.perf_counter()
        for i in range(steps):
            out, tok = fn(xs[i % len(xs)], tok)
            outs.append(out)
        for o in outs:
            o.block_until_ready()
        dt = (time.perf_counter() - t0) / steps
        print(f"{label:40s} {dt*1e3:8.1f} ms/step ({batch/dt:7.0f} img/s)",
              flush=True)

    # H1: heavy synthetic XLA-only chain
    w = jnp.asarray(rng.standard_normal((1024, 1024)) * 0.01, jnp.bfloat16)

    @jax.jit
    def h1(x, tok):
        a = x.reshape(batch, -1)[:, :1024].astype(jnp.bfloat16) + tok
        for _ in range(48):
            a = jnp.dot(a, w)
        s = jnp.sum(a.astype(jnp.float32))
        return s, 1e-12 * jnp.nan_to_num(s)

    run_chain("H1 heavy XLA matmul chain", h1, fresh_bufs())

    # H2: full model, XLA path only
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
    def h2(x, tok):
        xf = device_normalize(x) + 0.0 * tok
        logits = vit_int.forward_q_int(ip, spec, cfg, xf, use_pallas=False)
        return logits, 1e-12 * jnp.nan_to_num(jnp.sum(logits))

    print("compiling XLA-only model (may be minutes)...", flush=True)
    run_chain("H2 int model use_pallas=False", h2, fresh_bufs())

    @jax.jit
    def h2c(x):
        logits = vit_int.forward_q_int(ip, spec, cfg, x, use_pallas=False)
        return x * (1.0 + 1e-12 * jnp.sum(logits))

    c = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    c = h2c(c)
    c.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(steps):
        c = h2c(c)
    c.block_until_ready()
    dt = (time.perf_counter() - t0) / steps
    print(f"{'H2c carry-threaded (chip floor)':40s} {dt*1e3:8.1f} ms/step "
          f"({batch/dt:7.0f} img/s)  payload {mb:.1f} MB", flush=True)


if __name__ == "__main__":
    main()
