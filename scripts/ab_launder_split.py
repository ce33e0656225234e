"""Laundering probe: split normalize into its own PURE-XLA dispatch.

Round-5 finding in progress: pure-XLA executables consume FRESH
host-put args at ~0.04 ms/step (free), while the full int model (Mosaic
custom calls) pays ~355 ms/step on the same args.  If the tax binds to
(executable kind, arg provenance), then routing every host batch
through a separate XLA-only dispatch should launder it:

  A  model(host_buf)                      chained   (known ~355 ms/step)
  B  y = norm_xla(host_buf); model(y)     chained   (hypothesis: ~32 ms)
  C  carry-threaded model loop            chip floor (~32 ms)

norm_xla is jax.jit(device_normalize) — contains NO Mosaic calls; its
output is a dispatch-output-provenance f32 buffer.

Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/ab_launder_split.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402

import bench  # noqa: E402


def main(steps=10, batch=256):
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

    norm_xla = jax.jit(device_normalize)

    @jax.jit
    def model_step(xf, tok):
        logits = vit_int.forward_q_int(ip, spec, cfg, xf + 0.0 * tok)
        return logits, 1e-12 * jnp.nan_to_num(jnp.sum(logits))

    rng = np.random.default_rng(0)
    xs = [jax.device_put(jnp.asarray(
        rng.integers(0, 255, (batch, 3, 224, 224), np.uint8)))
        for _ in range(steps)]
    for x in xs:
        x.block_until_ready()
    mb = batch * 3 * 224 * 224 / 1e6

    # compile both executables once
    tok = jnp.float32(0.0)
    y0 = norm_xla(xs[0])
    l, tok = model_step(y0, tok)
    l.block_until_ready()

    # A: model consumes host buf directly (normalize fused into model jit)
    @jax.jit
    def direct_step(x, tok):
        xf = device_normalize(x) + 0.0 * tok
        logits = vit_int.forward_q_int(ip, spec, cfg, xf)
        return logits, 1e-12 * jnp.nan_to_num(jnp.sum(logits))

    l, _ = direct_step(xs[0], jnp.float32(0.0))
    l.block_until_ready()
    tok = jnp.float32(0.0)
    outs = []
    t0 = time.perf_counter()
    for x in xs:
        l, tok = direct_step(x, tok)
        outs.append(l)
    for o in outs:
        o.block_until_ready()
    dt = (time.perf_counter() - t0) / steps
    print(f"A direct (Mosaic exe eats host buf): {dt*1e3:7.1f} ms/step "
          f"({batch/dt:6.0f} img/s)", flush=True)

    # B: launder through the XLA-only normalize dispatch
    tok = jnp.float32(0.0)
    outs = []
    t0 = time.perf_counter()
    for x in xs:
        y = norm_xla(x)
        l, tok = model_step(y, tok)
        outs.append(l)
    for o in outs:
        o.block_until_ready()
    dt = (time.perf_counter() - t0) / steps
    print(f"B laundered (XLA norm -> model)    : {dt*1e3:7.1f} ms/step "
          f"({batch/dt:6.0f} img/s)", flush=True)

    # C: carry-threaded chip floor
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
    dt = (time.perf_counter() - t0) / steps
    print(f"C carry-threaded chip floor        : {dt*1e3:7.1f} ms/step "
          f"({batch/dt:6.0f} img/s)", flush=True)
    print(f"(payload {mb:.1f} MB/batch)", flush=True)


if __name__ == "__main__":
    main()
