"""Depth-bisect the wire tax: does the fresh-preput penalty scale with
the MODEL's program size?

Round-5 state: every synthetic executable — 77 MB whole-buffer XLA
reductions, 48-dot chains, 32 MB closures, retained outputs, Mosaic
consuming the host arg — rides FREE on fresh host-put buffers, while
the full 12-block int model pays ~24 ms + arg_bytes/~110 MB/s per step
(E1 carry-only variant included, so escaping outputs are ruled out;
XLA-only model pays too, so Mosaic is ruled out).  The one untested
axis is program size.  Same model, depth ∈ {1, 3, 12}; per depth:

  F  fresh-preput token chain   (taxed?  b256 full model: ~354 ms)
  C  carry-threaded loop        (compute floor)

If (F - C) grows with depth -> the tax is per-op / program-size bound.
If (F - C) is ~constant ~320 ms even at depth 1 -> input-path bound.

Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/ab_depth_bisect.py
"""
import dataclasses
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

    cfg = QuantConfig()
    rng = np.random.default_rng(0)
    shape = (batch, 3, 224, 224)

    xs = [jax.device_put(rng.integers(0, 255, shape).astype(np.uint8))
          for _ in range(steps)]
    for x in xs:
        x.block_until_ready()

    for depth in (1, 3, 12):
        spec = dataclasses.replace(vit.VIT_SPECS["deit_small"], depth=depth)

        def build():
            params = vit.init_params(spec, jax.random.PRNGKey(0))
            qp = bench._synth_qp(
                lambda p, b: vit.calibrate(p, spec, cfg, b), params)
            return vit_int.prepare_int(params, qp, spec, cfg,
                                       (4,) * vit.num_bit_slots(spec))

        print(f"depth={depth}: setup (cpu-side)...", flush=True)
        ip = bench._setup_on_cpu(build)

        @jax.jit
        def step(x, tok, ip=ip, spec=spec):
            xf = device_normalize(x) + 0.0 * tok
            logits = vit_int.forward_q_int(ip, spec, cfg, xf)
            return 1e-12 * jnp.nan_to_num(jnp.sum(logits))

        tok = step(xs[0], jnp.float32(0.0))
        tok.block_until_ready()
        tok = jnp.float32(0.0)
        t0 = time.perf_counter()
        for i in range(steps):
            tok = step(xs[i], tok)
        tok.block_until_ready()
        f_ms = (time.perf_counter() - t0) / steps * 1e3

        @jax.jit
        def carry_step(x, ip=ip, spec=spec):
            logits = vit_int.forward_q_int(ip, spec, cfg, x)
            return x * (1.0 + 1e-12 * jnp.sum(logits))

        c = jnp.asarray(rng.standard_normal(shape), jnp.float32)
        c = carry_step(c)
        c.block_until_ready()
        t0 = time.perf_counter()
        for _ in range(steps):
            c = carry_step(c)
        c.block_until_ready()
        c_ms = (time.perf_counter() - t0) / steps * 1e3

        print(f"  depth={depth:2d}  fresh-preput {f_ms:7.1f} ms/step   "
              f"carry {c_ms:6.1f} ms/step   tax {f_ms - c_ms:7.1f} ms",
              flush=True)


if __name__ == "__main__":
    main()
