"""WHICH executables pay the wire tax on host-originated args?  (round-5)

Context: bench.probe_tunnel_regime (trivial XLA reduction, pre-put numpy
buffer) read 0.04 ms/step ("fast") minutes before ab_regime_now (full
int model, fresh pre-put buffers) read 355 ms/step ("wire-bound").
Either the regime is per-EXECUTABLE (Mosaic custom calls trigger the
proxy slow path?) or per-buffer-freshness, or it drifts in time.  All
legs run interleaved in ONE process, and leg 1 repeats at the end to
detect drift.  Payloads are 9.6 MB u8 (b64-sized), token-chained.

Legs:
  1  XLA reduction, SAME pre-put buffer
  2  XLA reduction, FRESH pre-put buffers
  3  XLA reduction + tiny Mosaic kernel on a CLOSED-OVER device array
     (executable contains a Mosaic custom call; host arg feeds XLA only)
  4  Mosaic kernel CONSUMES the host arg (XLA cast u8->f32 in between)
  1' leg 1 again (drift check)

Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/ab_regime_discriminate.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402


def main(steps=8):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    shape = (64, 3, 224, 224)          # 9.6 MB u8
    rng = np.random.default_rng(0)

    def host_buf():
        return jax.device_put(rng.integers(0, 255, shape).astype(np.uint8))

    # --- executables ------------------------------------------------
    @jax.jit
    def xla_step(x, tok):
        return tok * 0.5 + jnp.sum(x, dtype=jnp.int32).astype(jnp.float32)

    def _sum_kernel(x_ref, o_ref):
        @pl.when(pl.program_id(0) == 0)
        def _init():
            o_ref[...] = jnp.zeros_like(o_ref)
        o_ref[...] += jnp.sum(x_ref[...]) * jnp.ones_like(o_ref)

    def pallas_sum(xf):  # xf: f32 (9408, 1024)
        return pl.pallas_call(
            _sum_kernel,
            grid=(8,),
            in_specs=[pl.BlockSpec((1176, 1024), lambda i: (i, 0))],
            out_specs=pl.BlockSpec((8, 128), lambda i: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        )(xf)

    const = jnp.ones((1176, 1024), jnp.float32) * 0.5  # closed-over, device

    @jax.jit
    def xla_plus_mosaic_step(x, tok):
        # host arg feeds only XLA; Mosaic kernel runs on a device constant
        s = jnp.sum(x, dtype=jnp.int32).astype(jnp.float32)
        m = pl.pallas_call(
            _sum_kernel,
            grid=(1,),
            in_specs=[pl.BlockSpec((1176, 1024), lambda i: (0, 0))],
            out_specs=pl.BlockSpec((8, 128), lambda i: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        )(const)[0, 0]
        return tok * 0.5 + s + 0.0 * m

    @jax.jit
    def mosaic_consumes_step(x, tok):
        xf = x.reshape(9408, 1024).astype(jnp.float32)
        return tok * 0.5 + pallas_sum(xf)[0, 0] * 1e-9

    # --- timing harness ---------------------------------------------
    def time_leg(label, fn, xs):
        for x in xs:
            x.block_until_ready()
        tok = fn(xs[0], jnp.float32(0.0))
        tok = jnp.ravel(tok)[0] if tok.ndim else tok
        tok.block_until_ready()
        tok = jnp.float32(0.0)
        t0 = time.perf_counter()
        for i in range(steps):
            tok = fn(xs[i % len(xs)], tok)
            tok = jnp.ravel(tok)[0] if tok.ndim else tok
        tok.block_until_ready()
        ms = (time.perf_counter() - t0) / steps * 1e3
        print(f"  {label:58s} {ms:8.2f} ms/step", flush=True)
        return ms

    same = [host_buf()]
    fresh = [host_buf() for _ in range(steps)]

    time_leg("1  XLA reduction, same pre-put buf", xla_step, same)
    time_leg("2  XLA reduction, fresh pre-put bufs", xla_step, fresh)
    time_leg("3  XLA+Mosaic(closed-over), same pre-put buf",
             xla_plus_mosaic_step, same)
    time_leg("3f XLA+Mosaic(closed-over), fresh pre-put bufs",
             xla_plus_mosaic_step, fresh)
    time_leg("4  Mosaic consumes host arg, same pre-put buf",
             mosaic_consumes_step, same)
    time_leg("4f Mosaic consumes host arg, fresh pre-put bufs",
             mosaic_consumes_step, fresh)
    time_leg("1' XLA reduction, same pre-put buf (drift check)",
             xla_step, same)


if __name__ == "__main__":
    main()
