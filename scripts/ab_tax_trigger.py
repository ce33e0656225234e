"""What promotes an executable into the BYTE-RE-SHIP tax tier?

Measured so far (round-5, all token-chained, fresh/pre-put host bufs,
38.5 MB u8 payload):
  trivial XLA reduction                 0.03 ms/step   (free)
  48-dot XLA chain, 1 closed-over w     27.5 ms/step   (fixed RPC only)
  full int model (Pallas OR XLA-only)  ~354 ms/step    (RPC + 38.5 MB / 110 MB/s)

Also discovered: CLOSED-OVER arrays are serialized into the
remote_compile request (128 x 2 MB weights -> HTTP 413 "length limit
exceeded"), i.e. they are executable-embedded constants, not runtime
args.  The int model closes over ~22 MB of int8 codes — so the model's
distinguishing features vs the 48-dot chain are (a) embedded-constant
bytes, (b) compute time, (c) explicit arg count, (d) output size.
Isolate each:

  V1  48 dots, 1 closed-over weight (2 MB), scalar out     [control]
  V2  48 dots, 48 weights passed as EXPLICIT args           (arg count)
  V3  fori_loop dots ~28 ms compute, 1 weight               (compute)
  V5  48 dots, (B,1000) f32 retained output                 (output)
  V6  48 dots over 16 closed-over weights (32 MB consts)    (const bytes)

Each timed fresh-pre-put and device-originated (jnp.zeros) payload.

Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/ab_tax_trigger.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402


def main(steps=8, batch=256):
    import jax
    import jax.numpy as jnp
    from jax import lax

    rng = np.random.default_rng(0)
    shape = (batch, 3, 224, 224)

    def fresh_bufs():
        xs = [jax.device_put(rng.integers(0, 255, shape).astype(np.uint8))
              for _ in range(steps)]
        for x in xs:
            x.block_until_ready()
        return xs

    def chain(label, fn, xs):
        tok = jnp.float32(0.0)
        out, tok = fn(xs[0], tok)
        jax.tree_util.tree_leaves(out)[0].block_until_ready()
        tok = jnp.float32(0.0)
        outs = []
        t0 = time.perf_counter()
        for i in range(steps):
            out, tok = fn(xs[i % len(xs)], tok)
            outs.append(out)
        for o in outs:
            jax.tree_util.tree_leaves(o)[0].block_until_ready()
        tok.block_until_ready()
        dt = (time.perf_counter() - t0) / steps * 1e3
        print(f"  {label:52s} {dt:8.1f} ms/step", flush=True)

    w = jnp.asarray(rng.standard_normal((1024, 1024)) * 0.01, jnp.bfloat16)
    ws48 = tuple(jnp.asarray(rng.standard_normal((1024, 1024)) * 0.01,
                             jnp.bfloat16) for _ in range(48))
    ws16 = tuple(jnp.asarray(rng.standard_normal((1024, 1024)) * 0.01,
                             jnp.bfloat16) for _ in range(16))

    @jax.jit
    def v1(x, tok):
        a = x.reshape(batch, -1)[:, :1024].astype(jnp.bfloat16) + tok
        for _ in range(48):
            a = jnp.dot(a, w)
        s = jnp.sum(a.astype(jnp.float32))
        return s, 1e-12 * jnp.nan_to_num(s)

    @jax.jit
    def v2_inner(x, tok, weights):
        a = x.reshape(batch, -1)[:, :1024].astype(jnp.bfloat16) + tok
        for wi in weights:
            a = jnp.dot(a, wi)
        s = jnp.sum(a.astype(jnp.float32))
        return s, 1e-12 * jnp.nan_to_num(s)

    def v2(x, tok):
        return v2_inner(x, tok, ws48)

    w2 = jnp.asarray(rng.standard_normal((2048, 2048)) * 0.01, jnp.bfloat16)

    @jax.jit
    def v3(x, tok):
        a = jnp.tile(x.reshape(batch, -1)[:, :1024].astype(jnp.bfloat16),
                     (1, 2)) + tok
        a = lax.fori_loop(0, 1500, lambda i, a: jnp.dot(a, w2), a)
        s = jnp.sum(a.astype(jnp.float32))
        return s, 1e-12 * jnp.nan_to_num(s)

    wout = jnp.asarray(rng.standard_normal((1024, 1000)) * 0.01,
                       jnp.bfloat16)

    @jax.jit
    def v5(x, tok):
        a = x.reshape(batch, -1)[:, :1024].astype(jnp.bfloat16) + tok
        for _ in range(48):
            a = jnp.dot(a, w)
        out = jnp.dot(a, wout).astype(jnp.float32)
        s = jnp.sum(out)
        return out, 1e-12 * jnp.nan_to_num(s)

    @jax.jit
    def v6(x, tok):
        a = x.reshape(batch, -1)[:, :1024].astype(jnp.bfloat16) + tok
        for _ in range(3):
            for wi in ws16:
                a = jnp.dot(a, wi)
        s = jnp.sum(a.astype(jnp.float32))
        return s, 1e-12 * jnp.nan_to_num(s)

    legs = [("V1 48 dots, 1 closure w (2MB)", v1),
            ("V2 48 dots, 48 EXPLICIT weight args", v2),
            ("V3 fori ~28ms compute, 1 closure w", v3),
            ("V5 48 dots, (B,1000) retained out", v5),
            ("V6 48 dots, 16 closure ws (32MB consts)", v6)]
    fresh = fresh_bufs()
    for label, fn in legs:
        chain(label + "  [fresh pre-put]", fn, fresh)

    xd = jnp.zeros(shape, jnp.uint8)    # device-originated payload
    for label, fn in legs:
        chain(label + "  [device-originated]", fn, [xd])


if __name__ == "__main__":
    main()
