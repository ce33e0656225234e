"""Which property makes a dispatch arg pay the wire tax?  (round-5 end)

Five token-chained legs over a trivial reduction, 9.6 MB payloads:
  1 same jnp.zeros buffer           (device-originated, reused)
  2 same device_put(np.zeros)      (host-originated, reused, compressible)
  3 same device_put(np.random)     (host-originated, reused, incompressible)
  4 fresh device_put(np.random)    (host-originated, fresh each step)
  5 fresh device_put(np.zeros)     (host-originated, fresh, compressible)

Distinguishes: provenance (1 vs 2/3), per-buffer caching (3 vs 4),
transport compression (4 vs 5).
Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/ab_regime_variants.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402


def main(steps=8):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def step(x, tok):
        return tok * 0.5 + jnp.sum(x, dtype=jnp.int32).astype(jnp.float32)

    shape = (64, 3, 224, 224)
    rng = np.random.default_rng(0)

    def time_leg(label, xs):
        for x in xs:
            x.block_until_ready()
        tok = step(xs[0], jnp.float32(0.0))
        tok.block_until_ready()
        t0 = time.perf_counter()
        for i in range(steps):
            tok = step(xs[i % len(xs)], tok)
        tok.block_until_ready()
        ms = (time.perf_counter() - t0) / steps * 1e3
        print(f"  {label:44s} {ms:8.1f} ms/step", flush=True)

    time_leg("1 same jnp.zeros (device-originated)",
             [jnp.zeros(shape, jnp.uint8)])
    time_leg("2 same put(np.zeros)",
             [jax.device_put(np.zeros(shape, np.uint8))])
    time_leg("3 same put(np.random)",
             [jax.device_put(rng.integers(0, 255, shape).astype(np.uint8))])
    time_leg("4 fresh put(np.random)",
             [jax.device_put(rng.integers(0, 255, shape).astype(np.uint8))
              for _ in range(steps)])
    time_leg("5 fresh put(np.zeros)",
             [jax.device_put(np.zeros(shape, np.uint8))
              for _ in range(steps)])


if __name__ == "__main__":
    main()
