"""Does the wire tax depend on ARG SIZE?  Trivial XLA reduction,
token-chained, fresh host-put numpy bufs, payload swept b32..b512.

(Round-5: at 9.6 MB the reduction rides free while the full model at
38.5 MB pays ~354 ms/step; laundering through an XLA dispatch doesn't
help — so either size or executable weight is the discriminator.)

Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/ab_size_sweep.py
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

    rng = np.random.default_rng(0)
    for b in (32, 64, 128, 256, 512):
        shape = (b, 3, 224, 224)
        mb = b * 3 * 224 * 224 / 1e6
        xs = [jax.device_put(rng.integers(0, 255, shape).astype(np.uint8))
              for _ in range(steps)]
        for x in xs:
            x.block_until_ready()
        tok = step(xs[0], jnp.float32(0.0))
        tok.block_until_ready()
        tok = jnp.float32(0.0)
        t0 = time.perf_counter()
        for i in range(steps):
            tok = step(xs[i], tok)
        tok.block_until_ready()
        ms = (time.perf_counter() - t0) / steps * 1e3
        print(f"  b{b:<4d} {mb:6.1f} MB  {ms:8.2f} ms/step "
              f"({mb/ms*1e3:7.0f} MB/s equiv)", flush=True)


if __name__ == "__main__":
    main()
