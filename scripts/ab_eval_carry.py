"""Retained-output theory: does the wire tax bind to dispatches that
RETAIN a per-step output (beyond the chained carry)?

Every taxed leg so far returns (logits, tok) and keeps logits on the
host side; every free leg returns only its chained value.  Test with
the e2e-relevant shape — an eval step that folds accuracy into the
carry and returns NOTHING else:

  E1  carry' = carry + correct(logits, labels); fresh pre-put x,labels
      (single chained output — hypothesis: ~33 ms/step chip floor)
  E2  control: same executable shape but ALSO returns logits
      (retained output — known ~354 ms/step if theory holds)

If E1 rides free, engine.validate can accumulate Prec@1/@5 on device
and run host-fed eval at chip rate in THIS regime.

Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/ab_eval_carry.py
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

    @jax.jit
    def eval_carry(carry, x, labels):
        xf = device_normalize(x) + 0.0 * carry[1]
        logits = vit_int.forward_q_int(ip, spec, cfg, xf)
        correct = jnp.sum(
            (jnp.argmax(logits, -1) == labels).astype(jnp.float32))
        return (carry[0] + correct,
                1e-12 * jnp.nan_to_num(jnp.sum(logits)))

    @jax.jit
    def eval_retained(carry, x, labels):
        xf = device_normalize(x) + 0.0 * carry[1]
        logits = vit_int.forward_q_int(ip, spec, cfg, xf)
        correct = jnp.sum(
            (jnp.argmax(logits, -1) == labels).astype(jnp.float32))
        return (carry[0] + correct,
                1e-12 * jnp.nan_to_num(jnp.sum(logits))), logits

    rng = np.random.default_rng(0)
    xs = [jax.device_put(jnp.asarray(
        rng.integers(0, 255, (batch, 3, 224, 224), np.uint8)))
        for _ in range(steps)]
    ls = [jax.device_put(jnp.asarray(
        rng.integers(0, 1000, (batch,), np.int32))) for _ in range(steps)]
    for x in xs:
        x.block_until_ready()
    for l in ls:
        l.block_until_ready()

    carry = (jnp.float32(0.0), jnp.float32(0.0))
    carry = eval_carry(carry, xs[0], ls[0])
    carry[0].block_until_ready()
    carry = (jnp.float32(0.0), jnp.float32(0.0))
    t0 = time.perf_counter()
    for i in range(steps):
        carry = eval_carry(carry, xs[i], ls[i])
    carry[0].block_until_ready()
    dt = (time.perf_counter() - t0) / steps
    print(f"E1 carry-only eval step : {dt*1e3:7.1f} ms/step "
          f"({batch/dt:7.0f} img/s)  correct={float(carry[0]):.0f}",
          flush=True)

    carry = (jnp.float32(0.0), jnp.float32(0.0))
    carry, lg = eval_retained(carry, xs[0], ls[0])
    lg.block_until_ready()
    carry = (jnp.float32(0.0), jnp.float32(0.0))
    outs = []
    t0 = time.perf_counter()
    for i in range(steps):
        carry, lg = eval_retained(carry, xs[i], ls[i])
        outs.append(lg)
    carry[0].block_until_ready()
    for o in outs:
        o.block_until_ready()
    dt = (time.perf_counter() - t0) / steps
    print(f"E2 +retained logits     : {dt*1e3:7.1f} ms/step "
          f"({batch/dt:7.0f} img/s)", flush=True)


if __name__ == "__main__":
    main()
