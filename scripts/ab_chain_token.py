"""Chain-token probe: can a REAL eval loop (fresh input every step) reach
chained-dispatch rates on the axon tunnel?

Measured (scripts/ab_e2e_batch.py): INDEPENDENT dispatches of the int4
DeiT-S executable drain at ~1.3-1.4 ms/image (612-722 img/s, batch-
independent asymptote) even with device-resident inputs, while DATA-
DEPENDENT dispatches (bench._chained_throughput) run at the chip's true
8.2k img/s.  Hypothesis: threading a dummy data dependence through the
eval steps — step(x_i, tok) -> (logits_i, f(logits_i)) with the token
folded into x_i as an exact +0.0 — makes the tunnel pipeline a real eval
loop at chip rate.  The token enters as x + 0.0*tok: float mul keeps NaN
semantics so XLA cannot fold the dependence away, yet the numeric effect
is exactly zero for finite tokens (bit-identical logits; asserted).

Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/ab_chain_token.py
"""
import sys, time

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402

import bench  # noqa: E402


def main(steps=20):
    import jax
    import jax.numpy as jnp
    from diffvit_tpu.config import QuantConfig
    from diffvit_tpu.data.imagenet import device_normalize
    from diffvit_tpu.models import vit, vit_int

    spec = vit.VIT_SPECS["deit_small"]
    cfg = QuantConfig()
    params = vit.init_params(spec, jax.random.PRNGKey(0))
    qp = bench._synth_qp(lambda p, b: vit.calibrate(p, spec, cfg, b), params)
    ip = vit_int.prepare_int(params, qp, spec, cfg,
                             (4,) * vit.num_bit_slots(spec))

    plain = jax.jit(lambda x: vit_int.forward_q_int(
        ip, spec, cfg, device_normalize(x)))

    @jax.jit
    def chained(x, tok):
        x = x.astype(jnp.float32) + 0.0 * tok   # exact zero, unfoldable dep
        logits = vit_int.forward_q_int(ip, spec, cfg, device_normalize(x))
        return logits, 1e-12 * jnp.sum(logits)

    for batch in (64, 256):
        rng = np.random.default_rng(0)
        xs = [jax.device_put(jnp.asarray(
                  rng.integers(0, 255, (batch, 3, 224, 224), np.uint8)))
              for _ in range(steps)]
        # correctness: chained logits bit-identical to plain
        y0 = np.asarray(plain(xs[0]))
        y1, _ = chained(xs[0], jnp.float32(0.123))
        np.testing.assert_array_equal(y0, np.asarray(y1))

        # independent dispatches (fresh input each step)
        plain(xs[0]).block_until_ready()
        t0 = time.perf_counter()
        outs = [plain(x) for x in xs]
        for o in outs:
            o.block_until_ready()
        dt_ind = time.perf_counter() - t0

        # token-chained dispatches (same fresh inputs)
        tok = jnp.float32(0.0)
        _, tok_w = chained(xs[0], tok)
        tok_w.block_until_ready()
        t0 = time.perf_counter()
        outs = []
        for x in xs:
            logits, tok = chained(x, tok)
            outs.append(logits)
        tok.block_until_ready()
        for o in outs:
            o.block_until_ready()
        dt_ch = time.perf_counter() - t0
        print(f"b{batch}: independent {dt_ind/steps*1e3:.1f} ms/step "
              f"({batch*steps/dt_ind:.0f} img/s) | chain-token "
              f"{dt_ch/steps*1e3:.1f} ms/step ({batch*steps/dt_ch:.0f} "
              f"img/s) | logits bit-identical OK", flush=True)


if __name__ == "__main__":
    main()
    print("ALL DONE", flush=True)
