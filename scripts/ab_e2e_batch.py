"""E2E batch-amortization probe (VERDICT r3 item 5 closure).

The axon tunnel charges ~100ms of RPC latency PER DISPATCH (measured:
dispatch_only b64 = 102 ms/step, put+dispatch 114-126 ms — scripts
round-4 rpc probes), so the b64 e2e rows are dispatch-RPC-bound at
~500-630 img/s ceiling no matter how fast the loader and chip are.
Steady-state (n=2560) b64 e2e measured 224 img/s.  Fix: amortize the
fixed RPC cost over bigger batches — the chip does b256 in ~31 ms, so
at b256 the RPC cost per image drops 4x.

Measures dispatch-only ms/step at b64/b256/b512 (is the RPC cost fixed
or per-byte?) and the full jpeg->native-u8->prefetch->int4 e2e at
b64/b256 steady state (n=2560).

Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/ab_e2e_batch.py
"""
import sys, time

sys.path.insert(0, "/root/repo")

import bench  # noqa: E402


def dispatch_probe():
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
    fwd = jax.jit(lambda x: vit_int.forward_q_int(ip, spec, cfg,
                                                  device_normalize(x)))
    for batch in (64, 256, 512):
        x = jnp.zeros((batch, 3, 224, 224), jnp.uint8)
        xd = jax.device_put(x)
        fwd(xd).block_until_ready()  # warm compile
        steps = 20
        t0 = time.perf_counter()
        outs = [fwd(xd) for _ in range(steps)]
        t_disp = time.perf_counter() - t0
        for o in outs:
            o.block_until_ready()
        t_all = time.perf_counter() - t0
        print(f"b{batch}: dispatch {t_disp/steps*1e3:.1f} ms/step, "
              f"dispatch+drain {t_all/steps*1e3:.1f} ms/step "
              f"({batch*steps/t_all:.0f} img/s)", flush=True)


def e2e_probe():
    for batch in (64, 256):
        r = bench.bench_pipeline(batch=batch, n_images=2560, native=True,
                                 emit="u8", prefetch=2)
        print(f"e2e b{batch} n2560 native u8 pf2: {r:.1f} img/s", flush=True)


if __name__ == "__main__":
    dispatch_probe()
    e2e_probe()
    print("ALL DONE", flush=True)
