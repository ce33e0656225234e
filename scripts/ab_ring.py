"""Dispatch-tax anatomy + amortization probe (VERDICT r4 items 1 & 7).

Round 4 measured the chain-token eval at 54.1 ms/step (b256, inputs
device-resident) vs the ~31 ms chip floor — a ~23 ms/step tax the chain
can't hide, attributed to "once-per-step put+RPC".  But the round-4 probe
pre-put ALL its inputs before the timed loop, so the tax can't be the H2D
wire itself.  This probe separates the candidate causes:

  A. chain-token, SAME device buffer every step        (pure per-dispatch)
  B. chain-token, fresh pre-put buffer every step      (r4 baseline, 54 ms)
  C. carry-threaded x->x loop (bench._chained_throughput, ~31 ms floor)
  D. scan-k: k batches stacked in ONE device buffer, one dispatch runs
     lax.scan over them                                 (amortize the tax)
  E. chain-token, fresh buffers put DURING the loop by a feeder thread
     (does an in-flight put serialize with the dispatch stream?)
  F. chain-token w/ donated input (does donation change the tax?)

And the b1 serving variant of D (VERDICT item 7): k single images in one
dispatch via lax.scan.

Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/ab_ring.py
"""
import sys, threading, time

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402

import bench  # noqa: E402


def setup():
    import jax
    from diffvit_tpu.config import QuantConfig
    from diffvit_tpu.models import vit, vit_int

    spec = vit.VIT_SPECS["deit_small"]
    cfg = QuantConfig()
    params = vit.init_params(spec, jax.random.PRNGKey(0))
    qp = bench._synth_qp(lambda p, b: vit.calibrate(p, spec, cfg, b), params)
    ip = vit_int.prepare_int(params, qp, spec, cfg,
                             (4,) * vit.num_bit_slots(spec))
    return spec, cfg, ip


def fresh_batches(batch, steps, seed=0):
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    xs = [jax.device_put(jnp.asarray(
              rng.integers(0, 255, (batch, 3, 224, 224), np.uint8)))
          for _ in range(steps)]
    for x in xs:
        x.block_until_ready()
    return xs


def main(steps=20, batch=256):
    import jax
    import jax.numpy as jnp
    from diffvit_tpu.data.imagenet import device_normalize
    from diffvit_tpu.models import vit_int

    spec, cfg, ip = setup()

    @jax.jit
    def chained(x, tok):
        xf = device_normalize(x) + 0.0 * tok
        logits = vit_int.forward_q_int(ip, spec, cfg, xf)
        return logits, 1e-12 * jnp.nan_to_num(jnp.sum(logits))

    chained_donate = jax.jit(
        lambda x, tok: chained(x, tok), donate_argnums=(0,))

    def run_chain(fn, xs, label):
        tok = jnp.float32(0.0)
        y, tok = fn(xs[0], tok)
        y.block_until_ready()
        tok = jnp.float32(0.0)
        t0 = time.perf_counter()
        outs = []
        for x in xs:
            y, tok = fn(x, tok)
            outs.append(y)
        for o in outs:
            o.block_until_ready()
        dt = time.perf_counter() - t0
        n = len(xs)
        print(f"  {label:44s} {dt/n*1e3:7.1f} ms/step "
              f"({batch*n/dt:7.0f} img/s)", flush=True)
        return dt / n

    # --- A: same buffer every step -------------------------------------
    xs = fresh_batches(batch, steps)
    run_chain(chained, [xs[0]] * steps, "A same-buffer chain")

    # --- B: fresh pre-put buffer each step (r4 baseline) ----------------
    run_chain(chained, xs, "B fresh-buffer chain (r4 baseline)")

    # --- C: carry-threaded floor ----------------------------------------
    @jax.jit
    def carry_step(x):
        logits = vit_int.forward_q_int(ip, spec, cfg, device_normalize(x))
        return x * (1.0 + 1e-12 * jnp.sum(logits))

    xf = jnp.asarray(np.asarray(xs[0], np.float32))
    carry_step(xf).block_until_ready()
    t0 = time.perf_counter()
    c = xf
    for _ in range(steps):
        c = carry_step(c)
    c.block_until_ready()
    dt = time.perf_counter() - t0
    print(f"  {'C carry-threaded (chip floor)':44s} {dt/steps*1e3:7.1f} "
          f"ms/step ({batch*steps/dt:7.0f} img/s)", flush=True)

    # --- D: scan-k, one dispatch over k stacked batches ------------------
    for k in (2, 4, 8):
        if k > steps:
            break

        @jax.jit
        def scan_fwd(xk):
            def body(tok, x):
                xf = device_normalize(x) + 0.0 * tok
                logits = vit_int.forward_q_int(ip, spec, cfg, xf)
                return 1e-12 * jnp.nan_to_num(jnp.sum(logits)), logits
            _, ys = jax.lax.scan(body, jnp.float32(0.0), xk)
            return ys

        stacked = [jnp.stack(xs[i:i + k]) for i in range(0, steps - k + 1, k)]
        stacked = [jax.device_put(s) for s in stacked]
        for s in stacked:
            s.block_until_ready()
        scan_fwd(stacked[0]).block_until_ready()
        tok = jnp.float32(0.0)
        t0 = time.perf_counter()
        outs = [scan_fwd(s) for s in stacked]
        for o in outs:
            o.block_until_ready()
        dt = time.perf_counter() - t0
        n = len(stacked) * k
        print(f"  {'D scan-k k=%d (one dispatch per k)' % k:44s} "
              f"{dt/n*1e3:7.1f} ms/step ({batch*n/dt:7.0f} img/s)",
              flush=True)

    # --- E: puts in flight during the chain ------------------------------
    rng = np.random.default_rng(1)
    host_batches = [rng.integers(0, 255, (batch, 3, 224, 224), np.uint8)
                    for _ in range(steps)]
    dev_q = []

    def feeder():
        for hb in host_batches:
            dev_q.append(jax.device_put(hb))

    tok = jnp.float32(0.0)
    y, tok = chained(xs[0], tok)
    y.block_until_ready()
    tok = jnp.float32(0.0)
    t = threading.Thread(target=feeder)
    t0 = time.perf_counter()
    t.start()
    outs = []
    i = 0
    while i < steps:
        if i < len(dev_q):
            y, tok = chained(dev_q[i], tok)
            outs.append(y)
            i += 1
        else:
            time.sleep(0.001)
    t.join()
    for o in outs:
        o.block_until_ready()
    dt = time.perf_counter() - t0
    print(f"  {'E feeder-put overlapped chain':44s} {dt/steps*1e3:7.1f} "
          f"ms/step ({batch*steps/dt:7.0f} img/s)", flush=True)

    # --- F: donated input chain ------------------------------------------
    xs2 = fresh_batches(batch, steps, seed=2)
    run_chain(chained_donate, xs2, "F donated-input chain")


def serve_scan(ks=(1, 2, 4, 8, 16, 32)):
    """b1 serving: amortize the per-dispatch round-trip over k images in one
    dispatch (VERDICT item 7)."""
    import jax
    import jax.numpy as jnp
    from diffvit_tpu.data.imagenet import device_normalize
    from diffvit_tpu.models import vit_int

    spec, cfg, ip = setup()
    rng = np.random.default_rng(0)

    for k in ks:
        xk = jax.device_put(jnp.asarray(
            rng.integers(0, 255, (k, 1, 3, 224, 224), np.uint8)))
        xk.block_until_ready()

        @jax.jit
        def scan_fwd(xk):
            def body(tok, x):
                xf = device_normalize(x) + 0.0 * tok
                logits = vit_int.forward_q_int(ip, spec, cfg, xf)
                return 1e-12 * jnp.nan_to_num(jnp.sum(logits)), logits
            _, ys = jax.lax.scan(body, jnp.float32(0.0), xk)
            return ys

        scan_fwd(xk).block_until_ready()
        steps = max(1, 64 // k)
        t0 = time.perf_counter()
        outs = [scan_fwd(xk) for _ in range(steps)]
        for o in outs:
            o.block_until_ready()
        dt = time.perf_counter() - t0
        n = steps * k
        print(f"  b1 serve scan k={k:3d}: {dt/n*1e3:7.3f} ms/img "
              f"({n/dt:7.0f} img/s)", flush=True)


if __name__ == "__main__":
    print("=== b256 eval dispatch anatomy ===", flush=True)
    main()
    print("=== b64 ===", flush=True)
    main(batch=64)
    print("=== b1 serving scan-k ===", flush=True)
    serve_scan()
    print("ALL DONE", flush=True)
