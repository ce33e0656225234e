"""Dispatch-tax probe #2: which transfer path crosses the tunnel wire ONCE,
and can the wire overlap chip compute? (VERDICT r4 item 1, continued.)

ab_ring.py established today's tunnel model: a dispatch consuming a
HOST-originated (device_put or numpy) argument costs ~24 ms fixed RPC +
arg-bytes / ~110 MB/s — every dispatch, even reusing the same pre-put
buffer, even inside scan-k — while args that are a previous dispatch's
OUTPUT are free (carry-threaded floor 31.4 ms at b256).  The round-4
chain-token fast path (54 ms/step) no longer exists.

This probe:
  P1 put-only bandwidth (device_put + block, fresh b256 u8 batches)
  P2 numpy-direct independent dispatches (no explicit put)
  P3 pre-put independent dispatches (fresh buffer per step; r4 baseline)
  P4 launder-reuse: y = jit(id)(x) once, then chain fwd(y) k times
     (is "device-produced" a durable property of the buffer?)
  P5 launder-pipeline: id() dispatches issued async over 20 np batches,
     fwd token-chained over their outputs (does the wire overlap compute?)
  P6 io_callback infeed: one dispatch, fori_loop pulls batches from host
  P7 r4 ab_chain_token structure verbatim (token added pre-normalize)

Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/ab_ring2.py
"""
import sys, time

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402

import bench  # noqa: E402

BATCH = 256
STEPS = 20


def main():
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

    rng = np.random.default_rng(0)
    nbytes = BATCH * 3 * 224 * 224
    host = [rng.integers(0, 255, (BATCH, 3, 224, 224), np.uint8)
            for _ in range(STEPS)]

    @jax.jit
    def fwd(x):
        return vit_int.forward_q_int(ip, spec, cfg, device_normalize(x))

    @jax.jit
    def fwd_tok(x, tok):
        xf = device_normalize(x) + 0.0 * tok
        logits = vit_int.forward_q_int(ip, spec, cfg, xf)
        return logits, 1e-12 * jnp.nan_to_num(jnp.sum(logits))

    ident = jax.jit(lambda x: x + jnp.uint8(0))

    # --- P1 put bandwidth -------------------------------------------------
    d = jax.device_put(host[0]); d.block_until_ready()
    t0 = time.perf_counter()
    ds = [jax.device_put(h) for h in host]
    for x in ds:
        x.block_until_ready()
    dt = time.perf_counter() - t0
    print(f"P1 put-only: {dt/STEPS*1e3:7.1f} ms/batch "
          f"({nbytes/ (dt/STEPS) / 1e6:6.0f} MB/s)", flush=True)

    # --- P2 numpy-direct independent dispatches ---------------------------
    fwd(host[0]).block_until_ready()
    t0 = time.perf_counter()
    outs = [fwd(h) for h in host]
    for o in outs:
        o.block_until_ready()
    dt = time.perf_counter() - t0
    print(f"P2 numpy-direct independent: {dt/STEPS*1e3:7.1f} ms/step "
          f"({BATCH*STEPS/dt:6.0f} img/s)", flush=True)

    # --- P3 pre-put independent dispatches --------------------------------
    t0 = time.perf_counter()
    outs = [fwd(x) for x in ds]
    for o in outs:
        o.block_until_ready()
    dt = time.perf_counter() - t0
    print(f"P3 pre-put independent: {dt/STEPS*1e3:7.1f} ms/step "
          f"({BATCH*STEPS/dt:6.0f} img/s)", flush=True)

    # --- P4 launder once, reuse -------------------------------------------
    y = ident(ds[0]); y.block_until_ready()
    tok = jnp.float32(0.0)
    lg, tok = fwd_tok(y, tok); lg.block_until_ready()
    tok = jnp.float32(0.0)
    t0 = time.perf_counter()
    outs = []
    for _ in range(STEPS):
        lg, tok = fwd_tok(y, tok)
        outs.append(lg)
    for o in outs:
        o.block_until_ready()
    dt = time.perf_counter() - t0
    print(f"P4 launder-reuse chain: {dt/STEPS*1e3:7.1f} ms/step "
          f"({BATCH*STEPS/dt:6.0f} img/s)", flush=True)

    # --- P5 launder-pipeline (fresh np batch per step) ---------------------
    tok = jnp.float32(0.0)
    t0 = time.perf_counter()
    ys = [ident(h) for h in host]      # async: wire transfers queue up
    outs = []
    for y in ys:                       # fwd args are dispatch outputs
        lg, tok = fwd_tok(y, tok)
        outs.append(lg)
    for o in outs:
        o.block_until_ready()
    dt = time.perf_counter() - t0
    print(f"P5 launder-pipeline: {dt/STEPS*1e3:7.1f} ms/step "
          f"({BATCH*STEPS/dt:6.0f} img/s)", flush=True)

    # interleaved variant: issue launder i+1 then fwd i (classic ping-pong)
    tok = jnp.float32(0.0)
    t0 = time.perf_counter()
    outs = []
    y = ident(host[0])
    for i in range(STEPS):
        y_next = ident(host[i + 1]) if i + 1 < STEPS else None
        lg, tok = fwd_tok(y, tok)
        outs.append(lg)
        y = y_next
    for o in outs:
        o.block_until_ready()
    dt = time.perf_counter() - t0
    print(f"P5b launder-interleaved: {dt/STEPS*1e3:7.1f} ms/step "
          f"({BATCH*STEPS/dt:6.0f} img/s)", flush=True)

    # --- P6 io_callback infeed ---------------------------------------------
    try:
        from jax.experimental import io_callback

        it = {"i": 0}

        def next_batch():
            h = host[it["i"] % STEPS]
            it["i"] += 1
            return h

        shape = jax.ShapeDtypeStruct((BATCH, 3, 224, 224), jnp.uint8)

        @jax.jit
        def run_epoch(n):
            def body(_, acc):
                x = io_callback(next_batch, shape, ordered=True)
                logits = vit_int.forward_q_int(ip, spec, cfg,
                                               device_normalize(x))
                return acc + jnp.sum(logits)
            return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

        float(run_epoch(2))  # compile + warm
        it["i"] = 0
        t0 = time.perf_counter()
        float(run_epoch(STEPS))
        dt = time.perf_counter() - t0
        print(f"P6 io_callback infeed: {dt/STEPS*1e3:7.1f} ms/step "
              f"({BATCH*STEPS/dt:6.0f} img/s)", flush=True)
    except Exception as e:
        print(f"P6 io_callback infeed: FAILED {type(e).__name__}: "
              f"{str(e)[:200]}", flush=True)

    # --- P7 r4 chain-token structure verbatim -------------------------------
    @jax.jit
    def chained_r4(x, tok):
        x = x.astype(jnp.float32) + 0.0 * tok
        logits = vit_int.forward_q_int(ip, spec, cfg, device_normalize(x))
        return logits, 1e-12 * jnp.sum(logits)

    tok = jnp.float32(0.0)
    _, w = chained_r4(ds[0], tok); w.block_until_ready()
    tok = jnp.float32(0.0)
    t0 = time.perf_counter()
    outs = []
    for x in ds:
        lg, tok = chained_r4(x, tok)
        outs.append(lg)
    tok.block_until_ready()
    for o in outs:
        o.block_until_ready()
    dt = time.perf_counter() - t0
    print(f"P7 r4-structure chain: {dt/STEPS*1e3:7.1f} ms/step "
          f"({BATCH*STEPS/dt:6.0f} img/s)", flush=True)


if __name__ == "__main__":
    main()
    print("ALL DONE", flush=True)
