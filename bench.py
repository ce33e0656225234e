#!/usr/bin/env python
"""Benchmark: quantized ViT-family throughput on one TPU chip.

Default (driver) mode prints ONE JSON line
    {"metric", "value", "unit", "vs_baseline"[, "extra"]}
for the headline config (PoT-quantized DeiT-S, int4 weights, integer path,
batch 256).  Baseline: the BASELINE.json north-star target of 5000
images/sec/chip (the reference publishes no throughput numbers — its GPU
eval wall-clock is ~150-190 s for a 5k-image sweep entry ≈ 30 img/s,
BASELINE.md).

``--matrix`` additionally measures the BASELINE.json config set — DeiT-T
fp32, DeiT-S int8/int4 (int and fake paths), ViT-B int8, Swin-T int8,
mixed-precision DeiT-S, and a host-pipeline-inclusive number
(decode→preprocess→H2D→forward on a fake JPEG ImageFolder) — and writes
BENCH_MATRIX.json.  The default mode attaches the last saved matrix as
"extra" so the driver's single line carries every row.
"""
from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np

TARGET_IMG_PER_SEC = 5000.0
REPO = os.path.dirname(os.path.abspath(__file__))
MATRIX_PATH = os.path.join(REPO, "BENCH_MATRIX.json")


def _synth_qp(calibrate_fn, params):
    """Structurally-real qparams via eval_shape — scale *values* don't
    affect throughput, and this skips tracing the calibration itself."""
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    calib = jnp.asarray(rng.standard_normal((2, 3, 224, 224)), jnp.float32)
    qp_shapes, _ = jax.eval_shape(calibrate_fn, params, calib)
    return {k: (jnp.zeros(v.shape, v.dtype) if k.endswith(".zp")
                else jnp.full(v.shape, 2.0**-6, v.dtype))
            for k, v in qp_shapes.items()}


def _setup_on_cpu(build):
    """Run model init / qp synthesis / int-weight baking on the CPU
    backend and ship the finished pytrees to the accelerator in ONE
    transfer.  These setup paths are hundreds of tiny ops; in the
    wire-bound tunnel regime each would pay the ~24 ms per-dispatch RPC
    (docs/PERF_ANALYSIS.md "Tunnel regimes" — an init that is
    milliseconds on-device takes minutes through the tunnel)."""
    import jax

    with jax.default_device(jax.devices("cpu")[0]):
        out = build()
    dev = jax.devices()[0]
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, dev) if isinstance(x, jax.Array) else x,
        out)


def _chained_throughput(run, batch, steps=20, warmup=2, device_chain=False):
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((batch, 3, 224, 224)), jnp.float32)

    # Chained, data-dependent steps: on virtualized TPU backends,
    # independent dispatches of the same executable can overlap across
    # backing hardware, making fire-and-forget timing meaningless.
    # ``device_chain`` moves the chain into a lax.fori_loop (ONE dispatch
    # for all steps): sub-millisecond host-dispatched steps are
    # enqueue/tunnel-bound on this rig (b1 read 0.80-1.34 ms across runs
    # for an 0.47 ms chip step), so small-batch serving rows use it.
    # (The round-1 "pallas inside fori_loop trips an axon INTERNAL error"
    # no longer reproduces — re-verified round 3.)
    if device_chain:
        from diffvit_tpu.utils.profiling import chained_time

        return batch / chained_time(run, x, n_steps=steps)

    @jax.jit
    def step_chained(x):
        logits = run(x)
        return x * (1.0 + 1e-12 * jnp.sum(logits))

    for _ in range(warmup):
        x = step_chained(x)
    x.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(steps):
        x = step_chained(x)
    x.block_until_ready()
    dt = time.perf_counter() - t0
    return batch * steps / dt


def bench_vit(model, bits, path, batch, steps=20, bit_config=None,
              device_chain=False):
    import jax

    from diffvit_tpu.config import QuantConfig
    from diffvit_tpu.models import vit

    spec = vit.VIT_SPECS[model]
    cfg = QuantConfig()

    if path == "fp32":
        params = _setup_on_cpu(
            lambda: vit.init_params(spec, jax.random.PRNGKey(0)))
        run = lambda x: vit.forward_fp(params, spec, x)
        return _chained_throughput(run, batch, steps)

    if bit_config is None:
        bit_config = (bits,) * vit.num_bit_slots(spec)

    if path in ("int", "serve"):
        from diffvit_tpu.models import vit_int

        def build():
            params = vit.init_params(spec, jax.random.PRNGKey(0))
            qp = _synth_qp(lambda p, b: vit.calibrate(p, spec, cfg, b),
                           params)
            ip = vit_int.prepare_int(params, qp, spec, cfg, bit_config)
            if path == "serve":
                from diffvit_tpu.ops.pallas.serve import prepare_resident

                return ip, prepare_resident(ip, spec, cfg)
            return ip, None

        ip, packed = _setup_on_cpu(build)
        if path == "serve":
            run = lambda x: vit_int.forward_q_int_serve(
                ip, spec, cfg, x, packed=packed)
        else:
            run = lambda x: vit_int.forward_q_int(ip, spec, cfg, x)
    else:
        def build():
            params = vit.init_params(spec, jax.random.PRNGKey(0))
            qp = _synth_qp(lambda p, b: vit.calibrate(p, spec, cfg, b),
                           params)
            return params, qp

        params, qp = _setup_on_cpu(build)
        run = lambda x: vit.forward_q(params, qp, spec, cfg, x, bit_config)
    return _chained_throughput(run, batch, steps,
                               device_chain=device_chain)


def bench_serve_scan(model="deit_small", bits=4, k=32, steps=10,
                     wire="u8"):
    """Scan-k b1 serving: k single-image graphs in ONE dispatch
    (engine._microbatched), token-chained over a pre-put request
    buffer — measures the amortized per-image serving cost a real b1
    request stream sees on this backend (per-dispatch overhead + any
    ingest included).  ``wire``: "u8" (device LUT normalize per request)
    or "codes" (pre-encoded int8 input codes, zero device ingest)."""
    import jax
    import jax.numpy as jnp

    from diffvit_tpu.config import QuantConfig
    from diffvit_tpu.data.imagenet import (device_normalize, encode_input,
                                           input_code_lut)
    from diffvit_tpu.engine import _microbatched
    from diffvit_tpu.models import vit, vit_int
    from diffvit_tpu.utils.dispatch import ChainedDispatch

    spec = vit.VIT_SPECS[model]
    cfg = QuantConfig()

    def build():
        params = vit.init_params(spec, jax.random.PRNGKey(0))
        qp = _synth_qp(lambda p, b: vit.calibrate(p, spec, cfg, b), params)
        return vit_int.prepare_int(params, qp, spec, cfg,
                                   (bits,) * vit.num_bit_slots(spec))

    ip = _setup_on_cpu(build)
    fwd = _microbatched(
        lambda xf: vit_int.forward_q_int(ip, spec, cfg, xf), 1)
    cd = ChainedDispatch(device_normalize, fwd)
    rng = np.random.default_rng(0)
    reqs = rng.integers(0, 255, (k, 3, 224, 224)).astype(np.uint8)
    if wire == "codes":
        bt = cfg.bit_a
        lut = input_code_lut(np.asarray(ip["qact_input"]["scale"]),
                             np.asarray(ip["qact_input"]["zp"]),
                             qmin=bt.lower_bound, qmax=bt.upper_bound)
        reqs = encode_input(reqs, lut)
    x = jax.device_put(jnp.asarray(reqs))
    x.block_until_ready()
    for _ in range(2):
        y = cd(x)
    y.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(steps):
        y = cd(x)
    y.block_until_ready()
    return k * steps / (time.perf_counter() - t0)


def bench_swin(model, bits, batch, steps=10, bit_config=None,
               device_chain=False):
    import jax

    from diffvit_tpu.config import QuantConfig
    from diffvit_tpu.models import swin, swin_int

    spec = swin.SWIN_SPECS[model]
    cfg = QuantConfig()

    def build():
        params = swin.init_swin_params(spec, jax.random.PRNGKey(0))
        qp = _synth_qp(lambda p, b: swin.calibrate(p, spec, cfg, b), params)
        return swin_int.prepare_int(
            params, qp, spec, cfg,
            bit_config if bit_config is not None else bits)

    ip = _setup_on_cpu(build)
    run = lambda x: swin_int.forward_q_int(ip, spec, cfg, x)
    return _chained_throughput(run, batch, steps,
                               device_chain=device_chain)


def bench_pipeline(model="deit_small", bits=4, batch=64, n_images=512,
                   native=False, emit="f32", prefetch=0, size=256,
                   fast=False, texture="noise"):
    """Host-pipeline-inclusive eval: JPEG decode -> resize/crop/normalize
    -> H2D -> integer forward.  ``native=False``: PIL decode + numpy
    transform on a thread pool; ``native=True``: the whole batch in one C
    call (libjpeg + bit-exact-Pillow resample, data/native_decode.py) —
    float-identical outputs.  ``emit="u8"``: ship the uint8 crop and
    normalize on device (4x less H2D traffic through the tunnel,
    bit-identical model input — data/imagenet.device_normalize).  This
    host has ONE CPU core, so both numbers are honestly host-bound —
    reported as their own rows, not hidden.  ``prefetch>0``: wrap the
    loader in DevicePrefetcher(depth=prefetch) — a feeder thread issues
    jax.device_put as soon as a batch is decoded, so the H2D wire of
    batch i+1 overlaps batch i's compute AND batch i+2's decode instead
    of serializing on the consumer's jnp.asarray (round-3 e2e gap)."""
    import tempfile

    import jax
    import jax.numpy as jnp

    from diffvit_tpu.config import QuantConfig
    from diffvit_tpu.data.imagenet import DataLoader, DevicePrefetcher, \
        ImageFolder, NativeJpegLoader, build_transform, device_normalize
    from diffvit_tpu.data.synthetic import make_fake_imagefolder
    from diffvit_tpu.models import vit, vit_int

    spec = vit.VIT_SPECS[model]
    cfg = QuantConfig()

    def build():
        params = vit.init_params(spec, jax.random.PRNGKey(0))
        qp = _synth_qp(lambda p, b: vit.calibrate(p, spec, cfg, b), params)
        return vit_int.prepare_int(params, qp, spec, cfg,
                                   (bits,) * vit.num_bit_slots(spec))

    ip = _setup_on_cpu(build)
    # chain-token the dispatch stream: independent dispatches drain at
    # ~1.3-1.4 ms/image through the tunnel (612-722 img/s asymptote) while
    # token-chained ones pipeline at chip rate — bit-identical logits
    # (utils/dispatch.py; measured in scripts/ab_chain_token.py)
    from diffvit_tpu.utils.dispatch import ChainedDispatch
    fwd = ChainedDispatch(
        device_normalize,
        lambda xf: vit_int.forward_q_int(ip, spec, cfg, xf))

    # emit="codes": the loader applies the model's input-code LUT in C
    # (codes wire: zero on-device ingest — the u8 wire's device LUT
    # normalize is a giant gather, ~322 ms/step at b256 on the round-5
    # backend; docs/PERF_ANALYSIS.md round-5 correction)
    code_lut = None
    if emit == "codes":
        if not native:
            raise ValueError("emit='codes' rows use the native loader")
        from diffvit_tpu.data.imagenet import input_code_lut
        bt = cfg.bit_a
        code_lut = input_code_lut(
            np.asarray(ip["qact_input"]["scale"]),
            np.asarray(ip["qact_input"]["zp"]),
            qmin=bt.lower_bound, qmax=bt.upper_bound)

    with tempfile.TemporaryDirectory() as root:
        make_fake_imagefolder(root, num_classes=8,
                              per_class=n_images // 8, size=size,
                              texture=texture)
        ds = ImageFolder(root, build_transform())
        if native:
            loader = NativeJpegLoader(ds, batch_size=batch, drop_last=True,
                                      fast=fast, emit=emit,
                                      code_lut=code_lut)
        else:
            loader = DataLoader(ds, batch_size=batch, num_workers=8,
                                drop_last=True)
        if prefetch:
            loader = DevicePrefetcher(loader, depth=prefetch)
        # warm the compile outside the timed loop
        warm_dtype = {"u8": jnp.uint8, "codes": jnp.int8}.get(
            emit, jnp.float32)
        fwd(jnp.zeros((batch, 3, 224, 224), warm_dtype)).block_until_ready()
        # eval batches are independent: dispatch asynchronously and block
        # once at the end, exactly like a production eval loop — per-call
        # blocking would serialize on the axon tunnel's ~0.7 s dispatch
        # round-trip, which measures the tunnel, not the pipeline
        n = 0
        outs = []
        t0 = time.perf_counter()
        for imgs, _ in loader:
            outs.append(fwd(jnp.asarray(imgs)))
            n += imgs.shape[0]
        for o in outs:
            o.block_until_ready()
        dt = time.perf_counter() - t0
    return n / dt


def bench_loader_host(native=False, batch=64, n_images=512, size=256,
                      fast=False, texture="noise", emit="f32"):
    """Host-only loader throughput (JPEG decode -> preprocess -> stacked
    float32 batch, NO device in the loop).  This isolates the data
    pipeline itself from the axon tunnel's dispatch/RPC contention, which
    dominates (and randomizes) the e2e rows on this 1-core host.
    ``size``: fixture image size — 256 (legacy rows) or (500, 375)
    (ImageNet-val-median geometry, where the resample and the DCT-scaled
    fast decode actually engage).  ``fast``: NativeJpegLoader fast mode.
    ``texture``: fixture content — "noise" is a pathological near-max-
    entropy JPEG (Huffman-bound; DCT scaling can't help), "photo" is
    representative photographic entropy (see make_fake_imagefolder)."""
    import tempfile

    from diffvit_tpu.data.imagenet import DataLoader, ImageFolder, \
        NativeJpegLoader, build_transform
    from diffvit_tpu.data.synthetic import make_fake_imagefolder

    with tempfile.TemporaryDirectory() as root:
        make_fake_imagefolder(root, num_classes=8,
                              per_class=n_images // 8, size=size,
                              texture=texture)
        ds = ImageFolder(root, build_transform())
        if native:
            code_lut = None
            if emit == "codes":  # loader cost only: any real-shaped LUT
                from diffvit_tpu.data.imagenet import input_code_lut
                code_lut = input_code_lut(np.float32(0.02), np.float32(0.0))
            loader = NativeJpegLoader(ds, batch_size=batch, drop_last=True,
                                      fast=fast, emit=emit,
                                      code_lut=code_lut)
        else:
            loader = DataLoader(ds, batch_size=batch, num_workers=8,
                                drop_last=True)
        for _ in loader:  # warm: builds the native lib, warms page cache
            pass
        best = 0.0
        for _ in range(5):  # best-of-5: firecracker vCPU scheduling noise
                            # is +-12% on this host (measured, busy-loop)
            n = 0
            t0 = time.perf_counter()
            for imgs, _ in loader:
                n += imgs.shape[0]
            best = max(best, n / (time.perf_counter() - t0))
    return best


def bench_hostfed_vit(model="deit_small", bits=4, batch=256, steps=10,
                      wire="codes"):
    """Host-fed eval chain: a FRESH pre-put buffer every step (the real
    eval-loop shape), token-chained, logits retained per step.  Measures
    what the dispatch stream sustains once batches are device-resident —
    the e2e ceiling net of decode and device_put.

    ``wire``: "codes" (int8 input codes, zero device ingest), "u8" (the
    device LUT normalize — the round-5 backend lowers that gather at
    ~322 ms/step at b256, docs/PERF_ANALYSIS.md round-5 correction), or
    "f32".  Measured round 5: codes 32.8 ms/step = 7,806 img/s at b256
    (AT the 33.3 ms carry floor) vs u8 354.8 ms = 721 img/s —
    bit-identical logits (scripts/ab_codes_wire.py)."""
    import jax
    import jax.numpy as jnp

    from diffvit_tpu.config import QuantConfig
    from diffvit_tpu.data.imagenet import (device_normalize, encode_input,
                                           input_code_lut)
    from diffvit_tpu.models import vit, vit_int

    spec = vit.VIT_SPECS[model]
    cfg = QuantConfig()

    def build():
        params = vit.init_params(spec, jax.random.PRNGKey(0))
        qp = _synth_qp(lambda p, b: vit.calibrate(p, spec, cfg, b), params)
        return vit_int.prepare_int(params, qp, spec, cfg,
                                   (bits,) * vit.num_bit_slots(spec))

    ip = _setup_on_cpu(build)

    @jax.jit
    def step(x, tok):
        xf = device_normalize(x)
        if xf.dtype != jnp.int8:
            xf = xf + (0.0 * tok).astype(xf.dtype)
        logits = vit_int.forward_q_int(ip, spec, cfg, xf)
        return logits, 1e-12 * jnp.nan_to_num(jnp.sum(logits))

    rng = np.random.default_rng(0)
    hosts = [rng.integers(0, 256, (batch, 3, 224, 224), dtype=np.uint8)
             for _ in range(steps)]
    if wire == "codes":
        bt = cfg.bit_a
        lut = input_code_lut(np.asarray(ip["qact_input"]["scale"]),
                             np.asarray(ip["qact_input"]["zp"]),
                             qmin=bt.lower_bound, qmax=bt.upper_bound)
        hosts = [encode_input(h, lut) for h in hosts]
    elif wire == "f32":
        hosts = [np.float32(h) / 255.0 for h in hosts]
    xs = [jax.device_put(h) for h in hosts]
    for x in xs:
        x.block_until_ready()
    tok = jnp.float32(0.0)
    logits, tok = step(xs[0], tok)
    logits.block_until_ready()
    tok = jnp.float32(0.0)
    outs = []
    t0 = time.perf_counter()
    for i in range(steps):
        logits, tok = step(xs[i], tok)
        outs.append(logits)
    for o in outs:
        o.block_until_ready()
    return batch * steps / (time.perf_counter() - t0)


def probe_ingest_regime(steps=8):
    """Stamp the matrix with the two backend numbers its host-fed rows
    depend on (docs/PERF_ANALYSIS.md round-5 correction — the round-4/5
    'tunnel regime' flips were actually the u8 LUT-normalize gather's
    on-device cost drifting with backend updates, plus a fixed retained-
    output dispatch overhead):

      u8_ingest  — chained LUT-normalize -> fake-quant -> patchify ->
                   patch-matmul of a DEVICE-ORIGINATED b256 u8 payload:
                   the model's actual stem.  The consumer matters: forms
                   that fuse the gather into a reduce read ~0 ms even
                   while the model's materialized form costs ~322 ms
                   (both measured round 5 minutes apart) — only the
                   stem-with-matmul shape reproduces the slow lowering
                   reliably.  ~367 ms when slow, ~ms when the backend
                   lowers the gather well.
      dispatch   — a trivial-compute chain whose per-step output is
                   retained (the per-dispatch overhead every real eval
                   step pays; ~25 ms round 5, overlaps with compute)

    Device-originated payloads keep the wire out of both legs."""
    import jax
    import jax.numpy as jnp

    from diffvit_tpu.data.imagenet import device_normalize

    xd = jnp.zeros((256, 3, 224, 224), jnp.uint8)
    xd.block_until_ready()
    w = jnp.full((768, 8), 0.01, jnp.float32)

    @jax.jit
    def ingest_step(x, tok):
        xf = device_normalize(x) + 0.0 * tok
        xq = jnp.clip(jnp.round(xf / 0.02), -128, 127) * 0.02
        p = xq.reshape(256, 3, 14, 16, 14, 16) \
              .transpose(0, 2, 4, 1, 3, 5).reshape(256, 196, 768)
        return 1e-12 * jnp.nan_to_num(jnp.sum(p @ w))

    tok = ingest_step(xd, jnp.float32(0.0))
    tok.block_until_ready()
    tok = jnp.float32(0.0)
    t0 = time.perf_counter()
    for _ in range(steps):
        tok = ingest_step(xd, tok)
    tok.block_until_ready()
    ingest_ms = (time.perf_counter() - t0) / steps * 1e3

    @jax.jit
    def retained_step(x, tok):
        s = jnp.sum(x, dtype=jnp.int32).astype(jnp.float32)
        return s, tok * 0.5 + 1e-12 * s

    out, tok = retained_step(xd, jnp.float32(0.0))
    out.block_until_ready()
    tok = jnp.float32(0.0)
    outs = []
    t0 = time.perf_counter()
    for _ in range(steps):
        out, tok = retained_step(xd, tok)
        outs.append(out)
    for o in outs:
        o.block_until_ready()
    disp_ms = (time.perf_counter() - t0) / steps * 1e3

    return {"u8_ingest_ms_per_step_b256": round(ingest_ms, 2),
            "dispatch_overhead_ms_per_step": round(disp_ms, 2),
            "verdict": ("u8-gather-slow" if ingest_ms > 10.0
                        else "u8-gather-fast")}


def run_matrix(only=None):
    """Measure the matrix.  ``only``: optional regex — re-measure just the
    matching rows and MERGE them into the existing BENCH_MATRIX.json (so a
    stale subset — e.g. host-loader rows measured on a busy core — can be
    refreshed without paying for the whole matrix)."""
    import re

    rows = []
    pat = re.compile(only) if only else None
    measured = []  # names actually measured this run (advisor r4: a --rows
                   # regex matching nothing must not look like success)

    try:
        regime = probe_ingest_regime()
        print(f"  ingest regime: {regime['verdict']} "
              f"(u8 ingest {regime['u8_ingest_ms_per_step_b256']} ms/step "
              f"b256, dispatch overhead "
              f"{regime['dispatch_overhead_ms_per_step']} ms)", flush=True)
    except Exception as e:  # the probe must never block the matrix
        regime = {"error": str(e)[:200]}

    def add(name, fn, **kw):
        if pat is not None and not pat.search(name):
            return
        measured.append(name)
        t0 = time.perf_counter()
        try:
            v = fn(**kw)
            rows.append({"config": name, "img_per_sec": round(v, 1)})
            print(f"  {name:42s} {v:9.1f} img/s "
                  f"[{time.perf_counter()-t0:.0f}s]", flush=True)
        except Exception as e:  # record failures honestly
            rows.append({"config": name, "error": str(e)[:200]})
            print(f"  {name:42s} FAILED: {e}", flush=True)

    add("deit_small_int4_int_b256", bench_vit,
        model="deit_small", bits=4, path="int", batch=256)
    add("deit_small_int8_int_b256", bench_vit,
        model="deit_small", bits=8, path="int", batch=256)
    add("deit_small_int4_fake_b192", bench_vit,
        model="deit_small", bits=4, path="fake", batch=192)
    add("deit_tiny_fp32_b256", bench_vit,
        model="deit_tiny", bits=0, path="fp32", batch=256)
    add("vit_base_int8_int_b96", bench_vit,
        model="vit_base", bits=8, path="int", batch=96)
    add("deit_base_int8_int_b128", bench_vit,
        model="deit_base", bits=8, path="int", batch=128)
    add("vit_large_int8_int_b32", bench_vit,
        model="vit_large", bits=8, path="int", batch=32)
    add("deit_base_int4_int_b128", bench_vit,
        model="deit_base", bits=4, path="int", batch=128)
    add("vit_large_int4_int_b32", bench_vit,
        model="vit_large", bits=4, path="int", batch=32)
    add("swin_tiny_int8_int_b128", bench_swin,
        model="swin_tiny", bits=8, batch=128)
    add("swin_small_int8_int_b96", bench_swin,
        model="swin_small", bits=8, batch=96)
    add("swin_base_int8_int_b48", bench_swin,
        model="swin_base", bits=8, batch=48)
    # mixed-precision: alternating 4/8 per block as the evolutionary
    # search would produce (one retrace/compile, then steady state)
    from diffvit_tpu.models import vit as _vit
    nslots = _vit.num_bit_slots(_vit.VIT_SPECS["deit_small"])
    mixed = tuple(4 if i % 2 else 8 for i in range(nslots))
    add("deit_small_mixed48_int_b256", bench_vit,
        model="deit_small", bits=4, path="int", batch=256, bit_config=mixed)
    # Swin per-layer mixed precision (the §2.6-contract extension)
    from diffvit_tpu.models import swin as _swin
    sslots = _swin.num_bit_slots(_swin.SWIN_SPECS["swin_tiny"])
    smixed = tuple(4 if i % 2 else 8 for i in range(sslots))
    add("swin_tiny_mixed48_int_b128", bench_swin,
        model="swin_tiny", bits=4, batch=128, bit_config=smixed)
    # batch-1 / batch-8 low-latency serving rows: device-chained
    # (lax.fori_loop) so neither fire-and-forget overlap NOR per-dispatch
    # tunnel/enqueue cost (~0.3-0.9 ms, larger than the b1 step itself)
    # distorts them — see _chained_throughput(device_chain=True)
    add("deit_small_int4_int_b1", bench_vit,
        model="deit_small", bits=4, path="int", batch=1, steps=100,
        device_chain=True)
    add("deit_small_int4_int_b8", bench_vit,
        model="deit_small", bits=4, path="int", batch=8, steps=100,
        device_chain=True)
    add("deit_small_int8_int_b1", bench_vit,
        model="deit_small", bits=8, path="int", batch=1, steps=100,
        device_chain=True)
    # resident whole-encoder kernel (ops/pallas/serve.py): the 12-block
    # stack as ONE pallas_call — measured ~parity with the per-kernel
    # path at b1 (docs/PERF_ANALYSIS.md "Batch-1 serving anatomy")
    add("deit_small_int4_serve_b1", bench_vit,
        model="deit_small", bits=4, path="serve", batch=1, steps=100,
        device_chain=True)
    # scan-k serving (IntModel(microbatch=1) over a k-request buffer):
    # ONE dispatch runs k b1 graphs via lax.scan, amortizing the tunnel's
    # fixed per-dispatch RPC across the k requests (measured 24.4 -> 1.89
    # ms/img at k=32 in the wire-bound regime — scripts/ab_ring.py,
    # docs/PERF_ANALYSIS.md "Tunnel regimes").  Token-chained with a
    # pre-put u8 buffer: the real request-stream dispatch cost, not the
    # carry-threaded chip rate.
    add("deit_small_int4_serve_scan32_b1_u8", bench_serve_scan,
        model="deit_small", bits=4, k=32)
    # same request stream on the codes wire (no per-request device ingest)
    add("deit_small_int4_serve_scan32_b1_codes", bench_serve_scan,
        model="deit_small", bits=4, k=32, wire="codes")
    # host-fed eval chains: fresh pre-put buffer per step, logits
    # retained — the dispatch-stream ceiling a real eval loop sees once
    # batches are on device.  codes vs u8 is the round-5 ingest story:
    # 7.8k vs 0.72k img/s at b256 (docs/PERF_ANALYSIS.md round-5
    # correction), bit-identical logits.
    add("deit_small_int4_hostfed_codes_b256", bench_hostfed_vit,
        model="deit_small", bits=4, batch=256, wire="codes")
    add("deit_small_int4_hostfed_u8_b256", bench_hostfed_vit,
        model="deit_small", bits=4, batch=256, wire="u8")
    add("swin_tiny_int8_int_b1", bench_swin,
        model="swin_tiny", bits=8, batch=1, steps=60, device_chain=True)
    add("swin_tiny_int8_int_b8", bench_swin,
        model="swin_tiny", bits=8, batch=8, steps=60, device_chain=True)
    add("host_loader_pil_b64", bench_loader_host)
    add("host_loader_native_b64", bench_loader_host, native=True)
    add("host_loader_native_fast_b64", bench_loader_host, native=True,
        fast=True)
    # u8 emit = the production wire format (--wire u8): the host skips the
    # normalize + f32 store entirely (the device LUT-normalizes)
    add("host_loader_native_u8_b64", bench_loader_host, native=True,
        emit="u8")
    # codes emit: u8 + the in-C input-code LUT (the codes wire's host cost)
    add("host_loader_native_codes_b64", bench_loader_host, native=True,
        emit="codes")
    # ImageNet-val-median geometry (500x375) with photo-like JPEG entropy:
    # the resample + DCT-scaled fast decode engage here, unlike the
    # 256-square legacy fixture.  The legacy noise fixture is Huffman-
    # decode-bound (near-max entropy), which misrepresents real photos —
    # docs/PERF_ANALYSIS.md "Fast decode anatomy".
    add("host_loader_pil_photo500_b64", bench_loader_host,
        size=(500, 375), texture="photo")
    add("host_loader_native_photo500_b64", bench_loader_host, native=True,
        size=(500, 375), texture="photo")
    add("host_loader_native_fast_photo500_b64", bench_loader_host,
        native=True, size=(500, 375), fast=True, texture="photo")
    add("host_loader_native_u8_fast_photo500_b64", bench_loader_host,
        native=True, size=(500, 375), fast=True, texture="photo",
        emit="u8")
    add("pipeline_e2e_jpeg_deit_small_int4_b64", bench_pipeline)
    add("pipeline_e2e_jpeg_native_deit_small_int4_b64", bench_pipeline,
        native=True)
    # uint8 wire format: 4x less H2D (9.6 MB vs 38 MB per b64 batch),
    # device-side LUT normalize, bit-identical model input
    add("pipeline_e2e_jpeg_native_u8_deit_small_int4_b64", bench_pipeline,
        native=True, emit="u8")
    # + async H2D: a feeder thread device_puts batches as they decode,
    # overlapping the tunnel wire with decode and compute (round-4)
    add("pipeline_e2e_jpeg_native_u8_pf_deit_small_int4_b64",
        bench_pipeline, native=True, emit="u8", prefetch=2)
    # b256: amortizes the once-per-dispatch tunnel RPC the chain token
    # can't hide (docs/PERF_ANALYSIS.md "Tunnel dispatch anatomy")
    add("pipeline_e2e_jpeg_native_u8_pf_deit_small_int4_b256",
        bench_pipeline, native=True, emit="u8", prefetch=2, batch=256,
        n_images=2560)
    # representative-photo fixtures at ImageNet-val-median geometry with
    # DCT-scaled fast decode — the loader configuration the
    # host_loader_*_fast_photo500 rows measure, now as e2e rows too
    # (VERDICT r4 weak #6: the e2e rows previously only exercised the
    # noise-256 fixtures where fast decode can't engage)
    add("pipeline_e2e_jpeg_native_u8_pf_fast_photo500_deit_small_int4_b64",
        bench_pipeline, native=True, emit="u8", prefetch=2,
        size=(500, 375), fast=True, texture="photo")
    add("pipeline_e2e_jpeg_native_u8_pf_fast_photo500_deit_small_int4_b256",
        bench_pipeline, native=True, emit="u8", prefetch=2, batch=256,
        n_images=2560, size=(500, 375), fast=True, texture="photo")
    # codes wire e2e: the loader emits int8 input codes (in-C LUT), the
    # device runs ZERO ingest ops — removes the u8 wire's ~322 ms/step
    # on-device gather from every host-fed batch (round-5 correction)
    add("pipeline_e2e_jpeg_native_codes_pf_deit_small_int4_b64",
        bench_pipeline, native=True, emit="codes", prefetch=2)
    add("pipeline_e2e_jpeg_native_codes_pf_deit_small_int4_b256",
        bench_pipeline, native=True, emit="codes", prefetch=2, batch=256,
        n_images=2560)
    add("pipeline_e2e_jpeg_native_codes_pf_fast_photo500_deit_small_int4_b64",
        bench_pipeline, native=True, emit="codes", prefetch=2,
        size=(500, 375), fast=True, texture="photo")

    if pat is not None:  # merge refreshed rows into the saved matrix
        try:
            with open(MATRIX_PATH) as f:
                old = json.load(f)["rows"]
        except Exception:
            old = []
        fresh = {r["config"]: r for r in rows}
        rows = [fresh.pop(r["config"], r) for r in old] + list(fresh.values())
    payload = {"rows": rows, "unit": "images/sec/chip",
               "target": TARGET_IMG_PER_SEC,
               "ingest_regime_at_measurement": regime,
               "notes": {
                   "chip_rows": "model rows are carry-threaded chained "
                   "timing = true per-chip compute rate (CLAUDE.md; "
                   "fire-and-forget lies on this backend)",
                   "ingest_correction": "the round-4/5 'tunnel regime' "
                   "story is SUPERSEDED: the u8 wire's on-device LUT "
                   "normalize is a 12.8M-element gather at b256 that the "
                   "current backend lowers at ~322 ms/step (it was ~20 ms "
                   "in round 4 — backend drift, not a wire regime).  The "
                   "codes wire (emit='codes': host-side in-C input-code "
                   "LUT, int8 on the wire, zero device ingest) removes it "
                   "entirely: hostfed_codes_b256 runs AT the carry-loop "
                   "chip floor, bit-identical logits.  "
                   "ingest_regime_at_measurement stamps this run's "
                   "measured u8-ingest + dispatch-overhead costs so "
                   "host-fed rows stay self-describing across backend "
                   "drift (docs/PERF_ANALYSIS.md round-5 correction).",
                   "pipeline_e2e_rows": "e2e = min(1-core decode, "
                   "device_put wire, chip rate).  With the codes wire the "
                   "dispatch stream runs at chip rate, so the e2e rows "
                   "measure min(decode, put); put bandwidth through the "
                   "tunnel drifts 40-190 MB/s by time of day (measured "
                   "round 5), so e2e rows carry that variance.  The 5k "
                   "north star remains decode-impossible on 1 host core; "
                   "the loader rows bound it honestly.",
               }}
    if pat is not None and not measured:
        # nothing matched: do NOT rewrite the matrix as if refreshed
        print(f"  --rows {only!r} matched no rows; matrix left untouched",
              flush=True)
        return payload, 0
    with open(MATRIX_PATH, "w") as f:
        json.dump(payload, f, indent=1)
    return payload, len(measured)


def _device_ready(timeout_s=900):
    """Probe backend init in a daemon thread; returns (ok, error_note).
    The axon tunnel, when down, makes ``jax.devices()`` HANG (observed
    >500 s, 2026-08-17) rather than raise — without a watchdog the
    driver's bench run would produce no record at all.  A CPU-only
    backend also fails the probe: these are chip rows, and a silent
    axon→CPU fallback would record 1-core numbers against the 5000
    img/s chip target.  Generous timeout: a healthy first init through
    the tunnel can take minutes."""
    import threading

    result = {}

    def probe():
        try:
            import jax

            platforms = {d.platform for d in jax.devices()}
            if platforms == {"cpu"}:
                result["err"] = "only a CPU backend came up (no TPU/axon)"
            else:
                result["ok"] = True
        except Exception as e:  # tunnel handshake / plugin failures
            result["err"] = f"backend init raised: {e!r}"

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    t.join(timeout_s)
    if result.get("ok"):
        return True, None
    return False, result.get(
        "err", f"device backend init timed out after {timeout_s}s "
               "(axon tunnel down)")


def _attach_matrix(out):
    """Attach the last measured matrix rows as "extra" (best effort — a
    truncated/missing matrix must not prevent the JSON line)."""
    try:
        with open(MATRIX_PATH) as f:
            out["extra"] = json.load(f)["rows"]
    except Exception:
        pass
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="deit_small")
    ap.add_argument("--bits", default=4, type=int)
    ap.add_argument("--batch", default=256, type=int,
                    help="256 is the measured sweet spot since the int8-codes"
                         " residual stream (192 before it)")
    ap.add_argument("--steps", default=30, type=int)
    ap.add_argument("--path", default="int",
                    choices=["int", "fake", "fp32"])
    ap.add_argument("--matrix", action="store_true",
                    help="measure the full BASELINE.json config set and "
                         "write BENCH_MATRIX.json")
    ap.add_argument("--rows", default=None, metavar="REGEX",
                    help="with --matrix: re-measure only matching rows "
                         "and merge them into the saved matrix")
    args = ap.parse_args()

    if args.rows is not None:
        # fail fast on a bad regex, BEFORE the device probe (which can
        # take minutes through the axon tunnel) — advisor r4
        import re

        re.compile(args.rows)

    ready, err = _device_ready()
    if not ready:
        import sys

        out = {
            "metric": f"{args.model}_int{args.bits}_{args.path}_throughput",
            "value": 0.0,
            "unit": "images/sec/chip",
            "vs_baseline": 0.0,
            "error": f"{err}; see BENCH_MATRIX.json for the last "
                     "measured rows",
        }
        print(json.dumps(_attach_matrix(out)))
        sys.exit(1)

    if args.matrix:
        _, n_refreshed = run_matrix(only=args.rows)
        if args.rows:  # partial refresh: skip the headline re-measure
            out = {"metric": "matrix_rows_refreshed",
                   "value": float(n_refreshed), "unit": "rows",
                   "vs_baseline": 1.0 if n_refreshed else 0.0}
            if not n_refreshed:
                out["error"] = (f"--rows {args.rows!r} matched no matrix "
                                "rows; nothing was measured")
            print(json.dumps(_attach_matrix(out)))
            if not n_refreshed:
                import sys

                sys.exit(1)
            return

    v = bench_vit(args.model, args.bits, args.path, args.batch,
                  steps=args.steps)
    out = {
        "metric": f"{args.model}_int{args.bits}_{args.path}_throughput",
        "value": round(v, 1),
        "unit": "images/sec/chip",
        "vs_baseline": round(v / TARGET_IMG_PER_SEC, 4),
    }
    print(json.dumps(_attach_matrix(out)))


if __name__ == "__main__":
    main()
