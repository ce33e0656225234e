"""High-level engine: build → calibrate → validate, with jit caching per
bit_config and optional device-mesh sharding.

This is the functional replacement for the reference's mutable model + mode
flags: a ``QuantizedViT`` owns the param/qparam pytrees and hands out jitted
forward functions; ``validate`` reproduces test_quant.py:418-466's loop and
Prec@1/Prec@5 reporting.
"""
from __future__ import annotations

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .config import QuantConfig
from .data.imagenet import IMAGENET_MEAN, IMAGENET_STD, device_normalize
from .models import vit as vit_mod
from .models.registry import build_params
from .utils.metrics import AverageMeter, accuracy, cross_entropy
from .parallel import mesh as mesh_mod


class QuantizedViT:
    """Calibratable quantized ViT/DeiT/Swin with compiled-forward caching.

    Each distinct (bit_config, quantized?) pair traces once; subsequent
    batches reuse the compiled executable (SURVEY.md §7 design point 4).
    For Swin specs, ``bit_config`` is a uniform weight bit (the reference
    Swin's only mode, swin_quant.py:813-817) or a per-slot sequence over
    the generalized §2.6 contract (swin.num_bit_slots slots — the
    mixed-precision extension; see swin.normalize_bit_config).
    """

    def __init__(self, name_or_spec, cfg: QuantConfig | None = None,
                 params=None, checkpoint=None, mesh=None, seed: int = 0,
                 input_norm=(IMAGENET_MEAN, IMAGENET_STD)):
        if isinstance(name_or_spec, str):
            self.spec, loaded = build_params(name_or_spec, checkpoint, seed)
            params = params if params is not None else loaded
        else:
            self.spec = name_or_spec
            assert params is not None
        from .models import swin as swin_mod

        self.is_swin = isinstance(self.spec, swin_mod.SwinSpec)
        self._mod = swin_mod if self.is_swin else vit_mod
        self.cfg = cfg or QuantConfig()
        self.mesh = mesh
        if mesh is not None:
            params = mesh_mod.shard_params(mesh, params)
        self.params = params
        # the original float pytree — the reconstruction passes (adaround
        # / bias_correct) anchor their float-path targets here even after
        # self.params has been replaced by a reconstructed pytree
        self.fp_params = params
        self.qparams = None
        self.global_distance = None
        self._jit_cache = {}
        # All jitted forwards prepend this: uint8 batches (the 4x-smaller
        # wire format from the emit="u8" loaders) normalize ON DEVICE
        # (data/imagenet.device_normalize, bit-exact vs host f32); f32
        # batches pass through — dtype is static under jit, so the branch
        # costs nothing and each dtype traces its own executable.
        mean, std = input_norm
        self._prep = partial(device_normalize, mean=mean, std=std)

    # -- calibration ------------------------------------------------------
    def calibrate(self, batch):
        """Calibration (test_quant.py:234-249).  ``batch``: one array
        (single-batch protocol, the reference's active path) or a list of
        arrays (multi-batch observe-then-finalize, the reference's intended
        --calib-iter protocol; ViT/DeiT and Swin)."""
        if isinstance(batch, (list, tuple)):
            qp, dist = self._mod.calibrate_batches(
                self.params, self.spec, self.cfg,
                [self._prep(jnp.asarray(b)) for b in batch])
            if self.mesh is not None:
                qp = mesh_mod.shard_replicated(self.mesh, qp)
            self.qparams = jax.tree.map(lambda a: a, qp)
            self.global_distance = np.asarray(dist)
            return self.qparams
        batch = self._prep(jnp.asarray(batch))
        # Eager orchestration over jitted per-site primitives: identical
        # block shapes share compiled kernels (see calib/observers.py).
        qp, dist = self._mod.calibrate(self.params, self.spec, self.cfg, batch)
        if self.mesh is not None:
            qp = mesh_mod.shard_replicated(self.mesh, qp)
        self.qparams = jax.tree.map(lambda a: a, qp)
        self.global_distance = np.asarray(dist)
        return self.qparams

    def save_calibration(self, path):
        """Serialize the calibration artifacts (scales/zero-points/SmoothQuant
        channel scales + per-bit weight distances).  The reference recomputes
        calibration on every run (SURVEY.md §5 'no saving of calibrated
        scales'); this closes that gap."""
        if self.qparams is None:
            raise RuntimeError("nothing to save; calibrate first")
        arrays = {f"qp::{k}": np.asarray(v) for k, v in self.qparams.items()}
        arrays["__global_distance__"] = np.asarray(self.global_distance)
        np.savez(path, **arrays)

    def load_calibration(self, path):
        with np.load(path) as z:
            self.qparams = {k[4:]: jnp.asarray(z[k]) for k in z.files
                            if k.startswith("qp::")}
            self.global_distance = np.asarray(z["__global_distance__"])
        if self.mesh is not None:
            self.qparams = mesh_mod.shard_replicated(self.mesh, self.qparams)
        return self.qparams

    def _recon_input(self, batch, max_images):
        """Build the reconstruction input for adaround/bias_correct from a
        single calibration batch or a list of them.  The passes' per-site
        taps materialize EVERY site for every image in one forward, so
        total images are capped at ``max_images`` — taken evenly across
        batches: AdaRound subsamples each site to ``max_rows`` rows anyway
        (2048 rows ≈ 10 ViT images' tokens), so batch DIVERSITY is what a
        multi-batch calibration buys, not row count (see the measured
        single-batch overfit in scripts/qat_order_exp.py)."""
        if not isinstance(batch, (list, tuple)):
            return self._prep(jnp.asarray(batch))
        bs = [self._prep(jnp.asarray(b)) for b in batch]
        if max_images is not None:
            total = sum(b.shape[0] for b in bs)
            if total > max_images:
                quota = -(-max_images // len(bs))  # ceil
                bs = [b[:quota] for b in bs]
        x = jnp.concatenate(bs, axis=0)
        return x[:max_images] if max_images is not None else x

    def adaround(self, batch, bit_config=None, *, steps=1000,
                 max_rows=2048, seed=0, max_images=256):
        """Learned-rounding weight reconstruction (AdaRound,
        calib/adaround.py) — beyond-the-reference (the reference always
        rounds to nearest, uniform.py:50-56).  Replaces ``self.params``
        with the reconstructed pytree; every downstream consumer
        (forward_q, forward_q_bits, prepare_int, save_int_model) picks up
        the learned codes because they re-round bit-exactly.  Requires
        calibration; ``batch`` is a calibration batch from any --mode, or
        a list of them (all consumed, capped at ``max_images`` images —
        see _recon_input)."""
        if self.qparams is None:
            raise RuntimeError("calibrate first")
        from .calib.adaround import adaround_swin, adaround_vit

        x = self._recon_input(batch, max_images)
        fn = adaround_swin if self.is_swin else adaround_vit
        new_params, report = fn(
            self.params, self.qparams, self.spec, self.cfg, x, bit_config,
            steps=steps, max_rows=max_rows, seed=seed,
            fp_params=self.fp_params)
        if self.mesh is not None:
            new_params = mesh_mod.shard_params(self.mesh, new_params)
        self.params = new_params
        # the cached prepare_int executables close over weights baked from
        # the OLD params (the fake-quant forwards take params as arguments
        # and need no invalidation)
        self._jit_cache.clear()
        return report

    def qat(self, batch, bit_config=None, *, steps=200, lr=1e-5,
            remat=False):
        """Data-free distillation QAT (calib/qat.py): fine-tune the latent
        float weights through the STE-threaded quantized forward toward
        the original FP teacher.  Beyond-the-reference (the reference
        never differentiates through its quantizers).  Replaces
        ``self.params``; returns the per-step loss trajectory.  Works for
        ViT/DeiT and Swin.  Requires calibration.  ``remat=True``
        (ViT family) checkpoints each block in the STE forward so the
        train step fits HBM on the deep/wide models (vit_large) —
        bit-identical loss trajectory, one extra forward of FLOPs."""
        if self.qparams is None:
            raise RuntimeError("calibrate first")
        from .calib.qat import qat_distill

        batches = batch if isinstance(batch, (list, tuple)) else [batch]
        batches = [self._prep(jnp.asarray(b)) for b in batches]
        new_params, losses = qat_distill(
            self.params, self.qparams, self.spec, self.cfg, batches,
            bit_config, steps=steps, lr=lr, fp_params=self.fp_params,
            remat=remat)
        if self.mesh is not None:
            new_params = mesh_mod.shard_params(self.mesh, new_params)
        self.params = new_params
        self._jit_cache.clear()  # cached int executables bake old weights
        return losses

    def bias_correct(self, batch, bit_config=None, *, max_images=256):
        """DFQ-style empirical bias correction (calib/biascorr.py) —
        beyond-the-reference; zero inference cost.  Replaces
        ``self.params`` with the corrected pytree (biases are float and
        never quantized, so every execution path picks it up).  Composes
        with ``adaround`` (run that first).  Requires calibration.
        ``batch`` may be a list of calibration batches (all consumed,
        capped at ``max_images`` — see _recon_input)."""
        if self.qparams is None:
            raise RuntimeError("calibrate first")
        from .calib.biascorr import bias_correct

        x = self._recon_input(batch, max_images)
        new_params, report = bias_correct(self.params, self.qparams,
                                          self.spec, self.cfg, x, bit_config,
                                          fp_params=self.fp_params)
        if self.mesh is not None:
            new_params = mesh_mod.shard_params(self.mesh, new_params)
        self.params = new_params
        self._jit_cache.clear()  # cached int executables bake old biases
        return report

    # -- integer execution path -------------------------------------------
    def prepare_int(self, bit_config=None):
        """Bake the calibrated model into the integer execution path (real
        int8 MXU matmuls) for ``bit_config``; cached per config.  For Swin,
        bit_config is the uniform weight bit or a per-slot sequence."""
        if self.qparams is None:
            raise RuntimeError("calibrate first")
        if self.mesh is not None and self.mesh.shape.get("pp", 1) > 1 \
                and self.is_swin:
            raise ValueError("pipeline parallelism supports the ViT family "
                             "(a Swin stage changes resolution mid-network, "
                             "so its depth axis is not SPMD-uniform)")
        if self.is_swin:
            from .models import swin_int as int_mod

            if bit_config is None:
                bit = self.cfg.bit_w.bits
            elif isinstance(bit_config, int):
                bit = int(bit_config)
            else:  # per-slot mixed precision on the integer path
                bit = tuple(int(b) for b in bit_config)
            key = ("int", bit)
            if key not in self._jit_cache:
                ip = int_mod.prepare_int(self.params, self.qparams,
                                         self.spec, self.cfg, bit)
                if self.mesh is not None:
                    ip = mesh_mod.shard_int_params(self.mesh, ip)
                self._jit_cache[key] = jax.jit(
                    lambda x: int_mod.forward_q_int(ip, self.spec,
                                                    self.cfg, self._prep(x)))
            return self._jit_cache[key]
        from .models import vit_int

        if bit_config is not None:
            bit_config = tuple(int(b) for b in bit_config)
        key = ("int", bit_config)
        if key not in self._jit_cache:
            ip = vit_int.prepare_int(self.params, self.qparams, self.spec,
                                     self.cfg, bit_config)
            if self.mesh is not None:
                ip = mesh_mod.shard_int_params(self.mesh, ip)
            if self.mesh is not None and self.mesh.shape.get("pp", 1) > 1:
                self._jit_cache[key] = _pp_int_forward(
                    ip, self.spec, self.cfg, self.mesh, self._prep)
            else:
                self._jit_cache[key] = jax.jit(
                    lambda x: vit_int.forward_q_int(ip, self.spec, self.cfg,
                                                    self._prep(x)))
        return self._jit_cache[key]

    def save_int_model(self, path, bit_config=None):
        """Export the baked integer model (int8 weight codes + requant
        multipliers + structure) as one .npz deployment artifact.  Serving
        cold-start then needs neither the fp checkpoint nor calibration:
        ``engine.load_int_model(path)`` returns a callable model.  Beyond
        the reference (which recalibrates and re-fake-quantizes the fp
        model every run, test_quant.py:234-249)."""
        from .utils.serialize import save_pytree

        if self.qparams is None:
            raise RuntimeError("calibrate first")
        if self.is_swin:
            from .models import swin_int as int_mod

            if bit_config is None:
                bit_config = self.cfg.bit_w.bits
            ip = int_mod.prepare_int(self.params, self.qparams, self.spec,
                                     self.cfg, bit_config)
        else:
            from .models import vit_int as int_mod

            if bit_config is not None:
                bit_config = tuple(int(b) for b in bit_config)
            ip = int_mod.prepare_int(self.params, self.qparams, self.spec,
                                     self.cfg, bit_config)
        import dataclasses

        save_pytree(path, ip, meta={"model": self.spec.name,
                                    "spec": dataclasses.asdict(self.spec),
                                    "cfg": self.cfg.to_dict(),
                                    "is_swin": self.is_swin})

    # -- forwards ---------------------------------------------------------
    def _forward_fn(self, quant: bool, bit_config):
        key = (quant, bit_config)
        if key not in self._jit_cache:
            if quant and self.is_swin:
                fn = partial(self._mod.forward_q, spec=self.spec,
                             cfg=self.cfg, bit=bit_config)
                jfn = jax.jit(lambda p, qp, x: fn(p, qp, x=self._prep(x)))
            elif quant:
                # sp meshes: token-shard the residual stream (the
                # sequence-parallel axis; Swin's windowed stages restructure
                # tokens and keep their native GSPMD propagation instead)
                fn = partial(self._mod.forward_q, spec=self.spec,
                             cfg=self.cfg, bit_config=bit_config,
                             act_constraint=mesh_mod.act_constraint(self.mesh))
                jfn = jax.jit(lambda p, qp, x: fn(p, qp, x=self._prep(x)))
            else:
                fn = partial(self._mod.forward_fp, spec=self.spec)
                jfn = jax.jit(lambda p, qp, x: fn(p, x=self._prep(x)))
            self._jit_cache[key] = jfn
        return self._jit_cache[key]

    def _chain(self, fn, reorder=None):
        """Chain-token wrapper around a cached jitted forward (see
        utils/dispatch.ChainedDispatch): successive eval dispatches thread
        an exact-zero data dependence so hostile backends (the axon
        tunnel) pipeline them at chip rate — measured 725 -> 4,731 img/s
        at b256, logits bit-identical (tests/test_chained_dispatch.py).
        Keyed by the plain fn's id (stable: it lives in _jit_cache, and
        _jit_cache.clear() drops both together).  The inner fn's own
        _prep is a pass-through on the wrapper's already-prepped f32
        batch (device_normalize is uint8-only by contract)."""
        key = ("chain", id(fn))
        if key not in self._jit_cache:
            from .utils.dispatch import ChainedDispatch

            self._jit_cache[key] = ChainedDispatch(
                self._prep, fn if reorder is None else reorder)
        return self._jit_cache[key]

    def __call__(self, x, bit_config=None, quant=True, use_int=False):
        x = jnp.asarray(x)
        pad = 0
        if self.mesh is not None:
            x, pad = _dp_pad(x, self.mesh)
            x = jax.device_put(x, mesh_mod.batch_sharding(self.mesh))
        if quant and self.qparams is None:
            raise RuntimeError("model not calibrated; call .calibrate() first")
        if use_int and quant:
            fn = self.prepare_int(bit_config)
            if self.mesh is None:
                fn = self._chain(fn)
            out = fn(x)
            return out[:out.shape[0] - pad] if pad else out
        if self.is_swin:
            if quant and bit_config is None:
                bit_config = self.cfg.bit_w.bits
            if bit_config is not None and not isinstance(bit_config, int):
                # per-slot Swin bit_config (the mixed-precision extension);
                # a length-1 sequence still means the uniform bit
                bit_config = tuple(int(b) for b in bit_config) \
                    if hasattr(bit_config, "__len__") else int(bit_config)
                if isinstance(bit_config, tuple) and len(bit_config) == 1:
                    bit_config = bit_config[0]
        else:
            if quant and bit_config is None:
                bit_config = (self.cfg.bit_w.bits,) * vit_mod.num_bit_slots(self.spec)
            if bit_config is not None:
                bit_config = tuple(int(b) for b in bit_config)
        fn = self._forward_fn(quant, bit_config)
        if self.mesh is None:
            fn = self._chain(fn)  # called as fn(params, qparams, x)
        out = fn(self.params, self.qparams, x)
        return out[:out.shape[0] - pad] if pad else out

    # -- batched mixed-precision evaluation --------------------------------
    def forward_bits(self, x, bits_batch):
        """Evaluate MANY {4,8} bit_configs in one compiled call:
        vit.forward_q_bits (bit-traced selects, one compilation for every
        candidate) vmapped over the candidate axis; under a mesh the
        candidate axis is dp-sharded — the mixed-precision search's
        embarrassingly-parallel evals ride the mesh instead of looping
        (SURVEY.md §2.7).  bits_batch: (ncand, 4*depth+2) ints in {4,8}.
        Returns (ncand, B, classes) logits."""
        if self.qparams is None:
            raise RuntimeError("model not calibrated; call .calibrate() first")
        key = ("bits_vmap",)
        if key not in self._jit_cache:
            mod = self._mod  # swin.forward_q_bits mirrors vit's contract

            def f(p, qp, xin, bits):
                return mod.forward_q_bits(p, qp, self.spec, self.cfg,
                                          self._prep(xin), bits)

            self._jit_cache[key] = jax.jit(
                jax.vmap(f, in_axes=(None, None, None, 0)))
        bits_batch = jnp.asarray(bits_batch, jnp.int32)
        x = jnp.asarray(x)
        pad = 0
        if self.mesh is not None:
            dp = self.mesh.shape["dp"]
            pad = (-bits_batch.shape[0]) % dp
            if pad:
                bits_batch = jnp.concatenate(
                    [bits_batch, jnp.repeat(bits_batch[-1:], pad, 0)])
            bits_batch = jax.device_put(
                bits_batch, mesh_mod.NamedSharding(self.mesh,
                                                   mesh_mod.P("dp")))
            x = jax.device_put(x, mesh_mod.NamedSharding(self.mesh,
                                                         mesh_mod.P()))
            out = self._jit_cache[key](self.params, self.qparams, x,
                                       bits_batch)
        else:
            plain = self._jit_cache[key]
            fn = self._chain(plain,
                             reorder=lambda p, qp, bits, xf:
                             plain(p, qp, xf, bits))
            out = fn(self.params, self.qparams, bits_batch, x)
        return out[:out.shape[0] - pad] if pad else out

    def forward_bits_int(self, x, bits):
        """Single-candidate mixed-precision eval on the INTEGER execution
        path with traced ``bits`` — the fast search substrate.  One jitted
        program (weight codes selected per-slot from both uniform bakes,
        models/vit_int.select_int_bits) serves every {4,8} candidate at
        int-path speed, ~2.1x the vmapped fake path per candidate-image
        (BENCH_MATRIX fake vs int rows).  Logits equal prepare_int(bits)'s
        bit-for-bit (tests/test_int_bits.py), which matches forward_q to
        rtol 2e-4 (tests/test_int_path.py) — knife-edge candidate rankings
        can therefore differ from the reference-parity fake path, which
        stays the default (CLI --search-path).  ViT family, single chip;
        under a mesh use forward_bits (dp-sharded candidate axis)."""
        if self.qparams is None:
            raise RuntimeError("model not calibrated; call .calibrate() first")
        if self.is_swin:
            raise NotImplementedError(
                "int-path search eval is wired for the ViT family; Swin "
                "searches use the fake-path forward_bits")
        if self.mesh is not None:
            raise NotImplementedError(
                "int-path search eval is single-chip; under a mesh the "
                "fake-path forward_bits dp-shards the candidate axis")
        key = ("int_bits",)
        if key not in self._jit_cache:
            from .models import vit_int

            variants, sym_acts = vit_int.prepare_int_bits(
                self.params, self.qparams, self.spec, self.cfg)
            lis_fast = None
            if self.cfg.lis:
                from .ops.pallas.attention import lis_fast_ok

                lis_fast = tuple(
                    lis_fast_ok(float(jax.device_get(
                        self.qparams[f"blocks.{i}.attn.qact_attn1.scale"])))
                    for i in range(self.spec.depth))

            def fwd(variants, bits, xf):
                ip = vit_int.select_int_bits(variants, bits, sym_acts,
                                             self.spec, self.cfg)
                return vit_int.forward_q_int(ip, self.spec, self.cfg, xf,
                                             lis_fast=lis_fast)

            from .utils.dispatch import ChainedDispatch

            self._jit_cache[key] = (variants, ChainedDispatch(self._prep,
                                                              fwd))
        variants, fn = self._jit_cache[key]
        return fn(variants, jnp.asarray(bits, jnp.int32), x)

    @property
    def flops(self):
        return self._mod.flops_list(self.spec)


def _dp_pad(x, mesh):
    """Zero-pad the batch axis up to the dp-divisible size NamedSharding
    requires (a ragged last validation batch would otherwise fail
    device_put); callers slice the pad rows' logits away.  Each distinct
    padded shape compiles once — padding to the dp multiple *reduces*
    shape diversity across ragged tails."""
    dp = mesh.shape["dp"]
    pad = (-x.shape[0]) % dp
    if pad:
        x = jnp.concatenate([x, jnp.zeros((pad,) + x.shape[1:], x.dtype)])
    return x, pad


def _pp_int_forward(ip, spec, cfg, mesh, prep):
    """Jitted integer forward over a pipeline-parallel (pp) mesh
    (parallel/pipeline.py: GPipe microbatch schedule, int8-codes
    stage-to-stage wire).  Batches are zero-padded up to the
    n_micro x dp granularity the schedule shards by and the pad rows'
    logits sliced away (shapes are static under jit, so real batch sizes
    each trace once, like every other cached forward)."""
    from .parallel import pipeline

    if mesh.shape.get("sp", 1) > 1:
        # sp token-shards the fake-quant residual stream; the integer
        # pipeline never consumes it — an sp axis here would only
        # replicate work silently
        raise ValueError("pp composes with dp/tp, not sp (sp is a "
                         "fake-quant-path axis)")
    pp = mesh.shape["pp"]
    dp = mesh.shape.get("dp", 1)
    plan = pipeline.plan_shardings(
        mesh, pipeline.prepare_pp(ip, spec, cfg, pp))
    # the plan's stacked leaves carry the block weights; keep only the
    # non-block parts of ip for the embed front / head tail so device HBM
    # doesn't hold every block weight twice
    ip = dict(ip, blocks=[{"qact4": ip["blocks"][-1]["qact4"]}])

    def fwd(x):
        x = prep(x)
        b = x.shape[0]
        n_micro = 2 * pp if b >= 2 * pp * dp else pp
        gran = n_micro * dp
        pad = (-b) % gran
        if pad:
            x = jnp.concatenate([x, jnp.zeros((pad,) + x.shape[1:],
                                              x.dtype)])
        out = pipeline.forward_q_int_pp(ip, plan, spec, cfg, x, mesh,
                                        n_micro=n_micro)
        return out[:b]

    return jax.jit(fwd)


def _microbatched(fwd, m):
    """Run ``fwd`` over chunks of ``m`` rows via lax.scan inside ONE
    dispatch — bit-identical logits (each chunk runs the batch-m graph).
    Serving use: a stream of k batch-m requests dispatched one-by-one
    pays the tunnel's fixed per-dispatch RPC k times (~24 ms each in the
    wire-bound regime, docs/PERF_ANALYSIS.md "Tunnel regimes"); stacking
    them into one scan-k dispatch amortizes it — measured b1 serving
    24.4 -> 1.89 ms/img at k=32 (scripts/ab_ring.py).  Ragged tails are
    zero-padded to the chunk grid and the pad logits sliced away."""
    import jax

    def f(xf):
        b = xf.shape[0]
        pad = (-b) % m
        if pad:
            xf = jnp.concatenate(
                [xf, jnp.zeros((pad,) + xf.shape[1:], xf.dtype)])
        xs = xf.reshape(-1, m, *xf.shape[1:])
        ys = jax.lax.scan(lambda c, xc: (c, fwd(xc)), 0, xs)[1]
        out = ys.reshape(-1, ys.shape[-1])
        return out[:b] if pad else out

    return f


class IntModel:
    """A deployed integer model loaded from a save_int_model artifact:
    just the baked int pytree + spec/cfg, with the same jitted-forward and
    uint8-wire entry as QuantizedViT.  No fp params, no calibration
    machinery — the serving-side object.

    ``microbatch=m``: scan the forward over chunks of m rows in ONE
    dispatch (see _microbatched) — the latency/throughput knob for
    small-batch serving streams on dispatch-taxed backends.

    ``resident=True`` (ViT family, single chip): run the encoder stack as
    ONE resident Pallas kernel (ops/pallas/serve.py) instead of ~24
    kernels.  Measured: parity with the per-kernel path at batch 1
    (0.462 vs 0.453 ms DeiT-S, within variance), slower at b8 — per-kernel
    launches inside one XLA program cost ~nothing on this hardware, so it
    stays opt-in (docs/PERF_ANALYSIS.md "Batch-1 serving anatomy").
    Batches above the resident kernel's scoped-VMEM capacity chunk
    through it in micro-batches of 8 (forward_q_int_serve)."""

    def __init__(self, ip, spec, cfg, is_swin, mesh=None,
                 input_norm=(IMAGENET_MEAN, IMAGENET_STD), resident=False,
                 microbatch=None):
        if is_swin:
            from .models import swin_int as int_mod
        else:
            from .models import vit_int as int_mod
        if mesh is not None:  # both families hit the same megatron rules
            ip = mesh_mod.shard_int_params(mesh, ip)
        self.ip, self.spec, self.cfg, self.mesh = ip, spec, cfg, mesh
        self.is_swin = is_swin
        self.input_norm = tuple(input_norm)
        self._lut = None
        mean, std = input_norm
        prep = partial(device_normalize, mean=mean, std=std)
        if mesh is not None and mesh.shape.get("pp", 1) > 1:
            if is_swin or resident:
                raise ValueError("pipeline parallelism supports the ViT "
                                 "family, per-kernel path")
            if microbatch:
                raise ValueError("microbatch is a single-chip serving knob")
            self._fwd = _pp_int_forward(ip, spec, cfg, mesh, prep)
            return
        # single-chip serving: chain-token the dispatch stream (exact-zero
        # token, bit-identical logits — utils/dispatch.ChainedDispatch)
        from .utils.dispatch import ChainedDispatch

        if resident:
            if is_swin or mesh is not None:
                raise ValueError("resident serving kernel supports the "
                                 "ViT family on a single chip")
            from .ops.pallas.serve import prepare_resident

            packed = prepare_resident(ip, spec, cfg)
            fwd = lambda xf: int_mod.forward_q_int_serve(
                ip, spec, cfg, xf, packed=packed)
        elif mesh is None:
            fwd = lambda xf: int_mod.forward_q_int(ip, spec, cfg, xf)
        else:
            if microbatch:
                raise ValueError("microbatch is a single-chip serving knob")
            self._fwd = jax.jit(
                lambda x: int_mod.forward_q_int(ip, spec, cfg, prep(x)))
            return
        if microbatch:
            fwd = _microbatched(fwd, int(microbatch))
        self._fwd = ChainedDispatch(prep, fwd)

    @property
    def input_lut(self):
        """(3, 256) int8 table for the CODES WIRE: encode uint8 crops
        host-side (data/imagenet.encode_input / CodesLoader) and feed the
        int8 result straight to ``__call__`` — bit-identical logits with
        zero on-device ingest cost (the u8 wire's device LUT normalize is
        a giant gather, ~322 ms/step at b256 on the round-5 backend —
        docs/PERF_ANALYSIS.md round-5 correction)."""
        if self._lut is None:
            from .data.imagenet import input_code_lut

            if not self.spec.input_quant:
                raise ValueError("codes wire requires input_quant=True; "
                                 "this model takes unquantized f32 input")
            if self.is_swin:
                qp = self.ip["qp"]
                scale, zp = qp["qact_input.scale"], qp["qact_input.zp"]
            else:
                site = self.ip["qact_input"]
                scale, zp = site["scale"], site["zp"]
            bt = self.cfg.bit_a
            mean, std = self.input_norm
            self._lut = input_code_lut(
                np.asarray(scale), np.asarray(zp), mean=mean, std=std,
                qmin=bt.lower_bound, qmax=bt.upper_bound)
        return self._lut

    def encode(self, x):
        """uint8 NCHW batch -> int8 input codes (host-side numpy)."""
        from .data.imagenet import encode_input

        return encode_input(x, self.input_lut)

    def __call__(self, x, bit_config=None, quant=True, use_int=True):
        # (bit_config is baked into the artifact; the extra kwargs make
        # IntModel a drop-in for validate()'s model argument)
        x = jnp.asarray(x)
        pad = 0
        if self.mesh is not None:
            x, pad = _dp_pad(x, self.mesh)
            x = jax.device_put(x, mesh_mod.batch_sharding(self.mesh))
        out = self._fwd(x)
        return out[:out.shape[0] - pad] if pad else out


def load_int_model(path, mesh=None,
                   input_norm=(IMAGENET_MEAN, IMAGENET_STD),
                   resident=False, microbatch=None) -> IntModel:
    """Load a save_int_model artifact into a servable IntModel.  The spec
    is reconstructed from the embedded dataclass fields (so custom specs
    round-trip, not just registry names)."""
    from .utils.serialize import ArtifactError, load_pytree

    ip, meta = load_pytree(path)
    if not all(k in meta for k in ("model", "spec", "cfg", "is_swin")):
        raise ArtifactError(
            f"{path}: a save_pytree artifact, but not an int-model export "
            f"(meta keys {sorted(meta)}; expected model/spec/cfg/is_swin)")
    sd = dict(meta["spec"])
    if meta["is_swin"]:
        from .models.swin import SwinSpec

        for k in ("depths", "num_heads"):  # JSON turns tuples into lists
            sd[k] = tuple(sd[k])
        spec = SwinSpec(**sd)
    else:
        spec = vit_mod.ViTSpec(**sd)
    cfg = QuantConfig.from_dict(meta["cfg"])
    return IntModel(ip, spec, cfg, meta["is_swin"], mesh=mesh,
                    input_norm=input_norm, resident=resident,
                    microbatch=microbatch)


def validate_bits(model: QuantizedViT, loader, configs, log=print):
    """One pass over ``loader`` evaluating EVERY config in ``configs``
    (list of {4,8} bit_config lists) simultaneously via the bit-traced
    vmapped forward.  Returns a list of top-1 precisions, candidate order
    preserved.  This replaces len(configs) sequential validate() epochs in
    the mixed-precision search — the wall-clock dominator of --mixed."""
    configs = [list(c) for c in configs]
    if not configs:
        return []
    bits = np.asarray(configs, np.int32)
    correct = np.zeros(len(configs), np.int64)
    total = 0
    pending = None  # dispatch-pipelined like validate()
    for data, target in loader:
        logits_dev = model.forward_bits(data, bits)
        if pending is not None:
            logits, tgt = np.asarray(pending[0]), pending[1]
            correct += (logits.argmax(-1) == tgt[None, :]).sum(1)
            total += len(tgt)
        pending = (logits_dev, np.asarray(target))
    if pending is not None:
        logits, tgt = np.asarray(pending[0]), pending[1]
        correct += (logits.argmax(-1) == tgt[None, :]).sum(1)
        total += len(tgt)
    prec1 = 100.0 * correct / max(total, 1)
    log(f"validate_bits: {len(configs)} configs x {total} images")
    return [float(p) for p in prec1]


def validate_bits_int(model: QuantizedViT, loader, configs, log=print):
    """validate_bits on the INTEGER execution path: per-candidate chained
    evals over device-resident batches (each batch crosses the tunnel
    once, then serves every candidate).  ~2.1x the vmapped fake path per
    candidate-image on this chip; candidate order preserved.  Top-1s can
    differ from validate_bits on knife-edge logits (int vs fake paths
    agree to rtol 2e-4, tests/test_int_path.py) — the reference-parity
    search keeps the fake path (CLI --search-path fake, the default)."""
    configs = [list(c) for c in configs]
    if not configs:
        return []
    bits_dev = [jnp.asarray(c, jnp.int32) for c in configs]
    correct = np.zeros(len(configs), np.int64)
    total = 0
    pending = None  # dispatch-pipelined: drain one step behind
    for data, target in loader:
        xd = jax.device_put(jnp.asarray(data))
        tgt = np.asarray(target)
        total += len(tgt)
        for ci, b in enumerate(bits_dev):
            logits_dev = model.forward_bits_int(xd, b)
            if pending is not None:
                pci, pl, pt = pending
                correct[pci] += int((np.asarray(pl).argmax(-1) == pt).sum())
            pending = (ci, logits_dev, tgt)
    if pending is not None:
        pci, pl, pt = pending
        correct[pci] += int((np.asarray(pl).argmax(-1) == pt).sum())
    prec1 = 100.0 * correct / max(total, 1)
    log(f"validate_bits_int: {len(configs)} configs x {total} images")
    return [float(p) for p in prec1]


def validate(model: QuantizedViT, loader, bit_config=None, quant=True,
             print_freq=100, log=print, use_int=False):
    """Full validation epoch with the reference's progress/report format
    (test_quant.py:418-466).  Returns (loss_avg, prec1_avg, prec5_avg).
    use_int: run the real-integer MXU path instead of fake-quant.

    Dispatch-pipelined: batch i+1's forward is issued BEFORE blocking on
    batch i's logits, so the dispatch round-trip (~0.7 s through the axon
    tunnel) and the host loader overlap with device compute — wall-clock ≈
    max(host, device) instead of their sum.  Per-batch metric/report
    semantics are unchanged (each batch still scored in order)."""
    batch_time, losses = AverageMeter(), AverageMeter()
    top1, top5 = AverageMeter(), AverageMeter()
    val_start = end = time.time()
    n_batches = len(loader) if hasattr(loader, "__len__") else None

    def score(i, output_dev, target):
        nonlocal end
        output = np.asarray(output_dev)  # blocks until the device is done
        loss = cross_entropy(output, target)
        prec1, prec5 = accuracy(output, target, topk=(1, 5))
        n = len(target)
        losses.update(loss, n)
        top1.update(prec1, n)
        top5.update(prec5, n)
        batch_time.update(time.time() - end)
        end = time.time()
        if print_freq and i % print_freq == 0:
            log("Test: [{0}/{1}]\t"
                "Time {bt.val:.3f} ({bt.avg:.3f})\t"
                "Loss {loss.val:.4f} ({loss.avg:.4f})\t"
                "Prec@1 {top1.val:.3f} ({top1.avg:.3f})\t"
                "Prec@5 {top5.val:.3f} ({top5.avg:.3f})".format(
                    i, n_batches if n_batches is not None else "?",
                    bt=batch_time, loss=losses, top1=top1, top5=top5))

    pending = None  # (index, async device output, target)
    for i, (data, target) in enumerate(loader):
        output_dev = model(data, bit_config=bit_config, quant=quant,
                           use_int=use_int)  # async dispatch
        if pending is not None:
            score(*pending)
        pending = (i, output_dev, target)
    if pending is not None:
        score(*pending)
    log(" * Prec@1 {top1.avg:.3f} Prec@5 {top5.avg:.3f} Time {t:.3f}".format(
        top1=top1, top5=top5, t=time.time() - val_start))
    return losses.avg, top1.avg, top5.avg
