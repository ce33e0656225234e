#!/usr/bin/env python
"""Quantized ViT/DeiT/Swin ImageNet evaluation CLI.

TPU-native rebuild of /root/reference/test_quant.py with the same public
interface: both the README's positional form (``test_quant.py deit_small
<data-dir> --quant ...``) and the argparse flag form (``--model --data``,
test_quant.py:20-21; SURVEY.md §2.3 ⚠️4), identical Prec@1/Prec@5 report
format, and the same pipeline stages: optional Hessian sensitivity, one-batch
calibration (real / Gaussian / synthesized data), Pareto + evolutionary
mixed-precision search, or plain all-4-bit evaluation.
"""
from __future__ import annotations

import argparse
import os
import random

import numpy as np


def build_parser():
    p = argparse.ArgumentParser(description="P2-ViT on TPU (diffvit_tpu)")
    p.add_argument("model_pos", nargs="?", default=None,
                   help="model name (positional form)")
    p.add_argument("data_pos", nargs="?", default=None,
                   help="ImageNet dir (positional form)")
    p.add_argument("--model", default="deit_tiny")
    p.add_argument("--data", default="/home/ubuntu/imagenet")
    p.add_argument("--quant", default=False, action="store_true")
    p.add_argument("--ptf", default=True, type=lambda s: s not in ("False", "false", "0"))
    p.add_argument("--lis", default=True, type=lambda s: s not in ("False", "false", "0"))
    p.add_argument("--quant-method", default="minmax",
                   choices=["minmax", "ema", "omse", "percentile"])
    p.add_argument("--mixed", default=False, action="store_true")
    p.add_argument("--calib-batchsize", default=50, type=int)
    p.add_argument("--mode", default=0, type=int,
                   help="calibration data: 0 real, 1 Gaussian noise, 2 generated")
    p.add_argument("--calib-iter", default=6, type=int)
    p.add_argument("--val-batchsize", default=50, type=int)
    p.add_argument("--num-workers", default=16, type=int)
    p.add_argument("--device", default="tpu", help="jax platform (tpu/cpu)")
    p.add_argument("--print-freq", default=100, type=int)
    p.add_argument("--seed", default=0, type=int)
    p.add_argument("--checkpoint", default=None,
                   help="local .pth/.npz weights (no-network environment)")
    p.add_argument("--prior-checkpoint", default=None,
                   help="mode-2 PSAQ-ViT prior weights (.pth/.npz) — the "
                        "reference's timm-pretrained prior role "
                        "(utils/build_model.py); defaults to the model's "
                        "own FP weights when absent")
    p.add_argument("--dp", default=None, type=int,
                   help="data-parallel mesh size (defaults to all devices "
                        "when >1 device is visible; 1 disables)")
    p.add_argument("--tp", default=1, type=int,
                   help="tensor-parallel mesh size (megatron shardings)")
    p.add_argument("--sp", default=1, type=int,
                   help="sequence-parallel mesh size: token-shard the "
                        "residual stream between blocks (ViT/DeiT "
                        "fake-quant path; parallel/mesh.act_constraint)")
    p.add_argument("--pp", default=1, type=int,
                   help="pipeline-parallel mesh size: GPipe microbatch "
                        "schedule over depth stages, int8-codes "
                        "stage-to-stage wire (ViT/DeiT integer path — "
                        "requires --int-path; parallel/pipeline.py)")
    p.add_argument("--host-devices", default=0, type=int,
                   help="create N virtual CPU devices for mesh testing "
                        "without N chips (the env-var forms of this knob "
                        "are broken in this JAX — see "
                        "__graft_entry__.dryrun_multichip); use with "
                        "--device cpu")
    p.add_argument("--adaround", default=False, action="store_true",
                   help="after calibration, learn per-weight up/down "
                        "rounding on the calibration batch (AdaRound; "
                        "beyond-the-reference, calib/adaround.py)")
    p.add_argument("--adaround-steps", default=1000, type=int,
                   help="Adam steps per weight site for --adaround")
    p.add_argument("--qat-steps", default=0, type=int,
                   help="if > 0, distillation-QAT steps after calibration: "
                        "fine-tune the latent weights through the "
                        "STE-threaded quantized forward toward the FP "
                        "teacher on the calibration batch(es) "
                        "(beyond-the-reference, calib/qat.py)")
    p.add_argument("--qat-remat", default=False, action="store_true",
                   help="checkpoint each block in the QAT train step "
                        "(jax.checkpoint full-recompute) so backward fits "
                        "HBM on the deep models; bit-identical trajectory")
    p.add_argument("--qat-lr", default=1e-5, type=float,
                   help="Adam learning rate for --qat-steps")
    p.add_argument("--bias-corr", default=False, action="store_true",
                   help="after calibration (and --adaround if given), "
                        "fold the empirical per-channel quantization mean "
                        "shift into each linear's bias (DFQ-style; "
                        "beyond-the-reference, calib/biascorr.py)")
    p.add_argument("--calib-multi-batch", default=False, action="store_true",
                   help="observe stats over --calib-iter batches and finalize "
                        "on the last (the reference's intended multi-batch "
                        "protocol; default replicates its active single-batch "
                        "path)")
    p.add_argument("--int-path", default=False, action="store_true",
                   help="run real int8 MXU execution instead of the "
                        "reference-style fake-quant simulation")
    p.add_argument("--wire", default="f32", choices=["f32", "u8"],
                   help="host->device wire format for eval batches: 'u8' "
                        "ships the uint8 crop (4x less H2D) and normalizes "
                        "on device — bit-identical model input "
                        "(data/imagenet.device_normalize); requires JPEG "
                        "val data (native loader)")
    p.add_argument("--device-prefetch", default=2, type=int,
                   metavar="DEPTH",
                   help="async H2D depth for the eval loader: a feeder "
                        "thread jax.device_puts batches as they decode so "
                        "the wire transfer overlaps decode and compute "
                        "(data/imagenet.DevicePrefetcher); 0 disables")
    p.add_argument("--native-preproc", default=False, action="store_true",
                   help="use the C++ preprocessing library (bit-exact vs the "
                        "PIL path; parallel batch assembly outside the GIL)")
    p.add_argument("--hessian-batches", default=10, type=int)
    p.add_argument("--hessian-iter", default=150, type=int)
    p.add_argument("--hessian-estimator", default="per-leaf",
                   choices=["per-leaf", "joint"],
                   help="Hutchinson trace estimator: 'per-leaf' matches the "
                        "reference's committed per-parameter HVP loop "
                        "(hessian.py:163-211); 'joint' probes all leaves in "
                        "one compiled HVP (same estimand, different "
                        "per-sample variance, ~49x fewer compiles)")
    p.add_argument("--evo-pop", default=25, type=int)
    p.add_argument("--evo-iter", default=8, type=int)
    p.add_argument("--evo-mutate", default=10, type=int)
    p.add_argument("--evo-crossover", default=10, type=int)
    p.add_argument("--pareto-top", default=5, type=int)
    p.add_argument("--size-factor", default=1.1, type=float,
                   help="model-size constraint multiplier vs all-4-bit "
                        "(test_quant.py:262)")
    p.add_argument("--omega-columns", default="committed",
                   choices=["committed", "intended"],
                   help="global_distance columns the omega ranking reads: "
                        "'committed' replicates the reference driver "
                        "(bit 4->col 0/uint3, 8->col 1/uint4, "
                        "test_quant.py:293-297 — an upstream indexing bug "
                        "the published results ran through); 'intended' "
                        "reads the true int4/int8 error columns")
    p.add_argument("--search-path", default="fake",
                   choices=["fake", "int"],
                   help="mixed-search eval substrate: 'fake' is the "
                        "reference-parity fake-quant forward (vmapped, "
                        "dp-shardable); 'int' runs candidates on the "
                        "integer execution path (~2.1x faster per "
                        "candidate-image, logits differ at rtol 2e-4 so "
                        "knife-edge rankings can diverge; ViT family, "
                        "single chip)")
    p.add_argument("--val-limit", default=None, type=int,
                   help="cap validation images (debug)")
    p.add_argument("--save-int", default=None, metavar="PATH",
                   help="after calibration, export the baked integer model "
                        "(int8 weight codes + requant scales, one .npz "
                        "deployment artifact; engine.save_int_model)")
    p.add_argument("--load-int", default=None, metavar="PATH",
                   help="serve a --save-int artifact: skip checkpoint "
                        "loading AND calibration, validate the integer "
                        "path directly (engine.load_int_model)")
    p.add_argument("--resident", action="store_true",
                   help="with --load-int (ViT family, single chip): serve "
                        "via the resident whole-encoder Pallas kernel "
                        "(ops/pallas/serve.py; measured ~parity with the "
                        "default path at batch 1, slower above — see "
                        "docs/PERF_ANALYSIS.md)")
    return p


def seed_everything(seed):
    os.environ["PYTHONHASHSEED"] = str(seed)
    random.seed(seed)
    np.random.seed(seed)


def main(argv=None):
    args = build_parser().parse_args(argv)
    if args.model_pos is not None:
        args.model = args.model_pos
    if args.data_pos is not None:
        args.data = args.data_pos
    seed_everything(args.seed)

    platforms = None
    if args.host_devices:
        # mirror __graft_entry__.dryrun_multichip: in this JAX the env-var
        # forms of these knobs initialize (or break) the backend at import,
        # so translate them to config updates BEFORE first device use
        import re
        flags = os.environ.get("XLA_FLAGS", "")
        cleaned = re.sub(r"--xla_force_host_platform_device_count=\d+", "",
                         flags)
        if cleaned != flags:
            os.environ["XLA_FLAGS"] = cleaned.strip()
        platforms = os.environ.pop("JAX_PLATFORMS", None)

    import jax

    # precedence: explicit --device beats the ambient JAX_PLATFORMS (this
    # rig exports JAX_PLATFORMS=axon for the TPU tunnel — popping it above
    # and re-applying it here would clobber --device cpu)
    if platforms:
        jax.config.update("jax_platforms", platforms)
    if args.device and args.device != "tpu":
        jax.config.update("jax_platforms", args.device)
    if args.host_devices:
        jax.config.update("jax_num_cpu_devices", args.host_devices)

    from diffvit_tpu.config import QuantConfig
    from diffvit_tpu.engine import QuantizedViT, validate, validate_bits
    from diffvit_tpu.data.imagenet import DataLoader, ImageFolder, build_transform
    from diffvit_tpu.data.synthetic import gaussian_calibration
    from diffvit_tpu.models.registry import preprocessing_for
    from diffvit_tpu.models import vit as vit_mod

    cfg = QuantConfig(ptf=args.ptf, lis=args.lis, quant_method=args.quant_method)
    print(f"Model: {args.model}")
    mesh = None
    n_dev = len(jax.devices())
    if args.pp > 1 and not (args.int_path or args.load_int):
        raise SystemExit("--pp pipelines the integer path; add --int-path "
                         "(or serve one with --load-int)")
    if args.dp is not None or args.tp != 1 or args.sp != 1 or args.pp != 1 \
            or n_dev > 1:
        from diffvit_tpu.parallel.mesh import make_mesh

        dp = args.dp if args.dp is not None else max(
            1, n_dev // (args.tp * args.sp * args.pp))
        if dp * args.tp * args.sp * args.pp > 1:
            mesh = make_mesh(dp * args.tp * args.sp * args.pp, dp=dp,
                             tp=args.tp, sp=args.sp, pp=args.pp)
            print(f"mesh: dp={dp} tp={args.tp}"
                  + (f" sp={args.sp}" if args.sp > 1 else "")
                  + (f" pp={args.pp}" if args.pp > 1 else ""))
    pp = preprocessing_for(args.model)
    if args.save_int and not args.quant:
        raise SystemExit("--save-int bakes a calibrated integer model; "
                         "it requires --quant")
    if args.save_int and args.load_int:
        raise SystemExit("--save-int and --load-int are mutually exclusive")
    if args.load_int:
        if args.mixed:
            raise SystemExit("--load-int serves one baked bit_config; "
                             "run --mixed with --save-int instead")
        from diffvit_tpu.engine import load_int_model

        model = load_int_model(args.load_int, mesh=mesh,
                               input_norm=(pp.mean, pp.std),
                               resident=args.resident)
        print(f"Serving int artifact: {args.load_int} "
              f"({model.spec.name})"
              + (" [resident kernel]" if args.resident else ""))
    else:
        model = QuantizedViT(args.model, cfg, checkpoint=args.checkpoint,
                             seed=args.seed, mesh=mesh,
                             input_norm=(pp.mean, pp.std))
    if args.native_preproc:
        from diffvit_tpu.data.native_preproc import build_native_transform

        transform = build_native_transform(mean=pp.mean, std=pp.std,
                                           crop_pct=pp.crop_pct)
    else:
        transform = build_transform(mean=pp.mean, std=pp.std,
                                    crop_pct=pp.crop_pct)

    valdir = os.path.join(args.data, "val")
    traindir = os.path.join(args.data, "train")
    val_dataset = ImageFolder(valdir, transform)
    if args.val_limit:
        val_dataset.samples = val_dataset.samples[: args.val_limit]
    if args.wire == "u8":
        if args.native_preproc:
            raise SystemExit("--wire u8 already decodes natively; "
                             "drop --native-preproc")
        from diffvit_tpu.data.imagenet import NativeJpegLoader

        val_loader = NativeJpegLoader(val_dataset, args.val_batchsize,
                                      emit="u8")
    else:
        val_loader = DataLoader(val_dataset, args.val_batchsize, shuffle=False,
                                num_workers=args.num_workers)
    if args.device_prefetch > 0:
        from diffvit_tpu.data.imagenet import DevicePrefetcher

        sharding = None
        if mesh is not None:
            from diffvit_tpu.parallel.mesh import batch_sharding

            sharding = batch_sharding(mesh)
        val_loader = DevicePrefetcher(val_loader,
                                      depth=args.device_prefetch,
                                      sharding=sharding)

    train_loader = None

    def train_batches(n, batch_size):
        # one shared loader per batch size: successive calls advance its
        # per-epoch shuffle (the reference's repeated loader iterations
        # reshuffle anew, dataset_utility.py:45-80)
        nonlocal train_loader
        if train_loader is None or train_loader.batch_size != batch_size:
            ds = ImageFolder(traindir, transform)
            train_loader = DataLoader(ds, batch_size, shuffle=True,
                                      num_workers=args.num_workers,
                                      drop_last=True, seed=args.seed)
        out = []
        for i, b in enumerate(train_loader):
            if i >= n:
                break
            out.append(b)
        return out

    mean_hessian = None
    if args.mixed:
        from diffvit_tpu.analysis.hessian import hessian_sensitivity

        print("Calculating the sensitivities via the averaged Hessian trace...")
        print(f"Hutchinson estimator: {args.hessian_estimator}")
        batches = train_batches(args.hessian_batches, args.calib_batchsize)
        mean_hessian = hessian_sensitivity(
            model.params, model.spec, batches, jax.random.PRNGKey(args.seed),
            max_iter=args.hessian_iter,
            joint=args.hessian_estimator == "joint")
        print("\n***Trace: ", mean_hessian)

    if args.quant and not args.load_int:
        if args.mode == 2:
            from diffvit_tpu.analysis.datagen import generate_data

            prior_params = None
            if args.prior_checkpoint:
                from diffvit_tpu.models.registry import build_params

                _, prior_params = build_params(args.model,
                                               args.prior_checkpoint,
                                               args.seed)
                print(f"PSAQ prior: {args.prior_checkpoint}")
            print("Generating data...")
            calib = generate_data(model.params, model.spec,
                                  batch_size=args.calib_batchsize,
                                  seed=args.seed, prior_params=prior_params)
            print("Calibrating with generated data...")
        elif args.mode == 1:
            print("Calibrating with Gaussian noise...")
            if args.calib_multi_batch:
                # --calib-iter distinct Gaussian batches: the recovery
                # passes (--adaround/--qat-steps/--bias-corr) overfit a
                # single batch (measured, scripts/qat_order_exp.py)
                calib = [gaussian_calibration(args.calib_batchsize,
                                              args.seed + i)
                         for i in range(args.calib_iter)]
            else:
                calib = gaussian_calibration(args.calib_batchsize, args.seed)
        else:
            print("Calibrating with real data...")
            if args.calib_multi_batch:
                calib = [b[0] for b in train_batches(args.calib_iter,
                                                     args.calib_batchsize)]
            else:
                calib = train_batches(1, args.calib_batchsize)[0][0]
        model.calibrate(calib)

        def reconstruct(bit_config=None):
            """--adaround / --bias-corr passes at ``bit_config`` (None ->
            the uniform default).  Under --mixed this runs AFTER the
            search at the winning config, so the reconstruction matches
            what actually ships."""
            nb = len(calib) if isinstance(calib, (list, tuple)) else 1
            if args.adaround:
                print(f"AdaRound reconstruction "
                      f"({args.adaround_steps} steps/site, "
                      f"{nb} calib batch{'es' if nb > 1 else ''})...")
                report = model.adaround(calib, bit_config,
                                        steps=args.adaround_steps,
                                        seed=args.seed)
                imps = [1.0 - after / before
                        for before, after in report.values() if before > 0]
                print(f"AdaRound: {len(report)} sites, mean site-MSE "
                      f"reduction {100.0 * float(np.mean(imps)):.1f}%")
            if args.qat_steps > 0:
                print(f"Distillation QAT ({args.qat_steps} steps, "
                      f"lr {args.qat_lr:g})...")
                losses = model.qat(calib, bit_config,
                                   steps=args.qat_steps, lr=args.qat_lr,
                                   remat=args.qat_remat)
                print(f"QAT: distill MSE {losses[0]:.3e} -> "
                      f"{losses[-1]:.3e}")
            if args.bias_corr:
                print("Bias correction (DFQ-style mean-shift fold)...")
                report = model.bias_correct(calib, bit_config)
                before = [b for b, _ in report.values()]
                after = [a for _, a in report.values()]
                print(f"Bias correction: {len(report)} sites, mean |shift| "
                      f"{float(np.mean(before)):.3e} -> "
                      f"{float(np.mean(after)):.3e}")

        if not args.mixed:
            reconstruct()
            if args.save_int:
                model.save_int_model(args.save_int)
                print(f"Saved int artifact: {args.save_int}")

    def evaluate(bit_config):
        print(bit_config)
        _, prec1, _ = validate(model, val_loader, tuple(bit_config),
                               quant=args.quant, print_freq=args.print_freq,
                               use_int=args.int_path)
        print("")
        return prec1

    if args.mixed:
        from diffvit_tpu.analysis import mixed_precision as mp

        flops = model.flops
        assert len(flops) - 1 == len(model.global_distance) == len(mean_hessian)
        print("Pareto Frontier.......")
        rng = random.Random(args.seed)
        groups = None
        if model.is_swin:
            from diffvit_tpu.models.swin import bit_slot_groups

            groups = bit_slot_groups(model.spec)
        bit_list = mp.sample_candidates(flops, rng, factor=args.size_factor,
                                        groups=groups)
        omega_list = mp.omega_rank(bit_list, flops, mean_hessian,
                                   model.global_distance,
                                   columns=args.omega_columns)
        print("Hessien-Based Validating...")
        for i in range(min(args.pareto_top, len(omega_list))):
            evaluate(omega_list[i][0])
        print("Start Evolutionary.......")
        # fake-quant search runs every candidate of a generation in ONE
        # vmapped, dp-sharded validation pass (engine.validate_bits; works
        # for ViT/DeiT AND the Swin mixed-precision extension);
        # --search-path int swaps in the integer execution path
        # (engine.validate_bits_int, ~2.1x per candidate-image);
        # --int-path search keeps the per-candidate integer executables
        evaluate_batch = None
        if args.search_path == "int":
            if model.is_swin or model.mesh is not None:
                print("--search-path int is ViT-family/single-chip; "
                      "falling back to the fake-quant search substrate")
            else:
                from diffvit_tpu.engine import validate_bits_int

                evaluate_batch = lambda cands: validate_bits_int(
                    model, val_loader, cands)
        if evaluate_batch is None and not args.int_path:
            evaluate_batch = lambda cands: validate_bits(
                model, val_loader, cands)
        result = mp.evolutionary_search(
            omega_list, flops, evaluate, rng=rng, pop_size=args.evo_pop,
            evo_iter=args.evo_iter, mutate_size=args.evo_mutate,
            crossover_size=args.evo_crossover, factor=args.size_factor,
            evaluate_batch=evaluate_batch)
        print("best:", result[0])
        if args.quant and not args.load_int:
            # reconstruction passes run AFTER the search, at the winning
            # config (the search itself ranks nearest-rounded candidates)
            reconstruct(tuple(result[0][0]))
        if args.save_int:
            # bake the SEARCHED best config, not the pre-search uniform one
            model.save_int_model(args.save_int, bit_config=result[0][0])
            print(f"Saved int artifact (mixed best): {args.save_int}")
    else:
        if not args.quant:
            bit_config = None
        elif model.is_swin:
            # Swin has no per-layer bit plumbing in the reference — one
            # uniform weight bit (swin_quant.py:813-817)
            bit_config = model.cfg.bit_w.bits
        else:
            bit_config = [model.cfg.bit_w.bits] * \
                vit_mod.num_bit_slots(model.spec)
        print(bit_config)
        validate(model, val_loader, bit_config, quant=args.quant,
                 print_freq=args.print_freq,
                 use_int=args.int_path and args.quant)


if __name__ == "__main__":
    main()
