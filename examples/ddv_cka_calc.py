#!/usr/bin/env python
"""Adversarial DDV-CKA comparison between a float and a quantized model.

Script equivalent of the reference's ddv_cka_calc.ipynb driver: calibrate an
int4 model, run compute_cka_with_adversarial (PGD inputs against the float
model), pickle the heatmap, and emit the qkv/proj/fc1/fc2 sub-maps +
diagonal plots (plot.py:71-166).
"""
from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import os


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("model", nargs="?", default="deit_small")
    p.add_argument("data", nargs="?", default="/home/ubuntu/imagenet")
    p.add_argument("--cka-batch", default=50, type=int)
    p.add_argument("--cka-iter", default=10, type=int)
    p.add_argument("--cka-batch-iter", default=10, type=int)
    p.add_argument("--calib-batchsize", default=50, type=int)
    p.add_argument("--num-workers", default=8, type=int)
    p.add_argument("--result-name", default="cka_with_adversarial_int4")
    p.add_argument("--base-dir", default="ddv_cka_score")
    p.add_argument("--device", default="tpu")
    p.add_argument("--seed", default=0, type=int)
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--pgd-steps", default=50, type=int)
    args = p.parse_args(argv)

    if args.device and args.device != "tpu":
        import jax

        jax.config.update("jax_platforms", args.device)

    from diffvit_tpu.analysis.cka_drivers import compute_cka_with_adversarial
    from diffvit_tpu.analysis.plotting import load_and_plot_diagonal, plot_cka_map
    from diffvit_tpu.config import QuantConfig
    from diffvit_tpu.data.imagenet import DataLoader, ImageFolder, build_transform
    from diffvit_tpu.engine import QuantizedViT
    from diffvit_tpu.models import vit as vit_mod
    from diffvit_tpu.models.registry import preprocessing_for

    cfg = QuantConfig()
    fp_model = QuantizedViT(args.model, cfg, checkpoint=args.checkpoint,
                            seed=args.seed)
    q_model = QuantizedViT(args.model, cfg, checkpoint=args.checkpoint,
                           seed=args.seed)

    pp = preprocessing_for(args.model)
    tf = build_transform(mean=pp.mean, std=pp.std, crop_pct=pp.crop_pct)
    train_ds = ImageFolder(os.path.join(args.data, "train"), tf)

    # ONE loader shared by every factory call: its per-epoch shuffle state
    # advances, so each cka_iter iteration consumes a distinct shuffle —
    # the reference's repeated get_dataset calls draw fresh shuffles too
    # (dataset_utility.py:45-80)
    dl = DataLoader(train_ds, args.cka_batch, shuffle=True,
                    num_workers=args.num_workers, drop_last=True,
                    seed=args.seed)

    def batches():
        return iter(dl)

    q_model.calibrate(next(batches())[0])

    # both models use the 50-tap conv/linear set (a non-None bit_config on
    # the float model selects it; -1 keeps every layer in FP) so the heatmap
    # is square and sliceable by plot_cka_map
    q_bits = (cfg.bit_w.bits,) * vit_mod.num_bit_slots(q_model.spec)
    fp_bits = (-1,) * vit_mod.num_bit_slots(fp_model.spec)
    out_dir = os.path.join(args.base_dir, args.result_name)
    compute_cka_with_adversarial(
        fp_model, q_model, batches,
        model1_bit_config=fp_bits, model2_bit_config=q_bits,
        cka_iter=args.cka_iter, cka_batch_iter=args.cka_batch_iter,
        pgd_steps=args.pgd_steps, result_name=out_dir)
    plot_cka_map(args.result_name, args.result_name, args.base_dir,
                 depth=q_model.spec.depth)
    diag = load_and_plot_diagonal(
        os.path.join(out_dir, args.result_name + "_heatmap.pkl"))
    print("diagonal_values:", list(map(float, diag)))


if __name__ == "__main__":
    main()
