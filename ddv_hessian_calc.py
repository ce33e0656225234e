#!/usr/bin/env python
"""DDV-Hessian sensitivity CLI.

Rebuild of /root/reference/ddv_hessian_calc_test.py: generate PGD
adversarial inputs against the float model, accumulate per-layer DDV-Hessian
traces over N batches, and print the per-batch min-max-normalized mean
trace (the corrected ``mean_hessian = []`` form, ddv_hessian_calc_test.py:221).
"""
from __future__ import annotations

import argparse
import os

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(description="DDV-Hessian sensitivity")
    p.add_argument("model", nargs="?", default="deit_small")
    p.add_argument("data", nargs="?", default="/home/ubuntu/imagenet")
    p.add_argument("--quant-method", default="minmax")
    p.add_argument("--calib-batchsize", default=5, type=int)
    p.add_argument("--num-workers", default=8, type=int)
    p.add_argument("--batch-num", default=10, type=int)
    p.add_argument("--layer-index", default=30, type=int,
                   help="single activation tap to diff (reference's "
                        "selectedIndex=30)")
    p.add_argument("--max-iter", default=100, type=int)
    p.add_argument("--device", default="tpu")
    p.add_argument("--seed", default=0, type=int)
    p.add_argument("--checkpoint", default=None)
    args = p.parse_args(argv)

    if args.device and args.device != "tpu":
        import jax

        jax.config.update("jax_platforms", args.device)
    import jax

    from diffvit_tpu.analysis.ddv_hessian import DDVHessian
    from diffvit_tpu.analysis.pgd import AttackPGD
    from diffvit_tpu.config import QuantConfig
    from diffvit_tpu.data.imagenet import DataLoader, ImageFolder, build_transform
    from diffvit_tpu.engine import QuantizedViT
    from diffvit_tpu.models.registry import preprocessing_for

    cfg = QuantConfig(quant_method=args.quant_method)
    # both models run the float path, as in the committed reference driver
    model = QuantizedViT(args.model, cfg, checkpoint=args.checkpoint,
                         seed=args.seed)
    q_model = QuantizedViT(args.model, cfg, checkpoint=args.checkpoint,
                           seed=args.seed)
    attack = AttackPGD(model, epsilon=0.06, step_size=0.01, num_steps=50,
                       quant=False)

    pp = preprocessing_for(args.model)
    tf = build_transform(mean=pp.mean, std=pp.std, crop_pct=pp.crop_pct)
    ds = ImageFolder(os.path.join(args.data, "train"), tf)
    dl = DataLoader(ds, args.calib_batchsize, shuffle=True,
                    num_workers=args.num_workers, drop_last=True,
                    seed=args.seed)

    key = jax.random.PRNGKey(args.seed)
    trace_list = []
    names = None
    print("Calculating the sensitivities via the averaged Hessian trace...")
    for bi, (inputs, labels) in enumerate(dl):
        if bi >= args.batch_num:
            break
        key, k1, k2 = jax.random.split(key, 3)
        adv = attack.gen_adv_inputs(inputs, labels, k1)
        ddvh = DDVHessian(model, q_model, (inputs, labels), adv,
                          layer_indices=args.layer_index,
                          max_iter=args.max_iter)
        names, traces = ddvh.trace(key=k2)
        trace_list.append(traces)
        print(f"batch {bi}: done")

    normalized = []
    for traces in trace_list:
        t = np.abs(np.asarray(traces))
        lo, hi = t.min(), t.max()
        normalized.append((t - lo) / (hi - lo) if hi > lo else t * 0)
    mean_hessian = np.stack(normalized).mean(axis=0).tolist()
    print(names)
    print("\n***Trace: ", mean_hessian)


if __name__ == "__main__":
    main()
