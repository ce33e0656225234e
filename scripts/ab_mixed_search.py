#!/usr/bin/env python
"""A/B the mixed-precision evolutionary search: serial per-candidate
validate() epochs (each distinct config retraces the model) vs the batched
bit-traced path (one compile, every candidate of a generation in one
vmapped pass).  Scaled-down DeiT-S search on synthetic data, real chip."""
from __future__ import annotations

import os
import random
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    from diffvit_tpu.config import QuantConfig
    from diffvit_tpu.engine import QuantizedViT, validate, validate_bits
    from diffvit_tpu.analysis import mixed_precision as mp
    from diffvit_tpu.models import vit

    spec = vit.VIT_SPECS["deit_small"]
    cfg = QuantConfig()
    m = QuantizedViT(spec, cfg,
                     params=vit.init_params(spec, jax.random.PRNGKey(0)))
    rng = np.random.default_rng(0)
    m.calibrate(rng.standard_normal((8, 3, 224, 224)).astype("float32"))

    val = [(rng.standard_normal((64, 3, 224, 224)).astype("float32"),
            rng.integers(0, 1000, 64))
           for _ in range(2)]

    flops = m.flops
    nslots = vit.num_bit_slots(spec)
    gd = np.abs(rng.standard_normal((nslots - 1, 4)))
    hess = np.abs(rng.standard_normal(nslots - 1))
    cands = mp.sample_candidates(flops, random.Random(0))
    omega = mp.omega_rank(cands, flops, hess, gd)
    kw = dict(pop_size=6, evo_iter=2, mutate_size=4, crossover_size=4,
              log=lambda *_: None)

    def evaluate(c):
        _, p1, _ = validate(m, val, tuple(c), print_freq=0,
                            log=lambda *_: None)
        return p1

    t0 = time.perf_counter()
    r_b = mp.evolutionary_search(
        omega, flops, None, rng=random.Random(7),
        evaluate_batch=lambda cs: validate_bits(m, val, cs,
                                                log=lambda *_: None), **kw)
    t_batched = time.perf_counter() - t0
    print(f"batched search: {t_batched:7.1f} s")

    t0 = time.perf_counter()
    r_s = mp.evolutionary_search(omega, flops, evaluate,
                                 rng=random.Random(7), **kw)
    t_serial = time.perf_counter() - t0
    print(f"serial search : {t_serial:7.1f} s  (speedup {t_serial/t_batched:.1f}x)")
    same = [c for c, _ in r_s] == [c for c, _ in r_b]
    print(f"identical final populations: {same}")


if __name__ == "__main__":
    main()
