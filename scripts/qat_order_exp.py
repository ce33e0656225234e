"""Characterize recovery-pass composition: QAT after AdaRound diverges at
the default lr — find the lr where the composition helps, and compare
against QAT-from-nearest.  (Run on the real chip; ~20 min.)

Context (recovery-cost probe, deit_small int4, Gaussian b32 calib):
  nearest                      rel err 0.4926
  adaround 500                 rel err 0.1603
  adaround 500 + qat lr=1e-5   rel err 0.2054  <- DIVERGED (loss 3.1e-3 -> 5.1e-3)
  qat-from-nearest lr=1e-5     rel err 0.1145
  qat-from-nearest lr=3e-6     rel err 0.1526

Hypothesis: AdaRound's learned codes live on rounding boundaries by
construction (latents at nearest-round recovery points); Adam steps at
lr=1e-5 flip codes wholesale and destroy the learned rounding.  A lower
lr should preserve the codes while trimming the residual error.
"""
import time

import jax
import jax.numpy as jnp

from diffvit_tpu.engine import QuantizedViT
from diffvit_tpu.models import vit


def main():
    name = "deit_small"
    eng = QuantizedViT(name)
    spec, cfg = eng.spec, eng.cfg
    nslots = vit.num_bit_slots(spec)
    bc = (4,) * nslots
    key = jax.random.PRNGKey(0)
    calib = jax.random.normal(key, (32, 3, 224, 224))
    evalb = jax.random.normal(jax.random.PRNGKey(7), (32, 3, 224, 224))

    t0 = time.time()
    eng.calibrate(calib)
    print(f"calibrate: {time.time()-t0:.1f}s", flush=True)

    fwd_fp = jax.jit(lambda p, x: vit.forward_fp(p, spec, x))
    fwd_q = jax.jit(lambda p, x: vit.forward_q(p, eng.qparams, spec, cfg, x, bc))
    fp_c, fp_e = fwd_fp(eng.fp_params, calib), fwd_fp(eng.fp_params, evalb)

    def rel(p):
        rc = jnp.linalg.norm(fwd_q(p, calib) - fp_c) / jnp.linalg.norm(fp_c)
        re = jnp.linalg.norm(fwd_q(p, evalb) - fp_e) / jnp.linalg.norm(fp_e)
        return float(rc), float(re)

    nearest = eng.params
    rc, re = rel(nearest)
    print(f"nearest: calib {rc:.4f} eval {re:.4f}", flush=True)

    t0 = time.time()
    eng.adaround(calib, bc, steps=500)
    ada = eng.params
    rc, re = rel(ada)
    print(f"adaround 500: {time.time()-t0:.0f}s  calib {rc:.4f} eval {re:.4f}",
          flush=True)

    for lr in (3e-6, 1e-6):
        eng.params = ada
        t0 = time.time()
        losses = eng.qat(calib, bc, steps=100, lr=lr)
        rc, re = rel(eng.params)
        print(f"ada+qat lr={lr:g}: {time.time()-t0:.0f}s  loss "
              f"{losses[0]:.3e}->{losses[-1]:.3e}  calib {rc:.4f} "
              f"eval {re:.4f}", flush=True)

    # does longer QAT-from-nearest keep improving?
    eng.params = nearest
    t0 = time.time()
    losses = eng.qat(calib, bc, steps=300, lr=1e-5)
    qat_n = eng.params
    rc, re = rel(qat_n)
    print(f"nearest+qat lr=1e-5 x300: {time.time()-t0:.0f}s  loss "
          f"{losses[0]:.3e}->{losses[-1]:.3e}  calib {rc:.4f} eval {re:.4f}",
          flush=True)

    # bias correction on top of the best arm
    t0 = time.time()
    eng.bias_correct(calib, bc)
    rc, re = rel(eng.params)
    print(f"  +bias_corr: {time.time()-t0:.0f}s  calib {rc:.4f} "
          f"eval {re:.4f}", flush=True)


if __name__ == "__main__":
    main()
