"""Does multi-batch calibration close the recovery passes' held-out gap?

Follow-up to scripts/qat_order_exp.py, which measured single-batch QAT
overfit (calib rel-err 0.079 vs held-out 0.259) and AdaRound+QAT
divergence.  Here: deit_small int4, 4 distinct Gaussian calib batches vs
1, each arm evaluated on a held-out batch.  (Run on the real chip;
~25 min.)
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
    bc = (4,) * vit.num_bit_slots(spec)
    batches = [jax.random.normal(jax.random.PRNGKey(i), (32, 3, 224, 224))
               for i in range(4)]
    evalb = jax.random.normal(jax.random.PRNGKey(7), (32, 3, 224, 224))

    t0 = time.time()
    eng.calibrate(batches)  # multi-batch observe-then-finalize
    print(f"calibrate(4 batches): {time.time()-t0:.1f}s", flush=True)

    fwd_fp = jax.jit(lambda p, x: vit.forward_fp(p, spec, x))
    fwd_q = jax.jit(lambda p, x: vit.forward_q(p, eng.qparams, spec, cfg,
                                               x, bc))
    fp_e = fwd_fp(eng.fp_params, evalb)

    def ev(p):
        return float(jnp.linalg.norm(fwd_q(p, evalb) - fp_e)
                     / jnp.linalg.norm(fp_e))

    nearest = eng.params
    print(f"nearest: eval {ev(nearest):.4f}", flush=True)

    for nb in (1, 4):
        eng.params = nearest
        t0 = time.time()
        eng.adaround(batches[:nb], bc, steps=500)
        print(f"adaround500 x{nb} batch: {time.time()-t0:.0f}s  "
              f"eval {ev(eng.params):.4f}", flush=True)
        eng.bias_correct(batches[:nb], bc)
        print(f"  +bias_corr x{nb}: eval {ev(eng.params):.4f}", flush=True)

    for nb in (1, 4):
        eng.params = nearest
        t0 = time.time()
        losses = eng.qat(batches[:nb], bc, steps=300, lr=1e-5)
        print(f"qat300 lr=1e-5 x{nb} batch: {time.time()-t0:.0f}s  loss "
              f"{losses[0]:.3e}->{losses[-1]:.3e}  eval {ev(eng.params):.4f}",
              flush=True)


if __name__ == "__main__":
    main()
