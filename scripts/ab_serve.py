#!/usr/bin/env python
"""A/B the resident whole-model serving kernel vs the per-kernel integer
path at serving batch sizes (DeiT-S).  Timing goes through
bench._chained_throughput — the single source of truth for the chained
methodology (host-dispatched by default; --fori uses device-side
lax.fori_loop chaining, which sub-millisecond rows need because
host-dispatched steps are enqueue/tunnel-bound on this rig)."""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _chained_throughput, _synth_qp  # noqa: E402


def main():
    import jax

    from diffvit_tpu.config import QuantConfig
    from diffvit_tpu.models import vit, vit_int
    from diffvit_tpu.ops.pallas.serve import prepare_resident

    model = sys.argv[1] if len(sys.argv) > 1 else "deit_small"
    spec = vit.VIT_SPECS[model]
    cfg = QuantConfig()
    params = vit.init_params(spec, jax.random.PRNGKey(0))
    qp = _synth_qp(lambda p, b: vit.calibrate(p, spec, cfg, b), params)
    bc = (4,) * vit.num_bit_slots(spec)
    ip = vit_int.prepare_int(params, qp, spec, cfg, bc)
    packed = prepare_resident(ip, spec, cfg)

    device_chain = "--fori" in sys.argv

    def time_s(run, b):
        steps = 100 if device_chain else 30
        return b / _chained_throughput(run, b, steps=steps,
                                       device_chain=device_chain)

    for b in (1, 8):
        t_prod = time_s(lambda x: vit_int.forward_q_int(ip, spec, cfg, x), b)
        t_serve = time_s(lambda x: vit_int.forward_q_int_serve(
            ip, spec, cfg, x, packed=packed), b)
        print(f"b{b:<3d} production {t_prod*1e3:7.3f} ms ({b/t_prod:7.0f} "
              f"img/s)   resident {t_serve*1e3:7.3f} ms ({b/t_serve:7.0f} "
              f"img/s)   {t_prod/t_serve:5.2f}x", flush=True)


if __name__ == "__main__":
    main()
