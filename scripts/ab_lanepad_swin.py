"""A/B probe: Swin stage-0 lane padding (VERDICT r3 item 6).

Hypothesis under test: stage-0's C=96 (and stage-1's C=192) linears leave
MXU throughput on the table because K/N are not multiples of the 128-lane
width, and XLA's handling of the ragged lane dim is worse than an explicit
zero-pad to the next multiple (pad at the matmul boundary only, slice the
output back — bit-identical, see swin_int.forward_q_int(lane_pad=...)).

Measures swin_tiny int8 b128 chained throughput with lane_pad off vs on,
plus a correctness check (outputs must be bit-identical).  Record the
keep/reject row in docs/PERF_ANALYSIS.md "Swin stage-0 anatomy".

Run on the real chip:  PYTHONPATH=/root/.axon_site:/root/repo \
    python scripts/ab_lanepad_swin.py
"""
import sys

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402

import bench  # noqa: E402


def main(batch=128, steps=10):
    import jax
    import jax.numpy as jnp

    from diffvit_tpu.config import QuantConfig
    from diffvit_tpu.models import swin, swin_int

    spec = swin.SWIN_SPECS["swin_tiny"]
    cfg = QuantConfig()
    params = swin.init_swin_params(spec, jax.random.PRNGKey(0))
    qp = bench._synth_qp(lambda p, b: swin.calibrate(p, spec, cfg, b),
                         params)
    ip = swin_int.prepare_int(params, qp, spec, cfg, 8)

    # correctness first: lane_pad must be bit-identical
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((8, 3, 224, 224)), jnp.float32)
    y0 = np.asarray(swin_int.forward_q_int(ip, spec, cfg, x))
    y1 = np.asarray(swin_int.forward_q_int(ip, spec, cfg, x,
                                           lane_pad=True))
    np.testing.assert_array_equal(y0, y1)
    print("bit-identical: OK", flush=True)

    for name, lp in (("baseline", False), ("lane_pad", True)):
        run = lambda t: swin_int.forward_q_int(ip, spec, cfg, t,
                                               lane_pad=lp)
        r = bench._chained_throughput(run, batch, steps)
        print(f"{name}: {r:.1f} img/s (b{batch}, {steps} chained steps)",
              flush=True)


if __name__ == "__main__":
    main()
