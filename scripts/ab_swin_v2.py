"""A/B: Swin fused window-attention kernel v1 (pre-transposed qkv) vs v2
(natural-layout lane-offset DMA blocks) — VERDICT r4 item 3, stage-0 fence
glue attack.

Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/ab_swin_v2.py
"""
import sys

sys.path.insert(0, "/root/repo")

import bench  # noqa: E402


def main():
    import jax

    from diffvit_tpu.config import QuantConfig
    from diffvit_tpu.models import swin, swin_int

    for model, batch in (("swin_tiny", 128), ("swin_small", 96),
                         ("swin_base", 48)):
        spec = swin.SWIN_SPECS[model]
        cfg = QuantConfig()
        def build():
            params = swin.init_swin_params(spec, jax.random.PRNGKey(0))
            qp = bench._synth_qp(
                lambda p, b: swin.calibrate(p, spec, cfg, b), params)
            return swin_int.prepare_int(params, qp, spec, cfg, 8)

        ip = bench._setup_on_cpu(build)
        for name, kw in (("v1p", {}), ("v2", {"attn_v2": True})):
            run = lambda x: swin_int.forward_q_int(ip, spec, cfg, x, **kw)
            r = bench._chained_throughput(run, batch, steps=10)
            print(f"{model} int8 b{batch} {name}: {r:8.1f} img/s "
                  f"({batch / r * 1e3:6.2f} ms/step)", flush=True)


if __name__ == "__main__":
    main()
