"""Codes wire on the real chip: host-fed eval without the u8 ingest gather.

Legs (deit_small int4, b256, token-chained fresh pre-put buffers):
  A  u8 wire   (device LUT normalize; known ~355 ms/step = 722 img/s)
  B  codes wire (int8 qact_input codes encoded host-side)
  C  f32 carry-threaded loop (chip floor, ~33 ms/step)
Plus the host-side encode cost (numpy LUT fancy-index, 1 core).

Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/ab_codes_wire.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402

import bench  # noqa: E402


def main(steps=8, batch=256):
    import jax
    import jax.numpy as jnp

    from diffvit_tpu.config import QuantConfig
    from diffvit_tpu.data.imagenet import (device_normalize, encode_input,
                                           input_code_lut)
    from diffvit_tpu.models import vit, vit_int

    spec = vit.VIT_SPECS["deit_small"]
    cfg = QuantConfig()

    def build():
        params = vit.init_params(spec, jax.random.PRNGKey(0))
        qp = bench._synth_qp(
            lambda p, b: vit.calibrate(p, spec, cfg, b), params)
        return vit_int.prepare_int(params, qp, spec, cfg,
                                   (4,) * vit.num_bit_slots(spec))

    print("setup (cpu-side)...", flush=True)
    ip = bench._setup_on_cpu(build)
    bt = cfg.bit_a
    lut = input_code_lut(np.asarray(ip["qact_input"]["scale"]),
                         np.asarray(ip["qact_input"]["zp"]),
                         qmin=bt.lower_bound, qmax=bt.upper_bound)

    @jax.jit
    def step(x, tok):
        xf = device_normalize(x)
        if xf.dtype != jnp.int8:
            xf = xf + 0.0 * tok
        logits = vit_int.forward_q_int(ip, spec, cfg, xf)
        return logits, 1e-12 * jnp.nan_to_num(jnp.sum(logits))

    rng = np.random.default_rng(0)
    hosts = [rng.integers(0, 256, (batch, 3, 224, 224), dtype=np.uint8)
             for _ in range(steps)]

    # host-side encode cost
    t0 = time.perf_counter()
    codes = [encode_input(h, lut) for h in hosts]
    enc_ms = (time.perf_counter() - t0) / steps * 1e3
    print(f"host encode: {enc_ms:.1f} ms/batch ({batch/enc_ms*1e3:.0f} img/s "
          f"1-core)", flush=True)

    def put_all(bufs):
        t0 = time.perf_counter()
        xs = [jax.device_put(b) for b in bufs]
        for x in xs:
            x.block_until_ready()
        ms = (time.perf_counter() - t0) / steps * 1e3
        return xs, ms

    def chain(label, xs):
        tok = jnp.float32(0.0)
        l, tok = step(xs[0], tok)
        l.block_until_ready()
        tok = jnp.float32(0.0)
        outs = []
        t0 = time.perf_counter()
        for i in range(steps):
            l, tok = step(xs[i], tok)
            outs.append(l)
        for o in outs:
            o.block_until_ready()
        ms = (time.perf_counter() - t0) / steps * 1e3
        print(f"{label:28s} {ms:8.1f} ms/step ({batch/ms*1e3:7.0f} img/s)",
              flush=True)
        return np.asarray(outs[0])

    xs_u8, put_u8 = put_all(hosts)
    print(f"u8 put: {put_u8:.0f} ms/batch", flush=True)
    la = chain("A u8 wire", xs_u8)
    xs_c, put_c = put_all(codes)
    print(f"codes put: {put_c:.0f} ms/batch", flush=True)
    lb = chain("B codes wire", xs_c)
    print("A/B logits bit-identical:", np.array_equal(la, lb), flush=True)

    @jax.jit
    def carry_step(x):
        logits = vit_int.forward_q_int(ip, spec, cfg, x)
        return x * (1.0 + 1e-12 * jnp.sum(logits))

    c = jnp.asarray(rng.standard_normal((batch, 3, 224, 224)), jnp.float32)
    c = carry_step(c)
    c.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(steps):
        c = carry_step(c)
    c.block_until_ready()
    ms = (time.perf_counter() - t0) / steps * 1e3
    print(f"{'C f32 carry (chip floor)':28s} {ms:8.1f} ms/step "
          f"({batch/ms*1e3:7.0f} img/s)", flush=True)


if __name__ == "__main__":
    main()
