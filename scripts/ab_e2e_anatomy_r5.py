"""Single-core e2e split on the wire-bound tunnel regime (VERDICT r4
item 2): where does the JPEG-pipeline throughput go, component by
component, and which overlap structure is best TODAY?

Components at b64/b256 (native fast decode, photo500 fixtures, u8 wire):
  A decode-only loader drain (host)
  B device_put-only of decoded batches (tunnel put path)
  C dispatch-only, pre-put args, token-chained (tunnel execute path)
  D strict-serial decode -> put -> dispatch
  E DevicePrefetcher(depth) pipelines (the bench_pipeline structure)

Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/ab_e2e_anatomy_r5.py
"""
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import bench  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    from diffvit_tpu.config import QuantConfig
    from diffvit_tpu.data.imagenet import (DevicePrefetcher, ImageFolder,
                                           NativeJpegLoader, build_transform,
                                           device_normalize)
    from diffvit_tpu.data.synthetic import make_fake_imagefolder
    from diffvit_tpu.models import vit, vit_int
    from diffvit_tpu.utils.dispatch import ChainedDispatch

    spec = vit.VIT_SPECS["deit_small"]
    cfg = QuantConfig()

    def build():
        params = vit.init_params(spec, jax.random.PRNGKey(0))
        qp = bench._synth_qp(lambda p, b: vit.calibrate(p, spec, cfg, b),
                             params)
        return vit_int.prepare_int(params, qp, spec, cfg,
                                   (4,) * vit.num_bit_slots(spec))

    ip = bench._setup_on_cpu(build)

    with tempfile.TemporaryDirectory() as root:
        n_images = 1024
        make_fake_imagefolder(root, num_classes=8,
                              per_class=n_images // 8, size=(500, 375),
                              texture="photo")
        ds = ImageFolder(root, build_transform())

        for batch in (64, 256):
            loader = NativeJpegLoader(ds, batch_size=batch, drop_last=True,
                                      fast=True, emit="u8")
            fwd = ChainedDispatch(
                device_normalize,
                lambda xf: vit_int.forward_q_int(ip, spec, cfg, xf))
            fwd(jnp.zeros((batch, 3, 224, 224), jnp.uint8)) \
                .block_until_ready()

            # A decode-only
            host = []
            for _ in loader:
                pass  # warm page cache / native lib
            t0 = time.perf_counter()
            for imgs, _ in loader:
                host.append(imgs)
            ta = time.perf_counter() - t0
            n = sum(h.shape[0] for h in host)
            print(f"b{batch} A decode-only      : {n/ta:7.1f} img/s "
                  f"({ta/len(host)*1e3:6.1f} ms/batch)", flush=True)

            # B put-only
            d = jax.device_put(host[0])
            d.block_until_ready()
            t0 = time.perf_counter()
            devs = [jax.device_put(h) for h in host]
            for x in devs:
                x.block_until_ready()
            tb = time.perf_counter() - t0
            print(f"b{batch} B put-only         : {n/tb:7.1f} img/s "
                  f"({tb/len(host)*1e3:6.1f} ms/batch)", flush=True)

            # C dispatch-only (pre-put, token chain)
            y = fwd(devs[0])
            y.block_until_ready()
            t0 = time.perf_counter()
            ys = [fwd(x) for x in devs]
            ys[-1].block_until_ready()
            tc = time.perf_counter() - t0
            print(f"b{batch} C dispatch-only    : {n/tc:7.1f} img/s "
                  f"({tc/len(host)*1e3:6.1f} ms/batch)", flush=True)
            del devs, ys

            # D strict serial decode -> put -> dispatch
            fwd.reset()
            t0 = time.perf_counter()
            outs = []
            for imgs, _ in loader:
                x = jax.device_put(imgs)
                x.block_until_ready()
                outs.append(fwd(x))
            for o in outs:
                o.block_until_ready()
            td = time.perf_counter() - t0
            print(f"b{batch} D serial d+p+x     : {n/td:7.1f} img/s",
                  flush=True)

            # E prefetcher pipelines
            for depth in (1, 2, 4):
                fwd.reset()
                pf = DevicePrefetcher(loader, depth=depth)
                t0 = time.perf_counter()
                outs = []
                for imgs, _ in pf:
                    outs.append(fwd(jnp.asarray(imgs)))
                for o in outs:
                    o.block_until_ready()
                te = time.perf_counter() - t0
                print(f"b{batch} E prefetch({depth})    : {n/te:7.1f} img/s",
                      flush=True)


if __name__ == "__main__":
    main()
