"""Kernel-segment A/B for the Swin window-attention glue (VERDICT r4
item 3): v1 (pre-transposed qkv kernel + the XLA relayouts it needs) vs
v2 (natural-layout kernel, selection-matrix head extract/place).

Each leg times the SAME semantic segment at stage-0 geometry, b128:
qkv int8 matmul + requant collapse + window attention + o_i8 ready for
proj — including every relayout that variant requires.  Chained timing
(CLAUDE.md).

Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/ab_swin_attn_seg.py
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def chain(fn, x, steps=10, warmup=2):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def step(c):
        out = fn(c)
        return c * (1.0 + 1e-12 * jnp.sum(out.astype(jnp.float32)))

    c = x
    for _ in range(warmup):
        c = step(c)
    c.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(steps):
        c = step(c)
    c.block_until_ready()
    return (time.perf_counter() - t0) / steps


def main():
    import jax
    import jax.numpy as jnp

    from diffvit_tpu.ops.pallas.attention import (fused_swin_attention,
                                                  fused_swin_attention_v2)

    B = 128
    res, ws, c, nh = 56, 7, 96, 3
    nw = (res // ws) ** 2          # 64 windows/img
    bw = B * nw                    # 8192
    n, npad, hd = ws * ws, 56, c // nh

    rng = np.random.default_rng(0)
    yw = jnp.asarray(rng.standard_normal((bw, npad, c)), jnp.float32)
    w_int = jnp.asarray(rng.integers(-127, 128, (c, 3 * c)), jnp.int8)
    bias_p = jnp.asarray(rng.standard_normal((nh, npad, npad)), jnp.float32)
    mask = jnp.asarray(
        np.where(rng.integers(0, 2, (nw, npad, npad)), 0.0, -100.0),
        jnp.float32)
    scalars = jnp.asarray([2.0**-6, 2.0**-4, 2.0**4, 2.0**-4, 1.0],
                          jnp.float32)

    def qkv_requant(xf):
        x_i8 = jnp.clip(jnp.round(xf), -128, 127).astype(jnp.int8)
        acc = jax.lax.dot_general(
            x_i8.astype(jnp.bfloat16), w_int.astype(jnp.bfloat16),
            (((2,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        return jnp.clip(jnp.round(acc * 2.0**-7), -128, 127) \
            .astype(jnp.int8)

    def leg_v1(xf, masked):
        # round-4 production: unpadded matmul, pad AFTER requant
        qkv_i8 = qkv_requant(xf[:, :n])
        qkv_i8 = jnp.pad(qkv_i8, ((0, 0), (0, npad - n), (0, 0)))
        qkv_p = qkv_i8.reshape(bw, npad, 3, nh, hd).transpose(0, 2, 3, 1, 4)
        o = fused_swin_attention(
            qkv_p, bias_p, mask if masked else None, scalars, num_heads=nh,
            n_real=n, n_windows=nw, bits=4, lis=True)
        return o.transpose(0, 2, 1, 3)[:, :n].reshape(bw, n, c)

    def leg_v1p(xf, masked):
        # round-5 production: row-pad folded into the matmul input
        qkv_i8 = qkv_requant(xf)
        qkv_p = qkv_i8.reshape(bw, npad, 3, nh, hd).transpose(0, 2, 3, 1, 4)
        o = fused_swin_attention(
            qkv_p, bias_p, mask if masked else None, scalars, num_heads=nh,
            n_real=n, n_windows=nw, bits=4, lis=True)
        return o.transpose(0, 2, 1, 3)[:, :n].reshape(bw, n, c)

    def leg_v2(xf, masked):
        qkv_i8 = qkv_requant(xf)
        o = fused_swin_attention_v2(
            qkv_i8, bias_p, mask if masked else None, scalars, num_heads=nh,
            head_dim=hd, n_real=n, n_windows=nw, bits=4, lis=True)
        return o[:, :n]

    for masked in (False, True):
        for name, leg in (("v1", leg_v1), ("v1p", leg_v1p), ("v2", leg_v2)):
            dt = chain(lambda xf, leg=leg, m=masked: leg(xf, m), yw)
            print(f"stage0 b128 {name} mask={masked}: {dt*1e3:7.2f} "
                  f"ms/block-segment", flush=True)


if __name__ == "__main__":
    main()
