"""Production-kernel MXU/VPU overlap probe (the decisive control).

The synthetic probe (scripts/overlap_probe.py) measures tanh chains whose
codegen turned out to be context-dependent (round 3: a dot+chain kernel ran
2x faster than the chain alone — see docs/PERF_ANALYSIS.md).  This probe
re-runs round 2's decisive A/B on the REAL fused MLP kernel at DeiT-S b256
geometry instead:

  A. production structure — GELU consumes the fc1 matmul result
  B. identical instruction mix — GELU consumes a kernel INPUT; the fc1
     result is kept alive by one extra fma into the output (A gets the
     same extra fma so the comparison is exact)

Round-2 result: A 9.69 ms vs B 4.72 ms (= matmul floor): dot-consuming VPU
work serializes with the MXU, input-rooted work overlaps.  If A ≈ B today,
the scheduling law changed and the fused-block pairing design in
docs/PERF_ANALYSIS.md ("what's left") becomes reachable — re-profile.
"""
import functools
import sys
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
from diffvit_tpu.ops.pallas.mlp import _gelu_poly  # noqa: E402

CIN, HID = 384, 1536          # DeiT-S MLP
ROWS = 99 * 512               # 197 tokens x b256 padded to 512-row blocks
BLOCK, SUB = 512, 256


def _kernel(x_ref, w1_ref, w2_ref, v1_ref, v2_ref, g_src_ref, scal_ref,
            out_ref, *, mode):
    # mode: "dot" (GELU consumes fc1 result), "input" (GELU consumes a
    # kernel input; fc1 kept alive by the fma), "nogelu" (requant only —
    # isolates the GELU chain cost), "pipelined" (production-style fc1(i+1)
    # prefetch before gelu(i), GELU from dot)
    n_sub = BLOCK // SUB
    s_q1_inv = scal_ref[0]
    mult1 = v1_ref[0][None, :]
    bias1 = v1_ref[1][None, :]
    mult2 = v2_ref[0][None, :]
    bias2 = v2_ref[1][None, :]
    out_scale = v2_ref[2][None, :]
    inv_out_scale = v2_ref[3][None, :]

    def fc1(i):
        xs = x_ref[pl.ds(i * SUB, SUB), :]
        return jax.lax.dot_general(
            xs, w1_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32).astype(jnp.float32) \
            * mult1 + bias1

    def gelu_requant(mid, i):
        if mode == "input":
            src = g_src_ref[pl.ds(i * SUB, SUB), :]
        else:
            src = mid
        if mode == "nogelu":
            g = src
        else:
            g = _gelu_poly(src)
        return jnp.clip(jnp.round(g * s_q1_inv), -128.0, 127.0) \
            .astype(jnp.int8)

    def fc2_store(g_i8, mid, i):
        acc = jax.lax.dot_general(
            g_i8, w2_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32).astype(jnp.float32) \
            * mult2 + bias2
        codes = jnp.clip(jnp.round(acc * inv_out_scale), -128.0, 127.0)
        # identical keep-alive fma in EVERY variant (prevents DCE of the
        # fc1 dot in "input"; charges the others the same extra pass)
        out_ref[pl.ds(i * SUB, SUB), :] = \
            codes * out_scale + mid[:, :CIN] * 1e-8

    if mode == "pipelined":
        mid_cur = fc1(0)
        for i in range(n_sub):
            mid_next = fc1(i + 1) if i + 1 < n_sub else None
            g = gelu_requant(mid_cur, i)
            fc2_store(g, mid_cur, i)
            mid_cur = mid_next
    else:
        for i in range(n_sub):
            mid = fc1(i)
            g = gelu_requant(mid, i)
            fc2_store(g, mid, i)


def build(mode):
    kernel = functools.partial(_kernel, mode=mode)
    call = pl.pallas_call(
        kernel,
        grid=(ROWS // BLOCK,),
        in_specs=[
            pl.BlockSpec((BLOCK, CIN), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # w1
            pl.BlockSpec(memory_space=pltpu.VMEM),  # w2
            pl.BlockSpec(memory_space=pltpu.VMEM),  # v1
            pl.BlockSpec(memory_space=pltpu.VMEM),  # v2
            pl.BlockSpec((BLOCK, HID), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),  # g_src
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((BLOCK, CIN), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ROWS, CIN), jnp.float32),
    )
    return call


def main():
    key = jax.random.PRNGKey(0)
    w1 = jax.random.randint(key, (CIN, HID), -127, 128, jnp.int8)
    w2 = jax.random.randint(key, (HID, CIN), -127, 128, jnp.int8)
    v1 = jnp.ones((2, HID), jnp.float32) * jnp.asarray([[1e-3], [0.0]])
    v2 = jnp.ones((4, CIN), jnp.float32) \
        * jnp.asarray([[1e-3], [0.0], [0.05], [20.0]])
    g_src = jax.random.normal(key, (ROWS, HID), jnp.float32)
    scal = jnp.asarray([16.0], jnp.float32)
    xf = jax.random.normal(key, (ROWS, CIN), jnp.float32) * 10.0

    n_steps = 20
    from diffvit_tpu.ops.pallas.mlp import fused_int_mlp

    def production(x_i8, w1, w2, v1, v2, g_src, scal):
        return fused_int_mlp(x_i8, w1, w2, v1[0], v1[1], v2[0], v2[1],
                             v2[2], 1.0 / scal[0],
                             block_rows=BLOCK, sub=SUB)

    for name, call in [("A_gelu_from_dot", build("dot")),
                       ("B_gelu_from_input", build("input")),
                       ("C_no_gelu", build("nogelu")),
                       ("P_pipelined", build("pipelined")),
                       ("D_production", production)]:

        # all big arrays ride as jit ARGUMENTS (closed-over device arrays
        # get baked into the compile payload — the tunnel rejects >100MB
        # request bodies with HTTP 413)
        @jax.jit
        def chained(x, w1, w2, v1, v2, g_src, scal, _c=call):
            def body(_, carry):
                x_i8 = jnp.clip(jnp.round(carry), -128, 127) \
                    .astype(jnp.int8)
                out = _c(x_i8, w1, w2, v1, v2, g_src, scal)
                return carry * (1.0 + 1e-12 * jnp.sum(out))
            return jnp.sum(jax.lax.fori_loop(0, n_steps, body, x))

        args = (xf, w1, w2, v1, v2, g_src, scal)
        float(chained(*args))  # compile + warm
        t0 = time.perf_counter()
        float(chained(*args))
        t = (time.perf_counter() - t0) / n_steps
        print(f"{name:18s} {t*1e3:7.3f} ms")


if __name__ == "__main__":
    main()
