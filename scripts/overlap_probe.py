"""MXU/VPU overlap probe — re-validates the scheduling law.

docs/PERF_ANALYSIS.md "The scheduling law": on this Mosaic backend, VPU
chains whose source data comes from an in-kernel matmul serialize with
the MXU; only input-rooted VPU work overlaps.  The whole perf strategy
(cut VPU passes, don't schedule) rests on this — re-run after any
toolchain update (VERDICT r2 "what's weak" #5).

Three kernels over identical grids/shapes:
  A. dot-only          : t_mxu
  B. dot + VPU(dot out): law predicts t_A + t_vpu (serialized)
  C. dot + VPU(input)  : law predicts max(t_A, t_vpu) (overlapped)

Verdict line prints HOLDS if B is additive and C overlaps.
"""
import functools
import sys
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

sys.path.insert(0, "/root/repo")
from diffvit_tpu.utils.profiling import chained_time  # noqa: E402

M, K, N = 512, 512, 512
GRID = 64        # sequential grid steps, one dot each
VPU_ITERS = 220  # tanh chain length — sized so t_vpu ~ t_mxu


def _vpu_chain(x):
    for _ in range(VPU_ITERS):
        x = jnp.tanh(x) + 0.25 * x
    return x


def k_dot(a_ref, b_ref, v_ref, o_ref, o2_ref):
    o_ref[...] = jnp.dot(a_ref[...], b_ref[...],
                         preferred_element_type=jnp.float32)
    o2_ref[...] = v_ref[...]


def k_vpu(a_ref, b_ref, v_ref, o_ref, o2_ref):
    o_ref[...] = jnp.zeros((M, N), jnp.float32)
    o2_ref[...] = _vpu_chain(v_ref[...])


def k_dot_vpu_consume(a_ref, b_ref, v_ref, o_ref, o2_ref):
    y = jnp.dot(a_ref[...], b_ref[...],
                preferred_element_type=jnp.float32)
    o_ref[...] = _vpu_chain(y)
    o2_ref[...] = v_ref[...]


def k_dot_vpu_input_join(a_ref, b_ref, v_ref, o_ref, o2_ref):
    y = jnp.dot(a_ref[...], b_ref[...],
                preferred_element_type=jnp.float32)
    o_ref[...] = y + _vpu_chain(v_ref[...])
    o2_ref[...] = v_ref[...]


def k_dot_vpu_input_split(a_ref, b_ref, v_ref, o_ref, o2_ref):
    # chain result and dot result never meet — separate outputs
    o_ref[...] = jnp.dot(a_ref[...], b_ref[...],
                         preferred_element_type=jnp.float32)
    o2_ref[...] = _vpu_chain(v_ref[...])


def build(kernel):
    call = pl.pallas_call(
        kernel,
        grid=(GRID,),
        in_specs=[
            pl.BlockSpec((M, K), lambda i: (i, 0)),
            pl.BlockSpec((K, N), lambda i: (0, 0)),
            pl.BlockSpec((M, N), lambda i: (i, 0)),
        ],
        out_specs=[pl.BlockSpec((M, N), lambda i: (i, 0)),
                   pl.BlockSpec((M, N), lambda i: (i, 0))],
        out_shape=[jax.ShapeDtypeStruct((GRID * M, N), jnp.float32),
                   jax.ShapeDtypeStruct((GRID * M, N), jnp.float32)],
    )

    @jax.jit
    def step(a, b, v):
        return call(a, b, v)

    return step


def main():
    key = jax.random.PRNGKey(0)
    a = jax.random.normal(key, (GRID * M, K), jnp.bfloat16)
    b = jax.random.normal(key, (K, N), jnp.bfloat16)
    v = jax.random.normal(key, (GRID * M, N), jnp.float32)

    times = {}
    for name, kern in [("dot_only", k_dot),
                       ("vpu_only", k_vpu),
                       ("dot_vpu_consume", k_dot_vpu_consume),
                       ("dot_vpu_in_join", k_dot_vpu_input_join),
                       ("dot_vpu_in_split", k_dot_vpu_input_split)]:
        step = build(kern)
        # chained_time wants f(x)->y with chainable x; close over the
        # rest.  Chain on output[1] — it depends on v in EVERY variant
        # (copy or chain), so the fori_loop carry forces true sequential
        # execution (output[0] is v-independent in dot_only/split).
        f = lambda x, _s=step: _s(a, b, x)[1][: GRID * M]  # noqa: E731
        t = chained_time(f, v, n_steps=20)
        times[name] = t
        print(f"{name:18s} {t*1e3:7.3f} ms")

    t_mxu = times["dot_only"]
    t_vpu = times["vpu_only"]
    sum_m, max_m = t_mxu + t_vpu, max(t_mxu, t_vpu)
    if t_vpu < 0.5 * t_mxu:
        print("INCONCLUSIVE: vpu chain too short vs mxu — raise VPU_ITERS")
        return
    for name in ("dot_vpu_consume", "dot_vpu_in_join", "dot_vpu_in_split"):
        t = times[name]
        print(f"{name:18s} /sum {t/sum_m:.3f}  /max {t/max_m:.3f}")
    consume_serial = times["dot_vpu_consume"] / sum_m > 0.8
    input_overlaps = times["dot_vpu_in_split"] / sum_m < 0.75
    law = ("HOLDS" if (consume_serial and input_overlaps)
           else "CHANGED — re-profile!")
    print(f"serialization law: {law}")


if __name__ == "__main__":
    main()
