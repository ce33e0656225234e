"""Profiling / tracing utilities.

The reference's only instrumentation is the per-layer MAC list and
wall-clock AverageMeters (SURVEY.md §5).  TPU-native equivalents:

* ``trace``: context manager around ``jax.profiler`` producing a TensorBoard
  trace directory.
* ``compiled_cost``: XLA's own cost analysis (FLOPs / bytes accessed) for a
  jitted function — the compiled-HLO replacement for hand-counted FLOPs.
* ``chained_time``: honest wall-clock of a step function via a
  data-dependent chained loop (see bench.py for why fire-and-forget timing
  lies on virtualized TPU backends).
"""
from __future__ import annotations

import contextlib
import time

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def trace(log_dir: str):
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def compiled_cost(fn, *args):
    """{'flops': ..., 'bytes accessed': ...} from XLA's cost analysis of the
    compiled executable."""
    lowered = jax.jit(fn).lower(*args)
    compiled = lowered.compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]
    return dict(cost) if cost else {}


def chained_time(step_fn, x, n_steps=10):
    """Mean seconds per call of ``step_fn(x)->array`` under forced
    sequential execution."""

    @jax.jit
    def chained(x):
        def body(_, carry):
            out = step_fn(carry)
            return carry * (1.0 + 1e-12 * jnp.sum(out))
        return jnp.sum(jax.lax.fori_loop(0, n_steps, body, x))

    float(chained(x))  # compile + warm
    t0 = time.perf_counter()
    float(chained(x))
    return (time.perf_counter() - t0) / n_steps
