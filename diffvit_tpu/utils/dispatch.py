"""Chain-token dispatch: make REAL eval loops run at chip rate on
dispatch-pipelining-hostile backends.

Measured on the axon tunnel (scripts/ab_e2e_batch.py): INDEPENDENT async
dispatches of the same executable drain at ~1.3-1.4 ms/image
(612-722 img/s for int4 DeiT-S, batch-independent asymptote, inputs
already device-resident), while DATA-DEPENDENT dispatches (bench.py's
``_chained_throughput``) run at the chip's true ~8.2k img/s — the tunnel
only pipelines dispatches it can prove are ordered.  A production eval
loop has a fresh input every step, so its dispatches are independent and
it eats the slow path.

Fix (scripts/ab_chain_token.py): thread a dummy data dependence through
the steps.  ``step(x, tok) -> (logits, tok')`` where the token enters the
prepped float batch as ``x + 0.0 * tok`` — float mul keeps NaN semantics
so XLA cannot fold the dependence away, yet the numeric effect is exactly
zero for finite tokens — and leaves as a nan_to_num-guarded reduction of
the logits (so an inf/NaN logit from a garbage model can never poison the
chain).  Logits are BIT-IDENTICAL to the unchained forward (asserted in
the probe and in tests/test_chained_dispatch.py).

Measured effect (int4 DeiT-S, fresh device-resident input per step):

| batch | independent | chain-token |
|---|---|---|
| 64  | 102.8 ms/step (622 img/s) | 35.2 ms/step (1,816 img/s) |
| 256 | 352.9 ms/step (725 img/s) | 54.1 ms/step (4,731 img/s) |

On backends that already pipeline independent dispatches (CPU, real TPU
runtimes) the wrapper costs one scalar reduction per step — noise.  The
reference has no equivalent (torch eager dispatch is synchronous;
SURVEY.md §5).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


class ChainedDispatch:
    """Wrap ``fwd(*extra, xf) -> logits`` (``xf`` = prepped float batch)
    as a stateful callable ``self(*extra, x) -> logits`` whose successive
    dispatches are chained through an exact-zero token.

    ``prep``: raw-batch -> float-batch preprocessing (e.g. the uint8-wire
    LUT normalize) applied INSIDE the jitted step, before token
    injection — so the token add happens in float, never on the uint8
    wire.  Each distinct input shape/dtype traces once, like any jit.
    """

    def __init__(self, prep, fwd):
        def step(extra, x, tok):
            xf = prep(x)
            xf = xf + (0.0 * tok).astype(xf.dtype)  # exact zero, unfoldable
            y = fwd(*extra, xf)
            # guarded so non-finite logits can't poison later steps
            return y, 1e-12 * jnp.nan_to_num(jnp.sum(y))

        self._step = jax.jit(step)
        self._tok = jnp.float32(0.0)

    def __call__(self, *args):
        *extra, x = args
        y, self._tok = self._step(tuple(extra), x, self._tok)
        return y

    def reset(self):
        """Drop the chain (e.g. between epochs); purely optional."""
        self._tok = jnp.float32(0.0)
