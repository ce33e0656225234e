"""Post-quantization bias correction (DFQ-style, Nagel et al. ICCV 2019).

Beyond-the-reference capability: quantization shifts each linear's
output distribution (E[y_q] != E[y_fp] because rounding error correlates
with the weight pattern); folding the empirical per-channel mean shift
into the bias removes it at zero inference cost.  The reference carries
this bias (it never corrects, uniform.py:50-56 round-to-nearest only).

Protocol (shared with calib/adaround.py): float-path output means are
collected once via the forwards' analysis taps; sites are corrected
sequentially in forward order with the quantized-path outputs REFRESHED
from the partially-corrected model, so each correction also absorbs the
residual mean shift arriving from upstream.  Composes with AdaRound
(run it after — the corrected biases are float and never quantized).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..config import QuantConfig
from .adaround import _get, _set


def _mean(t):
    """Per-output-channel mean over every leading axis."""
    return jnp.mean(jnp.asarray(t).reshape(-1, t.shape[-1]), axis=0)


def _vit_bias_sites(spec):
    sites = [("patch_embed.proj", ("patch_embed", "b"))]
    for i in range(spec.depth):
        p, base = f"blocks.{i}", ("blocks", i)
        sites += [(f"{p}.attn.qkv", base + ("qkv", "b")),
                  (f"{p}.attn.proj", base + ("proj", "b")),
                  (f"{p}.mlp.fc1", base + ("fc1", "b")),
                  (f"{p}.mlp.fc2", base + ("fc2", "b"))]
    sites.append(("head", ("head", "b")))
    return sites


def _swin_bias_sites(spec):
    sites = [("patch_embed.proj", ("patch_embed", "proj", "b"))]
    for s in range(spec.num_layers):
        for bi in range(spec.depths[s]):
            p = f"layers.{s}.blocks.{bi}"
            base = ("layers", s, "blocks", bi)
            sites += [(f"{p}.attn.qkv", base + ("qkv", "b")),
                      (f"{p}.attn.proj", base + ("proj", "b")),
                      (f"{p}.mlp.fc1", base + ("fc1", "b")),
                      (f"{p}.mlp.fc2", base + ("fc2", "b"))]
        # downsample reduction has no bias (lin(..., bias=False)) — the
        # torch reference's PatchMerging reduction is bias-free too
    sites.append(("head", ("head", "b")))
    return sites


def bias_correct(params, qp, spec, cfg: QuantConfig, x, bit_config=None,
                 fp_params=None):
    """Sequential empirical bias correction of every biased linear.
    Returns ``(new_params, report)``; report maps site -> (mean |shift|
    before, after) in output units — 'after' is measured by one final
    refreshed forward, so it reflects the corrected model.

    ``fp_params``: the float-model pytree defining the target means.
    Pass the ORIGINAL float weights when ``params`` was already
    reconstructed (e.g. by AdaRound) — the float forward of rounded
    weights is not the FP model and correcting toward it degrades the
    composition (measured: deit-tiny int4 0.075 -> 0.224 rel err)."""
    from ..models import swin, vit

    if fp_params is None:
        fp_params = params
    if isinstance(spec, swin.SwinSpec):
        mod, sites = swin, _swin_bias_sites(spec)
        fwd_q = lambda p_, taps: swin.forward_q(p_, qp, spec, cfg, x,
                                                bit_config, taps=taps)
    else:
        mod, sites = vit, _vit_bias_sites(spec)
        fwd_q = lambda p_, taps: vit.forward_q(p_, qp, spec, cfg, x,
                                               bit_config, taps=taps)

    fp_taps = []
    mod.forward_fp(fp_params, spec, x, taps=fp_taps)
    fp_mean = {name: _mean(t) for name, t in fp_taps}

    cur, report = params, {}
    for name, bpath in sites:
        q_taps = []
        fwd_q(cur, q_taps)
        shift = fp_mean[name] - _mean(dict(q_taps)[name])
        b = _get(cur, bpath)
        cur = _set(cur, bpath, (b + shift).astype(b.dtype))
        report[name] = [float(jnp.mean(jnp.abs(shift))), None]

    q_taps = []
    fwd_q(cur, q_taps)
    q_mean = dict(q_taps)
    for name, _ in sites:
        res = fp_mean[name] - _mean(q_mean[name])
        report[name][1] = float(jnp.mean(jnp.abs(res)))
        report[name] = tuple(report[name])
    return cur, report
