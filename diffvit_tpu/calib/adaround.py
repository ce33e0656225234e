"""AdaRound: learned-rounding reconstruction for the PoT weight grids.

Beyond-the-reference capability (the reference rounds every weight to
nearest, uniform.py:50-56 via round()): per weight site, learn a binary
up/down rounding decision that minimizes the site's output error on
calibration data (Nagel et al., "Up or Down? Adaptive Rounding for
Post-Training Quantization", ICML 2020).  Data-free with the CLI's
``--mode 1/2`` calibration sources, so it composes with the framework's
hermetic story.

Design (TPU-first):

* The soft-rounding relaxation h = clip(1.2*sigmoid(v) - 0.1, 0, 1) and
  the annealed regularizer sum(1 - |2h-1|^beta) are optimized with optax
  Adam inside ONE jitted ``lax.fori_loop`` per site — no Python-loop
  dispatch; sites with equal shapes share the compiled executable.
* The objective is the paper's ASYMMETRIC reconstruction:
  ``|| Xq @ W_soft.T  -  Xfp @ W.T ||²`` — quantized-path input against
  the float-path target — so each site's rounding also absorbs the
  activation-quantization error arriving from upstream.  Sites are
  reconstructed sequentially in forward order with their quantized-path
  inputs REFRESHED from the partially-reconstructed model (BRECQ-style
  error propagation); the float targets are collected once.
* The artifact is a **reconstructed weight pytree**, not a side table:
  each weight is replaced by ``scale * learned_codes`` (de-smoothed for
  SmoothQuant sites), which re-rounds bit-exactly to the learned codes —
  ``forward_q``, ``forward_q_bits``, ``prepare_int`` and the int-export
  artifact all consume it unchanged.  Valid for the specific
  ``bit_config`` it was learned at (rounding at other bits is nearest,
  as before).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import QuantConfig
from ..ops.bit_types import BIT_TYPE_DICT
from ..ops.quant import fake_quant


@partial(jax.jit, static_argnames=("steps",))
def _optimize_site(Xq, Xf, Wt, floor, s_b, lb, ub, steps, lr, lam,
                   beta0, beta1, warm):
    """Minimize mean((Xq @ W_soft.T - Xf @ Wt.T)^2) + lam*f_reg(h) over
    the rounding logits v.  ``floor``: floor(Wt/s); ``s_b``: scale
    broadcast to Wt's shape; the regularizer is off for the first
    ``warm`` steps, then beta anneals beta0 -> beta1 (AdaRound's
    schedule).  Returns (hard-rounded weight, site mse with nearest
    rounding, site mse with the learned rounding)."""
    frac = jnp.clip(Wt / s_b - floor, 0.0, 1.0)
    v0 = -jnp.log(1.2 / (frac + 0.1) - 1.0)  # h(v0) == frac exactly
    target = Xf @ Wt.T

    opt = optax.adam(lr)

    def h_of(v):
        return jnp.clip(1.2 * jax.nn.sigmoid(v) - 0.1, 0.0, 1.0)

    def loss_fn(v, beta, reg_on):
        w_soft = jnp.clip(floor + h_of(v), lb, ub) * s_b
        mse = jnp.mean((Xq @ w_soft.T - target) ** 2)
        reg = jnp.sum(1.0 - jnp.abs(2.0 * h_of(v) - 1.0) ** beta)
        return mse + reg_on * lam * reg

    def body(i, carry):
        v, state = carry
        t = jnp.clip((i - warm) / jnp.maximum(steps - warm, 1), 0.0, 1.0)
        beta = beta0 + (beta1 - beta0) * t
        reg_on = (i >= warm).astype(jnp.float32)
        g = jax.grad(loss_fn)(v, beta, reg_on)
        updates, state = opt.update(g, state, v)
        return optax.apply_updates(v, updates), state

    v, _ = jax.lax.fori_loop(0, steps, body, (v0, opt.init(v0)))

    codes = jnp.clip(floor + (h_of(v) > 0.5), lb, ub)
    w_hard = codes * s_b
    w_near = jnp.clip(jnp.round(Wt / s_b), lb, ub) * s_b
    mse_before = jnp.mean((Xq @ w_near.T - target) ** 2)
    mse_after = jnp.mean((Xq @ w_hard.T - target) ** 2)
    return w_hard, mse_before, mse_after


def _rows(xq, xf, k, max_rows, rng):
    """Flatten both inputs to (-1, k) and subsample the SAME rows."""
    fq = np.asarray(xq).reshape(-1, k)
    ff = np.asarray(xf).reshape(-1, k)
    assert fq.shape == ff.shape, (fq.shape, ff.shape)
    if fq.shape[0] > max_rows:
        idx = rng.choice(fq.shape[0], size=max_rows, replace=False)
        fq, ff = fq[idx], ff[idx]
    return jnp.asarray(fq), jnp.asarray(ff)


def _vit_sites(spec, bit_config):
    """(wtap name, params path, qp weight-scale prefix, smooth?, bit) per
    weight site, in forward order; matches forward_q/forward_fp's wtaps."""
    sites = [("patch", ("patch_embed", "w"), "patch.w", False,
              bit_config[0])]
    for i in range(spec.depth):
        p = f"blocks.{i}"
        sites += [
            (f"{p}.attn.qkv", ("blocks", i, "qkv", "w"),
             f"{p}.attn.qkv", True, bit_config[4 * i + 1]),
            (f"{p}.attn.proj", ("blocks", i, "proj", "w"),
             f"{p}.attn.proj.w", False, bit_config[4 * i + 2]),
            (f"{p}.mlp.fc1", ("blocks", i, "fc1", "w"),
             f"{p}.mlp.fc1", True, bit_config[4 * i + 3]),
            (f"{p}.mlp.fc2", ("blocks", i, "fc2", "w"),
             f"{p}.mlp.fc2.w", False, bit_config[4 * i + 4]),
        ]
    sites.append(("head", ("head", "w"), "head.w", False, bit_config[-1]))
    return sites


def _get(tree, path):
    for k in path:
        tree = tree[k]
    return tree


def _set(tree, path, value):
    """Functional leaf replacement (shallow-copies containers on the path)."""
    if not path:
        return value
    head, rest = path[0], path[1:]
    out = dict(tree) if isinstance(tree, dict) else list(tree)
    out[head] = _set(tree[head], rest, value)
    return out


def _swin_sites(spec, bc):
    """(wtap name, params path, qp weight-scale prefix, bit) per Swin
    weight site in forward order — the slot layout of
    swin.num_bit_slots/_forward_q_body (patch, 4 per block, per-stage
    reduction, head); all sites are plain (Swin has no SmoothQuant)."""
    sites = [("patch", ("patch_embed", "proj", "w"), "patch.w", bc[0])]
    slot = 1
    for s in range(spec.num_layers):
        for bi in range(spec.depths[s]):
            p = f"layers.{s}.blocks.{bi}"
            base = ("layers", s, "blocks", bi)
            sites += [
                (f"{p}.attn.qkv", base + ("qkv", "w"),
                 f"{p}.attn.qkv.w", bc[slot]),
                (f"{p}.attn.proj", base + ("proj", "w"),
                 f"{p}.attn.proj.w", bc[slot + 1]),
                (f"{p}.mlp.fc1", base + ("fc1", "w"),
                 f"{p}.mlp.fc1.w", bc[slot + 2]),
                (f"{p}.mlp.fc2", base + ("fc2", "w"),
                 f"{p}.mlp.fc2.w", bc[slot + 3]),
            ]
            slot += 4
        if s < spec.num_layers - 1:
            sites.append((f"layers.{s}.downsample.reduction",
                          ("layers", s, "downsample", "reduction", "w"),
                          f"layers.{s}.downsample.reduction.w", bc[slot]))
            slot += 1
    sites.append(("head", ("head", "w"), "head.w", bc[slot]))
    return sites


def adaround_swin(params, qp, spec, cfg: QuantConfig, x, bit=None, *,
                  steps=1000, lr=1e-2, lam=0.01, beta_range=(20.0, 2.0),
                  warmup=0.2, max_rows=2048, seed=0, fp_params=None):
    """Learned-rounding reconstruction of every quantized Swin weight
    site (the swin.normalize_bit_config contract).  Same protocol as
    adaround_vit; simpler because every Swin site is plain (the quantized
    forward's wtap input is already fake-quanted upstream)."""
    from ..models import swin

    bc = swin.normalize_bit_config(spec, bit if bit is not None
                                   else cfg.bit_w.bits)

    fp_taps = []
    swin.forward_fp(fp_params if fp_params is not None else params,
                    spec, x, w_in_taps=fp_taps)
    fp_in = dict(fp_taps)
    rng = np.random.default_rng(seed)
    warm = int(round(steps * warmup))

    cur = params
    report = {}
    for name, ppath, spre, bit_w in _swin_sites(spec, bc):
        if bit_w == -1:
            continue
        q_taps = []
        swin.forward_q(cur, qp, spec, cfg, x, bc, w_in_taps=q_taps)
        y_q, y_f = dict(q_taps)[name], fp_in[name]

        w = _get(params, ppath)
        bt = BIT_TYPE_DICT[f"int{bit_w}"]
        s = qp[f"{spre}.{bt.name}.scale"]
        s_b = s[:, None] if (hasattr(s, "ndim") and s.ndim == 1) else s
        s_b = jnp.broadcast_to(jnp.asarray(s_b, w.dtype), w.shape)
        Xq_r, Xf_r = _rows(y_q, y_f, w.shape[1], max_rows, rng)
        w_hard, mse0, mse1 = _optimize_site(
            Xq_r, Xf_r, w, jnp.floor(w / s_b), s_b,
            float(bt.lower_bound), float(bt.upper_bound), steps,
            lr, lam, beta_range[0], beta_range[1], warm)
        cur = _set(cur, ppath, w_hard.astype(w.dtype))
        report[name] = (float(mse0), float(mse1))
    return cur, report


def adaround_vit(params, qp, spec, cfg: QuantConfig, x, bit_config=None, *,
                 steps=1000, lr=1e-2, lam=0.01, beta_range=(20.0, 2.0),
                 warmup=0.2, max_rows=2048, seed=0, fp_params=None):
    """Learned-rounding reconstruction of every quantized ViT/DeiT weight
    site at ``bit_config``.  ``x``: calibration batch (any of the CLI's
    --mode 0/1/2 sources).  Returns ``(new_params, report)`` where report
    maps site -> (site mse with nearest rounding, site mse learned) —
    both measured against the float-path target.  ``fp_params``: the
    float pytree anchoring the targets when ``params`` was already
    reconstructed (see biascorr.bias_correct)."""
    from ..models import vit

    if bit_config is None:
        bit_config = (cfg.bit_w.bits,) * vit.num_bit_slots(spec)
    bit_config = tuple(int(b) for b in bit_config)

    fp_taps = []
    vit.forward_fp(fp_params if fp_params is not None else params,
                   spec, x, w_in_taps=fp_taps)
    fp_in = dict(fp_taps)
    rng = np.random.default_rng(seed)
    warm = int(round(steps * warmup))

    cur = params
    report = {}
    for name, ppath, spre, smooth, bit in _vit_sites(spec, bit_config):
        if bit == -1:  # site runs in float — nothing to round
            continue
        # refresh the quantized-path input from the partially-reconstructed
        # model (sites upstream of this one already carry learned codes)
        q_taps = []
        vit.forward_q(cur, qp, spec, cfg, x, bit_config, w_in_taps=q_taps)
        y_q = dict(q_taps)[name]
        y_f = fp_in[name]

        w = _get(params, ppath)
        bt = BIT_TYPE_DICT[f"int{bit}"]
        if smooth and cfg.smoothquant:
            idx = cfg.bit_pool.index(bit)
            ch = qp[f"{spre}.sq.channel_scale"][idx]
            Wt = w * ch
            Xq = fake_quant(y_q / ch, qp[f"{spre}.qact0.scale"][idx],
                            qp[f"{spre}.qact0.zp"][idx], cfg.bit_a)
            Xf = y_f / ch  # float branch in the smoothed frame:
            #                (x/ch) @ (w*ch).T == x @ w.T exactly in intent
            s = qp[f"{spre}.w.{bt.name}.scale"][idx]
        else:
            if smooth:  # smoothquant off: plain linear with its own qact0
                Xq = fake_quant(y_q, qp[f"{spre}.qact0.scale"],
                                qp[f"{spre}.qact0.zp"], cfg.bit_a)
                s = qp[f"{spre}.w.{bt.name}.scale"]
            else:
                Xq = y_q  # already fake-quanted by its qact in forward_q
                s = qp[f"{spre}.{bt.name}.scale"]
            Xf, ch, Wt = y_f, None, w
        s_b = s[:, None] if (hasattr(s, "ndim") and s.ndim == 1) else s
        s_b = jnp.broadcast_to(jnp.asarray(s_b, Wt.dtype), Wt.shape)
        Xq_r, Xf_r = _rows(Xq, Xf, Wt.shape[1], max_rows, rng)
        w_hard, mse0, mse1 = _optimize_site(
            Xq_r, Xf_r, Wt, jnp.floor(Wt / s_b), s_b,
            float(bt.lower_bound), float(bt.upper_bound), steps,
            lr, lam, beta_range[0], beta_range[1], warm)
        if smooth and cfg.smoothquant:
            w_hard = w_hard / ch  # back to unsmoothed param space
        cur = _set(cur, ppath, w_hard.astype(w.dtype))
        report[name] = (float(mse0), float(mse1))
    return cur, report
