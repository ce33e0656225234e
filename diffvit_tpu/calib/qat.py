"""Data-free distillation QAT: fine-tune the latent float weights of the
fully-quantized forward toward the FP teacher.

Beyond-the-reference capability (the reference never differentiates
through its quantizers; its DDV-Hessian driver even notes fake-quant
rounding would zero the gradients).  Here every rounding in the
quantized path — uniform fake-quant, integer LayerNorm, Log-Int-Softmax —
has a straight-through estimator mode (``ste=True`` threads through
forward_q; primal values identical, gradients pass through), so the whole
PTQ model is trainable end-to-end.

Design (TPU-first): ONE jitted train step (value_and_grad of the STE
forward + optax Adam update) reused for every step; teacher logits are
precomputed per distinct batch.  Works with the CLI's hermetic --mode
1/2 calibration sources — distillation needs no labels.  Composes with
the other recovery passes: the QAT'd weights are latent (forward_q
re-fake-quantizes them), so prepare_int / save_int_model / bias_correct
all consume the result unchanged.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from ..config import QuantConfig


def qat_distill(params, qp, spec, cfg: QuantConfig, batches,
                bit_config=None, *, steps=200, lr=1e-5, fp_params=None,
                remat=False):
    """Distill ``forward_q(params)`` toward ``forward_fp(fp_params)`` by
    MSE on logits.  ``batches``: one array or a list (cycled over steps).
    Returns ``(new_params, losses)`` — losses is the per-step trajectory.
    Works for ViT/DeiT and Swin (both quantized bodies are STE-threaded).

    ``remat=True`` (ViT family) checkpoints each block in the STE forward
    (jax.checkpoint, full recompute): backward saves only the block-boundary
    residual stream, so the train step fits HBM on the deep/wide models
    (vit_large b32: 11.3 GB -> 2.7 GB XLA temp, measured on-chip) at the
    cost of one extra forward's FLOPs.  Bit-identical loss trajectory."""
    from ..models import swin, vit

    mod = swin if isinstance(spec, swin.SwinSpec) else vit
    if remat and mod is swin:
        raise NotImplementedError(
            "remat is wired for the ViT family body (Swin blocks are "
            "windowed)")
    if fp_params is None:
        fp_params = params
    if mod is swin:
        bit_config = swin.normalize_bit_config(
            spec, bit_config if bit_config is not None else cfg.bit_w.bits)
    else:
        if bit_config is None:
            bit_config = (cfg.bit_w.bits,) * vit.num_bit_slots(spec)
        bit_config = tuple(int(b) for b in bit_config)
    if not isinstance(batches, (list, tuple)):
        batches = [batches]
    batches = [jnp.asarray(b) for b in batches]

    teacher = jax.jit(lambda x: mod.forward_fp(fp_params, spec, x))
    targets = [teacher(b) for b in batches]

    def loss_fn(p, x, target):
        kw = {"remat": True} if remat else {}
        y = mod.forward_q(p, qp, spec, cfg, x, bit_config, ste=True, **kw)
        return jnp.mean((y - target) ** 2)

    opt = optax.adam(lr)

    @jax.jit
    def train_step(p, st, x, target):
        loss, g = jax.value_and_grad(loss_fn)(p, x, target)
        updates, st = opt.update(g, st, p)
        return optax.apply_updates(p, updates), st, loss

    state = opt.init(params)
    losses = []
    for i in range(steps):
        j = i % len(batches)
        params, state, loss = train_step(params, state, batches[j],
                                         targets[j])
        losses.append(loss)  # keep on device: a float() here would pay
        # one dispatch round-trip PER STEP (~0.7 s through the axon
        # tunnel); the steps chain through params anyway
    # one stacked transfer instead of `steps` sequential scalar reads
    return params, [float(l) for l in jax.device_get(jnp.stack(losses))]
