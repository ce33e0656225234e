"""PSAQ-ViT data-free calibration image synthesis.

Rebuild of /root/reference/generate_data.py (+utils/kde.py): optimize
Gaussian-noise images with Adam against (a) cross-entropy to random pseudo
labels, (b) a total-variation prior anchored to a random target variance,
and (c) the negative KDE differential entropy of the per-sample cosine
similarity of the attention *context* rows — the reference hooks the
OUTPUT of ``attn.matmul2`` (attn @ v, shape (B, H, N, hd)) and averages
over heads (generate_data.py:22-30,99-111), NOT the softmax probs — with
DeepInversion-style jitter/flip augmentation, a cosine LR schedule, and
per-channel clipping to the ImageNet-normalized valid range.  Works for
both model families like the reference (generate_data.py:41-47: per-block
hooks for ViT/DeiT, per-stage-block hooks + lr 0.25 for Swin).

The reference drives a *timm* pretrained model as the prior
(utils/build_model.py); this environment has no timm/network, so by
default the prior is this framework's own FP model (the architecture is
identical and the context maps come from the ``…attn.ctx`` taps).  A
separately-trained prior can be supplied via ``prior_params`` /
``prior_spec`` (the CLI's --prior-checkpoint loads a local .pth/.npz),
which closes the gap fully when weights exist on disk.
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
import optax

from ..models import swin as swin_mod
from ..models import vit as vit_mod


def _ctx_hooks(spec):
    """Ordered (tap-name, num_heads) of every attention matmul2 hook, the
    JAX analogue of the reference's AttentionMap hook registration
    (generate_data.py:41-47)."""
    if isinstance(spec, swin_mod.SwinSpec):
        return [(f"layers.{s}.blocks.{bi}.attn.ctx", spec.num_heads[s])
                for s in range(spec.num_layers)
                for bi in range(spec.depths[s])]
    return [(f"blocks.{i}.attn.ctx", spec.num_heads)
            for i in range(spec.depth)]


def attention_entropy(ctx, num_heads, batch_size):
    """-H of the KDE of pairwise row cosine similarities of one hook's
    head-averaged context (generate_data.py:99-111).  ``ctx`` is the merged
    (B_, N, H·hd) matmul2 output; reshaping to (B_, N, H, hd) and averaging
    axis 2 equals the reference's ``feature.mean(dim=1)`` on (B_, H, N, hd).
    Row 0 is dropped like the reference (CLS for ViT; for Swin B_ = B·nW
    windows and the first in-window patch row is dropped, and ``view(B,-1)``
    pools all windows of an image — replicated)."""
    b_, n, c = ctx.shape
    a = ctx.reshape(b_, n, num_heads, c // num_heads).mean(axis=2)[:, 1:, :]
    a = a / (jnp.linalg.norm(a, axis=-1, keepdims=True) + 1e-12)
    sims = a @ a.transpose(0, 2, 1)
    flat = sims.reshape(batch_size, -1)
    x_plot = jnp.broadcast_to(jnp.linspace(jnp.min(sims), jnp.max(sims), 10),
                              (batch_size, 10))
    kde_est = gaussian_kde(flat, x_plot)
    return -differential_entropy(kde_est, x_plot)


def total_variation(x):
    """get_image_prior_losses (generate_data.py:137-145)."""
    d1 = x[:, :, :, :-1] - x[:, :, :, 1:]
    d2 = x[:, :, :-1, :] - x[:, :, 1:, :]
    d3 = x[:, :, 1:, :-1] - x[:, :, :-1, 1:]
    d4 = x[:, :, :-1, :-1] - x[:, :, 1:, 1:]
    return (jnp.linalg.norm(d1) + jnp.linalg.norm(d2)
            + jnp.linalg.norm(d3) + jnp.linalg.norm(d4))


def gaussian_kde(train_xs, x, bandwidth=0.01):
    """GaussianKernel KDE (utils/kde.py:87-106): mean over train points of
    N(x - xi; bandwidth²)."""
    diffs = x[:, :, None] - train_xs[:, None, :]
    var = bandwidth**2
    coef = 1.0 / jnp.sqrt(2 * jnp.pi * var)
    return (coef * jnp.exp(-(diffs**2) / (2 * var))).mean(axis=-1)


def differential_entropy(pdf, x_pdf):
    """Trapezoidal -∫ p log p (generate_data.py:128-134)."""
    pdf = pdf + 1e-4
    f = -pdf * jnp.log(pdf)
    return jnp.trapezoid(f, x_pdf, axis=-1).mean()


def _clip_imagenet(img):
    """Per-channel clip to the normalized [0,1] range
    (generate_data.py:148-160)."""
    mean = jnp.asarray([0.485, 0.456, 0.406])
    std = jnp.asarray([0.229, 0.224, 0.225])
    lo = (-mean / std).reshape(1, 3, 1, 1)
    hi = ((1 - mean) / std).reshape(1, 3, 1, 1)
    return jnp.clip(img, lo, hi)


def _cosine_lr(base_lr, warmup, total):
    def lr_fn(it):
        # reference warmup length is 100 epochs but epoch == iteration here,
        # and iterations < warmup never happens with their settings; keep
        # the cosine arm (generate_data.py:170-181)
        e = jnp.minimum(it, total)
        return 0.5 * (1 + jnp.cos(jnp.pi * e / total)) * base_lr

    return lr_fn


def generate_data(params, spec, *, batch_size=32, seed=0, iters_per_epoch=500,
                  epochs=2, lr=None, entropy_weight=1.0, oh_weight=1.0,
                  tv_weight=0.05, log=None, prior_params=None,
                  prior_spec=None):
    """Synthesize a calibration batch (generate_data.py:33-125).
    Returns (batch_size, 3, spec.img_size, spec.img_size) float32 images.
    prior_params/prior_spec: use a separate pretrained prior (the
    reference's timm model role) instead of ``params`` itself."""
    if prior_params is not None:
        params = prior_params
        spec = prior_spec if prior_spec is not None else spec
    key = jax.random.PRNGKey(seed)
    k_img, k_label, k_var, key = jax.random.split(key, 4)
    # reference is always 224 (generate_data.py:50); spec.img_size == 224
    # for every zoo model — honoring it keeps tiny test specs cheap
    img = jax.random.normal(k_img, (batch_size, 3, spec.img_size,
                                    spec.img_size))
    pred = jax.random.randint(k_label, (batch_size,), 0, spec.num_classes)
    var_pred = float(jax.random.uniform(k_var, (), minval=2500.0,
                                        maxval=3000.0))
    is_swin = isinstance(spec, swin_mod.SwinSpec)
    # reference lr: 0.25 for swin, 0.20 otherwise (generate_data.py:54)
    base_lr = lr if lr is not None else (0.25 if is_swin else 0.20)
    fwd = swin_mod.forward_fp if is_swin else vit_mod.forward_fp
    hooks = _ctx_hooks(spec)

    def loss_fn(img, img_jit_params):
        off, flip = img_jit_params
        x = jnp.roll(img, (off, off), axis=(2, 3))
        x = jnp.where(flip, x[:, :, :, ::-1], x)

        taps: list = []
        logits = fwd(params, spec, x, taps=taps)
        tapd = dict(taps)

        logp = jax.nn.log_softmax(logits)
        loss_oh = -jnp.mean(jnp.take_along_axis(logp, pred[:, None], 1))
        loss_tv = jnp.abs(total_variation(x) - var_pred)

        loss_entropy = 0.0
        for name, nh in hooks:
            loss_entropy = loss_entropy + attention_entropy(
                tapd[name], nh, batch_size)

        return entropy_weight * loss_entropy + oh_weight * loss_oh \
            + tv_weight * loss_tv

    grad_fn = jax.jit(jax.value_and_grad(loss_fn))
    rng = np.random.default_rng(seed)

    for epoch in range(epochs):
        lim = 15 if epoch == 0 else 30
        lr_sched = _cosine_lr(base_lr, 100, iters_per_epoch)
        opt = optax.adam(lambda it: lr_sched(it), b1=0.5, b2=0.9, eps=1e-8)
        state = opt.init(img)
        for it in range(iters_per_epoch):
            # pass jitter params as arrays so jit compiles once
            off = jnp.int32(rng.integers(-lim, lim + 1))
            flip = jnp.bool_(rng.random() > 0.5)
            loss, g = grad_fn(img, (off, flip))
            updates, state = opt.update(g, state)
            img = optax.apply_updates(img, updates)
            img = _clip_imagenet(img)
            if log and it % 100 == 0:
                log(f"epoch {epoch} iter {it}: loss {float(loss):.3f}")
    return jax.lax.stop_gradient(img)
