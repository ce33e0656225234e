"""PGD adversarial input generation.

Rebuild of ``AttackPGD`` (/root/reference/dataset_utility.py:82-191): 50-step
L∞ PGD (ε=.06, step .01) with a uniform random start, iterates clamped to
the ball around the inputs and to the inputs' global [min, max].  The torch
backward loop becomes a ``lax.fori_loop`` of ``jax.grad`` steps, jitted once
per model/shape.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _ce_sum(logits, targets):
    logp = jax.nn.log_softmax(logits)
    return -jnp.sum(jnp.take_along_axis(logp, targets[:, None], axis=1))


def make_pgd(forward_fn, epsilon=0.06, step_size=0.01, num_steps=50):
    """forward_fn(x) -> logits (the attacked network, FP or quantized).
    Returns jitted fn(inputs, targets, key) -> adversarial inputs."""

    @jax.jit
    def gen(inputs, targets, key):
        lo = jnp.min(inputs)
        hi = jnp.max(inputs)
        x0 = inputs + jax.random.uniform(key, inputs.shape,
                                         minval=-epsilon, maxval=epsilon)

        def loss_fn(x):
            return _ce_sum(forward_fn(x), targets)

        def body(_, x):
            g = jax.grad(loss_fn)(x)
            x = x + step_size * jnp.sign(g)
            x = jnp.minimum(jnp.maximum(x, inputs - epsilon),
                            inputs + epsilon)
            return jnp.clip(x, lo, hi)

        return jax.lax.fori_loop(0, num_steps, body, x0)

    return gen


def make_pseudo_label_pgd(forward_fn, epsilon=0.3, step_size=0.01,
                          num_steps=50):
    """The modeldiff_p2 profiling attack (/root/reference/
    modeldiff_p2.py:152-178): L∞ PGD ascending ``myloss`` against
    pseudo-targets, iterates clamped to the ε-ball AND to [0, 1].

    myloss(ŷ, y) = -((ŷ₀-y₀)² + 0.1·mean((ŷ₁:-y₁:)²)).mean(): maximizing it
    (the torch loop follows +sign(∂loss/∂x)) DRIVES the logits toward the
    pseudo-targets.  Returns jitted fn(inputs, targets, key) -> adv inputs;
    pass ``init_noise`` instead of ``key`` to pin the uniform start.
    """

    def myloss(yhat, y):
        return -jnp.mean((yhat[:, 0] - y[:, 0]) ** 2
                         + 0.1 * jnp.mean((yhat[:, 1:] - y[:, 1:]) ** 2,
                                          axis=1))

    @jax.jit
    def gen(inputs, targets, noise):
        x0 = inputs + noise

        def loss_fn(x):
            return myloss(forward_fn(x), targets)

        def body(_, x):
            g = jax.grad(loss_fn)(x)
            x = x + step_size * jnp.sign(g)
            x = jnp.minimum(jnp.maximum(x, inputs - epsilon),
                            inputs + epsilon)
            return jnp.clip(x, 0.0, 1.0)  # reference clamps to image range

        return jax.lax.fori_loop(0, num_steps, body, x0)

    def run(inputs, targets, key=None, init_noise=None):
        inputs = jnp.asarray(inputs)
        if init_noise is None:
            key = key if key is not None else jax.random.PRNGKey(0)
            init_noise = jax.random.uniform(key, inputs.shape,
                                            minval=-epsilon, maxval=epsilon)
        return gen(inputs, jnp.asarray(targets), jnp.asarray(init_noise))

    return run


def gen_profiling_adv_inputs(model, inputs, key=None, quant=False,
                             bit_config=None, epsilon=0.3, step_size=0.01,
                             num_steps=50, init_noise=None):
    """modeldiff_p2.gen_adv_inputs (:180-194): pseudo-targets are
    (mean(clean logits) − clean logits) × 1000; labels are unused."""
    fwd = _engine_forward(model, quant, bit_config)
    inputs = jnp.asarray(inputs)
    clean = fwd(inputs)
    y = (jnp.mean(clean, axis=0) - clean) * 1000.0
    attack = make_pseudo_label_pgd(fwd, epsilon, step_size, num_steps)
    return attack(inputs, y, key=key, init_noise=init_noise)


def _hashable_bits(bit_config):
    """Normalize a bit_config for use as a jit-cache key: ints pass
    through (Swin's uniform mode), sequences become int tuples — both
    model families' forward_q accept either form (swin.forward_q
    normalizes per-slot tuples via normalize_bit_config)."""
    if bit_config is None or isinstance(bit_config, int):
        return bit_config
    return tuple(int(b) for b in bit_config)


def _engine_forward(model, quant, bit_config):
    """logits-only forward over an engine.QuantizedViT."""
    bit_config = _hashable_bits(bit_config)

    def fwd(x):
        return model._forward_fn(quant, bit_config)(
            model.params, model.qparams, x)

    return fwd


class AttackPGD:
    """Object-style wrapper mirroring the reference API
    (dataset_utility.py:82-191)."""

    def __init__(self, model, epsilon=0.06, step_size=0.01, num_steps=50,
                 bit_config=None, quant=None):
        self.model = model
        self.bit_config = bit_config
        quant = (model.qparams is not None) if quant is None else quant

        def fwd(x):
            return model._forward_fn(quant, self._norm_bits(bit_config))(
                model.params, model.qparams, x)

        self._gen = make_pgd(fwd, epsilon, step_size, num_steps)

    def _norm_bits(self, bc):
        return _hashable_bits(bc)

    def gen_adv_inputs(self, inputs, labels, key=None):
        key = key if key is not None else jax.random.PRNGKey(0)
        return self._gen(jnp.asarray(inputs), jnp.asarray(labels), key)

    def get_seed_inputs(self, n, args=None, rand=False):
        """Reference get_seed_inputs (dataset_utility.py:116-153): a random
        batch of train images (or Gaussian noise with rand=True)."""
        import numpy as np

        if rand:
            return np.random.normal(size=(n, 3, 224, 224)).astype("float32"), \
                np.zeros((n,), "int32")
        import os

        from ..data.imagenet import DataLoader, ImageFolder, build_transform
        from ..models.registry import preprocessing_for

        pp = preprocessing_for(args.model)
        tf = build_transform(mean=pp.mean, std=pp.std, crop_pct=pp.crop_pct)
        ds = ImageFolder(os.path.join(args.data, "train"), tf)
        dl = DataLoader(ds, n, shuffle=True, num_workers=args.num_workers,
                        drop_last=True)
        return next(iter(dl))
