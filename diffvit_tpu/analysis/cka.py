"""Minibatch CKA / adversarial-DDV CKA accumulators.

Rebuild of /root/reference/efficient_CKA.py (Nguyen et al.-style minibatch
unbiased-HSIC CKA) and DDV_CKA.py (clean x adversarial Gram variant) on jnp.
The per-layer Gram construction is vmapped over layers where shapes allow;
the accumulators are plain arrays updated functionally.
"""
from __future__ import annotations

import jax.numpy as jnp


def centered_gram(x):
    """Unbiased-HSIC centered Gram vector of a (N, ...) activation
    (efficient_CKA.py:20-39): G = X Xᵀ with zeroed diagonal, doubly centered
    with the unbiased means, diagonal re-zeroed, flattened."""
    x = x.reshape(x.shape[0], -1)
    gram = x @ x.T
    return _center(gram)


def centered_adv_gram(x, adv_x):
    """DDV Gram: X · X_advᵀ between clean and adversarial activations of the
    same layer (DDV_CKA.py:21-41)."""
    x = x.reshape(x.shape[0], -1)
    adv_x = adv_x.reshape(adv_x.shape[0], -1)
    return _center(x @ adv_x.T)


def _center(gram):
    n = gram.shape[0]
    eye = jnp.eye(n, dtype=bool)
    gram = jnp.where(eye, 0.0, gram.astype(jnp.float32))
    means = jnp.sum(gram, axis=0) / (n - 2)
    means = means - jnp.sum(means) / (2 * (n - 1))
    gram = gram - means[None, :] - means[:, None]
    gram = jnp.where(eye, 0.0, gram)
    return gram.reshape(-1)


class MinibatchCKA:
    """Accumulates layer x layer HSIC across minibatches
    (efficient_CKA.py:41-77)."""

    def __init__(self, num_layers, num_layers2=None, across_models=False):
        num_layers2 = num_layers2 or num_layers
        self.hsic = jnp.zeros((num_layers, num_layers2), jnp.float32)
        self.across_models = across_models
        if across_models:
            self.hsic1 = jnp.zeros((num_layers,), jnp.float32)
            self.hsic2 = jnp.zeros((num_layers2,), jnp.float32)

    def update_state(self, activations):
        grams = jnp.stack([centered_gram(a) for a in activations])
        self.hsic = self.hsic + grams @ grams.T

    def update_state_across_models(self, activations1, activations2):
        assert self.hsic.shape[0] == len(activations1)
        assert self.hsic.shape[1] == len(activations2)
        g1 = jnp.stack([centered_gram(a) for a in activations1])
        g2 = jnp.stack([centered_gram(a) for a in activations2])
        self.hsic = self.hsic + g1 @ g2.T
        self.hsic1 = self.hsic1 + jnp.einsum("ij,ij->i", g1, g1)
        self.hsic2 = self.hsic2 + jnp.einsum("ij,ij->i", g2, g2)

    def result(self):
        m = self.hsic
        if self.across_models:
            n1 = jnp.sqrt(self.hsic1)
            n2 = jnp.sqrt(self.hsic2)
            return m / n1[:, None] / n2[None, :]
        norm = jnp.sqrt(jnp.diagonal(m))
        return m / norm[:, None] / norm[None, :]


class MinibatchAdvCKA:
    """Cross-model CKA over clean x adversarial DDV Grams
    (DDV_CKA.py:43-82)."""

    def __init__(self, num_layers, num_layers2=None):
        num_layers2 = num_layers2 or num_layers
        self.hsic = jnp.zeros((num_layers, num_layers2), jnp.float32)
        self.hsic1 = jnp.zeros((num_layers,), jnp.float32)
        self.hsic2 = jnp.zeros((num_layers2,), jnp.float32)

    def update_state(self, m1_acts, m1_adv_acts, m2_acts, m2_adv_acts):
        g1 = jnp.stack([centered_adv_gram(a, b)
                        for a, b in zip(m1_acts, m1_adv_acts)])
        g2 = jnp.stack([centered_adv_gram(a, b)
                        for a, b in zip(m2_acts, m2_adv_acts)])
        self.hsic = self.hsic + g1 @ g2.T
        self.hsic1 = self.hsic1 + jnp.einsum("ij,ij->i", g1, g1)
        self.hsic2 = self.hsic2 + jnp.einsum("ij,ij->i", g2, g2)

    def result(self):
        return self.hsic / jnp.sqrt(self.hsic1)[:, None] \
            / jnp.sqrt(self.hsic2)[None, :]
