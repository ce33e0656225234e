"""CKA comparison drivers.

Rebuild of ``compute_cka_internal`` / ``compute_cka_with_adversarial``
(/root/reference/cka_utility.py:116-334): multi-iteration shuffled-batch CKA
accumulation, pickled heatmaps with the reference's directory/file layout.
"""
from __future__ import annotations

import os
import pickle

import jax
import numpy as np

from .activations import get_activations
from .cka import MinibatchAdvCKA, MinibatchCKA
from .pgd import AttackPGD


def compute_cka_internal(model, batch_iter_factory, *, cka_iter=10,
                         cka_batch_iter=10, normalize_act=False,
                         result_name="cka_result.pkl", log=print):
    """Single-model layer x layer CKA (cka_utility.py:116-188).
    ``batch_iter_factory()`` -> iterable of (images, labels) shuffled batches
    (the reference's get_dataset)."""
    sample_images, _ = next(iter(batch_iter_factory()))
    sample_acts = get_activations(model, sample_images, bit_config=None,
                                  normalize_act=normalize_act)
    cka = MinibatchCKA(len(sample_acts))

    for it in range(cka_iter):
        for ci, (images, _) in enumerate(batch_iter_factory()):
            acts = get_activations(model, images, bit_config=None,
                                   normalize_act=normalize_act)
            cka.update_state(acts)
            if ci >= cka_batch_iter:
                break
        log(f"cka iteration {it}")

    heatmap = np.asarray(cka.result())
    os.makedirs(result_name, exist_ok=True)
    with open(os.path.join(result_name, "_heatmap.pkl"), "wb") as f:
        pickle.dump(heatmap, f)
    return heatmap


def compute_cka_with_adversarial(model1, model2, batch_iter_factory, *,
                                 model1_bit_config=None,
                                 model2_bit_config=None, cka_iter=10,
                                 cka_batch_iter=10, normalize_act=False,
                                 result_name="cka_result.pkl", key=None,
                                 pgd_steps=50, log=print):
    """Two-model adversarial-DDV CKA (cka_utility.py:194-334): PGD inputs
    generated against model1, MinibatchAdvCKA accumulated over
    clean/adversarial activation pairs of both models."""
    key = key if key is not None else jax.random.PRNGKey(0)
    attack = AttackPGD(model1, epsilon=0.06, step_size=0.01,
                       num_steps=pgd_steps, bit_config=model1_bit_config)

    sample_images, _ = next(iter(batch_iter_factory()))
    n1 = len(get_activations(model1, sample_images,
                             bit_config=model1_bit_config,
                             normalize_act=normalize_act))
    n2 = len(get_activations(model2, sample_images,
                             bit_config=model2_bit_config,
                             normalize_act=normalize_act))
    cka = MinibatchAdvCKA(n1, n2)

    for it in range(cka_iter):
        for ci, (images, labels) in enumerate(batch_iter_factory()):
            key, sub = jax.random.split(key)
            adv = attack.gen_adv_inputs(images, labels, sub)
            a1 = get_activations(model1, images, model1_bit_config,
                                 normalize_act=normalize_act)
            a1_adv = get_activations(model1, adv, model1_bit_config,
                                     normalize_act=normalize_act)
            a2 = get_activations(model2, images, model2_bit_config,
                                 normalize_act=normalize_act)
            a2_adv = get_activations(model2, adv, model2_bit_config,
                                     normalize_act=normalize_act)
            cka.update_state(a1, a1_adv, a2, a2_adv)
            if ci >= cka_batch_iter:
                break
        log(f"adv-cka iteration {it}")

    heatmap = np.asarray(cka.result())
    os.makedirs(result_name, exist_ok=True)
    base = os.path.basename(os.path.normpath(result_name))
    with open(os.path.join(result_name, base + "_heatmap.pkl"), "wb") as f:
        pickle.dump(heatmap, f)
    return heatmap
