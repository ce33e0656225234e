"""ModelDiff-style DDV (decision-distance-vector) similarity.

Rebuild of /root/reference/modeldiff_p2.py:45-131: named activation points
(~16 per block), DDV = per-sample cosine(clean, adversarial) per layer, and
the cross-model similarity report (mean cosine of normalized DDVs, in %).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..models import vit as vit_mod


def ddv_tap_names(spec):
    """The named hook points of modeldiff_p2.add_hooks (:50-82), mapped to
    the taps our forwards expose (QAct-internal points are represented by
    their producing site)."""
    names = ["patch_embed.proj"]
    for i in range(spec.depth):
        p = f"blocks.{i}"
        names += [f"{p}.attn.qkv", f"{p}.attn.proj",
                  f"{p}.mlp.fc1", f"{p}.mlp.fc2"]
    names.append("head")
    return names


def _acts(model, images, quant):
    taps: list = []
    if quant:
        out = vit_mod.forward_q(model.params, model.qparams, model.spec,
                                model.cfg, jnp.asarray(images), None,
                                taps=taps)
    else:
        out = vit_mod.forward_fp(model.params, model.spec,
                                 jnp.asarray(images), taps=taps)
    d = dict(taps)
    d["__logits__"] = out
    return d


def compute_ddv(model, normal_inputs, adv_inputs, quant=None):
    """{site: ddv vector} — per-sample cosine similarity of clean vs
    adversarial activation, L2-normalized per layer
    (modeldiff_p2.py:84-116)."""
    if quant is None:
        quant = model.qparams is not None
    normal = _acts(model, normal_inputs, quant)
    adv = _acts(model, adv_inputs, quant)
    out = {}
    for key in ddv_tap_names(model.spec):
        a = np.asarray(normal[key]).reshape(len(normal[key]), -1)
        b = np.asarray(adv[key]).reshape(len(adv[key]), -1)
        a = a / (np.linalg.norm(a, axis=1, keepdims=True))
        b = b / (np.linalg.norm(b, axis=1, keepdims=True))
        ddv = np.sum(a * b, axis=1)
        norm = np.linalg.norm(ddv)
        out[key] = ddv / norm if norm != 0 else ddv
    return out


def ddv_similarities(source_ddv, target_ddv, log=print):
    """Per-layer similarity% between two models' DDVs
    (modeldiff_p2.py:118-131)."""
    sims = {}
    for key in source_ddv:
        a = source_ddv[key] / np.linalg.norm(source_ddv[key])
        b = target_ddv[key] / np.linalg.norm(target_ddv[key])
        sims[key] = float(np.dot(a, b) * 100)
        log(f"{key} layer similarity: {sims[key]:.2f}%")
    return sims
