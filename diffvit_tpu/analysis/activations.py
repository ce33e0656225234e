"""Activation harvesting — the functional replacement for forward hooks.

Rebuild of ``get_activations`` (/root/reference/cka_utility.py:26-110).  The
reference hooks QConv2d/QLinear (plus, for un-quantized runs, the Attention /
Mlp modules whose hooks report the cached qkv_output / fc1_output) and sorts
by module registration order.  Our forwards return taps explicitly; this
module selects and orders them to match the reference's hook sets:

* ``bit_config is None`` (FP-style run): parent modules come first in torch's
  named_modules, so per block the order is
  [attn(qkv_output), attn.qkv, attn.proj, mlp(fc1_output), mlp.fc1, mlp.fc2]
  (the attn/qkv and mlp/fc1 rows are duplicate tensors, as in the reference).
* bit_config given: QConv2d/QLinear only — patch conv, per block
  [qkv, proj, fc1, fc2], head — the 50-tap set of SURVEY.md §2.6.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..models import vit as vit_mod


def normalize_activations(act):
    """Per-sample L2 normalization (cka_utility.py:6-19)."""
    act = act.reshape(act.shape[0], -1)
    norm = jnp.linalg.norm(act, axis=1, keepdims=True) + 1e-8
    return act / norm


def _order_for(spec, module_taps: bool):
    order = ["patch_embed.proj"]
    for i in range(spec.depth):
        p = f"blocks.{i}"
        if module_taps:
            order += [f"{p}.attn", f"{p}.attn.qkv", f"{p}.attn.proj",
                      f"{p}.mlp", f"{p}.mlp.fc1", f"{p}.mlp.fc2"]
        else:
            order += [f"{p}.attn.qkv", f"{p}.attn.proj",
                      f"{p}.mlp.fc1", f"{p}.mlp.fc2"]
    order.append("head")
    return order


def get_activations(model, images, bit_config=None, quant=None,
                    normalize_act=False, layer_indices=None):
    """Run ``model`` (engine.QuantizedViT) on ``images`` and return the
    ordered activation list.  ``quant`` defaults to whether the model is
    calibrated, matching the reference where the model's quant flags decide.
    ``layer_indices``: optional single relative index — returns
    ([act], [info]) like cka_utility.py:92-110."""
    if quant is None:
        quant = model.qparams is not None
    taps: list = []
    fn_taps = taps
    if quant:
        out = vit_mod.forward_q(model.params, model.qparams, model.spec,
                                model.cfg, jnp.asarray(images),
                                bit_config, taps=fn_taps)
    else:
        out = vit_mod.forward_fp(model.params, model.spec,
                                 jnp.asarray(images), taps=fn_taps)
    tap_dict = dict(taps)
    order = _order_for(model.spec, module_taps=bit_config is None)
    acts = [tap_dict[name] for name in order]
    infos = [{"relative_index": i, "name": name}
             for i, name in enumerate(order)]
    if layer_indices is not None:
        acts = [acts[layer_indices]]
        infos = [infos[layer_indices]]
    if normalize_act:
        acts = [normalize_activations(a) for a in acts]
    if layer_indices is None:
        return acts
    return acts, infos
