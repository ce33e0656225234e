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


def _order_for_swin(spec):
    """Swin tap ordering = torch named_modules registration order of the
    QConv2d/QLinear set (the reference's hooks are module-type generic,
    cka_utility.py:44-47, so a working upstream Swin would be harvested in
    exactly this order): patch conv, per stage [per block qkv/proj/fc1/fc2,
    then the stage's downsample reduction], head.  Swin's WindowAttention /
    Mlp are distinct classes from the ViT ones the FP-mode hooks import, so
    module-taps mode uses the same set."""
    order = ["patch_embed.proj"]
    for s, depth in enumerate(spec.depths):
        for b in range(depth):
            p = f"layers.{s}.blocks.{b}"
            order += [f"{p}.attn.qkv", f"{p}.attn.proj",
                      f"{p}.mlp.fc1", f"{p}.mlp.fc2"]
        if s < spec.num_layers - 1:
            order.append(f"layers.{s}.downsample.reduction")
    order.append("head")
    return order


def get_activations(model, images, bit_config=None, quant=None,
                    normalize_act=False, layer_indices=None):
    """Run ``model`` (engine.QuantizedViT) on ``images`` and return the
    ordered activation list.  ``quant`` defaults to whether the model is
    calibrated, matching the reference where the model's quant flags decide.
    Supports both ViT/DeiT and Swin models (the reference's hooks are
    module-type generic).  ``layer_indices``: optional single relative
    index — returns ([act], [info]) like cka_utility.py:92-110."""
    if quant is None:
        quant = model.qparams is not None
    taps: list = []
    fn_taps = taps
    is_swin = getattr(model, "is_swin", False)
    if is_swin:
        from ..models import swin as swin_mod

        if quant:
            bit = int(bit_config) if isinstance(bit_config, (int, float)) \
                else (int(bit_config[0]) if bit_config is not None
                      else model.cfg.bit_w.bits)
            out = swin_mod.forward_q(model.params, model.qparams, model.spec,
                                     model.cfg, jnp.asarray(images),
                                     bit=bit, taps=fn_taps)
        else:
            out = swin_mod.forward_fp(model.params, model.spec,
                                      jnp.asarray(images), taps=fn_taps)
    elif quant:
        out = vit_mod.forward_q(model.params, model.qparams, model.spec,
                                model.cfg, jnp.asarray(images),
                                bit_config, taps=fn_taps)
    else:
        out = vit_mod.forward_fp(model.params, model.spec,
                                 jnp.asarray(images), taps=fn_taps)
    tap_dict = dict(taps)
    order = _order_for_swin(model.spec) if is_swin else \
        _order_for(model.spec, module_taps=bit_config is None)
    if is_swin:
        # window-partitioned sites tap as (B*nW, ws^2, C); fold the window
        # axis back into features so every activation is batch-major (the
        # CKA/DDV consumers flatten per sample)
        b = jnp.asarray(images).shape[0]
        acts = [tap_dict[name].reshape(b, -1) for name in order]
    else:
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
