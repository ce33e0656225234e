"""Hybrid CNN-backbone patch embedding.

Functional rebuild of the reference's ``HybridEmbed``
(/root/reference/models/layers_quant.py:495-542): run a CNN backbone,
take its last feature map, project to the embedding dim with a 1x1 conv
and flatten to (B, N, C) tokens.

Upstream this is dead code — every model factory passes
``hybrid_backbone=None`` (vit_fquant.py constructors) and the hermetic
environment ships no timm backbones — so, exactly like upstream, the
module exists but no ViT spec wires it in.  The backbone here is any
callable ``x (B,3,H,W) -> feature (B,Cf,Hf,Wf)`` (or a list/tuple of
features, of which the last is used, matching layers_quant.py:536-540);
the reference's hacky zeros-probe for the feature geometry
(layers_quant.py:511-525) becomes a ``jax.eval_shape`` probe — no FLOPs,
no device.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _last_feature(f):
    return f[-1] if isinstance(f, (list, tuple)) else f


def infer_feature_shape(backbone_fn, img_size=224, in_chans=3):
    """(feature_size (Hf, Wf), feature_dim Cf) of the backbone's last
    feature map — the reference's torch.zeros probe (layers_quant.py:
    511-525) done shape-only via eval_shape."""
    probe = jax.ShapeDtypeStruct((1, in_chans, img_size, img_size),
                                 jnp.float32)
    o = _last_feature(jax.eval_shape(backbone_fn, probe))
    return tuple(o.shape[-2:]), o.shape[1]


def init_hybrid_params(key, backbone_fn, embed_dim, img_size=224,
                       in_chans=3, dtype=jnp.float32):
    """1x1 projection-conv parameters, trunc_normal(0.02) like every other
    linear in this package (vit_fquant.py:641-653 init scheme)."""
    (fh, fw), cf = infer_feature_shape(backbone_fn, img_size, in_chans)
    w = 0.02 * jax.random.truncated_normal(key, -2.0, 2.0, (embed_dim, cf))
    return {"w": w.astype(dtype), "b": jnp.zeros((embed_dim,), dtype),
            "num_patches": fh * fw}


def hybrid_embed(params, backbone_fn, x):
    """backbone -> last feature -> 1x1 conv proj -> (B, N, embed_dim)
    tokens (layers_quant.py:536-542).  The 1x1 conv over an NCHW feature
    map is exactly a channel matmul over flattened positions — MXU-native,
    no conv lowering needed."""
    f = _last_feature(backbone_fn(x))
    b, cf, fh, fw = f.shape
    tokens = f.reshape(b, cf, fh * fw).transpose(0, 2, 1)  # (B, N, Cf)
    return tokens @ params["w"].T + params["b"]
