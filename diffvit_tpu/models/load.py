"""Checkpoint conversion: torch state-dicts and Flax .npz into param pytrees.

Rebuild of the reference's weight loading: torch.hub DeiT/Swin checkpoints
loaded with strict=False (vit_fquant.py:822-828, swin_quant.py:839-844) and
the Google-Brain Flax .npz mapping for vit_base/large
(models/utils.py:12-197).  No network access here — loaders take local
paths; the key mapping is the parity surface.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .vit import ViTSpec


def _t(a):
    return jnp.asarray(np.asarray(a), dtype=jnp.float32)


def convert_vit_torch_state_dict(sd, spec: ViTSpec):
    """DeiT/ViT torch checkpoint (the 'model' entry of the hub file) ->
    diffvit_tpu param pytree.  The patch conv (C,3,ps,ps) is flattened to
    (C, 3*ps*ps), matching patchify()'s (Cin, kh, kw) ordering."""
    def g(k):
        v = sd[k]
        if hasattr(v, "detach"):
            v = v.detach().cpu().numpy()
        return np.asarray(v)

    c = spec.embed_dim
    params = {
        "cls_token": _t(g("cls_token")),
        "pos_embed": _t(g("pos_embed")),
        "patch_embed": {
            "w": _t(g("patch_embed.proj.weight").reshape(c, -1)),
            "b": _t(g("patch_embed.proj.bias")),
        },
        "blocks": [],
        "norm": {"w": _t(g("norm.weight")), "b": _t(g("norm.bias"))},
        "head": {"w": _t(g("head.weight")), "b": _t(g("head.bias"))},
    }
    for i in range(spec.depth):
        p = f"blocks.{i}."
        params["blocks"].append({
            "norm1": {"w": _t(g(p + "norm1.weight")), "b": _t(g(p + "norm1.bias"))},
            "qkv": {"w": _t(g(p + "attn.qkv.weight")), "b": _t(g(p + "attn.qkv.bias"))},
            "proj": {"w": _t(g(p + "attn.proj.weight")), "b": _t(g(p + "attn.proj.bias"))},
            "norm2": {"w": _t(g(p + "norm2.weight")), "b": _t(g(p + "norm2.bias"))},
            "fc1": {"w": _t(g(p + "mlp.fc1.weight")), "b": _t(g(p + "mlp.fc1.bias"))},
            "fc2": {"w": _t(g(p + "mlp.fc2.weight")), "b": _t(g(p + "mlp.fc2.bias"))},
        })
    return params


def load_vit_torch_checkpoint(path, spec: ViTSpec):
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("model", ckpt) if isinstance(ckpt, dict) else ckpt
    return convert_vit_torch_state_dict(sd, spec)


def _cubic_weights(frac, a=-0.75):
    """torch bicubic convolution weights (cubic_convolution1/2, a=-0.75)."""
    def w1(x):
        return ((a + 2) * x - (a + 3)) * x * x + 1

    def w2(x):
        return ((a * x - 5 * a) * x + 8 * a) * x - 4 * a

    return np.stack([w2(frac + 1), w1(frac), w1(1 - frac), w2(2 - frac)],
                    axis=-1)


def _torch_bicubic_resize_1d(x, out_size, axis):
    """Separable torch-style bicubic (align_corners=False, half-pixel
    centers, border-clamped taps) along ``axis``."""
    x = np.moveaxis(x, axis, 0)
    in_size = x.shape[0]
    scale = in_size / out_size
    coords = (np.arange(out_size) + 0.5) * scale - 0.5
    i0 = np.floor(coords).astype(int)
    frac = coords - i0
    w = _cubic_weights(frac)  # (out, 4)
    idx = np.clip(i0[:, None] + np.arange(-1, 3)[None, :], 0, in_size - 1)
    out = np.einsum("ot,ot...->o...", w, x[idx])
    return np.moveaxis(out, 0, axis)


def resize_pos_embed(posemb, seq_len_new, num_tokens=1, gs_new=None):
    """Grid resize of ViT position embeddings for resolution changes
    (models/utils.py:85-109): split class tokens, bicubically interpolate
    the grid part (torch F.interpolate semantics: a=-0.75, half-pixel,
    align_corners=False), re-concat."""
    posemb = np.asarray(posemb)
    tok, grid = posemb[:, :num_tokens], posemb[0, num_tokens:]
    gs_old = int(np.sqrt(len(grid)))
    if gs_new is None:
        gs_new = [int(np.sqrt(seq_len_new - num_tokens))] * 2
    grid = grid.reshape(gs_old, gs_old, -1).astype(np.float64)
    grid = _torch_bicubic_resize_1d(grid, gs_new[0], axis=0)
    grid = _torch_bicubic_resize_1d(grid, gs_new[1], axis=1)
    grid = grid.reshape(1, gs_new[0] * gs_new[1], -1)
    return np.concatenate([tok, grid.astype(posemb.dtype)], axis=1)


def convert_vit_npz(npz, spec: ViTSpec):
    """AugReg Flax .npz -> param pytree, mirroring the reference's mapping
    (models/utils.py:118-197): conv kernel (ps,ps,3,C) -> (C, 3*ps*ps);
    per-head q/k/v kernels concatenated into one (3C, C) qkv matrix; Flax
    Dense kernels are (in, out) so they transpose into torch (out, in)."""
    c = spec.embed_dim

    def g(k):
        return np.asarray(npz[k])

    # (ps, ps, 3, C) -> (C, 3, ps, ps) -> (C, 3*ps*ps)
    kern = g("embedding/kernel").transpose(3, 2, 0, 1).reshape(c, -1)
    pos = g("Transformer/posembed_input/pos_embedding")
    if pos.shape[1] != spec.seq_len:
        pos = resize_pos_embed(pos, spec.seq_len)
    params = {
        "cls_token": _t(g("cls")),
        "pos_embed": _t(pos),
        "patch_embed": {"w": _t(kern), "b": _t(g("embedding/bias"))},
        "blocks": [],
        "norm": {"w": _t(g("Transformer/encoder_norm/scale")),
                 "b": _t(g("Transformer/encoder_norm/bias"))},
        "head": {"w": _t(g("head/kernel").T), "b": _t(g("head/bias"))},
    }
    for i in range(spec.depth):
        p = f"Transformer/encoderblock_{i}/"
        at = p + "MultiHeadDotProductAttention_1/"

        def qkv_w(name):
            # (C, heads, head_dim) -> (C, C) -> torch layout (C_out, C_in)
            return g(at + name + "/kernel").reshape(c, c).T

        def qkv_b(name):
            return g(at + name + "/bias").reshape(c)

        w_qkv = np.concatenate(
            [qkv_w("query"), qkv_w("key"), qkv_w("value")], axis=0)
        b_qkv = np.concatenate(
            [qkv_b("query"), qkv_b("key"), qkv_b("value")], axis=0)
        params["blocks"].append({
            "norm1": {"w": _t(g(p + "LayerNorm_0/scale")),
                      "b": _t(g(p + "LayerNorm_0/bias"))},
            "qkv": {"w": _t(w_qkv), "b": _t(b_qkv)},
            "proj": {"w": _t(g(at + "out/kernel").reshape(c, c).T),
                     "b": _t(g(at + "out/bias"))},
            "norm2": {"w": _t(g(p + "LayerNorm_2/scale")),
                      "b": _t(g(p + "LayerNorm_2/bias"))},
            "fc1": {"w": _t(g(p + "MlpBlock_3/Dense_0/kernel").T),
                    "b": _t(g(p + "MlpBlock_3/Dense_0/bias"))},
            "fc2": {"w": _t(g(p + "MlpBlock_3/Dense_1/kernel").T),
                    "b": _t(g(p + "MlpBlock_3/Dense_1/bias"))},
        })
    return params


def load_vit_npz(path, spec: ViTSpec):
    with np.load(path) as npz:
        return convert_vit_npz(npz, spec)
