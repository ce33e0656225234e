"""Functional, TPU-native quantized Swin Transformer (T/S/B).

Rebuild of /root/reference/models/swin_quant.py as pure functions over
explicit pytrees: window attention with quantized relative-position bias
(qact_table, swin_quant.py:129,194-203), shifted-window masks
(swin_quant.py:317-344), PatchMerging with integer LayerNorm over the 4-way
concat, and the per-stage quantizer chaining (BasicLayer, :553-564).

Divergences from the reference — the *intended* behavior per SURVEY.md §2.3:
* The reference's Swin path crashes as committed (it calls the
  research-modified Mlp/PatchEmbed with the old FQ-ViT arity, ⚠️1).  This
  rebuild wires Swin with the original FQ-ViT quantization structure that
  the modified call sites broke: Mlp = fc1→GELU→qact1→fc2→qact2 (the block's
  qact3 quantizes the Mlp input), no SmoothQuant.
* PatchMerging passes ``in_scale_expand=4`` to the integer LayerNorm as
  FQ-ViT intended; the reference's positional-arg slip lands the 4 on
  ``out_quantizer_scale`` instead (⚠️2, swin_quant.py:463).
* The reference Swin forward takes no bit_config (swin_quant.py:813-817)
  and supports only one uniform weight bit.  This rebuild EXTENDS the §2.6
  contract to Swin: forward_q also accepts a per-slot bit_config ([patch] +
  per block [qkv, proj, fc1, fc2] + per-stage reduction + [head]) with
  {4, 8, -1} semantics, and forward_q_bits gives the bit-traced
  one-compile search path — per-layer mixed precision for Swin is a
  capability the reference lacks.
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..config import QuantConfig
from ..ops.bit_types import BIT_TYPE_DICT
from ..ops.int_layernorm import float_layernorm, int_layernorm
from ..ops.lis import log_int_softmax
from ..ops.quant import fake_quant
from .vit import (_calib_act_site, _calib_weight_site, _fq,
                  _observe_act_site, _q_weight)


@dataclasses.dataclass(frozen=True)
class SwinSpec:
    name: str
    embed_dim: int
    depths: tuple
    num_heads: tuple
    window: int = 7
    patch_size: int = 4
    img_size: int = 224
    mlp_ratio: int = 4
    num_classes: int = 1000
    input_quant: bool = True
    patch_norm: bool = True
    ln_eps: float = 1e-5

    @property
    def num_layers(self):
        return len(self.depths)

    @property
    def num_features(self):
        return int(self.embed_dim * 2 ** (self.num_layers - 1))

    @property
    def patch_grid(self):
        g = self.img_size // self.patch_size
        return (g, g)

    def stage_dim(self, s):
        return int(self.embed_dim * 2**s)

    def stage_resolution(self, s):
        g = self.patch_grid[0]
        return (g // 2**s, g // 2**s)


SWIN_SPECS = {
    "swin_tiny": SwinSpec("swin_tiny", 96, (2, 2, 6, 2), (3, 6, 12, 24)),
    "swin_small": SwinSpec("swin_small", 96, (2, 2, 18, 2), (3, 6, 12, 24)),
    "swin_base": SwinSpec("swin_base", 128, (2, 2, 18, 2), (4, 8, 16, 32)),
}


# ---------------------------------------------------------------------------
# Static geometry: windows, relative position index, shift masks
# ---------------------------------------------------------------------------

def window_partition(x, ws):
    """(B, H, W, C) -> (B*nW, ws*ws, C)  (swin_quant.py:19-33)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // ws, ws, w // ws, ws, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, ws * ws, c)


def window_reverse(windows, ws, h, w):
    """(B*nW, ws*ws, C) -> (B, H, W, C)  (swin_quant.py:36-51)."""
    c = windows.shape[-1]
    b = windows.shape[0] // (h * w // ws // ws)
    x = windows.reshape(b, h // ws, w // ws, ws, ws, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h, w, c)


def relative_position_index(ws):
    """(ws*ws, ws*ws) int index into the (2ws-1)^2 bias table
    (swin_quant.py:90-105)."""
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws),
                                  indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += ws - 1
    rel[:, :, 1] += ws - 1
    rel[:, :, 0] *= 2 * ws - 1
    return rel.sum(-1)


def shift_attn_mask(resolution, ws, shift):
    """(nW, ws*ws, ws*ws) 0/-100 mask for SW-MSA (swin_quant.py:317-344)."""
    if shift == 0:
        return None
    h, w = resolution
    img = np.zeros((1, h, w, 1), np.float32)
    cnt = 0
    for hs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
        for wsl in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
            img[:, hs, wsl, :] = cnt
            cnt += 1
    # pure-numpy window partition (this helper runs at trace time)
    mw = img.reshape(1, h // ws, ws, w // ws, ws, 1)
    mw = mw.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws)
    mask = mw[:, None, :] - mw[:, :, None]
    return np.where(mask != 0, -100.0, 0.0).astype(np.float32)


def block_geometry(spec: SwinSpec, stage: int, blk: int):
    """(resolution, window, shift, mask) for a block, with the reference's
    window clamp when the resolution is tiny (swin_quant.py:265-269)."""
    res = spec.stage_resolution(stage)
    ws = spec.window
    shift = 0 if blk % 2 == 0 else ws // 2
    if min(res) <= ws:
        shift = 0
        ws = min(res)
    return res, ws, shift, shift_attn_mask(res, ws, shift)


# ---------------------------------------------------------------------------
# Params
# ---------------------------------------------------------------------------

def init_swin_params(spec: SwinSpec, key, dtype=jnp.float32):
    keys = iter(jax.random.split(key, 4 + 16 * sum(spec.depths)))

    def tn(shape, std=0.02):
        return (std * jax.random.truncated_normal(next(keys), -2.0, 2.0,
                                                  shape)).astype(dtype)

    def lin(cout, cin, bias=True):
        d = {"w": tn((cout, cin))}
        d["b"] = jnp.zeros((cout,), dtype) if bias else None
        return d

    def ln(c):
        return {"w": jnp.ones((c,), dtype), "b": jnp.zeros((c,), dtype)}

    params = {
        "patch_embed": {
            "proj": lin(spec.embed_dim, 3 * spec.patch_size**2),
            "norm": ln(spec.embed_dim) if spec.patch_norm else None,
        },
        "layers": [],
        "norm": ln(spec.num_features),
        "head": lin(spec.num_classes, spec.num_features),
    }
    for s in range(spec.num_layers):
        dim = spec.stage_dim(s)
        _, ws, _, _ = block_geometry(spec, s, 0)
        stage = {"blocks": [], "downsample": None}
        for _ in range(spec.depths[s]):
            stage["blocks"].append({
                "norm1": ln(dim),
                "qkv": lin(3 * dim, dim),
                "proj": lin(dim, dim),
                "rel_bias_table": tn(((2 * ws - 1) ** 2, spec.num_heads[s])),
                "norm2": ln(dim),
                "fc1": lin(spec.mlp_ratio * dim, dim),
                "fc2": lin(dim, spec.mlp_ratio * dim),
            })
        if s < spec.num_layers - 1:
            stage["downsample"] = {
                "norm": ln(4 * dim),
                "reduction": lin(2 * dim, 4 * dim, bias=False),
            }
        params["layers"].append(stage)
    return params


def swin_patchify(x, spec: SwinSpec):
    """NCHW -> (B, grid*grid, 3*ps*ps), flattening matching torch Conv2d
    weight.reshape(Cout, -1)."""
    b = x.shape[0]
    g, p = spec.patch_grid[0], spec.patch_size
    x = x.reshape(b, 3, g, p, g, p).transpose(0, 2, 4, 1, 3, 5)
    return x.reshape(b, g * g, 3 * p * p)


def flops_list(spec: SwinSpec):
    """Per-quantized-matmul MAC counts (patch conv, per block
    [qkv, proj, fc1, fc2], per-stage reduction, head)."""
    fl = [3 * spec.patch_size**2 * spec.embed_dim * spec.patch_grid[0] ** 2]
    for s in range(spec.num_layers):
        dim = spec.stage_dim(s)
        n = spec.stage_resolution(s)[0] ** 2
        for _ in range(spec.depths[s]):
            fl += [n * dim * 3 * dim, n * dim * dim,
                   n * dim * spec.mlp_ratio * dim,
                   n * spec.mlp_ratio * dim * dim]
        if s < spec.num_layers - 1:
            fl.append((n // 4) * 4 * dim * 2 * dim)
    fl.append(spec.num_features * spec.num_classes)
    return fl


def bit_slot_groups(spec: SwinSpec):
    """Slot-index groups for the mixed-precision candidate sampler: within
    a block (qkv, proj) share a bit and (fc1, fc2) share a bit (the
    reference's ViT pair-doubling, test_quant.py:264-283, carried to the
    Swin extension); each downsample reduction and the head draw their own
    bit.  Slot 0 (patch conv) stays pinned to 8 by the sampler."""
    groups = []
    slot = 1
    for s in range(spec.num_layers):
        for _ in range(spec.depths[s]):
            groups.append([slot, slot + 1])
            groups.append([slot + 2, slot + 3])
            slot += 4
        if s < spec.num_layers - 1:
            groups.append([slot])
            slot += 1
    groups.append([slot])  # head
    return groups


def num_bit_slots(spec: SwinSpec) -> int:
    """Quantized-linear count (patch conv + 4 per block + per-stage
    reduction + head) = the length of the Swin bit_config / flops_list /
    (global_distance + 1)."""
    return 1 + 4 * sum(spec.depths) + (spec.num_layers - 1) + 1


# ---------------------------------------------------------------------------
# Shared block math (mode-parameterized)
# ---------------------------------------------------------------------------

def _attn_core(x, blk, spec, stage, geom, softmax_fn, qact_fns):
    """Window attention on (B*nW, N, C) windows.  ``qact_fns`` maps site
    name -> fn(x) applied at each QAct fence (identity during calibration
    observation happens inside the fns)."""
    res, ws, shift, mask = geom
    nh = spec.num_heads[stage]
    b_, n, c = x.shape
    hd = c // nh

    qkv = qact_fns["qkv"](x)  # linear + qact1
    qkv = qkv.reshape(b_, n, 3, nh, hd).transpose(2, 0, 3, 1, 4)
    q, k, v = qkv[0], qkv[1], qkv[2]
    attn = (q * (hd**-0.5)) @ k.transpose(0, 1, 3, 2)
    attn = qact_fns["qact_attn1"](attn)

    table_q = qact_fns["qact_table"](blk["rel_bias_table"])
    idx = relative_position_index(ws).reshape(-1)
    bias = table_q[idx].reshape(n, n, nh).transpose(2, 0, 1)
    attn = attn + bias[None]
    attn = qact_fns["qact2"](attn)

    if mask is not None:
        nw = mask.shape[0]
        attn = attn.reshape(b_ // nw, nw, nh, n, n) + \
            jnp.asarray(mask)[None, :, None]
        attn = attn.reshape(-1, nh, n, n)
    attn = softmax_fn(attn)

    x = (attn @ v).transpose(0, 2, 1, 3).reshape(b_, n, c)
    x = qact_fns["qact3"](x)
    x = qact_fns["proj"](x)
    return qact_fns["qact4"](x)


def _windows(x, res, ws, shift):
    b, l, c = x.shape
    h, w = res
    x = x.reshape(b, h, w, c)
    if shift > 0:
        x = jnp.roll(x, (-shift, -shift), axis=(1, 2))
    return window_partition(x, ws)


def _unwindows(xw, res, ws, shift, b):
    h, w = res
    c = xw.shape[-1]
    x = window_reverse(xw.reshape(-1, ws, ws, c), ws, h, w)
    if shift > 0:
        x = jnp.roll(x, (shift, shift), axis=(1, 2))
    return x.reshape(b, h * w, c)


# ---------------------------------------------------------------------------
# Float forward
# ---------------------------------------------------------------------------

def forward_fp(params, spec: SwinSpec, x, taps=None, w_in_taps=None):
    """``w_in_taps``: optional list collecting (site, input) pairs per
    weight site — the FP-branch inputs of the AdaRound asymmetric
    reconstruction (calib/adaround.py), mirroring forward_q's."""
    def tap(name, t):
        if taps is not None:
            taps.append((name, t))

    def wtap(name, t):
        if w_in_taps is not None:
            w_in_taps.append((name, t))

    eps = spec.ln_eps
    pe = params["patch_embed"]
    patches = swin_patchify(x, spec)
    wtap("patch", patches)
    h = patches @ pe["proj"]["w"].T + pe["proj"]["b"]
    tap("patch_embed.proj", h)
    if pe["norm"] is not None:
        h = float_layernorm(h, pe["norm"]["w"], pe["norm"]["b"], eps)

    for s, stage in enumerate(params["layers"]):
        for bi, blk in enumerate(stage["blocks"]):
            geom = block_geometry(spec, s, bi)
            res, ws, shift, _ = geom
            shortcut = h
            y = float_layernorm(h, blk["norm1"]["w"], blk["norm1"]["b"], eps)
            yw = _windows(y, res, ws, shift)

            def id_(t):
                return t

            def qkv_fn(t):
                wtap(f"layers.{s}.blocks.{bi}.attn.qkv", t)
                out = t @ blk["qkv"]["w"].T + blk["qkv"]["b"]
                tap(f"layers.{s}.blocks.{bi}.attn.qkv", out)
                return out

            def proj_fn(t):
                wtap(f"layers.{s}.blocks.{bi}.attn.proj", t)
                out = t @ blk["proj"]["w"].T + blk["proj"]["b"]
                tap(f"layers.{s}.blocks.{bi}.attn.proj", out)
                return out

            def ctx_fn(t):
                # PSAQ-ViT hooks attn.matmul2's output (attn @ v) for Swin
                # too (generate_data.py:41-45 + build_model.py:53); the
                # qact3 fence sees exactly that tensor merged to
                # (B*nW, n, C) — per-head mean recovered by reshape in
                # analysis/datagen.py.
                tap(f"layers.{s}.blocks.{bi}.attn.ctx", t)
                return t

            aw = _attn_core(
                yw, blk, spec, s, geom,
                partial(jax.nn.softmax, axis=-1),
                {"qkv": qkv_fn, "qact_attn1": id_, "qact_table": id_,
                 "qact2": id_, "qact3": ctx_fn, "proj": proj_fn,
                 "qact4": id_})
            h = shortcut + _unwindows(aw, res, ws, shift, h.shape[0])

            y = float_layernorm(h, blk["norm2"]["w"], blk["norm2"]["b"], eps)
            wtap(f"layers.{s}.blocks.{bi}.mlp.fc1", y)
            y1 = y @ blk["fc1"]["w"].T + blk["fc1"]["b"]
            tap(f"layers.{s}.blocks.{bi}.mlp.fc1", y1)
            y = jax.nn.gelu(y1, approximate=False)
            wtap(f"layers.{s}.blocks.{bi}.mlp.fc2", y)
            y = y @ blk["fc2"]["w"].T + blk["fc2"]["b"]
            tap(f"layers.{s}.blocks.{bi}.mlp.fc2", y)
            h = h + y
        if stage["downsample"] is not None:
            ds = stage["downsample"]
            h = _merge_patches(h, spec.stage_resolution(s))
            h = float_layernorm(h, ds["norm"]["w"], ds["norm"]["b"], eps)
            wtap(f"layers.{s}.downsample.reduction", h)
            h = h @ ds["reduction"]["w"].T
            tap(f"layers.{s}.downsample.reduction", h)

    h = float_layernorm(h, params["norm"]["w"], params["norm"]["b"], eps)
    h = jnp.mean(h, axis=1)  # AdaptiveAvgPool1d over tokens
    wtap("head", h)
    logits = h @ params["head"]["w"].T + params["head"]["b"]
    tap("head", logits)
    return logits


def _merge_patches(x, res):
    """2x2 patch concat: (B, H*W, C) -> (B, H/2*W/2, 4C)
    (swin_quant.py:455-462)."""
    b, l, c = x.shape
    h, w = res
    x = x.reshape(b, h, w, c)
    x0 = x[:, 0::2, 0::2]
    x1 = x[:, 1::2, 0::2]
    x2 = x[:, 0::2, 1::2]
    x3 = x[:, 1::2, 1::2]
    return jnp.concatenate([x0, x1, x2, x3], -1).reshape(b, -1, 4 * c)


# ---------------------------------------------------------------------------
# Calibration (single batch, float pass computing every site's qparams)
# ---------------------------------------------------------------------------

def calibrate(params, spec: SwinSpec, cfg: QuantConfig, x, stats=None,
              _observe=None):
    """Single-batch calibration (reference protocol), or — with ``stats`` —
    finalize on this batch merged with running stats from prior observe
    passes; with ``_observe`` (a states dict) run an observe-only pass
    updating it (see calibrate_batches).  Observe-only batches run float
    softmax: the LIS scale does not exist yet, matching the reference's
    --calib-iter behavior (test_quant.py:245-246 loop semantics)."""
    qp: dict = {}
    dist: list = []
    eps = spec.ln_eps
    ob_ln = cfg.observer_a_ln

    def act(path, t, observer=None):
        if _observe is not None:
            return _observe_act_site(_observe, path, t, cfg, observer=observer)
        return _calib_act_site(qp, path, t, cfg, observer=observer,
                               stats=stats)

    def weight(path, w, xin, record_distance=True):
        if _observe is None:
            _calib_weight_site(qp, dist, path, w, xin, cfg,
                               record_distance=record_distance)

    if spec.input_quant:
        act("qact_input", x)
    pe = params["patch_embed"]
    patches = swin_patchify(x, spec)
    weight("patch.w", pe["proj"]["w"], patches, record_distance=False)
    h = patches @ pe["proj"]["w"].T + pe["proj"]["b"]
    if pe["norm"] is not None:
        act("patch.qact_bn", h)
        h = float_layernorm(h, pe["norm"]["w"], pe["norm"]["b"], eps)
    act("patch.qact", h)

    for s, stage in enumerate(params["layers"]):
        for bi, blk in enumerate(stage["blocks"]):
            p = f"layers.{s}.blocks.{bi}"
            geom = block_geometry(spec, s, bi)
            res, ws, shift, mask = geom
            shortcut = h
            y = float_layernorm(h, blk["norm1"]["w"], blk["norm1"]["b"], eps)
            y = act(f"{p}.qact1", y)
            yw = _windows(y, res, ws, shift)

            def qkv_fn(t):
                weight(f"{p}.attn.qkv.w", blk["qkv"]["w"], t)
                out = t @ blk["qkv"]["w"].T + blk["qkv"]["b"]
                return act(f"{p}.attn.qact1", out)

            def proj_fn(t):
                weight(f"{p}.attn.proj.w", blk["proj"]["w"], t)
                return t @ blk["proj"]["w"].T + blk["proj"]["b"]

            def softmax_fn(a):
                # LIS runs on qact2's scale (swin_quant.py:211-213), which
                # was just calibrated in the qact2 fence below.  Observe-only
                # passes run float softmax (no scale yet).
                if cfg.lis and _observe is None:
                    return log_int_softmax(a, qp[f"{p}.attn.qact2.scale"],
                                           cfg.bit_s)
                return jax.nn.softmax(a, axis=-1)

            aw = _attn_core(
                yw, blk, spec, s, geom, softmax_fn,
                {"qkv": qkv_fn,
                 "qact_attn1": lambda t: act(f"{p}.attn.qact_attn1", t),
                 "qact_table": lambda t: act(f"{p}.attn.qact_table", t),
                 "qact2": lambda t: act(f"{p}.attn.qact2", t),
                 "qact3": lambda t: act(f"{p}.attn.qact3", t),
                 "proj": proj_fn,
                 "qact4": lambda t: act(f"{p}.attn.qact4", t)})
            h = shortcut + _unwindows(aw, res, ws, shift, h.shape[0])
            h = act(f"{p}.qact2", h, observer=ob_ln)

            y = float_layernorm(h, blk["norm2"]["w"], blk["norm2"]["b"], eps)
            y = act(f"{p}.qact3", y)
            weight(f"{p}.mlp.fc1.w", blk["fc1"]["w"], y)
            y = y @ blk["fc1"]["w"].T + blk["fc1"]["b"]
            y = jax.nn.gelu(y, approximate=False)
            y = act(f"{p}.mlp.qact1", y)
            weight(f"{p}.mlp.fc2.w", blk["fc2"]["w"], y)
            y = y @ blk["fc2"]["w"].T + blk["fc2"]["b"]
            # Mlp.qact2 is a PTF site (layers_quant.py:186-191)
            y = act(f"{p}.mlp.qact2", y, observer=ob_ln)
            h = h + y
            h = act(f"{p}.qact4", h, observer=ob_ln)

        if stage["downsample"] is not None:
            ds = stage["downsample"]
            p = f"layers.{s}.downsample"
            h = _merge_patches(h, spec.stage_resolution(s))
            h = float_layernorm(h, ds["norm"]["w"], ds["norm"]["b"], eps)
            h = act(f"{p}.qact1", h)
            weight(f"{p}.reduction.w", ds["reduction"]["w"], h)
            h = h @ ds["reduction"]["w"].T
            h = act(f"{p}.qact2", h, observer=ob_ln)

    h = float_layernorm(h, params["norm"]["w"], params["norm"]["b"], eps)
    h = act("qact2", h)
    h = jnp.mean(h, axis=1)
    h = act("qact3", h)
    weight("head.w", params["head"]["w"], h)
    logits = h @ params["head"]["w"].T + params["head"]["b"]
    act("act_out", logits)
    return qp, jnp.asarray(dist)


def calibrate_batches(params, spec: SwinSpec, cfg: QuantConfig, batches):
    """Multi-batch calibration: observe running stats on batches[:-1], then
    finalize all scales on the last batch merged with the accumulated stats
    — the reference's intended --calib-iter protocol (mirrors
    vit.calibrate_batches)."""
    batches = list(batches)
    if len(batches) == 1:
        return calibrate(params, spec, cfg, batches[0])
    states: dict = {}
    for x in batches[:-1]:
        calibrate(params, spec, cfg, jnp.asarray(x), _observe=states)
    return calibrate(params, spec, cfg, jnp.asarray(batches[-1]),
                     stats=states)


# ---------------------------------------------------------------------------
# Quantized forward
# ---------------------------------------------------------------------------

def normalize_bit_config(spec: SwinSpec, bit):
    """Swin bit_config: an int (uniform, the reference's only mode,
    swin_quant.py:813-817) or a per-slot list over the §2.6-style contract
    GENERALIZED to Swin — [patch conv] + per block [qkv, proj, fc1, fc2] +
    per-stage downsample reduction + [head], flops_list order.  Values
    4/8 select the calibrated per-bit scales; -1 runs the slot in float
    and flips the LN feeding it back to float mode (vit_fquant.py:429-430
    semantics carried over)."""
    n = num_bit_slots(spec)
    if bit is None or isinstance(bit, (int, np.integer)):
        b = int(bit) if bit is not None else None
        return tuple([b] * n) if b is not None else None
    bc = tuple(int(v) for v in bit)
    assert len(bc) == n, f"Swin bit_config needs {n} entries, got {len(bc)}"
    return bc


def forward_q(params, qp, spec: SwinSpec, cfg: QuantConfig, x, bit=None,
              taps=None, w_in_taps=None, ste: bool = False):
    """Fully-quantized Swin inference.  ``bit``: uniform weight bit
    (reference behavior) or a per-slot bit_config (see
    normalize_bit_config) — the per-layer mixed-precision extension the
    reference lacks for Swin.  ``w_in_taps``: optional (site, input)
    collection per weight site for the AdaRound reconstruction
    (calib/adaround.py).  ``ste``: straight-through rounding for the QAT
    path (primal values identical; see models/vit.forward_q)."""
    bc = normalize_bit_config(spec, bit if bit is not None
                              else cfg.bit_w.bits)

    def wfn(path, w, slot):
        if bc[slot] == -1:
            return w
        return _q_weight(qp, path, w, bc[slot], ste)

    def lnfloat(slot):
        return bc[slot] == -1

    return _forward_q_body(params, qp, spec, cfg, x, wfn, lnfloat, taps,
                           w_in_taps, ste)


def _forward_q_body(params, qp, spec: SwinSpec, cfg: QuantConfig, x, wfn,
                    lnfloat, taps=None, w_in_taps=None, ste: bool = False):
    """Shared quantized-forward body: ``wfn(qp_path, w, slot)`` supplies
    the (fake-quantized / float / bit-traced) weight per slot;
    ``lnfloat(slot)`` flips the LN feeding that slot to float (static
    mode only)."""
    bt_a = cfg.bit_a
    eps = spec.ln_eps

    def tap(name, t):
        if taps is not None:
            taps.append((name, t))

    def wtap(name, t):
        if w_in_taps is not None:
            w_in_taps.append((name, t))

    def norm(ln, x_, in_path, out_path, consumer_slot, expand=1):
        if not cfg.int_norm or lnfloat(consumer_slot):
            return float_layernorm(x_, ln["w"], ln["b"], eps)
        return int_layernorm(x_, ln["w"], ln["b"], qp[f"{in_path}.scale"],
                             qp[f"{out_path}.scale"], in_scale_expand=expand,
                             ste=ste)

    if spec.input_quant:
        x = _fq(qp, "qact_input", x, bt_a, ste)
    pe = params["patch_embed"]
    patches = swin_patchify(x, spec)
    wtap("patch", patches)
    h = patches @ wfn("patch.w", pe["proj"]["w"], 0).T + pe["proj"]["b"]
    tap("patch_embed.proj", h)
    if pe["norm"] is not None:
        h = _fq(qp, "patch.qact_bn", h, bt_a, ste)
        h = norm(pe["norm"], h, "patch.qact_bn", "patch.qact", 0)
    h = _fq(qp, "patch.qact", h, bt_a, ste)
    last_q = "patch.qact"
    slot = 1  # 0 was the patch conv; flops_list order from here

    for s, stage in enumerate(params["layers"]):
        for bi, blk in enumerate(stage["blocks"]):
            p = f"layers.{s}.blocks.{bi}"
            s_qkv, s_proj, s_fc1, s_fc2 = slot, slot + 1, slot + 2, slot + 3
            slot += 4
            geom = block_geometry(spec, s, bi)
            res, ws, shift, mask = geom
            shortcut = h
            y = norm(blk["norm1"], h, last_q, f"{p}.qact1", s_qkv)
            y = _fq(qp, f"{p}.qact1", y, bt_a, ste)
            yw = _windows(y, res, ws, shift)

            def qkv_fn(t, p=p, blk=blk, s_qkv=s_qkv):
                wtap(f"{p}.attn.qkv", t)
                out = t @ wfn(f"{p}.attn.qkv.w", blk["qkv"]["w"],
                              s_qkv).T + blk["qkv"]["b"]
                tap(f"{p}.attn.qkv", out)
                return _fq(qp, f"{p}.attn.qact1", out, bt_a, ste)

            def proj_fn(t, p=p, blk=blk, s_proj=s_proj):
                wtap(f"{p}.attn.proj", t)
                out = t @ wfn(f"{p}.attn.proj.w", blk["proj"]["w"],
                              s_proj).T + blk["proj"]["b"]
                tap(f"{p}.attn.proj", out)
                return out

            def softmax_fn(a):
                if cfg.lis:
                    return log_int_softmax(a, qp[f"{p}.attn.qact2.scale"],
                                           cfg.bit_s, ste)
                return jax.nn.softmax(a, axis=-1)

            aw = _attn_core(
                yw, blk, spec, s, geom, softmax_fn,
                {"qkv": qkv_fn,
                 "qact_attn1": lambda t: _fq(qp, f"{p}.attn.qact_attn1", t, bt_a, ste),
                 "qact_table": lambda t: _fq(qp, f"{p}.attn.qact_table", t, bt_a, ste),
                 "qact2": lambda t: _fq(qp, f"{p}.attn.qact2", t, bt_a, ste),
                 "qact3": lambda t: _fq(qp, f"{p}.attn.qact3", t, bt_a, ste),
                 "proj": proj_fn,
                 "qact4": lambda t: _fq(qp, f"{p}.attn.qact4", t, bt_a, ste)})
            h = shortcut + _unwindows(aw, res, ws, shift, h.shape[0])
            h = _fq(qp, f"{p}.qact2", h, bt_a, ste)

            y = norm(blk["norm2"], h, f"{p}.qact2", f"{p}.qact3", s_fc1)
            y = _fq(qp, f"{p}.qact3", y, bt_a, ste)
            wtap(f"{p}.mlp.fc1", y)
            y = y @ wfn(f"{p}.mlp.fc1.w", blk["fc1"]["w"], s_fc1).T \
                + blk["fc1"]["b"]
            tap(f"{p}.mlp.fc1", y)
            y = jax.nn.gelu(y, approximate=False)
            y = _fq(qp, f"{p}.mlp.qact1", y, bt_a, ste)
            wtap(f"{p}.mlp.fc2", y)
            y = y @ wfn(f"{p}.mlp.fc2.w", blk["fc2"]["w"], s_fc2).T \
                + blk["fc2"]["b"]
            tap(f"{p}.mlp.fc2", y)
            y = _fq(qp, f"{p}.mlp.qact2", y, bt_a, ste)
            h = h + y
            h = _fq(qp, f"{p}.qact4", h, bt_a, ste)
            last_q = f"{p}.qact4"

        if stage["downsample"] is not None:
            ds = stage["downsample"]
            p = f"layers.{s}.downsample"
            s_red = slot
            slot += 1
            h = _merge_patches(h, spec.stage_resolution(s))
            # in_scale replicated 4x over the concat (⚠️2 fix: expand=4)
            h = norm(ds["norm"], h, last_q, f"{p}.qact1", s_red, expand=4)
            h = _fq(qp, f"{p}.qact1", h, bt_a, ste)
            wtap(f"{p}.reduction", h)
            h = h @ wfn(f"{p}.reduction.w", ds["reduction"]["w"], s_red).T
            tap(f"{p}.reduction", h)
            h = _fq(qp, f"{p}.qact2", h, bt_a, ste)
            last_q = f"{p}.qact2"

    h = norm(params["norm"], h, last_q, "qact2", slot)
    h = _fq(qp, "qact2", h, bt_a, ste)
    h = jnp.mean(h, axis=1)
    h = _fq(qp, "qact3", h, bt_a, ste)
    wtap("head", h)
    logits = h @ wfn("head.w", params["head"]["w"], slot).T \
        + params["head"]["b"]
    tap("head", logits)
    return _fq(qp, "act_out", logits, bt_a, ste)


def forward_q_bits(params, qp, spec: SwinSpec, cfg: QuantConfig, x, bits):
    """Bit-TRACED quantized Swin forward for the mixed-precision search:
    ``bits`` is a (num_bit_slots,) int32 array with entries in {4, 8}; each
    weight site selects between its calibrated int4/int8 fake-quant
    variants, so ONE compilation serves every candidate (mirrors
    vit.forward_q_bits; the Swin extension the reference lacks)."""
    bt4, bt8 = BIT_TYPE_DICT["int4"], BIT_TYPE_DICT["int8"]
    bits = jnp.asarray(bits, jnp.int32)

    def wfn(path, w, slot):
        s4 = qp[f"{path}.int4.scale"]
        s8 = qp[f"{path}.int8.scale"]
        s4 = s4[:, None] if s4.ndim == 1 and s4.shape[0] == w.shape[0] else s4
        s8 = s8[:, None] if s8.ndim == 1 and s8.shape[0] == w.shape[0] else s8
        return jnp.where(bits[slot] == 4, fake_quant(w, s4, 0.0, bt4),
                         fake_quant(w, s8, 0.0, bt8))

    return _forward_q_body(params, qp, spec, cfg, x, wfn,
                           lambda slot: False, None)


# ---------------------------------------------------------------------------
# Checkpoint conversion (torch hub swin_*.pth, 'model' entry)
# ---------------------------------------------------------------------------

def load_swin_torch_checkpoint(path, spec: SwinSpec):
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("model", ckpt) if isinstance(ckpt, dict) else ckpt
    return convert_swin_torch_state_dict(sd, spec)


def convert_swin_torch_state_dict(sd, spec: SwinSpec):
    """Swin torch state dict (swin_quant.py module tree) -> diffvit_tpu
    param pytree (init_swin_params layout); patch conv (C,3,ps,ps)
    flattens to (C, 3*ps*ps) matching swin_patchify."""
    def g(k):
        v = sd[k]
        return jnp.asarray(np.asarray(v.detach().cpu().numpy()
                                      if hasattr(v, "detach") else v),
                           jnp.float32)

    def lin(prefix, bias=True):
        d = {"w": g(prefix + ".weight")}
        d["b"] = g(prefix + ".bias") if bias else None
        return d

    def ln(prefix):
        return {"w": g(prefix + ".weight"), "b": g(prefix + ".bias")}

    params = {
        "patch_embed": {
            "proj": {"w": g("patch_embed.proj.weight").reshape(
                spec.embed_dim, -1), "b": g("patch_embed.proj.bias")},
            "norm": ln("patch_embed.norm") if spec.patch_norm else None,
        },
        "layers": [],
        "norm": ln("norm"),
        "head": lin("head"),
    }
    for s in range(spec.num_layers):
        stage = {"blocks": [], "downsample": None}
        for bi in range(spec.depths[s]):
            p = f"layers.{s}.blocks.{bi}"
            stage["blocks"].append({
                "norm1": ln(p + ".norm1"),
                "qkv": lin(p + ".attn.qkv"),
                "proj": lin(p + ".attn.proj"),
                "rel_bias_table": g(p + ".attn.relative_position_bias_table"),
                "norm2": ln(p + ".norm2"),
                "fc1": lin(p + ".mlp.fc1"),
                "fc2": lin(p + ".mlp.fc2"),
            })
        if s < spec.num_layers - 1:
            stage["downsample"] = {
                "norm": ln(f"layers.{s}.downsample.norm"),
                "reduction": lin(f"layers.{s}.downsample.reduction",
                                 bias=False),
            }
        params["layers"].append(stage)
    return params
