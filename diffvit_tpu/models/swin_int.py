"""Integer execution path for Swin (real int8 MXU matmuls).

Mirrors models/swin.forward_q with the same numerical contract as
models/vit_int: weights quantized to int8 codes, activations requantized to
int8 before every matmul, integer LayerNorm emitting int8 directly on the
consumer grid, PoT requant epilogues in f32.  Elementwise glue (relative
position bias, shift masks, LIS, residuals, PTF fences) stays in f32 exactly
as the fake-quant semantics dictate.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import QuantConfig
from ..ops.int_layernorm import float_layernorm, int_layernorm
from ..ops.lis import log_int_softmax
from ..ops.quant import fake_quant
from .swin import (SwinSpec, _merge_patches, _unwindows, _windows,
                   block_geometry, normalize_bit_config,
                   relative_position_index, swin_patchify)
from .vit_int import _int_dot, _ln_int8, _quant_w, _requant_i8


def prepare_int(params, qp, spec: SwinSpec, cfg: QuantConfig, bit=None):
    """Bake the calibrated Swin into integer weights + requant scales.
    ``bit``: uniform weight bit or a per-slot {4,8} bit_config (the Swin
    mixed-precision extension; -1 float slots are a fake-quant-path-only
    feature)."""
    bc = normalize_bit_config(spec, bit if bit is not None
                              else cfg.bit_w.bits)
    assert all(b in (4, 8) for b in bc), \
        "integer path supports {4,8} slots (use forward_q for -1 floats)"

    def w_site(path, lin, slot):
        b = bc[slot]
        sw = qp[f"{path}.int{b}.scale"]
        # per-site bit drives the bf16-exactness bound in int_linear
        site = {"w_int": _quant_w(lin["w"], sw, b).T, "sw": sw, "bit": b}
        site["b"] = lin.get("b")
        return site

    ip = {"bit_config": tuple(bc), "layers": [], "qp": qp}
    pe = params["patch_embed"]
    ip["patch"] = w_site("patch.w", pe["proj"], 0)
    ip["patch_norm"] = pe["norm"]
    slot = 1
    for s, stage in enumerate(params["layers"]):
        st = {"blocks": [], "downsample": None}
        for bi, blk in enumerate(stage["blocks"]):
            p = f"layers.{s}.blocks.{bi}"
            st["blocks"].append({
                "norm1": blk["norm1"], "norm2": blk["norm2"],
                "qkv": w_site(f"{p}.attn.qkv.w", blk["qkv"], slot),
                "proj": w_site(f"{p}.attn.proj.w", blk["proj"], slot + 1),
                "fc1": w_site(f"{p}.mlp.fc1.w", blk["fc1"], slot + 2),
                "fc2": w_site(f"{p}.mlp.fc2.w", blk["fc2"], slot + 3),
                "rel_bias_table": blk["rel_bias_table"],
            })
            slot += 4
        if stage["downsample"] is not None:
            ds = stage["downsample"]
            st["downsample"] = {
                "norm": ds["norm"],
                "reduction": w_site(f"layers.{s}.downsample.reduction.w",
                                    ds["reduction"], slot),
            }
            slot += 1
        ip["layers"].append(st)
    ip["norm"] = params["norm"]
    ip["head"] = w_site("head.w", params["head"], slot)

    # static symmetric-activations flag for the codes-carrying residual
    # path (see models/vit_int.prepare_int): True iff every activation
    # zero-point is 0, so fake-quant values can ride as int8 codes
    zps = [v for k, v in qp.items() if k.endswith(".zp")]
    if any(isinstance(z, jax.core.Tracer) for z in zps):
        ip["sym_acts"] = False
    else:
        ip["sym_acts"] = all(bool(jnp.all(jnp.asarray(z) == 0))
                             for z in zps)
    return ip


def forward_q_int(ip, spec: SwinSpec, cfg: QuantConfig, x, *,
                  use_pallas: bool | None = None, pallas_interpret=False,
                  lane_pad=False, attn_v2=False):
    """use_pallas: run window attention through the fused Pallas kernel
    (scores + bias + mask + LIS + attn@v in one kernel; numerically
    identical path up to f32 associativity).  Auto (None) enables it on
    TPU backends, disables on CPU.

    lane_pad: zero-pad every int_linear whose K or N is not a multiple
    of the 128-lane MXU width (stage 0's C=96, stage 1's C=192) up to
    the next multiple, at the matmul boundary only — LN/observer/requant
    semantics untouched, output sliced back, bit-identical (zero rows
    and columns contribute exact zeros).  A measured probe for whether
    XLA's handling of ragged lane dims leaves throughput on the table
    (docs/PERF_ANALYSIS.md 'Swin stage-0 anatomy'); off by default.

    attn_v2: run window attention through the natural-layout
    selection-matrix kernel (fused_swin_attention_v2) instead of the
    round-2 kernel + its qkv pre-transpose.  MEASURED REJECT, off by
    default: bit-identical, but the 3x tiny-dot count (head extract /
    place matmuls) costs 20.9 vs 8.4 ms per stage-0 block segment —
    dot-issue overhead dominates at 7x7-window shapes
    (scripts/ab_swin_attn_seg.py, docs/PERF_ANALYSIS.md round-5 Swin
    anatomy)."""
    if use_pallas is None:
        use_pallas = jax.default_backend() not in ("cpu",)
    qp = ip["qp"]
    bt_a = cfg.bit_a
    eps = spec.ln_eps

    def s(path):
        return qp[f"{path}.scale"]

    def fq(path, t):
        return fake_quant(t, s(path), qp[f"{path}.zp"], bt_a)

    def int_linear(site, x_i8, in_scale):
        # XLA lowers int8 dot_generals poorly on this backend (~10 TOP/s vs
        # 228 in Mosaic / ~114 for bf16 — docs/PERF_ANALYSIS.md).  int8
        # codes are exact in bf16 and the int32 accumulation is exactly
        # reproduced by f32 accumulation while every partial sum stays
        # below 2^24, i.e. when K * 128 * 2^(bit-1) < 2^24 — true for all
        # Swin shapes at int4 and all but stage-4 fc2 at int8.  The bound
        # uses the SITE's bit (per-slot under mixed precision).
        k, n = site["w_int"].shape
        w_int = site["w_int"]
        if lane_pad and (k % 128 or n % 128):
            kp, np_ = -k % 128, -n % 128
            x_i8 = jnp.pad(x_i8, [(0, 0)] * (x_i8.ndim - 1) + [(0, kp)])
            w_int = jnp.pad(w_int, ((0, kp), (0, np_)))
        wbound = 2.0 ** (site["bit"] - 1)
        if k * 128.0 * wbound < 2.0**24:
            acc = jax.lax.dot_general(
                x_i8.astype(jnp.bfloat16),
                w_int.astype(jnp.bfloat16),
                (((x_i8.ndim - 1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        else:
            acc = _int_dot(x_i8, w_int).astype(jnp.float32)
        acc = acc[..., :n]
        y = acc * (in_scale * site["sw"])
        if site["b"] is not None:
            y = y + site["b"]
        return y

    if x.dtype == jnp.int8:
        # pre-encoded qact_input codes (data/imagenet.input_code_lut):
        # ``_requant_i8(swin_patchify(fq(x)))`` IS the codes — patchify
        # only reshuffles — so this skips the on-device u8 LUT gather
        # (see vit_int._embed_front's twin dispatch for the measurement)
        if not spec.input_quant:
            raise ValueError("int8 input codes require input_quant=True")
        p_i8 = swin_patchify(x, spec)
        patches = None
    else:
        if spec.input_quant:
            x = fq("qact_input", x)
        patches = swin_patchify(x, spec)
        p_i8 = _requant_i8(patches, s("qact_input")) if spec.input_quant \
            else None
    if p_i8 is not None:
        h = int_linear(ip["patch"], p_i8, s("qact_input"))
    else:
        wdq = ip["patch"]["w_int"].astype(jnp.float32).T * (
            ip["patch"]["sw"][:, None] if ip["patch"]["sw"].ndim else
            ip["patch"]["sw"])
        h = patches @ wdq.T + ip["patch"]["b"]
    if ip["patch_norm"] is not None:
        h = fq("patch.qact_bn", h)
        if cfg.int_norm:
            h = int_layernorm(h, ip["patch_norm"]["w"], ip["patch_norm"]["b"],
                              s("patch.qact_bn"), s("patch.qact"))
        else:
            h = float_layernorm(h, ip["patch_norm"]["w"],
                                ip["patch_norm"]["b"], eps)
    h = fq("patch.qact", h)
    last_q = "patch.qact"
    B0 = h.shape[0]

    # codes-carrying residual stream (models/vit_int.forward_q_int): carry
    # int8 CODES on the current qact grid instead of f32 fake-quant values
    # — value-identical (zp==0 via sym_acts), 4x less fence/LN HBM traffic
    sym_acts = ip.get("sym_acts", False)
    sym_acts = bool(sym_acts) \
        if not isinstance(sym_acts, jax.core.Tracer) else False
    hc = None
    if use_pallas and cfg.int_norm and sym_acts:
        hc = jnp.clip(jnp.round(h / s(last_q)), bt_a.lower_bound,
                      bt_a.upper_bound).astype(jnp.int8)

    for si, st in enumerate(ip["layers"]):
        for bi, ib in enumerate(st["blocks"]):
            p = f"layers.{si}.blocks.{bi}"
            geom = block_geometry(spec, si, bi)
            res, ws, shift, mask = geom
            nh = spec.num_heads[si]

            if cfg.int_norm:
                x_i8 = _ln_int8(h if hc is None else None, ib["norm1"],
                                s(last_q), s(f"{p}.qact1"), eps, x_codes=hc)
            else:
                y = fq(f"{p}.qact1",
                       float_layernorm(h, ib["norm1"]["w"], ib["norm1"]["b"], eps))
                x_i8 = _requant_i8(y, s(f"{p}.qact1"))
            yw_i8 = _windows(x_i8, res, ws, shift)  # int8 reshapes
            b_, n, c = yw_i8.shape[0], ws * ws, yw_i8.shape[-1]

            npad = (n + 7) // 8 * 8
            attn_v2 = use_pallas and attn_v2
            if use_pallas:
                # pad window ROWS before the qkv matmul so the pad rides
                # the matmul input instead of a separate relayout of the
                # 3x-wider qkv stream (pad rows emit bias codes — they
                # only ever feed masked key columns / sliced-off query
                # rows; see fused_swin_attention_v2)
                yw_i8 = jnp.pad(yw_i8, ((0, 0), (0, npad - n), (0, 0)))

            qkv = int_linear(ib["qkv"], yw_i8, s(f"{p}.qact1"))
            s1 = s(f"{p}.attn.qact1")
            if hc is not None:
                # zp==0 (sym_acts): fq then requant both compute
                # clip(round(y/s1)) — collapse to ONE pass over the
                # (Bw, n, 3C) stream instead of an f32 round trip + requant
                qkv_i8 = _requant_i8(qkv, s1, bt_a.lower_bound,
                                     bt_a.upper_bound)
            else:
                qkv_i8 = _requant_i8(fq(f"{p}.attn.qact1", qkv), s1)
            hd = c // nh

            table_q = fq(f"{p}.attn.qact_table", ib["rel_bias_table"])
            idx = relative_position_index(ws).reshape(-1)
            bias = table_q[idx].reshape(n, n, nh).transpose(2, 0, 1)

            if use_pallas:
                from ..ops.pallas.attention import (fused_swin_attention,
                                                    fused_swin_attention_v2)

                s_a2 = s(f"{p}.attn.qact2")
                bias_p = jnp.pad(bias, ((0, 0), (0, npad - n), (0, npad - n)))
                mask_div = None
                nw = 1
                if mask is not None:
                    nw = mask.shape[0]
                    m = jnp.asarray(mask)
                    mask_div = jnp.pad(
                        m, ((0, 0), (0, npad - n), (0, npad - n))) / s_a2
                scalars = jnp.stack([
                    s1 * s1 * hd**-0.5 / s(f"{p}.attn.qact_attn1"),
                    s(f"{p}.attn.qact_attn1"), 1.0 / s_a2, s_a2,
                    s1 / s(f"{p}.attn.qact3"),
                ]).astype(jnp.float32)
                if attn_v2:
                    o_i8 = fused_swin_attention_v2(
                        qkv_i8, bias_p, mask_div, scalars, num_heads=nh,
                        head_dim=hd, n_real=n, n_windows=nw,
                        bits=cfg.bit_s.bits, lis=cfg.lis,
                        interpret=pallas_interpret)[:, :n]
                else:
                    qkv_p = qkv_i8.reshape(b_, npad, 3, nh, hd) \
                        .transpose(0, 2, 3, 1, 4)
                    o_codes = fused_swin_attention(
                        qkv_p, bias_p, mask_div, scalars, num_heads=nh,
                        n_real=n, n_windows=nw, bits=cfg.bit_s.bits,
                        lis=cfg.lis, interpret=pallas_interpret)
                    o_i8 = o_codes.transpose(0, 2, 1, 3)[:, :n] \
                        .reshape(b_, n, c)
            else:
                qkv_h = qkv_i8.reshape(b_, n, 3, nh, hd) \
                    .transpose(2, 0, 3, 1, 4)
                q8, k8, v8 = qkv_h[0], qkv_h[1], qkv_h[2]
                # int8 x int8 scores exact in bf16/f32 (hd*128*128 < 2^24);
                # avoids XLA's slow int8 dot lowering
                a32 = jax.lax.dot_general(
                    q8.astype(jnp.bfloat16), k8.astype(jnp.bfloat16),
                    (((3,), (3,)), ((0, 1), (0, 1))),
                    preferred_element_type=jnp.float32)
                attn = a32 * (s1 * s1 * hd**-0.5)
                attn = fq(f"{p}.attn.qact_attn1", attn)
                attn = attn + bias[None]
                attn = fq(f"{p}.attn.qact2", attn)
                if mask is not None:
                    nw = mask.shape[0]
                    attn = attn.reshape(b_ // nw, nw, nh, n, n) + \
                        jnp.asarray(mask)[None, :, None]
                    attn = attn.reshape(-1, nh, n, n)
                if cfg.lis:
                    # LIS codes (2^-q) are exact in bf16 -> bf16 MXU matmul
                    attn = log_int_softmax(attn, s(f"{p}.attn.qact2"),
                                           cfg.bit_s).astype(jnp.bfloat16)
                    v_op = v8.astype(jnp.bfloat16)
                else:
                    # float softmax probs are not bf16-exact; stay in f32
                    attn = jax.nn.softmax(attn, axis=-1)
                    v_op = v8.astype(jnp.float32)
                o = jax.lax.dot_general(
                    attn, v_op, (((3,), (2,)), ((0, 1), (0, 1))),
                    preferred_element_type=jnp.float32)
                o = o.transpose(0, 2, 1, 3).reshape(b_, n, c) * s1
                o = fq(f"{p}.attn.qact3", o)
                o_i8 = _requant_i8(o, s(f"{p}.attn.qact3"))
            y = int_linear(ib["proj"], o_i8, s(f"{p}.attn.qact3"))
            if hc is not None:
                # attn.qact4 -> residual -> qact2 on int8 codes
                s_aq4 = s(f"{p}.attn.qact4")
                yq = jnp.clip(jnp.round(y / s_aq4), bt_a.lower_bound,
                              bt_a.upper_bound)
                hs = hc.astype(jnp.float32) * s(last_q) \
                    + _unwindows(yq, res, ws, shift, B0) * s_aq4
                hc = jnp.clip(jnp.round(hs / s(f"{p}.qact2")),
                              bt_a.lower_bound, bt_a.upper_bound) \
                    .astype(jnp.int8)
            else:
                y = fq(f"{p}.attn.qact4", y)
                h = h + _unwindows(y, res, ws, shift, B0)
                h = fq(f"{p}.qact2", h)

            if cfg.int_norm:
                x_i8 = _ln_int8(h if hc is None else None, ib["norm2"],
                                s(f"{p}.qact2"), s(f"{p}.qact3"), eps,
                                x_codes=hc)
            else:
                yf = float_layernorm(h, ib["norm2"]["w"], ib["norm2"]["b"], eps)
                x_i8 = _requant_i8(fq(f"{p}.qact3", yf), s(f"{p}.qact3"))
            if use_pallas:
                from ..ops.pallas.mlp import fused_int_mlp

                bq, lq, cq = x_i8.shape
                rows = bq * lq
                block = 512
                rpad = (rows + block - 1) // block * block
                x_flat = jnp.pad(x_i8.reshape(rows, cq),
                                 ((0, rpad - rows), (0, 0)))
                y = fused_int_mlp(
                    x_flat, ib["fc1"]["w_int"], ib["fc2"]["w_int"],
                    s(f"{p}.qact3") * ib["fc1"]["sw"], ib["fc1"]["b"],
                    s(f"{p}.mlp.qact1") * ib["fc2"]["sw"], ib["fc2"]["b"],
                    s(f"{p}.mlp.qact2"), s(f"{p}.mlp.qact1"),
                    block_rows=block, emit_codes=hc is not None,
                    interpret=pallas_interpret)
                y = y[:rows].reshape(bq, lq, cq)
            else:
                y = int_linear(ib["fc1"], x_i8, s(f"{p}.qact3"))
                y = jax.nn.gelu(y, approximate=False)
                y = fq(f"{p}.mlp.qact1", y)
                y_i8 = _requant_i8(y, s(f"{p}.mlp.qact1"))
                y = int_linear(ib["fc2"], y_i8, s(f"{p}.mlp.qact1"))
                y = fq(f"{p}.mlp.qact2", y)
            if hc is not None:
                # mlp.qact2 codes -> residual -> qact4 on int8 codes
                hs = hc.astype(jnp.float32) * s(f"{p}.qact2") \
                    + y.astype(jnp.float32) * s(f"{p}.mlp.qact2")
                hc = jnp.clip(jnp.round(hs / s(f"{p}.qact4")),
                              bt_a.lower_bound, bt_a.upper_bound) \
                    .astype(jnp.int8)
            else:
                h = h + y
                h = fq(f"{p}.qact4", h)
            last_q = f"{p}.qact4"

        if st["downsample"] is not None:
            ds = st["downsample"]
            p = f"layers.{si}.downsample"
            if hc is not None:
                # patch merge is a pure permutation — runs on the int8
                # codes; the merged grid is the 4x-tiled source grid
                hcm = _merge_patches(hc, spec.stage_resolution(si))
                x_i8 = _ln_int8(None, ds["norm"], jnp.tile(s(last_q), 4),
                                s(f"{p}.qact1"), eps, x_codes=hcm)
                y = int_linear(ds["reduction"], x_i8, s(f"{p}.qact1"))
                hc = jnp.clip(jnp.round(y / s(f"{p}.qact2")),
                              bt_a.lower_bound, bt_a.upper_bound) \
                    .astype(jnp.int8)
            else:
                h = _merge_patches(h, spec.stage_resolution(si))
                if cfg.int_norm:
                    x_i8 = _ln_int8(h, ds["norm"], jnp.tile(s(last_q), 4),
                                    s(f"{p}.qact1"), eps)
                else:
                    yf = float_layernorm(h, ds["norm"]["w"],
                                         ds["norm"]["b"], eps)
                    x_i8 = _requant_i8(fq(f"{p}.qact1", yf),
                                       s(f"{p}.qact1"))
                h = int_linear(ds["reduction"], x_i8, s(f"{p}.qact1"))
                h = fq(f"{p}.qact2", h)
            last_q = f"{p}.qact2"

    if cfg.int_norm:
        x_i8 = _ln_int8(h if hc is None else None, ip["norm"], s(last_q),
                        s("qact2"), eps, x_codes=hc)
        h = x_i8.astype(jnp.float32) * s("qact2")
    else:
        h = fq("qact2", float_layernorm(h, ip["norm"]["w"], ip["norm"]["b"], eps))
    h = jnp.mean(h, axis=1)
    h = fq("qact3", h)
    h_i8 = _requant_i8(h, s("qact3"))
    logits = _int_dot(h_i8, ip["head"]["w_int"]).astype(jnp.float32) \
        * (s("qact3") * ip["head"]["sw"]) + ip["head"]["b"]
    return fq("act_out", logits)
