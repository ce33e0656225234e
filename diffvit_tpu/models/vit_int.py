"""Integer execution path: real int8/int4 matmuls instead of fake-quant.

The reference simulates quantization — fp32 matmuls over
quantize/dequantized values (quantizer/base.py:42-45); there are no integer
kernels anywhere in it (SURVEY.md §0).  This module is the TPU-native
"exceed the reference" layer: ``prepare_int`` bakes the calibrated
QuantParams + a static bit_config into integer weights and PoT requant
scales, and ``forward_q_int`` runs the whole network on the MXU's native
int8×int8→int32 path:

* weights are stored as int8 (int4 values live in [-8,7] within int8 lanes —
  the MXU consumes int8 operands either way; bit-packing is an HBM
  bandwidth optimization handled by the Pallas kernels),
* integer LayerNorm emits int8 directly on the consumer's
  (channel_scale × act_scale) grid, so the qkv/fc1 matmul needs no separate
  activation-quantize pass,
* attention runs q/k/v as int8 on the qact1 grid; Log-Int-Softmax consumes
  the integer attention scores directly and its 2^-q outputs are exact in
  bfloat16, so attn@v is a bf16 MXU matmul with f32 accumulation (exact:
  products and partial sums stay below 2^24),
* every requant is round(int32_acc * 2^k) — the PoT shift the P2-ViT paper
  builds silicon for; XLA fuses these epilogues into the matmuls.

Numerical contract: identical to forward_q up to f32 accumulation order
(int32 accumulation is exact where fake-quant sums in f32), verified by
tests/test_int_path.py.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import QuantConfig
from ..ops.bit_types import BIT_TYPE_DICT
from ..ops.int_layernorm import float_layernorm, get_mn
from ..ops.lis import log_int_softmax_from_int
from ..ops.quant import fake_quant
from .vit import ViTSpec, num_bit_slots, patchify

I8 = jnp.int8
I32 = jnp.int32


def _quant_w(w, scale, bit):
    """weight -> integer codes held in int8."""
    bt = BIT_TYPE_DICT[f"int{bit}"]
    s = scale[:, None] if scale.ndim == 1 else scale
    q = jnp.clip(jnp.round(w / s), bt.lower_bound, bt.upper_bound)
    return q.astype(I8)


def _requant_i8(y, scale, lb=-128, ub=127):
    """f32 -> int8 codes on ``scale`` grid."""
    return jnp.clip(jnp.round(y / scale), lb, ub).astype(I8)


def _int_dot(x_i8, w_i8_t):
    """(.., K) int8 @ (K, N) int8 -> int32 on the MXU."""
    return jax.lax.dot_general(
        x_i8, w_i8_t, (((x_i8.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=I32)


def prepare_int(params, qp, spec: ViTSpec, cfg: QuantConfig, bit_config=None):
    """Bake (params, qparams, bit_config) into an integer-model pytree.
    Host-side, run once per bit_config.  -1 layers keep their f32 weights."""
    if bit_config is None:
        bit_config = (cfg.bit_w.bits,) * num_bit_slots(spec)
    bit_config = tuple(int(v) for v in bit_config)

    ip = {"bit_config": bit_config, "blocks": []}

    def qscale(path):
        return qp[f"{path}.scale"]

    # patch conv
    pb = bit_config[0]
    pe = params["patch_embed"]
    if pb == -1:
        ip["patch"] = {"w": pe["w"], "b": pe["b"], "fp": True}
    elif not spec.input_quant:
        # no input QAct (vit_large): the conv input is unquantized f32, so
        # only the weight is quantized — run a f32 matmul on the
        # dequantized weight, exactly like forward_q
        bt = BIT_TYPE_DICT[f"int{pb}"]
        sw = qp[f"patch.w.int{pb}.scale"]
        s = sw[:, None] if sw.ndim == 1 else sw
        ip["patch"] = {"w": fake_quant(pe["w"], s, 0.0, bt), "b": pe["b"],
                       "fp": True}
    else:
        sw = qp[f"patch.w.int{pb}.scale"]
        ip["patch"] = {
            "w_int": _quant_w(pe["w"], sw, pb).T,
            "b": pe["b"], "fp": False,
            # out mult (Cout,) or scalar: s_in * s_w
            "mult": qscale("qact_input") * sw,
        }
    for k in ("qact_input", "patch.qact", "qact_embed", "qact_pos", "qact1",
              "qact2", "act_out"):
        if k == "qact_input" and not spec.input_quant:
            continue
        ip[k] = {"scale": qscale(k), "zp": qp[f"{k}.zp"]}
    ip["cls_token"] = params["cls_token"]
    ip["pos_embed"] = params["pos_embed"]
    ip["norm"] = params["norm"]

    for i, blk in enumerate(params["blocks"]):
        p = f"blocks.{i}"
        b_qkv, b_proj, b_fc1, b_fc2 = bit_config[4 * i + 1: 4 * i + 5]
        ib = {"norm1": blk["norm1"], "norm2": blk["norm2"]}

        def smooth_site(path, lin, bit, ln_ch=None):
            if bit == -1:
                return {"w": lin["w"], "b": lin["b"], "fp": True}
            if cfg.smoothquant:
                idx = cfg.bit_pool.index(bit)
                ch = qp[f"{path}.sq.channel_scale"][idx]
                s_x = qp[f"{path}.qact0.scale"][idx]
                sw = qp[f"{path}.w.int{bit}.scale"][idx]
                w_s = lin["w"] * ch
            else:
                ch = 1.0
                s_x = qp[f"{path}.qact0.scale"]
                sw = qp[f"{path}.w.int{bit}.scale"]
                w_s = lin["w"]
            site = {
                "w_int": _quant_w(w_s, sw, bit).T,  # (Cin, Cout)
                "b": lin["b"], "fp": False,
                "in_scale": ch * s_x,     # per-channel input quant grid
                "mult": s_x * sw,         # int32 -> f32 output multiplier
            }
            if ln_ch is not None and cfg.smoothquant:
                # norm2 emits on the *attention's* channel scale
                # (vit_fquant.py:464); the LN codes must be rescaled by
                # ch_attn/ch_mlp before this matmul consumes them
                site["ln_out_scale"] = s_x * ln_ch
                site["ln_rescale"] = ln_ch / ch
            return site

        def qkv_head_blocks(site, bit):
            """Per-head weight layout for the fully-fused attention
            kernel: (H, Cin, D) int8 blocks + (3, H, D) multipliers/bias
            — prepared once, so the kernel needs no transposes at all."""
            h, d = spec.num_heads, spec.head_dim
            c = spec.embed_dim
            codes = site["w_int"].T  # (3C, Cin)
            codes = codes.reshape(3, h, d, c).transpose(0, 1, 3, 2)
            mult = jnp.broadcast_to(site["mult"], (3 * c,)).reshape(3, h, d)
            b3 = site["b"].reshape(3, h, d)
            site["wq_h"], site["wk_h"], site["wv_h"] = \
                codes[0], codes[1], codes[2]
            site["mult_h"] = mult.astype(jnp.float32)
            site["bias_h"] = b3.astype(jnp.float32)

        def plain_site(path, lin, bit, in_scale):
            if bit == -1:
                return {"w": lin["w"], "b": lin["b"], "fp": True}
            sw = qp[f"{path}.int{bit}.scale"]
            return {"w_int": _quant_w(lin["w"], sw, bit).T,
                    "b": lin["b"], "fp": False, "mult": in_scale * sw}

        ib["qkv"] = smooth_site(f"{p}.attn.qkv", blk["qkv"], b_qkv)
        if not ib["qkv"]["fp"]:
            qkv_head_blocks(ib["qkv"], b_qkv)
        ib["proj"] = plain_site(f"{p}.attn.proj.w", blk["proj"], b_proj,
                                qscale(f"{p}.attn.qact2"))
        a_idx = cfg.bit_pool.index(b_qkv) if b_qkv != -1 else -1
        attn_ch = qp[f"{p}.attn.qkv.sq.channel_scale"][a_idx] \
            if cfg.smoothquant else None
        ib["fc1"] = smooth_site(f"{p}.mlp.fc1", blk["fc1"], b_fc1,
                                ln_ch=attn_ch)
        ib["fc2"] = plain_site(f"{p}.mlp.fc2.w", blk["fc2"], b_fc2,
                               qscale(f"{p}.mlp.qact1"))
        for k in ("attn.qact1", "attn.qact_attn1", "attn.qact2", "attn.qact3",
                  "qact2", "mlp.qact1", "mlp.qact2", "qact4"):
            ib[k] = {"scale": qscale(f"{p}.{k}"), "zp": qp[f"{p}.{k}.zp"]}
        ip["blocks"].append(ib)

    hb = bit_config[-1]
    if hb == -1:
        ip["head"] = {"w": params["head"]["w"], "b": params["head"]["b"],
                      "fp": True}
    else:
        sw = qp[f"head.w.int{hb}.scale"]
        ip["head"] = {"w_int": _quant_w(params["head"]["w"], sw, hb).T,
                      "b": params["head"]["b"], "fp": False,
                      "mult": qscale("qact2") * sw}

    # Static symmetric-activations flag for the codes-carrying residual
    # path (forward_q_int's pallas fast path): carrying int8 CODES between
    # the fence chains instead of f32 fake-quant values is value-identical
    # iff every activation zero-point on the stream is 0 (always true for
    # the reference's symmetric int8 QActs; the asymmetric-uint8 QAct is
    # documented-unused upstream).  prepare_int is host-side so zps are
    # concrete; under tracing the check degrades to False (slow-path).
    zps = [v["zp"] for v in ip.values()
           if isinstance(v, dict) and "zp" in v]
    for ib in ip["blocks"]:
        zps += [v["zp"] for v in ib.values()
                if isinstance(v, dict) and "zp" in v]
    if any(isinstance(z, jax.core.Tracer) for z in zps):
        ip["sym_acts"] = False
    else:
        ip["sym_acts"] = all(bool(jnp.all(jnp.asarray(z) == 0))
                             for z in zps)
    return ip


def _ln_int8(x, ln, in_scale, out_scale_vec, eps, a_bits=8, rescale=None,
             x_codes=None):
    """Integer LayerNorm emitting int8 codes on ``out_scale_vec`` grid —
    the M·2^-N math of ops/int_layernorm.int_layernorm with the final
    dequant folded away.  ``rescale``: optional per-channel grid conversion
    applied to the raw LN codes before clipping (the reference's
    attn-vs-mlp channel-scale mismatch at norm2, vit_fquant.py:464).
    ``x_codes``: optional precomputed input codes on the ``in_scale`` grid
    (the codes-carrying residual path) — skips the round(x/in_scale)
    recompute AND the f32 read of x (4x the HBM of the int8 codes)."""
    c = ln["w"].shape[-1]
    in_scale = jnp.broadcast_to(jnp.asarray(in_scale), (c,))
    out_scale = jnp.broadcast_to(jnp.asarray(out_scale_vec), (c,))
    x_q = x_codes.astype(jnp.float32) if x_codes is not None \
        else jnp.round(x / in_scale)
    in_scale1 = jnp.min(in_scale)
    x_q = x_q * jnp.round(in_scale / in_scale1)
    sum_x = jnp.sum(x_q, axis=-1)
    sum_x2 = jnp.sum(x_q * x_q, axis=-1)
    mean = (sum_x / c) * in_scale1
    std = (in_scale1 / c) * jnp.sqrt(c * sum_x2 - sum_x**2)
    a = (in_scale1 / std)[..., None] * ln["w"] / out_scale
    m, n = get_mn(jnp.abs(a))
    b = jnp.round((ln["b"] - (mean / std)[..., None] * ln["w"])
                  / out_scale * (2.0**n))
    y = jnp.round((jnp.sign(a) * m * x_q + b) / (2.0**n))
    if rescale is not None:
        y = jnp.round(y * rescale)
    lb, ub = -(2 ** (a_bits - 1)), 2 ** (a_bits - 1) - 1
    return jnp.clip(y, lb, ub).astype(I8)


def _fq_site(site, x, bt):
    return fake_quant(x, site["scale"], site["zp"], bt)


def _round_up(n, m):
    return (n + m - 1) // m * m


def _embed_front(ip, spec: ViTSpec, cfg: QuantConfig, x):
    """Input quant -> patch embed -> cls/pos fences -> qact1 fake-quant
    (the stem shared by forward_q_int and the resident serving path).

    int8 input = PRE-ENCODED qact_input codes (data/imagenet.
    input_code_lut applied host-side): value = codes * scale.  Bit-
    identical to the u8/f32 wire — ``_requant_i8(patchify(fq(x)))`` IS
    the codes (patchify only reshuffles) — while deleting the on-device
    u8 LUT gather (~322 ms/step at b256 on the round-5 backend,
    scripts/ab_depth_bisect.py).  Dtype is a static trace property, so
    each wire format is its own executable, like the u8 wire before it."""
    bt_a = cfg.bit_a
    B = x.shape[0]
    pt = ip["patch"]
    if x.dtype == jnp.int8:
        if not spec.input_quant:
            raise ValueError(
                "int8 input codes require input_quant=True (vit_large-"
                "style models take unquantized input; ship f32 instead)")
        p_int = patchify(x, spec)
        if pt["fp"]:
            h = (p_int.astype(jnp.float32)
                 * ip["qact_input"]["scale"]) @ pt["w"].T + pt["b"]
        else:
            h = _int_dot(p_int, pt["w_int"]).astype(jnp.float32) \
                * pt["mult"] + pt["b"]
        h = _fq_site(ip["patch.qact"], h, bt_a)
        cls = jnp.broadcast_to(ip["cls_token"], (B, 1, spec.embed_dim))
        h = jnp.concatenate([cls, h], axis=1)
        h = _fq_site(ip["qact_embed"], h, bt_a)
        h = h + _fq_site(ip["qact_pos"], ip["pos_embed"], bt_a)
        return _fq_site(ip["qact1"], h, bt_a)
    if spec.input_quant:
        x = _fq_site(ip["qact_input"], x, bt_a)
    patches = patchify(x, spec)
    if pt["fp"]:
        h = patches @ pt["w"].T + pt["b"]
    else:
        p_int = _requant_i8(patches, ip["qact_input"]["scale"])
        h = _int_dot(p_int, pt["w_int"]).astype(jnp.float32) * pt["mult"] + pt["b"]
    h = _fq_site(ip["patch.qact"], h, bt_a)

    cls = jnp.broadcast_to(ip["cls_token"], (B, 1, spec.embed_dim))
    h = jnp.concatenate([cls, h], axis=1)
    h = _fq_site(ip["qact_embed"], h, bt_a)
    h = h + _fq_site(ip["qact_pos"], ip["pos_embed"], bt_a)
    return _fq_site(ip["qact1"], h, bt_a)


def _head_tail(ip, spec: ViTSpec, cfg: QuantConfig, h, hc):
    """Final norm -> cls token -> head -> act_out (shared tail).  ``h`` is
    the f32 residual stream or None; ``hc`` its int8 codes or None (codes
    win when both given, matching forward_q_int's codes path)."""
    bt_a = cfg.bit_a
    eps = spec.ln_eps
    last_scale = ip["blocks"][-1]["qact4"]["scale"]
    head = ip["head"]
    if cfg.int_norm:
        s_out = ip["qact2"]["scale"]
        h_i8 = _ln_int8(h if hc is None else None, ip["norm"], last_scale,
                        s_out, eps, x_codes=hc)[:, 0]
        if head["fp"]:
            logits = (h_i8.astype(jnp.float32) * s_out) @ head["w"].T + head["b"]
        else:
            logits = _int_dot(h_i8, head["w_int"]).astype(jnp.float32) \
                * head["mult"] + head["b"]
    else:
        hf = float_layernorm(h, ip["norm"]["w"], ip["norm"]["b"], eps)[:, 0]
        hf = _fq_site(ip["qact2"], hf, bt_a)
        if head["fp"]:
            logits = hf @ head["w"].T + head["b"]
        else:
            h_i8 = _requant_i8(hf, ip["qact2"]["scale"])
            logits = _int_dot(h_i8, head["w_int"]).astype(jnp.float32) \
                * head["mult"] + head["b"]
    return _fq_site(ip["act_out"], logits, bt_a)


def _block_int(ib, bits4, in_scale, h, hc, spec: ViTSpec, cfg: QuantConfig,
               *, use_pallas, pallas_interpret=False, sym_acts=False,
               lis_fast_override=None):
    """One encoder block of the integer path: (h, hc) -> (h, hc).

    ``h`` is the f32 residual stream (meaningless while ``hc`` is set);
    ``hc`` its int8 CODES on the ``in_scale`` grid (value = hc * in_scale).
    Between two fully-fused blocks the f32 stream never materializes — the
    fences read/write 4x less HBM, the integer LNs consume the codes
    directly, and the MLP kernel emits codes (emit_codes).  Value-identical
    to the f32 path: fake-quant output IS codes*scale (zp==0 guaranteed by
    sym_acts).  Factored out of forward_q_int so the pipeline-parallel
    stage body (parallel/pipeline.py) runs the identical math;
    ``lis_fast_override`` lets callers whose scales are traced (pp stages)
    pass the host-precomputed fast-LIS gate."""
    b_qkv, b_proj, b_fc1, b_fc2 = bits4
    bt_a = cfg.bit_a
    eps = spec.ln_eps
    h_dim, n_heads = spec.head_dim, spec.num_heads
    ref = h if hc is None else hc
    B, N = ref.shape[0], ref.shape[1]

    # ---- attention ----
    qkv_site = ib["qkv"]
    proj_site = ib["proj"]
    fc1_site = ib["fc1"]
    fc2_site = ib["fc2"]
    s1 = ib["attn.qact1"]["scale"]
    s_a = ib["attn.qact_attn1"]["scale"]
    s2 = ib["attn.qact2"]["scale"]
    bt_s = cfg.bit_s
    x_i8 = None
    y = None
    fused2_path = (use_pallas and not qkv_site["fp"]
                   and not proj_site["fp"] and cfg.int_norm
                   and cfg.smoothquant)
    mlp_fused = (use_pallas and cfg.int_norm and not fc1_site["fp"]
                 and not fc2_site["fp"] and b_fc2 != -1)
    codes_path = fused2_path and mlp_fused and sym_acts
    if codes_path and hc is None:
        # enter codes mode: h is a fake-quant output on the in_scale
        # grid, so round(h/in_scale) recovers its codes exactly
        hc = jnp.clip(jnp.round(h / in_scale), bt_a.lower_bound,
                      bt_a.upper_bound).astype(I8)
    elif not codes_path and hc is not None:
        # leave codes mode (fp site / -1 layer in this block)
        h = hc.astype(jnp.float32) * in_scale
        hc = None
    if qkv_site["fp"]:
        y = float_layernorm(h, ib["norm1"]["w"], ib["norm1"]["b"], eps)
        y = y @ qkv_site["w"].T + qkv_site["b"]
    else:
        if codes_path:
            x_i8 = _ln_int8(None, ib["norm1"], in_scale,
                            qkv_site["in_scale"], eps, x_codes=hc)
        elif cfg.int_norm and b_proj != -1:
            x_i8 = _ln_int8(h, ib["norm1"], in_scale, qkv_site["in_scale"], eps)
        else:
            yf = float_layernorm(h, ib["norm1"]["w"], ib["norm1"]["b"], eps)
            x_i8 = _requant_i8(yf, qkv_site["in_scale"])
        if not fused2_path:
            y = _int_dot(x_i8, qkv_site["w_int"]).astype(jnp.float32) \
                * qkv_site["mult"] + qkv_site["b"]

    if not fused2_path:
        qkv_i8 = _requant_i8(y, s1)
    if fused2_path:
        from ..ops.pallas.attention import fused_qkv_attention_v2

        # rows only need sublane (8) alignment; 200 instead of 256 cuts
        # ~22% of the LIS VPU work for the 197-token sequence.
        # (fused_attention_block, which additionally folds proj +
        # residual + fences into the kernel, measured 17% SLOWER here:
        # the f32 residual blocks double per-program DMA and the K=64
        # per-head proj slices starve the MXU — kept as an alternative.
        # v2 runs the qkv projection as one full-width matmul instead
        # of per-head (Cin, 64) slices — 64 output lanes fill half the
        # 128-wide MXU — measured 15.1 -> 13.4 ms/step at b192.)
        npad = _round_up(N, 8)
        x_p = jnp.pad(x_i8, ((0, 0), (0, npad - N), (0, 0)))
        scalars2 = jnp.stack([
            s_a, s1 * s1 * spec.attn_scale / s_a, 1.0 / s1, s1 / s2,
        ]).astype(jnp.float32)
        # static fast-LIS gate: drop the provably-no-op floor/max on
        # exp_int when the (concrete, trace-time) softmax scale is in
        # the validity window — see pallas _lis_body docstring
        from ..ops.pallas.attention import lis_fast_ok

        lis_fast = False
        if lis_fast_override is not None:
            lis_fast = bool(lis_fast_override)
        elif not isinstance(s_a, jax.core.Tracer):
            lis_fast = lis_fast_ok(float(jax.device_get(s_a)))
        o_i8 = fused_qkv_attention_v2(
            x_p, qkv_site["w_int"], qkv_site["mult"], qkv_site["b"],
            scalars2, num_heads=n_heads, head_dim=h_dim,
            n_real=N, bits=bt_s.bits, lis=cfg.lis, lis_fast=lis_fast,
            interpret=pallas_interpret)
        o_i8 = o_i8[:, :, :N]  # (B, H, N, D)
        # proj consumes the head layout via a joint (H, D) contraction
        w_hdc = proj_site["w_int"].reshape(n_heads, h_dim, -1)
        y = jax.lax.dot_general(
            o_i8, w_hdc, (((1, 3), (0, 1)), ((), ())),
            preferred_element_type=I32).astype(jnp.float32) \
            * proj_site["mult"] + proj_site["b"]
    elif use_pallas and not proj_site["fp"]:
        from ..ops.pallas.attention import fused_int_attention

        npad = _round_up(N, 128)
        qkv_p = jnp.pad(qkv_i8, ((0, 0), (0, npad - N), (0, 0)))
        qkv_p = qkv_p.reshape(B, npad, 3, n_heads, h_dim) \
            .transpose(0, 2, 3, 1, 4)  # (B, 3, H, N, D)
        scalars = jnp.stack([s1 * s1 * spec.attn_scale / s_a,
                             s1 / s2, s_a]).astype(jnp.float32)
        o_i8 = fused_int_attention(
            qkv_p, scalars, num_heads=n_heads, n_real=N,
            bits=bt_s.bits, lis=cfg.lis, interpret=pallas_interpret)
        o_i8 = o_i8.transpose(0, 2, 1, 3)[:, :N] \
            .reshape(B, N, spec.embed_dim)
        y = _int_dot(o_i8, proj_site["w_int"]).astype(jnp.float32) \
            * proj_site["mult"] + proj_site["b"]
    else:
        qkv_h = qkv_i8.reshape(B, N, 3, n_heads, h_dim).transpose(2, 0, 3, 1, 4)
        q8, k8, v8 = qkv_h[0], qkv_h[1], qkv_h[2]
        a32 = jax.lax.dot_general(
            q8, k8, (((3,), (3,)), ((0, 1), (0, 1))),
            preferred_element_type=I32)
        a_int = jnp.clip(
            jnp.round(a32.astype(jnp.float32)
                      * (s1 * s1 * spec.attn_scale / s_a)),
            bt_a.lower_bound, bt_a.upper_bound)
        if cfg.lis:
            # LIS codes (2^-q) are exact in bf16 -> bf16 MXU matmul
            attn = log_int_softmax_from_int(a_int, s_a, bt_s).astype(jnp.bfloat16)
            v_op = v8.astype(jnp.bfloat16)
        else:
            # float softmax probs are not bf16-exact; stay in f32
            attn = jax.nn.softmax(a_int * s_a, axis=-1)
            v_op = v8.astype(jnp.float32)
        o = jax.lax.dot_general(
            attn, v_op, (((3,), (2,)), ((0, 1), (0, 1))),
            preferred_element_type=jnp.float32)
        o = o.transpose(0, 2, 1, 3).reshape(B, N, spec.embed_dim) * s1
        if proj_site["fp"]:
            y = _fq_site(ib["attn.qact2"], o, bt_a)
            y = y @ proj_site["w"].T + proj_site["b"]
        else:
            o_i8 = _requant_i8(o, s2)
            y = _int_dot(o_i8, proj_site["w_int"]).astype(jnp.float32) \
                * proj_site["mult"] + proj_site["b"]
    # ---- mlp (+ the qact3/residual/qact2/LN2 fence chain) ----
    if codes_path:
        # int8-codes fences: the f32 residual stream never round-trips
        # HBM — each fence reads/writes codes (4x less traffic), the
        # LN consumes them directly, and the MLP kernel emits codes.
        from ..ops.pallas.mlp import fused_int_mlp

        s3 = ib["attn.qact3"]["scale"]
        s_blk2 = ib["qact2"]["scale"]
        yq3 = jnp.clip(jnp.round(y / s3), bt_a.lower_bound,
                       bt_a.upper_bound)                 # attn.qact3
        hs = hc.astype(jnp.float32) * in_scale + yq3 * s3  # residual
        hc = jnp.clip(jnp.round(hs / s_blk2), bt_a.lower_bound,
                      bt_a.upper_bound).astype(I8)       # qact2
        x_i8 = _ln_int8(None, ib["norm2"], s_blk2,
                        fc1_site.get("ln_out_scale",
                                     fc1_site["in_scale"]), eps,
                        rescale=fc1_site.get("ln_rescale"), x_codes=hc)
        rows = B * N
        block = 512
        rpad = _round_up(rows, block)
        x_flat = jnp.pad(x_i8.reshape(rows, -1),
                         ((0, rpad - rows), (0, 0)))
        y2c = fused_int_mlp(
            x_flat, fc1_site["w_int"], fc2_site["w_int"],
            fc1_site["mult"], fc1_site["b"], fc2_site["mult"],
            fc2_site["b"], ib["mlp.qact2"]["scale"],
            ib["mlp.qact1"]["scale"], block_rows=block,
            emit_codes=True, interpret=pallas_interpret)
        y2c = y2c[:rows].reshape(B, N, -1)
        s_m2 = ib["mlp.qact2"]["scale"]
        s4 = ib["qact4"]["scale"]
        hs = hc.astype(jnp.float32) * s_blk2 \
            + y2c.astype(jnp.float32) * s_m2             # residual
        hc = jnp.clip(jnp.round(hs / s4), bt_a.lower_bound,
                      bt_a.upper_bound).astype(I8)       # qact4
        return h, hc
    if mlp_fused:
        # (A whole-half-block variant that also folds the qact3 /
        # residual / qact2 / integer-LN2 fences into this kernel exists
        # — fused_int_mlp_block — but measured ~1.7 ms/step SLOWER at
        # DeiT-S b192: the f32 y/h input blocks are 8x the int8 code
        # DMA and XLA's fusion of the fence chains beats Mosaic's
        # elementwise lowering of the same math.  Kept as a tested
        # alternative; the default path keeps fences in XLA.)
        from ..ops.pallas.mlp import fused_int_mlp

        y = _fq_site(ib["attn.qact3"], y, bt_a)
        h = _fq_site(ib["qact2"], h + y, bt_a)
        x_i8 = _ln_int8(h, ib["norm2"], ib["qact2"]["scale"],
                        fc1_site.get("ln_out_scale",
                                     fc1_site["in_scale"]), eps,
                        rescale=fc1_site.get("ln_rescale"))
        rows = B * N
        block = 512
        rpad = _round_up(rows, block)
        x_flat = jnp.pad(x_i8.reshape(rows, -1),
                         ((0, rpad - rows), (0, 0)))
        y = fused_int_mlp(
            x_flat, fc1_site["w_int"], fc2_site["w_int"],
            fc1_site["mult"], fc1_site["b"], fc2_site["mult"],
            fc2_site["b"], ib["mlp.qact2"]["scale"],
            ib["mlp.qact1"]["scale"], block_rows=block,
            interpret=pallas_interpret)
        y = y[:rows].reshape(B, N, -1)
        h = _fq_site(ib["qact4"], h + y, bt_a)
    else:
        y = _fq_site(ib["attn.qact3"], y, bt_a)
        h = _fq_site(ib["qact2"], h + y, bt_a)
        if fc1_site["fp"]:
            y = float_layernorm(h, ib["norm2"]["w"], ib["norm2"]["b"], eps)
            y = y @ fc1_site["w"].T + fc1_site["b"]
        else:
            if cfg.int_norm and b_fc2 != -1:
                x_i8 = _ln_int8(h, ib["norm2"], ib["qact2"]["scale"],
                                fc1_site.get("ln_out_scale",
                                             fc1_site["in_scale"]), eps,
                                rescale=fc1_site.get("ln_rescale"))
            else:
                y = float_layernorm(h, ib["norm2"]["w"], ib["norm2"]["b"], eps)
                x_i8 = _requant_i8(y, fc1_site["in_scale"])
            y = _int_dot(x_i8, fc1_site["w_int"]).astype(jnp.float32) \
                * fc1_site["mult"] + fc1_site["b"]
        y = jax.nn.gelu(y, approximate=False)
        if fc2_site["fp"]:
            y = _fq_site(ib["mlp.qact1"], y, bt_a)
            y = y @ fc2_site["w"].T + fc2_site["b"]
        else:
            y_i8 = _requant_i8(y, ib["mlp.qact1"]["scale"])
            y = _int_dot(y_i8, fc2_site["w_int"]).astype(jnp.float32) \
                * fc2_site["mult"] + fc2_site["b"]
        y = _fq_site(ib["mlp.qact2"], y, bt_a)
        h = _fq_site(ib["qact4"], h + y, bt_a)
    return h, hc


def forward_q_int(ip, spec: ViTSpec, cfg: QuantConfig, x, *,
                  use_pallas: bool | None = None, pallas_interpret=False,
                  lis_fast=None):
    """Integer forward pass over a prepared int-model pytree.

    use_pallas: run attention as the fused Pallas kernel (numerically
    identical paths).  Auto (None) enables the fully-fused kernel on TPU
    backends and disables it on CPU (interpret mode only).  (The round-1
    axon INTERNAL error for pallas-inside-fori_loop no longer reproduces
    with the v2 kernel — both host-dispatched and fori_loop chaining work;
    scripts/perf_breakdown.py measures both.)

    lis_fast: optional per-block sequence of host-precomputed fast-LIS
    gates (see attention.lis_fast_ok).  Needed when ``ip``'s scales are
    traced (the select_int_bits search path passes qparams as jit
    arguments) — the in-function concrete-scale check then degrades to
    the slow-LIS path; callers with concrete qparams can leave it None."""
    if use_pallas is None:
        use_pallas = jax.default_backend() not in ("cpu",)

    h = _embed_front(ip, spec, cfg, x)

    bc = ip["bit_config"]
    sym_acts = ip.get("sym_acts", False)
    sym_acts = bool(sym_acts) \
        if not isinstance(sym_acts, jax.core.Tracer) else False
    hc = None
    for i, ib in enumerate(ip["blocks"]):
        in_scale = ip["qact1"]["scale"] if i == 0 \
            else ip["blocks"][i - 1]["qact4"]["scale"]
        h, hc = _block_int(ib, bc[4 * i + 1: 4 * i + 5], in_scale, h, hc,
                           spec, cfg, use_pallas=use_pallas,
                           pallas_interpret=pallas_interpret,
                           sym_acts=sym_acts,
                           lis_fast_override=None if lis_fast is None
                           else lis_fast[i])

    return _head_tail(ip, spec, cfg, h, hc)


def forward_q_int_serve(ip, spec: ViTSpec, cfg: QuantConfig, x, *,
                        packed=None, pallas_interpret=None,
                        microbatch=8):
    """Serving-latency forward: the whole encoder stack runs as ONE
    resident Pallas kernel (ops/pallas/serve.py) instead of ~24 kernels +
    XLA glue.  Measured ~parity with forward_q_int at b1, slower above
    (see serve.py's header for the full verdict).  Same semantics as
    forward_q_int's codes path (up to f32 reduction order in the
    in-kernel LayerNorms; see serve.py).

    ``packed``: the stacked pytree from ops.pallas.serve.prepare_resident
    — pass it explicitly to amortize the host-side packing across calls
    (it is itself jittable-free, plain device arrays).

    ``pallas_interpret``: auto (None) runs the kernel in interpret mode
    on CPU backends (there is no non-pallas fallback for the resident
    path — the single kernel IS the point).

    ``microbatch``: the resident VMEM footprint grows with rows = B*npad
    and exceeds the measured 16 MB scoped-VMEM limit around b16 (DeiT-S);
    batches larger than this chunk through the kernel via lax.map.  None
    disables chunking."""
    from ..ops.pallas.serve import prepare_resident, resident_codes

    if pallas_interpret is None:
        pallas_interpret = jax.default_backend() in ("cpu",)
    if packed is None:
        packed = prepare_resident(ip, spec, cfg)
    bt_a = cfg.bit_a
    B = x.shape[0]
    h = _embed_front(ip, spec, cfg, x)
    N = h.shape[1]
    npad = _round_up(N, 8)
    in_scale = ip["qact1"]["scale"]
    hc = jnp.clip(jnp.round(h / in_scale), bt_a.lower_bound,
                  bt_a.upper_bound).astype(I8)
    hc = jnp.pad(hc, ((0, 0), (0, npad - N), (0, 0)))

    def run_chunk(hc_chunk):  # (b, npad, C) int8 codes -> codes out
        b = hc_chunk.shape[0]
        out = resident_codes(packed, hc_chunk.reshape(b * npad, -1),
                             n_real=N, bits=cfg.bit_s.bits, lis=cfg.lis,
                             nelems=b, interpret=pallas_interpret)
        return out.reshape(b, npad, -1)

    if microbatch is None or B <= microbatch:
        out = run_chunk(hc)
    else:
        pad = (-B) % microbatch
        hcp = jnp.pad(hc, ((0, pad), (0, 0), (0, 0)))
        chunks = hcp.reshape(-1, microbatch, npad, hc.shape[-1])
        out = jax.lax.map(run_chunk, chunks)
        out = out.reshape(-1, npad, out.shape[-1])[:B]
    hc_out = out[:, :N]
    return _head_tail(ip, spec, cfg, None, hc_out)


# ---------------------------------------------------------------------------
# Bit-TRACED integer baking: the mixed-precision search on the int path.
#
# The fake-quant forward_q_bits (models/vit.py) is the reference-parity
# search substrate, but it runs 2.1x slower than the integer path
# (BENCH_MATRIX: deit_small_int4_fake_b192 3,802 vs int 8,171 img/s) and
# the search (test_quant.py:336-407, ~185 evals) is the reference's
# dominant workflow.  In the {4, 8} search space every candidate takes the
# SAME static code path through forward_q_int — fused Pallas attention +
# MLP + codes-carrying fences; only the baked VALUES (weight codes,
# requant multipliers, smooth-quant grids) depend on the bits.  So one
# jitted program can serve every candidate: bake both uniform variants
# once (prepare_int_bits), select per-slot under trace (select_int_bits),
# run forward_q_int on the result.  The per-step select cost is a few
# weight-sized int8 reads (~0.1 ms at DeiT-S) against a ~2x matmul+VPU
# win.
#
# Cross-slot coupling: prepare_int's fc1 site consumes the ATTENTION's
# SmoothQuant channel scale at norm2 (the reference quirk,
# vit_fquant.py:464), so its ln_out_scale/ln_rescale depend on (b_qkv,
# b_fc1) jointly — the two uniform bakes only cover the (4,4)/(8,8)
# diagonal.  prepare_int_bits therefore also stacks the four (b_qkv,
# b_fc1) combinations of those two vectors per block, and select_int_bits
# gathers by the joint index.  A host-side consistency check pins the
# stacked diagonal to the uniform bakes bitwise, so any future coupling
# added to prepare_int that this decomposition misses fails loudly.
# ---------------------------------------------------------------------------

_SITE_SLOT_KEYS = {"qkv": ("w_int", "mult", "in_scale"),
                   "proj": ("w_int", "mult"),
                   "fc1": ("w_int", "mult", "in_scale"),
                   "fc2": ("w_int", "mult")}


def prepare_int_bits(params, qp, spec: ViTSpec, cfg: QuantConfig):
    """Bake the {4, 8} search space once: returns ``(variants, sym_acts)``
    where ``variants`` is an arrays-only pytree (jit-argument safe — no
    static leaves) and ``sym_acts`` the host-concrete codes-path gate.
    Feed to select_int_bits under trace.  ViT family; -1 (fp) slots are
    not part of the search space (sample_candidates never emits them)."""
    n = num_bit_slots(spec)
    ip4 = prepare_int(params, qp, spec, cfg, (4,) * n)
    ip8 = prepare_int(params, qp, spec, cfg, (8,) * n)
    sym_acts = ip8["sym_acts"]

    def pair(site4, site8, keys):
        return {"b4": {k: site4[k] for k in keys},
                "b8": {k: site8[k] for k in keys}}

    variants = {
        # bit-independent skeleton: act-site scales/zps, norms, cls/pos,
        # biases ride along from the uniform-8 bake (identical in both)
        "base": {k: v for k, v in ip8.items()
                 if k not in ("patch", "head", "blocks", "bit_config",
                              "sym_acts")},
        "base_blocks": [
            {k: v for k, v in ib.items()
             if k not in ("qkv", "proj", "fc1", "fc2")}
            for ib in ip8["blocks"]],
        "patch": pair(ip4["patch"], ip8["patch"],
                      ("w_int", "mult") if not ip8["patch"]["fp"]
                      else ("w",)),
        "patch_extra": {k: v for k, v in ip8["patch"].items()
                        if k not in ("w_int", "mult", "w", "fp")},
        "head": pair(ip4["head"], ip8["head"], ("w_int", "mult")),
        "head_b": ip8["head"]["b"],
        "blocks": [],
    }
    i4x = cfg.bit_pool.index(4) if cfg.smoothquant else None
    i8x = cfg.bit_pool.index(8) if cfg.smoothquant else None
    for i in range(spec.depth):
        ib4, ib8 = ip4["blocks"][i], ip8["blocks"][i]
        blk = {s: pair(ib4[s], ib8[s], keys)
               for s, keys in _SITE_SLOT_KEYS.items()}
        for s in _SITE_SLOT_KEYS:
            blk[f"{s}_b"] = ib8[s]["b"]
        if cfg.smoothquant:
            p = f"blocks.{i}"
            ch_a = {4: qp[f"{p}.attn.qkv.sq.channel_scale"][i4x],
                    8: qp[f"{p}.attn.qkv.sq.channel_scale"][i8x]}
            ch_m = {4: qp[f"{p}.mlp.fc1.sq.channel_scale"][i4x],
                    8: qp[f"{p}.mlp.fc1.sq.channel_scale"][i8x]}
            s_x = {4: qp[f"{p}.mlp.fc1.qact0.scale"][i4x],
                   8: qp[f"{p}.mlp.fc1.qact0.scale"][i8x]}
            # joint index = 2*(b_qkv==8) + (b_fc1==8): rows (4,4) (4,8)
            # (8,4) (8,8)
            combos = [(4, 4), (4, 8), (8, 4), (8, 8)]
            blk["fc1_lo"] = jnp.stack([s_x[bf] * ch_a[bq]
                                       for bq, bf in combos])
            blk["fc1_lr"] = jnp.stack([ch_a[bq] / ch_m[bf]
                                       for bq, bf in combos])
            # consistency guard: the stacked diagonal must reproduce the
            # uniform bakes bitwise (catches future cross-slot coupling
            # in prepare_int that this decomposition would miss)
            import numpy as _np

            for row, ibu in ((0, ib4), (3, ib8)):
                if not (_np.array_equal(_np.asarray(blk["fc1_lo"][row]),
                                        _np.asarray(ibu["fc1"]["ln_out_scale"]))
                        and _np.array_equal(_np.asarray(blk["fc1_lr"][row]),
                                            _np.asarray(ibu["fc1"]["ln_rescale"]))):
                    raise ValueError(
                        "prepare_int_bits: norm2 cross terms diverge from "
                        f"prepare_int at block {i} — prepare_int grew a "
                        "coupling this decomposition does not model")
        variants["blocks"].append(blk)

    return variants, sym_acts


def select_int_bits(variants, bits, sym_acts, spec: ViTSpec,
                    cfg: QuantConfig):
    """Traced-``bits`` counterpart of prepare_int for the {4, 8} search
    space: returns a pytree forward_q_int consumes, bit-for-bit equal to
    ``prepare_int(..., bit_config=bits)`` for every entry the forward
    reads (tests/test_int_bits.py).  ``bits``: (num_bit_slots,) int32 in
    {4, 8}.  The per-head serve layouts (wq_h/...) are not reproduced —
    forward_q_int's default path never reads them."""
    bits = jnp.asarray(bits, jnp.int32)
    n = num_bit_slots(spec)

    def pick(slot, pr, extra=None):
        is4 = bits[slot] == 4
        out = {k: jnp.where(is4, pr["b4"][k], pr["b8"][k])
               for k in pr["b4"]}
        out["fp"] = False
        if extra:
            out.update(extra)
        return out

    ip = dict(variants["base"])
    ip["bit_config"] = (8,) * n  # static: forward_q_int only probes != -1
    ip["sym_acts"] = bool(sym_acts)
    if "w" in variants["patch"]["b4"]:  # fp patch (vit_large input_quant=False)
        is4 = bits[0] == 4
        ip["patch"] = {"w": jnp.where(is4, variants["patch"]["b4"]["w"],
                                      variants["patch"]["b8"]["w"]),
                       "fp": True, **variants["patch_extra"]}
    else:
        ip["patch"] = pick(0, variants["patch"], variants["patch_extra"])
    ip["head"] = pick(n - 1, variants["head"], {"b": variants["head_b"]})
    ip["blocks"] = []
    for i, blk in enumerate(variants["blocks"]):
        ib = dict(variants["base_blocks"][i])
        for j, s in enumerate(("qkv", "proj", "fc1", "fc2")):
            ib[s] = pick(4 * i + 1 + j, blk[s], {"b": blk[f"{s}_b"]})
        if cfg.smoothquant:
            k = ((bits[4 * i + 1] == 8).astype(jnp.int32) * 2
                 + (bits[4 * i + 3] == 8).astype(jnp.int32))
            ib["fc1"]["ln_out_scale"] = blk["fc1_lo"][k]
            ib["fc1"]["ln_rescale"] = blk["fc1_lr"][k]
        ip["blocks"].append(ib)
    return ip
