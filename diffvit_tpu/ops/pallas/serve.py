"""Resident whole-model serving kernel (Pallas/Mosaic, TPU).

This kernel runs the ENTIRE transformer stack in ONE ``pallas_call``:
``grid=(depth,)`` steps once per layer, per-layer weight blocks stream
from HBM via BlockSpec index maps (Mosaic double-buffers them across grid
steps), and the residual stream lives as int8 codes in the OUTPUT buffer,
whose constant index map keeps it resident in VMEM from layer 0 to layer
``depth``.

Measured verdict (device-chained, real chip — docs/PERF_ANALYSIS.md
"Batch-1 serving anatomy"): ~parity with the per-kernel path at b1
(0.462 vs 0.453 ms DeiT-S int4), slower at b8 (1.52 vs 1.28 ms), scoped-
VMEM OOM at b16 (26.8 MB needed vs the 16 MB limit).  The hypothesis
that motivated it — per-kernel launch overhead dominating the b1 step —
was an artifact of HOST-dispatched timing through the tunnel (0.80-1.34
ms across runs for a 0.45 ms chip step); kernels inside one compiled XLA
program launch back-to-back with negligible cost on this hardware.  Kept
as an opt-in serving mode (IntModel(resident=True)) and as the measured
record of that result.

Per grid step (= one encoder block), op-for-op the integer codes path of
``models/vit_int.forward_q_int``:

  int-LN1 (M.2^-N, codes in / codes out)          _ln_int8
  full-width qkv int8 matmul + qact1 requant      _qkv_attn_kernel_v2
  per-head scores -> LIS -> attn@v -> qact2       _lis_body
  per-head proj accumulation (int8 x int8 -> i32)
  qact3 / residual add / qact2 fences
  int-LN2 (with the norm2 channel-rescale quirk)
  fc1 -> poly-GELU -> qact1 -> fc2 -> qact2 codes _mlp_kernel
  residual add / qact4 fence -> codes

Numerical contract: identical to the codes path except f32 reduction
order inside the LayerNorm row sums (Mosaic vs XLA accumulation trees)
and the shared polynomial GELU — the same tolerance class as the
existing kernel-vs-XLA tests.  Padded rows carry finite garbage (the LN
std is floored at 1e-37 so all-zero rows can't produce NaN that the
masked-column attention math would otherwise spread through attn@v);
callers slice to ``n_real`` rows, and the column mask keeps real rows
exact.

Reference semantics: one block of vit_fquant.VisionTransformer
(/root/reference/models/vit_fquant.py:300-370) under PTF + LIS +
int-LayerNorm; the reference has no serving path at all (it re-simulates
quantization in fp32 every run).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .attention import _lis_body, lis_fast_ok
from .mlp import _gelu_poly

# vec slots (per layer, C-wide f32)
_V_IN_SCALE = 0      # residual grid at block entry (layer 0: qact1)
_V_LN1_MASK = 1      # round(in_scale / min(in_scale))
_V_LN1_W = 2
_V_LN1_B = 3
_V_LN1_OUT = 4       # qkv input grid (SmoothQuant ch * s_x)
_V_PROJ_MULT = 5
_V_PROJ_B = 6
_V_S3 = 7            # attn.qact3 scale
_V_SBLK2 = 8         # block qact2 scale (PTF)
_V_LN2_MASK = 9
_V_LN2_W = 10
_V_LN2_B = 11
_V_LN2_OUT = 12      # fc1 input grid (attention channel grid, quirk)
_V_LN2_RESCALE = 13  # ch_attn/ch_mlp or ones
_V_S4 = 14           # block qact4 scale
_NV = 15

# scal slots (per layer, SMEM f32)
_S_SA = 0            # softmax scale s_a
_S_C1 = 1            # s1^2 * attn_scale / s_a
_S_S1_OVER_S2 = 2
_S_M1_INV = 3        # 1 / mlp.qact1 scale
_S_LN1_MIN = 4       # min(in_scale)
_S_LN2_MIN = 5       # min(s_blk2)
_NS = 6


def _ln_emit(codes_f32, mask, s1, w, bvec, out_scale, rescale=None):
    """models/vit_int._ln_int8 with x_codes, op-for-op (true divides kept
    for bit-parity with the XLA path; get_mn inlined with exp2(n), which
    is exact in Mosaic for integer n).  Returns clipped int8-valued f32
    codes on the ``out_scale`` grid."""
    c = codes_f32.shape[-1]
    x_q = codes_f32 * mask
    sum_x = jnp.sum(x_q, axis=-1, keepdims=True)
    sum_x2 = jnp.sum(x_q * x_q, axis=-1, keepdims=True)
    mean = (sum_x / c) * s1
    std = (s1 / c) * jnp.sqrt(c * sum_x2 - sum_x * sum_x)
    # all-zero padded rows give exactly 0 here; floor them so mean/std
    # stays finite (real rows have std >> 1e-37: value-identical)
    std = jnp.maximum(std, 1e-37)
    a = (s1 / std) * w / out_scale
    a_abs = jnp.abs(a)
    # get_mn (ops/int_layernorm.py) with 2.0**n as exp2
    n = jnp.clip(7.0 - jnp.floor(jnp.log2(a_abs)), 0.0, 31.0)
    m = jnp.clip(jnp.floor(a_abs * jnp.exp2(n)), 0.0, 255.0)
    b = jnp.round((bvec - (mean / std) * w) / out_scale * jnp.exp2(n))
    y = jnp.round((jnp.sign(a) * m * x_q + b) / jnp.exp2(n))
    if rescale is not None:
        y = jnp.round(y * rescale)
    return jnp.clip(y, -128.0, 127.0)


def _serve_kernel(x_ref, wqkv_ref, wproj_ref, w1_ref, w2_ref, mb_ref,
                  vec_ref, vhid_ref, vout_ref, scal_ref, out_ref, *,
                  n_real, bits, lis, nheads, head_dim, nelems, lis_fast):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        out_ref[...] = x_ref[...]

    c = nheads * head_dim
    rows = out_ref.shape[0]
    npad = rows // nelems

    # scal rides as the FULL (depth, NS) SMEM array (a (1, NS) block would
    # violate Mosaic's block-shape rules), indexed by the grid step
    vec = lambda k: vec_ref[0, k][None, :]
    s_a = scal_ref[i, _S_SA]
    c1 = scal_ref[i, _S_C1]
    s1_over_s2 = scal_ref[i, _S_S1_OVER_S2]
    s_m1_inv = scal_ref[i, _S_M1_INV]

    codes = out_ref[...].astype(jnp.float32)                  # (rows, C)

    # ---- int LayerNorm 1 -> qkv input codes ----
    x1 = _ln_emit(codes, vec(_V_LN1_MASK), scal_ref[i, _S_LN1_MIN],
                  vec(_V_LN1_W), vec(_V_LN1_B), vec(_V_LN1_OUT))
    x1_i8 = x1.astype(jnp.int8)

    # ---- full-width qkv projection + qact1 requant (v2 form) ----
    acc = jax.lax.dot_general(
        x1_i8, wqkv_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    yq = acc.astype(jnp.float32) * mb_ref[0, 0][None, :] \
        + mb_ref[0, 1][None, :]
    qkv = jnp.clip(jnp.round(yq), -128.0, 127.0).astype(jnp.bfloat16)

    col = jax.lax.broadcasted_iota(jnp.int32, (npad, npad), dimension=1)
    col_ok = col < n_real
    pmult = vec(_V_PROJ_MULT)
    pbias = vec(_V_PROJ_B)

    # ---- per-element attention + proj accumulation ----
    proj_rows = []
    for g in range(nelems):
        qkv_g = jax.lax.slice(qkv, (g * npad, 0), ((g + 1) * npad, 3 * c))

        def sl(slot, h, q=qkv_g):
            lo = slot * c + h * head_dim
            return jax.lax.slice(q, (0, lo), (npad, lo + head_dim))

        def scores_of(h, q=qkv_g):
            s = jax.lax.dot_general(
                sl(0, h, q), sl(1, h, q), (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            return jnp.clip(jnp.round(s * c1), -128.0, 127.0)

        proj_acc = None
        a_cur = scores_of(0)
        for h in range(nheads):
            a_next = scores_of(h + 1) if h + 1 < nheads else None
            if lis:
                attn = _lis_body(a_cur, s_a, bits, col_ok, fast=lis_fast)
            else:
                logits = jnp.where(col_ok, a_cur * s_a, -jnp.inf)
                attn = jax.nn.softmax(logits, axis=-1).astype(jnp.bfloat16)
            o = jax.lax.dot_general(
                attn, sl(2, h), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            o_i8 = jnp.clip(jnp.round(o * s1_over_s2), -128.0, 127.0) \
                .astype(jnp.int8)
            part = jax.lax.dot_general(
                o_i8, wproj_ref[0, h], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            proj_acc = part if proj_acc is None else proj_acc + part
            a_cur = a_next
        proj_rows.append(proj_acc.astype(jnp.float32) * pmult + pbias)
    y = jnp.concatenate(proj_rows, axis=0) if nelems > 1 else proj_rows[0]

    # ---- qact3 / residual / qact2 fences (codes form) ----
    s3 = vec(_V_S3)
    s_blk2 = vec(_V_SBLK2)
    yq3 = jnp.clip(jnp.round(y / s3), -128.0, 127.0)
    hs = codes * vec(_V_IN_SCALE) + yq3 * s3
    hc2 = jnp.clip(jnp.round(hs / s_blk2), -128.0, 127.0)

    # ---- int LayerNorm 2 (norm2 channel-rescale quirk) ----
    x2 = _ln_emit(hc2, vec(_V_LN2_MASK), scal_ref[i, _S_LN2_MIN],
                  vec(_V_LN2_W), vec(_V_LN2_B), vec(_V_LN2_OUT),
                  rescale=vec(_V_LN2_RESCALE))
    x2_i8 = x2.astype(jnp.int8)

    # ---- MLP: fc1 -> poly GELU -> qact1 -> fc2 -> qact2 codes ----
    acc1 = jax.lax.dot_general(
        x2_i8, w1_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    mid = acc1.astype(jnp.float32) * vhid_ref[0, 0][None, :] \
        + vhid_ref[0, 1][None, :]
    gq = jnp.clip(jnp.round(_gelu_poly(mid) * s_m1_inv), -128.0, 127.0) \
        .astype(jnp.int8)
    acc2 = jax.lax.dot_general(
        gq, w2_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    y2 = acc2.astype(jnp.float32) * vout_ref[0, 0][None, :] \
        + vout_ref[0, 1][None, :]
    y2c = jnp.clip(jnp.round(y2 * vout_ref[0, 3][None, :]), -128.0, 127.0)

    # ---- residual / qact4 fence -> next layer's codes ----
    hs2 = hc2 * s_blk2 + y2c * vout_ref[0, 2][None, :]
    hc_new = jnp.clip(jnp.round(hs2 / vec(_V_S4)), -128.0, 127.0)
    out_ref[...] = hc_new.astype(jnp.int8)


def prepare_resident(ip, spec, cfg):
    """Bake a prepared int-model pytree (models/vit_int.prepare_int) into
    the stacked per-layer arrays the resident kernel streams.  Requires
    the full codes path: every site integer, int_norm + smoothquant on,
    symmetric activations (zp==0 everywhere)."""
    if not (cfg.int_norm and cfg.smoothquant):
        raise ValueError("resident serving needs int_norm + smoothquant")
    if not ip.get("sym_acts", False):
        raise ValueError("resident serving needs symmetric activations "
                         "(sym_acts) to carry the int8-codes stream")
    if cfg.bit_a.bits != 8 or cfg.bit_a.signed is not True:
        # every requant fence in _serve_kernel hardcodes clip(-128,127)
        raise ValueError("resident serving assumes int8 activations "
                         f"(cfg.bit_a is {cfg.bit_a.name})")
    c = spec.embed_dim
    hid = ip["blocks"][0]["fc1"]["w_int"].shape[1]
    h_, d_ = spec.num_heads, spec.head_dim
    f32 = jnp.float32
    bc = lambda t: jnp.broadcast_to(jnp.asarray(t, f32), (c,))

    wqkv, wproj, w1, w2 = [], [], [], []
    mb, vec, vhid, vout, scal = [], [], [], [], []
    lis_fast = True
    for i, ib in enumerate(ip["blocks"]):
        for site in ("qkv", "proj", "fc1", "fc2"):
            if ib[site]["fp"]:
                raise ValueError(
                    f"resident serving supports all-integer blocks only; "
                    f"blocks[{i}].{site} is fp (bit -1)")
        qs, ps, f1, f2 = ib["qkv"], ib["proj"], ib["fc1"], ib["fc2"]
        in_scale = bc(ip["qact1"]["scale"] if i == 0
                      else ip["blocks"][i - 1]["qact4"]["scale"])
        s1 = ib["attn.qact1"]["scale"]
        s_a = ib["attn.qact_attn1"]["scale"]
        s2 = ib["attn.qact2"]["scale"]
        s_blk2 = bc(ib["qact2"]["scale"])
        ln1_min = jnp.min(in_scale)
        ln2_min = jnp.min(s_blk2)

        wqkv.append(qs["w_int"])
        s1_inv = 1.0 / s1
        mb.append(jnp.stack([jnp.broadcast_to(qs["mult"], (3 * c,)) * s1_inv,
                             jnp.broadcast_to(qs["b"], (3 * c,)) * s1_inv])
                  .astype(f32))
        wproj.append(ps["w_int"].reshape(h_, d_, c))
        w1.append(f1["w_int"])
        w2.append(f2["w_int"])
        vec.append(jnp.stack([
            in_scale,
            jnp.round(in_scale / ln1_min),
            bc(ib["norm1"]["w"]), bc(ib["norm1"]["b"]),
            bc(qs["in_scale"]),
            bc(ps["mult"]), bc(ps["b"]),
            bc(ib["attn.qact3"]["scale"]),
            s_blk2,
            jnp.round(s_blk2 / ln2_min),
            bc(ib["norm2"]["w"]), bc(ib["norm2"]["b"]),
            bc(f1.get("ln_out_scale", f1["in_scale"])),
            bc(f1["ln_rescale"]) if "ln_rescale" in f1 else jnp.ones((c,), f32),
            bc(ib["qact4"]["scale"]),
        ]).astype(f32))
        vhid.append(jnp.stack([jnp.broadcast_to(f1["mult"], (hid,)),
                               jnp.broadcast_to(f1["b"], (hid,))]).astype(f32))
        s_m2 = jnp.broadcast_to(ib["mlp.qact2"]["scale"], (c,))
        vout.append(jnp.stack([jnp.broadcast_to(f2["mult"], (c,)),
                               jnp.broadcast_to(f2["b"], (c,)),
                               s_m2, 1.0 / s_m2]).astype(f32))
        scal.append(jnp.stack([
            jnp.asarray(s_a, f32),
            jnp.asarray(s1 * s1 * spec.attn_scale / s_a, f32),
            jnp.asarray(s1 / s2, f32),
            jnp.asarray(1.0 / ib["mlp.qact1"]["scale"], f32),
            ln1_min, ln2_min,
        ]).astype(f32))
        # static fast-LIS gate, as in forward_q_int (must hold for EVERY
        # layer — the kernel body is shared across grid steps)
        if isinstance(s_a, jax.core.Tracer):
            lis_fast = False
        else:
            sv = float(jax.device_get(jnp.asarray(s_a)))
            lis_fast = lis_fast and lis_fast_ok(sv)

    return {
        "wqkv": jnp.stack(wqkv), "wproj": jnp.stack(wproj),
        "w1": jnp.stack(w1), "w2": jnp.stack(w2),
        "mb": jnp.stack(mb), "vec": jnp.stack(vec),
        "vhid": jnp.stack(vhid), "vout": jnp.stack(vout),
        "scal": jnp.stack(scal), "lis_fast": bool(lis_fast),
    }


def resident_codes(packed, x_codes, *, n_real, bits=4, lis=True, nelems,
                   interpret=False):
    """Run every encoder block in one pallas_call.  x_codes:
    (nelems*npad, C) int8 on the qact1 grid (padded rows zero).  Returns
    (nelems*npad, C) int8 codes on the last block's qact4 grid."""
    rows, c = x_codes.shape
    depth, _, c3 = packed["wqkv"].shape
    hid = packed["w1"].shape[2]
    nheads = packed["wproj"].shape[1]
    head_dim = packed["wproj"].shape[2]
    assert rows % nelems == 0

    kernel = functools.partial(
        _serve_kernel, n_real=n_real, bits=bits, lis=lis, nheads=nheads,
        head_dim=head_dim, nelems=nelems, lis_fast=packed["lis_fast"])
    return pl.pallas_call(
        kernel,
        grid=(depth,),
        in_specs=[
            pl.BlockSpec((rows, c), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c, c3), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nheads, head_dim, c), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c, hid), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hid, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, c3), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _NV, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, hid), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((rows, c), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, c), jnp.int8),
        interpret=interpret,
    )(x_codes, packed["wqkv"], packed["wproj"], packed["w1"],
      packed["w2"], packed["mb"], packed["vec"], packed["vhid"],
      packed["vout"], packed["scal"])
