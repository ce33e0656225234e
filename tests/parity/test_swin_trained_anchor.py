"""Swin trained-weights ACCURACY anchor (VERDICT r4 item 4).

test_trained_accuracy_anchor.py pins the accuracy semantics of the PTQ
pipeline for the ViT family; this module extends the same recipe to a
depth-reduced Swin spec — 2 stages is enough to exercise shifted windows
(stage-0 block 1), PatchMerging with in_scale_expand=4, and the per-stage
head counts — so Swin quantization *deltas* are pinned on trained weights,
not just random-weight logits:

  * a 56px embed-24 depths-(2,2) Swin is TRAINED in the reference
    framework (same near-boundary prototype-mixture stream as the ViT
    anchor, so quantization noise genuinely flips predictions),
  * weights are shared bit-for-bit with the rebuild
    (convert_swin_torch_state_dict),
  * both frameworks calibrate on the same single image and measure FP /
    W8 / W4 top-1 on a held-out 256-image val split,
  * plus a 19-slot single-layer restore sweep (bit_config=[4]*19 with one
    slot restored to 8 — the Swin extension of the bit-slot contract)
    whose per-slot accuracies and induced best/worst slots must agree.

Assertions are tolerance-1-image (100/256); measured agreement is EXACT on
every cell, prediction-for-prediction (see PARITY.md).  ~2.5 min on the
1-core host (prototyped in scripts/proto_swin_anchor.py).

Reference match: /root/reference/models/swin_quant.py:446-467 (block
forward semantics), :790-817 (swin_tiny composition); the same arity
breakages as tests/parity/test_swin_parity.py are shimmed so the committed
reference code RUNS (documented in PARITY.md "Swin upstream breakage").
"""
import numpy as np
import pytest
import torch

pytestmark = pytest.mark.usefixtures("reference_available")

N_CLASSES, N_VAL, BS = 8, 256, 64
IMG, STEPS, ALPHA = 56, 200, 0.5
SLOTS = 19  # patch + 4 x (2+2) blocks x 4 + 1 downsample + head
TOL = 100.0 / N_VAL + 1e-6  # one val image


def _install_shims():
    """The documented FQ-ViT->P2-ViT arity breakages (same shims as
    test_swin_parity.ref_swin), so the committed reference Swin runs."""
    import models.layers_quant as lq
    from models.ptq.layers import QIntLayerNorm

    orig_mlp = lq.Mlp.forward
    orig_pe = lq.PatchEmbed.forward
    orig_ln = QIntLayerNorm.forward

    def mlp_fwd(self, x, FLOPs=None, global_distance=None,
                ffn_bit_config=None, **kw):
        kw.setdefault("smoothquant", False)
        return orig_mlp(self, x, FLOPs if FLOPs is not None else [],
                        global_distance if global_distance is not None
                        else [], ffn_bit_config, **kw)

    def pe_fwd(self, x, FLOPs=None, bit_config=None):
        return orig_pe(self, x, FLOPs if FLOPs is not None else [],
                       bit_config)

    def ln_fwd(self, x, in_quantizer=None, out_quantizer=None,
               out_quantizer_scale=None, in_scale_expand=1):
        if isinstance(out_quantizer_scale, int):
            # PatchMerging's positional 4 was in_scale_expand in FQ-ViT
            in_scale_expand = out_quantizer_scale
            out_quantizer_scale = None
        return orig_ln(self, x, in_quantizer, out_quantizer,
                       out_quantizer_scale, in_scale_expand)

    lq.Mlp.forward = mlp_fwd
    lq.PatchEmbed.forward = pe_fwd
    QIntLayerNorm.forward = ln_fwd
    return (lq, orig_mlp, orig_pe, QIntLayerNorm, orig_ln)


def _draw(r, n):
    """Near-boundary two-prototype mixtures (the ViT anchor's stream):
    small decision margins so W4 noise flips real predictions."""
    rng0 = np.random.default_rng(0)
    protos = rng0.normal(0, 1, (N_CLASSES, 3, IMG, IMG)).astype(np.float32)
    a = r.integers(0, N_CLASSES, n)
    b = (a + r.integers(1, N_CLASSES, n)) % N_CLASSES
    w = r.uniform(0.42, 0.58, n).astype(np.float32)[:, None, None, None]
    y = np.where(w[:, 0, 0, 0] > 0.5, a, b).astype(np.int64)
    x = (ALPHA * (w * protos[a] + (1 - w) * protos[b])
         + r.normal(0, 1, (n, 3, IMG, IMG))).astype(np.float32)
    return x, y


def _torch_preds(model, x):
    outs = []
    with torch.no_grad():
        for i in range(0, len(x), BS):
            out = model(torch.from_numpy(x[i:i + BS]))
            logits = out[0] if isinstance(out, tuple) else out
            outs.append(logits.argmax(1).numpy())
    return np.concatenate(outs)


def _acc(p, y):
    return 100.0 * (p == y).mean()


@pytest.fixture(scope="module")
def trained():
    shims = _install_shims()
    from config import Config
    from models.ptq.layers import QIntLayerNorm
    from models.swin_quant import SwinTransformer

    try:
        torch.manual_seed(0)
        model = SwinTransformer(
            img_size=IMG, patch_size=4, embed_dim=24, depths=(2, 2),
            num_heads=(2, 4), window_size=7, num_classes=N_CLASSES,
            drop_path_rate=0.0, norm_layer=QIntLayerNorm,
            input_quant=True,
            cfg=Config(ptf=True, lis=True, quant_method="minmax"))

        opt = torch.optim.Adam(model.parameters(), lr=1e-3)
        lossf = torch.nn.CrossEntropyLoss()
        g = np.random.default_rng(3)
        model.train()
        torch.manual_seed(1)
        for _ in range(STEPS):
            xb, yb = _draw(g, BS)
            out = model(torch.from_numpy(xb))
            logits = out[0] if isinstance(out, tuple) else out
            loss = lossf(logits, torch.from_numpy(yb))
            opt.zero_grad()
            loss.backward()
            opt.step()
        model.eval()

        xv, yv = _draw(np.random.default_rng(2), N_VAL)
        calib, _ = _draw(np.random.default_rng(7), 1)

        from diffvit_tpu.models import swin
        from diffvit_tpu.models.swin import convert_swin_torch_state_dict

        spec = swin.SwinSpec("anchor_swin", embed_dim=24, depths=(2, 2),
                             num_heads=(2, 4), img_size=IMG,
                             num_classes=N_CLASSES)
        assert swin.num_bit_slots(spec) == SLOTS
        params = convert_swin_torch_state_dict(model.state_dict(), spec)
        yield model, spec, params, xv, yv, calib
    finally:
        lq, orig_mlp, orig_pe, qiln, orig_ln = shims
        lq.Mlp.forward = orig_mlp
        lq.PatchEmbed.forward = orig_pe
        qiln.forward = orig_ln


def _restore_bit_mat():
    mats = [np.full(SLOTS, 8), np.full(SLOTS, 4)]
    for r in range(SLOTS):
        bits = np.full(SLOTS, 4)
        bits[r] = 8
        mats.append(bits)
    return np.stack(mats).astype(np.int32)


@pytest.fixture(scope="module")
def cells(trained):
    import jax
    import jax.numpy as jnp

    from diffvit_tpu.config import QuantConfig
    from diffvit_tpu.models import swin

    model, spec, params, xv, yv, calib = trained

    ref_fp = _torch_preds(model, xv)

    # reference: upstream's PatchMerging reduction has bias=False; its
    # weight observer indexes a None bias during calibration — give it an
    # explicit zero bias (numerically identical) so the committed code runs
    for layer in model.layers:
        if layer.downsample is not None:
            red = layer.downsample.reduction
            red.bias = torch.nn.Parameter(
                torch.zeros(red.out_features))
    model.model_open_calibrate()
    with torch.no_grad():
        model.model_open_last_calibrate()
        model(torch.from_numpy(calib))
    model.model_close_calibrate()
    model.model_quant()

    from models.ptq import BIT_TYPE_DICT as RBITS
    from models.ptq.layers import QConv2d, QLinear

    mods = [model.patch_embed.proj]
    for layer in model.layers:
        for blk in layer.blocks:
            mods += [blk.attn.qkv, blk.attn.proj, blk.mlp.fc1, blk.mlp.fc2]
        if layer.downsample is not None:
            mods.append(layer.downsample.reduction)
    mods.append(model.head)
    assert len(mods) == SLOTS
    assert all(isinstance(m, (QLinear, QConv2d)) for m in mods)

    def set_bits(bits):
        for m, b in zip(mods, bits):
            m.quantizer.bit_type = RBITS[f"int{b}"]
            m.observer.bit_type = RBITS[f"int{b}"]

    bit_mat = _restore_bit_mat()
    ref_preds = []
    for bits in bit_mat:
        set_bits(bits)
        ref_preds.append(_torch_preds(model, xv))
    ref_preds = np.stack(ref_preds)

    # ours: same weights, same single calib image, vmapped over the full
    # (2 + 19)-row bit matrix in one compile (the mixed-precision search
    # substrate)
    cfg = QuantConfig(ptf=True, lis=True, quant_method="minmax")
    qp, _ = swin.calibrate(params, spec, cfg, jnp.asarray(calib))
    ffp = jax.jit(lambda x: swin.forward_fp(params, spec, x))
    my_fp = np.concatenate([
        np.asarray(ffp(jnp.asarray(xv[i:i + BS]))).argmax(1)
        for i in range(0, len(xv), BS)])
    fqb = jax.jit(jax.vmap(
        lambda b, x: swin.forward_q_bits(params, qp, spec, cfg, x, b),
        in_axes=(0, None)))
    bm = jnp.asarray(bit_mat)
    my_preds = np.concatenate(
        [np.asarray(fqb(bm, jnp.asarray(xv[i:i + BS]))).argmax(-1)
         for i in range(0, len(xv), BS)], axis=1)

    return {"yv": yv, "ref_fp": ref_fp, "my_fp": my_fp,
            "ref": ref_preds, "my": my_preds}


def test_fp_top1_identical(cells):
    """Identical weights -> identical float preds, image for image,
    through shifted windows and PatchMerging."""
    np.testing.assert_array_equal(cells["my_fp"], cells["ref_fp"])


def test_w8_w4_top1_track(cells):
    """W8/W4 top-1 after single-image calibration agrees within one val
    image (measured: exact, prediction-for-prediction)."""
    yv = cells["yv"]
    fp = _acc(cells["ref_fp"], yv)
    for row, name in ((0, "W8"), (1, "W4")):
        r = _acc(cells["ref"][row], yv)
        m = _acc(cells["my"][row], yv)
        assert abs(r - m) <= TOL, (name, r, m)
        print(f"\nswin-anchor {name}: ref {r:.3f} my {m:.3f} (FP {fp:.3f}, "
              f"pred-agree {(cells['ref'][row] == cells['my'][row]).mean():.4f})")


def test_restore_sweep_orders_identically(cells):
    """19-slot single-layer restore sweep: per-slot accuracies within one
    image and the induced best/worst restore slots agree (the Swin
    extension of layerwise_quant_compare.py's ordering semantics)."""
    yv = cells["yv"]
    ref_acc = np.array([_acc(p, yv) for p in cells["ref"][2:]])
    my_acc = np.array([_acc(p, yv) for p in cells["my"][2:]])
    assert len(ref_acc) == SLOTS
    np.testing.assert_allclose(my_acc, ref_acc, atol=TOL)
    assert ref_acc.argmax() == my_acc.argmax()
    assert ref_acc.argmin() == my_acc.argmin()
    print("\nswin-anchor restore ref:",
          " ".join(f"{a:.2f}" for a in ref_acc))
    print("swin-anchor restore my: ",
          " ".join(f"{a:.2f}" for a in my_acc))
