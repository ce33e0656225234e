"""Swin upstream parity cell.

The reference's Swin crashes as committed: SwinTransformerBlock calls the
shared P2-ViT ``Mlp``/``PatchEmbed`` with the original FQ-ViT arity
(swin_quant.py:392-396, :793), and PatchMerging passes ``4`` positionally
into the modified int-LN signature where it lands on out_quantizer_scale
instead of in_scale_expand (swin_quant.py:463; SURVEY §2.3 ⚠️1-2).  This
module shims EXACTLY those documented breakages — restoring the FQ-ViT
call semantics the code was written against — so upstream swin_tiny
actually runs on CPU, then compares calibration scales and quantized
logits against the rebuild on identical weights and calibration batch.

The Mlp shim passes smoothquant=False: FQ-ViT's Swin predates the
SmoothQuant additions, and the P2-ViT Mlp's SmoothQuant replay crashes on
bit_config=None (vit_fquant.py:282-style bit_pool.index(None)) — the
rebuild's Swin likewise quantizes fc1 plainly (models/swin.py:447).
"""
import numpy as np
import pytest
import torch

pytestmark = pytest.mark.usefixtures("reference_available")


@pytest.fixture(scope="module")
def ref_swin():
    torch.manual_seed(0)
    np.random.seed(0)

    import models.layers_quant as lq
    from models.ptq.layers import QIntLayerNorm

    orig_mlp = lq.Mlp.forward
    orig_pe = lq.PatchEmbed.forward
    orig_ln = QIntLayerNorm.forward

    def mlp_fwd(self, x, FLOPs=None, global_distance=None,
                ffn_bit_config=None, **kw):
        kw.setdefault("smoothquant", False)
        return orig_mlp(self, x, FLOPs if FLOPs is not None else [],
                        global_distance if global_distance is not None else [],
                        ffn_bit_config, **kw)

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
    try:
        from config import Config
        from models import swin_tiny_patch4_window7_224

        cfg_ref = Config(ptf=True, lis=True, quant_method="minmax")
        model = swin_tiny_patch4_window7_224(pretrained=False, cfg=cfg_ref)
        model.eval()
        # third stale path: the bias-free PatchMerging reduction crashes the
        # channel-wise PoT search (minmax.py:126 indexes others[0] == None).
        # A zero bias is numerically neutral — the candidate scoring
        # compares quantized vs float OUTPUT difference, and an identical
        # additive bias cancels in it — and restores the code path the
        # observer was written against.
        for layer in model.layers:
            if layer.downsample is not None:
                red = layer.downsample.reduction
                red.bias = torch.nn.Parameter(
                    torch.zeros(red.out_features))
        calib = torch.randn(1, 3, 224, 224)
        model.model_open_calibrate()
        with torch.no_grad():
            model.model_open_last_calibrate()
            model(calib)
            model.model_close_calibrate()
            model.model_quant()
            ref_logits = model(calib).numpy()
        yield model, calib, ref_logits
    finally:
        lq.Mlp.forward = orig_mlp
        lq.PatchEmbed.forward = orig_pe
        QIntLayerNorm.forward = orig_ln


@pytest.fixture(scope="module")
def ours(ref_swin):
    import jax.numpy as jnp

    from diffvit_tpu.config import QuantConfig
    from diffvit_tpu.models import swin
    from diffvit_tpu.models.swin import convert_swin_torch_state_dict

    model, calib, _ = ref_swin
    spec = swin.SWIN_SPECS["swin_tiny"]
    params = convert_swin_torch_state_dict(model.state_dict(), spec)
    cfg = QuantConfig(ptf=True, lis=True, quant_method="minmax")
    qp, dist = swin.calibrate(params, spec, cfg,
                              jnp.asarray(calib.numpy()))
    return spec, cfg, params, qp, dist


def test_swin_act_scales_match(ref_swin, ours):
    model, _, _ = ref_swin
    _, _, _, qp, _ = ours
    blk00 = model.layers[0].blocks[0]
    blk31 = model.layers[3].blocks[1]
    pairs = [
        (model.qact_input.quantizer.scale, "qact_input.scale"),
        (model.patch_embed.qact.quantizer.scale, "patch.qact.scale"),
        (blk00.qact1.quantizer.scale, "layers.0.blocks.0.qact1.scale"),
        (blk00.attn.qact1.quantizer.scale,
         "layers.0.blocks.0.attn.qact1.scale"),
        (blk00.attn.qact_attn1.quantizer.scale,
         "layers.0.blocks.0.attn.qact_attn1.scale"),
        (blk00.attn.qact_table.quantizer.scale,
         "layers.0.blocks.0.attn.qact_table.scale"),
        (blk00.attn.qact2.quantizer.scale,
         "layers.0.blocks.0.attn.qact2.scale"),
        (blk00.attn.qact3.quantizer.scale,
         "layers.0.blocks.0.attn.qact3.scale"),
        (blk00.mlp.qact1.quantizer.scale,
         "layers.0.blocks.0.mlp.qact1.scale"),
        (model.layers[0].downsample.qact1.quantizer.scale,
         "layers.0.downsample.qact1.scale"),
        (blk31.attn.qact3.quantizer.scale,
         "layers.3.blocks.1.attn.qact3.scale"),
        (model.qact2.quantizer.scale, "qact2.scale"),
        (model.qact3.quantizer.scale, "qact3.scale"),
        (model.act_out.quantizer.scale, "act_out.scale"),
    ]
    for ref_scale, key in pairs:
        np.testing.assert_allclose(
            np.asarray(qp[key]).reshape(-1),
            ref_scale.detach().cpu().numpy().reshape(-1),
            rtol=1e-6, err_msg=key)


def test_swin_ptf_scales_match(ref_swin, ours):
    """PTF (channel-wise power-of-two-factor) sites: the LN-input fences."""
    model, _, _ = ref_swin
    _, _, _, qp, _ = ours
    blk01 = model.layers[0].blocks[1]
    for ref_scale, key in [
        (blk01.qact2.quantizer.scale, "layers.0.blocks.1.qact2.scale"),
        (blk01.mlp.qact2.quantizer.scale,
         "layers.0.blocks.1.mlp.qact2.scale"),
        (blk01.qact4.quantizer.scale, "layers.0.blocks.1.qact4.scale"),
        (model.layers[1].downsample.qact2.quantizer.scale,
         "layers.1.downsample.qact2.scale"),
    ]:
        np.testing.assert_allclose(
            np.asarray(qp[key]).reshape(-1),
            ref_scale.detach().cpu().numpy().reshape(-1),
            rtol=1e-6, err_msg=key)


def test_swin_weight_scales_match(ref_swin, ours):
    model, _, _ = ref_swin
    _, _, _, qp, _ = ours
    blk = model.layers[1].blocks[0]
    for bit in ("int4", "int8"):
        for ref_mod, key in [
            (blk.attn.qkv, f"layers.1.blocks.0.attn.qkv.w.{bit}.scale"),
            (blk.attn.proj, f"layers.1.blocks.0.attn.proj.w.{bit}.scale"),
            (blk.mlp.fc1, f"layers.1.blocks.0.mlp.fc1.w.{bit}.scale"),
            (blk.mlp.fc2, f"layers.1.blocks.0.mlp.fc2.w.{bit}.scale"),
            (model.layers[1].downsample.reduction,
             f"layers.1.downsample.reduction.w.{bit}.scale"),
            (model.head, f"head.w.{bit}.scale"),
        ]:
            np.testing.assert_allclose(
                np.asarray(qp[key]).reshape(-1),
                ref_mod.quantizer.dic_scale[bit].detach().numpy().reshape(-1),
                rtol=1e-6, err_msg=key)


def test_swin_w4_logits_match(ref_swin, ours):
    """Round-4 anchor (VERDICT r3 item 7): a REAL W4 Swin eval upstream.
    Swin passes bit_config=None so the committed eval is stuck at the
    last-swept int8 (see test_swin_quantized_logits_match); the W4 knob
    the quantizer actually exposes is ``quantizer.bit_type`` — post
    calibration it reads dic_scale['int4'] (uniform.py:50-66, the
    swin_quant.py:813-817 configuration surface).  Set it on every weight
    module (QLinear/QConv2d; activation quantizers keep their own bits)
    and compare against the rebuild's uniform bit=4."""
    import jax.numpy as jnp

    from models.ptq import BIT_TYPE_DICT as RBITS
    from models.ptq.layers import QConv2d, QLinear

    from diffvit_tpu.models import swin

    model, calib, _ = ref_swin
    spec, cfg, params, qp, _ = ours
    wmods = [m for m in model.modules() if isinstance(m, (QLinear, QConv2d))]
    assert len(wmods) > 40  # qkv/proj/fc1/fc2 per block + reductions + head
    saved = [(m.quantizer.bit_type, m.observer.bit_type) for m in wmods]
    try:
        for m in wmods:
            m.quantizer.bit_type = RBITS["int4"]
            m.observer.bit_type = RBITS["int4"]
        with torch.no_grad():
            ref_w4 = model(calib).numpy()
    finally:
        for m, (qb, ob) in zip(wmods, saved):
            m.quantizer.bit_type = qb
            m.observer.bit_type = ob
    got = np.asarray(swin.forward_q(params, qp, spec, cfg,
                                    jnp.asarray(calib.numpy()), bit=4))
    np.testing.assert_array_equal(got.argmax(1), ref_w4.argmax(1))
    corr = np.corrcoef(got.reshape(-1), ref_w4.reshape(-1))[0, 1]
    assert corr > 0.99, corr
    np.testing.assert_allclose(got, ref_w4, atol=0.5)


def test_swin_quantized_logits_match(ref_swin, ours):
    """Upstream Swin calls QLinear/QConv2d with bit_config=None, so the
    quant branch reuses whatever bit_type the calibration sweep set LAST —
    int8, layer-wise (layers.py:151-176: the loop ends on int8 and the
    `if bit_config:` reset is skipped).  The reference's Swin eval is
    therefore effectively W8; compare against our uniform bit=8."""
    import jax.numpy as jnp

    from diffvit_tpu.models import swin

    model, calib, ref_logits = ref_swin
    spec, cfg, params, qp, _ = ours
    got = np.asarray(swin.forward_q(params, qp, spec, cfg,
                                    jnp.asarray(calib.numpy()), bit=8))
    np.testing.assert_array_equal(got.argmax(1), ref_logits.argmax(1))
    corr = np.corrcoef(got.reshape(-1), ref_logits.reshape(-1))[0, 1]
    assert corr > 0.99, corr
    np.testing.assert_allclose(got, ref_logits, atol=0.5)
