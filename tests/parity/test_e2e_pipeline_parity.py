"""End-to-end pipeline parity: the actual reference (torch, CPU) vs the
rebuild, with identical weights and calibration batch.

Builds the reference deit_tiny, copies its weights into our param pytree,
runs the reference calibration protocol (model_open_calibrate +
open_last_calibrate + one forward, test_quant.py:234-249) and quantized
evaluation, and compares:

* calibration scales at representative sites (bit-exact expectations),
* quantized logits (tolerance: fake-quant round/clip boundaries can flip
  under f32 associativity differences, so we check close + rank agreement).

This is the strongest available accuracy-parity evidence in an environment
with no pretrained weights or ImageNet.
"""
import numpy as np
import pytest
import torch

pytestmark = pytest.mark.usefixtures("reference_available")


@pytest.fixture(scope="module")
def ref_setup():
    torch.manual_seed(0)
    np.random.seed(0)

    from config import Config
    from models import deit_tiny_patch16_224

    cfg_ref = Config(ptf=True, lis=True, quant_method="minmax")
    model = deit_tiny_patch16_224(pretrained=False, cfg=cfg_ref)
    model.eval()

    calib = torch.randn(2, 3, 224, 224)

    model.model_open_calibrate()
    with torch.no_grad():
        model.model_open_last_calibrate()
        model(calib, plot=False)
    model.model_close_calibrate()
    model.model_quant()
    return model, calib


@pytest.fixture(scope="module")
def ours_setup(ref_setup):
    import jax.numpy as jnp

    from diffvit_tpu.config import QuantConfig
    from diffvit_tpu.models import vit
    from diffvit_tpu.models.load import convert_vit_torch_state_dict

    model, calib = ref_setup
    spec = vit.VIT_SPECS["deit_tiny"]
    params = convert_vit_torch_state_dict(model.state_dict(), spec)
    cfg = QuantConfig(ptf=True, lis=True, quant_method="minmax")
    qp, dist = vit.calibrate(params, spec, cfg, jnp.asarray(calib.numpy()))
    return spec, cfg, params, qp, dist


def test_act_scales_match(ref_setup, ours_setup):
    model, _ = ref_setup
    spec, cfg, params, qp, _ = ours_setup

    # plain activation sites (minmax + PoT, layer-wise scalars)
    pairs = [
        (model.qact_input.quantizer.scale, "qact_input.scale"),
        (model.patch_embed.qact.quantizer.scale, "patch.qact.scale"),
        (model.qact_embed.quantizer.scale, "qact_embed.scale"),
        (model.blocks[0].attn.qact1.quantizer.scale,
         "blocks.0.attn.qact1.scale"),
        (model.blocks[5].attn.qact_attn1.quantizer.scale,
         "blocks.5.attn.qact_attn1.scale"),
        (model.blocks[11].mlp.qact1.quantizer.scale,
         "blocks.11.mlp.qact1.scale"),
        (model.qact2.quantizer.scale, "qact2.scale"),
        (model.act_out.quantizer.scale, "act_out.scale"),
    ]
    for ref_scale, key in pairs:
        np.testing.assert_allclose(
            np.asarray(qp[key]).reshape(-1),
            ref_scale.detach().cpu().numpy().reshape(-1),
            rtol=1e-6, err_msg=key)


def test_ptf_scales_match(ref_setup, ours_setup):
    model, _ = ref_setup
    _, _, _, qp, _ = ours_setup
    for ref_scale, key in [
        (model.qact1.quantizer.scale, "qact1.scale"),
        (model.blocks[0].qact2.quantizer.scale, "blocks.0.qact2.scale"),
        (model.blocks[7].qact4.quantizer.scale, "blocks.7.qact4.scale"),
        (model.blocks[3].attn.qact3.quantizer.scale,
         "blocks.3.attn.qact3.scale"),
    ]:
        np.testing.assert_allclose(
            np.asarray(qp[key]), ref_scale.detach().cpu().numpy(),
            rtol=1e-6, err_msg=key)


def test_weight_scales_match(ref_setup, ours_setup):
    model, _ = ref_setup
    cfg = ours_setup[1]
    qp = ours_setup[3]

    # non-SmoothQuant linears: proj / fc2 / head per-bit dictionaries
    for blk_i in (0, 6):
        blk = model.blocks[blk_i]
        for bit in ("int4", "int8"):
            np.testing.assert_allclose(
                np.asarray(qp[f"blocks.{blk_i}.attn.proj.w.{bit}.scale"]).reshape(-1),
                blk.attn.proj.quantizer.dic_scale[bit].detach().numpy().reshape(-1),
                rtol=1e-6, err_msg=f"proj {blk_i} {bit}")
            np.testing.assert_allclose(
                np.asarray(qp[f"blocks.{blk_i}.mlp.fc2.w.{bit}.scale"]).reshape(-1),
                blk.mlp.fc2.quantizer.dic_scale[bit].detach().numpy().reshape(-1),
                rtol=1e-6, err_msg=f"fc2 {blk_i} {bit}")
    np.testing.assert_allclose(
        np.asarray(qp["head.w.int4.scale"]).reshape(-1),
        model.head.quantizer.dic_scale["int4"].detach().numpy().reshape(-1),
        rtol=1e-6)


def test_smoothquant_caches_match(ref_setup, ours_setup):
    model, _ = ref_setup
    cfg = ours_setup[1]
    qp = ours_setup[3]
    for blk_i in (0, 11):
        attn = model.blocks[blk_i].attn
        for pool_idx in range(len(cfg.bit_pool)):
            np.testing.assert_allclose(
                np.asarray(qp[f"blocks.{blk_i}.attn.qkv.sq.channel_scale"][pool_idx]),
                attn.best_scale[pool_idx].detach().numpy(), rtol=1e-6)
            np.testing.assert_allclose(
                np.asarray(qp[f"blocks.{blk_i}.attn.qkv.qact0.scale"][pool_idx]).reshape(-1),
                attn.best_act_scale[pool_idx].detach().numpy().reshape(-1),
                rtol=1e-6)
            np.testing.assert_allclose(
                np.asarray(qp[f"blocks.{blk_i}.attn.qkv.w.int4.scale"][pool_idx]).reshape(-1),
                attn.best_weight_scale[pool_idx]["int4"].detach().numpy().reshape(-1),
                rtol=1e-6)


def test_global_distance_contract(ref_setup, ours_setup):
    """The reference crashes on bit_config=None after SmoothQuant
    calibration (vit_fquant.py:282 bit_pool.index(None) — one of the stale
    paths catalogued in SURVEY §2.3), so the FLOPs companion is checked on
    the [4]*50 eval and the distance array against the §2.6 contract."""
    model, calib = ref_setup
    dist = ours_setup[4]
    with torch.no_grad():
        out, flops, gd = model(calib, [4] * 50, False)
    assert len(flops) == 50
    from diffvit_tpu.models import vit

    ours_flops = vit.flops_list(vit.VIT_SPECS["deit_tiny"])
    assert ours_flops == [int(f) for f in flops]
    assert np.asarray(dist).shape == (49, 4)
    assert np.all(np.isfinite(np.asarray(dist)))


def test_quantized_logits_match(ref_setup, ours_setup):
    import jax.numpy as jnp

    from diffvit_tpu.models import vit

    model, calib = ref_setup
    spec, cfg, params, qp, _ = ours_setup

    bit_config = [4] * 50
    with torch.no_grad():
        ref_logits = model(calib, bit_config, False)[0].numpy()
    got = np.asarray(vit.forward_q(params, qp, spec, cfg,
                                   jnp.asarray(calib.numpy()),
                                   tuple(bit_config)))
    # Entries land on the same act_out quantization grid; f32
    # summation-order differences (torch vs XLA reductions inside the
    # integer LayerNorm) flip occasional round() boundaries, so a large
    # fraction — not all — of entries are bit-identical.  Predictions match.
    agree = np.mean(got == ref_logits)
    assert agree > 0.3, f"exact-entry agreement {agree}"
    np.testing.assert_allclose(got, ref_logits, atol=0.3)
    np.testing.assert_array_equal(got.argmax(1), ref_logits.argmax(1))
    corr = np.corrcoef(got.reshape(-1), ref_logits.reshape(-1))[0, 1]
    assert corr > 0.99, corr


def test_quantized_logits_match_int8(ref_setup, ours_setup):
    import jax.numpy as jnp

    from diffvit_tpu.models import vit

    model, calib = ref_setup
    spec, cfg, params, qp, _ = ours_setup
    bit_config = [8] * 50
    with torch.no_grad():
        ref_logits = model(calib, bit_config, False)[0].numpy()
    got = np.asarray(vit.forward_q(params, qp, spec, cfg,
                                   jnp.asarray(calib.numpy()),
                                   tuple(bit_config)))
    agree = np.mean(got == ref_logits)
    assert agree > 0.3, f"exact-entry agreement {agree}"
    np.testing.assert_array_equal(got.argmax(1), ref_logits.argmax(1))
