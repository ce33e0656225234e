"""vit_large at TRUE geometry (24 blocks, 1024-dim, 16 heads): scales-only
parity vs the actual reference (VERDICT r3 item 7b).

The standing matrix anchors vit_large's input_quant=False quirk at tiny
geometry (test_e2e_matrix_parity.test_input_quant_false_parity); this cell
runs the real `vit_large_patch16_224` constructor (vit_fquant.py:911-927)
so depth-24 stat accumulation, the 1024-channel PTF argmin, and the
no-input-QAct head/tail wiring are pinned at production scale.

Scales-only by design: the quantized forward adds ~10 min of CPU for no
extra semantic coverage (the forward is a deterministic function of the
scales, already pinned elsewhere).  ~8-12 min on the 1-core host, so it
lives in the `xl` tier — deselected from the default run (pytest.ini
addopts), run explicitly with `pytest -m xl`; the measured result is
recorded in PARITY.md.
"""
import numpy as np
import pytest
import torch

pytestmark = [pytest.mark.usefixtures("reference_available"),
              pytest.mark.xl]


def test_vit_large_true_geometry_scales_parity():
    import jax.numpy as jnp
    from config import Config
    from models import vit_fquant as ref_vit

    from diffvit_tpu.config import QuantConfig
    from diffvit_tpu.models import vit
    from diffvit_tpu.models.load import convert_vit_torch_state_dict

    torch.manual_seed(0)
    np.random.seed(0)
    cfg_ref = Config(ptf=True, lis=True, quant_method="minmax")
    model = ref_vit.vit_large_patch16_224(pretrained=False, cfg=cfg_ref)
    model.eval()
    assert not hasattr(model, "qact_input")  # input_quant=False quirk
    calib = torch.randn(1, 3, 224, 224)
    model.model_open_calibrate()
    with torch.no_grad():
        model.model_open_last_calibrate()
        model(calib, plot=False)
    model.model_close_calibrate()
    model.model_quant()

    spec = vit.VIT_SPECS["vit_large"]
    params = convert_vit_torch_state_dict(model.state_dict(), spec)
    cfg = QuantConfig(ptf=True, lis=True, quant_method="minmax")
    qp, _ = vit.calibrate(params, spec, cfg, jnp.asarray(calib.numpy()))
    assert "qact_input.scale" not in qp

    scale_pairs = [
        (model.patch_embed.qact.quantizer.scale, "patch.qact.scale"),
        (model.qact1.quantizer.scale, "qact1.scale"),
        (model.blocks[0].attn.qact1.quantizer.scale,
         "blocks.0.attn.qact1.scale"),
        (model.blocks[11].attn.qact_attn1.quantizer.scale,
         "blocks.11.attn.qact_attn1.scale"),
        (model.blocks[11].mlp.qact2.quantizer.scale,
         "blocks.11.mlp.qact2.scale"),
        (model.blocks[23].qact4.quantizer.scale, "blocks.23.qact4.scale"),
        (model.act_out.quantizer.scale, "act_out.scale"),
    ]
    for ref_scale, key in scale_pairs:
        ours = np.asarray(qp[key]).reshape(-1)
        refs = ref_scale.detach().cpu().numpy().reshape(-1)
        # same tolerance regime as the deit_base cell: torch-vs-XLA f32
        # reduction drift reaches ~1e-4 relative at this width/depth, and
        # PTF channels sitting on an error tie may flip one power of two
        flip = np.minimum.reduce([
            np.abs(ours / refs - 1.0),
            np.abs(ours / (2 * refs) - 1.0),
            np.abs(2 * ours / refs - 1.0)])
        agree = np.abs(ours / refs - 1.0) < 2e-4
        assert np.mean(agree) > 0.99, (key, float(np.mean(agree)))
        assert np.all(flip < 2e-4), (key, float(flip.max()))
        print(f"\nPARITY vit_large/true-geometry {key}: "
              f"agree={np.mean(agree):.4f} worst_flip={flip.max():.2e}")
