"""Multi-batch calibration parity: the reference's INTENDED
observe-then-finalize loop vs the rebuild's ``calibrate_batches``.

Upstream committed the loop commented out (test_quant.py:238-243):

    for i, image in enumerate(image_list):
        if i == len(image_list) - 1:
            model.model_open_last_calibrate()
        output, FLOPs, global_distance = model(image, plot=False)

This cell shims exactly that (the same way the Swin arity was shimmed):
observe-only batches accumulate running-min/max (observer/minmax.py:16-39)
or EMA-merged stats (observer/ema.py:19-36) and run float softmax (no LIS
scale exists yet, models/ptq/layers.py:368); the final batch finalizes
every scale against the merged statistics.  Asserted against
``vit.calibrate_batches`` on identical weights + batches:

* plain activation scales (minmax PoT search / EMA / percentile),
* PTF channel-mask scales at the LayerNorm input sites,
* per-bit weight scale dictionaries (whose PoT output-reconstruction
  search sees the LAST batch's x with the accumulated weight stats),
* SmoothQuant caches (channel scale + cached act scale — the observe-only
  batches feed qact0 a PER-BATCH smoothed x, vit_fquant.py:240-252),
* argmax-equal quantized logits at W8.

Covers minmax at 2 AND 3 batches plus ema/percentile at 2 batches (the
VERDICT-4 bar: >=2 observers x >=2 batch counts).
"""
import functools

import numpy as np
import pytest
import torch

pytestmark = pytest.mark.usefixtures("reference_available")


@functools.lru_cache(maxsize=None)
def _both_sides(method, n_batches):
    torch.manual_seed(0)

    from config import Config
    from models import deit_tiny_patch16_224

    model = deit_tiny_patch16_224(
        pretrained=False, cfg=Config(ptf=True, lis=True,
                                     quant_method=method))
    model.eval()
    gen = torch.Generator().manual_seed(7)
    batches = [torch.randn(2, 3, 224, 224, generator=gen)
               for _ in range(n_batches)]

    # the intended loop, test_quant.py:238-243
    model.model_open_calibrate()
    with torch.no_grad():
        for i, image in enumerate(batches):
            if i == len(batches) - 1:
                model.model_open_last_calibrate()
            model(image, plot=False)
    model.model_close_calibrate()
    model.model_quant()

    import jax.numpy as jnp

    from diffvit_tpu.config import QuantConfig
    from diffvit_tpu.models import vit
    from diffvit_tpu.models.load import convert_vit_torch_state_dict

    spec = vit.VIT_SPECS["deit_tiny"]
    params = convert_vit_torch_state_dict(model.state_dict(), spec)
    cfg = QuantConfig(ptf=True, lis=True, quant_method=method)
    qp, _ = vit.calibrate_batches(
        params, spec, cfg, [jnp.asarray(b.numpy()) for b in batches])
    return model, batches, spec, cfg, params, qp


CASES = [("minmax", 2), ("minmax", 3), ("ema", 2), ("percentile", 2)]


@pytest.mark.parametrize("method,n", CASES)
def test_multibatch_scales_match(method, n):
    model, _, _, cfg, _, qp = _both_sides(method, n)
    # minmax/percentile scales PoT-snap (or quantile-pin), absorbing the
    # torch-vs-XLA f32 associativity noise in the forward statistics; EMA
    # scales are raw (max-min)/levels of EMA-merged stats, so they carry
    # ~1e-6 relative noise through the 12-block forward.  A wrong merge
    # (order, decay, per-batch vs running) diverges at O(0.1).
    rtol = 4e-6 if method == "ema" else 1e-6

    # plain activation sites — stats merged across all n batches
    for ref_scale, key in [
        (model.qact_input.quantizer.scale, "qact_input.scale"),
        (model.patch_embed.qact.quantizer.scale, "patch.qact.scale"),
        (model.blocks[0].attn.qact1.quantizer.scale,
         "blocks.0.attn.qact1.scale"),
        (model.blocks[5].attn.qact_attn1.quantizer.scale,
         "blocks.5.attn.qact_attn1.scale"),
        (model.blocks[11].mlp.qact1.quantizer.scale,
         "blocks.11.mlp.qact1.scale"),
        (model.qact2.quantizer.scale, "qact2.scale"),
        (model.act_out.quantizer.scale, "act_out.scale"),
    ]:
        np.testing.assert_allclose(
            np.asarray(qp[key]).reshape(-1),
            ref_scale.detach().cpu().numpy().reshape(-1),
            rtol=rtol, err_msg=f"{method}/{n} {key}")

    # PTF channel-mask sites (LN inputs)
    for ref_scale, key in [
        (model.qact1.quantizer.scale, "qact1.scale"),
        (model.blocks[0].qact2.quantizer.scale, "blocks.0.qact2.scale"),
        (model.blocks[7].qact4.quantizer.scale, "blocks.7.qact4.scale"),
        (model.blocks[3].attn.qact3.quantizer.scale,
         "blocks.3.attn.qact3.scale"),
    ]:
        np.testing.assert_allclose(
            np.asarray(qp[key]), ref_scale.detach().cpu().numpy(),
            rtol=rtol, err_msg=f"{method}/{n} {key}")

    # per-bit weight scales (search runs on the LAST batch's activations)
    blk = model.blocks[0]
    for bit in ("int4", "int8"):
        np.testing.assert_allclose(
            np.asarray(qp[f"blocks.0.attn.proj.w.{bit}.scale"]).reshape(-1),
            blk.attn.proj.quantizer.dic_scale[bit].detach().numpy()
            .reshape(-1), rtol=rtol, err_msg=f"{method}/{n} proj {bit}")
        np.testing.assert_allclose(
            np.asarray(qp[f"blocks.0.mlp.fc2.w.{bit}.scale"]).reshape(-1),
            blk.mlp.fc2.quantizer.dic_scale[bit].detach().numpy()
            .reshape(-1), rtol=rtol, err_msg=f"{method}/{n} fc2 {bit}")

    # SmoothQuant caches
    attn = model.blocks[0].attn
    for pool_idx in range(len(cfg.bit_pool)):
        np.testing.assert_allclose(
            np.asarray(qp["blocks.0.attn.qkv.sq.channel_scale"][pool_idx]),
            attn.best_scale[pool_idx].detach().numpy(), rtol=1e-6)
        np.testing.assert_allclose(
            np.asarray(
                qp["blocks.0.attn.qkv.qact0.scale"][pool_idx]).reshape(-1),
            attn.best_act_scale[pool_idx].detach().numpy().reshape(-1),
            rtol=1e-6)


@pytest.mark.parametrize("method,n", [("minmax", 3), ("ema", 2)])
def test_multibatch_logits_argmax_match(method, n):
    import jax.numpy as jnp

    from diffvit_tpu.models import vit

    model, batches, spec, cfg, params, qp = _both_sides(method, n)
    bit_config = [8] * 50
    with torch.no_grad():
        ref_logits = model(batches[-1], bit_config, False)[0].numpy()
    got = np.asarray(vit.forward_q(params, qp, spec, cfg,
                                   jnp.asarray(batches[-1].numpy()),
                                   tuple(bit_config)))
    np.testing.assert_array_equal(got.argmax(1), ref_logits.argmax(1))
    corr = np.corrcoef(got.reshape(-1), ref_logits.reshape(-1))[0, 1]
    # ema's non-PoT scales carry ~1e-6 f32 noise that flips round()
    # half-way LSBs at every one of the ~50 act sites; argmax still
    # matches but raw logit correlation degrades slightly (0.987 measured)
    assert corr > (0.98 if method == "ema" else 0.99), corr


def test_multibatch_stats_actually_merge():
    """Sanity that n=3 is a real multi-batch test: the merged scales must
    differ from single-batch calibration on the last batch alone."""
    model, batches, spec, cfg, params, qp = _both_sides("minmax", 3)
    import jax.numpy as jnp

    from diffvit_tpu.models import vit

    qp1, _ = vit.calibrate(params, spec, cfg,
                           jnp.asarray(batches[-1].numpy()))
    keys = [k for k in qp if k.endswith(".scale")]
    diffs = sum(
        not np.allclose(np.asarray(qp[k]), np.asarray(qp1[k]))
        for k in keys)
    assert diffs > 0
