"""Parity: the uint8 asymmetric QAct calibration path vs the reference.

Reference: QAct.forward(x, asymmetric=True) (models/ptq/layers.py:207-218)
retags the site's observer/quantizer to uint8 with observer.symmetric=False;
MinmaxObserver.get_quantization_params then takes the non-symmetric branch
(observer/minmax.py:263-271): scale=(max-min)/(qmax-qmin), zp=clamp(qmin -
round(min/scale)), followed by the 4-candidate PoT search scoring fake-quant
WITH the zero point.
"""
import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")


def _reference_asym_qparams(x_np):
    import torch
    from models.ptq.bit_type import BIT_TYPE_DICT
    from models.ptq.observer import build_observer

    obs = build_observer("minmax", "activation", BIT_TYPE_DICT["uint8"],
                         "layer_wise")
    obs.symmetric = False
    x = torch.from_numpy(x_np)
    obs.update(x)
    scale, zp = obs.get_quantization_params(x)
    return np.asarray(scale.detach()), np.asarray(zp.detach())


def test_asymmetric_uint8_qparams_match_reference(reference_available):
    from diffvit_tpu.calib.observers import minmax_act_qparams_asymmetric
    from diffvit_tpu.ops.bit_types import BIT_TYPE_DICT

    rng = np.random.default_rng(3)
    # shifted activations so min != -max (the asymmetric case that matters)
    x = (rng.standard_normal((2, 50, 32)) * 1.7 + 0.9).astype(np.float32)

    ref_scale, ref_zp = _reference_asym_qparams(x)
    got_scale, got_zp = minmax_act_qparams_asymmetric(
        jnp.asarray(x), BIT_TYPE_DICT["uint8"])

    np.testing.assert_allclose(np.asarray(got_scale), ref_scale, rtol=0,
                               atol=0)
    np.testing.assert_allclose(np.asarray(got_zp), ref_zp, rtol=0, atol=0)


def test_asymmetric_site_roundtrip():
    """End-to-end through _calib_act_site(asymmetric=True) + uint8
    fake_quant: codes in [0,255] grid, dequant error bounded by scale/2."""
    import jax

    from diffvit_tpu.config import QuantConfig
    from diffvit_tpu.models.vit import _calib_act_site
    from diffvit_tpu.ops.bit_types import BIT_TYPE_DICT
    from diffvit_tpu.ops.quant import fake_quant

    x = jax.random.normal(jax.random.PRNGKey(0), (4, 16, 8)) + 2.0
    qp = {}
    _calib_act_site(qp, "site", x, QuantConfig(), asymmetric=True)
    bt = BIT_TYPE_DICT["uint8"]
    xq = fake_quant(x, qp["site.scale"], qp["site.zp"], bt)
    scale = float(qp["site.scale"])
    inside = (x > x.min() + scale) & (x < x.max() - scale)
    err = jnp.abs(jnp.where(inside, xq - x, 0.0))
    assert float(err.max()) <= scale * 0.5 + 1e-6
    assert float(qp["site.zp"]) != 0.0  # genuinely asymmetric input
