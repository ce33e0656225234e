"""Multi-batch calibration input for the recovery passes.

The measured failure mode of the single-batch protocol is overfit: QAT at
lr=1e-5 reaches calib rel-err 0.079 while held-out stays at 0.259
(scripts/qat_order_exp.py, deit_small int4 on-chip).  These tests pin the
plumbing that lets --calib-multi-batch feed ALL recovery passes:

* ``engine._recon_input`` concatenates a batch list evenly under the
  ``max_images`` cap (adaround/bias_correct materialize every site's tap
  for every image in one forward — the cap is a memory bound, and
  AdaRound row-subsamples per site anyway, so diversity > count),
* ``bias_correct`` over a duplicated batch list reproduces the
  single-batch result (means over duplicated rows are the same means),
* ``adaround`` / ``qat`` accept distinct batch lists and still improve.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffvit_tpu.config import QuantConfig
from diffvit_tpu.engine import QuantizedViT
from diffvit_tpu.models import vit

TINY = vit.ViTSpec("test_tiny", embed_dim=64, depth=2, num_heads=2,
                   num_classes=10)


@pytest.fixture(scope="module")
def setup():
    params = vit.init_params(TINY, jax.random.PRNGKey(0))
    b0 = jax.random.normal(jax.random.PRNGKey(1), (4, 3, 224, 224))
    b1 = jax.random.normal(jax.random.PRNGKey(2), (4, 3, 224, 224))
    cfg = QuantConfig()
    bc = (4,) * vit.num_bit_slots(TINY)
    return params, cfg, b0, b1, bc


def _fresh(params, cfg, calib):
    model = QuantizedViT(TINY, cfg, params=params)
    model.calibrate(calib)
    return model


def test_recon_input_concat_and_cap(setup):
    params, cfg, b0, b1, _ = setup
    model = QuantizedViT(TINY, cfg, params=params)
    # single array: passthrough shape
    assert model._recon_input(b0, 256).shape == b0.shape
    # list under the cap: plain concat in order
    x = model._recon_input([b0, b1], 256)
    assert x.shape == (8, 3, 224, 224)
    np.testing.assert_array_equal(np.asarray(x[:4]), np.asarray(b0))
    np.testing.assert_array_equal(np.asarray(x[4:]), np.asarray(b1))
    # over the cap: even per-batch quota, total == max_images
    x = model._recon_input([b0, b1], 6)
    assert x.shape[0] == 6
    np.testing.assert_array_equal(np.asarray(x[:3]), np.asarray(b0[:3]))
    np.testing.assert_array_equal(np.asarray(x[3:]), np.asarray(b1[:3]))
    # no cap: everything
    assert model._recon_input([b0, b1], None).shape[0] == 8


def test_bias_correct_duplicate_list_matches_single(setup):
    """Per-channel means over [b, b] are the means over b — the corrected
    biases must match the single-batch pass up to f32 reassociation."""
    params, cfg, b0, _, bc = setup
    m1 = _fresh(params, cfg, b0)
    m1.bias_correct(b0, bc)
    m2 = _fresh(params, cfg, b0)
    m2.bias_correct([b0, b0], bc)
    for i in range(TINY.depth):
        np.testing.assert_allclose(
            np.asarray(m2.params["blocks"][i]["fc2"]["b"]),
            np.asarray(m1.params["blocks"][i]["fc2"]["b"]),
            rtol=0, atol=1e-4)


def test_adaround_multibatch_improves(setup):
    """AdaRound over two distinct batches consumes both (report covers all
    sites) and still moves the logits toward FP on BOTH batches."""
    params, cfg, b0, b1, bc = setup
    model = _fresh(params, cfg, [b0, b1])
    fp0 = vit.forward_fp(params, TINY, b0)
    fp1 = vit.forward_fp(params, TINY, b1)
    e = lambda m, x, fp: float(jnp.linalg.norm(m(x, bc) - fp)
                               / jnp.linalg.norm(fp))
    e0_before, e1_before = e(model, b0, fp0), e(model, b1, fp1)
    report = model.adaround([b0, b1], bc, steps=200, max_rows=512)
    assert len(report) == 4 * TINY.depth + 2
    assert e(model, b0, fp0) < e0_before, (e0_before, e(model, b0, fp0))
    assert e(model, b1, fp1) < e1_before, (e1_before, e(model, b1, fp1))


def test_qat_batch_list_cycles(setup):
    """engine.qat with a batch list trains on every batch (loss improves,
    trajectory has one entry per step)."""
    params, cfg, b0, b1, bc = setup
    model = _fresh(params, cfg, [b0, b1])
    losses = model.qat([b0, b1], bc, steps=8, lr=1e-4)
    assert len(losses) == 8
    assert losses[-1] < losses[0]
