"""End-to-end smoke tests: FP forward, calibration, quantized forward."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffvit_tpu.config import QuantConfig
from diffvit_tpu.models import vit

pytestmark = pytest.mark.quick



TINY = vit.ViTSpec("test_tiny", embed_dim=64, depth=2, num_heads=2,
                   num_classes=10)


@pytest.fixture(scope="module")
def setup():
    key = jax.random.PRNGKey(0)
    params = vit.init_params(TINY, key)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 3, 224, 224))
    return params, x


def test_forward_fp_shape(setup):
    params, x = setup
    logits = vit.forward_fp(params, TINY, x)
    assert logits.shape == (4, 10)
    assert np.all(np.isfinite(logits))


def test_forward_fp_taps(setup):
    params, x = setup
    taps = []
    vit.forward_fp(params, TINY, x, taps=taps)
    names = [n for n, _ in taps]
    assert "patch_embed.proj" in names
    assert "blocks.0.attn.qkv" in names
    assert "blocks.1.mlp.fc2" in names
    assert "head" in names
    # 1 patch + 7 per block (qkv, attn-cache, ctx, proj, fc1, mlp-cache,
    # fc2) + 1 head
    assert len(taps) == 1 + 7 * TINY.depth + 1


def test_calibrate_and_forward_q(setup):
    params, x = setup
    cfg = QuantConfig()
    qp, dist = vit.calibrate(params, TINY, cfg, x)
    # global_distance: 4*depth+1 linears x 4 bit types
    assert dist.shape == (4 * TINY.depth + 1, 4)
    assert np.all(np.isfinite(dist))

    fp = vit.forward_fp(params, TINY, x)
    for bits in (4, 8):
        bc = (bits,) * vit.num_bit_slots(TINY)
        q = vit.forward_q(params, qp, TINY, cfg, x, bc)
        assert q.shape == fp.shape
        assert np.all(np.isfinite(q))
        # int8 should track FP closely on random data; int4 loosely
        rel = np.linalg.norm(q - fp) / (np.linalg.norm(fp) + 1e-9)
        assert rel < (0.5 if bits == 8 else 2.0), (bits, rel)


def test_forward_q_minus_one_is_fp_like(setup):
    """bit -1 on every layer + ptf off + lis off == (close to) FP forward."""
    params, x = setup
    cfg = QuantConfig(ptf=False, lis=False)
    qp, _ = vit.calibrate(params, TINY, cfg, x)
    bc = (-1,) * vit.num_bit_slots(TINY)
    q = vit.forward_q(params, qp, TINY, cfg, x, bc)
    fp = vit.forward_fp(params, TINY, x)
    # activations still fake-quantized (QActs always fire once quantized),
    # so allow a loose int8-level tolerance
    rel = np.linalg.norm(q - fp) / np.linalg.norm(fp)
    assert rel < 0.5, rel


def test_flops_list(setup):
    fl = vit.flops_list(TINY)
    assert len(fl) == vit.num_bit_slots(TINY)
    n, c = TINY.seq_len, TINY.embed_dim
    assert fl[1] == n * c * 3 * c
    assert fl[-1] == c * TINY.num_classes


def test_bit_config_mixed(setup):
    params, x = setup
    cfg = QuantConfig()
    qp, _ = vit.calibrate(params, TINY, cfg, x)
    bc = [8] + [4, 8] * (2 * TINY.depth) + [8]
    q = vit.forward_q(params, qp, TINY, cfg, x, tuple(bc))
    assert np.all(np.isfinite(q))


def test_multibatch_calibration(setup):
    """calibrate_batches on [x, x] must equal single-batch calibrate for
    running-max observers; distinct batches widen the observed ranges."""
    params, x = setup
    cfg = QuantConfig()
    qp1, d1 = vit.calibrate(params, TINY, cfg, x)
    qp2, d2 = vit.calibrate_batches(params, TINY, cfg, [x, x])
    # pre-attention sites see identical tensors in both protocols
    for k in ("qact_input.scale", "patch.qact.scale", "qact_embed.scale",
              "qact1.scale"):
        np.testing.assert_allclose(np.asarray(qp2[k]), np.asarray(qp1[k]),
                                   rtol=1e-6, err_msg=k)
    # post-attention sites differ slightly: observation batches run float
    # softmax (qact_attn1's scale doesn't exist yet — layers.py:368), the
    # final batch runs LIS, exactly as in the reference protocol
    for k in qp1:
        np.testing.assert_allclose(np.asarray(qp2[k]), np.asarray(qp1[k]),
                                   rtol=5e-2, err_msg=k)
    np.testing.assert_allclose(np.asarray(d2), np.asarray(d1), rtol=5e-2)

    x2 = jax.random.normal(jax.random.PRNGKey(9), x.shape) * 2.0
    qp3, _ = vit.calibrate_batches(params, TINY, cfg, [x2, x])
    # wider inputs in the observation batch -> input scale must not shrink
    assert float(qp3["qact_input.scale"]) >= float(qp1["qact_input.scale"])
    out = vit.forward_q(params, qp3, TINY, cfg, x,
                        (4,) * vit.num_bit_slots(TINY))
    assert np.all(np.isfinite(np.asarray(out)))


def test_multibatch_calibration_ema(setup):
    params, x = setup
    cfg = QuantConfig(quant_method="ema")
    qp, _ = vit.calibrate_batches(params, TINY, cfg, [x, x * 0.5])
    out = vit.forward_q(params, qp, TINY, cfg, x,
                        (8,) * vit.num_bit_slots(TINY))
    assert np.all(np.isfinite(np.asarray(out)))
