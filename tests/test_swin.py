"""Swin family: geometry, FP forward, calibration, quantized forward."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffvit_tpu.config import QuantConfig
from diffvit_tpu.models import swin

TINY = swin.SwinSpec("swin_test", embed_dim=32, depths=(1, 1),
                     num_heads=(2, 4), img_size=56, num_classes=10)


def test_window_roundtrip():
    x = jnp.arange(2 * 14 * 14 * 8, dtype=jnp.float32).reshape(2, 14, 14, 8)
    w = swin.window_partition(x, 7)
    assert w.shape == (2 * 4, 49, 8)
    back = swin.window_reverse(w.reshape(-1, 7, 7, 8), 7, 14, 14)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_relative_position_index_matches_reference_construction():
    import torch

    ws = 7
    coords = torch.stack(torch.meshgrid([torch.arange(ws), torch.arange(ws)],
                                        indexing="ij"))
    flat = torch.flatten(coords, 1)
    rel = (flat[:, :, None] - flat[:, None, :]).permute(1, 2, 0).contiguous()
    rel[:, :, 0] += ws - 1
    rel[:, :, 1] += ws - 1
    rel[:, :, 0] *= 2 * ws - 1
    ref = rel.sum(-1).numpy()
    np.testing.assert_array_equal(swin.relative_position_index(ws), ref)


def test_shift_mask():
    m = swin.shift_attn_mask((14, 14), 7, 3)
    assert m.shape == (4, 49, 49)
    assert set(np.unique(m)) <= {0.0, -100.0}
    assert swin.shift_attn_mask((14, 14), 7, 0) is None


def test_block_geometry_window_clamp():
    # stage 1 of the tiny spec has resolution 7x7 -> window clamps, no shift
    res, ws, shift, mask = swin.block_geometry(TINY, 1, 1)
    assert res == (7, 7) and ws == 7 and shift == 0 and mask is None


@pytest.fixture(scope="module")
def setup():
    params = swin.init_swin_params(TINY, jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 3, 56, 56))
    return params, x


def test_swin_forward_fp(setup):
    params, x = setup
    logits = swin.forward_fp(params, TINY, x)
    assert logits.shape == (2, 10)
    assert np.all(np.isfinite(np.asarray(logits)))


def test_swin_calibrate_and_forward_q(setup):
    params, x = setup
    cfg = QuantConfig()
    qp, dist = swin.calibrate(params, TINY, cfg, x)
    # qkv/proj/fc1/fc2 per block + reduction + head = 4*2 + 1 + 1
    assert dist.shape == (4 * sum(TINY.depths) + (TINY.num_layers - 1) + 1, 4)
    fp = np.asarray(swin.forward_fp(params, TINY, x))
    for bit in (8, 4):
        q = np.asarray(swin.forward_q(params, qp, TINY, cfg, x, bit=bit))
        assert np.all(np.isfinite(q))
        rel = np.linalg.norm(q - fp) / (np.linalg.norm(fp) + 1e-9)
        assert rel < (0.6 if bit == 8 else 2.5), (bit, rel)


def test_swin_no_ptf_no_lis(setup):
    params, x = setup
    cfg = QuantConfig(ptf=False, lis=False)
    qp, _ = swin.calibrate(params, TINY, cfg, x)
    q = np.asarray(swin.forward_q(params, qp, TINY, cfg, x, bit=8))
    assert np.all(np.isfinite(q))


def test_swin_engine_and_shifted_stage():
    """Full swin_tiny geometry (4 stages incl. shifted blocks) through the
    engine on a single batch."""
    from diffvit_tpu.engine import QuantizedViT

    cfg = QuantConfig()
    model = QuantizedViT("swin_tiny", cfg)
    assert model.is_swin
    x = np.random.default_rng(0).standard_normal((1, 3, 224, 224)).astype("float32")
    out = model(x, quant=False)
    assert out.shape == (1, 1000)
    assert len(model.flops) == swin.num_bit_slots(model.spec)


def test_swin_int_path_matches_fake_quant(setup):
    from diffvit_tpu.models import swin_int

    params, x = setup
    cfg = QuantConfig()
    qp, _ = swin.calibrate(params, TINY, cfg, x)
    for bit in (8, 4):
        ref = np.asarray(swin.forward_q(params, qp, TINY, cfg, x, bit=bit))
        ip = swin_int.prepare_int(params, qp, TINY, cfg, bit=bit)
        got = np.asarray(swin_int.forward_q_int(ip, TINY, cfg, x))
        np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_swin_int_path_no_ptf(setup):
    from diffvit_tpu.models import swin_int

    params, x = setup
    cfg = QuantConfig(ptf=False, lis=False)
    qp, _ = swin.calibrate(params, TINY, cfg, x)
    ref = np.asarray(swin.forward_q(params, qp, TINY, cfg, x, bit=8))
    ip = swin_int.prepare_int(params, qp, TINY, cfg, bit=8)
    got = np.asarray(swin_int.forward_q_int(ip, TINY, cfg, x))
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_swin_fused_attention_kernel_matches_xla(setup):
    """Pallas fused window-attention kernel (interpret mode) vs the XLA int
    path, including a shifted block (mask) and both softmax modes."""
    from diffvit_tpu.models import swin_int

    spec = swin.SwinSpec("swin_test2", embed_dim=32, depths=(2, 1),
                         num_heads=(2, 4), img_size=56, num_classes=10)
    params = swin.init_swin_params(spec, jax.random.PRNGKey(3))
    x = jax.random.normal(jax.random.PRNGKey(4), (2, 3, 56, 56))
    for cfg in (QuantConfig(), QuantConfig(lis=False)):
        qp, _ = swin.calibrate(params, spec, cfg, x)
        ip = swin_int.prepare_int(params, qp, spec, cfg, bit=4)
        ref = np.asarray(swin_int.forward_q_int(ip, spec, cfg, x,
                                                use_pallas=False))
        # v1 = production; attn_v2 = the selection-matrix experiment
        # (measured reject, kept correct behind the flag)
        for kw in ({}, {"attn_v2": True}):
            got = np.asarray(swin_int.forward_q_int(ip, spec, cfg, x,
                                                    use_pallas=True,
                                                    pallas_interpret=True,
                                                    **kw))
            if cfg.lis:
                # LIS codes are exact PoT values -> bit-identical paths
                np.testing.assert_array_equal(got, ref)
            else:
                # float softmax rounds differently between matmul orders
                # (bf16 probs); one-code slack compounding through blocks
                np.testing.assert_allclose(got, ref, atol=0.08)
                np.testing.assert_array_equal(got.argmax(1), ref.argmax(1))


def test_swin_multibatch_calibration(setup):
    """Observe-then-finalize over several batches: runs, and the finalized
    scales reflect the union of the observed ranges."""
    params, x = setup
    cfg = QuantConfig()
    b1 = x
    b2 = x * 2.5  # wider range must widen minmax-derived scales
    qp_multi, dist = swin.calibrate_batches(params, TINY, cfg, [b1, b2])
    qp_single, _ = swin.calibrate(params, TINY, cfg, b2)
    assert set(qp_multi) == set(qp_single)
    # a site whose stats come from minmax: multi >= single-batch-b1 scale
    qp_b1, _ = swin.calibrate(params, TINY, cfg, b1)
    assert float(qp_multi["patch.qact.scale"]) >= \
        float(qp_b1["patch.qact.scale"])


def test_swin_engine_multibatch():
    from diffvit_tpu import engine

    cfg = QuantConfig()
    params = swin.init_swin_params(TINY, jax.random.PRNGKey(0))
    m = engine.QuantizedViT(TINY, cfg, params=params)
    x = np.random.default_rng(0).standard_normal((2, 3, 56, 56)).astype("float32")
    m.calibrate([x, x * 1.5])
    out = m(x, quant=True)
    assert out.shape == (2, 10)


def test_swin_activations_taps():
    """CKA/DDV harvesting for Swin: tap count and ordering match the
    QConv2d/QLinear registration order."""
    from diffvit_tpu import engine
    from diffvit_tpu.analysis import activations

    cfg = QuantConfig()
    params = swin.init_swin_params(TINY, jax.random.PRNGKey(0))
    m = engine.QuantizedViT(TINY, cfg, params=params)
    x = np.random.default_rng(1).standard_normal((2, 3, 56, 56)).astype("float32")
    acts_fp = activations.get_activations(m, x, quant=False)
    expect = 1 + 4 * sum(TINY.depths) + (TINY.num_layers - 1) + 1
    assert len(acts_fp) == expect
    m.calibrate(x)
    acts_q, infos = activations.get_activations(m, x, bit_config=4,
                                                layer_indices=2)
    assert infos[0]["name"] == "layers.0.blocks.0.attn.proj"
    assert acts_q[0].shape[0] == 2
