"""Integer execution path vs fake-quant reference path equivalence."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffvit_tpu.config import QuantConfig
from diffvit_tpu.models import vit, vit_int

pytestmark = pytest.mark.quick


TINY = vit.ViTSpec("test_tiny", embed_dim=64, depth=2, num_heads=2,
                   num_classes=10)
NO_INPUT_Q = vit.ViTSpec("test_niq", embed_dim=64, depth=1, num_heads=2,
                         num_classes=10, input_quant=False)


@pytest.fixture(scope="module")
def setup():
    params = vit.init_params(TINY, jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 3, 224, 224))
    cfg = QuantConfig()
    qp, _ = vit.calibrate(params, TINY, cfg, x)
    return params, qp, cfg, x


@pytest.mark.parametrize("bits", [4, 8])
def test_int_path_matches_fake_quant(setup, bits):
    params, qp, cfg, x = setup
    bc = (bits,) * vit.num_bit_slots(TINY)
    ref = vit.forward_q(params, qp, TINY, cfg, x, bc)
    ip = vit_int.prepare_int(params, qp, TINY, cfg, bc)
    got = vit_int.forward_q_int(ip, TINY, cfg, x)
    # identical math modulo f32 accumulation order (int32 accum is exact)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)
    # logits grids coincide: both outputs are act_out-quantized
    assert np.mean(np.asarray(got) == np.asarray(ref)) > 0.95


def test_int_path_mixed_bits(setup):
    params, qp, cfg, x = setup
    bc = (8,) + (4, 8) * (2 * TINY.depth) + (8,)
    ref = vit.forward_q(params, qp, TINY, cfg, x, bc)
    ip = vit_int.prepare_int(params, qp, TINY, cfg, bc)
    got = vit_int.forward_q_int(ip, TINY, cfg, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_int_path_minus_one_layers(setup):
    params, qp, cfg, x = setup
    bc = [4] * vit.num_bit_slots(TINY)
    bc[1] = -1  # block0 qkv in FP
    bc[4] = -1  # block0 fc2 in FP
    bc = tuple(bc)
    ref = vit.forward_q(params, qp, TINY, cfg, x, bc)
    ip = vit_int.prepare_int(params, qp, TINY, cfg, bc)
    got = vit_int.forward_q_int(ip, TINY, cfg, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_int_path_no_input_quant():
    params = vit.init_params(NO_INPUT_Q, jax.random.PRNGKey(2))
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 3, 224, 224))
    cfg = QuantConfig()
    qp, _ = vit.calibrate(params, NO_INPUT_Q, cfg, x)
    bc = (4,) * vit.num_bit_slots(NO_INPUT_Q)
    ref = vit.forward_q(params, qp, NO_INPUT_Q, cfg, x, bc)
    ip = vit_int.prepare_int(params, qp, NO_INPUT_Q, cfg, bc)
    got = vit_int.forward_q_int(ip, NO_INPUT_Q, cfg, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_int_path_no_ptf_no_lis(setup):
    params, _, _, x = setup
    cfg = QuantConfig(ptf=False, lis=False)
    qp, _ = vit.calibrate(params, TINY, cfg, x)
    bc = (8,) * vit.num_bit_slots(TINY)
    ref = vit.forward_q(params, qp, TINY, cfg, x, bc)
    ip = vit_int.prepare_int(params, qp, TINY, cfg, bc)
    got = vit_int.forward_q_int(ip, TINY, cfg, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)
