"""Resident whole-model serving kernel vs the per-kernel integer path.

The serve kernel (ops/pallas/serve.py) replicates forward_q_int's codes
path op-for-op inside one pallas_call; in interpret mode both lower to
the same XLA ops, so agreement is tight (tolerances as in
tests/test_int_path.py: f32 reduction order in the LayerNorm row sums is
the only licensed divergence)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffvit_tpu.config import QuantConfig
from diffvit_tpu.models import vit, vit_int
from diffvit_tpu.ops.pallas.serve import prepare_resident

TINY = vit.ViTSpec("test_tiny", embed_dim=64, depth=2, num_heads=2,
                   num_classes=10)


@pytest.fixture(scope="module")
def setup():
    params = vit.init_params(TINY, jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 3, 224, 224))
    cfg = QuantConfig()
    qp, _ = vit.calibrate(params, TINY, cfg, x)
    return params, qp, cfg, x


@pytest.mark.parametrize("bits", [4, 8])
def test_resident_serve_matches_int_path(setup, bits):
    params, qp, cfg, x = setup
    bc = (bits,) * vit.num_bit_slots(TINY)
    ip = vit_int.prepare_int(params, qp, TINY, cfg, bc)
    ref = vit_int.forward_q_int(ip, TINY, cfg, x, use_pallas=True,
                                pallas_interpret=True)
    got = vit_int.forward_q_int_serve(ip, TINY, cfg, x,
                                      pallas_interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)
    assert np.mean(np.asarray(got) == np.asarray(ref)) > 0.95


def test_resident_serve_batch1(setup):
    params, qp, cfg, x = setup
    bc = (4,) * vit.num_bit_slots(TINY)
    ip = vit_int.prepare_int(params, qp, TINY, cfg, bc)
    ref = vit_int.forward_q_int(ip, TINY, cfg, x[:1], use_pallas=True,
                                pallas_interpret=True)
    got = vit_int.forward_q_int_serve(ip, TINY, cfg, x[:1],
                                      pallas_interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_resident_serve_packed_reuse(setup):
    params, qp, cfg, x = setup
    bc = (4,) * vit.num_bit_slots(TINY)
    ip = vit_int.prepare_int(params, qp, TINY, cfg, bc)
    packed = prepare_resident(ip, TINY, cfg)
    a = vit_int.forward_q_int_serve(ip, TINY, cfg, x, packed=packed,
                                    pallas_interpret=True)
    b = vit_int.forward_q_int_serve(ip, TINY, cfg, x,
                                    pallas_interpret=True)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_resident_serve_microbatched(setup):
    """Batches above ``microbatch`` chunk through the kernel via lax.map
    (the resident VMEM footprint exceeds the 16 MB scoped limit around
    b16 on DeiT-S); a non-divisible batch exercises the pad+slice path
    and must match the unchunked forward exactly."""
    params, qp, cfg, x = setup
    bc = (4,) * vit.num_bit_slots(TINY)
    ip = vit_int.prepare_int(params, qp, TINY, cfg, bc)
    x3 = jnp.concatenate([x, x[:1] * 0.5])  # B=3, microbatch=2 -> pad 1
    ref = vit_int.forward_q_int_serve(ip, TINY, cfg, x3,
                                      pallas_interpret=True,
                                      microbatch=None)
    got = vit_int.forward_q_int_serve(ip, TINY, cfg, x3,
                                      pallas_interpret=True, microbatch=2)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_prepare_resident_rejects_fp_sites(setup):
    params, qp, cfg, x = setup
    bc = [4] * vit.num_bit_slots(TINY)
    bc[1] = -1
    ip = vit_int.prepare_int(params, qp, TINY, cfg, tuple(bc))
    with pytest.raises(ValueError, match="fp"):
        prepare_resident(ip, TINY, cfg)


def test_prepare_resident_rejects_float_norm(setup):
    params, qp, _, x = setup
    cfg = QuantConfig(ptf=False)  # int_norm is the ptf property
    qp2, _ = vit.calibrate(params, TINY, cfg, x)
    ip = vit_int.prepare_int(params, qp2, TINY, cfg,
                             (4,) * vit.num_bit_slots(TINY))
    with pytest.raises(ValueError, match="int_norm"):
        prepare_resident(ip, TINY, cfg)
