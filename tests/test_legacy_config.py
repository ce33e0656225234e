"""The legacy vit_quant.py model (disabled upstream,
/root/reference/models/__init__.py:5) is the pre-SmoothQuant / pre-LIS /
pre-int-LayerNorm ancestor of vit_fquant: plain LayerNorm + fake-quant,
float softmax, no qact0 smoothing (vit_quant.py:95-199).  That is exactly
the QuantConfig(ptf=False, lis=False, smoothquant=False) subset of the
modern path — this test pins that the subset calibrates, runs, and keeps
int-vs-fake agreement, so the legacy model's semantics stay reachable."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffvit_tpu.config import QuantConfig
from diffvit_tpu.models import vit, vit_int


@pytest.fixture(scope="module")
def setup():
    spec = vit.ViTSpec("demo", embed_dim=64, depth=2, num_heads=2,
                       num_classes=11)
    params = vit.init_params(spec, jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 3, 224, 224))
    return spec, params, x


def test_legacy_subset_calibrates_and_runs(setup):
    spec, params, x = setup
    cfg = QuantConfig(ptf=False, lis=False, smoothquant=False)
    qp, dist = vit.calibrate(params, spec, cfg, x)
    # no SmoothQuant caches in the legacy subset
    assert not any("channel_scale" in k for k in qp)
    bits = (8,) * vit.num_bit_slots(spec)
    out = vit.forward_q(params, qp, spec, cfg, x, bits)
    assert out.shape == (2, 11)
    assert np.isfinite(np.asarray(out)).all()


def test_legacy_subset_int_path_agrees(setup):
    spec, params, x = setup
    cfg = QuantConfig(ptf=False, lis=False, smoothquant=False)
    qp, _ = vit.calibrate(params, spec, cfg, x)
    bits = (8,) * vit.num_bit_slots(spec)
    fake = vit.forward_q(params, qp, spec, cfg, x, bits)
    ip = vit_int.prepare_int(params, qp, spec, cfg, bits)
    out = vit_int.forward_q_int(ip, spec, cfg, x, use_pallas=False)
    # float LN / float softmax reorder f32 sums across the two paths;
    # agreement is at the quantization-step level with identical argmax
    assert np.asarray(jnp.argmax(out, -1) == jnp.argmax(fake, -1)).all()
    scale = float(np.asarray(qp["act_out.scale"]).max())
    assert float(jnp.max(jnp.abs(out - fake))) <= 2 * scale
