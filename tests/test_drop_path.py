"""DropPath (stochastic depth) — layers_quant.py:110-138 parity semantics."""
import jax
import jax.numpy as jnp
import numpy as np

from diffvit_tpu.models import vit
from diffvit_tpu.models.vit import drop_path


def test_eval_identity():
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 5, 8))
    np.testing.assert_array_equal(np.asarray(drop_path(x, 0.5)), np.asarray(x))
    np.testing.assert_array_equal(
        np.asarray(drop_path(x, 0.0, training=True,
                             rng=jax.random.PRNGKey(1))), np.asarray(x))


def test_training_branch_semantics():
    """Per-sample binary mask, kept samples rescaled by 1/keep_prob."""
    x = jnp.ones((4096, 3, 2))
    p = 0.3
    y = np.asarray(drop_path(x, p, training=True, rng=jax.random.PRNGKey(2)))
    per_sample = y.reshape(4096, -1)
    # each sample is either all zeros or all 1/(1-p)
    uniq = np.unique(per_sample.round(6))
    np.testing.assert_allclose(sorted(uniq), [0.0, 1 / (1 - p)], atol=1e-5)
    keep_frac = (per_sample[:, 0] != 0).mean()
    assert abs(keep_frac - (1 - p)) < 0.03
    # expectation preserved
    assert abs(y.mean() - 1.0) < 0.05


def test_forward_fp_with_drop_path_rate():
    """drop_path_rate wired through forward_fp: eval unchanged, training
    stochastic."""
    spec = vit.ViTSpec("t", embed_dim=32, depth=2, num_heads=2,
                       num_classes=10, drop_path_rate=0.5)
    spec0 = vit.ViTSpec("t", embed_dim=32, depth=2, num_heads=2,
                        num_classes=10)
    params = vit.init_params(spec0, jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 3, 224, 224))
    eval_out = vit.forward_fp(params, spec, x)
    base_out = vit.forward_fp(params, spec0, x)
    np.testing.assert_array_equal(np.asarray(eval_out), np.asarray(base_out))
    tr1 = vit.forward_fp(params, spec, x, training=True,
                         rng=jax.random.PRNGKey(7))
    tr2 = vit.forward_fp(params, spec, x, training=True,
                         rng=jax.random.PRNGKey(8))
    assert not np.allclose(np.asarray(tr1), np.asarray(tr2))
