"""HybridEmbed (CNN-backbone patch embedding) vs the reference semantics
(layers_quant.py:495-542): last-feature selection, shape probing, and
1x1-conv projection equivalence."""
import jax
import jax.numpy as jnp
import numpy as np

from diffvit_tpu.models.hybrid import (hybrid_embed, infer_feature_shape,
                                       init_hybrid_params)


def _toy_backbone(x):
    """Stride-16 average-pool 'CNN' with a channel mix — deterministic and
    shape-realistic (224 -> 14x14 feature map, 24 channels)."""
    b, c, hh, ww = x.shape
    f = x.reshape(b, c, hh // 16, 16, ww // 16, 16).mean(axis=(3, 5))
    mix = jnp.arange(c * 24, dtype=jnp.float32).reshape(24, c) / (c * 24)
    return jnp.einsum("fc,bchw->bfhw", mix, f)


def _toy_backbone_multi(x):
    f = _toy_backbone(x)
    return [f[:, :, ::2, ::2], f]  # list of features; last one is used


def test_infer_feature_shape():
    (fh, fw), cf = infer_feature_shape(_toy_backbone, img_size=224)
    assert (fh, fw) == (14, 14) and cf == 24


def test_hybrid_embed_matches_manual_conv1x1():
    key = jax.random.PRNGKey(0)
    params = init_hybrid_params(key, _toy_backbone, embed_dim=32)
    assert params["num_patches"] == 14 * 14
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 3, 224, 224))
    got = hybrid_embed(params, _toy_backbone, x)
    assert got.shape == (2, 196, 32)
    # reference semantics: proj(feature).flatten(2).transpose(1, 2)
    f = _toy_backbone(x)
    want = jnp.einsum("ec,bchw->behw", params["w"], f) \
        + params["b"][None, :, None, None]
    want = want.reshape(2, 32, -1).transpose(0, 2, 1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_hybrid_embed_list_backbone_uses_last_feature():
    params = init_hybrid_params(jax.random.PRNGKey(2), _toy_backbone_multi,
                                embed_dim=16)
    x = jax.random.normal(jax.random.PRNGKey(3), (1, 3, 224, 224))
    got = hybrid_embed(params, _toy_backbone_multi, x)
    ref = hybrid_embed(params, _toy_backbone, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)
