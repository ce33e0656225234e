"""Device-mesh parallelism on the virtual 8-device CPU mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffvit_tpu.config import QuantConfig
from diffvit_tpu.engine import QuantizedViT
from diffvit_tpu.models import vit
from diffvit_tpu.parallel import mesh as mesh_mod

TINY = vit.ViTSpec("t", embed_dim=64, depth=2, num_heads=2, num_classes=10)


@pytest.fixture(scope="module")
def eight_devices():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return jax.devices()[:8]


def test_mesh_shapes(eight_devices):
    m = mesh_mod.make_mesh(8, tp=2)
    assert dict(m.shape) == {"dp": 4, "tp": 2}
    m2 = mesh_mod.make_mesh(8)
    assert dict(m2.shape) == {"dp": 8, "tp": 1}


def test_sp_sequence_parallel_matches_single(eight_devices):
    """dp=2 x tp=2 x sp=2: the token-sharded residual stream (sequence
    parallel, mesh.act_constraint) is semantically the identity — the
    sharded eval must match the single-device forward.  N=197 is not
    divisible by sp=2; XLA's implicit shard padding must handle it."""
    m = mesh_mod.make_mesh(8, dp=2, tp=2, sp=2)
    assert dict(m.shape) == {"dp": 2, "tp": 2, "sp": 2}
    assert mesh_mod.act_constraint(m) is not None
    assert mesh_mod.act_constraint(mesh_mod.make_mesh(8, tp=2)) is None

    params = vit.init_params(TINY, jax.random.PRNGKey(0))
    x = np.random.default_rng(0).standard_normal((8, 3, 224, 224)) \
        .astype("float32")
    calib = np.random.default_rng(1).standard_normal((2, 3, 224, 224)) \
        .astype("float32")

    single = QuantizedViT(TINY, QuantConfig(), params=params)
    single.calibrate(calib)
    ref = np.asarray(single(x))

    sharded = QuantizedViT(TINY, QuantConfig(), params=params, mesh=m)
    sharded.qparams = single.qparams
    got = np.asarray(sharded(x))
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_param_shardings_rules(eight_devices):
    m = mesh_mod.make_mesh(8, tp=2)
    params = vit.init_params(TINY, jax.random.PRNGKey(0))
    sharded = mesh_mod.shard_params(m, params)
    qkv = sharded["blocks"][0]["qkv"]["w"]
    # row-sharded over tp: each shard holds half the output rows
    assert qkv.sharding.spec == mesh_mod.P("tp", None)
    proj = sharded["blocks"][0]["proj"]["w"]
    assert proj.sharding.spec == mesh_mod.P(None, "tp")
    # norms replicated
    assert sharded["blocks"][0]["norm1"]["w"].sharding.spec == mesh_mod.P()


def test_engine_sharded_eval_matches_single(eight_devices):
    params = vit.init_params(TINY, jax.random.PRNGKey(0))
    x = np.random.default_rng(0).standard_normal((8, 3, 224, 224)).astype("float32")
    calib = np.random.default_rng(1).standard_normal((2, 3, 224, 224)).astype("float32")

    single = QuantizedViT(TINY, QuantConfig(), params=params)
    single.calibrate(calib)
    ref = np.asarray(single(x))

    m = mesh_mod.make_mesh(8, tp=2)
    sharded = QuantizedViT(TINY, QuantConfig(), params=params, mesh=m)
    sharded.calibrate(calib)
    got = np.asarray(sharded(x))
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_ragged_batch_under_dp_mesh(eight_devices):
    """A batch NOT divisible by dp (every real dataset's last validation
    batch) must not crash the mesh paths: engine._dp_pad zero-pads to the
    dp granularity and __call__ slices the pad logits away.  Both the
    fake-quant and integer forwards must equal the single-device logits
    row-for-row."""
    params = vit.init_params(TINY, jax.random.PRNGKey(0))
    x = np.random.default_rng(0).standard_normal((5, 3, 224, 224)) \
        .astype("float32")
    calib = np.random.default_rng(1).standard_normal((2, 3, 224, 224)) \
        .astype("float32")

    single = QuantizedViT(TINY, QuantConfig(), params=params)
    single.calibrate(calib)
    ref = np.asarray(single(x))
    ref_int = np.asarray(single(x, use_int=True))

    m = mesh_mod.make_mesh(8, tp=2)  # dp=4; 5 % 4 != 0
    sharded = QuantizedViT(TINY, QuantConfig(), params=params, mesh=m)
    sharded.qparams = single.qparams
    got = np.asarray(sharded(x))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)
    got_int = np.asarray(sharded(x, use_int=True))
    assert got_int.shape == ref_int.shape
    np.testing.assert_allclose(got_int, ref_int, rtol=2e-4, atol=2e-4)


def test_int_path_sharded_matches_single(eight_devices):
    """use_int under a (dp,tp) mesh equals the single-device int path."""
    from diffvit_tpu import engine

    mesh8 = mesh_mod.make_mesh(8, tp=2)
    spec = vit.ViTSpec("pint", embed_dim=64, depth=2, num_heads=2,
                       num_classes=12)
    cfg = QuantConfig()
    params = vit.init_params(spec, jax.random.PRNGKey(0))
    x = np.random.default_rng(0).standard_normal((8, 3, 224, 224)) \
        .astype("float32")

    single = engine.QuantizedViT(spec, cfg, params=params)
    single.calibrate(x[:2])
    ref = np.asarray(single(x, use_int=True))

    sharded = engine.QuantizedViT(spec, cfg, params=params, mesh=mesh8)
    sharded.qparams = single.qparams
    got = np.asarray(sharded(x, use_int=True))
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_swin_sharded_eval_matches_single(eight_devices):
    """The second model family under the same (dp,tp) mesh: Swin's param
    pytree hits the identical megatron path rules (qkv/fc1 row, proj/fc2
    column over tp), and both the fake-quant and integer paths must match
    the single-device results.  Guards the engine's Swin prepare_int
    mesh-sharding branch (it historically only sharded the ViT pytree)."""
    from diffvit_tpu import engine
    from diffvit_tpu.models import swin

    spec = swin.SwinSpec("swin_par", embed_dim=32, depths=(1, 1),
                         num_heads=(2, 4), img_size=56, num_classes=10)
    cfg = QuantConfig()
    params = swin.init_swin_params(spec, jax.random.PRNGKey(0))
    x = np.random.default_rng(0).standard_normal((8, 3, 56, 56)) \
        .astype("float32")

    single = engine.QuantizedViT(spec, cfg, params=params)
    single.calibrate(x[:2])
    ref_fq = np.asarray(single(x))
    ref_int = np.asarray(single(x, use_int=True))

    m = mesh_mod.make_mesh(8, tp=2)
    sharded = engine.QuantizedViT(spec, cfg, params=params, mesh=m)
    sharded.qparams = single.qparams
    # tp actually sharded the attention/MLP weights (not all-replicated)
    qkv = sharded.params["layers"][0]["blocks"][0]["qkv"]["w"]
    assert qkv.sharding.spec == mesh_mod.P("tp", None)
    np.testing.assert_allclose(np.asarray(sharded(x)), ref_fq,
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(sharded(x, use_int=True)),
                               ref_int, rtol=2e-4, atol=2e-4)
