"""Pipeline parallelism (pp mesh axis): the GPipe schedule must be the
identity transform on the integer path — bit-identical to forward_q_int.
Runs on the virtual 8-device CPU mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffvit_tpu.config import QuantConfig
from diffvit_tpu.models import vit, vit_int
from diffvit_tpu.parallel import mesh as mesh_mod
from diffvit_tpu.parallel import pipeline

TINY = vit.ViTSpec("pp_tiny", embed_dim=64, depth=4, num_heads=2,
                   num_classes=10)


@pytest.fixture(scope="module")
def setup():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    params = vit.init_params(TINY, jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 3, 224, 224))
    cfg = QuantConfig()
    qp, _ = vit.calibrate(params, TINY, cfg, x[:2])
    ip = vit_int.prepare_int(params, qp, TINY, cfg)
    return params, qp, cfg, x, ip


def test_make_mesh_pp_axis(setup):
    m = mesh_mod.make_mesh(8, dp=2, pp=4)
    assert dict(m.shape) == {"dp": 2, "tp": 1, "pp": 4}
    m2 = mesh_mod.make_mesh(8, dp=2, tp=2, pp=2)
    assert dict(m2.shape) == {"dp": 2, "tp": 2, "pp": 2}


def test_pp_matches_single_device(setup):
    """dp=2 x pp=4 (4 stages of 1 block): pipelined logits == loop logits,
    bit-exact (identical integer math, identical block function)."""
    _, _, cfg, x, ip = setup
    ref = np.asarray(vit_int.forward_q_int(ip, TINY, cfg, x,
                                           use_pallas=False))
    m = mesh_mod.make_mesh(8, dp=2, pp=4)
    plan = pipeline.prepare_pp(ip, TINY, cfg, pp=4, use_pallas=False)
    assert not plan["codes_mode"]  # f32 wire on the CPU non-fused path
    fn = jax.jit(lambda xin: pipeline.forward_q_int_pp(
        ip, plan, TINY, cfg, xin, m, n_micro=4))
    with m:
        got = np.asarray(fn(x))
    np.testing.assert_array_equal(got, ref)


def test_pp_multi_block_stages_and_default_micro(setup):
    """pp=2 (2 stages x 2 blocks), default n_micro=2*pp, no dp axis."""
    _, _, cfg, x, ip = setup
    ref = np.asarray(vit_int.forward_q_int(ip, TINY, cfg, x,
                                           use_pallas=False))
    m = mesh_mod.make_mesh(2, dp=1, pp=2)
    plan = pipeline.prepare_pp(ip, TINY, cfg, pp=2, use_pallas=False)
    fn = jax.jit(lambda xin: pipeline.forward_q_int_pp(
        ip, plan, TINY, cfg, xin, m))
    with m:
        got = np.asarray(fn(x))
    np.testing.assert_array_equal(got, ref)


def test_pp_codes_wire_fused_kernels(setup):
    """The int8-codes wire: fused-kernel (interpret) pipeline ==
    fused-kernel loop, bit-exact.  This is the TPU deployment shape —
    stage-to-stage ICI traffic is int8 codes, 4x less than f32."""
    _, _, cfg, _, ip = setup
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 3, 224, 224))
    ref = np.asarray(vit_int.forward_q_int(ip, TINY, cfg, x,
                                           use_pallas=True,
                                           pallas_interpret=True))
    m = mesh_mod.make_mesh(2, dp=1, pp=2)
    plan = pipeline.prepare_pp(ip, TINY, cfg, pp=2, use_pallas=True)
    assert plan["codes_mode"]
    fn = jax.jit(lambda xin: pipeline.forward_q_int_pp(
        ip, plan, TINY, cfg, xin, m, n_micro=2, pallas_interpret=True))
    with m:
        got = np.asarray(fn(x))
    np.testing.assert_array_equal(got, ref)


def test_engine_int_path_under_pp_mesh(setup, tmp_path):
    """QuantizedViT(use_int=True) and a served IntModel artifact under a
    dp=2 x pp=2 mesh: non-granular batches are padded/sliced, logits
    bit-equal to the single-program path."""
    from diffvit_tpu.engine import QuantizedViT, load_int_model

    params, qp, cfg, x, _ = setup
    single = QuantizedViT(TINY, cfg, params=params)
    single.qparams = qp
    ref = np.asarray(single(x[:6], use_int=True))

    m = mesh_mod.make_mesh(4, dp=2, pp=2)
    model = QuantizedViT(TINY, cfg, params=params, mesh=m)
    model.qparams = qp
    got = np.asarray(model(x[:6], use_int=True))
    np.testing.assert_array_equal(got, ref)

    single.save_int_model(tmp_path / "m.npz")
    served = load_int_model(tmp_path / "m.npz", mesh=m)
    got2 = np.asarray(served(x[:6]))
    np.testing.assert_array_equal(got2, ref)


def test_pp_rejects_fp_sites(setup):
    _, _, cfg, _, ip = setup
    bc = list(ip["bit_config"])
    bc[5] = -1  # restore one layer to fp32
    ip_fp = dict(ip, bit_config=tuple(bc))
    ip_fp["blocks"] = [dict(b) for b in ip["blocks"]]
    ip_fp["blocks"][1]["qkv"] = {"w": jnp.zeros((1,)), "b": jnp.zeros((1,)),
                                 "fp": True}
    with pytest.raises(ValueError, match="fp32|quantized|-1"):
        pipeline.prepare_pp(ip_fp, TINY, cfg, pp=2, use_pallas=False)
    with pytest.raises(ValueError, match="divisible"):
        pipeline.prepare_pp(ip, TINY, cfg, pp=3, use_pallas=False)


def test_pp_composes_with_tp(setup):
    """dp=2 x tp=2 x pp=2 (partial-manual shard_map: pp manual, dp/tp
    AUTO): the megatron-sharded stacked weights ride GSPMD inside the
    stage body; logits bit-equal to the single-device integer path.
    An sp axis stays rejected (fake-quant-path feature)."""
    from diffvit_tpu.engine import QuantizedViT

    params, qp, cfg, x, _ = setup
    single = QuantizedViT(TINY, cfg, params=params)
    single.qparams = qp
    ref = np.asarray(single(x, use_int=True))

    m = mesh_mod.make_mesh(8, dp=2, tp=2, pp=2)
    model = QuantizedViT(TINY, cfg, params=params, mesh=m)
    model.qparams = qp
    got = np.asarray(model(x, use_int=True))
    np.testing.assert_array_equal(got, ref)

    msp = mesh_mod.make_mesh(8, dp=2, sp=2, pp=2)
    model_sp = QuantizedViT(TINY, cfg, params=params, mesh=msp)
    model_sp.qparams = qp
    with pytest.raises(ValueError, match="sp"):
        model_sp(x[:4], use_int=True)
