"""Fused Pallas attention kernel vs the XLA integer path (interpret mode on
CPU; the same kernel compiles via Mosaic on TPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffvit_tpu.config import QuantConfig
from diffvit_tpu.models import vit, vit_int
from diffvit_tpu.ops.pallas.attention import fused_int_attention
from diffvit_tpu.ops.lis import log_int_softmax_from_int
from diffvit_tpu.ops.bit_types import BIT_TYPE_DICT


def _xla_reference(qkv_p, scalars, num_heads, n_real, bits, lis):
    # qkv_p: (B, 3, H, N_pad, D)
    b, _, h, npad, d = qkv_p.shape
    c1, s1_over_s2, s_a = [float(s) for s in scalars]
    qkv = qkv_p.astype(jnp.float32).transpose(1, 0, 2, 3, 4)
    q, k, v = qkv[0], qkv[1], qkv[2]
    scores = q @ k.transpose(0, 1, 3, 2)
    a_int = jnp.clip(jnp.round(scores * c1), -128, 127)
    col_ok = jnp.arange(npad) < n_real
    if lis:
        a_masked = jnp.where(col_ok, a_int, -(2.0 ** 20))
        attn = log_int_softmax_from_int(a_masked, s_a, BIT_TYPE_DICT[f"uint{bits}"])
        attn = jnp.where(col_ok, attn, 0.0)
    else:
        attn = jax.nn.softmax(jnp.where(col_ok, a_int * s_a, -jnp.inf), axis=-1)
    o = attn.astype(jnp.bfloat16).astype(jnp.float32) @ v
    o = jnp.clip(jnp.round(o * s1_over_s2), -128, 127)
    return o.astype(jnp.int8)  # (B, H, N, D)


@pytest.mark.parametrize("lis", [True, False])
def test_kernel_matches_xla(lis):
    rng = np.random.default_rng(0)
    b, npad, h, d, n_real = 2, 128, 2, 64, 100
    qkv = rng.integers(-40, 40, size=(b, 3, h, npad, d)).astype(np.int8)
    qkv[:, :, :, n_real:] = 0
    scalars = jnp.asarray([0.3, 1.7, 2.0**-3], jnp.float32)
    got = fused_int_attention(jnp.asarray(qkv), scalars, num_heads=h,
                              n_real=n_real, bits=4, lis=lis, group=2,
                              interpret=True)
    ref = _xla_reference(jnp.asarray(qkv), scalars, h, n_real, 4, lis)
    g = np.asarray(got)[:, :, :n_real].astype(np.int32)
    r = np.asarray(ref)[:, :, :n_real].astype(np.int32)
    if lis:
        # LIS codes (2^-q) are exact in bf16 -> bit-identical
        np.testing.assert_array_equal(g, r)
    else:
        # float softmax probabilities round differently in bf16 between
        # matmul orders; allow one int8 code of slack on a tiny fraction
        assert np.abs(g - r).max() <= 1
        assert (g != r).mean() < 0.02


def _assert_paths_agree(got, ref):
    """The Pallas path's MLP kernel uses a rational erf with |gelu error|
    <= 7.5e-8*|x| (Mosaic has no erf primitive) — identical int8 codes
    except for rare exact-boundary elements, so compare by exact-entry
    fraction + a couple-of-codes bound rather than strict allclose."""
    got, ref = np.asarray(got), np.asarray(ref)
    assert np.mean(got == ref) > 0.995, np.mean(got == ref)
    np.testing.assert_allclose(got, ref, atol=0.05)
    np.testing.assert_array_equal(got.argmax(1), ref.argmax(1))


def test_full_model_pallas_vs_xla_path():
    spec = vit.ViTSpec("t", embed_dim=64, depth=2, num_heads=2, num_classes=10)
    cfg = QuantConfig()
    params = vit.init_params(spec, jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 3, 224, 224))
    qp, _ = vit.calibrate(params, spec, cfg, x)
    ip = vit_int.prepare_int(params, qp, spec, cfg, (4,) * vit.num_bit_slots(spec))
    ref = vit_int.forward_q_int(ip, spec, cfg, x, use_pallas=False)
    got = vit_int.forward_q_int(ip, spec, cfg, x, use_pallas=True,
                                pallas_interpret=True)
    _assert_paths_agree(got, ref)


def test_fully_fused_qkv_attention_model():
    """The fully-fused (qkv projection + attention) kernel path vs XLA."""
    spec = vit.ViTSpec("t2", embed_dim=64, depth=2, num_heads=2, num_classes=10)
    cfg = QuantConfig()
    params = vit.init_params(spec, jax.random.PRNGKey(5))
    x = jax.random.normal(jax.random.PRNGKey(6), (2, 3, 224, 224))
    qp, _ = vit.calibrate(params, spec, cfg, x)
    for bits in (4, 8):
        bc = (bits,) * vit.num_bit_slots(spec)
        ip = vit_int.prepare_int(params, qp, spec, cfg, bc)
        ref = vit_int.forward_q_int(ip, spec, cfg, x, use_pallas=False)
        got = vit_int.forward_q_int(ip, spec, cfg, x, use_pallas=True,
                                    pallas_interpret=True)
        _assert_paths_agree(got, ref)
