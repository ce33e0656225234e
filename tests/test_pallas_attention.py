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


def test_fused_attention_block_kernel():
    """The whole-block kernel (proj+fences fused) — kept as an alternative;
    verify it matches the default path's math (interpret mode)."""
    from diffvit_tpu.ops.pallas.attention import fused_attention_block

    rng = np.random.default_rng(2)
    b, npad, h, d, nreal = 1, 64, 2, 64, 50
    cin = h * d
    x = jnp.asarray(rng.integers(-60, 60, (b, npad, cin)), jnp.int8)
    hres = jnp.asarray(rng.standard_normal((b, npad, cin)), jnp.float32)
    wq = jnp.asarray(rng.integers(-7, 7, (h, cin, d)), jnp.int8)
    wk = jnp.asarray(rng.integers(-7, 7, (h, cin, d)), jnp.int8)
    wv = jnp.asarray(rng.integers(-7, 7, (h, cin, d)), jnp.int8)
    wp = jnp.asarray(rng.integers(-7, 7, (h, d, cin)), jnp.int8)
    mult = jnp.full((3, h, d), 2.0**-9, jnp.float32)
    bias = jnp.zeros((3, h, d), jnp.float32)
    pvec = jnp.stack([jnp.full((cin,), 2.0**-8), jnp.zeros((cin,)),
                      jnp.full((cin,), 2.0**-4),
                      jnp.full((cin,), 2.0**-4)]).astype(jnp.float32)
    scal = jnp.asarray([2.0**-3, 0.02, 32.0, 1.5], jnp.float32)

    got = fused_attention_block(x, hres, wq, wk, wv, wp, mult, bias, pvec,
                                scal, n_real=nreal, bits=4, lis=True,
                                interpret=True)

    # simpler: replicate with jnp directly
    def proj_head(w, slot):
        acc = jnp.einsum("bnc,hcd->bhnd", x.astype(jnp.int32),
                         w.astype(jnp.int32)).astype(jnp.float32)
        y = acc * mult[slot][None, :, None, :] + bias[slot][None, :, None, :]
        return jnp.clip(jnp.round(y * scal[2]), -128, 127)

    q, k, v = proj_head(wq, 0), proj_head(wk, 1), proj_head(wv, 2)
    scores = jnp.einsum("bhnd,bhmd->bhnm", q, k)
    a_int = jnp.clip(jnp.round(scores * scal[1]), -128, 127)
    from diffvit_tpu.ops.lis import log_int_softmax_from_int
    from diffvit_tpu.ops.bit_types import BIT_TYPE_DICT

    col_ok = jnp.arange(npad) < nreal
    attn = log_int_softmax_from_int(jnp.where(col_ok, a_int, -(2.0**20)),
                                    scal[0], BIT_TYPE_DICT["uint4"])
    attn = jnp.where(col_ok, attn, 0.0)
    o = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
    o8 = jnp.clip(jnp.round(o * scal[3]), -128, 127)
    y = jnp.einsum("bhnd,hdc->bnc", o8, wp.astype(jnp.float32))
    y = y * pvec[0] + pvec[1]
    y = jnp.clip(jnp.round(y / pvec[2]), -128, 127) * pvec[2]
    ref = hres + y
    ref = jnp.clip(jnp.round(ref / pvec[3]), -128, 127) * pvec[3]
    np.testing.assert_allclose(np.asarray(got)[:, :nreal],
                               np.asarray(ref)[:, :nreal], rtol=2e-4,
                               atol=2e-4)


def test_fused_mlp_block_kernel_matches_xla_math():
    """fused_int_mlp_block (fences + integer LN folded in — kept as a
    measured-slower alternative, see models/vit_int.py) vs the XLA-side
    composition of the same ops."""
    import jax.numpy as jnp

    from diffvit_tpu.models.vit_int import _fq_site, _ln_int8, _requant_i8
    from diffvit_tpu.ops.bit_types import BIT_TYPE_DICT
    from diffvit_tpu.ops.pallas.mlp import fused_int_mlp_block

    rng = np.random.default_rng(4)
    rows, c, hid = 512, 64, 256
    y = jnp.asarray(rng.standard_normal((rows, c)) * 2, jnp.float32)
    h = jnp.asarray(rng.standard_normal((rows, c)) * 2, jnp.float32)
    w1 = jnp.asarray(rng.integers(-8, 8, (c, hid)), jnp.int8)
    w2 = jnp.asarray(rng.integers(-8, 8, (hid, c)), jnp.int8)
    ln = {"w": jnp.asarray(rng.standard_normal(c) * 0.1 + 1, jnp.float32),
          "b": jnp.asarray(rng.standard_normal(c) * 0.1, jnp.float32)}
    s3 = jnp.asarray(2.0**-5)
    s2v = jnp.full((c,), 2.0**-5) * jnp.asarray(
        rng.choice([1.0, 2.0, 4.0, 8.0], c), jnp.float32)
    s4v = s2v * 2
    out_sc = jnp.full((c,), 2.0**-6)
    m1 = jnp.full((hid,), 2.0**-9); b1 = jnp.zeros((hid,))
    m2 = jnp.full((c,), 2.0**-9); b2 = jnp.zeros((c,))
    s_q2 = jnp.full((c,), 2.0**-4)
    s_q1 = jnp.asarray(2.0**-4)

    got = fused_int_mlp_block(
        y, h, w1, w2, m1, b1, m2, b2, s_q2, s_q1, ln=ln, ln_in_scale=s2v,
        ln_out_scale=out_sc, ln_rescale=None, s3=s3, s2_vec=s2v, s4_vec=s4v,
        block_rows=512, interpret=True)

    bt = BIT_TYPE_DICT["int8"]
    yq = _fq_site({"scale": s3, "zp": 0.0}, y, bt)
    h2 = _fq_site({"scale": s2v, "zp": 0.0}, h + yq, bt)
    x_i8 = _ln_int8(h2, ln, s2v, out_sc, 1e-6)
    mid = (x_i8.astype(jnp.int32) @ w1.astype(jnp.int32)).astype(jnp.float32) \
        * m1 + b1
    import jax
    g = jax.nn.gelu(mid, approximate=False)
    g8 = _requant_i8(g, s_q1)
    ym = (g8.astype(jnp.int32) @ w2.astype(jnp.int32)).astype(jnp.float32) \
        * m2 + b2
    ym = _fq_site({"scale": s_q2, "zp": 0.0}, ym, bt)
    want = _fq_site({"scale": s4v, "zp": 0.0}, h2 + ym, bt)

    got, want = np.asarray(got), np.asarray(want)
    assert np.mean(got == want) > 0.99, np.mean(got == want)
    np.testing.assert_allclose(got, want, atol=float(s4v.max()) * 1.5)
