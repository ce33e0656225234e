"""Chain-token dispatch (utils/dispatch.ChainedDispatch): the engine's
eval forwards thread an exact-zero data dependence between successive
dispatches so hostile backends (the axon tunnel) pipeline a REAL eval
loop at chip rate (measured 725 -> 4,731 img/s at b256,
docs/PERF_ANALYSIS.md).  The contract tested here: logits are
BIT-IDENTICAL to the unchained forwards on every path (int, fake-quant,
forward_bits, IntModel, uint8 wire), across successive calls, and a
non-finite logit can never poison the chain.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffvit_tpu.config import QuantConfig
from diffvit_tpu.engine import QuantizedViT, load_int_model
from diffvit_tpu.models import vit, vit_int
from diffvit_tpu.utils.dispatch import ChainedDispatch

pytestmark = pytest.mark.quick

SPEC = vit.ViTSpec("cdt", embed_dim=64, depth=2, num_heads=2,
                   num_classes=10)


@pytest.fixture(scope="module")
def calibrated():
    cfg = QuantConfig()
    params = vit.init_params(SPEC, jax.random.PRNGKey(0))
    m = QuantizedViT(SPEC, cfg, params=params)
    x = np.random.default_rng(0).standard_normal((2, 3, 224, 224)) \
        .astype("float32")
    m.calibrate(x)
    return m, x


def _batches(n=3, dtype="float32"):
    rng = np.random.default_rng(7)
    if dtype == "uint8":
        return [rng.integers(0, 255, (2, 3, 224, 224)).astype(np.uint8)
                for _ in range(n)]
    return [rng.standard_normal((2, 3, 224, 224)).astype(np.float32)
            for _ in range(n)]


def test_int_path_chained_bitexact(calibrated):
    """engine(use_int=True) — now chain-token-wrapped — stays bit-equal
    to the module-level integer forward across successive batches."""
    m, _ = calibrated
    bc = (4,) * vit.num_bit_slots(SPEC)
    ip = vit_int.prepare_int(m.params, m.qparams, SPEC, m.cfg, bc)
    for xb in _batches():
        ref = np.asarray(vit_int.forward_q_int(ip, SPEC, m.cfg,
                                               jnp.asarray(xb)))
        np.testing.assert_array_equal(
            np.asarray(m(xb, bit_config=bc, use_int=True)), ref)


def test_int_path_chained_bitexact_u8_wire(calibrated):
    """uint8-wire batches: the wrapper's prep (LUT normalize) runs once;
    the inner forward's prep passes the f32 through — still bit-equal."""
    m, _ = calibrated
    bc = (8,) * vit.num_bit_slots(SPEC)
    ip = vit_int.prepare_int(m.params, m.qparams, SPEC, m.cfg, bc)
    from diffvit_tpu.data.imagenet import device_normalize

    for xb in _batches(dtype="uint8"):
        ref = np.asarray(vit_int.forward_q_int(
            ip, SPEC, m.cfg, device_normalize(jnp.asarray(xb))))
        np.testing.assert_array_equal(
            np.asarray(m(xb, bit_config=bc, use_int=True)), ref)


def test_fake_path_chained_bitexact(calibrated):
    """engine(quant=True) fake-quant path equals the unchained jitted
    forward (the one pgd/grad consumers still use)."""
    m, _ = calibrated
    bc = (4,) * vit.num_bit_slots(SPEC)
    plain = m._forward_fn(True, bc)
    for xb in _batches():
        ref = np.asarray(plain(m.params, m.qparams, jnp.asarray(xb)))
        np.testing.assert_array_equal(np.asarray(m(xb, bit_config=bc)), ref)


def test_forward_bits_chained_bitexact(calibrated):
    m, x = calibrated
    n = vit.num_bit_slots(SPEC)
    bits = np.asarray([[4] * n, [8] * n, [4, 8] * (n // 2) + [4] * (n % 2)])
    ref = np.stack([np.asarray(m(x, bit_config=tuple(b))) for b in bits])
    got = np.asarray(m.forward_bits(x, bits))
    np.testing.assert_array_equal(got, ref)


def test_int_model_chained_bitexact(calibrated, tmp_path):
    m, _ = calibrated
    bc = (4,) * vit.num_bit_slots(SPEC)
    path = str(tmp_path / "m.npz")
    m.save_int_model(path, bit_config=bc)
    served = load_int_model(path)
    for xb in _batches():
        np.testing.assert_array_equal(
            np.asarray(served(xb)),
            np.asarray(m(xb, bit_config=bc, use_int=True)))


def test_nonfinite_logits_do_not_poison_the_chain():
    """A step that emits inf/nan logits must not corrupt later steps'
    token (the nan_to_num guard): the NEXT step's output stays bit-equal
    to an unchained call."""
    calls = []

    def fwd(xf):
        calls.append(None)
        y = jnp.where(xf[:, :1] > 0, jnp.inf, xf[:, :1])
        return y

    d = ChainedDispatch(lambda x: x, fwd)
    x_bad = jnp.ones((2, 4))          # all-inf logits
    x_good = -jnp.arange(8.0).reshape(2, 4) - 1.0
    d(x_bad)
    got = np.asarray(d(x_good))
    np.testing.assert_array_equal(got, np.asarray(fwd(x_good)))
    # and the token itself stays finite
    assert np.isfinite(np.asarray(d._tok))
