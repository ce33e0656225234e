"""The folded LIS log2-quantization tail in ops/pallas/attention._lis_body
(deq = where(y >= 2^(2^b), 0, 2^-floor(log2(y))), y = 4m/3 with a
(1 + 2^-17) anti-log2-undershoot nudge) vs the f64-EXACT reference chain
(rounds = floor(log2(2m/3)) + 1, clamp, saturate — layers.py:367-376).

The f32 XLA form of the reference chain is itself wrong at m = 3*2^14
(hardware log2(32768) = 14.999999 undershoots, yielding 2^-15 where the
true chain saturates to 0) — which is why the oracle here is f64 and why
the kernel carries the nudge.  This sweeps every m below 2^18 (covering
the bits=4 saturation boundary at m = 3*2^14 = 49152) plus adversarial
power-of-two neighborhoods and the masked-column inf."""
import jax.numpy as jnp
import numpy as np


def _tail_exact(m, bits):
    """f64 ground truth of layers.py:367-376 (log2 exact at these scales),
    rounded to bf16 — the precision _lis_body actually emits (hardware
    exp2(-k) is up to 3.2e-6 off in f32; the bf16 cast absorbs it)."""
    m = np.asarray(m, np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        rounds = np.floor(np.log2(2.0 * m / 3.0)) + 1.0
    sat = rounds >= 2.0**bits
    qlog = np.minimum(rounds, 2.0**bits - 1.0)
    deq = np.where(sat, 0.0, np.exp2(-qlog)).astype(np.float32)
    return np.asarray(jnp.asarray(deq).astype(jnp.bfloat16))


def _tail_folded(m, bits):
    # mirrors _lis_body's tail exactly (bits<=4 only; wider raises there)
    assert bits <= 4
    m = jnp.asarray(m, jnp.float32)
    y = m * (4.0 / 3.0 * (1.0 + 2.0**-17))
    sat = y >= 2.0 ** (2.0**bits)
    deq = jnp.where(sat, 0.0, jnp.exp2(-jnp.floor(jnp.log2(y))))
    return np.asarray(deq.astype(jnp.bfloat16))


def test_tail_fold_exhaustive_near_saturation():
    # bits=4: saturation threshold at rounds == 16, i.e. m >= 3*2^14 = 49152
    m = np.arange(1, 1 << 18, dtype=np.float32)
    np.testing.assert_array_equal(_tail_folded(m, 4), _tail_exact(m, 4))


def test_tail_fold_power_of_two_boundaries():
    # m = 3*2^(k-2) points where 4m/3 IS a power of two, +-2 neighbors,
    # for every exponent below f32 integer precision loss.  bits=4 only:
    # that is the reference's LIS width (BIT_TYPE_S is uint4); bits>4 now
    # raises in both _lis_body and ops/lis._lis_tail rather than carrying
    # the boundary-fragile literal chain (documented in _lis_body).
    ks = np.arange(2, 24)
    base = 3.0 * 2.0 ** (ks - 2)
    m = np.concatenate([base - 2, base - 1, base, base + 1, base + 2])
    m = m[m >= 1].astype(np.float32)
    np.testing.assert_array_equal(_tail_folded(m, 4), _tail_exact(m, 4))


def test_tail_fold_masked_and_huge():
    # exp_int == 0 columns give m = inf -> 0 on both forms; huge m saturates
    m = np.asarray([np.inf, 3.4e38, 1e30, 1e12], np.float32)
    np.testing.assert_array_equal(_tail_folded(m, 4), _tail_exact(m, 4))


def test_xla_lis_tail_matches_exact_chain():
    """ops/lis._lis_tail (the XLA integer/fake-quant LIS path, used by
    vit.forward_q / swin_int's non-Pallas branch on TPU) now carries the
    same nudged fold as the kernel — sweep every integer m through the
    saturation boundary against the f64-exact chain."""
    from diffvit_tpu.ops.bit_types import BIT_TYPE_DICT
    from diffvit_tpu.ops.lis import _lis_tail

    bt = BIT_TYPE_DICT["uint4"]
    m = np.arange(1, 1 << 17, dtype=np.float32)
    got = np.asarray(_lis_tail(jnp.ones_like(jnp.asarray(m)),
                               jnp.asarray(m), bt), np.float32)
    want = _tail_exact(m, 4).astype(np.float32)
    # XLA's exp2 wobbles in the last f32 bits (CLAUDE.md: approximate
    # transcendentals); the property under test is the floor/saturation
    # DECISION — compare the emitted exponents and the zero sets exactly
    np.testing.assert_array_equal(got == 0.0, want == 0.0)
    nz = want != 0.0
    np.testing.assert_array_equal(np.round(np.log2(got[nz])),
                                  np.log2(want[nz]))
    np.testing.assert_allclose(got[nz], want[nz], rtol=1e-6)


def test_lis_tail_bits_gt4_guard():
    import pytest

    from diffvit_tpu.ops.bit_types import BIT_TYPE_DICT
    from diffvit_tpu.ops.lis import _lis_tail
    from diffvit_tpu.ops.pallas.attention import _lis_body

    class _Fake:
        bits = 8

    with pytest.raises(NotImplementedError):
        _lis_tail(jnp.ones((4,)), jnp.ones((1,)), _Fake())
    with pytest.raises(NotImplementedError):
        _lis_body(jnp.ones((4, 4)), 0.1, 8, jnp.ones((4, 4), bool))


def test_old_xla_form_was_fragile_at_the_boundary():
    """Documents the latent bug the nudge fixes: the f32 chain disagrees
    with the exact chain at m = 3*2^14 when hardware log2 undershoots.
    (Guarded: only asserts the FOLDED form, which must always be right.)"""
    m = np.float32(3 * 2**14)
    assert _tail_folded(m, 4).item() == 0.0  # saturates, like the reference
