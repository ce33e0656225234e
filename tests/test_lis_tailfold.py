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
    # mirrors _lis_body's tail exactly, including the bits<=4 gate
    m = jnp.asarray(m, jnp.float32)
    if bits <= 4:
        y = m * (4.0 / 3.0 * (1.0 + 2.0**-17))
        sat = y >= 2.0 ** (2.0**bits)
        deq = jnp.where(sat, 0.0, jnp.exp2(-jnp.floor(jnp.log2(y))))
    else:
        rounds = jnp.floor(jnp.log2(2.0 * m / 3.0)) + 1.0
        sat = rounds >= 2.0**bits
        qlog = jnp.minimum(rounds, 2.0**bits - 1.0)
        deq = jnp.where(sat, 0.0, jnp.exp2(-qlog))
    return np.asarray(deq.astype(jnp.bfloat16))


def test_tail_fold_exhaustive_near_saturation():
    # bits=4: saturation threshold at rounds == 16, i.e. m >= 3*2^14 = 49152
    m = np.arange(1, 1 << 18, dtype=np.float32)
    np.testing.assert_array_equal(_tail_folded(m, 4), _tail_exact(m, 4))


def test_tail_fold_power_of_two_boundaries():
    # m = 3*2^(k-2) points where 4m/3 IS a power of two, +-2 neighbors,
    # for every exponent below f32 integer precision loss.  bits=4 only:
    # that is the reference's LIS width (BIT_TYPE_S is uint4), and the
    # folded+nudged tail is exact there; bits>4 keeps the literal f32
    # chain, which inherits the hardware-log2 fragility at these exact
    # boundary points (documented in _lis_body).
    ks = np.arange(2, 24)
    base = 3.0 * 2.0 ** (ks - 2)
    m = np.concatenate([base - 2, base - 1, base, base + 1, base + 2])
    m = m[m >= 1].astype(np.float32)
    np.testing.assert_array_equal(_tail_folded(m, 4), _tail_exact(m, 4))


def test_tail_fold_masked_and_huge():
    # exp_int == 0 columns give m = inf -> 0 on both forms; huge m saturates
    m = np.asarray([np.inf, 3.4e38, 1e30, 1e12], np.float32)
    np.testing.assert_array_equal(_tail_folded(m, 4), _tail_exact(m, 4))


def test_old_xla_form_was_fragile_at_the_boundary():
    """Documents the latent bug the nudge fixes: the f32 chain disagrees
    with the exact chain at m = 3*2^14 when hardware log2 undershoots.
    (Guarded: only asserts the FOLDED form, which must always be right.)"""
    m = np.float32(3 * 2**14)
    assert _tail_folded(m, 4).item() == 0.0  # saturates, like the reference
