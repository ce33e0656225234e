"""Mixed-precision search: bit-traced forward + batched/parallel search."""
import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffvit_tpu.config import QuantConfig
from diffvit_tpu.engine import QuantizedViT, validate_bits
from diffvit_tpu.models import vit
from diffvit_tpu.analysis import mixed_precision as mp

SPEC = vit.ViTSpec("mpt", embed_dim=64, depth=2, num_heads=2, num_classes=10)


@pytest.fixture(scope="module")
def calibrated():
    cfg = QuantConfig()
    params = vit.init_params(SPEC, jax.random.PRNGKey(0))
    m = QuantizedViT(SPEC, cfg, params=params)
    x = np.random.default_rng(0).standard_normal((2, 3, 224, 224)) \
        .astype("float32")
    m.calibrate(x)
    return m, x


def test_forward_q_bits_matches_forward_q(calibrated):
    """The bit-traced forward equals forward_q for every {4,8} config."""
    m, x = calibrated
    rng = np.random.default_rng(1)
    nslots = vit.num_bit_slots(SPEC)
    for _ in range(3):
        bc = tuple(int(b) for b in rng.choice([4, 8], nslots))
        ref = np.asarray(vit.forward_q(m.params, m.qparams, SPEC, m.cfg,
                                       jnp.asarray(x), bc))
        got = np.asarray(vit.forward_q_bits(m.params, m.qparams, SPEC,
                                            m.cfg, jnp.asarray(x),
                                            jnp.asarray(bc, jnp.int32)))
        np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)


def test_forward_bits_vmap_one_compile(calibrated):
    """Many configs evaluated in one call; each row equals its serial
    forward_q, and adding configs does not retrace."""
    m, x = calibrated
    rng = np.random.default_rng(2)
    nslots = vit.num_bit_slots(SPEC)
    cands = [list(map(int, rng.choice([4, 8], nslots))) for _ in range(3)]
    out = np.asarray(m.forward_bits(x, np.asarray(cands)))
    assert out.shape[0] == 3
    for i, c in enumerate(cands):
        ref = np.asarray(vit.forward_q(m.params, m.qparams, SPEC, m.cfg,
                                       jnp.asarray(x), tuple(c)))
        np.testing.assert_allclose(out[i], ref, rtol=2e-5, atol=2e-5)


def test_parallel_search_matches_serial(calibrated):
    """evaluate_batch path reproduces the serial evolutionary search
    exactly (same RNG stream, same carry-over semantics)."""
    m, x = calibrated
    flops = vit.flops_list(SPEC)
    nslots = vit.num_bit_slots(SPEC)
    rng = np.random.default_rng(3)
    gd = np.abs(rng.standard_normal((nslots - 1, 4)))
    hess = np.abs(rng.standard_normal(nslots - 1))
    cands = mp.sample_candidates(flops, __import__("random").Random(0),
                                 factor=2.0)
    omega = mp.omega_rank(cands, flops, hess, gd)

    # deterministic fake scorer (by config hash) for an apples-to-apples
    # comparison of the two control flows
    def score(c):
        return float(sum(b * (i + 1) for i, b in enumerate(c)) % 97)

    import random as R
    serial = mp.evolutionary_search(
        omega, flops, score, pop_size=6, evo_iter=3, mutate_size=4,
        crossover_size=4, rng=R.Random(7), log=lambda *_: None, factor=2.0)
    batched = mp.evolutionary_search(
        omega, flops, None, pop_size=6, evo_iter=3, mutate_size=4,
        crossover_size=4, rng=R.Random(7), log=lambda *_: None, factor=2.0,
        evaluate_batch=lambda cs: [score(c) for c in cs])
    assert serial == batched


def test_validate_bits(calibrated):
    m, x = calibrated
    labels = np.arange(2) % 10
    loader = [(x, labels)]
    nslots = vit.num_bit_slots(SPEC)
    configs = [[4] * nslots, [8] * nslots]
    prec = validate_bits(m, loader, configs, log=lambda *_: None)
    assert len(prec) == 2
    # cross-check against the serial validate path
    from diffvit_tpu.engine import validate

    _, p4, _ = validate(m, loader, tuple(configs[0]), print_freq=0,
                        log=lambda *_: None)
    assert abs(prec[0] - p4) < 1e-6


# ---------------------------------------------------------------------------
# Swin per-layer mixed precision (the §2.6 contract extension the
# reference lacks — its Swin takes one uniform bit, swin_quant.py:813-817)
# ---------------------------------------------------------------------------

from diffvit_tpu.models import swin  # noqa: E402

pytestmark = pytest.mark.quick


SWIN_SPEC = swin.SwinSpec("mpt_swin", embed_dim=32, depths=(1, 1),
                          num_heads=(2, 2), img_size=56, num_classes=10)


@pytest.fixture(scope="module")
def swin_calibrated():
    cfg = QuantConfig()
    params = swin.init_swin_params(SWIN_SPEC, jax.random.PRNGKey(0))
    m = QuantizedViT(SWIN_SPEC, cfg, params=params)
    x = np.random.default_rng(0).standard_normal((2, 3, 56, 56)) \
        .astype("float32")
    m.calibrate(x)
    return m, x


def test_swin_per_slot_uniform_matches_int_bit(swin_calibrated):
    """A per-slot all-4 config must equal the legacy uniform bit=4 path."""
    m, x = swin_calibrated
    n = swin.num_bit_slots(SWIN_SPEC)
    ref = np.asarray(swin.forward_q(m.params, m.qparams, SWIN_SPEC, m.cfg,
                                    jnp.asarray(x), bit=4))
    got = np.asarray(swin.forward_q(m.params, m.qparams, SWIN_SPEC, m.cfg,
                                    jnp.asarray(x), bit=(4,) * n))
    np.testing.assert_array_equal(got, ref)


def test_swin_forward_q_bits_matches_forward_q(swin_calibrated):
    m, x = swin_calibrated
    rng = np.random.default_rng(1)
    n = swin.num_bit_slots(SWIN_SPEC)
    for _ in range(3):
        bc = tuple(int(b) for b in rng.choice([4, 8], n))
        ref = np.asarray(swin.forward_q(m.params, m.qparams, SWIN_SPEC,
                                        m.cfg, jnp.asarray(x), bc))
        got = np.asarray(swin.forward_q_bits(m.params, m.qparams, SWIN_SPEC,
                                             m.cfg, jnp.asarray(x),
                                             jnp.asarray(bc, jnp.int32)))
        np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)


def test_swin_minus_one_runs_layer_float(swin_calibrated):
    """-1 slots bypass weight quant and flip the feeding LN float — the
    vit_fquant.py:429-430 semantics carried to the Swin extension.  The
    effect is asserted at the restored site's tap: on a tiny
    calibration-matched model the downstream int8 fences can absorb the
    small float-vs-int4 difference before the logits (measured: qkv tap
    moves 0.049, the block output 0)."""
    m, x = swin_calibrated
    n = swin.num_bit_slots(SWIN_SPEC)
    taps_ref: list = []
    ref = np.asarray(swin.forward_q(m.params, m.qparams, SWIN_SPEC, m.cfg,
                                    jnp.asarray(x), bit=4, taps=taps_ref))
    bc = [4] * n
    bc[1] = -1  # first block's qkv runs float (+ its norm1 flips float)
    taps_m1: list = []
    out = np.asarray(swin.forward_q(m.params, m.qparams, SWIN_SPEC, m.cfg,
                                    jnp.asarray(x), tuple(bc),
                                    taps=taps_m1))
    assert out.shape == ref.shape
    d_ref, d_m1 = dict(taps_ref), dict(taps_m1)
    site = "layers.0.blocks.0.attn.qkv"
    assert not np.array_equal(np.asarray(d_m1[site]),
                              np.asarray(d_ref[site]))
    # a float fc1 (slot 3) reaches the logits on this model
    bc2 = [4] * n
    bc2[3] = -1
    out2 = np.asarray(swin.forward_q(m.params, m.qparams, SWIN_SPEC, m.cfg,
                                     jnp.asarray(x), tuple(bc2)))
    assert not np.array_equal(out2, ref)


def test_swin_engine_forward_bits_and_validate(swin_calibrated):
    m, x = swin_calibrated
    n = swin.num_bit_slots(SWIN_SPEC)
    cands = [[4] * n, [8] * n]
    out = np.asarray(m.forward_bits(x, np.asarray(cands)))
    assert out.shape[0] == 2
    labels = np.arange(2) % 10
    prec = validate_bits(m, [(x, labels)], cands, log=lambda *_: None)
    assert len(prec) == 2
    # engine __call__ accepts the per-slot tuple
    got = np.asarray(m(x, bit_config=tuple(cands[0])))
    ref = np.asarray(m(x, bit_config=4))
    np.testing.assert_array_equal(got, ref)


def test_swin_int_path_mixed_bits(swin_calibrated):
    """The real-integer execution path also takes per-slot bits and tracks
    the fake-quant forward at the established int-vs-fake tolerance."""
    from diffvit_tpu.models import swin_int

    m, x = swin_calibrated
    n = swin.num_bit_slots(SWIN_SPEC)
    rng = np.random.default_rng(5)
    bc = tuple(int(b) for b in rng.choice([4, 8], n))
    ip = swin_int.prepare_int(m.params, m.qparams, SWIN_SPEC, m.cfg, bc)
    got = np.asarray(swin_int.forward_q_int(ip, SWIN_SPEC, m.cfg,
                                            jnp.asarray(x),
                                            use_pallas=False))
    ref = np.asarray(swin.forward_q(m.params, m.qparams, SWIN_SPEC, m.cfg,
                                    jnp.asarray(x), bc))
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)
    # engine route with tuple bit_config
    got2 = np.asarray(m(x, bit_config=bc, use_int=True))
    np.testing.assert_allclose(got2, ref, rtol=2e-4, atol=2e-4)


def test_swin_bit_slot_groups_cover_all_slots(swin_calibrated):
    groups = swin.bit_slot_groups(SWIN_SPEC)
    n = swin.num_bit_slots(SWIN_SPEC)
    covered = sorted(s for g in groups for s in g)
    assert covered == list(range(1, n))  # slot 0 pinned by the sampler
    flops = swin.flops_list(SWIN_SPEC)
    cands = mp.sample_candidates(flops, __import__("random").Random(0),
                                 factor=2.0, groups=groups)
    assert cands and all(len(c) == n and c[0] == 8 for c in cands)
    for c in cands:  # grouped slots share their bit
        for g in groups:
            assert len({c[s] for s in g}) == 1


def test_swin_hessian_targets_and_search_pipeline(swin_calibrated):
    """The full --mixed pipeline on Swin: Hessian sensitivity over the
    Swin target leaves, omega ranking against flops/global_distance, and
    the evolutionary search scored by the vmapped validate_bits."""
    import random as R

    from diffvit_tpu.analysis.hessian import (hessian_sensitivity,
                                              hessian_target_names)

    m, x = swin_calibrated
    names = hessian_target_names(SWIN_SPEC)
    flops = swin.flops_list(SWIN_SPEC)
    assert len(names) == len(flops) - 1 == len(m.global_distance)

    labels = np.arange(2) % 10
    mh = hessian_sensitivity(m.params, SWIN_SPEC, [(x, labels)],
                             jax.random.PRNGKey(0), max_iter=2,
                             log=lambda *_: None, joint=True)
    assert len(mh) == len(names)

    cands = mp.sample_candidates(flops, R.Random(0), factor=2.0,
                                 groups=swin.bit_slot_groups(SWIN_SPEC))
    omega = mp.omega_rank(cands, flops, mh, m.global_distance)
    best = mp.evolutionary_search(
        omega, flops, None, pop_size=4, evo_iter=1, mutate_size=2,
        crossover_size=2, rng=R.Random(7), log=lambda *_: None, factor=2.0,
        evaluate_batch=lambda cs: validate_bits(m, [(x, labels)], cs,
                                                log=lambda *_: None))
    # population entries are [bit_config, top1]
    assert len(best[0][0]) == len(flops)
    assert all(b in (4, 8) for b in best[0][0])
