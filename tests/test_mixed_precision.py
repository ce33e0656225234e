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
