"""CKA accumulators vs the reference efficient_CKA / DDV_CKA (torch, CPU)."""
import numpy as np
import pytest
import torch

from diffvit_tpu.analysis import cka as jcka

pytestmark = pytest.mark.usefixtures("reference_available")


def _acts(rng, n_layers=4, n=10, d=32):
    return [rng.normal(size=(n, d)).astype(np.float32)
            for _ in range(n_layers)]


def test_minibatch_cka_parity(rng):
    from efficient_CKA import MinibatchCKA

    acts1 = _acts(rng)
    acts2 = _acts(rng)

    ref = MinibatchCKA(4)
    ref.update_state([torch.tensor(a) for a in acts1])
    ref.update_state([torch.tensor(a) for a in acts2])
    ref_map = ref.result().cpu().numpy()

    mine = jcka.MinibatchCKA(4)
    mine.update_state(acts1)
    mine.update_state(acts2)
    np.testing.assert_allclose(np.asarray(mine.result()), ref_map, rtol=1e-4)


def test_minibatch_cka_across_models_parity(rng):
    from efficient_CKA import MinibatchCKA

    a1 = _acts(rng, 3)
    a2 = _acts(rng, 5)
    ref = MinibatchCKA(3, 5, across_models=True)
    ref.update_state_across_models([torch.tensor(a) for a in a1],
                                   [torch.tensor(a) for a in a2])
    ref_map = ref.result().cpu().numpy()

    mine = jcka.MinibatchCKA(3, 5, across_models=True)
    mine.update_state_across_models(a1, a2)
    np.testing.assert_allclose(np.asarray(mine.result()), ref_map, rtol=1e-4)


def test_adv_cka_parity(rng):
    from DDV_CKA import MinibatchAdvCKA

    a1 = _acts(rng)
    a1_adv = [a + rng.normal(size=a.shape).astype(np.float32) * 0.05
              for a in a1]
    a2 = _acts(rng)
    a2_adv = [a + rng.normal(size=a.shape).astype(np.float32) * 0.05
              for a in a2]

    ref = MinibatchAdvCKA(4)
    ref.update_state([torch.tensor(a) for a in a1],
                     [torch.tensor(a) for a in a1_adv],
                     [torch.tensor(a) for a in a2],
                     [torch.tensor(a) for a in a2_adv])
    ref_map = ref.result().cpu().numpy()

    mine = jcka.MinibatchAdvCKA(4)
    mine.update_state(a1, a1_adv, a2, a2_adv)
    np.testing.assert_allclose(np.asarray(mine.result()), ref_map, rtol=1e-4)
