"""DataLoader epoch reshuffling: successive iterations must draw DIFFERENT
shuffles (the reference reshuffles anew per get_dataset call / epoch,
dataset_utility.py:45-80) while staying deterministic in (seed, epoch) —
and epoch 0 must keep the legacy rng(seed) order previous rounds pinned."""
import numpy as np

from diffvit_tpu.data.imagenet import DataLoader


class _IdxDataset:
    """Dataset whose 'image' is its own index, so yielded batches reveal
    the shuffle order directly."""

    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return np.full((1,), i, np.float32), i


def _epoch_order(loader):
    out = []
    for imgs, labels in loader:
        out.extend(labels.tolist())
    return out


def test_epochs_reshuffle_differently_but_deterministically():
    dl = DataLoader(_IdxDataset(64), 8, shuffle=True, num_workers=2, seed=3)
    e0, e1, e2 = _epoch_order(dl), _epoch_order(dl), _epoch_order(dl)
    assert sorted(e0) == sorted(e1) == list(range(64))
    assert e0 != e1 and e1 != e2 and e0 != e2
    # deterministic: a fresh loader with the same seed replays the sequence
    dl2 = DataLoader(_IdxDataset(64), 8, shuffle=True, num_workers=2, seed=3)
    assert _epoch_order(dl2) == e0 and _epoch_order(dl2) == e1


def test_epoch0_keeps_legacy_order():
    e0 = _epoch_order(DataLoader(_IdxDataset(64), 8, shuffle=True,
                                 num_workers=2, seed=3))
    legacy = np.arange(64)
    np.random.default_rng(3).shuffle(legacy)
    assert e0 == legacy.tolist()


def test_no_shuffle_is_stable():
    dl = DataLoader(_IdxDataset(16), 4, shuffle=False, num_workers=1)
    assert _epoch_order(dl) == list(range(16)) == _epoch_order(dl)
