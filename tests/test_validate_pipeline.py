"""engine.validate dispatch pipelining: with a loader that takes H per
batch and a 'device' that takes D to materialize, the epoch must cost
about max(H, D) per batch — not H + D (the reference loop and our
pre-round-3 validate both paid the sum; VERDICT r2 'engine.validate
dispatches synchronously')."""
import time

import numpy as np

from diffvit_tpu.engine import validate, validate_bits

N_BATCHES = 8
H = 0.03  # host (loader) seconds per batch
D = 0.03  # device seconds per batch


class _LazyLogits:
    """Async-dispatch stand-in: materializing via np.asarray 'waits for
    the device', like a jax.Array whose computation is in flight."""

    def __init__(self, values, ready_at):
        self._values = values
        self._ready_at = ready_at

    def __array__(self, dtype=None, copy=None):
        now = time.time()
        if now < self._ready_at:
            time.sleep(self._ready_at - now)
        return self._values

    @property
    def shape(self):
        return self._values.shape


class _FakeDevice:
    """Single-queue device: each dispatch completes D after the later of
    (dispatch time, previous completion) — FIFO like a TPU stream."""

    def __init__(self):
        self.free_at = 0.0

    def dispatch(self, values):
        self.free_at = max(self.free_at, time.time()) + D
        return _LazyLogits(values, self.free_at)


class _FakeModel:
    def __init__(self):
        self.dev = _FakeDevice()

    def __call__(self, data, bit_config=None, quant=True, use_int=False):
        logits = np.eye(8, dtype=np.float32)[np.arange(len(data)) % 4] * 5
        return self.dev.dispatch(logits)

    def forward_bits(self, data, bits):
        one = np.eye(8, dtype=np.float32)[np.arange(len(data)) % 4] * 5
        return self.dev.dispatch(np.stack([one] * len(bits)))


def _slow_loader():
    for _ in range(N_BATCHES):
        time.sleep(H)  # decode/preprocess work
        yield np.zeros((4, 3)), np.arange(4) % 4


def test_validate_overlaps_host_and_device():
    model = _FakeModel()
    t0 = time.time()
    loss, p1, p5 = validate(model, _slow_loader(), print_freq=0,
                            log=lambda *a, **k: None)
    wall = time.time() - t0
    assert p1 == 100.0 and p5 == 100.0
    seq = N_BATCHES * (H + D)
    assert wall < 0.8 * seq, (
        f"wall {wall:.3f}s vs sequential {seq:.3f}s — dispatch pipelining "
        "is not overlapping host and device")


def test_validate_bits_overlaps_host_and_device():
    model = _FakeModel()
    t0 = time.time()
    precs = validate_bits(model, _slow_loader(), [[4], [8]],
                          log=lambda *a, **k: None)
    wall = time.time() - t0
    assert precs == [100.0, 100.0]
    seq = N_BATCHES * (H + D)
    assert wall < 0.8 * seq
