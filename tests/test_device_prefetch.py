"""DevicePrefetcher: the async host->device transfer stage between a
loader and a jitted forward (round-3 VERDICT item 5 — the e2e rows'
transfer was serialized with decode and dispatch)."""
import numpy as np
import pytest

from diffvit_tpu.data.imagenet import DevicePrefetcher


class _ListLoader:
    def __init__(self, batches):
        self.batches = batches

    def __len__(self):
        return len(self.batches)

    def __iter__(self):
        return iter(self.batches)


def _batches(n=5, bs=4):
    rng = np.random.default_rng(0)
    return [(rng.standard_normal((bs, 3, 8, 8)).astype(np.float32),
             rng.integers(0, 10, bs).astype(np.int32)) for _ in range(n)]


def test_yields_identical_batches_in_order():
    import jax

    batches = _batches()
    pf = DevicePrefetcher(_ListLoader(batches), depth=2)
    assert len(pf) == len(batches)
    got = list(pf)
    assert len(got) == len(batches)
    for (di, dl), (hi, hl) in zip(got, batches):
        assert isinstance(di, jax.Array)  # already device-resident
        np.testing.assert_array_equal(np.asarray(di), hi)
        np.testing.assert_array_equal(np.asarray(dl), hl)


def test_reiterable_and_jit_consumable():
    import jax
    import jax.numpy as jnp

    batches = _batches(3)
    pf = DevicePrefetcher(_ListLoader(batches), depth=1)
    f = jax.jit(lambda x: jnp.sum(x, axis=(1, 2, 3)))
    for _ in range(2):  # a fresh feeder thread per epoch
        outs = [np.asarray(f(d)) for d, _ in pf]
        want = [b[0].sum(axis=(1, 2, 3)) for b in batches]
        for o, w in zip(outs, want):
            np.testing.assert_allclose(o, w, rtol=1e-5)


def test_early_break_does_not_hang():
    batches = _batches(64)
    pf = DevicePrefetcher(_ListLoader(batches), depth=2)
    for i, _ in enumerate(pf):
        if i == 1:
            break  # feeder must unblock and exit via the stop event


def test_loader_errors_surface_in_consumer():
    class Boom(_ListLoader):
        def __iter__(self):
            yield self.batches[0]
            raise RuntimeError("decode exploded")

    pf = DevicePrefetcher(Boom(_batches(2)), depth=2)
    it = iter(pf)
    next(it)
    with pytest.raises(RuntimeError, match="decode exploded"):
        next(it)


def test_depth_validation():
    with pytest.raises(ValueError, match="depth"):
        DevicePrefetcher(_ListLoader([]), depth=0)


def test_validate_through_prefetcher():
    """engine.validate consumes a DevicePrefetcher transparently (device
    arrays pass through the jitted forward's asarray unchanged)."""
    import jax

    from diffvit_tpu.config import QuantConfig
    from diffvit_tpu.engine import QuantizedViT, validate
    from diffvit_tpu.models import vit

    spec = vit.ViTSpec("pf_tiny", embed_dim=64, depth=2, num_heads=2,
                       num_classes=4)
    params = vit.init_params(spec, jax.random.PRNGKey(0))
    m = QuantizedViT(spec, QuantConfig(), params=params)
    rng = np.random.default_rng(1)
    batches = [(rng.standard_normal((4, 3, 224, 224)).astype(np.float32),
                rng.integers(0, 4, 4).astype(np.int32)) for _ in range(3)]
    m.calibrate(batches[0][0])
    base = validate(m, _ListLoader(batches), print_freq=0)
    pf = validate(m, DevicePrefetcher(_ListLoader(batches)), print_freq=0)
    assert base == pf
