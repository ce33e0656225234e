"""Test configuration: run everything on a virtual 8-device CPU mesh so
sharding tests work without TPU hardware (SURVEY.md §4)."""
import os

# Note: the JAX_PLATFORMS env var initializes the backend during `import jax`
# which silently defeats jax_num_cpu_devices — use config knobs instead.
os.environ.pop("JAX_PLATFORMS", None)

import jax  # noqa: E402

try:
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)
except RuntimeError:  # backend already initialized
    pass

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def smooth_jpeg():
    """Writer for natural-image-like JPEG fixtures: smooth gradients +
    low-freq structure (pure noise is adversarial to both JPEG and
    resampling) — the content class the fast-decode benches are
    calibrated on (docs/PERF_ANALYSIS.md).  Session-scoped stateless
    helper shared by the native-decode and u8-wire test modules."""
    from PIL import Image

    def write(path, w, h, seed=0):
        yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
        rng = np.random.default_rng(seed)
        img = np.stack([
            128 + 90 * np.sin(xx / w * 7 + c) * np.cos(yy / h * 5 - c)
            + rng.normal(0, 4, (h, w))
            for c in range(3)], axis=-1)
        Image.fromarray(np.clip(img, 0, 255).astype(np.uint8), "RGB").save(
            path, quality=92)

    return write
