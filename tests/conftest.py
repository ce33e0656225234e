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
