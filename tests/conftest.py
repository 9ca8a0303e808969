import os

# Tests run on a virtual 8-device CPU mesh. The harness presets
# JAX_PLATFORMS=axon (TPU) and a sitecustomize imports jax before any
# conftest runs, so the env var alone is not enough — override the
# already-initialized config too. Numeric tests assume fp32 CPU math.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
