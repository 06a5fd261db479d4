"""Test configuration: force JAX onto CPU with 8 virtual devices so
multi-chip sharding logic is exercised without TPU hardware."""
import os

# The ambient environment pins JAX_PLATFORMS=axon (the tunneled TPU) — tests
# must land on CPU with 8 virtual devices. Plugins (jaxtyping) import jax
# before this conftest runs, so the env var alone is not enough; the backend
# is not yet initialized at conftest time, so jax.config still takes effect.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
assert jax.devices()[0].platform == "cpu", (
    "tests must run on CPU; backend was initialized before conftest could "
    f"redirect it (got {jax.devices()})")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
