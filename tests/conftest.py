"""Test configuration: CPU backend (f64 oracle mode) with 8 virtual devices
for multi-chip sharding tests (SURVEY.md §4 TPU-build implication)."""

import os

# Must be set before JAX initializes a backend.
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax

# The axon sitecustomize forces JAX_PLATFORMS=axon (TPU tunnel); env vars are
# ignored, so pick CPU through the config API.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import pytest  # noqa: E402


@pytest.fixture
def key():
    return jax.random.PRNGKey(123456)
