"""Test configuration: force an 8-device virtual CPU mesh BEFORE jax imports,
so multi-chip sharding paths are exercised without TPU hardware (the reference
had no multi-device testing at all; SURVEY.md §4)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# the axon sitecustomize force-registers the TPU backend and overrides
# JAX_PLATFORMS; the config flag wins over both
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
