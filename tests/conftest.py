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

# persistent compilation cache: XLA-CPU compiles of the full-size models
# dominate suite wall-clock on this 1-CPU box (~10 min cold); identical
# programs hit the cache on re-runs (~3x faster). Keyed by HLO hash, so
# source changes invalidate exactly the affected programs.
_cache_dir = os.path.join(os.path.dirname(__file__), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
