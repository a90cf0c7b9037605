"""Persistent XLA compilation cache.

TPU compiles of the big train-step programs are minutes each (the 7-level
PointGroup UNet alone is ~5 min of Mosaic kernel compilation through the
remote compile helper); the jax persistent cache keyed by HLO hash makes
every re-run — bench rounds, trainer restarts, resume — hit in <1 s.
Verified effective through the axon remote-compile backend.
"""

from __future__ import annotations

import os


def enable_persistent_cache(directory: str | None = None) -> str:
    """Idempotently point jax at an on-disk compilation cache. Default
    location: <repo root>/.jax_cache (gitignored)."""
    import jax

    existing = jax.config.jax_compilation_cache_dir
    if directory is None and existing:
        return existing  # respect a cache someone already configured
    if directory is None:
        directory = os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))), ".jax_cache")
    os.makedirs(directory, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", directory)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return directory
