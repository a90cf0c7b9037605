"""Farthest point sampling as a fixed-trip-count `lax.fori_loop` (device-side,
batched, mask-aware).

Replaces the reference's numpy/cupy FPS (seggroup/model.py:329-395). Semantics
match the deterministic configuration the reference always uses
(`initial_idx=0, skip_initial=True`, model.py:406): the first kept sample is the
point farthest from candidate 0, and each subsequent sample maximizes the min
squared distance to the kept set. Batched over clusters so that one call
processes every cluster's candidate set at once (MXU/VPU-friendly), instead of
the reference's per-cluster host loop (model.py:398-426).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["farthest_point_sampling", "masked_fps"]


def _sqdist_to(points: jax.Array, anchor: jax.Array) -> jax.Array:
    # points: (B, P, 3); anchor: (B, 3) -> (B, P)
    d = points - anchor[:, None, :]
    return jnp.sum(d * d, axis=-1)


def masked_fps(
    points: jax.Array,
    valid: jax.Array,
    k: int,
    initial_idx: int = 0,
    skip_initial: bool = True,
) -> jax.Array:
    """Batched FPS with per-point validity.

    Args:
      points: (B, P, D) candidate coordinates.
      valid:  (B, P) bool; invalid candidates are never selected.
      k: static number of samples.

    Returns:
      (B, k) int32 indices into the P axis. If a batch row has fewer than k
      valid points, indices repeat (argmax of an all -inf row returns a valid
      already-chosen index, mirroring the reference's repeat-to-fill behavior
      for tiny clusters, model.py:404-418).
    """
    B, P, _ = points.shape
    neg = jnp.float32(-1.0)

    start = jnp.full((B,), initial_idx, dtype=jnp.int32)
    anchor = jnp.take_along_axis(points, start[:, None, None], axis=1)[:, 0]
    min_d = _sqdist_to(points, anchor)
    min_d = jnp.where(valid, min_d, neg)

    if skip_initial:
        first = jnp.argmax(min_d, axis=1).astype(jnp.int32)
        anchor = jnp.take_along_axis(points, first[:, None, None], axis=1)[:, 0]
        min_d = jnp.where(valid, _sqdist_to(points, anchor), neg)
    else:
        first = start

    indices = jnp.zeros((B, k), dtype=jnp.int32).at[:, 0].set(first)

    def body(i, carry):
        indices, min_d = carry
        nxt = jnp.argmax(min_d, axis=1).astype(jnp.int32)
        anchor = jnp.take_along_axis(points, nxt[:, None, None], axis=1)[:, 0]
        d = jnp.where(valid, _sqdist_to(points, anchor), neg)
        min_d = jnp.minimum(min_d, d)
        indices = indices.at[:, i].set(nxt)
        return indices, min_d

    if k > 1:
        indices, _ = jax.lax.fori_loop(1, k, body, (indices, min_d))
    return indices


def farthest_point_sampling(points: jax.Array, k: int) -> jax.Array:
    """Unmasked convenience wrapper: (P, D) or (B, P, D) -> (k,) or (B, k)."""
    squeeze = points.ndim == 2
    if squeeze:
        points = points[None]
    valid = jnp.ones(points.shape[:2], dtype=bool)
    idx = masked_fps(points, valid, k)
    return idx[0] if squeeze else idx
