"""Masked segment reductions.

TPU-native replacement for the reference's CSR segment kernels
(`PG_OP.sec_mean/sec_min/sec_max`, reference pointgroup/lib/pointgroup_ops/src/
sec_mean/sec_mean.cu:12-86, and `roipool_fp/bp`, roipool.cu:12-57) and for the
per-cluster feature aggregation loops of stage 1 (reference
seggroup/model.py:278-288). All ops take a `num_segments` static bound and
treat ids outside [0, num_segments) as padding (dropped).

Two interchangeable engines (same semantics, tested equal):
  "scatter" — flat `segment_ids` + XLA scatter reductions; cheap to trace
      (stage 1 calls these inside scan bodies at slot granularity).
  "sorted"  — the scatter-free sort/scan/gather engine in
      `segment_sorted.py`, for row counts where TPU's serialized unsorted
      scatters dominate (PointGroup's 2^20-row flat-membership arrays).
Select per-call with `method=...` or globally with `set_default_method` /
the SEGGROUP_SEGMENT_METHOD env var.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

__all__ = [
    "segment_sum",
    "segment_mean",
    "segment_max",
    "segment_min",
    "segment_argmax",
    "csr_segment_reduce",
    "set_default_method",
]

_DEFAULT_METHOD = os.environ.get("SEGGROUP_SEGMENT_METHOD", "scatter")


def set_default_method(method: str) -> None:
    """Globally select the reduction engine ("scatter" | "sorted")."""
    global _DEFAULT_METHOD
    if method not in ("scatter", "sorted"):
        raise ValueError(method)
    _DEFAULT_METHOD = method


def _sorted():
    from seggroup_tpu.ops import segment_sorted
    return segment_sorted


def invert_permutation(order: jax.Array) -> jax.Array:
    """Inverse of a permutation as an argsort (gather-only).

    The scatter form `zeros.at[order].set(iota)` serializes on TPU because
    XLA cannot see that `order` is a permutation; a second sort is strictly
    cheaper at every scale we run."""
    return jnp.argsort(order).astype(jnp.int32)


def _clean_ids(segment_ids: jax.Array, num_segments: int) -> tuple[jax.Array, jax.Array]:
    """Return (ids clipped into range, validity mask). Out-of-range ids are padding."""
    valid = (segment_ids >= 0) & (segment_ids < num_segments)
    return jnp.where(valid, segment_ids, 0), valid


def segment_sum(data: jax.Array, segment_ids: jax.Array, num_segments: int,
                method: str | None = None) -> jax.Array:
    """Sum `data[i]` into row `segment_ids[i]`. Invalid ids contribute nothing."""
    if (method or _DEFAULT_METHOD) == "sorted":
        return _sorted().segment_sum(data, segment_ids, num_segments)
    ids, valid = _clean_ids(segment_ids, num_segments)
    mask = valid.reshape(valid.shape + (1,) * (data.ndim - valid.ndim))
    return jax.ops.segment_sum(
        jnp.where(mask, data, jnp.zeros_like(data)), ids, num_segments=num_segments
    )


def segment_mean(
    data: jax.Array, segment_ids: jax.Array, num_segments: int,
    method: str | None = None,
) -> jax.Array:
    """Per-segment mean; empty segments yield 0 (matches reference sec_mean /
    voxelize mean-mode behaviour of never dividing by zero on active rows)."""
    if (method or _DEFAULT_METHOD) == "sorted":
        return _sorted().segment_mean(data, segment_ids, num_segments)
    ids, valid = _clean_ids(segment_ids, num_segments)
    mask = valid.reshape(valid.shape + (1,) * (data.ndim - valid.ndim))
    total = jax.ops.segment_sum(
        jnp.where(mask, data, jnp.zeros_like(data)), ids, num_segments=num_segments
    )
    count = jax.ops.segment_sum(
        valid.astype(data.dtype), ids, num_segments=num_segments
    )
    count = count.reshape(count.shape + (1,) * (data.ndim - valid.ndim))
    return total / jnp.maximum(count, 1)


def segment_max(
    data: jax.Array,
    segment_ids: jax.Array,
    num_segments: int,
    fill_value=None,
    method: str | None = None,
) -> jax.Array:
    """Per-segment max. Empty segments get `fill_value` (default: 0, matching the
    roipool semantics of only ever reading non-empty proposals)."""
    if (method or _DEFAULT_METHOD) == "sorted":
        return _sorted().segment_max(data, segment_ids, num_segments,
                                     fill_value=fill_value)
    ids, valid = _clean_ids(segment_ids, num_segments)
    neg_inf = jnp.array(-jnp.inf if jnp.issubdtype(data.dtype, jnp.floating)
                        else jnp.iinfo(data.dtype).min, dtype=data.dtype)
    mask = valid.reshape(valid.shape + (1,) * (data.ndim - valid.ndim))
    out = jax.ops.segment_max(
        jnp.where(mask, data, neg_inf), ids, num_segments=num_segments
    )
    if fill_value is None:
        fill_value = jnp.zeros((), dtype=data.dtype)
    return jnp.where(out == neg_inf, fill_value, out)


def segment_min(
    data: jax.Array,
    segment_ids: jax.Array,
    num_segments: int,
    fill_value=None,
    method: str | None = None,
) -> jax.Array:
    if (method or _DEFAULT_METHOD) == "sorted":
        return _sorted().segment_min(data, segment_ids, num_segments,
                                     fill_value=fill_value)
    ids, valid = _clean_ids(segment_ids, num_segments)
    pos_inf = jnp.array(jnp.inf if jnp.issubdtype(data.dtype, jnp.floating)
                        else jnp.iinfo(data.dtype).max, dtype=data.dtype)
    mask = valid.reshape(valid.shape + (1,) * (data.ndim - valid.ndim))
    out = jax.ops.segment_min(
        jnp.where(mask, data, pos_inf), ids, num_segments=num_segments
    )
    if fill_value is None:
        fill_value = jnp.zeros((), dtype=data.dtype)
    return jnp.where(out == pos_inf, fill_value, out)


def segment_argmax(
    data: jax.Array, segment_ids: jax.Array, num_segments: int,
    method: str | None = None,
) -> jax.Array:
    """Index (into `data`'s leading axis) of the per-segment max, per feature
    column. Replacement for the argmax side-buffer of the reference roipool
    backward (roipool.cu:30-41): with this, roipool's VJP is a plain gather."""
    if (method or _DEFAULT_METHOD) == "sorted":
        return _sorted().segment_argmax(data, segment_ids, num_segments)
    per_seg_max = segment_max(data, segment_ids, num_segments,
                              method="scatter")  # (S, C)
    ids, valid = _clean_ids(segment_ids, num_segments)
    n = data.shape[0]
    row_idx = jnp.arange(n)
    # For each element: is it the max of its segment? Pick the smallest index.
    is_max = (data == per_seg_max[ids]) & valid.reshape(
        valid.shape + (1,) * (data.ndim - valid.ndim)
    )
    big = jnp.array(n, dtype=jnp.int32)
    idx_or_big = jnp.where(
        is_max, row_idx.reshape((-1,) + (1,) * (data.ndim - 1)).astype(jnp.int32), big
    )
    arg = jax.ops.segment_min(idx_or_big, ids, num_segments=num_segments)
    # empty segments yield the op identity (INT_MAX), not `big` — catch both
    return jnp.where(arg >= big, 0, arg)


def csr_segment_reduce(
    data: jax.Array, offsets: jax.Array, num_segments: int, mode: str = "max"
) -> jax.Array:
    """CSR-offset flavoured entry point, mirroring the reference kernels' calling
    convention (`sec_mean(feats, offsets)`, sec_mean.cu:12-35). Converts offsets
    to flat segment ids and dispatches. `offsets` has shape (num_segments+1,)
    and may be padded with trailing repeats of the total length."""
    n = data.shape[0]
    # segment id of row i = number of offsets <= i, minus 1
    ids = jnp.searchsorted(offsets, jnp.arange(n), side="right") - 1
    ids = jnp.where(ids >= num_segments, -1, ids)
    if mode == "sum":
        return segment_sum(data, ids, num_segments)
    if mode == "mean":
        return segment_mean(data, ids, num_segments)
    if mode == "max":
        return segment_max(data, ids, num_segments)
    if mode == "min":
        return segment_min(data, ids, num_segments)
    raise ValueError(f"unknown mode {mode!r}")
