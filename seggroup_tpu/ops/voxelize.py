"""Device-side voxelization.

TPU replacement for the reference's hash-map rulebook builder
(`PG_OP.voxelize_idx`, pointgroup/lib/pointgroup_ops/src/voxelize/
voxelize.cpp:59-152, built on google::dense_hash_map) and its GPU
gather/scatter kernels (`voxelize_fp/bp`, `point_recover_fp/bp`,
voxelize.cu:1-56). Instead of a host hash map we sort points by a linearized
voxel key and compact with a rank scan — branch-free, fixed-shape, fully on
device. The "mean" pooling mode (mode 4, the only one the models use,
reference data/scannetv2_inst.py:244) is a masked segment-mean; recovery is a
gather, and both are trivially differentiable (the reference needed hand-written
backward kernels).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from seggroup_tpu.ops.segment_ops import invert_permutation, segment_mean

__all__ = ["VoxelMap", "voxelize", "voxel_gather_mean", "point_recover"]


class VoxelMap(NamedTuple):
    voxel_coords: jax.Array  # (M, 4) int32: batch, x, y, z (M = static cap)
    point2voxel: jax.Array   # (N,) int32 in [0, M), == M for padding/overflow
    voxel_valid: jax.Array   # (M,) bool
    num_voxels: jax.Array    # scalar int32


@partial(jax.jit, static_argnames=("max_voxels",))
def voxelize(
    int_coords: jax.Array,
    batch_ids: jax.Array,
    point_valid: jax.Array,
    max_voxels: int,
) -> VoxelMap:
    """Build the point<->voxel correspondence.

    int_coords: (N, 3) int32 non-negative quantized coords.
    batch_ids:  (N,) int32 scene index within the batch (the reference encodes
                it as locs[:,0], scannetv2_inst.py:230).
    max_voxels: static output cap (the sparse tensor's row budget)."""
    n = int_coords.shape[0]
    c = int_coords.astype(jnp.int32)
    invalid = (~point_valid).astype(jnp.int32)
    # lexicographic sort (invalid points last); avoids 64-bit linear keys,
    # which the reference's dense_hash_map needed (datatype.h:24-35)
    order = jnp.lexsort((c[:, 2], c[:, 1], c[:, 0], batch_ids, invalid)).astype(
        jnp.int32
    )
    s_c = c[order]
    s_b = batch_ids[order]
    s_ok = point_valid[order]
    prev_same = (
        jnp.all(s_c[1:] == s_c[:-1], axis=1) & (s_b[1:] == s_b[:-1])
    )
    firsts = jnp.concatenate([jnp.array([True]), ~prev_same]) & s_ok
    compact_sorted = jnp.cumsum(firsts.astype(jnp.int32)) - 1
    num = jnp.sum(firsts.astype(jnp.int32))
    p2v_sorted = jnp.where(
        s_ok & (compact_sorted < max_voxels), compact_sorted, max_voxels
    )
    p2v = p2v_sorted[invert_permutation(order)]

    # p2v_sorted is nondecreasing (invalid/overflow rows sort last and map to
    # max_voxels), so each voxel's members are one contiguous run; its coords
    # are the run's first row
    vc_sorted = jnp.concatenate([s_b[:, None], s_c], axis=1)
    starts = jnp.searchsorted(
        p2v_sorted, jnp.arange(max_voxels, dtype=jnp.int32), side="left"
    )
    voxel_valid = jnp.arange(max_voxels) < num
    voxel_coords = jnp.where(
        voxel_valid[:, None], vc_sorted[jnp.minimum(starts, n - 1)], 0
    ).astype(jnp.int32)
    return VoxelMap(voxel_coords, p2v.astype(jnp.int32), voxel_valid, num)


def voxel_gather_mean(feats: jax.Array, vmap: VoxelMap) -> jax.Array:
    """Per-voxel mean of member point features (reference voxelize_fp mode 4)."""
    m = vmap.voxel_valid.shape[0]
    return segment_mean(feats, vmap.point2voxel, m, method="sorted")


def point_recover(voxel_feats: jax.Array, vmap: VoxelMap) -> jax.Array:
    """Scatter voxel features back to points (reference point_recover_fp)."""
    m = voxel_feats.shape[0]
    idx = jnp.minimum(vmap.point2voxel, m - 1)
    out = voxel_feats[idx]
    ok = vmap.point2voxel < m
    return jnp.where(ok[:, None], out, jnp.zeros_like(out))
