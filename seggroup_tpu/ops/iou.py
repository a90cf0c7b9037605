"""Proposal x ground-truth-instance IoU matrix.

TPU replacement for `PG_OP.get_iou` (reference pointgroup/lib/pointgroup_ops/
src/get_iou/get_iou.cu:12-38, one CUDA thread per (proposal, instance) pair
scanning the proposal's point list). Here both memberships are flat per-point
id vectors; the intersection matrix is one segment-sum over a combined key and
the union follows by inclusion-exclusion — no per-pair loops.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from seggroup_tpu.ops.segment_ops import segment_sum

__all__ = ["proposal_instance_iou"]


@partial(jax.jit, static_argnames=("num_proposals", "num_instances"))
def proposal_instance_iou(
    proposal_ids: jax.Array,
    instance_ids: jax.Array,
    point_valid: jax.Array,
    num_proposals: int,
    num_instances: int,
    instance_sizes: jax.Array | None = None,
) -> jax.Array:
    """proposal_ids: (N,) int32 in [0, P) (>= P means not in any proposal).
    instance_ids: (N,) int32 in [0, I) (>= I / negative means no instance).
    instance_sizes: optional (I,) true per-instance point counts — pass it
    when the flat membership array lists the same point under several
    proposals (PointGroup's dual clustering), where recounting instances from
    the flat array would double them. Returns (P, I) float32 IoU."""
    p_ok = (proposal_ids >= 0) & (proposal_ids < num_proposals) & point_valid
    i_ok = (instance_ids >= 0) & (instance_ids < num_instances) & point_valid
    ones = jnp.ones(proposal_ids.shape, jnp.float32)

    sizes_p = segment_sum(ones, jnp.where(p_ok, proposal_ids, -1),
                          num_proposals, method="sorted")
    if instance_sizes is None:
        sizes_i = segment_sum(ones, jnp.where(i_ok, instance_ids, -1),
                              num_instances, method="sorted")
    else:
        sizes_i = instance_sizes.astype(jnp.float32)

    both = p_ok & i_ok
    combined = jnp.where(
        both, proposal_ids * num_instances + instance_ids, -1
    )
    inter = segment_sum(ones, combined, num_proposals * num_instances,
                        method="sorted")
    inter = inter.reshape(num_proposals, num_instances)
    union = sizes_p[:, None] + sizes_i[None, :] - inter
    return inter / jnp.maximum(union, 1.0)
