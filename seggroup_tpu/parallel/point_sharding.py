"""Point-axis sharding: the context-parallel analog for point clouds.

The reference has no sequence dimension; its "long context" axis is points
per scene, bounded by fixed resampling/cropping (SURVEY.md §5). For scenes
that exceed one chip's HBM, we shard the POINT axis across the mesh: each
device owns a contiguous slab of points; neighbor-gather ops (edge convs)
all-gather only the small input features (9 floats/point) over ICI and keep
the fat (N/D, k, C) intermediates local. This is the same
gather-what-you-need pattern as sequence parallelism with all-gathered
activations — no ring attention needed because kNN neighborhoods are
precomputed index lists.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P


def point_sharded_edge_conv(
    mesh: Mesh,
    x: jax.Array,        # (N, F) small per-point input features
    knn_idx: jax.Array,  # (N, k) global neighbor indices
    weights: jax.Array,  # (2F, C)
    axis: str = "data",
):
    """Edge conv (concat(nbr - self, self) @ W, max over k — the stage-1
    MLP2/3 body) with the point axis sharded over `axis`.

    Each device: all-gathers the (N, F) inputs (small — F=9), gathers its
    own (N/D, k) neighborhoods locally, computes the fat (N/D, k, C)
    intermediate locally, and returns its (N/D, C) slab. Peak per-device
    memory drops by ~D for the dominant term."""

    def local_fn(x_local, idx_local, w):
        x_full = jax.lax.all_gather(x_local, axis, tiled=True)  # (N, F)
        nbr = x_full[idx_local]                                 # (N/D, k, F)
        self_f = x_local[:, None, :]
        feat = jnp.concatenate(
            [nbr - self_f, jnp.broadcast_to(self_f, nbr.shape)], axis=-1
        )
        h = jnp.maximum(
            jnp.einsum("nkf,fc->nkc", feat, w,
                       preferred_element_type=jnp.float32), 0.0
        )
        return jnp.max(h, axis=1)  # (N/D, C)

    return jax.jit(
        shard_map(
            local_fn,
            mesh=mesh,
            in_specs=(P(axis), P(axis), P()),
            out_specs=P(axis),
            check_vma=False,
        )
    )(x, knn_idx, weights)
