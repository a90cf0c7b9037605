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


# ---------------------------------------------------------------------------
# Point-sharded stage-1 model (VERDICT r3 item 6): the REAL SegGroupGNN
# forward with its fat edge-conv intermediates sharded over a mesh axis.
# ---------------------------------------------------------------------------

# params whose gradient contributions are computed per-slab and must be
# psum'ed; everything else (MLP1 / GCN / classifier) runs replicated on
# identical inputs, so every device already holds the full gradient
_SHARDED_PARAM_SUBTREES = ("mlp_2", "mlp_3")


def make_point_sharded_model(mesh: Mesh, axis: str = "point", **kwargs):
    """A SegGroupGNN configured to run inside a shard_map over `axis`.
    Parameters are interchangeable with the unsharded model (same tree)."""
    from seggroup_tpu.models.seggroup import SegGroupGNN

    return SegGroupGNN(shard_axis=axis, shard_count=mesh.shape[axis],
                       **kwargs)


def build_stage1_point_sharded_forward(model, mesh: Mesh,
                                       axis: str = "point",
                                       mode: str = "ins_infer"):
    """Jitted no-grad forward of the point-sharded stage-1 model. The scene
    and params are replicated (in/out specs P()); sharding happens inside
    the model (see SegGroupGNN.shard_axis). Call: fwd(variables, scene)."""
    assert model.shard_axis == axis and model.shard_count == mesh.shape[axis]

    def fwd(variables, scene):
        return model.apply(variables, scene, mode=mode, train=False)

    return jax.jit(shard_map(
        fwd, mesh=mesh, in_specs=(P(), P()), out_specs=P(),
        check_vma=False,
    ))


def build_stage1_point_sharded_grad(model, mesh: Mesh, axis: str = "point"):
    """Jitted (loss, grads) of the point-sharded training forward.

    Gradients for the point-sharded subtrees (mlp_2/mlp_3) are pmean'ed over
    `axis`; replicated subtrees' gradients are already complete on every
    device. Why pmean, not psum: the loss is computed REDUNDANTLY on every
    device (slot-space compute is replicated), so the transpose of the
    slab all_gather — a psum_scatter — sums D identical cotangents, making
    each device's local-slab contribution D-fold; pmean(= psum / D) of those
    restores the exact single-device gradient (verified element-wise in
    tests/test_point_sharding.py). Call: step(variables, scene, dropout_key)
    -> (loss, grads)."""
    assert model.shard_axis == axis and model.shard_count == mesh.shape[axis]

    def step(variables, scene, key):
        params = variables["params"]
        others = {k: v for k, v in variables.items() if k != "params"}

        def loss_fn(p):
            out, _ = model.apply(
                {"params": p, **others}, scene, mode="train", train=True,
                rngs={"dropout": key}, mutable=["batch_stats"])
            return out.loss_sum / jnp.maximum(out.loss_count, 1.0)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        grads = {
            k: (jax.tree.map(lambda g: jax.lax.pmean(g, axis), v)
                if k in _SHARDED_PARAM_SUBTREES else v)
            for k, v in grads.items()
        }
        return loss, grads

    return jax.jit(shard_map(
        step, mesh=mesh, in_specs=(P(), P(), P()), out_specs=(P(), P()),
        check_vma=False,
    ))
