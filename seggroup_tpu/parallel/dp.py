"""Data-parallel training over a jax.sharding.Mesh.

TPU-native replacement for the reference's parallelism stack (SURVEY.md §2.5):
PyTorch DDP over NCCL with one process per GPU and one scene per rank
(reference seggroup/train.py:83-94, 274-277). Here a single controller holds a
`Mesh` with a 'data' axis; `shard_map` runs one scene per device, `psum`
replaces both the DDP gradient all-reduce and the four explicit metric
all_reduce calls (train.py:172-175). Collectives ride ICI; multi-host extends
the same mesh over DCN via jax.distributed (no code change here).
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from seggroup_tpu.types import Scene


def initialize_multihost(coordinator: str | None = None,
                         num_processes: int | None = None,
                         process_id: int | None = None) -> None:
    """Multi-host bring-up (the reference's init_process_group analog,
    seggroup/train.py:83-84): one jax.distributed.initialize per host; the
    global device mesh then spans all hosts, collectives ride ICI within a
    slice and DCN across slices. No-op for single-host runs."""
    if coordinator is None:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )


def make_mesh(num_devices: int | None = None, axis: str = "data") -> Mesh:
    devs = jax.devices()
    if num_devices is not None:
        devs = devs[:num_devices]
    return Mesh(np.array(devs), (axis,))


def shard_batch(mesh: Mesh, batch: Any) -> Any:
    """Place a host batch (leading axis = scenes) sharded over the data axis."""
    sharding = NamedSharding(mesh, P("data"))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def replicate(mesh: Mesh, tree: Any) -> Any:
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def make_optimizer(name: str = "sgd", lr: float = 0.001, momentum: float = 0.9,
                   weight_decay: float = 1e-4) -> optax.GradientTransformation:
    """Reference optimizers (seggroup/train.py:96-99): SGD(lr*100, momentum,
    wd 1e-4) or Adam(lr, wd 1e-4)."""
    if name == "sgd":
        return optax.chain(
            optax.add_decayed_weights(weight_decay),
            optax.sgd(learning_rate=lr * 100, momentum=momentum),
        )
    if name == "adam":
        return optax.chain(
            optax.add_decayed_weights(weight_decay),
            optax.adam(learning_rate=lr),
        )
    raise ValueError(name)


def build_stage1_train_step(
    model, optimizer: optax.GradientTransformation, mesh: Mesh
) -> Callable:
    """One DDP-style step: per-device scene -> local grads -> pmean -> update.

    batch: Scene pytree with leading axis = mesh data size (1 scene/device,
    the reference topology, seggroup/README.md:136). Returns (params, opt_state,
    batch_stats, metrics) with metrics summed across devices exactly like the
    reference's all_reduce (train.py:172-175)."""

    def local_loss(params, batch_stats, scene, rng):
        out, mut = model.apply(
            {"params": params, "batch_stats": batch_stats},
            scene, mode="train", train=True,
            rngs={"dropout": rng},
            mutable=["batch_stats"],
        )
        loss = out.loss_sum / jnp.maximum(out.loss_count, 1.0)
        return loss, (out, mut["batch_stats"])

    def step(params, opt_state, batch_stats, batch: Scene, rng):
        scene = jax.tree.map(lambda x: x[0], batch)  # local shard is (1, ...)
        rng = jax.random.fold_in(rng, jax.lax.axis_index("data"))
        (loss, (out, new_stats)), grads = jax.value_and_grad(
            local_loss, has_aux=True
        )(params, batch_stats, scene, rng)
        grads = jax.lax.pmean(grads, "data")
        new_stats = jax.lax.pmean(new_stats, "data")
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        metrics = {
            "loss": jax.lax.psum(loss, "data"),
            "iou_sem": jax.lax.psum(out.iou_sem, "data"),
            "iou_ins": jax.lax.psum(out.iou_ins, "data"),
            "acc": jax.lax.psum(out.acc, "data"),
        }
        return params, opt_state, new_stats, metrics

    n = mesh.devices.size
    scene_specs = Scene(*(P("data") for _ in Scene._fields))
    return jax.jit(
        shard_map(
            step,
            mesh=mesh,
            in_specs=(P(), P(), P(), scene_specs, P()),
            out_specs=(P(), P(), P(), P()),
            check_vma=False,
        )
    )


def _minkunet_dp_core(model, optimizer, num_classes, ignore_label):
    """Shared local-loss + pmean/psum update for the MinkUNet DP steps (the
    host-plan and packed builders differ only in how the shard's
    (st, labels, plan) triple is obtained)."""
    from seggroup_tpu.eval.semantic import confusion_matrix

    def local_loss(params, stats, st, labels, plan):
        logits, mut = model.apply(
            {"params": params, "batch_stats": stats}, st, train=True,
            mutable=["batch_stats"], plan=plan)
        ok = st.valid & (labels != ignore_label)
        lp = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(
            lp, jnp.clip(labels, 0, num_classes - 1)[:, None], axis=1)[:, 0]
        loss = jnp.sum(jnp.where(ok, nll, 0.0)) / jnp.maximum(jnp.sum(ok), 1)
        return loss, (mut["batch_stats"], logits)

    def update(params, stats, opt_state, st, labels, plan):
        (loss, (new_stats, logits)), grads = jax.value_and_grad(
            local_loss, has_aux=True)(params, stats, st, labels, plan)
        grads = jax.lax.pmean(grads, "data")
        new_stats = jax.lax.pmean(new_stats, "data")
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        hist = confusion_matrix(
            jnp.argmax(logits, -1),
            jnp.where(st.valid, labels, ignore_label), num_classes)
        hist = jax.lax.psum(hist, "data")
        return params, new_stats, opt_state, jax.lax.psum(loss, "data"), hist

    return update


def build_minkunet_dp_step(
    model, optimizer: optax.GradientTransformation, mesh: Mesh,
    num_classes: int = 20, ignore_label: int = 255,
) -> Callable:
    """Stage-2 data-parallel train step: each device holds its own voxel
    batch shard (a full SparseTensor + labels + host-built pyramid plan with
    leading axis = mesh size), computes local grads, pmeans them. The
    reference trains its backbones single-GPU (minkowski/README_zh.md:56) —
    scaling them over the mesh is a capability the reference lacks.

    Call: step(params, stats, opt_state, st_batch, labels_batch, plan_batch)
      -> (params, stats, opt_state, summed_loss, summed_confusion)."""
    update = _minkunet_dp_core(model, optimizer, num_classes, ignore_label)

    def step(params, stats, opt_state, st, labels, plan):
        st, labels, plan = jax.tree.map(lambda x: x[0], (st, labels, plan))
        return update(params, stats, opt_state, st, labels, plan)

    return jax.jit(
        shard_map(
            step,
            mesh=mesh,
            in_specs=(P(), P(), P(), P("data"), P("data"), P("data")),
            out_specs=(P(), P(), P(), P(), P()),
            check_vma=False,
        )
    )


def build_stage1_infer_step(model, mesh: Mesh, mode: str) -> Callable:
    """No-grad inference step; returns per-scene outputs gathered to host
    (reference infer.py:131-156)."""

    def step(variables, batch: Scene):
        scene = jax.tree.map(lambda x: x[0], batch)
        out = model.apply(variables, scene, mode=mode, train=False)
        # per-scene label exports stay sharded (one row per device)
        gathered = jax.tree.map(lambda x: x[None], out)
        return gathered

    scene_specs = Scene(*(P("data") for _ in Scene._fields))
    return jax.jit(
        shard_map(
            step,
            mesh=mesh,
            in_specs=(P(), scene_specs),
            out_specs=P("data"),
            check_vma=False,
        )
    )


def build_kpconv_dp_step(
    model, optimizer: optax.GradientTransformation, mesh: Mesh,
    num_classes: int = 20, dl0: float = 0.04,
    level_caps=None, neighbor_caps=32, reg_weight: float = 0.1,
    grad_transform: Callable | None = None,
) -> Callable:
    """KPConv data-parallel train step: each device holds one sphere batch
    (points/feats/labels/batch_ids/valid with leading axis = mesh size),
    builds its pyramid ON DEVICE inside the shard, computes local grads,
    pmeans them. Third stage-2 backbone over the mesh (the reference trains
    KPConv single-GPU, kpconv/training_Scannet.py:185).

    `grad_transform` (optional) maps the local grad tree before the pmean
    (the trainer's per-variable clip + offset-LR scale,
    reference trainer.py:119-152).

    Call: step(params, stats, opt_state, pts, feats, labels, bids, valid)
      -> (params, stats, opt_state, summed_loss, mean_acc)."""
    from seggroup_tpu.models.kpconv import build_pyramid

    def local_loss(params, stats, pts, feats, labels, bids, valid):
        pyr = build_pyramid(pts, bids, valid, num_layers=5, dl0=dl0,
                            level_caps=level_caps, neighbor_cap=neighbor_caps)
        (logits, regs), mut = model.apply(
            {"params": params, "batch_stats": stats}, pyr, feats, train=True,
            mutable=["batch_stats"])
        ok = labels != 255
        lp = jax.nn.log_softmax(logits, -1)
        nll = -jnp.take_along_axis(
            lp, jnp.clip(labels, 0, num_classes - 1)[:, None], 1)[:, 0]
        ce = jnp.sum(jnp.where(ok, nll, 0.0)) / jnp.maximum(jnp.sum(ok), 1)
        acc = (jnp.sum((jnp.argmax(logits, -1) == labels) & ok)
               / jnp.maximum(jnp.sum(ok), 1))
        return ce + reg_weight * regs, (mut["batch_stats"], acc)

    def step(params, stats, opt_state, pts, feats, labels, bids, valid):
        pts, feats, labels, bids, valid = jax.tree.map(
            lambda x: x[0], (pts, feats, labels, bids, valid))
        (loss, (new_stats, acc)), grads = jax.value_and_grad(
            local_loss, has_aux=True)(params, stats, pts, feats, labels,
                                      bids, valid)
        if grad_transform is not None:
            grads = grad_transform(grads)
        grads = jax.lax.pmean(grads, "data")
        new_stats = jax.lax.pmean(new_stats, "data")
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, new_stats, opt_state, jax.lax.psum(loss, "data"),
                jax.lax.pmean(acc, "data"))

    return jax.jit(
        shard_map(
            step,
            mesh=mesh,
            in_specs=(P(), P(), P(), P("data"), P("data"), P("data"),
                      P("data"), P("data")),
            out_specs=(P(), P(), P(), P(), P()),
            check_vma=False,
        )
    )


def build_pointgroup_dp_step(
    model, optimizer: optax.GradientTransformation, mesh: Mesh,
    loss_fn: Callable, do_clustering: bool = False,
    instance_cap: int = 256,
) -> Callable:
    """PointGroup data-parallel train step (fourth backbone over the mesh):
    each device holds one voxelized batch shard (SparseTensor + point arrays
    + instance targets, leading axis = mesh size) and runs the full
    PointGroup forward — including device-side dual clustering + ScoreNet
    when `do_clustering` — locally; grads/batch stats pmean, loss psum.
    `loss_fn` is models.pointgroup.pointgroup_loss.

    Call: step(params, stats, opt_state, st, p2v, coords, batch_ids, valid,
               labels, inst, centroid, pointnum, plan, key)
      -> (params, stats, opt_state, summed_loss). `plan` is the stacked
    host pyramid plan per device (sparse/plan.py; pass {} to build
    rulebooks on device)."""

    def local_loss(params, stats, st, p2v, coords, batch_ids, valid,
                   labels, inst, centroid, pointnum, plan, key):
        out, mut = model.apply(
            {"params": params, "batch_stats": stats}, st, p2v, coords,
            batch_ids, valid, do_clustering=do_clustering, train=True,
            jitter_rng=key, mutable=["batch_stats"],
            plan=plan if plan else None,
        )
        total, _aux = loss_fn(
            out, labels, inst, centroid, pointnum, coords, valid,
            num_instances_cap=instance_cap, with_score=do_clustering,
        )
        return total, mut["batch_stats"]

    def step(params, stats, opt_state, st, p2v, coords, batch_ids, valid,
             labels, inst, centroid, pointnum, plan, key):
        local = jax.tree.map(
            lambda x: x[0],
            (st, p2v, coords, batch_ids, valid, labels, inst, centroid,
             pointnum, plan))
        key = jax.random.fold_in(key, jax.lax.axis_index("data"))
        (loss, new_stats), grads = jax.value_and_grad(
            local_loss, has_aux=True)(params, stats, *local, key)
        grads = jax.lax.pmean(grads, "data")
        new_stats = jax.lax.pmean(new_stats, "data")
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, new_stats, opt_state, jax.lax.psum(loss, "data")

    data = P("data")
    return jax.jit(
        shard_map(
            step,
            mesh=mesh,
            in_specs=(P(), P(), P(), data, data, data, data, data, data,
                      data, data, data, data, P()),
            out_specs=(P(), P(), P(), P()),
            check_vma=False,
        )
    )


def build_minkunet_dp_step_packed(
    model, optimizer: optax.GradientTransformation, mesh: Mesh,
    level_caps, num_classes: int = 20, ignore_label: int = 255,
) -> Callable:
    """Minimal-transfer MinkUNet DP step: each device receives only its
    compact wire batch (int16 coords / f16 feats / u8 labels,
    sparse/device_plan.pack_voxel_batch) and builds its own pyramid plan
    INSIDE the shard — plan construction is SPMD-local (no collectives), so
    the host link per device carries ~7.5 MB instead of ~250 MB of host
    plans. Grad/stat pmean and metric psum as in build_minkunet_dp_step.

    Call: step(params, stats, opt_state, c16, f16, l8, num)
      -> (params, stats, opt_state, summed_loss, summed_confusion);
    the four batch args are stacked per device (leading axis = mesh size)."""
    from seggroup_tpu.sparse.device_plan import (build_unet_plan_device,
                                                 unpack_voxel_batch)

    caps = tuple(level_caps)
    update = _minkunet_dp_core(model, optimizer, num_classes, ignore_label)

    def step(params, stats, opt_state, c16, f16, l8, num):
        st, labels = unpack_voxel_batch(c16[0], f16[0], l8[0], num[0])
        plan = build_unet_plan_device(st.coords, st.num, caps)
        return update(params, stats, opt_state, st, labels, plan)

    data = P("data")
    return jax.jit(
        shard_map(
            step,
            mesh=mesh,
            in_specs=(P(), P(), P(), data, data, data, data),
            out_specs=(P(), P(), P(), P(), P()),
            check_vma=False,
        )
    )


def build_pointgroup_dp_step_packed(
    model, optimizer: optax.GradientTransformation, mesh: Mesh,
    loss_fn: Callable, voxel_cap: int, level_caps,
    do_clustering: bool = False, instance_cap: int = 256,
    window_levels: int = 0,
) -> Callable:
    """Minimal-transfer PointGroup DP step: per-device compact wire batches
    (cli.stage2_pointgroup_common.pack_pg_batch) with the 7-level pyramid
    plan rebuilt inside each shard (SPMD-local, no collectives) — ~20 MB on
    the wire per device instead of ~140 MB with stacked host plans.

    window_levels defaults to 0 (no Pallas windowed-conv levels), matching
    pg_wire.unpack_pg_batch / host_voxelize_plan / bench: PG's skinny
    channels gain little from windows and the windowed program's compile
    OOMs the remote helper at the full 2^19 budget.

    Call: step(params, stats, opt_state, wire_dict, key)
      -> (params, stats, opt_state, summed_loss); every leaf of `wire_dict`
    is stacked per device (leading axis = mesh size)."""
    from seggroup_tpu.data.pg_wire import unpack_pg_batch

    caps = tuple(level_caps)

    def local_loss(params, stats, w, key):
        (st, p2v, coords, batch_ids, valid, labels, inst, centroid,
         pointnum, plan) = unpack_pg_batch(w, voxel_cap, caps,
                                           window_levels=window_levels)
        out, mut = model.apply(
            {"params": params, "batch_stats": stats}, st, p2v, coords,
            batch_ids, valid, do_clustering=do_clustering, train=True,
            jitter_rng=key, mutable=["batch_stats"], plan=plan,
        )
        total, _aux = loss_fn(
            out, labels, inst, centroid, pointnum, coords, valid,
            num_instances_cap=instance_cap, with_score=do_clustering,
        )
        return total, mut["batch_stats"]

    def step(params, stats, opt_state, w, key):
        w = jax.tree.map(lambda x: x[0], w)
        key = jax.random.fold_in(key, jax.lax.axis_index("data"))
        (loss, new_stats), grads = jax.value_and_grad(
            local_loss, has_aux=True)(params, stats, w, key)
        grads = jax.lax.pmean(grads, "data")
        new_stats = jax.lax.pmean(new_stats, "data")
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, new_stats, opt_state, jax.lax.psum(loss, "data")

    return jax.jit(
        shard_map(
            step,
            mesh=mesh,
            in_specs=(P(), P(), P(), P("data"), P()),
            out_specs=(P(), P(), P(), P()),
            check_vma=False,
        )
    )
