"""Compact wire format for PointGroup batches (the minimal-transfer path).

Ships ~20 MB at 2^19 points instead of ~140 MB with the host-built 7-level
plan — the plan is rebuilt on device bit-equal (sparse/device_plan.py).
Host still voxelizes (C++); the voxel ids ride along as int16 coords +
int32 point2voxel. Used by the single-device trainer
(cli/stage2_train_pointgroup.py --plan_mode device) and the packed DP step
(parallel/dp.py build_pointgroup_dp_step_packed).
"""

from __future__ import annotations

import numpy as np


def pack_pg_batch(hb, vcoords, num, p2v):
    """hb: any batch with coords/feats/batch_ids/valid/labels/
    instance_labels/instance_centroid/instance_pointnum arrays
    (cli.stage2_pointgroup_common.PGHostBatch)."""
    if len(vcoords) and (vcoords.max() >= 32000 or vcoords.min() < 0):
        raise ValueError("voxel coords exceed int16 wire range")
    return {
        "vcoords": vcoords.astype(np.int16),
        "num": np.int32(num),
        "p2v": p2v.astype(np.int32),
        "coords": hb.coords.astype(np.float32),
        "feats": hb.feats.astype(np.float16),
        "batch_ids": hb.batch_ids.astype(np.uint8),
        "nvalid": np.int32(hb.valid.sum()),
        "labels": hb.labels.astype(np.int8),       # IGNORE=-100, classes 0..19
        "inst": hb.instance_labels.astype(np.int16),
        "centroid": hb.instance_centroid.astype(np.float32),
        "pointnum": hb.instance_pointnum.astype(np.int32),
    }


def unpack_pg_batch(w, voxel_cap: int, level_caps, window_levels: int = 0):
    """Device-side inverse of pack_pg_batch (call under jit). Returns
    (st, p2v, coords, batch_ids, valid, labels, inst, centroid, pointnum,
    plan) matching the host to_device layout, with the pyramid plan built on
    device."""
    import jax.numpy as jnp

    from seggroup_tpu.ops.voxelize import VoxelMap, voxel_gather_mean
    from seggroup_tpu.sparse.device_plan import build_unet_plan_device
    from seggroup_tpu.sparse.tensor import SparseTensor

    num = jnp.int32(w["num"])
    vcoords = w["vcoords"].astype(jnp.int32)
    vm = VoxelMap(vcoords, w["p2v"],
                  jnp.arange(voxel_cap) < num, num)
    coords = w["coords"]
    feats = jnp.concatenate([w["feats"].astype(jnp.float32), coords], axis=1)
    st = SparseTensor(vm.voxel_coords, voxel_gather_mean(feats, vm),
                      vm.voxel_valid, vm.num_voxels)
    valid = jnp.arange(coords.shape[0]) < jnp.int32(w["nvalid"])
    plan = build_unet_plan_device(vcoords, num, tuple(level_caps),
                                  window_levels=window_levels)
    return (st, vm.point2voxel, coords, w["batch_ids"].astype(jnp.int32),
            valid, w["labels"].astype(jnp.int32), w["inst"].astype(jnp.int32),
            w["centroid"], w["pointnum"], plan)
