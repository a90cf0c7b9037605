"""PointGroup evaluation: proposals -> score/size thresholds -> NMS ->
ScanNet-benchmark mAP (CLI parity with reference pointgroup/test.py:64-204).

    python -m cli.stage2_test_pointgroup --synthetic 4 --exp_name pg
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from cli.stage1_common import SceneSource, add_common_args
from cli.stage2_pointgroup_common import (
    VALID_CLASS_IDS, make_pg_batch, scene_instance_tuple,
)
from seggroup_tpu.utils.logging import IOStream


def main():
    p = argparse.ArgumentParser("PointGroup eval (mAP)")
    add_common_args(p)
    p.add_argument("--voxel_size", type=float, default=0.02)
    p.add_argument("--point_cap", type=int, default=2 ** 17)
    p.add_argument("--voxel_cap", type=int, default=2 ** 16)
    p.add_argument("--instance_cap", type=int, default=256)
    p.add_argument("--score_thresh", type=float, default=0.09)
    p.add_argument("--npoint_thresh", type=int, default=100)
    p.add_argument("--nms_thresh", type=float, default=0.3)
    p.add_argument("--m", type=int, default=16)
    p.add_argument("--dump_dir", type=str, default=None,
                   help="write ScanNet-benchmark instance outputs: per scene "
                        "a <scene>.txt proposal list + predicted_masks/ 0/1 "
                        "mask files, plus semantic/<scene>.txt nyu40 preds "
                        "(reference pointgroup/test.py:130-159)")
    args = p.parse_args()

    import jax

    from seggroup_tpu.utils.jit_cache import enable_persistent_cache
    enable_persistent_cache()
    import jax.numpy as jnp

    from seggroup_tpu.eval.instance_ap import (
        assign_instances_for_scan, compute_averages, evaluate_matches,
        non_max_suppression,
    )
    from seggroup_tpu.models.pointgroup import IGNORE, PointGroup
    from seggroup_tpu.ops.voxelize import voxel_gather_mean, voxelize
    from seggroup_tpu.sparse.tensor import SparseTensor
    from seggroup_tpu.utils.checkpoint import CheckpointManager

    io = IOStream(os.path.join("checkpoints", args.exp_name, "pg_test.log"))
    source = SceneSource(args)
    model = PointGroup(classes=20, m=args.m, score_cap=args.voxel_cap // 8,
                       level_caps=[args.voxel_cap >> i for i in range(7)])

    matches = []
    fwd = None
    variables = None
    ckpt = CheckpointManager(os.path.join("checkpoints", args.exp_name,
                                          "pointgroup"))
    restored = ckpt.restore()

    for i in range(len(source)):
        scene, extras = source.get(i)
        tup = scene_instance_tuple(scene, extras, None, source.names[i])
        hb = make_pg_batch([tup], args.point_cap, args.instance_cap)
        ic = np.floor(hb.coords / args.voxel_size).astype(np.int32)
        ic -= ic.min(0)
        vm = voxelize(jnp.asarray(ic), jnp.asarray(hb.batch_ids),
                      jnp.asarray(hb.valid), args.voxel_cap)
        feats = jnp.concatenate([jnp.asarray(hb.feats),
                                 jnp.asarray(hb.coords)], axis=1)
        st = SparseTensor(vm.voxel_coords, voxel_gather_mean(feats, vm),
                          vm.voxel_valid, vm.num_voxels)
        if variables is None:
            if restored is not None:
                variables = {"params": restored["params"],
                             "batch_stats": restored["batch_stats"]}
                io.cprint(f"loaded checkpoint step {ckpt.latest_step()}")
            else:
                variables = jax.jit(
                    lambda r, st, p2v, c, b, v: model.init(
                        r, st, p2v, c, b, v, do_clustering=True, train=False,
                        jitter_rng=jax.random.PRNGKey(0))
                )(jax.random.PRNGKey(0), st, vm.point2voxel,
                  jnp.asarray(hb.coords), jnp.asarray(hb.batch_ids),
                  jnp.asarray(hb.valid))
                io.cprint("WARNING: no checkpoint, random weights")
            fwd = jax.jit(lambda v, st, p2v, c, b, pv: model.apply(
                v, st, p2v, c, b, pv, do_clustering=True, train=False))

        out = fwd(variables, st, vm.point2voxel, jnp.asarray(hb.coords),
                  jnp.asarray(hb.batch_ids), jnp.asarray(hb.valid))
        n = int(np.sum(hb.valid))
        sem20 = np.argmax(np.asarray(out.semantic_scores), axis=1)
        scores = 1 / (1 + np.exp(-np.asarray(out.scores)))
        pvalid = np.asarray(out.proposal_valid)
        prop = np.asarray(out.proposal_of_point)  # (2, N)
        p_total = pvalid.shape[0]

        masks, labels, confs = [], [], []
        for pid in range(p_total):
            if not pvalid[pid] or scores[pid] <= args.score_thresh:
                continue
            mask = ((prop[0] == pid) | (prop[1] == pid)) & hb.valid
            if mask.sum() < args.npoint_thresh:
                continue
            sem = np.bincount(sem20[mask], minlength=20).argmax()
            masks.append(mask)
            labels.append(VALID_CLASS_IDS[sem] if sem < 20 else 0)
            confs.append(scores[pid])
        if masks:
            masks = np.stack(masks)
            inter = (masks[:, None] & masks[None]).sum(-1).astype(np.float64)
            area = masks.sum(-1)
            union = area[:, None] + area[None] - inter
            ious = inter / np.maximum(union, 1)
            keep = non_max_suppression(ious, np.array(confs), args.nms_thresh)
            masks = masks[keep]
            labels = np.array(labels)[keep]
            confs = np.array(confs)[keep]
        else:
            masks = np.zeros((0, len(hb.valid)), bool)
            labels = np.zeros(0, np.int64)
            confs = np.zeros(0)

        if args.dump_dir:
            # benchmark-format dumps (reference test.py:130-159): proposal
            # list + one 0/1 mask file per kept proposal + semantic preds
            name = source.names[i]
            mask_dir = os.path.join(args.dump_dir, "instance",
                                    "predicted_masks")
            os.makedirs(mask_dir, exist_ok=True)
            os.makedirs(os.path.join(args.dump_dir, "semantic"), exist_ok=True)
            lines = []
            for pid in range(len(confs)):
                rel = f"predicted_masks/{name}_{pid:03d}.txt"
                lines.append(f"{rel} {labels[pid]} {confs[pid]:.4f}")
                np.savetxt(os.path.join(mask_dir, f"{name}_{pid:03d}.txt"),
                           masks[pid][: n].astype(np.int8), fmt="%d")
            with open(os.path.join(args.dump_dir, "instance",
                                   f"{name}.txt"), "w") as f:
                f.write("\n".join(lines))
            np.savetxt(os.path.join(args.dump_dir, "semantic", f"{name}.txt"),
                       np.array(VALID_CLASS_IDS)[sem20[: n]], fmt="%d")

        # GT ids = sem*1000 + instance index (benchmark encoding)
        inst = np.asarray(hb.instance_labels)
        gt_ids = np.where(
            inst != IGNORE, hb.sem_nyu40.astype(np.int64) * 1000 + inst,
            hb.sem_nyu40.astype(np.int64) * 1000,
        )
        gt_ids = np.where(hb.valid, gt_ids, 0)
        matches.append(assign_instances_for_scan(masks, labels, confs, gt_ids))
        io.cprint(f"[{i+1}/{len(source)}] {source.names[i]}: "
                  f"{len(confs)} proposals kept")

    aps = evaluate_matches(matches)
    avg = compute_averages(aps)
    io.cprint("AP %.3f  AP50 %.3f  AP25 %.3f"
              % (avg["all_ap"], avg["all_ap_50%"], avg["all_ap_25%"]))
    for k, v in avg["classes"].items():
        io.cprint("  %-16s ap %.3f  ap50 %.3f" % (k, v["ap"], v["ap50%"]))


if __name__ == "__main__":
    main()
