"""Semantic segmentation evaluation for the stage-2 backbones.

MinkUNet: full-scene voxel inference, voxel->point upsampling, confusion-
matrix mIoU (reference minkowski/lib/test.py:57-191 + the full-pointcloud
eval of lib/datasets/scannet.py:126-167).
KPConv: repeated in-radius sphere inference with EMA vote smoothing
0.95*old + 0.05*new (reference kpconv/utils/tester.py:742,908), then mIoU.

    python -m cli.stage2_test_semantic --model minkunet --synthetic 4
    python -m cli.stage2_test_semantic --model kpconv --synthetic 4 --votes 3
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from cli.stage1_common import SceneSource, add_common_args
from cli.stage2_train_minkunet import (NYU40_TO_20, VALID_CLASS_IDS,
                                       scene_to_training_tuple)
from seggroup_tpu.utils.logging import IOStream, CLASS_NAMES_20


def main():
    p = argparse.ArgumentParser("stage-2 semantic eval (mIoU)")
    add_common_args(p)
    p.add_argument("--model", type=str, default="minkunet",
                   choices=["minkunet", "kpconv"])
    p.add_argument("--variant", type=str, default="Res16UNet34C")
    p.add_argument("--voxel_size", type=float, default=0.02)
    p.add_argument("--capacity", type=int, default=2 ** 17)
    p.add_argument("--point_cap", type=int, default=2 ** 15)
    p.add_argument("--first_features_dim", type=int, default=64)
    p.add_argument("--dl0", type=float, default=0.04)
    p.add_argument("--in_radius", type=float, default=2.0)
    p.add_argument("--votes", type=int, default=3)
    p.add_argument("--num_classes", type=int, default=20)
    p.add_argument("--dump_dir", type=str, default=None,
                   help="write per-scene nyu40 prediction .txt files "
                        "(reference lib/test.py:120-160 save_predictions "
                        "/ pointgroup test.py:132-137 save_semantic)")
    args = p.parse_args()

    import jax

    from seggroup_tpu.utils.jit_cache import enable_persistent_cache
    enable_persistent_cache()
    import jax.numpy as jnp

    from seggroup_tpu.eval.semantic import average_precision, miou_from_confusion
    from seggroup_tpu.utils.checkpoint import CheckpointManager

    io = IOStream(os.path.join("checkpoints", args.exp_name,
                               f"{args.model}_test.log"))
    source = SceneSource(args)
    hist = np.zeros((args.num_classes, args.num_classes), np.int64)
    ap_rows = []  # per-scene per-class AP, nanmean'd like reference test.py:143
    nyu40_of = np.array(VALID_CLASS_IDS, np.int64)

    def dump_and_score(name, probs_pts, lab_pts, ok):
        """Shared tail per scene: per-class AP row + optional prediction dump."""
        if ok.any():
            ap_rows.append(average_precision(probs_pts[ok], lab_pts[ok],
                                             args.num_classes, ignore=255))
        if args.dump_dir:
            os.makedirs(args.dump_dir, exist_ok=True)
            pred20 = probs_pts.argmax(1)
            np.savetxt(os.path.join(args.dump_dir, f"{name}.txt"),
                       nyu40_of[pred20], fmt="%d")

    if args.model == "minkunet":
        from seggroup_tpu.data.voxel_dataset import make_voxel_batch
        from seggroup_tpu.models.minkunet import make_minkunet
        from seggroup_tpu.sparse.tensor import SparseTensor

        caps = [args.capacity, args.capacity // 2, args.capacity // 4,
                args.capacity // 8, args.capacity // 8]
        model = make_minkunet(args.variant, out_channels=args.num_classes,
                              level_caps=caps)
        ckpt = CheckpointManager(os.path.join("checkpoints", args.exp_name,
                                              "minkunet"))
        restored = ckpt.restore()
        fwd = jax.jit(lambda v, st: model.apply(v, st, train=False))
        variables = None
        for i in range(len(source)):
            scene, extras = source.get(i)
            c, col, lab = scene_to_training_tuple(scene, extras, None,
                                                  source.names[i], False)
            vb = make_voxel_batch([(c, col, lab)], args.capacity,
                                  args.voxel_size)
            st = SparseTensor(jnp.asarray(vb.coords), jnp.asarray(vb.feats),
                              jnp.asarray(vb.valid), jnp.asarray(vb.num))
            if variables is None:
                if restored is not None:
                    variables = {"params": restored["params"],
                                 "batch_stats": restored["batch_stats"]}
                    io.cprint(f"loaded checkpoint {ckpt.latest_step()}")
                else:
                    variables = jax.jit(lambda r, s: model.init(r, s, train=False))(
                        jax.random.PRNGKey(0), st)
                    io.cprint("WARNING: random weights")
            logits = np.asarray(fwd(variables, st))
            vox_pred = logits.argmax(1)
            # voxel -> point (full-pointcloud eval); p2v == -1 marks points
            # whose voxel overflowed capacity — excluded, not mis-scored
            p2v = vb.point2voxel[0]
            lab_pts = lab[: len(p2v)]
            ok = (lab_pts != 255) & (p2v >= 0)
            dropped = int((p2v < 0).sum())
            pred_pts = vox_pred[np.where(p2v >= 0, p2v, 0)]
            np.add.at(hist, (lab_pts[ok], pred_pts[ok]), 1)
            sm = np.exp(logits - logits.max(1, keepdims=True))
            sm /= sm.sum(1, keepdims=True)
            probs_pts = sm[np.where(p2v >= 0, p2v, 0)]
            dump_and_score(source.names[i], probs_pts, lab_pts, ok)
            io.cprint(f"[{i+1}/{len(source)}] {source.names[i]}"
                      + (f"  ({dropped} pts over capacity excluded)"
                         if dropped else ""))
    else:
        from seggroup_tpu.data.potentials import PotentialSampler
        from seggroup_tpu.models.kpconv import KPFCNN, build_pyramid

        n_cap = args.point_cap
        caps = [n_cap // 2, n_cap // 4, n_cap // 8, n_cap // 16]
        model = KPFCNN(num_classes=args.num_classes,
                       first_features_dim=args.first_features_dim,
                       dl0=args.dl0)
        ckpt = CheckpointManager(os.path.join("checkpoints", args.exp_name,
                                              "kpconv"))
        restored = ckpt.restore()
        rng = np.random.default_rng(0)

        @jax.jit
        def fwd(v, pts, bids, valid, feats):
            pyr = build_pyramid(pts, bids, valid, 5, args.dl0, level_caps=caps)
            logits, _ = model.apply(v, pyr, feats, train=False)
            return logits

        variables = None
        for i in range(len(source)):
            scene, extras = source.get(i)
            c, col, lab = scene_to_training_tuple(scene, extras, None,
                                                  source.names[i], False)
            probs = np.zeros((len(c), args.num_classes), np.float32)
            counts = np.zeros(len(c), np.int32)
            # min-potential centers until every point is voted `votes` times
            # (reference tester.py:788,990 loops until
            # min(min_potentials) > num_votes) — guarantees 100% coverage,
            # unlike random centers
            sampler = PotentialSampler([c], in_radius=args.in_radius, seed=0)
            max_spheres = args.votes * 64
            for _v in range(max_spheres):
                if sampler.min_potential() >= args.votes:
                    break
                _, center = sampler.next_center()
                sel = np.where(((c - center) ** 2).sum(1) < args.in_radius ** 2)[0]
                if len(sel) > n_cap:
                    sel = sel[rng.permutation(len(sel))[:n_cap]]
                pts = np.zeros((n_cap, 3), np.float32)
                feats = np.ones((n_cap, 4), np.float32)
                pts[: len(sel)] = c[sel]
                feats[: len(sel), 1:] = col[sel] / 255.0
                valid = np.zeros(n_cap, bool); valid[: len(sel)] = True
                if variables is None:
                    if restored is not None:
                        variables = {"params": restored["params"],
                                     "batch_stats": restored["batch_stats"]}
                        io.cprint(f"loaded checkpoint {ckpt.latest_step()}")
                    else:
                        pyr0 = jax.jit(lambda p, b, v: build_pyramid(
                            p, b, v, 5, args.dl0, level_caps=caps))(
                            jnp.asarray(pts), jnp.zeros(n_cap, jnp.int32),
                            jnp.asarray(valid))
                        variables = jax.jit(
                            lambda r, py, f: model.init(r, py, f, train=False)
                        )(jax.random.PRNGKey(0), pyr0, jnp.asarray(feats))
                        io.cprint("WARNING: random weights")
                logits = np.asarray(fwd(variables, jnp.asarray(pts),
                                        jnp.zeros(n_cap, jnp.int32),
                                        jnp.asarray(valid),
                                        jnp.asarray(feats)))[: len(sel)]
                sm = np.exp(logits - logits.max(1, keepdims=True))
                sm /= sm.sum(1, keepdims=True)
                # EMA vote smoothing (reference tester.py:742)
                probs[sel] = 0.95 * probs[sel] + 0.05 * sm
                counts[sel] += 1
            pred = probs.argmax(1)
            ok = (lab != 255) & (counts > 0)
            np.add.at(hist, (lab[ok], pred[ok]), 1)
            # EMA accumulation leaves per-point scale 1 - 0.95^votes, which
            # would bias the cross-point ranking AP depends on; renormalize
            # rows to sum 1 (argmax/mIoU unaffected)
            row_sum = probs.sum(1, keepdims=True)
            probs_n = np.divide(probs, row_sum, out=np.zeros_like(probs),
                                where=row_sum > 0)
            dump_and_score(source.names[i], probs_n, lab, ok)
            io.cprint(f"[{i+1}/{len(source)}] {source.names[i]} "
                      f"(coverage {100*np.mean(counts>0):.0f}%)")

    miou, per_class = miou_from_confusion(hist)
    import warnings
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", category=RuntimeWarning)
        ap_class = (np.nanmean(np.stack(ap_rows), 0) if ap_rows
                    else np.full(args.num_classes, np.nan))
    io.cprint("mIoU: %.2f%%  mAP: %.2f%%"
              % (100 * miou, 100 * np.nanmean(ap_class)))
    io.cprint("  %-16s %8s %8s" % ("class", "IoU", "AP"))
    for name, iou, ap in zip(CLASS_NAMES_20, per_class, ap_class):
        io.cprint("  %-16s %7.2f%% %7.2f%%" % (name, 100 * iou, 100 * ap))


if __name__ == "__main__":
    main()
