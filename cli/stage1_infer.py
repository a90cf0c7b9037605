"""Stage-1 pseudo-label inference (CLI parity with reference seggroup/infer.py):
loads the trained GNN, runs `sem_infer` or `ins_infer` over the train split,
and writes per-scene label files under results/<exp>/<scene>/<mode>/ in the
reference's format (one int per line, aligned to original mesh vertices).

    python -m cli.stage1_infer --sem_infer --exp_name exp
    python -m cli.stage1_infer --ins_infer --synthetic 8
"""

from __future__ import annotations

import argparse
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from cli.stage1_common import dump_config, SceneSource, add_common_args, batches, export_scene
from seggroup_tpu.models.seggroup import SegGroupGNN
from seggroup_tpu.parallel.dp import (
    build_stage1_infer_step, make_mesh, replicate, shard_batch,
)
from seggroup_tpu.utils.checkpoint import CheckpointManager
from seggroup_tpu.utils.logging import IOStream


def main():
    p = argparse.ArgumentParser("stage-1 pseudo-label inference")
    add_common_args(p)
    p.add_argument("--sem_infer", action="store_true")
    p.add_argument("--ins_infer", action="store_true")
    p.add_argument("--results_root", type=str, default="results")
    p.add_argument("--cluster_cap", type=int, default=1024)
    p.add_argument("--knn_window", type=int, default=8192,
                   help="cluster-kNN Morton-window budget; set both caps to "
                        "num_points for the exact (reference-semantics) path "
                        "on scenes with over-budget clusters — see "
                        "scripts/stage1_exact_divergence.py")
    args = p.parse_args()
    assert args.sem_infer != args.ins_infer, "pick exactly one of --sem_infer/--ins_infer"
    mode = "sem_infer" if args.sem_infer else "ins_infer"

    io = IOStream(os.path.join("checkpoints", args.exp_name, "infer.log"))
    dump_config(args, "stage1_infer")
    mesh = make_mesh(args.num_devices)
    n_dev = mesh.devices.size
    source = SceneSource(args)

    model = SegGroupGNN(cluster_cap=args.cluster_cap,
                        knn_window=args.knn_window,
                        sequential=not args.parallel_grouping,
                        fast_knn=args.fast_knn)
    scene0, _ = source.get(0)
    scene0 = jax.tree.map(jnp.asarray, scene0)
    variables = jax.jit(
        lambda r1, r2, s: model.init({"params": r1, "dropout": r2}, s,
                                     mode="train", train=True)
    )(jax.random.PRNGKey(0), jax.random.PRNGKey(1), scene0)
    params, stats = variables["params"], variables["batch_stats"]
    ckpt = CheckpointManager(os.path.join("checkpoints", args.exp_name, "models"))
    restored = ckpt.restore()  # untyped pytree; flax accepts plain dicts
    if restored is not None:
        params, stats = restored["params"], restored["batch_stats"]
        io.cprint(f"loaded checkpoint epoch {ckpt.latest_step()}")
    else:
        io.cprint("WARNING: no checkpoint found, using random init")

    infer_fn = build_stage1_infer_step(model, mesh, mode=mode)
    var_r = replicate(mesh, {"params": params, "batch_stats": stats})

    results_root = os.path.join(args.results_root, args.exp_name)
    i_sem = np.zeros(40); u_sem = np.zeros(40)
    i_ins = np.zeros(40); u_ins = np.zeros(40)
    order = np.arange(len(source))
    t0 = time.time()
    done = 0
    over_budget = 0
    for names, batch, extras in batches(source, n_dev, order):
        out = jax.device_get(infer_fn(var_r, shard_batch(mesh, batch)))
        for row, name in enumerate(names):
            export_scene(results_root, name, mode, out, extras[row], row)
            i_sem += out.iou_sem[row, 0]; u_sem += out.iou_sem[row, 1]
            i_ins += out.iou_ins[row, 0]; u_ins += out.iou_ins[row, 1]
            # loud budget accounting: binding budgets flip threshold merges
            # (docs/ARCHITECTURE.md deviations #2-3) — point at the exact path
            mseg = int(np.asarray(out.max_segment_size).reshape(-1)[row])
            mclu = int(np.asarray(out.max_cluster_size).reshape(-1)[row])
            if mseg > args.cluster_cap or mclu > args.knn_window:
                over_budget += 1
                io.cprint(
                    f"WARNING: {name} exceeds a static budget (largest "
                    f"segment {mseg} vs --cluster_cap {args.cluster_cap}; "
                    f"largest cluster {mclu} vs --knn_window "
                    f"{args.knn_window}) — labels are approximate; re-run "
                    f"this scene with budgets >= those sizes for the exact "
                    f"reference-semantics path")
        done += len(names)
        with np.errstate(invalid="ignore", divide="ignore"):
            miou_s = np.nanmean(np.where(u_sem > 0, i_sem / u_sem, np.nan))
            miou_i = np.nanmean(np.where(u_ins > 0, i_ins / u_ins, np.nan))
        io.cprint(
            "[%s] (%04d/%04d)  Sem mIoU: %.2f%%  Ins mIoU: %.2f%%  (%.2fs/scene)"
            % (mode, done, len(source), 100 * miou_s, 100 * miou_i,
               (time.time() - t0) / done)
        )
    if over_budget:
        io.cprint(f"WARNING: {over_budget}/{len(source)} scenes exceeded a "
                  f"static budget (see per-scene warnings above)")
    io.cprint(f"wrote pseudo labels under {results_root}/<scene>/{mode}/")


if __name__ == "__main__":
    main()
