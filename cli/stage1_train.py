"""Stage-1 training driver (CLI parity with reference seggroup/train.py):
trains the SegGroup GNN with data parallelism (1 scene/device over the mesh,
psum'd metrics, DDP-style pmean'd grads).

    python -m cli.stage1_train --label_style manual --epochs 6 --use_sgd
    python -m cli.stage1_train --synthetic 16 --epochs 2   # no-data demo
"""

from __future__ import annotations

import argparse
import os
import time

import jax
import numpy as np

from cli.stage1_common import (dump_config, SceneSource, add_common_args,
                               batches, should_stop)
from seggroup_tpu.models.seggroup import SegGroupGNN
from seggroup_tpu.parallel.dp import (
    build_stage1_train_step, make_mesh, make_optimizer, replicate, shard_batch,
)
from seggroup_tpu.utils.checkpoint import CheckpointManager
from seggroup_tpu.utils.logging import IOStream


def main():
    p = argparse.ArgumentParser("stage-1 SegGroup GNN training")
    add_common_args(p)
    p.add_argument("--epochs", type=int, default=6)
    p.add_argument("--lr", type=float, default=0.001)
    p.add_argument("--momentum", type=float, default=0.9)
    p.add_argument("--use_sgd", action="store_true")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--cluster_cap", type=int, default=1024)
    p.add_argument("--knn_window", type=int, default=8192,
                   help="cluster-kNN Morton-window budget; set both caps to "
                        "num_points for the exact (reference-semantics) path "
                        "on scenes with over-budget clusters — see "
                        "scripts/stage1_exact_divergence.py")
    args = p.parse_args()

    io = IOStream(os.path.join("checkpoints", args.exp_name, "run.log"))
    from seggroup_tpu.utils.tb import ScalarWriter
    tb = ScalarWriter(os.path.join("checkpoints", args.exp_name, "tb"),
                      enabled=args.tensorboard)
    dump_config(args, "stage1_train")
    mesh = make_mesh(args.num_devices)
    n_dev = mesh.devices.size
    io.cprint(f"mesh: {n_dev} devices ({mesh.devices.ravel()[0].platform})")

    source = SceneSource(args)
    io.cprint(f"scenes: {len(source)}")

    model = SegGroupGNN(cluster_cap=args.cluster_cap,
                        knn_window=args.knn_window,
                        sequential=not args.parallel_grouping,
                        fast_knn=args.fast_knn)
    scene0, _ = source.get(0)
    import jax.numpy as jnp
    scene0 = jax.tree.map(jnp.asarray, scene0)
    # jitted init: eager init is minutes through the axon remote tunnel
    variables = jax.jit(
        lambda r1, r2, s: model.init({"params": r1, "dropout": r2}, s,
                                     mode="train", train=True)
    )(jax.random.PRNGKey(args.seed), jax.random.PRNGKey(args.seed + 1), scene0)
    params, stats = variables["params"], variables["batch_stats"]
    n_params = sum(x.size for x in jax.tree.leaves(params))
    io.cprint(f"Network parameters: {n_params}")

    opt = make_optimizer("sgd" if args.use_sgd else "adam", lr=args.lr,
                         momentum=args.momentum)
    opt_state = opt.init(params)

    ckpt = CheckpointManager(
        os.path.join("checkpoints", args.exp_name, "models"),
        max_to_keep=args.epochs + 1,
    )
    start_epoch = 0
    if args.resume:
        restored = ckpt.restore(template={
            "params": params, "opt_state": opt_state, "batch_stats": stats})
        if restored is not None:
            params = restored["params"]
            opt_state = restored["opt_state"]
            stats = restored["batch_stats"]
            start_epoch = ckpt.latest_step()
            io.cprint(f"resumed from epoch {start_epoch}")

    step_fn = build_stage1_train_step(model, opt, mesh)
    params = replicate(mesh, params)
    opt_state = replicate(mesh, opt_state)
    stats = replicate(mesh, stats)
    rng = jax.random.PRNGKey(args.seed + 2)

    for epoch in range(start_epoch, args.epochs):
        order = np.random.default_rng(args.seed + epoch).permutation(len(source))
        train_loss, nstep = 0.0, 0
        i_sem = np.zeros(40); u_sem = np.zeros(40)
        i_ins = np.zeros(40); u_ins = np.zeros(40)
        acc_all = np.zeros(4)
        t0 = time.time()
        for names, batch, _extras in batches(source, n_dev, order):
            batch = shard_batch(mesh, batch)
            rng, sub = jax.random.split(rng)
            params, opt_state, stats, metrics = step_fn(
                params, opt_state, stats, batch, sub
            )
            nstep += 1
            train_loss += float(metrics["loss"]) / n_dev
            iou_sem = np.asarray(metrics["iou_sem"])
            iou_ins = np.asarray(metrics["iou_ins"])
            i_sem += iou_sem[0]; u_sem += iou_sem[1]
            i_ins += iou_ins[0]; u_ins += iou_ins[1]
            acc_all += np.asarray(metrics["acc"]) / n_dev
            with np.errstate(invalid="ignore", divide="ignore"):
                miou_s = np.nanmean(np.where(u_sem > 0, i_sem / u_sem, np.nan))
                miou_i = np.nanmean(np.where(u_ins > 0, i_ins / u_ins, np.nan))
            io.cprint(
                "Epoch[%d/%d](%04d/%04d)  Loss: %.6f  Ins mIoU: %.2f%%  "
                "Sem mIoU: %.2f%%  Ins Acc: %.2f%%  Sem Acc: %.2f%%  (%.2fs/step)"
                % (epoch + 1, args.epochs, nstep * n_dev, len(source),
                   train_loss / nstep, 100 * miou_i, 100 * miou_s,
                   100 * acc_all[1] / nstep, 100 * acc_all[0] / nstep,
                   (time.time() - t0) / nstep)
            )
        tb.add_scalar("train/loss", train_loss / max(nstep, 1), epoch + 1)
        tb.add_scalar("train/sem_miou", 100 * miou_s, epoch + 1)
        tb.add_scalar("train/ins_miou", 100 * miou_i, epoch + 1)
        ckpt.save(epoch + 1, {
            "params": jax.device_get(params),
            "opt_state": jax.device_get(opt_state),
            "batch_stats": jax.device_get(stats),
        })
        io.cprint(f"==> saved checkpoint epoch {epoch + 1}")
        if should_stop(args.exp_name):
            io.cprint("STOP file found — exiting after checkpoint save")
            break


if __name__ == "__main__":
    main()
