"""Stage-2 instance segmentation training: PointGroup on pseudo labels
(CLI parity with reference pointgroup/train.py + config/pointgroup_run2_
scannet.yaml: 384 epochs, clustering+ScoreNet after prepare_epochs=128, Adam
lr 1e-3 with the reference's step decay lr = base * multiplier^(it //
step_size) clipped at 1e-6 (reference util/utils.py:25-29; run2 yaml uses
step_epoch=384, multiplier=0.5), plus held-out validation with
best-checkpoint retention.

    python -m cli.stage2_train_pointgroup --synthetic 8 --steps 50
    python -m cli.stage2_train_pointgroup --data_root ... --pseudo_root results/exp
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np

from cli.stage1_common import should_stop, dump_config, SceneSource, add_common_args
from cli.stage2_pointgroup_common import make_pg_batch, scene_instance_tuple
from seggroup_tpu.utils.logging import IOStream


def main():
    p = argparse.ArgumentParser("stage-2 PointGroup training")
    add_common_args(p)
    p.add_argument("--pseudo_root", type=str, default=None)
    p.add_argument("--voxel_size", type=float, default=0.02)
    p.add_argument("--point_cap", type=int, default=2 ** 17)
    p.add_argument("--voxel_cap", type=int, default=2 ** 16)
    p.add_argument("--instance_cap", type=int, default=256)
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--lr_step_size", type=int, default=120000,
                   help="steps per decay step (reference step_epoch=384 of "
                        "384 epochs, i.e. one decay interval over the run)")
    p.add_argument("--lr_multiplier", type=float, default=0.5)
    p.add_argument("--steps", type=int, default=120000)
    p.add_argument("--val_frac", type=float, default=0.1)
    p.add_argument("--prepare_steps", type=int, default=40000,
                   help="steps before clustering+ScoreNet kick in "
                        "(reference prepare_epochs=128 of 384)")
    p.add_argument("--save_freq", type=int, default=2000)
    p.add_argument("--m", type=int, default=16)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from seggroup_tpu.models.pointgroup import PointGroup, pointgroup_loss
    from seggroup_tpu.ops.voxelize import voxel_gather_mean, voxelize
    from seggroup_tpu.sparse.tensor import SparseTensor
    from seggroup_tpu.utils.checkpoint import CheckpointManager

    io = IOStream(os.path.join("checkpoints", args.exp_name, "pointgroup.log"))
    from seggroup_tpu.utils.tb import ScalarWriter
    tb = ScalarWriter(os.path.join("checkpoints", args.exp_name, "tb"),
                      enabled=args.tensorboard)
    dump_config(args, "stage2_pointgroup")
    source = SceneSource(args)
    n_val = int(len(source) * args.val_frac)
    if args.val_frac > 0 and n_val == 0 and len(source) > 1:
        n_val = 1
    val_idx = list(range(len(source) - n_val, len(source)))
    train_idx = list(range(len(source) - n_val)) or val_idx
    io.cprint(f"scenes: {len(train_idx)} train / {len(val_idx)} val")
    rng = np.random.default_rng(args.seed)

    model = PointGroup(classes=20, m=args.m, score_cap=args.voxel_cap // 8,
                       level_caps=[args.voxel_cap >> i for i in range(7)])

    def sample_batch(idx_pool=None, augment=True):
        pool = train_idx if idx_pool is None else idx_pool
        idx = [pool[int(j)] for j in
               rng.integers(0, len(pool), size=args.batch_size)]
        tuples = []
        for i in idx:
            scene, extras = source.get(int(i))
            tuples.append(scene_instance_tuple(
                scene, extras, args.pseudo_root, source.names[int(i)]))
        return make_pg_batch(tuples, args.point_cap, args.instance_cap,
                             rng=rng, augment=augment)

    def to_device(hb):
        ic = np.floor(hb.coords / args.voxel_size).astype(np.int32)
        ic -= ic.min(0)
        vm = voxelize(jnp.asarray(ic), jnp.asarray(hb.batch_ids),
                      jnp.asarray(hb.valid), args.voxel_cap)
        feats = jnp.concatenate(
            [jnp.asarray(hb.feats), jnp.asarray(hb.coords)], axis=1
        )  # use_coords=True (run2 yaml)
        vfeats = voxel_gather_mean(feats, vm)
        st = SparseTensor(vm.voxel_coords, vfeats, vm.voxel_valid,
                          vm.num_voxels)
        return st, vm.point2voxel

    hb = sample_batch()
    st0, p2v0 = to_device(hb)
    # init with clustering ON so the ScoreNet branch params exist from step 1
    variables = jax.jit(
        lambda r, st, p2v, c, b, v: model.init(
            r, st, p2v, c, b, v, do_clustering=True, train=True,
            jitter_rng=jax.random.PRNGKey(0))
    )(jax.random.PRNGKey(args.seed), st0, p2v0, jnp.asarray(hb.coords),
      jnp.asarray(hb.batch_ids), jnp.asarray(hb.valid))
    params, stats = variables["params"], variables["batch_stats"]
    io.cprint("Network parameters: %.2fM"
              % (sum(x.size for x in jax.tree.leaves(params)) / 1e6))

    def schedule(step):
        # reference step_learning_rate (util/utils.py:25-29)
        lr = args.lr * (args.lr_multiplier ** (step // args.lr_step_size))
        return jnp.maximum(lr, 1e-6)

    opt = optax.adam(schedule)
    opt_state = opt.init(params)
    ckpt = CheckpointManager(os.path.join("checkpoints", args.exp_name,
                                          "pointgroup"))
    best_ckpt = CheckpointManager(os.path.join("checkpoints", args.exp_name,
                                               "pointgroup_best"))

    def make_step(do_clustering):
        @jax.jit
        def step(params, stats, opt_state, st, p2v, coords, batch_ids, valid,
                 labels, inst, centroid, pointnum, key):
            def loss_fn(p):
                out, mut = model.apply(
                    {"params": p, "batch_stats": stats}, st, p2v, coords,
                    batch_ids, valid, do_clustering=do_clustering, train=True,
                    jitter_rng=key, mutable=["batch_stats"],
                )
                total, aux = pointgroup_loss(
                    out, labels, inst, centroid, pointnum, coords, valid,
                    num_instances_cap=args.instance_cap,
                    with_score=do_clustering,
                )
                return total, (aux, mut["batch_stats"])

            (loss, (aux, new_stats)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params)
            updates, opt_state = opt.update(grads, opt_state)
            params = optax.apply_updates(params, updates)
            return params, new_stats, opt_state, loss, aux

        return step

    @jax.jit
    def val_loss_step(params, stats, st, p2v, coords, batch_ids, valid,
                      labels, inst, centroid, pointnum):
        out = model.apply({"params": params, "batch_stats": stats}, st, p2v,
                          coords, batch_ids, valid, do_clustering=False,
                          train=False)
        total, _ = pointgroup_loss(out, labels, inst, centroid, pointnum,
                                   coords, valid,
                                   num_instances_cap=args.instance_cap,
                                   with_score=False)
        return total

    def validate():
        losses = []
        for j in range(max(1, len(val_idx) // args.batch_size)):
            hb = sample_batch(val_idx, augment=False)
            st, p2v = to_device(hb)
            losses.append(float(val_loss_step(
                params, stats, st, p2v, jnp.asarray(hb.coords),
                jnp.asarray(hb.batch_ids), jnp.asarray(hb.valid),
                jnp.asarray(hb.labels), jnp.asarray(hb.instance_labels),
                jnp.asarray(hb.instance_centroid),
                jnp.asarray(hb.instance_pointnum))))
        return float(np.mean(losses))

    steps = {False: make_step(False), True: make_step(True)}
    # data parallelism over a device mesh (--num_devices > 1): one voxelized
    # batch per device through parallel/dp.py (reference is single-GPU)
    n_dev = len(jax.devices()) if args.num_devices is None else args.num_devices
    dp_steps = None
    if n_dev > 1:
        from seggroup_tpu.parallel.dp import (build_pointgroup_dp_step,
                                              make_mesh, replicate,
                                              shard_batch)

        dp_mesh = make_mesh(n_dev)
        dp_steps = {
            c: build_pointgroup_dp_step(model, opt, dp_mesh, pointgroup_loss,
                                        do_clustering=c,
                                        instance_cap=args.instance_cap)
            for c in (False, True)
        }
        params = replicate(dp_mesh, params)
        stats = replicate(dp_mesh, stats)
        opt_state = replicate(dp_mesh, opt_state)
        io.cprint(f"data parallel over {n_dev} devices")

    key = jax.random.PRNGKey(args.seed + 1)
    best_val = float("inf")
    t0 = time.time()
    for it in range(1, args.steps + 1):
        key, sub = jax.random.split(key)
        clustering = it > args.prepare_steps
        if dp_steps is not None:
            cols = []
            for _ in range(n_dev):
                hb = sample_batch()
                st, p2v = to_device(hb)
                cols.append((st, p2v, jnp.asarray(hb.coords),
                             jnp.asarray(hb.batch_ids), jnp.asarray(hb.valid),
                             jnp.asarray(hb.labels),
                             jnp.asarray(hb.instance_labels),
                             jnp.asarray(hb.instance_centroid),
                             jnp.asarray(hb.instance_pointnum)))
            batched = jax.tree.map(lambda *xs: jnp.stack(xs), *cols)
            params, stats, opt_state, loss = dp_steps[clustering](
                params, stats, opt_state,
                *(shard_batch(dp_mesh, x) for x in batched), sub)
            loss = loss / n_dev
            aux = {}
        else:
            hb = sample_batch()
            st, p2v = to_device(hb)
            params, stats, opt_state, loss, aux = steps[clustering](
                params, stats, opt_state, st, p2v, jnp.asarray(hb.coords),
                jnp.asarray(hb.batch_ids), jnp.asarray(hb.valid),
                jnp.asarray(hb.labels), jnp.asarray(hb.instance_labels),
                jnp.asarray(hb.instance_centroid),
                jnp.asarray(hb.instance_pointnum), sub,
            )
        if it % 10 == 0 or it == args.steps:
            parts = "  ".join(f"{k} {float(v):.4f}" for k, v in aux.items())
            io.cprint("step %d/%d  loss %.4f  %s  (%.2fs/it)"
                      % (it, args.steps, float(loss), parts,
                         (time.time() - t0) / it))
            tb.add_scalar("train/loss", float(loss), it)
            for k, v in aux.items():
                tb.add_scalar(f"train/{k}", float(v), it)
        if should_stop(args.exp_name):
            io.cprint('STOP file found — saving and exiting')
            ckpt.save(it, {"params": jax.device_get(params),
                           "batch_stats": jax.device_get(stats)})
            break
        if it % args.save_freq == 0 or it == args.steps:
            ckpt.save(it, {"params": jax.device_get(params),
                           "batch_stats": jax.device_get(stats)})
            vl = validate()
            marker = ""
            if vl < best_val:
                best_val = vl
                best_ckpt.save(it, {"params": jax.device_get(params),
                                    "batch_stats": jax.device_get(stats)})
                marker = "  (new best)"
            io.cprint(f"==> saved step {it}  val loss {vl:.4f}{marker}")
            tb.add_scalar("val/loss", float(vl), it)


if __name__ == "__main__":
    main()
