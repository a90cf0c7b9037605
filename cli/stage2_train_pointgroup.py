"""Stage-2 instance segmentation training: PointGroup on pseudo labels
(CLI parity with reference pointgroup/train.py + config/pointgroup_run2_
scannet.yaml: 384 epochs, clustering+ScoreNet after prepare_epochs=128, Adam
lr 1e-3 with step decay).

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
    p.add_argument("--steps", type=int, default=120000)
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
    dump_config(args, "stage2_pointgroup")
    source = SceneSource(args)
    io.cprint(f"scenes: {len(source)}")
    rng = np.random.default_rng(args.seed)

    model = PointGroup(classes=20, m=args.m, score_cap=args.voxel_cap // 8,
                       level_caps=[args.voxel_cap >> i for i in range(7)])

    def sample_batch():
        idx = rng.integers(0, len(source), size=args.batch_size)
        tuples = []
        for i in idx:
            scene, extras = source.get(int(i))
            tuples.append(scene_instance_tuple(
                scene, extras, args.pseudo_root, source.names[int(i)]))
        return make_pg_batch(tuples, args.point_cap, args.instance_cap,
                             rng=rng, augment=True)

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

    opt = optax.adam(args.lr)
    opt_state = opt.init(params)
    ckpt = CheckpointManager(os.path.join("checkpoints", args.exp_name,
                                          "pointgroup"))

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

    steps = {False: make_step(False), True: make_step(True)}
    key = jax.random.PRNGKey(args.seed + 1)
    t0 = time.time()
    for it in range(1, args.steps + 1):
        hb = sample_batch()
        st, p2v = to_device(hb)
        key, sub = jax.random.split(key)
        clustering = it > args.prepare_steps
        params, stats, opt_state, loss, aux = steps[clustering](
            params, stats, opt_state, st, p2v, jnp.asarray(hb.coords),
            jnp.asarray(hb.batch_ids), jnp.asarray(hb.valid),
            jnp.asarray(hb.labels), jnp.asarray(hb.instance_labels),
            jnp.asarray(hb.instance_centroid), jnp.asarray(hb.instance_pointnum),
            sub,
        )
        if it % 10 == 0 or it == args.steps:
            parts = "  ".join(f"{k} {float(v):.4f}" for k, v in aux.items())
            io.cprint("step %d/%d  loss %.4f  %s  (%.2fs/it)"
                      % (it, args.steps, float(loss), parts,
                         (time.time() - t0) / it))
        if should_stop(args.exp_name):
            io.cprint('STOP file found — saving and exiting')
            ckpt.save(it, {"params": jax.device_get(params),
                           "batch_stats": jax.device_get(stats)})
            break
        if it % args.save_freq == 0 or it == args.steps:
            ckpt.save(it, {"params": jax.device_get(params),
                           "batch_stats": jax.device_get(stats)})
            io.cprint(f"==> saved step {it}")


if __name__ == "__main__":
    main()
