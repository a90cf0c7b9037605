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
from cli.stage2_pointgroup_common import (host_voxelize_plan, make_pg_batch,
                                          pack_pg_batch, scene_instance_tuple,
                                          unpack_pg_batch)
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
    p.add_argument("--prefetch_depth", type=int, default=3)
    p.add_argument("--plan_mode", choices=["device", "host"], default="device",
                   help="device: ship ~20 MB compact batches and rebuild the "
                        "7-level pyramid plan on device inside the step "
                        "(minimal-transfer path); host: ship the C++-built "
                        "plans (~140 MB at 2^19)")
    p.add_argument("--resume", action="store_true",
                   help="restore {params, batch_stats, opt_state} from the "
                        "latest checkpoint and continue the step counter and "
                        "LR schedule (reference util/utils.py:47-74)")
    p.add_argument("--pretrain", type=str, default=None,
                   help="checkpoint dir to initialize matching modules from "
                        "(the reference's backbone-pretrain path, "
                        "pointgroup.py:190-194 + load_model_param "
                        "util/utils.py:101-110); shape mismatches keep init")
    args = p.parse_args()

    import jax

    from seggroup_tpu.utils.jit_cache import enable_persistent_cache
    enable_persistent_cache()
    import jax.numpy as jnp
    import optax

    from seggroup_tpu.models.pointgroup import PointGroup, pointgroup_loss
    from seggroup_tpu.ops.voxelize import VoxelMap, voxel_gather_mean
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

    n_dev = len(jax.devices()) if args.num_devices is None else args.num_devices
    use_device_plans = args.plan_mode == "device"

    level_caps = [args.voxel_cap >> i for i in range(7)]
    model = PointGroup(classes=20, m=args.m, score_cap=args.voxel_cap // 8,
                       level_caps=level_caps)

    val_rng = np.random.default_rng(args.seed + 100)

    def sample_batch(idx_pool=None, augment=True, use_rng=None):
        # `use_rng` keeps validation (main thread) off the trainer rng that
        # the prefetch thread owns — np Generators are not thread-safe.
        # Voxelization + the 7-level pyramid plan run here too, so the whole
        # host side overlaps device compute under the prefetcher.
        r = rng if use_rng is None else use_rng
        pool = train_idx if idx_pool is None else idx_pool
        idx = [pool[int(j)] for j in
               r.integers(0, len(pool), size=args.batch_size)]
        tuples = []
        for i in idx:
            scene, extras = source.get(int(i))
            tuples.append(scene_instance_tuple(
                scene, extras, args.pseudo_root, source.names[int(i)]))
        hb = make_pg_batch(tuples, args.point_cap, args.instance_cap,
                           rng=r, augment=augment)
        if use_device_plans:
            vcoords, num, p2v, _ = host_voxelize_plan(
                hb, args.voxel_size, args.voxel_cap, level_caps=None)
            return pack_pg_batch(hb, vcoords, num, p2v), None
        vox = host_voxelize_plan(hb, args.voxel_size, args.voxel_cap,
                                 level_caps)
        return hb, vox

    def to_device(hb, vox):
        vcoords, num, p2v, plan = vox
        vm = VoxelMap(jnp.asarray(vcoords), jnp.asarray(p2v),
                      jnp.arange(args.voxel_cap) < jnp.int32(num),
                      jnp.int32(num))
        feats = jnp.concatenate(
            [jnp.asarray(hb.feats), jnp.asarray(hb.coords)], axis=1
        )  # use_coords=True (run2 yaml)
        vfeats = voxel_gather_mean(feats, vm)
        st = SparseTensor(vm.voxel_coords, vfeats, vm.voxel_valid,
                          vm.num_voxels)
        plan_dev = (jax.tree.map(jnp.asarray, plan)
                    if plan is not None else {})
        return st, vm.point2voxel, plan_dev

    # init on a SMALL-caps twin module: parameter shapes depend only on the
    # channel plan, not the capacities, and initializing at full scale would
    # compile the entire full-size program a second time (~minutes of Mosaic
    # compile for the 7-level UNet through the remote TPU helper)
    init_cap = min(2048, args.voxel_cap)
    init_model = PointGroup(classes=20, m=args.m, score_cap=init_cap // 8,
                            level_caps=[init_cap >> i for i in range(7)])
    npt_s = 2 * init_cap
    st_s = SparseTensor(jnp.zeros((init_cap, 4), jnp.int32),
                        jnp.zeros((init_cap, 6)),
                        jnp.ones((init_cap,), bool), jnp.int32(init_cap))
    variables = jax.jit(
        lambda r: init_model.init(
            r, st_s, jnp.zeros((npt_s,), jnp.int32), jnp.zeros((npt_s, 3)),
            jnp.zeros((npt_s,), jnp.int32), jnp.ones((npt_s,), bool),
            do_clustering=True, train=True,
            jitter_rng=jax.random.PRNGKey(0))
    )(jax.random.PRNGKey(args.seed))
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
                                          "pointgroup"), pow2_retention=True)
    best_ckpt = CheckpointManager(os.path.join("checkpoints", args.exp_name,
                                               "pointgroup_best"))
    if args.pretrain:
        from seggroup_tpu.utils.checkpoint import lenient_restore
        params, n_loaded, n_tot = lenient_restore(args.pretrain, params,
                                                  log=io.cprint)
        io.cprint(f"pretrain init: {n_loaded}/{n_tot} tensors "
                  f"from {args.pretrain}")
    start_it = 0
    if args.resume:
        restored = ckpt.restore(template={
            "params": params, "batch_stats": stats, "opt_state": opt_state})
        if restored is not None:
            params = restored["params"]
            stats = restored["batch_stats"]
            opt_state = restored["opt_state"]
            start_it = ckpt.latest_step()
            io.cprint(f"resumed from step {start_it} "
                      f"(lr continues at {float(schedule(start_it)):.4g})")

    def _step_body(do_clustering, params, stats, opt_state, st, p2v, coords,
                   batch_ids, valid, labels, inst, centroid, pointnum, key,
                   plan):
        def loss_fn(p):
            out, mut = model.apply(
                {"params": p, "batch_stats": stats}, st, p2v, coords,
                batch_ids, valid, do_clustering=do_clustering, train=True,
                jitter_rng=key, mutable=["batch_stats"], plan=plan,
            )
            total, aux = pointgroup_loss(
                out, labels, inst, centroid, pointnum, coords, valid,
                num_instances_cap=args.instance_cap,
                with_score=do_clustering,
            )
            return total, (aux, mut["batch_stats"])

        (loss, (aux, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, new_stats, opt_state, loss, aux

    def make_step(do_clustering):
        @jax.jit
        def step(params, stats, opt_state, st, p2v, coords, batch_ids, valid,
                 labels, inst, centroid, pointnum, key, plan):
            return _step_body(do_clustering, params, stats, opt_state, st,
                              p2v, coords, batch_ids, valid, labels, inst,
                              centroid, pointnum, key, plan)

        return step

    def make_step_packed(do_clustering):
        @jax.jit
        def step(params, stats, opt_state, w, key):
            (st, p2v, coords, batch_ids, valid, labels, inst, centroid,
             pointnum, plan) = unpack_pg_batch(w, args.voxel_cap, level_caps)
            return _step_body(do_clustering, params, stats, opt_state, st,
                              p2v, coords, batch_ids, valid, labels, inst,
                              centroid, pointnum, key, plan)

        return step

    def _val_body(params, stats, st, p2v, coords, batch_ids, valid, labels,
                  inst, centroid, pointnum, plan):
        out = model.apply({"params": params, "batch_stats": stats}, st, p2v,
                          coords, batch_ids, valid, do_clustering=False,
                          train=False, plan=plan)
        total, _ = pointgroup_loss(out, labels, inst, centroid, pointnum,
                                   coords, valid,
                                   num_instances_cap=args.instance_cap,
                                   with_score=False)
        return total

    val_loss_step = jax.jit(_val_body)

    @jax.jit
    def val_loss_step_packed(params, stats, w):
        (st, p2v, coords, batch_ids, valid, labels, inst, centroid,
         pointnum, plan) = unpack_pg_batch(w, args.voxel_cap, level_caps)
        return _val_body(params, stats, st, p2v, coords, batch_ids, valid,
                         labels, inst, centroid, pointnum, plan)

    def validate():
        losses = []
        for j in range(max(1, len(val_idx) // args.batch_size)):
            hb, vox = sample_batch(val_idx, augment=False, use_rng=val_rng)
            if use_device_plans:
                losses.append(float(val_loss_step_packed(
                    params, stats, jax.device_put(hb))))
                continue
            st, p2v, plan = to_device(hb, vox)
            losses.append(float(val_loss_step(
                params, stats, st, p2v, jnp.asarray(hb.coords),
                jnp.asarray(hb.batch_ids), jnp.asarray(hb.valid),
                jnp.asarray(hb.labels), jnp.asarray(hb.instance_labels),
                jnp.asarray(hb.instance_centroid),
                jnp.asarray(hb.instance_pointnum), plan)))
        return float(np.mean(losses))

    steps = ({False: make_step_packed(False), True: make_step_packed(True)}
             if use_device_plans
             else {False: make_step(False), True: make_step(True)})
    # data parallelism over a device mesh (--num_devices > 1): one voxelized
    # batch per device through parallel/dp.py (reference is single-GPU)
    dp_steps = None
    if n_dev > 1:
        from seggroup_tpu.parallel.dp import (build_pointgroup_dp_step,
                                              make_mesh, replicate,
                                              shard_batch)

        dp_mesh = make_mesh(n_dev)
        if use_device_plans:
            from seggroup_tpu.parallel.dp import build_pointgroup_dp_step_packed
            dp_steps = {
                c: build_pointgroup_dp_step_packed(
                    model, opt, dp_mesh, pointgroup_loss,
                    voxel_cap=args.voxel_cap, level_caps=level_caps,
                    do_clustering=c, instance_cap=args.instance_cap)
                for c in (False, True)
            }
        else:
            dp_steps = {
                c: build_pointgroup_dp_step(model, opt, dp_mesh,
                                            pointgroup_loss, do_clustering=c,
                                            instance_cap=args.instance_cap)
                for c in (False, True)
            }
        params = replicate(dp_mesh, params)
        stats = replicate(dp_mesh, stats)
        opt_state = replicate(dp_mesh, opt_state)
        io.cprint(f"data parallel over {n_dev} devices")

    # background host pipeline (single worker: `rng` and `source` are shared
    # mutable state; the heavy work — augmentation + instance bookkeeping in
    # make_pg_batch — runs off the step loop)
    from seggroup_tpu.utils.prefetch import HostPrefetcher

    if dp_steps is not None:
        prefetch = HostPrefetcher(
            lambda s: [sample_batch() for _ in range(n_dev)],
            depth=args.prefetch_depth, workers=1, start=start_it)
    else:
        prefetch = HostPrefetcher(lambda s: sample_batch(),
                                  depth=args.prefetch_depth, workers=1,
                                  start=start_it)

    def save_state(it):
        ckpt.save(it, {"params": jax.device_get(params),
                       "batch_stats": jax.device_get(stats),
                       "opt_state": jax.device_get(opt_state)})

    key = jax.random.PRNGKey(args.seed + 1)
    for _ in range(start_it):
        key, _ = jax.random.split(key)  # replay the key chain on resume
    best_val = float("inf")
    t0 = time.time()
    try:
        for it in range(start_it + 1, args.steps + 1):
            key, sub = jax.random.split(key)
            clustering = it > args.prepare_steps
            if dp_steps is not None and use_device_plans:
                wires = [w for w, _ in next(prefetch)]
                w_b = jax.tree.map(lambda *xs: jnp.stack(xs), *wires)
                params, stats, opt_state, loss = dp_steps[clustering](
                    params, stats, opt_state, shard_batch(dp_mesh, w_b), sub)
                loss = loss / n_dev
                aux = {}
            elif dp_steps is not None:
                cols = []
                for hb, vox in next(prefetch):
                    st, p2v, plan = to_device(hb, vox)
                    cols.append((st, p2v, jnp.asarray(hb.coords),
                                 jnp.asarray(hb.batch_ids), jnp.asarray(hb.valid),
                                 jnp.asarray(hb.labels),
                                 jnp.asarray(hb.instance_labels),
                                 jnp.asarray(hb.instance_centroid),
                                 jnp.asarray(hb.instance_pointnum), plan))
                batched = jax.tree.map(lambda *xs: jnp.stack(xs), *cols)
                params, stats, opt_state, loss = dp_steps[clustering](
                    params, stats, opt_state,
                    *(shard_batch(dp_mesh, x) for x in batched), sub)
                loss = loss / n_dev
                aux = {}
            elif use_device_plans:
                w, _ = next(prefetch)
                params, stats, opt_state, loss, aux = steps[clustering](
                    params, stats, opt_state, jax.device_put(w), sub)
            else:
                hb, vox = next(prefetch)
                st, p2v, plan = to_device(hb, vox)
                params, stats, opt_state, loss, aux = steps[clustering](
                    params, stats, opt_state, st, p2v, jnp.asarray(hb.coords),
                    jnp.asarray(hb.batch_ids), jnp.asarray(hb.valid),
                    jnp.asarray(hb.labels), jnp.asarray(hb.instance_labels),
                    jnp.asarray(hb.instance_centroid),
                    jnp.asarray(hb.instance_pointnum), sub, plan,
                )
            if it % 10 == 0 or it == args.steps:
                parts = "  ".join(f"{k} {float(v):.4f}" for k, v in aux.items())
                io.cprint("step %d/%d  loss %.4f  %s  (%.2fs/it)"
                          % (it, args.steps, float(loss), parts,
                             (time.time() - t0) / max(1, it - start_it)))
                tb.add_scalar("train/loss", float(loss), it)
                for k, v in aux.items():
                    tb.add_scalar(f"train/{k}", float(v), it)
            if should_stop(args.exp_name):
                io.cprint('STOP file found — saving and exiting')
                save_state(it)
                break
            if it % args.save_freq == 0 or it == args.steps:
                save_state(it)
                vl = validate()
                marker = ""
                if vl < best_val:
                    best_val = vl
                    best_ckpt.save(it, {"params": jax.device_get(params),
                                        "batch_stats": jax.device_get(stats)})
                    marker = "  (new best)"
                io.cprint(f"==> saved step {it}  val loss {vl:.4f}{marker}")
                tb.add_scalar("val/loss", float(vl), it)
    finally:
        prefetch.close()
        tb.close()


if __name__ == "__main__":
    main()
