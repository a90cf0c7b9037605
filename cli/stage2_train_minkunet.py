"""Stage-2 semantic segmentation training: MinkowskiNet Res16UNet on pseudo
labels (CLI parity with reference minkowski/main.py + lib/train.py:29-176):
iteration-based loop, SGD+PolyLR, CE with ignore label, periodic validation
with best-checkpoint tracking (reference lib/train.py:100-155).

TPU pipeline: host threads build voxel batches ahead of the device. Default
`--plan_mode device` ships only a ~7.5 MB compact batch and builds the
sparse-conv pyramid plan on device inside the jitted step
(sparse/device_plan.py, bit-equal to the C++ host plans); `--plan_mode host`
ships the C++-built plans instead (sparse/plan.py — preferable only when the
host link is wide and device time is the scarce resource).

    python -m cli.stage2_train_minkunet --synthetic 16 --max_iter 100
    python -m cli.stage2_train_minkunet --data_root dataset/scannet/prepared \
        --pseudo_root results/exp --max_iter 60000
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np

from cli.stage1_common import should_stop, dump_config, SceneSource, add_common_args
from seggroup_tpu.utils.logging import IOStream

# scannet 20-class training ids from nyu40 (reference minkowski
# lib/datasets/scannet.py VALID_CLASS_IDS / IGNORE_LABELS)
VALID_CLASS_IDS = (1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 14, 16, 24, 28, 33, 34, 36, 39)
NYU40_TO_20 = np.full(41, 255, np.int32)
for i, c in enumerate(VALID_CLASS_IDS):
    NYU40_TO_20[c] = i


def scene_to_training_tuple(scene, extras, pseudo_root, name, use_pseudo):
    """coords (N,3) m, colors (N,3) 0..255, labels (N,) 20-class or 255."""
    pts = np.asarray(scene.points)
    coords = pts[:, :3].astype(np.float32)
    colors = ((pts[:, 3:] + 1.0) * 127.5).astype(np.float32)
    if use_pseudo:
        # exported pseudo labels align to ORIGINAL mesh vertices (reference
        # layout, kpconv/datasets/Scannet2.py:148-156); pull them back onto
        # the resampled points via the forward mapping
        path = os.path.join(pseudo_root, name, "sem_infer", "layer_2.sem.txt")
        sem = np.loadtxt(path, dtype=np.int64)
        if "mapping" in extras:
            sem = sem[extras["mapping"]]
        else:
            sem = sem[: len(coords)]
        labels = NYU40_TO_20[np.clip(sem, 0, 40)]
    else:
        sem = np.asarray(scene.real_sem)
        labels = NYU40_TO_20[np.clip(sem, 0, 40)]
    return coords, colors, labels.astype(np.int32)


def main():
    p = argparse.ArgumentParser("stage-2 MinkUNet semantic training")
    add_common_args(p)
    p.add_argument("--model", type=str, default="Res16UNet34C")
    p.add_argument("--pseudo_root", type=str, default=None,
                   help="results/<exp> dir with stage-1 pseudo labels; "
                        "default trains on GT (fully-supervised upper bound)")
    p.add_argument("--voxel_size", type=float, default=0.02)
    p.add_argument("--capacity", type=int, default=2 ** 17)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--lr", type=float, default=1e-1)
    p.add_argument("--optimizer", type=str, default="SGD")
    p.add_argument("--scheduler", type=str, default="PolyLR")
    p.add_argument("--max_iter", type=int, default=60000)
    p.add_argument("--val_freq", type=int, default=1000)
    p.add_argument("--val_frac", type=float, default=0.1,
                   help="fraction of scenes held out for validation "
                        "(reference trains on train/ and validates on val/)")
    p.add_argument("--num_classes", type=int, default=20)
    p.add_argument("--prefetch_workers", type=int, default=2)
    p.add_argument("--prefetch_depth", type=int, default=3)
    p.add_argument("--plan_mode", choices=["device", "host"], default="device",
                   help="device: ship ~7.5 MB compact batches and build the "
                        "pyramid plan on device inside the train step "
                        "(minimal-transfer path; sparse/device_plan.py; "
                        "under --num_devices the plan build runs SPMD-local "
                        "in each shard). host: ship C++-built plans (~250 MB "
                        "at 2^19 — fine over PCIe, dominant over a remote "
                        "tunnel)")
    p.add_argument("--resume", action="store_true",
                   help="restore {params, batch_stats, opt_state} from the "
                        "latest checkpoint and continue the iteration counter "
                        "and LR schedule (reference minkowski/lib/train.py:50-66)")
    p.add_argument("--weights", type=str, default=None,
                   help="initialize params from this checkpoint dir with "
                        "shape-mismatch tolerance (reference "
                        "lenient_weight_loading, minkowski/main.py:129-146)")
    args = p.parse_args()

    import jax

    from seggroup_tpu.utils.jit_cache import enable_persistent_cache
    enable_persistent_cache()
    import jax.numpy as jnp
    import optax

    from seggroup_tpu.data.voxel_dataset import IGNORE_LABEL, make_voxel_batch
    from seggroup_tpu.eval.semantic import confusion_matrix, miou_from_confusion
    from seggroup_tpu.models.minkunet import make_minkunet
    from seggroup_tpu.solvers import make_optimizer, make_schedule
    from seggroup_tpu.sparse.plan import build_unet_plan
    from seggroup_tpu.sparse.tensor import SparseTensor
    from seggroup_tpu.utils.checkpoint import CheckpointManager
    from seggroup_tpu.parallel.dp import (build_minkunet_dp_step,
                                          make_mesh, replicate,
                                          shard_batch)
    from seggroup_tpu.utils.prefetch import HostPrefetcher
    from seggroup_tpu.utils.tb import ScalarWriter

    io = IOStream(os.path.join("checkpoints", args.exp_name, "minkunet.log"))
    tb = ScalarWriter(os.path.join("checkpoints", args.exp_name, "tb"),
                      enabled=args.tensorboard)
    dump_config(args, "stage2_minkunet")
    source = SceneSource(args)
    n_val = int(len(source) * args.val_frac)
    if args.val_frac > 0 and n_val == 0 and len(source) > 1:
        n_val = 1
    val_idx = list(range(len(source) - n_val, len(source)))
    train_idx = list(range(len(source) - n_val)) or val_idx
    io.cprint(f"scenes: {len(train_idx)} train / {len(val_idx)} val  "
              f"model: {args.model}")

    caps = [args.capacity, args.capacity // 2, args.capacity // 4,
            args.capacity // 8, args.capacity // 8]
    model = make_minkunet(args.model, out_channels=args.num_classes,
                          level_caps=caps)

    n_dev = len(jax.devices()) if args.num_devices is None else args.num_devices
    use_device_plans = args.plan_mode == "device"
    if use_device_plans:
        from seggroup_tpu.sparse.device_plan import (build_unet_plan_device,
                                                     pack_voxel_batch,
                                                     unpack_voxel_batch)

    def make_batch(step, idx_pool, augment):
        """Thread-safe (per-step rng): batch + host-built pyramid plan (host
        mode) or the compact wire tuple (device-plan mode)."""
        rng = np.random.default_rng((args.seed, step))
        idx = rng.integers(0, len(idx_pool), size=args.batch_size)
        tuples = []
        for i in idx:
            scene, extras = source.get(int(idx_pool[int(i)]))
            tuples.append(scene_to_training_tuple(
                scene, extras, args.pseudo_root,
                source.names[int(idx_pool[int(i)])],
                args.pseudo_root is not None))
        vb = make_voxel_batch(tuples, args.capacity, args.voxel_size,
                              rng=rng, augment=augment)
        if use_device_plans:
            return pack_voxel_batch(vb), None
        plan = build_unet_plan(vb.coords, int(vb.num), caps)
        return vb, plan

    def to_device(vb, plan):
        st = SparseTensor(jnp.asarray(vb.coords), jnp.asarray(vb.feats),
                          jnp.asarray(vb.valid), jnp.asarray(vb.num))
        return st, jnp.asarray(vb.labels), jax.tree.map(jnp.asarray, plan)

    # init on a SMALL-caps twin module (one jitted program, tiny shapes):
    # parameter shapes depend only on the channel plan, and a full-scale
    # init would compile the whole full-size program a second time
    init_cap = min(2048, args.capacity)
    init_model = make_minkunet(
        args.model, out_channels=args.num_classes,
        level_caps=[init_cap, init_cap // 2, init_cap // 4, init_cap // 8,
                    init_cap // 8])
    st_s = SparseTensor(jnp.zeros((init_cap, 4), jnp.int32),
                        jnp.zeros((init_cap, 3)),
                        jnp.ones((init_cap,), bool), jnp.int32(init_cap))
    variables = jax.jit(lambda r: init_model.init(r, st_s, train=True))(
        jax.random.PRNGKey(args.seed))
    params, stats = variables["params"], variables["batch_stats"]
    n_params = sum(x.size for x in jax.tree.leaves(params))
    io.cprint(f"Network parameters: {n_params/1e6:.2f}M")

    schedule = make_schedule(args.scheduler, args.lr, max_iter=args.max_iter)
    opt = make_optimizer(args.optimizer, schedule)
    opt_state = opt.init(params)
    ckpt = CheckpointManager(os.path.join("checkpoints", args.exp_name,
                                          "minkunet"), pow2_retention=True)
    best_ckpt = CheckpointManager(os.path.join("checkpoints", args.exp_name,
                                               "minkunet_best"))
    if args.weights:
        from seggroup_tpu.utils.checkpoint import lenient_restore
        params, n_loaded, n_tot = lenient_restore(args.weights, params,
                                                  log=io.cprint)
        io.cprint(f"lenient init: {n_loaded}/{n_tot} tensors from {args.weights}")
    start_it = 0
    if args.resume:
        restored = ckpt.restore(template={
            "params": params, "batch_stats": stats, "opt_state": opt_state})
        if restored is not None:
            params = restored["params"]
            stats = restored["batch_stats"]
            opt_state = restored["opt_state"]
            start_it = ckpt.latest_step()
            io.cprint(f"resumed from iter {start_it} "
                      f"(lr continues at {schedule(start_it):.4g})")

    def _train_body(params, stats, opt_state, st, labels, plan):
        def loss_fn(p):
            logits, mut = model.apply({"params": p, "batch_stats": stats}, st,
                                      train=True, mutable=["batch_stats"],
                                      plan=plan)
            ok = st.valid & (labels != IGNORE_LABEL)
            lp = jax.nn.log_softmax(logits, axis=-1)
            nll = -jnp.take_along_axis(
                lp, jnp.clip(labels, 0, args.num_classes - 1)[:, None], axis=1
            )[:, 0]
            loss = jnp.sum(jnp.where(ok, nll, 0.0)) / jnp.maximum(jnp.sum(ok), 1)
            return loss, (mut["batch_stats"], logits)

        (loss, (new_stats, logits)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        hist = confusion_matrix(jnp.argmax(logits, -1), jnp.where(
            st.valid, labels, IGNORE_LABEL), args.num_classes)
        return params, new_stats, opt_state, loss, hist

    train_step = jax.jit(_train_body)

    @jax.jit
    def train_step_packed(params, stats, opt_state, c16, f16, l8, num):
        """Minimal-transfer step: unpack the compact wire tuple and build the
        pyramid plan on device (bit-equal to the host C++ plans —
        tests/test_sparse_plan.py)."""
        st, labels = unpack_voxel_batch(c16, f16, l8, num)
        plan = build_unet_plan_device(st.coords, st.num, tuple(caps))
        return _train_body(params, stats, opt_state, st, labels, plan)

    def _eval_body(params, stats, st, labels, plan):
        logits = model.apply({"params": params, "batch_stats": stats}, st,
                             train=False, plan=plan)
        return confusion_matrix(jnp.argmax(logits, -1), jnp.where(
            st.valid, labels, IGNORE_LABEL), args.num_classes)

    eval_step = jax.jit(_eval_body)

    @jax.jit
    def eval_step_packed(params, stats, c16, f16, l8, num):
        st, labels = unpack_voxel_batch(c16, f16, l8, num)
        plan = build_unet_plan_device(st.coords, st.num, tuple(caps))
        return _eval_body(params, stats, st, labels, plan)

    def validate():
        hist = np.zeros((args.num_classes, args.num_classes), np.int64)
        for j, vi in enumerate(val_idx):
            vb, plan = make_batch(10_000_000 + j, [vi], False)
            if use_device_plans:
                hist += np.asarray(eval_step_packed(
                    params, stats, *jax.device_put(vb)))
            else:
                st, labels, plan = to_device(vb, plan)
                hist += np.asarray(eval_step(params, stats, st, labels, plan))
        return miou_from_confusion(hist)[0]

    # data parallelism over a device mesh (--num_devices > 1): each device
    # gets its own batch_size-scene voxel batch, DP step pmeans grads
    # (reference trains this single-GPU; parallel/dp.py capability)
    dp = None
    dp_mesh = None
    if n_dev > 1:
        dp_mesh = mesh = make_mesh(n_dev)
        if use_device_plans:
            from seggroup_tpu.parallel.dp import build_minkunet_dp_step_packed
            dp = build_minkunet_dp_step_packed(
                model, opt, mesh, caps, num_classes=args.num_classes)
        else:
            dp = build_minkunet_dp_step(model, opt, mesh,
                                        num_classes=args.num_classes)
        params = replicate(mesh, params)
        stats = replicate(mesh, stats)
        opt_state = replicate(mesh, opt_state)
        io.cprint(f"data parallel over {n_dev} devices "
                  f"({args.batch_size} scenes/device)")

        def make_batch_dp(step, idx_pool, augment):
            cols = [make_batch(step * n_dev + d + 1, idx_pool, augment)
                    for d in range(n_dev)]
            vbs, plans = zip(*cols)
            return vbs, plans

        prefetch = HostPrefetcher(
            lambda s: make_batch_dp(s, train_idx, True),
            depth=args.prefetch_depth, workers=args.prefetch_workers,
            start=start_it)
    else:
        prefetch = HostPrefetcher(
            lambda s: make_batch(s + 1, train_idx, True),
            depth=args.prefetch_depth, workers=args.prefetch_workers,
            start=start_it)

    def save_state(it):
        ckpt.save(it, {"params": jax.device_get(params),
                       "batch_stats": jax.device_get(stats),
                       "opt_state": jax.device_get(opt_state)})

    hist_acc = np.zeros((args.num_classes, args.num_classes))
    hist_dev = None  # device-side accumulator between logging syncs
    best_val = -1.0
    t_window = time.time()
    it_window = start_it
    try:
        for it in range(start_it + 1, args.max_iter + 1):
            if dp is not None and use_device_plans:
                packs, _ = next(prefetch)  # (tuple of packed wires, Nones)
                cols = [jnp.stack([p[i] for p in packs]) for i in range(4)]
                params, stats, opt_state, loss, hist = dp(
                    params, stats, opt_state,
                    *(shard_batch(dp_mesh, x) for x in cols))
                loss = loss / n_dev
            elif dp is not None:
                vbs, plans = next(prefetch)
                devbatch = [to_device(v, pl) for v, pl in zip(vbs, plans)]
                st_b, lab_b, plan_b = jax.tree.map(
                    lambda *xs: jnp.stack(xs), *devbatch)
                params, stats, opt_state, loss, hist = dp(
                    params, stats, opt_state,
                    shard_batch(dp_mesh, st_b),
                    shard_batch(dp_mesh, lab_b),
                    shard_batch(dp_mesh, plan_b))
                loss = loss / n_dev
            elif use_device_plans:
                packed, _ = next(prefetch)
                params, stats, opt_state, loss, hist = train_step_packed(
                    params, stats, opt_state, *jax.device_put(packed))
            else:
                vb, plan = next(prefetch)
                st, labels, plan = to_device(vb, plan)
                params, stats, opt_state, loss, hist = train_step(
                    params, stats, opt_state, st, labels, plan)
            # accumulate on device; an np.asarray here would sync every step
            # and serialize the next batch's wire transfer behind this step
            hist_dev = hist if hist_dev is None else hist_dev + hist
            if it % 10 == 0 or it == args.max_iter:
                hist_acc = hist_acc + np.asarray(hist_dev)
                hist_dev = None
                miou, _ = miou_from_confusion(hist_acc)
                io.cprint(
                    "iter %d/%d  loss %.4f  running mIoU %.2f%%  lr %.4g  (%.2fs/it)"
                    % (it, args.max_iter, float(loss), 100 * miou,
                       schedule(it),
                       (time.time() - t_window) / max(1, it - it_window)))
                tb.add_scalar("train/loss", float(loss), it)
                tb.add_scalar("train/miou", 100 * miou, it)
                tb.add_scalar("train/lr", float(schedule(it)), it)
                t_window = time.time()
                it_window = it
            if should_stop(args.exp_name):
                io.cprint('STOP file found — saving and exiting')
                save_state(it)
                break
            if it % args.val_freq == 0 or it == args.max_iter:
                save_state(it)
                val_miou = validate()
                marker = ""
                if val_miou > best_val:
                    best_val = val_miou
                    best_ckpt.save(it, {"params": jax.device_get(params),
                                        "batch_stats": jax.device_get(stats)})
                    marker = "  (new best)"
                io.cprint(f"==> saved iter {it}  val mIoU "
                          f"{100*val_miou:.2f}%{marker}")
                tb.add_scalar("val/miou", 100 * val_miou, it)
                t_window = time.time()
                it_window = it
    finally:
        prefetch.close()
        tb.close()


if __name__ == "__main__":
    main()
