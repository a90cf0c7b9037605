"""Stage-2 semantic segmentation training: KPConv FCNN on pseudo labels
(CLI parity with reference kpconv/training_Scannet2.py + utils/trainer.py):
in-radius sphere sampling with potentials, momentum SGD with exponential
decay, deformable-offset regularizer weight, and vote-smoothed validation
(tester EMA semantics, utils/tester.py:742).

    python -m cli.stage2_train_kpconv --synthetic 8 --steps 30
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np

from cli.stage1_common import should_stop, dump_config, SceneSource, add_common_args
from cli.stage2_train_minkunet import NYU40_TO_20, scene_to_training_tuple
from seggroup_tpu.utils.logging import IOStream


def main():
    p = argparse.ArgumentParser("stage-2 KPConv semantic training")
    add_common_args(p)
    p.add_argument("--pseudo_root", type=str, default=None)
    p.add_argument("--dl0", type=float, default=0.04)
    p.add_argument("--in_radius", type=float, default=2.0)
    p.add_argument("--point_cap", type=int, default=2 ** 15)
    p.add_argument("--batch_size", type=int, default=4,
                   help="spheres per step (reference batch_num=10)")
    p.add_argument("--first_features_dim", type=int, default=64)
    p.add_argument("--lr", type=float, default=1e-2)
    p.add_argument("--steps", type=int, default=300000,
                   help="reference: 500 epochs x 600 steps")
    p.add_argument("--offset_loss_weight", type=float, default=0.1)
    p.add_argument("--save_freq", type=int, default=2000)
    p.add_argument("--val_frac", type=float, default=0.1,
                   help="fraction of scenes held out for validation "
                        "(reference validates per epoch, trainer.py:331+)")
    p.add_argument("--val_spheres", type=int, default=8,
                   help="vote spheres per validation pass")
    p.add_argument("--num_classes", type=int, default=20)
    p.add_argument("--calib_batches", type=int, default=4,
                   help="batches probed for neighbor-cap calibration")
    p.add_argument("--auto_point_cap", action="store_true",
                   help="calibrate point_cap from sampled in_radius-sphere "
                        "sizes so ~batch_size spheres fit (reference "
                        "calibrate_batches, common.py:487-549); overrides "
                        "--point_cap")
    p.add_argument("--keep_ratio", type=float, default=0.8,
                   help="calibration quantile (reference common.py:561)")
    p.add_argument("--grad_clip_norm", type=float, default=100.0,
                   help="per-variable gradient clip (reference trainer.py:125)")
    p.add_argument("--offset_lr_scale", type=float, default=0.1,
                   help="LR scale on deformable offset convs "
                        "(reference trainer.py:119-152)")
    p.add_argument("--prefetch_depth", type=int, default=3)
    p.add_argument("--resume", action="store_true",
                   help="restore {params, batch_stats, opt_state} from the "
                        "latest checkpoint and continue the step counter and "
                        "LR schedule (reference tf.Saver restore)")
    p.add_argument("--weights", type=str, default=None,
                   help="initialize params from this checkpoint dir with "
                        "shape-mismatch tolerance (lenient loading)")
    args = p.parse_args()

    import jax

    from seggroup_tpu.utils.jit_cache import enable_persistent_cache
    enable_persistent_cache()
    import jax.numpy as jnp
    import optax

    from seggroup_tpu.data.potentials import PotentialSampler
    from seggroup_tpu.models.kpconv import (KPFCNN, build_pyramid,
                                            calibrate_neighbor_caps)
    from seggroup_tpu.solvers import make_schedule
    from seggroup_tpu.utils.checkpoint import CheckpointManager

    io = IOStream(os.path.join("checkpoints", args.exp_name, "kpconv.log"))
    from seggroup_tpu.utils.tb import ScalarWriter
    tb = ScalarWriter(os.path.join("checkpoints", args.exp_name, "tb"),
                      enabled=args.tensorboard)
    dump_config(args, "stage2_kpconv")
    source = SceneSource(args)
    io.cprint(f"scenes: {len(source)}")
    rng = np.random.default_rng(args.seed)
    n_cap = args.point_cap
    caps = [n_cap // 2, n_cap // 4, n_cap // 8, n_cap // 16]

    # load all scenes once (the reference also holds clouds in RAM,
    # Scannet.py:304-423)
    scenes = []
    for si in range(len(source)):
        scene, extras = source.get(si)
        scenes.append(scene_to_training_tuple(
            scene, extras, args.pseudo_root, source.names[si],
            args.pseudo_root is not None))

    n_val = int(len(scenes) * args.val_frac)
    if args.val_frac > 0 and n_val == 0 and len(scenes) > 1:
        n_val = 1
    val_scenes = scenes[len(scenes) - n_val:]
    train_scenes = scenes[: len(scenes) - n_val] or val_scenes
    scenes = train_scenes
    io.cprint(f"scenes: {len(train_scenes)} train / {len(val_scenes)} val")

    if args.auto_point_cap:
        from seggroup_tpu.models.kpconv import (calibrate_batch_limit,
                                                sample_sphere_sizes)
        sizes = sample_sphere_sizes([c for c, _, _ in scenes],
                                    args.in_radius,
                                    rng=np.random.default_rng(args.seed + 2))
        lim, n_cap = calibrate_batch_limit(sizes, args.batch_size,
                                           rng=np.random.default_rng(
                                               args.seed + 3))
        caps = [n_cap // 2, n_cap // 4, n_cap // 8, n_cap // 16]
        io.cprint(f"calibrated batch limit: {lim:.0f} points "
                  f"-> point_cap {n_cap} (sphere sizes "
                  f"p50={int(np.median(sizes))} max={int(sizes[-1])})")

    # per-point Tukey-potential sphere sampling (reference Scannet.py:701-819):
    # centers are drawn at the global potential minimum, guaranteeing scene
    # coverage — unlike random centers
    def new_sampler(seed):
        return PotentialSampler([c for c, _, _ in scenes],
                                in_radius=args.in_radius, seed=seed)

    def sample_batch(sampler):
        """Pick in_radius spheres at the min-potential centers."""
        coords_l, feats_l, labels_l, batch_l = [], [], [], []
        total = 0
        for b in range(args.batch_size):
            si, center = sampler.next_center()
            c, col, lab = scenes[si]
            sel = np.where(((c - center) ** 2).sum(1) < args.in_radius ** 2)[0]
            if len(sel) > (n_cap - total):
                sel = sel[rng.permutation(len(sel))[: n_cap - total]]
            coords_l.append(c[sel]); feats_l.append(col[sel])
            labels_l.append(lab[sel])
            batch_l.append(np.full(len(sel), b, np.int32))
            total += len(sel)
            if total >= n_cap:
                break
        pts = np.zeros((n_cap, 3), np.float32)
        cols = np.zeros((n_cap, 3), np.float32)
        labs = np.full(n_cap, 255, np.int32)
        bids = np.zeros(n_cap, np.int32)
        n = min(total, n_cap)
        pts[:n] = np.concatenate(coords_l)[:n]
        cols[:n] = np.concatenate(feats_l)[:n]
        labs[:n] = np.concatenate(labels_l)[:n]
        bids[:n] = np.concatenate(batch_l)[:n]
        valid = np.zeros(n_cap, bool); valid[:n] = True
        # in_features_dim=4: constant 1 + rgb (reference training_Scannet.py:122)
        feats = np.concatenate([np.ones((n_cap, 1), np.float32),
                                cols / 255.0], 1)
        return pts, feats, labs, bids, valid

    model = KPFCNN(num_classes=args.num_classes,
                   first_features_dim=args.first_features_dim, dl0=args.dl0)

    # neighbor-cap calibration from data histograms (reference
    # calibrate_neighbors, common.py:551-656) — replaces hand-set constants
    calib_sampler = new_sampler(args.seed + 1)
    calib_batches = [sample_batch(calib_sampler)
                     for _ in range(args.calib_batches)]
    nbr_caps, over_rate = calibrate_neighbor_caps(
        [(p, b, v) for p, f, l, b, v in calib_batches],
        num_layers=5, dl0=args.dl0, keep_ratio=args.keep_ratio,
        level_caps=caps)
    io.cprint(f"calibrated neighbor caps: {nbr_caps} "
              f"(probe overflow rate/level: "
              + " ".join(f"{r:.3f}" for r in over_rate) + ")")
    sampler = new_sampler(args.seed)

    @jax.jit
    def make_pyramid(pts, bids, valid):
        return build_pyramid(pts, bids, valid, num_layers=5, dl0=args.dl0,
                             level_caps=caps, neighbor_cap=nbr_caps)

    pts, feats, labs, bids, valid = sample_batch(sampler)
    pyr0 = make_pyramid(jnp.asarray(pts), jnp.asarray(bids), jnp.asarray(valid))
    variables = jax.jit(lambda r, py, f: model.init(r, py, f, train=True))(
        jax.random.PRNGKey(args.seed), pyr0, jnp.asarray(feats))
    params, stats = variables["params"], variables["batch_stats"]
    io.cprint("Network parameters: %.2fM"
              % (sum(x.size for x in jax.tree.leaves(params)) / 1e6))

    schedule = make_schedule("ExpLR", args.lr, exp_gamma=0.1 ** (1 / 150000),
                             exp_step_size=1)
    opt = optax.sgd(schedule, momentum=0.98)
    opt_state = opt.init(params)
    ckpt = CheckpointManager(os.path.join("checkpoints", args.exp_name,
                                          "kpconv"), pow2_retention=True)
    best_ckpt = CheckpointManager(os.path.join("checkpoints", args.exp_name,
                                               "kpconv_best"))
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
            io.cprint(f"resumed from step {start_it} "
                      f"(lr continues at {schedule(start_it):.4g})")

    # reference trainer.py:119-152: 0.1x LR on deformable offset convs
    # + independent per-variable gradient clipping (shared by the single-
    # device step and the DP step's grad_transform). Both deformable
    # variants get the offset scale: v1's 'offset_kernel' KPConv weights and
    # v2's zero-init 'offset_mlp' Dense.
    def per_var_grads(grads):
        def per_var(path, g):
            is_offset = any(
                ("offset_kernel" in str(getattr(k, "key", k))
                 or "offset_mlp" in str(getattr(k, "key", k)))
                for k in path)
            if is_offset:
                g = g * args.offset_lr_scale
            norm = jnp.sqrt(jnp.sum(jnp.square(g)) + 1e-12)
            return g * jnp.minimum(1.0, args.grad_clip_norm / norm)

        return jax.tree_util.tree_map_with_path(per_var, grads)

    @jax.jit
    def step(params, stats, opt_state, pyr, feats, labels):
        def loss_fn(p):
            (logits, regs), mut = model.apply(
                {"params": p, "batch_stats": stats}, pyr, feats, train=True,
                mutable=["batch_stats"])
            ok = labels != 255
            lp = jax.nn.log_softmax(logits, -1)
            nll = -jnp.take_along_axis(
                lp, jnp.clip(labels, 0, args.num_classes - 1)[:, None], 1)[:, 0]
            ce = jnp.sum(jnp.where(ok, nll, 0.0)) / jnp.maximum(jnp.sum(ok), 1)
            return ce + args.offset_loss_weight * regs, (mut["batch_stats"],
                                                         logits)

        (loss, (new_stats, logits)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        grads = per_var_grads(grads)
        updates, opt_state = opt.update(grads, opt_state)
        params = optax.apply_updates(params, updates)
        acc = jnp.sum((jnp.argmax(logits, -1) == labels) & (labels != 255)) \
            / jnp.maximum(jnp.sum(labels != 255), 1)
        return params, new_stats, opt_state, loss, acc

    @jax.jit
    def infer(params, stats, pts, bids, valid, feats):
        pyr = build_pyramid(pts, bids, valid, num_layers=5, dl0=args.dl0,
                            level_caps=caps, neighbor_cap=nbr_caps)
        logits, _ = model.apply({"params": params, "batch_stats": stats},
                                pyr, feats, train=False)
        return logits

    @jax.jit
    def overflow_probe(pts, bids, valid):
        """Per-level ball-query overflow rates at the calibrated caps
        (flags from ops/knn.py ball_query_pair)."""
        _, over = build_pyramid(pts, bids, valid, num_layers=5, dl0=args.dl0,
                                level_caps=caps, neighbor_cap=nbr_caps,
                                return_overflow=True)
        return jnp.stack(over)

    def validate(params, stats):
        """Vote-smoothed held-out accuracy (tester EMA semantics,
        reference utils/tester.py:742): potential-centered spheres over the
        val scenes, EMA-accumulated probs, point accuracy on voted points."""
        if not val_scenes:
            return float("nan")
        vs = PotentialSampler([c for c, _, _ in val_scenes],
                              in_radius=args.in_radius, seed=7)
        probs = [np.zeros((len(c), args.num_classes), np.float32)
                 for c, _, _ in val_scenes]
        voted = [np.zeros(len(c), bool) for c, _, _ in val_scenes]
        vrng = np.random.default_rng(7)
        over_acc = np.zeros(5)
        n_over = 0
        for _ in range(args.val_spheres):
            si, center = vs.next_center()
            c, col, lab = val_scenes[si]
            sel = np.where(((c - center) ** 2).sum(1)
                           < args.in_radius ** 2)[0]
            if len(sel) > n_cap:
                sel = sel[vrng.permutation(len(sel))[:n_cap]]
            if not len(sel):
                continue
            pts = np.zeros((n_cap, 3), np.float32)
            feats = np.ones((n_cap, 4), np.float32)
            pts[: len(sel)] = c[sel]
            feats[: len(sel), 1:] = col[sel] / 255.0
            vmask = np.zeros(n_cap, bool); vmask[: len(sel)] = True
            logits = np.asarray(infer(
                params, stats, jnp.asarray(pts),
                jnp.zeros(n_cap, jnp.int32), jnp.asarray(vmask),
                jnp.asarray(feats)))[: len(sel)]
            over_acc += np.asarray(overflow_probe(
                jnp.asarray(pts), jnp.zeros(n_cap, jnp.int32),
                jnp.asarray(vmask)))
            n_over += 1
            sm = np.exp(logits - logits.max(1, keepdims=True))
            sm /= sm.sum(1, keepdims=True)
            probs[si][sel] = 0.95 * probs[si][sel] + 0.05 * sm
            voted[si][sel] = True
        if n_over:
            # loud truncation accounting (VERDICT: overflow % per level each
            # validation pass; flags already computed by ball_query_pair)
            io.cprint("    ball-query overflow %/level: "
                      + " ".join(f"{100*r/n_over:.2f}" for r in over_acc))
        hits = tot = 0
        for (c, col, lab), pr, vt in zip(val_scenes, probs, voted):
            ok = vt & (lab != 255)
            hits += int((pr.argmax(1)[ok] == lab[ok]).sum())
            tot += int(ok.sum())
        return hits / max(tot, 1)

    # data parallelism over a device mesh (--num_devices > 1): one sphere
    # batch per device, pyramid built in-shard, pmean'd grads with the same
    # per-variable transform (parallel/dp.py; the reference is single-GPU)
    n_dev = len(jax.devices()) if args.num_devices is None else args.num_devices
    dp = None
    if n_dev > 1:
        from seggroup_tpu.parallel.dp import (build_kpconv_dp_step, make_mesh,
                                              replicate, shard_batch)

        dp_mesh = make_mesh(n_dev)
        dp = build_kpconv_dp_step(
            model, opt, dp_mesh, num_classes=args.num_classes, dl0=args.dl0,
            level_caps=caps, neighbor_caps=nbr_caps,
            reg_weight=args.offset_loss_weight, grad_transform=per_var_grads)
        params = replicate(dp_mesh, params)
        stats = replicate(dp_mesh, stats)
        opt_state = replicate(dp_mesh, opt_state)
        io.cprint(f"data parallel over {n_dev} devices")

    # background host pipeline: sphere sampling overlaps device compute
    # (the minkunet trainer's pattern; single worker — the potential sampler
    # is stateful and must advance in step order)
    from seggroup_tpu.utils.prefetch import HostPrefetcher

    if dp is not None:
        prefetch = HostPrefetcher(
            lambda s: [sample_batch(sampler) for _ in range(n_dev)],
            depth=args.prefetch_depth, workers=1, start=start_it)
    else:
        prefetch = HostPrefetcher(lambda s: sample_batch(sampler),
                                  depth=args.prefetch_depth, workers=1,
                                  start=start_it)

    def save_state(it):
        ckpt.save(it, {"params": jax.device_get(params),
                       "batch_stats": jax.device_get(stats),
                       "opt_state": jax.device_get(opt_state)})

    best_val = -1.0
    t0 = time.time()
    try:
        for it in range(start_it + 1, args.steps + 1):
            if dp is not None:
                cols = next(prefetch)
                stacks = [jnp.stack([jnp.asarray(c[j]) for c in cols])
                          for j in range(5)]
                params, stats, opt_state, loss, acc = dp(
                    params, stats, opt_state,
                    shard_batch(dp_mesh, stacks[0]), shard_batch(dp_mesh, stacks[1]),
                    shard_batch(dp_mesh, stacks[2]), shard_batch(dp_mesh, stacks[3]),
                    shard_batch(dp_mesh, stacks[4]))
                loss = loss / n_dev
            else:
                pts, feats, labs, bids, valid = next(prefetch)
                pyr = make_pyramid(jnp.asarray(pts), jnp.asarray(bids),
                                   jnp.asarray(valid))
                params, stats, opt_state, loss, acc = step(
                    params, stats, opt_state, pyr, jnp.asarray(feats),
                    jnp.asarray(labs))
            if it % 10 == 0 or it == args.steps:
                io.cprint("step %d/%d  loss %.4f  acc %.2f%%  (%.2fs/it)"
                          % (it, args.steps, float(loss), 100 * float(acc),
                             (time.time() - t0) / max(1, it - start_it)))
                tb.add_scalar("train/loss", float(loss), it)
                tb.add_scalar("train/acc", 100 * float(acc), it)
            if should_stop(args.exp_name):
                io.cprint('STOP file found — saving and exiting')
                save_state(it)
                break
            if it % args.save_freq == 0 or it == args.steps:
                save_state(it)
                val_acc = validate(params, stats)
                marker = ""
                if val_acc > best_val:
                    best_val = val_acc
                    best_ckpt.save(it, {"params": jax.device_get(params),
                                        "batch_stats": jax.device_get(stats)})
                    marker = "  (new best)"
                io.cprint(f"==> saved step {it}  val acc "
                          f"{100*val_acc:.2f}%{marker}")
                tb.add_scalar("val/acc", 100 * val_acc, it)
    finally:
        prefetch.close()
        tb.close()


if __name__ == "__main__":
    main()
