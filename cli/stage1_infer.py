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

from cli.stage1_common import (KNN_WINDOW_BUCKETS, SceneSource,
                               add_common_args, batches, dump_config,
                               export_scene, group_scenes_by_cap,
                               pick_bucket)
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
    p.add_argument("--cluster_cap", type=int, default=1024,
                   help="MINIMUM per-cluster point budget; with --auto_caps "
                        "(default) each scene escalates to the smallest "
                        "bucket covering its largest layer-1 segment")
    p.add_argument("--knn_window", type=int, default=8192,
                   help="MINIMUM cluster-kNN Morton-window budget; with "
                        "--auto_caps scenes whose merged clusters overflow "
                        "it are re-run at an escalated bucket — see "
                        "scripts/stage1_exact_divergence.py")
    p.add_argument("--auto_caps", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="per-scene static-budget escalation from a fixed "
                        "bucket set, so default exports stay on the exact "
                        "reference-semantics path (--no-auto_caps restores "
                        "fixed budgets + warnings)")
    args = p.parse_args()
    assert args.sem_infer != args.ins_infer, "pick exactly one of --sem_infer/--ins_infer"
    mode = "sem_infer" if args.sem_infer else "ins_infer"

    io = IOStream(os.path.join("checkpoints", args.exp_name, "infer.log"))
    dump_config(args, "stage1_infer")
    mesh = make_mesh(args.num_devices)
    n_dev = mesh.devices.size
    source = SceneSource(args)

    scene0, _ = source.get(0)
    scene0 = jax.tree.map(jnp.asarray, scene0)
    init_model = SegGroupGNN(cluster_cap=args.cluster_cap,
                             knn_window=args.knn_window,
                             sequential=not args.parallel_grouping,
                             fast_knn=args.fast_knn)
    variables = jax.jit(
        lambda r1, r2, s: init_model.init({"params": r1, "dropout": r2}, s,
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
    var_r = replicate(mesh, {"params": params, "batch_stats": stats})

    # one compiled program per (cluster_cap, knn_window) bucket, built lazily
    # (params are capacity-independent; the persistent cache makes repeat
    # buckets instant across runs)
    fns: dict[tuple[int, int], object] = {}

    def infer_fn(cc: int, kw: int):
        key = (cc, kw)
        if key not in fns:
            m = SegGroupGNN(cluster_cap=cc, knn_window=kw,
                            sequential=not args.parallel_grouping,
                            fast_knn=args.fast_knn)
            fns[key] = build_stage1_infer_step(m, mesh, mode=mode)
        return fns[key]

    # auto caps (VERDICT r3 item 5): the host knows every scene's largest
    # layer-1 segment BEFORE any compile; bucket scenes so cluster_cap never
    # binds. knn_window (largest MERGED cluster) is only known post-run, so
    # over-window scenes are re-run at an escalated window bucket below.
    if args.auto_caps:
        groups = group_scenes_by_cap(source, args.cluster_cap)
        if len(groups) > 1 or next(iter(groups)) != args.cluster_cap:
            io.cprint("auto caps: " + ", ".join(
                f"{len(v)} scenes @ cluster_cap {k}"
                for k, v in sorted(groups.items())))
    else:
        groups = {args.cluster_cap: list(range(len(source)))}

    results_root = os.path.join(args.results_root, args.exp_name)
    i_sem = np.zeros(40); u_sem = np.zeros(40)
    i_ins = np.zeros(40); u_ins = np.zeros(40)
    t0 = time.time()
    done = 0
    over_budget = 0
    retries: dict[tuple[int, int], list[int]] = {}
    name_to_idx = {n: i for i, n in enumerate(source.names)}

    def process(cc: int, kw: int, order, accumulate: bool):
        nonlocal done, over_budget
        fn = infer_fn(cc, kw)
        for names, batch, extras in batches(source, n_dev, np.asarray(order)):
            out = jax.device_get(fn(var_r, shard_batch(mesh, batch)))
            for row, name in enumerate(names):
                mseg = int(np.asarray(out.max_segment_size).reshape(-1)[row])
                mclu = int(np.asarray(out.max_cluster_size).reshape(-1)[row])
                nkw = pick_bucket(mclu, KNN_WINDOW_BUCKETS, kw + 1)
                if args.auto_caps and mclu > kw and nkw > kw:
                    # merged clusters outgrew the window: queue a re-run at
                    # the covering bucket instead of exporting approximate
                    # labels (the retry re-checks, so escalation iterates in
                    # the rare case a bigger window merges even bigger
                    # clusters; nkw > kw guards termination at the largest
                    # bucket)
                    retries.setdefault((cc, nkw), []).append(
                        name_to_idx[name])
                    io.cprint(f"auto caps: {name} largest cluster {mclu} > "
                              f"window {kw}; re-running @ {nkw}")
                    continue
                export_scene(results_root, name, mode, out, extras[row], row)
                if accumulate:
                    i_sem[:] += out.iou_sem[row, 0]
                    u_sem[:] += out.iou_sem[row, 1]
                    i_ins[:] += out.iou_ins[row, 0]
                    u_ins[:] += out.iou_ins[row, 1]
                # loud budget accounting on the fixed-budget path: binding
                # budgets flip threshold merges (docs/ARCHITECTURE.md
                # deviations #2-3) — point at the exact path
                if not args.auto_caps and (mseg > cc or mclu > kw):
                    over_budget += 1
                    io.cprint(
                        f"WARNING: {name} exceeds a static budget (largest "
                        f"segment {mseg} vs --cluster_cap {cc}; largest "
                        f"cluster {mclu} vs --knn_window {kw}) — labels are "
                        f"approximate; re-run with budgets >= those sizes "
                        f"(or --auto_caps) for the exact reference-"
                        f"semantics path")
                done += 1
            with np.errstate(invalid="ignore", divide="ignore"):
                miou_s = np.nanmean(np.where(u_sem > 0, i_sem / u_sem, np.nan))
                miou_i = np.nanmean(np.where(u_ins > 0, i_ins / u_ins, np.nan))
            io.cprint(
                "[%s] (%04d/%04d)  Sem mIoU: %.2f%%  Ins mIoU: %.2f%%  (%.2fs/scene)"
                % (mode, done, len(source), 100 * miou_s, 100 * miou_i,
                   (time.time() - t0) / max(done, 1))
            )

    for cc in sorted(groups):
        process(cc, args.knn_window, groups[cc], accumulate=True)
    while retries:
        (cc, kw), idxs = retries.popitem()
        process(cc, kw, idxs, accumulate=True)

    if over_budget:
        io.cprint(f"WARNING: {over_budget}/{len(source)} scenes exceeded a "
                  f"static budget (see per-scene warnings above)")
    io.cprint(f"wrote pseudo labels under {results_root}/<scene>/{mode}/")


if __name__ == "__main__":
    main()
