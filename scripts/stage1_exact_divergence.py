"""End-to-end stage-1 cap-divergence measurement (VERDICT round-1 item 3).

The sequential grouping engine is oracle-exact (tests/test_grouping.py), and
every op is oracle-exact below its static budget (tests/test_knn.py,
tests/test_fps.py). The two remaining approximations are the budgets
themselves (docs/ARCHITECTURE.md deviations #2-3):

  * `cluster_cap` (default 1024): FPS candidate budget in cluster_pointclouds
    — binds when a layer-1 segment exceeds 1024 points (reference
    get_cluster_pointcloud scans all members, model.py:398-426);
  * `knn_window` (default 8192): Morton-window candidate budget in
    cluster_knn — binds when a merged cluster at layers 2-3 exceeds 8192
    points (reference get_knn scans the whole cluster, model.py:512-522).

This script runs the COMPOSED pipeline twice with shared weights on
150k-point scenes whose instances span 6k-37k points (reference-like
walls/floors) — once with production caps, once with exact caps
(cluster_cap/knn_window >= any cluster) — and counts exported-label
differences. Zero differences = the production caps are end-to-end
bit-compatible with the exact (reference-semantics) path at scale.

The exact path IS the escape hatch: both budgets are constructor/CLI
arguments (--cluster_cap/--knn_window on cli/stage1_*), so any scene that
does diverge can be run exactly.

Run on the TPU (slow on CPU):  python scripts/stage1_exact_divergence.py
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--num_points", type=int, default=150528)
    ap.add_argument("--num_slots", type=int, default=512)
    ap.add_argument("--configs", type=str, default="24x12,8x12,4x16",
                    help="instance-count x segs-per-instance per scene")
    ap.add_argument("--seeds", type=int, default=2)
    ap.add_argument("--cluster_cap", type=int, default=1024,
                    help="production FPS candidate budget under test")
    ap.add_argument("--knn_window", type=int, default=8192,
                    help="production Morton-window kNN budget under test")
    ap.add_argument("--auto_caps", action="store_true",
                    help="pick per-scene budgets exactly like the default "
                         "cli.stage1_infer path (bucketed cluster_cap from "
                         "the host-known max segment; knn_window escalation "
                         "on overflow) — the r4 divergence-free default")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from seggroup_tpu.data.synthetic import make_synthetic_scene
    from seggroup_tpu.models.seggroup import SegGroupGNN

    n = args.num_points
    # exact: budgets cover any cluster (cap rounded to the full scene)
    exact = SegGroupGNN(cluster_cap=n, knn_window=n, sequential=True)

    prod_fns = {}

    def fwd_prod_at(cc, kw):
        if (cc, kw) not in prod_fns:
            m = SegGroupGNN(cluster_cap=cc, knn_window=kw, sequential=True)
            prod_fns[(cc, kw)] = jax.jit(
                lambda v, s, m=m: m.apply(v, s, mode="ins_infer",
                                          train=False))
        return prod_fns[(cc, kw)]

    @jax.jit
    def fwd_exact(v, s):
        return exact.apply(v, s, mode="ins_infer", train=False)

    print(f"{'config':>10} {'seed':>4} {'max_seg':>8} {'caps':>13} "
          f"{'d_sem':>6} {'d_ins':>6} {'d_sem2':>6} {'d_ins2':>6} "
          f"{'t_prod':>7} {'t_exact':>7}")
    total_diff = 0
    variables = None
    for cfg in args.configs.split(","):
        ni, spi = (int(x) for x in cfg.split("x"))
        for seed in range(args.seeds):
            scene = make_synthetic_scene(
                seed=seed, num_points=n, num_slots=args.num_slots,
                num_edges=4096, num_instances=ni, segs_per_instance=spi,
                jax_arrays=False)
            scene = jax.device_put(scene)
            if variables is None:
                variables = jax.jit(
                    lambda r1, r2, s: exact.init(
                        {"params": r1, "dropout": r2}, s, mode="ins_infer",
                        train=False)
                )(jax.random.PRNGKey(0), jax.random.PRNGKey(1), scene)
            p2s = np.asarray(scene.point2seg)
            seg_sizes = np.bincount(p2s[p2s < args.num_slots])

            cc, kw = args.cluster_cap, args.knn_window
            if args.auto_caps:
                from cli.stage1_common import (CLUSTER_CAP_BUCKETS,
                                               KNN_WINDOW_BUCKETS,
                                               pick_bucket)
                cc = pick_bucket(int(seg_sizes.max()), CLUSTER_CAP_BUCKETS,
                                 args.cluster_cap)
            t0 = time.time()
            out_p = fwd_prod_at(cc, kw)(variables, scene)
            if args.auto_caps:
                # knn_window escalation exactly like cli.stage1_infer
                while (int(out_p.max_cluster_size) > kw
                       and pick_bucket(int(out_p.max_cluster_size),
                                       KNN_WINDOW_BUCKETS, kw + 1) > kw):
                    kw = pick_bucket(int(out_p.max_cluster_size),
                                     KNN_WINDOW_BUCKETS, kw + 1)
                    out_p = fwd_prod_at(cc, kw)(variables, scene)
            sem_p = np.asarray(out_p.final_sem)
            t_prod = time.time() - t0
            t0 = time.time()
            out_e = fwd_exact(variables, scene)
            sem_e = np.asarray(out_e.final_sem)
            t_exact = time.time() - t0

            d_sem = int((sem_p != sem_e).sum())
            d_ins = int((np.asarray(out_p.final_ins)
                         != np.asarray(out_e.final_ins)).sum())
            d_sem2 = int((np.asarray(out_p.sem_layer2)
                          != np.asarray(out_e.sem_layer2)).sum())
            d_ins2 = int((np.asarray(out_p.ins_layer2)
                          != np.asarray(out_e.ins_layer2)).sum())
            total_diff += d_sem + d_ins + d_sem2 + d_ins2
            print(f"{cfg:>10} {seed:>4} {int(seg_sizes.max()):>8} "
                  f"{cc:>6}/{kw:>6} {d_sem:>6} {d_ins:>6} {d_sem2:>6} "
                  f"{d_ins2:>6} {t_prod:>6.1f}s {t_exact:>6.1f}s")
    print(f"total exported-label differences: {total_diff} "
          f"/ {args.seeds * len(args.configs.split(',')) * 4 * n} labels")
    return 0 if total_diff == 0 else 1


if __name__ == "__main__":
    sys.exit(main())
