"""Quantify parallel-vs-sequential grouping divergence at realistic scale.

The parallel-rounds engine (ops/grouping.py:_constrained_merge_rounds) matches
the reference's sequential edge-order semantics (reference
seggroup/model.py:218-258) exactly on single-label connected components; on
multi-label components it splits with a nearest-label tie-break instead of
scan order. This sweep measures how often that matters on graphs shaped like
real post-oversegmentation scenes: 512 segment slots, 4096 edge slots,
instances as connected segment blobs, cross-instance edges below threshold to
force multi-label components (the worst case for order dependence).

Reported per configuration:
  * partition divergence rate   — fraction of graphs whose final partitions
    (as set-of-frozensets) differ between modes;
  * point label disagreement    — point-count-weighted fraction of segments
    whose exported instance label differs between modes;
  * sem mIoU delta vs GT        — |mIoU_parallel - mIoU_sequential| against
    the generating instance layout (point-weighted, per-class IoU over
    classes present in GT).

Results feed the table in docs/ARCHITECTURE.md ("Parallel vs sequential
grouping"). Usage: python scripts/grouping_divergence.py [--graphs 120]
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from seggroup_tpu.ops import grouping as gr

TH = 5.0


def make_graph(rng, s=512, e_slots=4096, n_instances=24, cross_frac=0.25,
               cross_below_th_frac=0.3):
    """Random multi-label graph: instances are connected segment blobs with a
    chain backbone + random intra edges; cross-instance edges are added with
    `cross_below_th_frac` of them below threshold (the divergence trigger)."""
    # partition slots into instances (contiguous runs, random sizes)
    cuts = np.sort(rng.choice(np.arange(1, s), size=n_instances - 1, replace=False))
    bounds = np.concatenate([[0], cuts, [s]])
    slot2inst = np.zeros(s, np.int64)
    for i in range(n_instances):
        slot2inst[bounds[i]:bounds[i + 1]] = i

    counts = rng.integers(5, 200, size=s).astype(np.int64)
    ins = np.full(s, -1, np.int32)
    sem = np.full(s, -1, np.int32)
    inst_sem = rng.integers(0, 20, size=n_instances).astype(np.int32)
    for i in range(n_instances):
        members = np.arange(bounds[i], bounds[i + 1])
        seed = rng.choice(members)
        ins[seed] = i
        sem[seed] = inst_sem[i]

    edges = []
    for i in range(n_instances):
        members = np.arange(bounds[i], bounds[i + 1])
        # chain backbone keeps each instance connected
        for a, b in zip(members[:-1], members[1:]):
            edges.append((a, b, rng.uniform(0.0, TH)))  # intra: below th
        # extra random intra edges
        n_extra = max(1, len(members) // 2)
        for _ in range(n_extra):
            a, b = rng.choice(members, 2, replace=True)
            if a != b:
                edges.append((min(a, b), max(a, b), rng.uniform(0.0, TH * 2)))
    n_cross = int(len(edges) * cross_frac)
    for _ in range(n_cross):
        a, b = rng.integers(0, s, 2)
        if slot2inst[a] == slot2inst[b] or a == b:
            continue
        if rng.random() < cross_below_th_frac:
            d = rng.uniform(0.0, TH)  # conflict-capable edge
        else:
            d = rng.uniform(TH, TH * 3)
        edges.append((min(a, b), max(a, b), d))

    # dedup by (lo, hi), keep first, sort lexicographically (the engine's
    # canonical edge order, ops/grouping.py normalize_edges)
    seen, ded = set(), []
    for a, b, d in edges:
        if (a, b) not in seen:
            seen.add((a, b))
            ded.append((a, b, d))
    ded.sort(key=lambda t: (t[0], t[1]))
    ded = ded[:e_slots]
    e_arr = np.zeros((e_slots, 2), np.int32)
    dists = np.full(e_slots, 1e9, np.float32)
    ev = np.zeros(e_slots, bool)
    for i, (a, b, d) in enumerate(ded):
        e_arr[i] = (a, b)
        dists[i] = d
        ev[i] = True

    gt_sem = inst_sem[slot2inst]  # (S,) ground-truth class per slot
    return counts, ins, sem, e_arr, ev, dists, gt_sem


def export_labels(g_out, s):
    root = np.asarray(g_out.root)
    return np.asarray(g_out.ins_label)[root], np.asarray(g_out.sem_label)[root]


def partition_sig(root, counts):
    groups = {}
    for i in np.where(counts > 0)[0]:
        groups.setdefault(root[i], []).append(i)
    return frozenset(frozenset(v) for v in groups.values())


def sem_miou(pred_sem, gt_sem, counts):
    """Point-weighted per-class IoU vs GT over classes present in GT; segments
    still unlabeled (-1) count against every GT class they cover."""
    ious = []
    for c in np.unique(gt_sem):
        p = pred_sem == c
        t = gt_sem == c
        inter = counts[p & t].sum()
        union = counts[p | t].sum()
        if union > 0:
            ious.append(inter / union)
    return float(np.mean(ious))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--graphs", type=int, default=120)
    ap.add_argument("--slots", type=int, default=512)
    ap.add_argument("--edges", type=int, default=4096)
    ap.add_argument("--conflict_frac", type=float, default=0.3,
                    help="fraction of cross-instance edges below threshold "
                         "(the order-dependence trigger)")
    args = ap.parse_args()

    s, e_slots = args.slots, args.edges

    @jax.jit
    def run_parallel(g, e, ev, d):
        return gr.group_nearby_clusters(g, e, ev, d, TH)

    @jax.jit
    def run_sequential(g, e, ev, d):
        return gr.group_nearby_clusters_sequential(g, e, ev, d, TH)

    rng = np.random.default_rng(0)
    n_diff_partition = 0
    disagree_pts = 0
    total_pts = 0
    miou_par, miou_seq = [], []
    t_par = t_seq = 0.0
    for trial in range(args.graphs):
        counts, ins, sem, e_arr, ev, dists, gt_sem = make_graph(
            rng, s, e_slots, cross_below_th_frac=args.conflict_frac)
        g = gr.SegGraph(
            root=jnp.arange(s, dtype=jnp.int32),
            point_num=jnp.array(counts, jnp.int32),
            ins_label=jnp.array(ins),
            sem_label=jnp.array(sem),
            seg_valid=jnp.array(counts > 0),
        )
        e_j, ev_j, d_j = jnp.array(e_arr), jnp.array(ev), jnp.array(dists)
        t0 = time.perf_counter()
        gp, _ = run_parallel(g, e_j, ev_j, d_j)
        jax.block_until_ready(gp.root)
        t1 = time.perf_counter()
        gs, _ = run_sequential(g, e_j, ev_j, d_j)
        jax.block_until_ready(gs.root)
        t2 = time.perf_counter()
        if trial > 0:  # skip compile
            t_par += t1 - t0
            t_seq += t2 - t1

        rp, rs = np.asarray(gp.root), np.asarray(gs.root)
        if partition_sig(rp, counts) != partition_sig(rs, counts):
            n_diff_partition += 1
        ins_p, sem_p = export_labels(gp, s)
        ins_s, sem_s = export_labels(gs, s)
        mask = counts > 0
        disagree_pts += counts[mask & (ins_p != ins_s)].sum()
        total_pts += counts[mask].sum()
        miou_par.append(sem_miou(sem_p, gt_sem, counts))
        miou_seq.append(sem_miou(sem_s, gt_sem, counts))

    n = args.graphs
    print(f"graphs={n} slots={s} edges={e_slots}")
    print(f"partition divergence rate : {n_diff_partition}/{n}"
          f" = {100.0 * n_diff_partition / n:.1f}%")
    print(f"point ins-label disagreement (weighted): "
          f"{100.0 * disagree_pts / total_pts:.3f}%")
    print(f"sem mIoU vs GT  parallel  : {100 * np.mean(miou_par):.2f}%")
    print(f"sem mIoU vs GT  sequential: {100 * np.mean(miou_seq):.2f}%")
    print(f"|mIoU delta|              : "
          f"{100 * abs(np.mean(miou_par) - np.mean(miou_seq)):.3f}%"
          f" (per-graph mean |d|: "
          f"{100 * np.mean(np.abs(np.array(miou_par) - np.array(miou_seq))):.3f}%)")
    print(f"wall (post-compile)       : parallel {t_par / (n - 1) * 1e3:.1f} ms/graph,"
          f" sequential {t_seq / (n - 1) * 1e3:.1f} ms/graph")


if __name__ == "__main__":
    main()
