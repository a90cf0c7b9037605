"""Padded segment-graph grouping engine (the TPU-native heart of stage 1).

The reference keeps a Python `DisjointSet` with per-cluster member lists and
runs sequential union-find loops over edge lists (reference
seggroup/model.py:169-302, 439-509). On TPU we keep everything fixed-shape:

  * segments live in S static slots; `root: (S,)` maps every slot to its
    current root slot and is kept *fully compressed* (the reference does the
    same: `cluster_id[indexs[id1]] = id2` flattens the whole member list on
    every union, model.py:186) — so find() is a single gather;
  * edges live in E static slots with a validity mask, kept sorted
    lexicographically by (root_lo, root_hi), which reproduces the reference's
    cluster/edge enumeration order (update_adj sorts + dedups in compact-index
    order, model.py:291-302; compact ids ascend with root slot index because
    get_cluster_list scans slots in order, model.py:209-214);
  * a union is a masked vector update; the threshold merge pass is a
    `lax.scan` over the edge list, which preserves the reference's *sequential*
    merge semantics exactly — including the order-dependent label-conflict
    guard (model.py:184-185) that a naive parallel connected-components pass
    would violate;
  * per-cluster feature aggregation / matrices are segment reductions and
    scatters at slot granularity (no compaction is ever performed; "active"
    slots are those with root[i] == i).

Weak-label algebra (kept bit-identical to model.py:188-190): labels are ints
with -1 = unlabeled; on a merge of r1 into r2 with differing ins labels the
surviving label is `-l1*l2`, which resolves to the non-(-1) operand.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from seggroup_tpu.ops.segment_ops import segment_max, segment_mean, segment_min, segment_sum

__all__ = [
    "SegGraph",
    "init_graph",
    "normalize_edges",
    "group_nearby_clusters",
    "absorb_small_clusters",
    "group_unlabeled_clusters",
    "aggregate_cluster_feature",
    "edge_distances",
    "edge_similarities",
    "build_similarity_matrix",
    "build_distance_matrix",
    "active_mask",
]

INVALID_KEY = jnp.iinfo(jnp.int32).max
DIST_DEFAULT = 1000.0  # reference build_distance_matrix fill (model.py:313)


class SegGraph(NamedTuple):
    """Fixed-shape disjoint-set over S segment slots."""

    root: jax.Array       # (S,) int32, fully compressed
    point_num: jax.Array  # (S,) int32, valid at root slots
    ins_label: jax.Array  # (S,) int32, weak instance label at root slots, -1 = none
    sem_label: jax.Array  # (S,) int32, weak semantic label at root slots
    seg_valid: jax.Array  # (S,) bool, slot holds a real segment

    @property
    def num_slots(self) -> int:
        return self.root.shape[0]


def active_mask(g: SegGraph) -> jax.Array:
    """(S,) bool: slot is a live cluster root."""
    s = g.root.shape[0]
    return g.seg_valid & (g.root == jnp.arange(s, dtype=g.root.dtype))


def init_graph(
    point2seg: jax.Array,
    weak_ins: jax.Array,
    weak_sem: jax.Array,
    num_slots: int,
) -> SegGraph:
    """Build the initial graph from per-point segment assignment + weak labels.

    point2seg: (N,) int32 in [0, num_slots) (use >= num_slots for padding pts).
    weak_ins/weak_sem: (S,) int32 per-segment weak labels (-1 unlabeled).
    Mirrors the reference's DisjointSet init from seg.json member lists
    (model.py:712-721)."""
    s = num_slots
    counts = segment_sum(jnp.ones_like(point2seg), point2seg, s)
    return SegGraph(
        root=jnp.arange(s, dtype=jnp.int32),
        point_num=counts.astype(jnp.int32),
        ins_label=weak_ins.astype(jnp.int32),
        sem_label=weak_sem.astype(jnp.int32),
        seg_valid=counts > 0,
    )


# ---------------------------------------------------------------------------
# unions
# ---------------------------------------------------------------------------


def _union(g: SegGraph, r1: jax.Array, r2: jax.Array, do: jax.Array) -> SegGraph:
    """Merge root r1 into root r2 where `do` (scalar bool). Caller must pass
    actual roots. Applies the reference's label-conflict guard internally."""
    i1, i2 = g.ins_label[r1], g.ins_label[r2]
    blocked = (i1 != -1) & (i2 != -1) & (i1 != i2)
    do = do & (r1 != r2) & ~blocked

    root = jnp.where(do & (g.root == r1), r2, g.root)
    pn = g.point_num.at[r2].add(jnp.where(do, g.point_num[r1], 0))
    s1, s2 = g.sem_label[r1], g.sem_label[r2]
    differ = i1 != i2
    new_ins = jnp.where(differ, -i1 * i2, i2)
    new_sem = jnp.where(differ, -s1 * s2, s2)
    ins = g.ins_label.at[r2].set(jnp.where(do, new_ins, i2))
    sem = g.sem_label.at[r2].set(jnp.where(do, new_sem, s2))
    return SegGraph(root, pn, ins, sem, g.seg_valid)


# ---------------------------------------------------------------------------
# edge bookkeeping
# ---------------------------------------------------------------------------


def normalize_edges(
    g: SegGraph, edges: jax.Array, edge_valid: jax.Array
) -> tuple[jax.Array, jax.Array]:
    """Map edge endpoints to live roots, drop self-edges, dedup, and sort
    lexicographically by (lo, hi). Fixed output shape: same E slots, valid
    prefix. TPU replacement for reference update_adj (model.py:291-302)."""
    s = g.num_slots
    e0 = g.root[jnp.clip(edges[:, 0], 0, s - 1)]
    e1 = g.root[jnp.clip(edges[:, 1], 0, s - 1)]
    lo = jnp.minimum(e0, e1)
    hi = jnp.maximum(e0, e1)
    valid = edge_valid & (lo != hi)
    key = jnp.where(valid, lo * s + hi, INVALID_KEY)
    order = jnp.argsort(key)
    key = key[order]
    dup = jnp.concatenate([jnp.array([False]), key[1:] == key[:-1]])
    valid = (key != INVALID_KEY) & ~dup
    lo_s = jnp.where(valid, key // s, 0)
    hi_s = jnp.where(valid, key % s, 0)
    return jnp.stack([lo_s, hi_s], axis=1).astype(jnp.int32), valid


def edge_distances(
    feat: jax.Array, g: SegGraph, edges: jax.Array, eps: float = 1e-6
) -> jax.Array:
    """L2 feature distance between edge endpoint clusters (features live at
    root slots). Mirrors calculate_distance (model.py:269-274; torch
    pairwise_distance adds eps inside the norm)."""
    f1 = feat[edges[:, 0]]
    f2 = feat[edges[:, 1]]
    d = f1 - f2 + eps
    return jnp.sqrt(jnp.sum(d * d, axis=-1))


def edge_similarities(
    feat: jax.Array, g: SegGraph, edges: jax.Array, alpha: float = 1.0
) -> jax.Array:
    """exp(-alpha * dist), reference calculate_similarity (model.py:262-265)."""
    return jnp.exp(-edge_distances(feat, g, edges) * alpha)


def build_similarity_matrix(
    sims: jax.Array, edges: jax.Array, edge_valid: jax.Array, num_slots: int
) -> jax.Array:
    """(S, S) symmetric similarity matrix with unit diagonal (reference
    model.py:305-309). Inactive slots keep identity rows, so the GCN's row
    normalization leaves them inert."""
    m = jnp.eye(num_slots, dtype=sims.dtype)
    vals = jnp.where(edge_valid, sims, 0.0)
    # route invalid edges to the diagonal of slot 0 with value 0 (no-op add is
    # wrong for .set, so scatter into a throwaway cell):
    r = jnp.where(edge_valid, edges[:, 0], 0)
    c = jnp.where(edge_valid, edges[:, 1], 0)
    m = m.at[r, c].set(jnp.where(edge_valid, vals, m[0, 0] * 0 + 1.0))
    m = m.at[c, r].set(jnp.where(edge_valid, vals, m[0, 0] * 0 + 1.0))
    return m


def build_distance_matrix(
    dists: jax.Array, edges: jax.Array, edge_valid: jax.Array, num_slots: int
) -> jax.Array:
    """(S, S) distance matrix, default DIST_DEFAULT (reference model.py:312-316)."""
    m = jnp.full((num_slots, num_slots), jnp.float32(DIST_DEFAULT))
    r = jnp.where(edge_valid, edges[:, 0], 0)
    c = jnp.where(edge_valid, edges[:, 1], 0)
    vals = jnp.where(edge_valid, dists, jnp.float32(DIST_DEFAULT))
    m = m.at[r, c].set(vals)
    m = m.at[c, r].set(vals)
    return m


def aggregate_cluster_feature(
    feat: jax.Array, g: SegGraph, prev_active: jax.Array, use_avg: bool = False
) -> jax.Array:
    """Max-pool features of previous-layer clusters into their new roots
    (reference aggregate_cluster_feature, model.py:278-288). `prev_active`
    marks the slots that held features before the merge."""
    s = g.num_slots
    ids = jnp.where(prev_active, g.root, s)  # out-of-range => dropped
    out = segment_max(feat, ids, s)
    if use_avg:
        avg = segment_mean(feat, ids, s)
        out = jnp.concatenate([out, avg], axis=-1)
    return out


# ---------------------------------------------------------------------------
# grouping passes
# ---------------------------------------------------------------------------


def _constrained_merge_rounds(
    g: SegGraph, edges: jax.Array, eligible_fn
) -> SegGraph:
    """Parallel label-constrained union of edges selected by `eligible_fn`.

    The reference merges edges one-by-one with a conflict guard
    (model.py:218-226). The end state it reaches satisfies exactly: every
    selected edge is either intra-cluster or joins two clusters with distinct
    non-(-1) instance labels (labels of labeled clusters are permanent, so a
    once-blocked edge stays blocked). We reach a state with the same invariant
    in O(log) parallel rounds:

      * CC phase — edges whose endpoints are both unlabeled or share a label
        commute freely (merging them never creates or changes a label), so
        they are contracted by parallel min-root propagation;
      * attach phase — each *unlabeled* cluster root merges into the labeled
        root of exactly one incident eligible edge (lowest edge index, i.e.
        scan-order tie-break); one attachment per root per round makes label
        conflicts within a round impossible.

    Partitions agree exactly with the sequential reference whenever each
    connected component holds <= 1 distinct label (the overwhelmingly common
    case); multi-label components are split with the same invariant but a
    nearest-label tie-break instead of scan order (documented deviation —
    see tests/test_grouping.py oracle comparisons).

    `eligible_fn(g, root_e0, root_e1) -> bool mask` decides which edges want
    to merge given the current graph (threshold pass: static `dist <= th`;
    small-cluster pass: live `point_num < min_points`)."""
    s = g.num_slots
    e0, e1 = edges[:, 0], edges[:, 1]
    base_counts = jnp.where(g.seg_valid, g.point_num, 0)

    def recount(root):
        return segment_sum(base_counts, jnp.where(g.seg_valid, root, s), s).astype(
            g.point_num.dtype
        )

    def cc_contract(root, ins):
        """Min-root propagation over commuting eligible edges to fixpoint."""

        def body(carry):
            root, _ = carry
            r0, r1 = root[e0], root[e1]
            l0, l1 = ins[r0], ins[r1]
            graph2 = g._replace(root=root, ins_label=ins, point_num=recount(root))
            elig = eligible_fn(graph2, r0, r1) & (r0 != r1)
            commute = elig & (((l0 == -1) & (l1 == -1)) | (l0 == l1))
            tgt = jnp.minimum(r0, r1)
            big = jnp.int32(s)
            prop = jnp.full((s,), big).at[
                jnp.where(commute, r0, s - 1)
            ].min(jnp.where(commute, tgt, big))
            prop = prop.at[jnp.where(commute, r1, s - 1)].min(
                jnp.where(commute, tgt, big)
            )
            new = jnp.minimum(root, prop[root])
            new = jnp.minimum(new, new[new])  # pointer jumping
            return new, jnp.any(new != root)

        root, _ = jax.lax.while_loop(
            lambda c: c[1], body, (root, jnp.array(True))
        )
        return root

    def attach(root, ins, sem):
        """Each unlabeled root joins the labeled root of its lowest-index
        eligible edge. Returns updated (root, changed)."""
        r0, r1 = root[e0], root[e1]
        l0, l1 = ins[r0], ins[r1]
        graph2 = g._replace(root=root, ins_label=ins, point_num=recount(root))
        elig = eligible_fn(graph2, r0, r1) & (r0 != r1)
        att = elig & ((l0 == -1) ^ (l1 == -1))
        u = jnp.where(l0 == -1, r0, r1)  # unlabeled side
        lab = jnp.where(l0 == -1, r1, r0)  # labeled side
        eidx = jnp.arange(edges.shape[0], dtype=jnp.int32)
        big = jnp.int32(edges.shape[0])
        choice = jnp.full((s,), big).at[jnp.where(att, u, s - 1)].min(
            jnp.where(att, eidx, big)
        )
        has = choice < big
        chosen_lab = lab[jnp.minimum(choice, big - 1)]
        mapping = jnp.where(has, chosen_lab, jnp.arange(s, dtype=jnp.int32))
        new = mapping[root]
        return new, jnp.any(new != root)

    def round_body(carry):
        root, ins, sem, _ = carry
        root = cc_contract(root, ins)
        root, changed = attach(root, ins, sem)
        return root, ins, sem, changed

    root, ins, sem = g.root, g.ins_label, g.sem_label
    root = cc_contract(root, ins)
    root, changed = attach(root, ins, sem)
    root, ins, sem, _ = jax.lax.while_loop(
        lambda c: c[3], round_body, (root, ins, sem, changed)
    )
    # labels live at surviving roots: a root's label never changed during the
    # merges above (labeled roots absorb, unlabeled roots merge into labeled
    # or stay unlabeled) — so ins/sem arrays are still correct at roots.
    return g._replace(root=root, point_num=recount(root))


def group_nearby_clusters(
    g: SegGraph,
    edges: jax.Array,
    edge_valid: jax.Array,
    dists: jax.Array,
    th: float,
    min_points: int = 5,
) -> tuple[SegGraph, jax.Array]:
    """Threshold-merge adjacent clusters, then force-absorb sub-`min_points`
    clusters (reference group_nearby_clusters, model.py:218-258) — parallel
    rounds formulation (see _constrained_merge_rounds; the sequential
    reference-order variant is group_nearby_clusters_sequential).

    Returns (graph, connected_mask) where connected_mask marks edges whose
    endpoints ended up in the same cluster (the reference's adj_connected /
    adj_unconnected partition, model.py:241-258)."""
    passing = edge_valid & (dists <= th)
    g = _constrained_merge_rounds(g, edges, lambda gg, r0, r1: passing)

    def small_elig(gg, r0, r1):
        return edge_valid & (
            (gg.point_num[r0] < min_points) | (gg.point_num[r1] < min_points)
        )

    g = _constrained_merge_rounds(g, edges, small_elig)

    connected = edge_valid & (g.root[edges[:, 0]] == g.root[edges[:, 1]])
    return g, connected


def group_nearby_clusters_sequential(
    g: SegGraph,
    edges: jax.Array,
    edge_valid: jax.Array,
    dists: jax.Array,
    th: float,
    min_points: int = 5,
    compact_budget: int | None = None,
) -> tuple[SegGraph, jax.Array]:
    """Exact sequential-order emulation of the reference merge loop
    (model.py:218-258) via lax.scan — bit-faithful but latency-bound on TPU;
    kept for parity testing against the numpy oracle.

    Exact compaction (same argument as absorb_small_clusters): eligibility
    `edge_valid & (dist <= th)` is state-INDEPENDENT — dists are computed
    once before the loop in both us and the reference (model.py:262-274) —
    so ineligible edges are permanent no-ops. Scanning only the eligible
    edges, gathered into a `compact_budget` prefix in stable order, is
    bit-identical to the full scan; overflow falls back via lax.cond."""

    def thresh_step(graph, inp):
        e, valid, dist = inp
        r1 = graph.root[e[0]]
        r2 = graph.root[e[1]]
        do = valid & (dist <= th)
        return _union(graph, r1, r2, do), None

    E = edges.shape[0]
    if compact_budget is None:
        compact_budget = max(min(E, 256), E // 4)
    eligible = edge_valid & (dists <= th)
    if compact_budget >= E:
        g, _ = jax.lax.scan(thresh_step, g, (edges, edge_valid, dists))
    else:
        order = jnp.argsort(~eligible, stable=True).astype(jnp.int32)
        sel = order[:compact_budget]
        count = jnp.sum(eligible.astype(jnp.int32))
        g = jax.lax.cond(
            count <= compact_budget,
            lambda graph: jax.lax.scan(
                thresh_step, graph,
                (edges[sel], eligible[sel], dists[sel]))[0],
            lambda graph: jax.lax.scan(
                thresh_step, graph, (edges, edge_valid, dists))[0],
            g,
        )
    g = absorb_small_clusters(g, edges, edge_valid, min_points)

    connected = edge_valid & (g.root[edges[:, 0]] == g.root[edges[:, 1]])
    return g, connected


def absorb_small_clusters(
    g: SegGraph, edges: jax.Array, edge_valid: jax.Array, min_points: int = 5,
    compact_budget: int | None = None,
) -> SegGraph:
    """Repeatedly merge across edges touching a cluster with < min_points points
    until a full pass makes no merge (reference model.py:228-239; we terminate
    on no-actual-merge, which also fixes the reference's potential livelock when
    the only small-cluster edges are label-blocked).

    Exact compaction: cluster sizes only grow during absorption, and a
    cluster that is small at any time consists solely of initially-small
    clusters — so an edge can only EVER be eligible if one endpoint's cluster
    is small at absorb start. Those edges (usually a handful) are gathered
    into a `compact_budget`-slot prefix (stable order, so the fold over them
    is bit-identical to the full scan whose skipped steps are permanent
    no-ops); if they overflow the budget a lax.cond falls back to the full
    scan. Cuts the dominant absorb scans from O(E) to O(budget) steps."""
    E = edges.shape[0]
    if compact_budget is None:
        compact_budget = max(min(E, 128), E // 8)

    def passes(graph, e, v):
        def one_pass(graph):
            def step(carry, inp):
                graph, merged = carry
                e, valid = inp
                r1 = graph.root[e[0]]
                r2 = graph.root[e[1]]
                small = (graph.point_num[r1] < min_points) | (
                    graph.point_num[r2] < min_points
                )
                do = valid & small & (r1 != r2)
                i1, i2 = graph.ins_label[r1], graph.ins_label[r2]
                blocked = (i1 != -1) & (i2 != -1) & (i1 != i2)
                merged = merged | (do & ~blocked)
                return (_union(graph, r1, r2, do), merged), None

            (graph, merged), _ = jax.lax.scan(
                step, (graph, jnp.array(False)), (e, v)
            )
            return graph, merged

        graph, merged = one_pass(graph)
        graph, _ = jax.lax.while_loop(
            lambda c: c[1], lambda c: one_pass(c[0]), (graph, merged)
        )
        return graph

    if compact_budget >= E:
        return passes(g, edges, edge_valid)

    s = g.num_slots
    r0 = g.root[jnp.clip(edges[:, 0], 0, s - 1)]
    r1 = g.root[jnp.clip(edges[:, 1], 0, s - 1)]
    touch = edge_valid & (
        (g.point_num[r0] < min_points) | (g.point_num[r1] < min_points)
    )
    order = jnp.argsort(~touch, stable=True).astype(jnp.int32)
    sel = order[:compact_budget]
    e_c = edges[sel]
    v_c = touch[sel]
    count = jnp.sum(touch.astype(jnp.int32))
    return jax.lax.cond(
        count <= compact_budget,
        lambda graph: passes(graph, e_c, v_c),
        lambda graph: passes(graph, edges, edge_valid),
        g,
    )


def group_unlabeled_clusters(
    g: SegGraph,
    feat: jax.Array,
    edges: jax.Array,
    edge_valid: jax.Array,
    points: jax.Array,
    point2seg: jax.Array,
) -> tuple[SegGraph, jax.Array, jax.Array, jax.Array]:
    """Absorb unlabeled clusters (reference group_unlabeled_clusters,
    model.py:439-509): iteratively merge each unlabeled cluster into its
    feature-nearest adjacent cluster until the cluster count stops shrinking,
    then spatially absorb any stragglers into the nearest labeled cluster.

    points/point2seg give per-point coordinates and (static) initial segment
    assignment, used for the spatial fallback. Returns
    (graph, feat, edges, edge_valid).

    NOTE: this function is not reverse-differentiable (the fixpoint while-loop
    carries `feat`); gradients are cut internally. Because max-aggregation is
    associative, callers recover the exact differentiable feature path by
    re-aggregating their pre-call features over the returned graph:
    `feat5 = aggregate_cluster_feature(feat4, g_out, active_before)` — this
    equals the reference's incremental per-round aggregation
    (model.py:470,507)."""
    s = g.num_slots
    feat = jax.lax.stop_gradient(feat)
    points = jax.lax.stop_gradient(points)

    def count_active(graph):
        return jnp.sum(active_mask(graph).astype(jnp.int32))

    def fixpoint_body(carry):
        graph, feat, edges, edge_valid, _prev = carry
        before = count_active(graph)
        act = active_mask(graph)
        dists = edge_distances(feat, graph, edges)
        dmat = build_distance_matrix(dists, edges, edge_valid, s)
        # emulate compact-space argmin: inactive columns must lose to active
        # DIST_DEFAULT columns; ties resolve to the smallest slot (= smallest
        # compact index, since compact enumeration ascends with slot).
        col_pen = jnp.where(act[None, :], 0.0, jnp.float32(1e9))
        argmin_slot = jnp.argmin(dmat + col_pen, axis=-1).astype(jnp.int32)

        def row_step(graph, inp):
            slot, was_active, target = inp
            r1 = graph.root[slot]
            do = was_active & (graph.ins_label[r1] == -1)
            r2 = graph.root[target]
            return _union(graph, r1, r2, do), None

        slots = jnp.arange(s, dtype=jnp.int32)
        graph, _ = jax.lax.scan(row_step, graph, (slots, act, argmin_slot))

        feat = aggregate_cluster_feature(feat, graph, act)
        edges, edge_valid = normalize_edges(graph, edges, edge_valid)
        return graph, feat, edges, edge_valid, before

    def fixpoint_cond(carry):
        graph, *_rest, prev = carry
        # stop when a full round leaves the cluster count unchanged
        # (reference model.py:474-477)
        return count_active(graph) != prev

    prev = jnp.int32(-1)
    g, feat, edges, edge_valid, prev = jax.lax.while_loop(
        fixpoint_cond, fixpoint_body, (g, feat, edges, edge_valid, prev)
    )

    # ---- spatial fallback for clusters with no labeled adjacency path ----
    act = active_mask(g)
    point2root = g.root[jnp.clip(point2seg, 0, s - 1)]
    pt_valid = point2seg < s
    point2root = jnp.where(pt_valid, point2root, s)
    centroid = segment_mean(points, point2root, s)  # (S, 3)

    # D[i, c] = min over points p of cluster c of ||centroid_i - p||^2,
    # computed in point blocks to bound memory (reference uses the 1024-pt
    # resampled cloud, model.py:479-487; we use the exact member set).
    n = points.shape[0]
    blk = 8192
    n_pad = -(-n // blk) * blk
    pts_p = jnp.pad(points, ((0, n_pad - n), (0, 0)))
    p2r_p = jnp.pad(point2root, (0, n_pad - n), constant_values=s)

    def block_min(carry, i):
        dmin = carry
        p = jax.lax.dynamic_slice(pts_p, (i * blk, 0), (blk, 3))
        cid = jax.lax.dynamic_slice(p2r_p, (i * blk,), (blk,))
        # (S, blk) distances centroid_i -> point. HIGHEST is load-bearing:
        # TPU DEFAULT matmul precision is one bf16 pass whose O(|x||y|*2^-8)
        # cross-term error swamps metric-scale distance comparisons (see
        # ops/knn.py pairwise_sqdist)
        d = (
            jnp.sum(centroid * centroid, axis=1, keepdims=True)
            - 2.0 * jnp.dot(centroid, p.T,
                            precision=jax.lax.Precision.HIGHEST)
            + jnp.sum(p * p, axis=1)[None, :]
        )
        upd = segment_min(d.T, cid, s, fill_value=jnp.float32(1e30)).T  # (S, S)
        return jnp.minimum(dmin, upd), None

    dmin0 = jnp.full((s, s), jnp.float32(1e30))
    dmat_sp, _ = jax.lax.scan(block_min, dmin0, jnp.arange(n_pad // blk))

    any_unlabeled = jnp.any(act & (g.ins_label == -1))

    def spatial_step(graph, inp):
        slot, was_active = inp
        r1 = graph.root[slot]
        need = was_active & (graph.ins_label[r1] == -1)
        # nearest snapshot cluster whose LIVE root is labeled
        tgt_root = graph.root  # live roots of snapshot slots
        eligible = act & (graph.ins_label[tgt_root] != -1) & (
            jnp.arange(s) != slot
        )
        d = jnp.where(eligible, dmat_sp[slot], jnp.float32(1e30))
        j = jnp.argmin(d).astype(jnp.int32)
        ok = need & (d[j] < 1e30)
        return _union(graph, r1, graph.root[j], ok), None

    def do_spatial(graph):
        slots = jnp.arange(s, dtype=jnp.int32)
        graph, _ = jax.lax.scan(spatial_step, graph, (slots, act))
        return graph

    g = jax.lax.cond(any_unlabeled, do_spatial, lambda x: x, g)
    feat = jax.lax.cond(
        any_unlabeled,
        lambda f: aggregate_cluster_feature(f, g, act),
        lambda f: f,
        feat,
    )
    edges, edge_valid = normalize_edges(g, edges, edge_valid)
    return g, feat, edges, edge_valid
