"""Composed stage-1 numpy oracle (VERDICT r2 item 5).

An INDEPENDENT numpy emulation of the whole stage-1 forward — MLP1/2/3 +
GCN + sequential grouping + unlabeled absorption + export (reference
seggroup/model.py:684-932) — sharing weights with the flax model, asserting
bit-equal exported labels and per-layer partitions. Per-op parity tests
(test_grouping/test_knn/test_fps) cover each piece; this test fails if the
*composition* drifts: layer wiring, edge normalization order, feature
aggregation, merge thresholds, export conventions.

Configuration under test: the exact-budget path (cluster_cap = knn_window =
N, the escape hatch of docs/ARCHITECTURE.md deviations #2-3) at f32 compute
precision (compute_dtype=float32 — removes bf16 rounding as a confound; the
bf16 default differs only in edge-conv intermediate precision). The oracle
inherits the two documented deviations that are not cap-related: FPS runs
over Morton-ordered members (deviation #3's ordering; exact because cap >=
members) and the unlabeled spatial fallback uses exact member sets
(deviation #4).

Float comparisons (merge thresholds, argmins, kNN boundaries) are robust to
cross-implementation ulp noise for generic random scenes; all integer
bookkeeping (orders, FPS picks, unions, exports) is replicated exactly, so
the assertion is on bit-equal int arrays.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from seggroup_tpu.data.synthetic import make_synthetic_scene
from seggroup_tpu.models.seggroup import SegGroupGNN

N, S, E = 2048, 64, 256
KNN_K = 20
MLP1_K = 10
P_OUT = 64
BN_EPS = 1e-5
DIST_DEFAULT = np.float32(1000.0)


# ---------------------------------------------------------------------------
# numpy re-implementations (independent code, same semantics)
# ---------------------------------------------------------------------------


def np_morton3d(points, valid, bits=10):
    big = np.float32(3e38)
    lo = np.min(np.where(valid[:, None], points, big), axis=0)
    hi = np.max(np.where(valid[:, None], points, -big), axis=0)
    scale = (2.0 ** bits - 1.0) / np.maximum(hi - lo, 1e-9)
    q = np.clip((points - lo) * scale, 0, 2.0 ** bits - 1).astype(np.int32)

    def spread(x):
        x = (x | (x << 16)) & 0x030000FF
        x = (x | (x << 8)) & 0x0300F00F
        x = (x | (x << 4)) & 0x030C30C3
        x = (x | (x << 2)) & 0x09249249
        return x

    return spread(q[:, 0]) | (spread(q[:, 1]) << 1) | (spread(q[:, 2]) << 2)


def np_pairwise_sqdist(x, y):
    xx = np.sum(x * x, axis=-1, keepdims=True)
    yy = np.sum(y * y, axis=-1, keepdims=True)
    cross = x @ y.T
    return np.maximum(xx - 2.0 * cross + yy.T, 0.0)


def np_masked_fps(cand, valid, k):
    """Single-cluster FPS matching ops/fps.py masked_fps (initial_idx=0,
    skip_initial=True): elementwise f32 distance updates, argmax first-max."""
    neg = np.float32(-1.0)

    def sqd(anchor):
        d = cand - anchor
        return np.sum(d * d, axis=-1)

    min_d = np.where(valid, sqd(cand[0]), neg)
    first = int(np.argmax(min_d))
    min_d = np.where(valid, sqd(cand[first]), neg)
    out = np.zeros(k, np.int32)
    out[0] = first
    for i in range(1, k):
        nxt = int(np.argmax(min_d))
        d = np.where(valid, sqd(cand[nxt]), neg)
        min_d = np.minimum(min_d, d)
        out[i] = nxt
    return out


class NpGraph:
    """Reference-style disjoint set over S slots (model.py:169-214 semantics
    via a fully-compressed root array)."""

    def __init__(self, point2seg, weak_ins, weak_sem, s):
        self.s = s
        self.root = np.arange(s, dtype=np.int32)
        self.point_num = np.bincount(
            point2seg[point2seg < s], minlength=s).astype(np.int32)
        self.ins = weak_ins.astype(np.int32).copy()
        self.sem = weak_sem.astype(np.int32).copy()
        self.seg_valid = self.point_num > 0

    def active(self):
        return self.seg_valid & (self.root == np.arange(self.s))

    def union(self, r1, r2):
        """Merge root r1 into r2 with the label-conflict guard. Returns True
        if a merge happened."""
        if r1 == r2:
            return False
        i1, i2 = self.ins[r1], self.ins[r2]
        if i1 != -1 and i2 != -1 and i1 != i2:
            return False
        self.root[self.root == r1] = r2
        self.point_num[r2] += self.point_num[r1]
        if i1 != i2:
            self.ins[r2] = -i1 * i2
            self.sem[r2] = -self.sem[r1] * self.sem[r2]
        return True


def np_normalize_edges(g, edges, ev):
    s = g.s
    e0 = g.root[np.clip(edges[:, 0], 0, s - 1)]
    e1 = g.root[np.clip(edges[:, 1], 0, s - 1)]
    lo = np.minimum(e0, e1)
    hi = np.maximum(e0, e1)
    valid = ev & (lo != hi)
    INVALID = np.iinfo(np.int32).max
    key = np.where(valid, lo * s + hi, INVALID)
    order = np.argsort(key, kind="stable")
    key = key[order]
    dup = np.concatenate([[False], key[1:] == key[:-1]])
    valid = (key != INVALID) & ~dup
    lo_s = np.where(valid, key // s, 0)
    hi_s = np.where(valid, key % s, 0)
    return np.stack([lo_s, hi_s], 1).astype(np.int32), valid


def np_edge_distances(feat, edges, eps=1e-6):
    d = feat[edges[:, 0]] - feat[edges[:, 1]] + np.float32(eps)
    return np.sqrt(np.sum(d * d, axis=-1))


def np_group_sequential(g, edges, ev, dists, th, min_points=5):
    """group_nearby_clusters_sequential: scan-order threshold merges, then
    absorb-small passes to fixpoint (reference model.py:218-258)."""
    for e, v, d in zip(edges, ev, dists):
        if v and d <= th:
            g.union(g.root[e[0]], g.root[e[1]])
    merged = True
    while merged:
        merged = False
        for e, v in zip(edges, ev):
            if not v:
                continue
            r1, r2 = g.root[e[0]], g.root[e[1]]
            if r1 == r2:
                continue
            if g.point_num[r1] < min_points or g.point_num[r2] < min_points:
                merged |= g.union(r1, r2)
    return g


def np_aggregate(feat, g, prev_active):
    out = np.zeros((g.s, feat.shape[1]), feat.dtype)
    got = np.zeros(g.s, bool)
    for slot in range(g.s):
        if not prev_active[slot]:
            continue
        r = g.root[slot]
        out[r] = np.maximum(out[r], feat[slot]) if got[r] else feat[slot]
        got[r] = True
    return out


def np_cluster_pointclouds(points, point2root, s, p_out, cap):
    n = len(points)
    cid = np.where(point2root < s, point2root, s)
    m_order = np.argsort(np_morton3d(points[:, :3], cid < s), kind="stable")
    order = m_order[np.argsort(cid[m_order], kind="stable")]
    sorted_cid = cid[order]
    clouds = np.zeros((s, p_out, points.shape[1]), np.float32)
    slot_valid = np.zeros(s, bool)
    start = np.searchsorted(sorted_cid, np.arange(s), side="left")
    stop = np.searchsorted(sorted_cid, np.arange(s), side="right")
    for slot in range(s):
        cnt = stop[slot] - start[slot]
        if cnt == 0:
            continue
        slot_valid[slot] = True
        i = np.arange(cap, dtype=np.int32)
        if cnt <= cap:
            pos_in = np.minimum(i, cnt - 1)
        else:
            pos_in = (i.astype(np.float32) * np.int32(cnt) / cap).astype(np.int32)
        members = order[np.clip(start[slot] + pos_in, 0, n - 1)]
        mvalid = i < min(cnt, cap)
        fps_idx = np_masked_fps(points[members, :3], mvalid, p_out)
        rep = p_out // cnt
        j = np.arange(p_out, dtype=np.int32)
        tiled = j % cnt
        use_tile = j < rep * cnt
        fps_pos = fps_idx[np.clip(j - rep * cnt, 0, p_out - 1)]
        pick = np.where(use_tile, tiled, fps_pos)
        cloud = points[members[pick]]
        xyz = cloud[:, :3] - cloud[:, :3].mean(0, keepdims=True)
        denom = max(np.max(np.abs(xyz)), 1e-12)
        clouds[slot] = np.concatenate([xyz / denom, cloud[:, 3:]], axis=1)
    return clouds, slot_valid


def np_bn_eval(x, p_bn, stats):
    mean = np.asarray(stats["mean"], np.float32)
    var = np.asarray(stats["var"], np.float32)
    y = (x - mean) / np.sqrt(var + BN_EPS)
    return y * np.asarray(p_bn["scale"], np.float32) + np.asarray(
        p_bn["bias"], np.float32)


def np_leaky(x):
    return np.where(x >= 0, x, np.float32(0.2) * x)


def np_mlp1(clouds, slot_valid, params, stats):
    s, p, _ = clouds.shape
    out = np.zeros((s, 128), np.float32)
    w = np.asarray(params["conv1"]["kernel"], np.float32)
    for slot in range(s):
        if not slot_valid[slot]:
            continue
        cloud = clouds[slot]
        d = np_pairwise_sqdist(cloud[:, :3], cloud[:, :3])
        idx = np.argsort(d, axis=1, kind="stable")[:, :MLP1_K]
        nbr = cloud[idx]  # (P, k, 6)
        xyz = nbr[:, :, :3]
        xyz = (xyz - xyz.mean(1, keepdims=True)) * np.float32(10.0)
        feat = np.concatenate([xyz, nbr[:, :, 3:]], axis=-1)
        h = feat @ w
        h = np_bn_eval(h, params["bn1"], stats["bn1"])
        h = np_leaky(h)
        h = h.max(1)  # over k -> (P, 64)
        out[slot] = np.concatenate([h.max(0), h.mean(0)])
    return out


def np_cluster_knn_exact(points, cluster_ids, k):
    """cluster_knn with window >= any cluster: exact per-cluster kNN; rows
    in clusters smaller than k repeat the self index. Candidate order =
    (cluster, morton) sorted position; ties break ascending position."""
    n = len(points)
    valid = cluster_ids < 0x3FFFFFFF
    m_order = np.argsort(np_morton3d(points, valid), kind="stable")
    order = m_order[np.argsort(cluster_ids[m_order], kind="stable")]
    s_cid = cluster_ids[order]
    out = np.zeros((n, k), np.int32)
    pos = 0
    while pos < n:
        end = pos
        while end < n and s_cid[end] == s_cid[pos]:
            end += 1
        members = order[pos:end]
        sub = points[members]
        d = np_pairwise_sqdist(sub, sub)
        take = min(k, len(members))
        sel = np.argsort(d, axis=1, kind="stable")[:, :take]
        for row in range(len(members)):
            pi = members[row]
            out[pi, :take] = members[sel[row]]
            out[pi, take:] = pi
        pos = end
    return out


def np_edge_conv(x, idx, pt_valid, params, stats, layers):
    nbr = x[idx]
    self_f = np.broadcast_to(x[:, None, :], nbr.shape)
    feat = np.concatenate([nbr - self_f, self_f], axis=-1)
    h = feat @ np.asarray(params["conv1"]["kernel"], np.float32)
    h = np_leaky(np_bn_eval(h, params["bn1"], stats["bn1"]))
    if layers == 2:
        h = h @ np.asarray(params["conv2"]["kernel"], np.float32)
        h = np_leaky(np_bn_eval(h, params["bn2"], stats["bn2"]))
    h = h.max(1)
    return np.where(pt_valid[:, None], h, 0.0).astype(np.float32)


def np_segment_mean(data, ids, s):
    out = np.zeros((s, data.shape[1]), np.float32)
    cnt = np.bincount(ids[ids < s], minlength=s).astype(np.float32)
    for c in range(data.shape[1]):
        out[:, c] = np.bincount(ids[ids < s], weights=data[ids < s, c],
                                minlength=s)
    return out / np.maximum(cnt, 1.0)[:, None]


def np_segment_max(data, ids, s):
    out = np.zeros((s, data.shape[1]), np.float32)
    got = np.zeros(s, bool)
    for i in range(len(data)):
        r = ids[i]
        if r >= s:
            continue
        out[r] = np.maximum(out[r], data[i]) if got[r] else data[i]
        got[r] = True
    return out


def np_gcn(feat, sims, edges, ev, w, s):
    m = np.eye(s, dtype=np.float32)
    for (a, b), v, sim in zip(edges, ev, sims):
        if v:
            m[a, b] = sim
            m[b, a] = sim
    norm = m / m.sum(1, keepdims=True)
    return np.maximum(norm @ feat @ w, 0.0)


def np_semantic_layer(feat_in, g, edges, ev, pts, roots, pt_valid,
                      mlp_params, mlp_stats, layers, gcn_w, alpha, th):
    s = g.s
    knn_idx = np_cluster_knn_exact(
        pts[:, :3], np.where(pt_valid, roots, 0x3FFFFFFF).astype(np.int64),
        KNN_K)
    center = np_segment_mean(pts[:, :3], roots, s)
    centered = pts[:, :3] - center[np.minimum(roots, s - 1)]
    data9 = np.concatenate([pts, centered], axis=1)
    point_feat = np_edge_conv(data9, knn_idx, pt_valid, mlp_params,
                              mlp_stats, layers)
    pooled = np_segment_max(point_feat, np.where(pt_valid, roots, s), s)
    feat = np.concatenate([feat_in, pooled], axis=1)
    dists = np_edge_distances(feat, edges)
    sims = np.exp(-dists * np.float32(alpha))
    feat = np_gcn(feat, sims, edges, ev, gcn_w, s)
    d = np_edge_distances(feat, edges)
    act_before = g.active()
    np_group_sequential(g, edges, ev, d, th)
    edges, ev = np_normalize_edges(g, edges, ev)
    return feat, edges, ev, act_before


def np_group_unlabeled(g, feat, edges, ev, points, point2seg):
    s = g.s
    prev = -1
    while int(g.active().sum()) != prev:
        before = int(g.active().sum())
        act = g.active()
        dists = np_edge_distances(feat, edges)
        dmat = np.full((s, s), DIST_DEFAULT, np.float32)
        for (a, b), v, d in zip(edges, ev, dists):
            val = d if v else DIST_DEFAULT
            r, c = (a, b) if v else (0, 0)
            dmat[r, c] = val
            dmat[c, r] = val
        col_pen = np.where(act, np.float32(0.0), np.float32(1e9))
        argmin_slot = np.argmin(dmat + col_pen[None, :], axis=1)
        for slot in range(s):
            r1 = g.root[slot]
            if act[slot] and g.ins[r1] == -1:
                g.union(r1, g.root[argmin_slot[slot]])
        feat = np_aggregate(feat, g, act)
        edges, ev = np_normalize_edges(g, edges, ev)
        prev = before

    act = g.active()
    pt_valid = point2seg < s
    p2r = np.where(pt_valid, g.root[np.clip(point2seg, 0, s - 1)], s)
    centroid = np_segment_mean(points, p2r, s)
    # D[i, c] = min over points of cluster c of the expanded sq-distance
    cc2 = np.sum(centroid * centroid, axis=1)
    pp2 = np.sum(points * points, axis=1)
    dall = cc2[:, None] - 2.0 * (centroid @ points.T) + pp2[None, :]
    dmat_sp = np.full((s, s), np.float32(1e30))
    for c in range(s):
        sel = p2r == c
        if sel.any():
            dmat_sp[:, c] = dall[:, sel].min(1)

    if bool((act & (g.ins == -1)).any()):
        for slot in range(s):
            r1 = g.root[slot]
            if not (act[slot] and g.ins[r1] == -1):
                continue
            tgt_root = g.root
            eligible = act & (g.ins[tgt_root] != -1) & (np.arange(s) != slot)
            d = np.where(eligible, dmat_sp[slot], np.float32(1e30))
            j = int(np.argmin(d))
            if d[j] < 1e30:
                g.union(r1, g.root[j])
    edges, ev = np_normalize_edges(g, edges, ev)
    return g, edges, ev


def np_export(g, roots, pt_valid):
    r = np.minimum(roots, g.s - 1)
    sem = g.sem[r]
    ins = g.ins[r]
    sem = np.where(pt_valid & (sem != -1), sem + 1, -1)
    ins = np.where(pt_valid & (ins != -1), ins + 1, -1)
    return sem.astype(np.int32), ins.astype(np.int32)


def numpy_stage1_forward(variables, scene):
    """The whole ins_infer forward (reference model.py:684-897) in numpy."""
    params = jax.tree.map(np.asarray, variables["params"])
    stats = jax.tree.map(np.asarray, variables["batch_stats"])
    pts = np.asarray(scene.points, np.float32)
    p2s = np.asarray(scene.point2seg)
    s = scene.weak_ins.shape[0]
    pt_valid = p2s < s

    g = NpGraph(p2s, np.asarray(scene.weak_ins), np.asarray(scene.weak_sem), s)
    edges, ev = np_normalize_edges(
        g, np.asarray(scene.edges), np.asarray(scene.edge_valid))
    roots_l1 = np.where(pt_valid, g.root[np.minimum(p2s, s - 1)], s)

    clouds, act1 = np_cluster_pointclouds(pts, roots_l1, s, P_OUT, cap=N)
    feat1 = np_mlp1(clouds, act1, params["mlp_1"], stats["mlp_1"])
    d1 = np_edge_distances(feat1, edges)
    np_group_sequential(g, edges, ev, d1, th=6.0)
    edges, ev = np_normalize_edges(g, edges, ev)
    feat2 = np_aggregate(feat1, g, act1)
    roots_l2 = np.where(pt_valid, g.root[np.minimum(p2s, s - 1)], s)
    sem_l2, ins_l2 = np_export(g, roots_l2, pt_valid)

    feat2, edges, ev, act2 = np_semantic_layer(
        feat2, g, edges, ev, pts, roots_l2, pt_valid,
        params["mlp_2"], stats["mlp_2"], 1,
        np.asarray(params["gcn_2"]["fc"]["kernel"], np.float32),
        alpha=0.125, th=2.0)
    roots_l3 = np.where(pt_valid, g.root[np.minimum(p2s, s - 1)], s)
    feat3 = np_aggregate(feat2, g, act2)

    feat3, edges, ev, act3 = np_semantic_layer(
        feat3, g, edges, ev, pts, roots_l3, pt_valid,
        params["mlp_3"], stats["mlp_3"], 2,
        np.asarray(params["gcn_3"]["fc"]["kernel"], np.float32),
        alpha=0.125, th=2.0)
    roots_l4 = np.where(pt_valid, g.root[np.minimum(p2s, s - 1)], s)
    feat4 = np_aggregate(feat3, g, act3)

    g, edges, ev = np_group_unlabeled(g, feat4, edges, ev, pts[:, :3], p2s)
    final_root = np.where(pt_valid, g.root[np.minimum(p2s, s - 1)], s)
    final_sem, final_ins = np_export(g, final_root, pt_valid)
    return {
        "layer_roots": np.stack([roots_l1, roots_l2, roots_l3, roots_l4]),
        "final_root": final_root,
        "final_sem": final_sem, "final_ins": final_ins,
        "sem_layer2": sem_l2, "ins_layer2": ins_l2,
    }


# ---------------------------------------------------------------------------
# the test
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("seed", [0, 1])
def test_composed_forward_matches_numpy_oracle(seed):
    scene = make_synthetic_scene(
        seed=seed, num_points=N, num_slots=S, num_edges=E,
        num_instances=6, segs_per_instance=6, jax_arrays=True)
    model = SegGroupGNN(cluster_cap=N, knn_window=N, sequential=True,
                        compute_dtype=jnp.float32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        scene, mode="ins_infer", train=False)
    out = jax.jit(
        lambda v, sc: model.apply(v, sc, mode="ins_infer", train=False)
    )(variables, scene)

    want = numpy_stage1_forward(variables, scene)

    np.testing.assert_array_equal(np.asarray(out.layer_roots),
                                  want["layer_roots"])
    np.testing.assert_array_equal(np.asarray(out.final_root),
                                  want["final_root"])
    np.testing.assert_array_equal(np.asarray(out.final_sem),
                                  want["final_sem"])
    np.testing.assert_array_equal(np.asarray(out.final_ins),
                                  want["final_ins"])
    np.testing.assert_array_equal(np.asarray(out.sem_layer2),
                                  want["sem_layer2"])
    np.testing.assert_array_equal(np.asarray(out.ins_layer2),
                                  want["ins_layer2"])
