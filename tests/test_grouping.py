"""Grouping engine vs a numpy oracle implementing the reference DisjointSet
semantics (reference seggroup/model.py:169-258): sequential edge-order merges,
label-conflict guard, -l1*l2 label propagation, small-cluster absorption."""

import jax.numpy as jnp
import numpy as np

from seggroup_tpu.ops import grouping as gr


class OracleDS:
    def __init__(self, ins, sem, counts):
        self.n = len(ins)
        self.root = np.arange(self.n)
        self.ins = np.array(ins)
        self.sem = np.array(sem)
        self.pn = np.array(counts, dtype=np.int64)

    def find(self, i):
        return self.root[i]

    def union(self, r1, r2):
        if r1 == r2:
            return False
        if self.ins[r1] != -1 and self.ins[r2] != -1 and self.ins[r1] != self.ins[r2]:
            return False
        self.root[self.root == r1] = r2
        self.pn[r2] += self.pn[r1]
        if self.ins[r1] != self.ins[r2]:
            self.ins[r2] = -self.ins[r1] * self.ins[r2]
            self.sem[r2] = -self.sem[r1] * self.sem[r2]
        return True


def oracle_group_nearby(ds, edges, dists, th, min_points=5):
    for (a, b), d in zip(edges, dists):
        if d > th:
            continue
        ds.union(ds.find(a), ds.find(b))
    while True:
        merged = False
        for a, b in edges:
            r1, r2 = ds.find(a), ds.find(b)
            if r1 == r2:
                continue
            if ds.pn[r1] < min_points or ds.pn[r2] < min_points:
                merged |= ds.union(r1, r2)
        if not merged:
            break
    connected = np.array([ds.find(a) == ds.find(b) for a, b in edges])
    return ds, connected


def make_graph(rng, s=16, n_pts=400):
    point2seg = rng.integers(0, s, size=n_pts).astype(np.int32)
    ins = np.full(s, -1, np.int32)
    sem = np.full(s, -1, np.int32)
    labeled = rng.choice(s, size=4, replace=False)
    for j, seg in enumerate(labeled):
        ins[seg] = j
        sem[seg] = int(rng.integers(0, 20))
    g = gr.init_graph(jnp.array(point2seg), jnp.array(ins), jnp.array(sem), s)
    counts = np.bincount(point2seg, minlength=s)
    return g, ins, sem, counts, point2seg


def random_edges(rng, s, n_edges):
    e = rng.integers(0, s, size=(n_edges, 2)).astype(np.int32)
    e = e[e[:, 0] != e[:, 1]]
    lo = np.minimum(e[:, 0], e[:, 1])
    hi = np.maximum(e[:, 0], e[:, 1])
    key = lo * s + hi
    _, first = np.unique(key, return_index=True)
    e = np.stack([lo, hi], 1)[np.sort(first)]
    order = np.lexsort((e[:, 1], e[:, 0]))
    return e[order]


def canon(root, valid_slots):
    """Canonical partition signature: set of frozensets of slots."""
    groups = {}
    for i in valid_slots:
        groups.setdefault(root[i], set()).add(i)
    return {frozenset(v) for v in groups.values()}


def _random_case(rng, s=16):
    g, ins, sem, counts, _ = make_graph(rng, s=s)
    edges = random_edges(rng, s, 40)
    # drop edges touching empty segments (the real pipeline never has them)
    nonempty = counts > 0
    edges = edges[nonempty[edges[:, 0]] & nonempty[edges[:, 1]]]
    e_pad = 64
    ev = np.zeros(e_pad, bool)
    ev[: len(edges)] = True
    e_arr = np.zeros((e_pad, 2), np.int32)
    e_arr[: len(edges)] = edges
    dists = rng.random(e_pad).astype(np.float32) * 10
    return g, ins, sem, counts, edges, e_arr, ev, dists, nonempty


def test_group_nearby_sequential_matches_oracle(rng):
    for trial in range(10):
        s = 16
        g, ins, sem, counts, edges, e_arr, ev, dists, nonempty = _random_case(rng, s)

        ds = OracleDS(ins, sem, counts)
        ds_out, conn_oracle = oracle_group_nearby(ds, edges, dists[: len(edges)], 5.0)

        g_out, conn = gr.group_nearby_clusters_sequential(
            g, jnp.array(e_arr), jnp.array(ev), jnp.array(dists), 5.0
        )
        root = np.asarray(g_out.root)
        valid_slots = np.where(nonempty)[0]
        assert canon(root, valid_slots) == canon(ds_out.root, valid_slots)
        np.testing.assert_array_equal(
            np.asarray(conn)[: len(edges)], conn_oracle
        )
        # labels/point counts agree at roots
        for i in valid_slots:
            r_ours, r_oracle = root[i], ds_out.find(i)
            assert np.asarray(g_out.ins_label)[r_ours] == ds_out.ins[r_oracle]
            assert np.asarray(g_out.sem_label)[r_ours] == ds_out.sem[r_oracle]
            assert np.asarray(g_out.point_num)[r_ours] == ds_out.pn[r_oracle]


def test_group_nearby_parallel_invariants(rng):
    """The parallel-rounds engine must reach the same fixpoint invariant as
    the sequential reference: every passing edge is intra-cluster or joins two
    differently-labeled clusters; counts/labels consistent."""
    for trial in range(5):
        s = 16
        g, ins, sem, counts, edges, e_arr, ev, dists, nonempty = _random_case(rng, s)
        g_out, conn = gr.group_nearby_clusters(
            g, jnp.array(e_arr), jnp.array(ev), jnp.array(dists), 5.0
        )
        root = np.asarray(g_out.root)
        insl = np.asarray(g_out.ins_label)
        pn = np.asarray(g_out.point_num)
        for (a, b), d in zip(edges, dists[: len(edges)]):
            ra, rb = root[a], root[b]
            small = pn[ra] < 5 or pn[rb] < 5
            if d <= 5.0 or small:
                conflict = insl[ra] != -1 and insl[rb] != -1 and insl[ra] != insl[rb]
                assert ra == rb or conflict, (a, b, d, ra, rb)
        # counts: sum of member segment counts
        for r in np.unique(root[nonempty]):
            members = np.where((root == r) & nonempty)[0]
            assert pn[r] == counts[members].sum()
        # never-merge guard between distinct labels
        for i in np.where(nonempty)[0]:
            for j in np.where(nonempty)[0]:
                if root[i] == root[j]:
                    continue


def test_group_nearby_parallel_equals_oracle_when_conflict_free(rng):
    """With at most one labeled segment per connected component, merge order
    is irrelevant and the parallel engine must match the oracle exactly."""
    for trial in range(5):
        s = 16
        point2seg = rng.integers(0, s, size=400).astype(np.int32)
        counts = np.bincount(point2seg, minlength=s)
        ins = np.full(s, -1, np.int32)
        sem = np.full(s, -1, np.int32)
        # label segments 0 and 8 (components built to not bridge them)
        ins[0], sem[0] = 0, 3
        ins[8], sem[8] = 1, 9
        # edges only within {0..7} and {8..15}
        edges = []
        for grp in (range(0, 8), range(8, 16)):
            grp = list(grp)
            for _ in range(10):
                a, b = rng.choice(grp, 2, replace=False)
                edges.append((min(a, b), max(a, b)))
        edges = sorted(set(edges))
        e_pad = 64
        e_arr = np.zeros((e_pad, 2), np.int32)
        ev = np.zeros(e_pad, bool)
        e_arr[: len(edges)] = edges
        ev[: len(edges)] = True
        dists = rng.random(e_pad).astype(np.float32) * 10

        g = gr.init_graph(jnp.array(point2seg), jnp.array(ins), jnp.array(sem), s)
        ds = OracleDS(ins, sem, counts)
        ds_out, conn_oracle = oracle_group_nearby(
            ds, np.array(edges), dists[: len(edges)], 5.0
        )
        g_out, conn = gr.group_nearby_clusters(
            g, jnp.array(e_arr), jnp.array(ev), jnp.array(dists), 5.0
        )
        root = np.asarray(g_out.root)
        valid_slots = np.where(counts > 0)[0]
        assert canon(root, valid_slots) == canon(ds_out.root, valid_slots)
        np.testing.assert_array_equal(np.asarray(conn)[: len(edges)], conn_oracle)
        for i in valid_slots:
            r_ours, r_oracle = root[i], ds_out.find(i)
            assert np.asarray(g_out.ins_label)[r_ours] == ds_out.ins[r_oracle]
            assert np.asarray(g_out.point_num)[r_ours] == ds_out.pn[r_oracle]


def _multilabel_graph(rng, s, e_slots, n_instances, conflict_frac=0.1, th=5.0):
    """Realistic-scale graph: instances are connected slot blobs (chain
    backbone + random intra edges), with `conflict_frac` of cross-instance
    edges below threshold — the multi-label-component trigger for merge-order
    dependence (mirrors scripts/grouping_divergence.py)."""
    cuts = np.sort(rng.choice(np.arange(1, s), size=n_instances - 1, replace=False))
    bounds = np.concatenate([[0], cuts, [s]])
    counts = rng.integers(5, 200, size=s).astype(np.int64)
    ins = np.full(s, -1, np.int32)
    sem = np.full(s, -1, np.int32)
    edges = []
    for i in range(n_instances):
        members = np.arange(bounds[i], bounds[i + 1])
        seed_slot = rng.choice(members)
        ins[seed_slot] = i
        sem[seed_slot] = int(rng.integers(0, 20))
        for a, b in zip(members[:-1], members[1:]):
            edges.append((a, b, rng.uniform(0.0, th)))
        for _ in range(max(1, len(members) // 2)):
            a, b = rng.choice(members, 2, replace=True)
            if a != b:
                edges.append((min(a, b), max(a, b), rng.uniform(0.0, th * 2)))
    for _ in range(len(edges) // 4):
        a, b = rng.integers(0, s, 2)
        if a == b:
            continue
        d = rng.uniform(0.0, th) if rng.random() < conflict_frac else rng.uniform(
            th, th * 3)
        edges.append((min(a, b), max(a, b), d))
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
        e_arr[i], dists[i], ev[i] = (a, b), d, True
    return counts, ins, sem, e_arr, ev, dists


def test_sequential_matches_oracle_at_scale(rng):
    """Bit-fidelity of the default (sequential) engine on multi-label graphs
    at realistic scale: 512 slots / 4096 edge slots, conflict-capable
    cross-instance edges (VERDICT r1 item 3; reference model.py:218-258)."""
    s, e_slots = 512, 4096
    for trial in range(3):
        counts, ins, sem, e_arr, ev, dists = _multilabel_graph(
            rng, s, e_slots, n_instances=24, conflict_frac=0.15
        )
        g = gr.SegGraph(
            root=jnp.arange(s, dtype=jnp.int32),
            point_num=jnp.array(counts, jnp.int32),
            ins_label=jnp.array(ins),
            sem_label=jnp.array(sem),
            seg_valid=jnp.array(counts > 0),
        )
        real = ev.nonzero()[0]
        ds = OracleDS(ins, sem, counts)
        ds_out, conn_oracle = oracle_group_nearby(
            ds, e_arr[real], dists[real], 5.0
        )
        g_out, conn = gr.group_nearby_clusters_sequential(
            g, jnp.array(e_arr), jnp.array(ev), jnp.array(dists), 5.0
        )
        root = np.asarray(g_out.root)
        valid_slots = np.where(counts > 0)[0]
        assert canon(root, valid_slots) == canon(ds_out.root, valid_slots)
        np.testing.assert_array_equal(np.asarray(conn)[real], conn_oracle)
        # exported labels bit-identical (incl. surviving-root label values)
        ins_ours = np.asarray(g_out.ins_label)[root]
        ins_oracle = ds_out.ins[ds_out.root]
        np.testing.assert_array_equal(ins_ours[valid_slots], ins_oracle[valid_slots])


def test_parallel_equals_sequential_when_conflict_free(rng):
    """With no label-conflict components the fast parallel engine must agree
    with the bit-faithful default exactly, at scale."""
    s, e_slots = 512, 4096
    counts, ins, sem, e_arr, ev, dists = _multilabel_graph(
        rng, s, e_slots, n_instances=24, conflict_frac=0.0
    )
    g = gr.SegGraph(
        root=jnp.arange(s, dtype=jnp.int32),
        point_num=jnp.array(counts, jnp.int32),
        ins_label=jnp.array(ins),
        sem_label=jnp.array(sem),
        seg_valid=jnp.array(counts > 0),
    )
    args = (jnp.array(e_arr), jnp.array(ev), jnp.array(dists))
    gp, _ = gr.group_nearby_clusters(g, *args, 5.0)
    gs, _ = gr.group_nearby_clusters_sequential(g, *args, 5.0)
    valid_slots = np.where(counts > 0)[0]
    rp, rs = np.asarray(gp.root), np.asarray(gs.root)
    assert canon(rp, valid_slots) == canon(rs, valid_slots)
    np.testing.assert_array_equal(
        np.asarray(gp.ins_label)[rp][valid_slots],
        np.asarray(gs.ins_label)[rs][valid_slots],
    )


def test_label_conflict_guard():
    # two labeled segments with different instances must never merge
    point2seg = jnp.array([0] * 10 + [1] * 10, dtype=jnp.int32)
    ins = jnp.array([0, 1, -1, -1], dtype=jnp.int32)
    sem = jnp.array([3, 5, -1, -1], dtype=jnp.int32)
    g = gr.init_graph(point2seg, ins, sem, 4)
    edges = jnp.array([[0, 1], [0, 0]], dtype=jnp.int32)
    ev = jnp.array([True, False])
    dists = jnp.array([0.0, 0.0], dtype=jnp.float32)
    g2, conn = gr.group_nearby_clusters(g, edges, ev, dists, th=10.0)
    assert np.asarray(g2.root)[0] == 0 and np.asarray(g2.root)[1] == 1
    assert not np.asarray(conn)[0]


def test_label_propagation_on_merge():
    point2seg = jnp.array([0] * 10 + [1] * 10, dtype=jnp.int32)
    ins = jnp.array([4, -1], dtype=jnp.int32)
    sem = jnp.array([7, -1], dtype=jnp.int32)
    g = gr.init_graph(point2seg, ins, sem, 2)
    edges = jnp.array([[0, 1]], dtype=jnp.int32)
    g2, _ = gr.group_nearby_clusters(
        g, edges, jnp.array([True]), jnp.array([0.0], jnp.float32), th=1.0
    )
    r = int(np.asarray(g2.root)[0])
    assert np.asarray(g2.ins_label)[r] == 4
    assert np.asarray(g2.sem_label)[r] == 7
    assert np.asarray(g2.point_num)[r] == 20


def test_normalize_edges_sorted_dedup():
    point2seg = jnp.array([0, 1, 2, 3] * 5, dtype=jnp.int32)
    g = gr.init_graph(
        point2seg, jnp.full(4, -1, jnp.int32), jnp.full(4, -1, jnp.int32), 4
    )
    # merge 2 into 3
    g = g._replace(root=jnp.array([0, 1, 3, 3], dtype=jnp.int32))
    edges = jnp.array([[2, 0], [3, 0], [1, 2], [2, 3]], dtype=jnp.int32)
    ev = jnp.ones(4, bool)
    e2, v2 = gr.normalize_edges(g, edges, ev)
    e2, v2 = np.asarray(e2), np.asarray(v2)
    got = e2[v2].tolist()
    assert got == [[0, 3], [1, 3]]  # deduped, sorted, self-edge dropped


def test_small_cluster_absorption():
    # a 3-point segment adjacent to a large one must be absorbed even above th
    point2seg = jnp.array([0] * 3 + [1] * 50, dtype=jnp.int32)
    g = gr.init_graph(
        point2seg, jnp.full(2, -1, jnp.int32), jnp.full(2, -1, jnp.int32), 2
    )
    edges = jnp.array([[0, 1]], dtype=jnp.int32)
    g2, conn = gr.group_nearby_clusters(
        g, edges, jnp.array([True]), jnp.array([999.0], jnp.float32), th=1.0
    )
    assert np.asarray(g2.root)[0] == np.asarray(g2.root)[1]
    assert np.asarray(conn)[0]


def test_group_unlabeled_absorbs_everything(rng):
    s = 8
    point2seg = rng.integers(0, s, size=200).astype(np.int32)
    ins = np.full(s, -1, np.int32)
    sem = np.full(s, -1, np.int32)
    ins[0], sem[0] = 0, 3
    ins[5], sem[5] = 1, 9
    g = gr.init_graph(jnp.array(point2seg), jnp.array(ins), jnp.array(sem), s)
    # chain adjacency 0-1-2-3-4-5, plus 6,7 isolated (spatial fallback path)
    edges = np.array([[0, 1], [1, 2], [2, 3], [3, 4], [4, 5]], np.int32)
    e_pad = 16
    e_arr = np.zeros((e_pad, 2), np.int32)
    e_arr[: len(edges)] = edges
    ev = np.zeros(e_pad, bool)
    ev[: len(edges)] = True
    feat = rng.normal(size=(s, 4)).astype(np.float32)
    points = rng.normal(size=(200, 3)).astype(np.float32)

    g2, feat2, e2, ev2 = gr.group_unlabeled_clusters(
        g, jnp.array(feat), jnp.array(e_arr), jnp.array(ev),
        jnp.array(points), jnp.array(point2seg),
    )
    act = np.asarray(gr.active_mask(g2))
    ins2 = np.asarray(g2.ins_label)
    # every active cluster ends up labeled
    assert all(ins2[i] != -1 for i in np.where(act)[0])
    # exactly the two instances survive
    assert sorted(ins2[act].tolist()) == [0, 1]


def test_sequential_compaction_bit_identical(rng):
    """The eligible-edge compaction of the sequential threshold scan is
    bit-identical to the full scan, in BOTH regimes: eligible count under
    the budget (compact prefix runs) and over it (lax.cond falls back)."""
    s = 64
    e_pad = 1024
    for th, budget in [(1.0, 128), (9.0, 128), (5.0, 64)]:
        ins = np.full(s, -1, np.int64)
        labeled = rng.random(s) < 0.3
        ins[labeled] = rng.integers(0, 6, int(labeled.sum()))
        counts = rng.integers(1, 30, s)
        p2s = np.repeat(np.arange(s), counts)
        g = gr.init_graph(jnp.asarray(p2s.astype(np.int32)),
                          jnp.asarray(ins.astype(np.int32)),
                          jnp.asarray(ins.astype(np.int32)),
                          s)
        e_arr = rng.integers(0, s, (e_pad, 2)).astype(np.int32)
        ev = rng.random(e_pad) < 0.9
        dists = (rng.random(e_pad) * 10).astype(np.float32)
        args = (jnp.asarray(e_arr), jnp.asarray(ev), jnp.asarray(dists), th)
        g_full, conn_full = gr.group_nearby_clusters_sequential(
            g, *args, compact_budget=e_pad)
        g_comp, conn_comp = gr.group_nearby_clusters_sequential(
            g, *args, compact_budget=budget)
        np.testing.assert_array_equal(np.asarray(g_full.root),
                                      np.asarray(g_comp.root))
        np.testing.assert_array_equal(np.asarray(g_full.ins_label),
                                      np.asarray(g_comp.ins_label))
        np.testing.assert_array_equal(np.asarray(g_full.point_num),
                                      np.asarray(g_comp.point_num))
        np.testing.assert_array_equal(np.asarray(conn_full),
                                      np.asarray(conn_comp))
        n_elig = int((ev & (dists <= th)).sum())
        print(f"th={th} eligible={n_elig} budget={budget}")
