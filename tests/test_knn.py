import jax
import jax.numpy as jnp
import numpy as np

from seggroup_tpu.ops.knn import ball_query, cluster_knn, knn_brute, masked_knn


def gram_sqdist(pts):
    """Same |x|^2 - 2<x,y> + |y|^2 f32 formulation as the kernel (and as the
    reference, seggroup/model.py:31-33), so near-ties resolve identically."""
    xx = (pts * pts).sum(-1, keepdims=True).astype(np.float32)
    d = xx - 2.0 * (pts @ pts.T).astype(np.float32) + xx.T
    return np.maximum(d, 0.0)


def knn_oracle(pts, k, mask=None):
    d = gram_sqdist(pts)
    if mask is not None:
        d = np.where(mask[None, :], d, 1e30)
    return np.argsort(d, axis=1, kind="stable")[:, :k]


def _same_neighbor_sets(got, want, pts):
    """Compare kNN results by distance multiset (ties may reorder indices)."""
    d = gram_sqdist(pts)
    for i in range(got.shape[0]):
        dg = np.sort(d[i, got[i]])
        dw = np.sort(d[i, want[i]])
        np.testing.assert_allclose(dg, dw, rtol=1e-4, atol=1e-5)


def test_knn_brute(rng):
    pts = rng.normal(size=(1, 50, 3)).astype(np.float32)
    got = np.asarray(knn_brute(jnp.array(pts), 5))[0]
    want = knn_oracle(pts[0], 5)
    _same_neighbor_sets(got, want, pts[0])
    # self is always the nearest neighbor
    assert (got[:, 0] == np.arange(50)).all()


def test_masked_knn(rng):
    pts = rng.normal(size=(1, 40, 3)).astype(np.float32)
    valid = np.ones((1, 40), bool)
    valid[0, 30:] = False
    got = np.asarray(masked_knn(jnp.array(pts), jnp.array(valid), 4))[0]
    assert (got[:30] < 30).all()


def test_cluster_knn(rng):
    n, k = 256, 6
    pts = rng.normal(size=(n, 3)).astype(np.float32)
    cid = rng.integers(0, 5, size=n).astype(np.int32)
    got = np.asarray(
        cluster_knn(jnp.array(pts), jnp.array(cid), k=k, row_block=64,
                    col_block=64, window=256)
    )
    dmat = gram_sqdist(pts)
    for i in range(n):
        same = cid == cid[i]
        d = np.where(same, dmat[i], 1e30)
        want = np.sort(d)[:k]
        have = np.sort(dmat[i, got[i]])
        if same.sum() >= k:
            np.testing.assert_allclose(have, want, rtol=1e-4, atol=1e-5)
            assert (cid[got[i]] == cid[i]).all()
        else:
            # under-filled rows fall back to self
            assert (cid[got[i]] == cid[i]).all()


def test_cluster_knn_tiny_cluster(rng):
    n = 64
    pts = rng.normal(size=(n, 3)).astype(np.float32)
    cid = np.zeros(n, np.int32)
    cid[:2] = 7  # a 2-point cluster
    got = np.asarray(
        cluster_knn(jnp.array(pts), jnp.array(cid), k=4, row_block=32,
                    col_block=32, window=64)
    )
    # the 2-point cluster's rows only reference its own members
    assert set(got[0]).issubset({0, 1})
    assert set(got[1]).issubset({0, 1})


def test_ball_query(rng):
    n = 128
    pts = (rng.random(size=(n, 3)) * 2.0).astype(np.float32)
    batch = np.zeros(n, np.int32)
    batch[64:] = 1
    valid = np.ones(n, bool)
    r = 0.25
    nbrs, counts, overflow = ball_query(
        jnp.array(pts), r, jnp.array(batch), jnp.array(valid),
        max_neighbors=32, bucket_cap=32,
    )
    nbrs, counts = np.asarray(nbrs), np.asarray(counts)
    for i in range(n):
        d = ((pts - pts[i]) ** 2).sum(-1)
        want = set(np.where((d <= r * r) & (batch == batch[i]))[0])
        got = set(nbrs[i, : counts[i]])
        assert got == want, f"point {i}: {got} vs {want}"
        assert i in got  # self included (reference bfs_cluster.cu:40-44)


def test_ball_query_bucket_overflow_flagged(rng):
    """A grid cell denser than bucket_cap must trip the overflow flag even
    when max_neighbors has free slots (ADVICE r1: uncounted dense-cell drops
    were invisible to callers)."""
    n = 64
    # 40 points crammed into one tiny blob (one grid cell at r=0.5),
    # the rest far away
    pts = np.zeros((n, 3), np.float32)
    pts[:40] = rng.random(size=(40, 3)).astype(np.float32) * 0.05
    pts[40:] = 100.0 + rng.random(size=(n - 40, 3)).astype(np.float32) * 10
    nbrs, counts, overflow = ball_query(
        jnp.array(pts), 0.5, jnp.zeros(n, jnp.int32), jnp.ones(n, bool),
        max_neighbors=64, bucket_cap=8,
    )
    overflow = np.asarray(overflow)
    counts = np.asarray(counts)
    # dense-blob points: candidates were dropped at the bucket level
    # (counts < 40 in-radius points) and the flag must say so
    assert overflow[:40].all()
    assert (counts[:40] < 40).all()
    # far sparse points see no overflow
    assert not overflow[40:].any()

    # with a big enough bucket_cap the same query is exact and un-flagged
    nbrs2, counts2, overflow2 = ball_query(
        jnp.array(pts), 0.5, jnp.zeros(n, jnp.int32), jnp.ones(n, bool),
        max_neighbors=64, bucket_cap=64,
    )
    assert not np.asarray(overflow2)[:40].any()
    assert (np.asarray(counts2)[:40] == 40).all()


def test_cluster_knn_approx_mode(rng):
    """approx=True (lax.approx_max_k fast path): same shapes, neighbors all
    same-cluster, and distance quality close to exact on small clusters."""
    n, k = 2048, 8
    pts = rng.normal(size=(n, 3)).astype(np.float32)
    cid = (rng.integers(0, 8, n)).astype(np.int32)
    exact = np.asarray(cluster_knn(jnp.array(pts), jnp.array(cid), k=k,
                                   row_block=1024, window=2048))
    approx = np.asarray(cluster_knn(jnp.array(pts), jnp.array(cid), k=k,
                                    row_block=1024, window=2048, approx=True))
    assert approx.shape == (n, k)
    assert (cid[approx] == cid[:, None]).all()  # never crosses clusters
    d_e = np.sort(((pts[:, None] - pts[exact]) ** 2).sum(-1), 1)
    d_a = np.sort(((pts[:, None] - pts[approx]) ** 2).sum(-1), 1)
    rel = (np.sqrt(d_a + 1e-12) - np.sqrt(d_e + 1e-12)).mean() / max(
        np.sqrt(d_e).mean(), 1e-9)
    assert rel < 0.1, rel


def test_cluster_knn_hierarchical_topk_bit_identical(rng):
    """The hierarchical exact top-k (topk_chunk) must return bit-identical
    indices to the flat lax.top_k path — same values AND same tie-breaking
    (see ops/knn.py:_exact_topk_neg). Includes duplicated points so distance
    ties actually occur across chunk boundaries."""
    n, k = 512, 8
    pts = rng.normal(size=(n, 3)).astype(np.float32)
    pts[200:260] = pts[0:60]  # exact duplicates -> distance ties
    cid = rng.integers(0, 3, size=n).astype(np.int32)
    kw = dict(k=k, row_block=64, window=256, topk_method="flat")
    flat = np.asarray(cluster_knn(jnp.array(pts), jnp.array(cid),
                                  topk_chunk=None, **kw))
    for chunk in (64, 128, 100):  # incl. a non-divisor of the window width
        hier = np.asarray(cluster_knn(jnp.array(pts), jnp.array(cid),
                                      topk_chunk=chunk, **kw))
        np.testing.assert_array_equal(flat, hier, err_msg=f"chunk={chunk}")


def test_cluster_knn_iter_min_topk_bit_identical(rng):
    """The default iter-min exact top-k must return bit-identical indices to
    the flat lax.top_k path — same values AND same tie ordering (argmin's
    first-minimum == top_k's ascending-index-among-equals). Duplicated
    points force real distance ties; a tiny cluster exercises the
    self-index fill."""
    from seggroup_tpu.ops.knn import _iter_min_topk

    n, k = 512, 8
    pts = rng.normal(size=(n, 3)).astype(np.float32)
    pts[200:260] = pts[0:60]  # exact duplicates -> distance ties
    cid = rng.integers(0, 3, size=n).astype(np.int32)
    cid[:4] = 9  # a 4-member cluster (< k) -> self-fill path
    kw = dict(k=k, row_block=64, window=256)
    flat = np.asarray(cluster_knn(jnp.array(pts), jnp.array(cid),
                                  topk_method="flat", **kw))
    fast = np.asarray(cluster_knn(jnp.array(pts), jnp.array(cid),
                                  topk_method="iter_min", **kw))
    np.testing.assert_array_equal(flat, fast)

    # raw-op equivalence incl. value ordering on a tied matrix
    d = rng.integers(0, 5, size=(16, 64)).astype(np.float32)
    want_v, want_i = jax.lax.top_k(-jnp.asarray(d), 6)
    got_v, got_i = _iter_min_topk(jnp.asarray(d), 6)
    np.testing.assert_array_equal(np.asarray(want_i), np.asarray(got_i))
    np.testing.assert_array_equal(np.asarray(want_v), np.asarray(got_v))


def test_ball_query_no_padding_no_duplicate_last_row(rng):
    """With ZERO padding rows, a stencil bucket running past the end of the
    sorted array used to clamp onto row N-1 whose key still matched —
    double-counting the globally-last support point. Counts must equal the
    brute-force oracle and neighbor lists must be duplicate-free."""
    from seggroup_tpu.ops.knn import ball_query, ball_query_pair

    n, r = 512, 0.3
    pts = (rng.random((n, 3)) * 2.0).astype(np.float32)
    b = np.zeros(n, np.int32)
    v = np.ones(n, bool)  # all valid: nothing shields the end-clamp
    d2 = ((pts[:, None, :] - pts[None, :, :]) ** 2).sum(-1)
    want = (d2 <= np.float32(r) ** 2).sum(1)

    nb, cnt, ovf = ball_query(jnp.asarray(pts), r, jnp.asarray(b),
                              jnp.asarray(v), max_neighbors=64,
                              bucket_cap=64)
    np.testing.assert_array_equal(np.asarray(cnt), want)
    nb = np.asarray(nb)
    for i in range(n):
        row = nb[i, :cnt[i]]
        assert len(set(row)) == len(row), i

    nbp, cntp, _ = ball_query_pair(
        jnp.asarray(pts), jnp.asarray(b), jnp.asarray(v),
        jnp.asarray(pts), jnp.asarray(b), jnp.asarray(v), r,
        max_neighbors=64, bucket_cap=64)
    np.testing.assert_array_equal(np.asarray(cntp), want)
    nbp = np.asarray(nbp)
    for i in range(n):
        row = nbp[i, :cntp[i]]
        assert len(set(row)) == len(row), i


def test_ball_query_pair_windowed_matches_exact(rng):
    """The windowed sorted formulation must return the same neighbor SETS,
    counts, and K-truncation flags as the exact 27-cell path (neighbor order
    is nearest-first in both; sets compared to be tie-robust)."""
    from seggroup_tpu.ops.knn import ball_query_pair, ball_query_pair_windowed

    ns, nq, r = 700, 300, 0.22
    sup = (rng.random((ns, 3)) * 3.0).astype(np.float32)
    qry = (rng.random((nq, 3)) * 3.0).astype(np.float32)
    sb = rng.integers(0, 2, ns).astype(np.int32)
    qb = rng.integers(0, 2, nq).astype(np.int32)
    sv = rng.random(ns) < 0.9
    qv = rng.random(nq) < 0.9
    kw = dict(max_neighbors=24)
    n1, c1, o1 = ball_query_pair(jnp.asarray(sup), jnp.asarray(sb),
                                 jnp.asarray(sv), jnp.asarray(qry),
                                 jnp.asarray(qb), jnp.asarray(qv), r,
                                 bucket_cap=64, **kw)
    n2, c2, o2, ovf = ball_query_pair_windowed(
        jnp.asarray(sup), jnp.asarray(sb), jnp.asarray(sv), jnp.asarray(qry),
        jnp.asarray(qb), jnp.asarray(qv), r, tile=64, window=1024, **kw)
    assert not bool(ovf)
    n1, c1, n2, c2 = (np.asarray(x) for x in (n1, c1, n2, c2))
    np.testing.assert_array_equal(c1, c2)
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))
    for i in range(nq):
        assert set(n1[i, :c1[i]]) == set(n2[i, :c2[i]]), i
        assert (n2[i, c2[i]:] == ns).all()


def test_ball_query_pair_fast_fallback_on_window_overflow(rng):
    """A tiny window forces the stencil range past `window`; the fast
    wrapper's cond must take the exact path and still be right."""
    from seggroup_tpu.ops.knn import ball_query_pair, ball_query_pair_fast, \
        ball_query_pair_windowed

    n, r = 600, 0.15
    pts = (rng.random((n, 3)) * 1.2).astype(np.float32)  # dense: big stencil
    b = np.zeros(n, np.int32)
    v = np.ones(n, bool)
    args = (jnp.asarray(pts), jnp.asarray(b), jnp.asarray(v)) * 2 + (r,)
    _, _, _, ovf = ball_query_pair_windowed(*args, max_neighbors=16,
                                            tile=64, window=64)
    assert bool(ovf)
    nf, cf, of = ball_query_pair_fast(*args, max_neighbors=16,
                                      bucket_cap=64, tile=64, window=64)
    ne, ce, oe = ball_query_pair(*args, max_neighbors=16, bucket_cap=64)
    nf, cf, ne, ce = (np.asarray(x) for x in (nf, cf, ne, ce))
    np.testing.assert_array_equal(cf, ce)
    for i in range(n):
        assert set(nf[i, :cf[i]]) == set(ne[i, :ce[i]]), i


def test_cluster_knn_tiered_small_window_bit_identical(rng):
    """small_window tier must be BIT-identical to the untiered call — both
    when blocks fit the small tier and when a big cluster forces the big
    branch (mixed per-block branching inside one call)."""
    n, k = 4096, 8
    pts = rng.normal(size=(n, 3)).astype(np.float32)
    # many small clusters + one big one (spans > small window after sort)
    cid = rng.integers(0, 200, size=n).astype(np.int32)
    cid[:1500] = 1000  # one 1500-pt cluster
    base = np.asarray(cluster_knn(jnp.array(pts), jnp.array(cid), k=k,
                                  row_block=256, window=2048, small_window=0))
    tier = np.asarray(cluster_knn(jnp.array(pts), jnp.array(cid), k=k,
                                  row_block=256, window=2048,
                                  small_window=512))
    np.testing.assert_array_equal(base, tier)


def test_cluster_knn_tiered_auto_default(rng):
    """window >= 4096 auto-enables the window//4 tier; results unchanged."""
    n, k = 8192, 5
    pts = rng.normal(size=(n, 3)).astype(np.float32)
    cid = rng.integers(0, 64, size=n).astype(np.int32)
    base = np.asarray(cluster_knn(jnp.array(pts), jnp.array(cid), k=k,
                                  row_block=512, window=4096, small_window=0))
    auto = np.asarray(cluster_knn(jnp.array(pts), jnp.array(cid), k=k,
                                  row_block=512, window=4096))
    np.testing.assert_array_equal(base, auto)


def test_ball_query_pair_windowed_int32_keyspace_guard(rng):
    """Huge extent/radius ratios make dims-product x batches exceed 2^31;
    the windowed path must FLAG this (window_overflow_any) so the fast
    wrapper takes the exact wrap-consistent fallback (ADVICE r3)."""
    from seggroup_tpu.ops.knn import ball_query_pair, ball_query_pair_fast, \
        ball_query_pair_windowed

    n, r = 256, 5e-4  # 50m extent at 0.5mm radius -> dims ~1e5 per axis
    pts = (rng.random((n, 3)) * 50.0).astype(np.float32)
    b = np.zeros(n, np.int32)
    v = np.ones(n, bool)
    args = (jnp.asarray(pts), jnp.asarray(b), jnp.asarray(v)) * 2 + (r,)
    _, _, _, ovf = ball_query_pair_windowed(*args, max_neighbors=8)
    assert bool(ovf), "key-space overflow must be flagged"
    nf, cf, _ = ball_query_pair_fast(*args, max_neighbors=8, bucket_cap=32)
    ne, ce, _ = ball_query_pair(*args, max_neighbors=8, bucket_cap=32)
    np.testing.assert_array_equal(np.asarray(cf), np.asarray(ce))
    nf, ne, cf = np.asarray(nf), np.asarray(ne), np.asarray(cf)
    for i in range(n):
        assert set(nf[i, :cf[i]]) == set(ne[i, :cf[i]]), i
