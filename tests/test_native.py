"""Native C++ host library vs numpy fallbacks (both paths exercised)."""

import numpy as np
import pytest

from seggroup_tpu import native


def test_lib_builds_and_loads():
    assert native.available(), "native lib failed to build"


def test_grid_subsample(rng):
    pts = rng.random((500, 3)).astype(np.float32) * 2
    bary, inv = native.grid_subsample(pts, 0.25)
    assert inv.shape == (500,)
    m = bary.shape[0]
    assert inv.max() == m - 1
    # barycenters are the means of their members
    for j in range(min(m, 10)):
        sel = inv == j
        np.testing.assert_allclose(bary[j], pts[sel].mean(0), rtol=1e-4,
                                   atol=1e-5)
    # members share a cell
    cells = np.floor(pts / 0.25).astype(int)
    for j in range(m):
        sel = inv == j
        assert (cells[sel] == cells[sel][0]).all()


def test_radius_neighbors_matches_bruteforce(rng):
    sup = rng.random((300, 3)).astype(np.float32)
    que = rng.random((40, 3)).astype(np.float32)
    r = 0.2
    idx, cnt = native.radius_neighbors(sup, que, r, max_k=64)
    for q in range(40):
        d = ((sup - que[q]) ** 2).sum(1)
        want = set(np.where(d <= r * r)[0])
        got = set(idx[q][: cnt[q]].tolist())
        assert got == want
        assert (idx[q][cnt[q]:] == 300).all()


def test_voxelize_rulebook(rng):
    coords = rng.integers(0, 5, size=(200, 3)).astype(np.int32)
    batch = rng.integers(0, 2, size=200).astype(np.int32)
    p2v, vc = native.voxelize_rulebook(coords, batch)
    for i in range(200):
        v = p2v[i]
        assert vc[v, 0] == batch[i]
        np.testing.assert_array_equal(vc[v, 1:], coords[i])
    # first-appearance order
    seen = set()
    expect = 0
    for i in range(200):
        if p2v[i] not in seen:
            assert p2v[i] == expect
            seen.add(int(p2v[i]))
            expect += 1


def test_nearest_neighbor_map(rng):
    res = rng.random((200, 3)).astype(np.float32)
    verts = rng.random((50, 3)).astype(np.float32)
    out = native.nearest_neighbor_map(verts, res, cell=0.2)
    for v in range(50):
        d = ((res - verts[v]) ** 2).sum(1)
        assert d[out[v]] <= d.min() + 1e-6


def test_connected_components(rng):
    edges = np.array([[0, 1], [1, 2], [4, 5], [7, 7]], np.int32)
    lab = native.connected_components(edges, 8)
    assert lab[0] == lab[1] == lab[2]
    assert lab[4] == lab[5]
    assert lab[3] not in (lab[0], lab[4])
    assert len({lab[0], lab[3], lab[4], lab[6], lab[7]}) == 5
