"""Fused windowed radius-CC kernel (ops/pallas_cc.py) vs brute-force oracle.

Runs in Pallas interpret mode on the CPU test mesh; the TPU path is the
same program with interpret=False.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from seggroup_tpu.ops.pallas_cc import semantic_radius_cc


def oracle_labels(coords, radius, batch, valid, sem):
    """Union-find over all in-radius same-batch same-sem pairs; labels =
    min original index per component, invalid -> N."""
    n = len(coords)
    parent = np.arange(n)

    def find(i):
        while parent[i] != i:
            parent[i] = parent[parent[i]]
            i = parent[i]
        return i

    idx = np.where(valid)[0]
    for ai, i in enumerate(idx):
        for j in idx[ai + 1:]:
            if batch[i] != batch[j] or sem[i] != sem[j]:
                continue
            if np.sum((coords[i] - coords[j]) ** 2) <= radius * radius:
                ri, rj = find(i), find(j)
                if ri != rj:
                    parent[max(ri, rj)] = min(ri, rj)
    lab = np.full(n, n, np.int64)
    for i in idx:
        lab[i] = find(i)
    return lab


def make_scene(rng, n_cap=2048, n=1500, blobs=12, batches=2, spread=4.0):
    coords = np.zeros((n_cap, 3), np.float32)
    batch = np.zeros(n_cap, np.int32)
    sem = np.zeros(n_cap, np.int32)
    centers = rng.uniform(-spread, spread, (blobs, 3))
    bi = rng.integers(0, batches, blobs)
    si = rng.integers(2, 8, blobs)
    which = rng.integers(0, blobs, n)
    coords[:n] = centers[which] + rng.normal(0, 0.05, (n, 3))
    batch[:n] = bi[which]
    sem[:n] = si[which]
    valid = np.zeros(n_cap, bool)
    valid[:n] = True
    return coords, batch, sem, valid


def same_partition(a, b, valid):
    a, b = np.asarray(a), np.asarray(b)
    va, vb = a[valid], b[valid]
    # bijection between label values
    return (len(np.unique(va)) == len(np.unique(vb))
            == len(np.unique(np.stack([va, vb], 1), axis=0)))


def test_windowed_cc_matches_oracle(rng):
    coords, batch, sem, valid = make_scene(rng)
    lab, use_window = semantic_radius_cc(
        jnp.asarray(coords), jnp.float32(0.12), jnp.asarray(batch),
        jnp.asarray(valid), jnp.asarray(sem), return_use_window=True)
    assert bool(use_window)
    lab = np.asarray(lab)
    want = oracle_labels(coords, 0.12, batch, valid, sem)
    np.testing.assert_array_equal(lab[valid], want[valid])  # canonical ==
    assert (lab[~valid] == len(coords)).all()


def test_windowed_cc_respects_batch_and_semantics(rng):
    # identical positions, different batch/sem -> separate components
    # (plus far-away filler so the grid passes the dims>=5 alias guard)
    n_cap = 2048
    coords = np.zeros((n_cap, 3), np.float32)
    coords[:4] = [[0, 0, 0], [0.01, 0, 0], [0, 0.01, 0], [0.01, 0.01, 0]]
    coords[4] = [2.0, 2.0, 2.0]
    coords[5] = [-2.0, -2.0, -2.0]
    batch = np.array([0, 0, 1, 1, 0, 1] + [0] * (n_cap - 6), np.int32)
    sem = np.array([5, 5, 5, 6, 9, 9] + [0] * (n_cap - 6), np.int32)
    valid = np.zeros(n_cap, bool)
    valid[:6] = True
    lab, use_window = semantic_radius_cc(
        jnp.asarray(coords), jnp.float32(0.05), jnp.asarray(batch),
        jnp.asarray(valid), jnp.asarray(sem), return_use_window=True)
    assert bool(use_window)
    lab = np.asarray(lab)
    assert lab[0] == lab[1] == 0          # same batch+sem, touching
    assert lab[2] == 2 and lab[3] == 3    # batch 1 split by sem


def test_public_wrapper_equals_fallback_partition(rng):
    """semantic_radius_cc (windowed) and the XLA fallback agree when the
    fallback's neighbor caps don't truncate."""
    coords, batch, sem, valid = make_scene(rng, n=600, blobs=30)
    args = (jnp.asarray(coords), jnp.float32(0.12), jnp.asarray(batch),
            jnp.asarray(valid), jnp.asarray(sem))
    lab_fast = np.asarray(semantic_radius_cc(*args))
    from seggroup_tpu.ops.pallas_cc import _canonicalize
    from seggroup_tpu.ops.cc import semantic_connected_components
    from seggroup_tpu.ops.knn import ball_query

    nbrs, _, _ = ball_query(args[0], 0.12, args[2], args[3],
                            max_neighbors=64)
    lab_slow = semantic_connected_components(
        nbrs, jnp.ones(nbrs.shape, bool), args[3], args[4])
    lab_slow = np.asarray(_canonicalize(
        jnp.where(args[3], lab_slow, len(coords)), len(coords)))
    assert same_partition(lab_fast, lab_slow, valid)


def test_window_overflow_falls_back(rng):
    """A dense blob overflows a tiny window; the cond must take the exact
    fallback and still produce the right partition."""
    coords, batch, sem, valid = make_scene(rng, n=1800, blobs=2, spread=0.2)
    out, use_window = semantic_radius_cc(
        jnp.asarray(coords), jnp.float32(0.12), jnp.asarray(batch),
        jnp.asarray(valid), jnp.asarray(sem), window=32,
        max_neighbors_fallback=128, return_use_window=True)
    assert not bool(use_window)
    out = np.asarray(out)
    want = oracle_labels(coords, 0.12, batch, valid, sem)
    assert same_partition(out, want, valid)


def test_non_tile_multiple_uses_fallback(rng):
    coords, batch, sem, valid = make_scene(rng, n_cap=1000, n=700)
    out = np.asarray(semantic_radius_cc(
        jnp.asarray(coords), jnp.float32(0.12), jnp.asarray(batch),
        jnp.asarray(valid), jnp.asarray(sem), max_neighbors_fallback=128))
    want = oracle_labels(coords, 0.12, batch, valid, sem)
    assert same_partition(out, want, valid)
    assert (out[~valid] == 1000).all()


def test_fused_dual_cc_matches_two_runs(rng):
    """One CC over [coords; shifted] with disambiguated batch ids gives the
    same per-half partitions as two separate runs (PointGroup's fused dual
    clustering, models/pointgroup.py)."""
    from seggroup_tpu.ops.pallas_cc import semantic_radius_cc

    n = 1024
    pts = jnp.asarray(rng.uniform(0, 4, (n, 3)).astype(np.float32))
    shift = pts + jnp.asarray(rng.normal(0, 0.2, (n, 3)).astype(np.float32))
    bids = jnp.asarray((rng.integers(0, 2, n)).astype(np.int32))
    ok = jnp.asarray(rng.uniform(size=n) < 0.8)
    sem = jnp.asarray(rng.integers(2, 5, n).astype(np.int32))
    r = 0.12

    la = np.asarray(semantic_radius_cc(pts, r, bids, ok, sem))
    lb = np.asarray(semantic_radius_cc(shift, r, bids, ok, sem))

    pts2 = jnp.concatenate([pts, shift])
    lab2 = np.asarray(semantic_radius_cc(
        pts2, r, jnp.concatenate([bids * 2, bids * 2 + 1]),
        jnp.concatenate([ok, ok]), jnp.concatenate([sem, sem])))

    np.testing.assert_array_equal(
        np.where(la < n, la, -1), np.where(lab2[:n] < 2 * n, lab2[:n], -1))
    np.testing.assert_array_equal(
        np.where(lb < n, lb, -1),
        np.where(lab2[n:] < 2 * n, lab2[n:] - n, -1))


def test_fused_dual_cc_fallback_split(rng):
    """When the fused dual array takes the XLA fallback (size not a multiple
    of 8*tile), fused_halves splits it back into per-half problems with the
    single-problem ball-query key range."""
    from seggroup_tpu.ops.pallas_cc import semantic_radius_cc

    n = 768  # 2n = 1536, not a multiple of 2048 -> fallback path
    pts = jnp.asarray(rng.uniform(0, 4, (n, 3)).astype(np.float32))
    shift = pts + jnp.asarray(rng.normal(0, 0.2, (n, 3)).astype(np.float32))
    bids = jnp.asarray((rng.integers(0, 2, n)).astype(np.int32))
    ok = jnp.asarray(rng.uniform(size=n) < 0.8)
    sem = jnp.asarray(rng.integers(2, 5, n).astype(np.int32))
    r = 0.12

    la = np.asarray(semantic_radius_cc(pts, r, bids, ok, sem))
    lb = np.asarray(semantic_radius_cc(shift, r, bids, ok, sem))
    lab2 = np.asarray(semantic_radius_cc(
        jnp.concatenate([pts, shift]), r,
        jnp.concatenate([bids * 2, bids * 2 + 1]),
        jnp.concatenate([ok, ok]), jnp.concatenate([sem, sem]),
        fused_halves=True))
    np.testing.assert_array_equal(
        np.where(la < n, la, -1), np.where(lab2[:n] < 2 * n, lab2[:n], -1))
    np.testing.assert_array_equal(
        np.where(lb < n, lb, -1),
        np.where(lab2[n:] < 2 * n, lab2[n:] - n, -1))


def test_degenerate_valid_set_stays_windowed(rng):
    """Few (or zero) valid points used to fail the dims>=5 alias guard and
    pay the full exact-fallback sweep; the grid now clamps to the safety
    floor and the windowed kernel handles the degenerate problem directly
    (PointGroup at init: obj mask ~empty while sem_pred is wall/floor)."""
    n_cap = 2048
    coords = np.zeros((n_cap, 3), np.float32)
    coords[:3] = [[0, 0, 0], [0.01, 0, 0], [1.0, 1.0, 1.0]]
    batch = np.zeros(n_cap, np.int32)
    sem = np.full(n_cap, 4, np.int32)
    valid = np.zeros(n_cap, bool)
    valid[:3] = True
    lab, use_window = semantic_radius_cc(
        jnp.asarray(coords), jnp.float32(0.05), jnp.asarray(batch),
        jnp.asarray(valid), jnp.asarray(sem), return_use_window=True)
    assert bool(use_window)
    lab = np.asarray(lab)
    assert lab[0] == lab[1] == 0 and lab[2] == 2
    assert (lab[3:] == n_cap).all()

    # fully empty valid set: windowed, all labels == N
    lab0, uw0 = semantic_radius_cc(
        jnp.asarray(coords), jnp.float32(0.05), jnp.asarray(batch),
        jnp.zeros(n_cap, bool), jnp.asarray(sem), return_use_window=True)
    assert bool(uw0)
    assert (np.asarray(lab0) == n_cap).all()


def test_large_key_space_stays_windowed(rng):
    """Grids whose linear keys exceed 2^29 (still inside the int32/prodf
    guard) used to trip a spurious window-overflow on the valid/pad boundary
    tile (the t_first pad filler was smaller than real keys) and fall back
    forever. Must stay windowed and match the oracle.

    Bug geometry: the boundary tile's t_first collapsed to the filler, so
    its apparent span became every point keyed above the filler — the trip
    needs > window (1024) such points, hence 1800 valid points all in the
    high-key region plus one low pin stretching the grid to ~900 cells/axis
    (key space ~7.3e8, between 2^29 and 2^30)."""
    n_cap, n = 2048, 1800
    coords = np.zeros((n_cap, 3), np.float32)
    centers = rng.uniform(24.0, 26.8, (10, 3)).astype(np.float32)
    which = rng.integers(0, 10, n)
    coords[:n] = centers[which] + rng.normal(0, 0.04, (n, 3)).astype(np.float32)
    coords[0] = 0.0  # low pin: stretches cmin so high points key > 2^29
    batch = np.zeros(n_cap, np.int32)
    sem = np.full(n_cap, 3, np.int32)
    sem[:n] = rng.integers(2, 5, n)
    valid = np.zeros(n_cap, bool)
    valid[:n] = True
    lab, use_window = semantic_radius_cc(
        jnp.asarray(coords), jnp.float32(0.03), jnp.asarray(batch),
        jnp.asarray(valid), jnp.asarray(sem), return_use_window=True)
    assert bool(use_window)
    want = oracle_labels(coords, 0.03, batch, valid, sem)
    lab = np.asarray(lab)
    np.testing.assert_array_equal(lab[valid], want[valid])
    assert (lab[~valid] == n_cap).all()


def test_adaptive_cell_scale_on_huge_extent(rng):
    """An extent whose cell-size-radius grid overflows the int32 key space
    must escalate the cell to 2x/4x radius and stay windowed (untrained
    PointGroup offsets reach tens of meters). Exactness is cell-size-free."""
    n_cap, n = 2048, 400
    coords = np.zeros((n_cap, 3), np.float32)
    centers = rng.uniform(0, 60.0, (12, 3)).astype(np.float32)  # 2000 cells/axis at r
    which = rng.integers(0, 12, n)
    coords[:n] = centers[which] + rng.normal(0, 0.04, (n, 3)).astype(np.float32)
    batch = np.zeros(n_cap, np.int32)
    sem = np.full(n_cap, 3, np.int32)
    sem[:n] = rng.integers(2, 5, n)
    valid = np.zeros(n_cap, bool)
    valid[:n] = True
    lab, use_window = semantic_radius_cc(
        jnp.asarray(coords), jnp.float32(0.03), jnp.asarray(batch),
        jnp.asarray(valid), jnp.asarray(sem), return_use_window=True)
    assert bool(use_window)
    want = oracle_labels(coords, 0.03, batch, valid, sem)
    lab = np.asarray(lab)
    np.testing.assert_array_equal(lab[valid], want[valid])
