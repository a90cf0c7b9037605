import jax.numpy as jnp
import numpy as np

from seggroup_tpu.ops.cc import compact_labels, connected_components, semantic_connected_components
from seggroup_tpu.ops.iou import proposal_instance_iou
from seggroup_tpu.ops.knn import ball_query
from seggroup_tpu.ops.voxelize import point_recover, voxel_gather_mean, voxelize


def cc_oracle(n, pairs, valid):
    import collections
    adj = collections.defaultdict(list)
    for a, b in pairs:
        adj[a].append(b)
        adj[b].append(a)
    label = np.full(n, n, np.int32)
    for start in range(n):
        if not valid[start] or label[start] != n:
            continue
        comp, stack = [], [start]
        seen = {start}
        while stack:
            u = stack.pop()
            comp.append(u)
            for v in adj[u]:
                if valid[v] and v not in seen:
                    seen.add(v)
                    stack.append(v)
        m = min(comp)
        for u in comp:
            label[u] = m
    return label


def test_connected_components(rng):
    n, k = 64, 4
    nbrs = rng.integers(0, n, size=(n, k)).astype(np.int32)
    nv = rng.random((n, k)) < 0.5
    valid = np.ones(n, bool)
    valid[60:] = False
    pairs = [
        (i, int(nbrs[i, j]))
        for i in range(n)
        for j in range(k)
        if nv[i, j] and valid[i] and valid[nbrs[i, j]]
    ]
    want = cc_oracle(n, pairs, valid)
    got = np.asarray(
        connected_components(jnp.array(nbrs), jnp.array(nv), jnp.array(valid))
    )
    np.testing.assert_array_equal(got, want)


def test_semantic_cc_splits_classes(rng):
    # two spatially-mixed semantic classes -> separate components
    n = 100
    pts = rng.random((n, 3)).astype(np.float32) * 0.2  # everything within radius
    sem = (np.arange(n) % 2).astype(np.int32)
    batch = np.zeros(n, np.int32)
    valid = np.ones(n, bool)
    nbrs, _cnt, _ovf = ball_query(
        jnp.array(pts), 0.5, jnp.array(batch), jnp.array(valid),
        max_neighbors=64, bucket_cap=128,
    )
    nv = jnp.ones(nbrs.shape, bool)
    lab = np.asarray(
        semantic_connected_components(
            nbrs, nv, jnp.array(valid), jnp.array(sem), ignore_labels=()
        )
    )
    assert len(np.unique(lab)) == 2
    assert (lab[sem == 0] == lab[sem == 0][0]).all()
    assert (lab[sem == 1] == lab[sem == 1][0]).all()
    assert lab[sem == 0][0] != lab[sem == 1][0]


def test_compact_labels(rng):
    n = 50
    lab = rng.choice([3, 17, 42, 99], size=n).astype(np.int32)
    valid = np.ones(n, bool)
    valid[45:] = False
    compact, num, sizes = compact_labels(jnp.array(lab), jnp.array(valid), 8)
    compact, num, sizes = np.asarray(compact), int(num), np.asarray(sizes)
    present = np.unique(lab[valid])
    assert num == len(present)
    # ascending original label -> ascending compact id
    for ci, orig in enumerate(present):
        sel = (lab == orig) & valid
        assert (compact[sel] == ci).all()
        assert sizes[ci] == sel.sum()
    assert (compact[~valid] == 8).all()


def test_voxelize_roundtrip(rng):
    n, m = 200, 256
    coords = rng.integers(0, 8, size=(n, 3)).astype(np.int32)
    batch = rng.integers(0, 2, size=n).astype(np.int32)
    valid = np.ones(n, bool)
    valid[190:] = False
    feats = rng.normal(size=(n, 5)).astype(np.float32)

    vm = voxelize(jnp.array(coords), jnp.array(batch), jnp.array(valid), m)
    p2v = np.asarray(vm.point2voxel)
    keys = {}
    for i in range(n):
        if not valid[i]:
            assert p2v[i] == m
            continue
        kk = (batch[i], *coords[i])
        if kk in keys:
            assert p2v[i] == keys[kk]
        else:
            keys[kk] = p2v[i]
    assert int(vm.num_voxels) == len(keys)
    vc = np.asarray(vm.voxel_coords)
    for kk, v in keys.items():
        np.testing.assert_array_equal(vc[v], np.array(kk))

    vox_feats = np.asarray(voxel_gather_mean(jnp.array(feats), vm))
    for kk, v in keys.items():
        sel = valid & (batch == kk[0]) & (coords == np.array(kk[1:])).all(1)
        np.testing.assert_allclose(vox_feats[v], feats[sel].mean(0), rtol=1e-5)

    rec = np.asarray(point_recover(jnp.array(vox_feats), vm))
    for i in range(190):
        np.testing.assert_allclose(rec[i], vox_feats[p2v[i]], rtol=1e-6)
    assert (rec[190:] == 0).all()


def test_proposal_instance_iou(rng):
    n, p, q = 300, 6, 4
    prop = rng.integers(-1, p, size=n).astype(np.int32)
    inst = rng.integers(-1, q, size=n).astype(np.int32)
    valid = np.ones(n, bool)
    got = np.asarray(
        proposal_instance_iou(jnp.array(prop), jnp.array(inst), jnp.array(valid), p, q)
    )
    for a in range(p):
        for b in range(q):
            pa = prop == a
            ib = inst == b
            inter = (pa & ib).sum()
            union = pa.sum() + ib.sum() - inter
            want = inter / union if union else 0.0
            np.testing.assert_allclose(got[a, b], want, rtol=1e-5)
