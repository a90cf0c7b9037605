import jax.numpy as jnp
import numpy as np

from seggroup_tpu.ops import segment_ops as so


def test_segment_sum_mean(rng):
    n, s, c = 100, 8, 4
    data = rng.normal(size=(n, c)).astype(np.float32)
    ids = rng.integers(-1, s + 2, size=n)  # includes invalid ids
    out = so.segment_sum(jnp.array(data), jnp.array(ids), s)
    mean = so.segment_mean(jnp.array(data), jnp.array(ids), s)
    for k in range(s):
        sel = data[ids == k]
        np.testing.assert_allclose(np.asarray(out[k]), sel.sum(0), rtol=1e-5, atol=1e-5)
        want = sel.mean(0) if len(sel) else np.zeros(c)
        np.testing.assert_allclose(np.asarray(mean[k]), want, rtol=1e-5, atol=1e-5)


def test_segment_max_min_fill(rng):
    n, s = 50, 6
    data = rng.normal(size=(n, 3)).astype(np.float32)
    ids = rng.integers(0, s, size=n)
    ids[ids == 5] = 99  # make segment 5 empty
    mx = np.asarray(so.segment_max(jnp.array(data), jnp.array(ids), s))
    mn = np.asarray(so.segment_min(jnp.array(data), jnp.array(ids), s))
    for k in range(5):
        sel = data[ids == k]
        if len(sel):
            np.testing.assert_allclose(mx[k], sel.max(0), rtol=1e-6)
            np.testing.assert_allclose(mn[k], sel.min(0), rtol=1e-6)
    np.testing.assert_allclose(mx[5], 0.0)
    np.testing.assert_allclose(mn[5], 0.0)


def test_segment_argmax(rng):
    n, s, c = 40, 5, 3
    data = rng.normal(size=(n, c)).astype(np.float32)
    ids = rng.integers(0, s, size=n)
    arg = np.asarray(so.segment_argmax(jnp.array(data), jnp.array(ids), s))
    for k in range(s):
        rows = np.where(ids == k)[0]
        if len(rows) == 0:
            continue
        for j in range(c):
            best = rows[np.argmax(data[rows, j])]
            assert data[arg[k, j], j] == data[best, j]
            assert ids[arg[k, j]] == k


def test_csr_segment_reduce(rng):
    n, s = 60, 4
    data = rng.normal(size=(n, 2)).astype(np.float32)
    cuts = np.sort(rng.choice(np.arange(1, n), size=s - 1, replace=False))
    offsets = np.concatenate([[0], cuts, [n]]).astype(np.int32)
    out = np.asarray(
        so.csr_segment_reduce(jnp.array(data), jnp.array(offsets), s, mode="max")
    )
    for k in range(s):
        seg = data[offsets[k] : offsets[k + 1]]
        np.testing.assert_allclose(out[k], seg.max(0), rtol=1e-6)
