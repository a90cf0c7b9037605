import jax.numpy as jnp
import numpy as np

from seggroup_tpu.ops.fps import farthest_point_sampling, masked_fps


def fps_oracle(pts, k):
    """Numpy oracle with the reference's deterministic config
    (initial_idx=0, skip_initial=True; reference seggroup/model.py:329-395)."""
    n = pts.shape[0]
    d0 = ((pts - pts[0]) ** 2).sum(-1)
    first = int(np.argmax(d0))
    idx = [first]
    min_d = ((pts - pts[first]) ** 2).sum(-1)
    for _ in range(1, k):
        nxt = int(np.argmax(min_d))
        idx.append(nxt)
        min_d = np.minimum(min_d, ((pts - pts[nxt]) ** 2).sum(-1))
    return np.array(idx)


def test_fps_matches_oracle(rng):
    pts = rng.normal(size=(200, 3)).astype(np.float32)
    k = 16
    got = np.asarray(farthest_point_sampling(jnp.array(pts), k))
    want = fps_oracle(pts, k)
    np.testing.assert_array_equal(got, want)


def test_masked_fps_ignores_invalid(rng):
    pts = rng.normal(size=(2, 64, 3)).astype(np.float32)
    valid = np.ones((2, 64), bool)
    valid[0, 32:] = False
    # plant a far outlier in the invalid region: must never be selected
    pts[0, 40] = [100.0, 100.0, 100.0]
    idx = np.asarray(masked_fps(jnp.array(pts), jnp.array(valid), 8))
    assert (idx[0] < 32).all()
    # batch row 1 unaffected by row 0's mask
    want = fps_oracle(pts[1], 8)
    np.testing.assert_array_equal(idx[1], want)
