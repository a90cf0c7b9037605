"""Quantify the two documented approximations at scale
(VERDICT r1 weak #10; docs/ARCHITECTURE.md deviations #2-3):

  * cluster_pointclouds feeds FPS a Morton-stratified strided <=cap subset
    for over-`cap` clusters (reference FPS scans all members,
    model.py:389-394). Measured min-pairwise spread of the 64 samples vs
    exact FPS on a gaussian cluster: 87% at 4x over-budget (the realistic
    regime — layer-1 segments average ~300 points), 72% at 40x.
  * cluster_knn truncates candidates to a `window` of Morton-sorted
    positions centered on the row block (reference get_knn scans the whole
    cluster, model.py:512-522). Measured at 2x over-window: ~1.6% mean
    neighbor-distance inflation, ~80% of rows bit-exact (an arbitrary-order
    window inflates ~24% — the Morton layout is what makes truncation
    benign).

Both are exact below their budgets (separately tested against oracles in
test_knn/test_fps); these tests pin the above deviation magnitudes so
regressions in the ordering/window logic surface as measurable drift."""

import jax.numpy as jnp
import numpy as np
import pytest

from seggroup_tpu.models.seggroup import cluster_pointclouds
from seggroup_tpu.ops.knn import cluster_knn


def _min_pairwise(c):
    d = ((c[:, None, :3] - c[None, :, :3]) ** 2).sum(-1)
    np.fill_diagonal(d, 1e9)
    return float(np.sqrt(d.min()))


@pytest.mark.slow
def test_fps_strided_cap_spread_at_scale(rng):
    """4096-member cluster through cap=1024: >=80% of exact FPS spread."""
    n = 4096
    pts = np.zeros((n, 6), np.float32)
    pts[:, :3] = rng.normal(size=(n, 3)).astype(np.float32)
    point2root = np.zeros(n, np.int32)

    clouds_cap, _ = cluster_pointclouds(
        jnp.array(pts), jnp.array(point2root), 4, p_out=64, cap=1024,
        transform=False)
    clouds_big, _ = cluster_pointclouds(
        jnp.array(pts), jnp.array(point2root), 4, p_out=64, cap=n,
        transform=False)
    spread_cap = _min_pairwise(np.asarray(clouds_cap[0]))
    spread_big = _min_pairwise(np.asarray(clouds_big[0]))
    assert spread_cap > 0.80 * spread_big, (spread_cap, spread_big)


@pytest.mark.slow
def test_cluster_knn_window_truncation_at_scale(rng):
    """One cluster twice the window size: the Morton-windowed kNN's neighbor
    DISTANCES stay within 3% of exact on average, and most rows are exact
    (the model consumes distances through edge convs, not identities)."""
    n, k, window = 16384, 20, 8192
    pts = rng.normal(size=(n, 3)).astype(np.float32) * 2.0
    cid = np.zeros(n, np.int32)

    idx_win = np.asarray(cluster_knn(jnp.array(pts), jnp.array(cid), k=k,
                                     row_block=1024, window=window))
    d_exact = np.zeros((n, k), np.float32)
    d_win = np.zeros((n, k), np.float32)
    for lo in range(0, n, 2048):
        hi = lo + 2048
        d = ((pts[lo:hi, None] - pts[None]) ** 2).sum(-1)
        d_exact[lo:hi] = np.sort(d, axis=1)[:, :k]
        d_win[lo:hi] = np.sort(
            ((pts[lo:hi, None] - pts[idx_win[lo:hi]]) ** 2).sum(-1), axis=1)
    rel_infl = ((np.sqrt(d_win + 1e-12) - np.sqrt(d_exact + 1e-12)).mean()
                / np.sqrt(d_exact).mean())
    assert rel_infl < 0.03, rel_infl
    exact_rows = (np.abs(np.sqrt(d_win) - np.sqrt(d_exact)) < 1e-4).all(1)
    assert exact_rows.mean() > 0.7, exact_rows.mean()
