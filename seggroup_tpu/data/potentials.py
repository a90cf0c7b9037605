"""Potential-based spatially-regular sphere sampling (host side).

Re-implements the reference KPConv input generator's coverage mechanism
(reference kpconv/datasets/Scannet.py:701-819): every scene keeps a per-point
*potential*; each draw centers an in-radius sphere at the globally
minimum-potential point and bumps the potentials of the points inside the
sphere with a Tukey (biweight) profile, so subsequent draws are pushed toward
unvisited regions and full coverage is guaranteed (random centers are not —
they leave points unvisited, which silently shrinks evaluation sets).

Design differences from the reference (deliberate, host-only component):
  * potentials live on a uniform-grid subsample of each scene (default 8 cm)
    instead of the full cloud — same coverage guarantee at ~1/50 the memory;
  * neighbor lookups use a per-scene cKDTree built once (the reference also
    keeps persistent KD-trees, Scannet.py:367-423).

Shared by the KPConv trainer (`cli/stage2_train_kpconv.py`) and the voting
tester (`cli/stage2_test_semantic.py`): the tester draws until
`min_potential() >= 1.0`, i.e. every potential point has been inside at
least one sphere.
"""

from __future__ import annotations

import numpy as np
from scipy.spatial import cKDTree

__all__ = ["PotentialSampler"]


class PotentialSampler:
    """Min-potential sphere sampler over a set of scenes.

    coords_per_scene: list of (N_i, 3) float arrays (scene point clouds).
    in_radius:        sphere radius (reference in_radius=2.0 m).
    grid:             potential-subsample cell size in meters.
    seed:             RNG seed for the potential init jitter and the small
                      center jitter (reference adds noise at both sites,
                      Scannet.py:735-745).
    """

    def __init__(self, coords_per_scene, in_radius: float = 2.0,
                 grid: float = 0.08, seed: int = 0):
        self.in_radius = float(in_radius)
        self.rng = np.random.default_rng(seed)
        self.sub_points: list[np.ndarray] = []
        self.trees: list[cKDTree] = []
        self.potentials: list[np.ndarray] = []
        for c in coords_per_scene:
            c = np.asarray(c, np.float32)
            # uniform-grid subsample: first point per cell
            cell = np.floor(c / grid).astype(np.int64)
            key = (cell[:, 0] * 73856093) ^ (cell[:, 1] * 19349663) ^ (
                cell[:, 2] * 83492791)
            _, first = np.unique(key, return_index=True)
            sub = c[np.sort(first)]
            self.sub_points.append(sub)
            self.trees.append(cKDTree(sub))
            # tiny random init so ties break randomly (Scannet.py:733)
            self.potentials.append(
                self.rng.random(len(sub)).astype(np.float32) * 1e-3)
        self._mins = np.array([p.min() for p in self.potentials], np.float32)

    def __len__(self):
        return len(self.sub_points)

    def min_potential(self) -> float:
        """Global minimum potential — >= 1.0 means every potential point has
        been covered by at least one drawn sphere."""
        return float(self._mins.min())

    def next_center(self) -> tuple[int, np.ndarray]:
        """Pick the (scene, center) at the global potential minimum and update
        potentials of the sphere's points with the Tukey profile
        (reference Scannet.py:779-791)."""
        si = int(np.argmin(self._mins))
        pots = self.potentials[si]
        pi = int(np.argmin(pots))
        center = self.sub_points[si][pi].copy()
        # small center jitter (reference noise scale in_radius/10 during
        # training; keep it modest and always-on — it cannot break coverage
        # because the update is applied around the *jittered* center)
        center += self.rng.normal(scale=self.in_radius / 10.0, size=3).astype(
            np.float32)
        idx = self.trees[si].query_ball_point(center, self.in_radius)
        idx = np.asarray(idx, np.int64)
        if len(idx):
            d2 = np.sum((self.sub_points[si][idx] - center) ** 2, axis=1)
            tukey = np.square(1.0 - d2 / self.in_radius ** 2)
            pots[idx] += tukey.astype(np.float32)
        else:  # jitter pushed the center off-cloud: still bump the seed point
            pots[pi] += 1.0
        self._mins[si] = pots.min()
        return si, center
