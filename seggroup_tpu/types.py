"""Fixed-shape pytree containers shared across the framework."""

from __future__ import annotations

from typing import NamedTuple

import jax


class Scene(NamedTuple):
    """One ScanNet scene, padded to static shapes (the TPU analog of the
    reference's per-scene pcl/label/adj/seg pickle zoo, SURVEY.md S15-S17).

    N = points (reference resamples every scene to 150k,
        seggroup/dataset/scannet/prepare_data.py:29), S = segment slots,
    E = segment-adjacency edge slots."""

    points: jax.Array      # (N, 6) float32: xyz, rgb in [-1, 1]
    point2seg: jax.Array   # (N,) int32 in [0, S); >= S marks padding points
    weak_ins: jax.Array    # (S,) int32 per-segment weak instance label, -1 = none
    weak_sem: jax.Array    # (S,) int32 per-segment weak semantic label (0..39), -1
    edges: jax.Array       # (E, 2) int32 segment adjacency
    edge_valid: jax.Array  # (E,) bool
    real_sem: jax.Array    # (N,) int32 GT semantic (1..40, 0 = unannotated)
    real_ins: jax.Array    # (N,) int32 GT instance (1.., 0 = none)

    @property
    def num_points(self) -> int:
        return self.points.shape[0]

    @property
    def num_slots(self) -> int:
        return self.weak_ins.shape[0]
