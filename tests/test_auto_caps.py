"""Auto cap-escalation for stage-1 (VERDICT r3 item 5): the host picks
per-scene static budgets from fixed buckets BEFORE any compile, so default
exports stay on the exact reference-semantics path (no silently-divergent
layer-2 pseudo-labels — those are exactly what KPConv/MinkUNet train on,
reference kpconv/datasets/Scannet2.py:148-156)."""

import numpy as np

from cli.stage1_common import (CLUSTER_CAP_BUCKETS, KNN_WINDOW_BUCKETS,
                               group_scenes_by_cap, host_max_segment_size,
                               pick_bucket)
from seggroup_tpu.data.synthetic import make_synthetic_scene


def test_pick_bucket_boundaries():
    assert pick_bucket(0, CLUSTER_CAP_BUCKETS, 1024) == 1024
    assert pick_bucket(1024, CLUSTER_CAP_BUCKETS, 1024) == 1024
    assert pick_bucket(1025, CLUSTER_CAP_BUCKETS, 1024) == 2048
    assert pick_bucket(2560, CLUSTER_CAP_BUCKETS, 1024) == 4096
    # minimum dominates small sizes
    assert pick_bucket(10, CLUSTER_CAP_BUCKETS, 4096) == 4096
    # past the largest bucket: clamp to largest (callers warn)
    assert pick_bucket(10 ** 9, CLUSTER_CAP_BUCKETS) == CLUSTER_CAP_BUCKETS[-1]
    assert pick_bucket(9000, KNN_WINDOW_BUCKETS, 8192) == 16384


def test_host_max_segment_size_matches_bincount():
    scene = make_synthetic_scene(seed=0, num_points=4096, num_slots=64,
                                 num_edges=256, num_instances=4,
                                 segs_per_instance=4, jax_arrays=False)
    p2s = np.asarray(scene.point2seg)
    want = np.bincount(p2s[p2s < 64]).max()
    assert host_max_segment_size(scene) == want


class _FakeSource:
    def __init__(self, scenes):
        self.scenes = scenes
        self.names = [f"s{i}" for i in range(len(scenes))]

    def __len__(self):
        return len(self.scenes)

    def get(self, i):
        return self.scenes[i], {}


def test_group_scenes_by_cap_buckets_oversize_segment():
    """A scene with a >1024-point layer-1 segment lands in the 2048 bucket;
    small scenes stay at the minimum."""
    small = make_synthetic_scene(seed=1, num_points=2048, num_slots=64,
                                 num_edges=256, num_instances=4,
                                 segs_per_instance=4, jax_arrays=False)
    big = make_synthetic_scene(seed=2, num_points=2048, num_slots=64,
                               num_edges=256, num_instances=4,
                               segs_per_instance=4, jax_arrays=False)
    # concentrate one segment past the 1024 budget
    p2s = np.asarray(big.point2seg).copy()
    p2s[:1500] = 7
    big = big._replace(point2seg=p2s)
    assert host_max_segment_size(big) >= 1500

    groups = group_scenes_by_cap(_FakeSource([small, big]), minimum=1024)
    assert groups == {1024: [0], 2048: [1]}
