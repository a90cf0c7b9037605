"""Device-side primitive ops (the TPU-native analog of the reference's C++/CUDA
extension zoo; see SURVEY.md §2.6). Everything here is jit-able, fixed-shape,
and mask-based."""

from seggroup_tpu.ops.segment_ops import (
    segment_sum,
    segment_mean,
    segment_max,
    segment_min,
    segment_argmax,
    csr_segment_reduce,
)
from seggroup_tpu.ops.fps import farthest_point_sampling, masked_fps
from seggroup_tpu.ops.knn import (
    pairwise_sqdist,
    knn_brute,
    masked_knn,
    cluster_knn,
    ball_query,
    ball_query_pair,
)
from seggroup_tpu.ops.grouping import (
    SegGraph,
    init_graph,
    normalize_edges,
    group_nearby_clusters,
    absorb_small_clusters,
    group_unlabeled_clusters,
    aggregate_cluster_feature,
    edge_distances,
    build_similarity_matrix,
)
from seggroup_tpu.ops.cc import connected_components, semantic_connected_components
from seggroup_tpu.ops.voxelize import voxelize, voxel_gather_mean, point_recover
from seggroup_tpu.ops.iou import proposal_instance_iou
