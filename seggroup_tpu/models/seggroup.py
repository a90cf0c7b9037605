"""Stage-1 SegGroup GNN, TPU-native.

Re-designs the reference `SegModel` (reference seggroup/model.py:658-932) as a
single jittable forward over fixed-shape padded tensors:

  * the DGCNN edge-conv encoders MLP1/2/3 (model.py:65-138) become batched
    Dense layers over (slots/points, k, feat) gathers — 1x1 convs are matmuls,
    so the MXU does the work;
  * BatchNorm is mask-aware (padded cluster slots / points are excluded from
    batch statistics) — the reference's BN sees only real rows because it
    never pads;
  * the per-cluster resample + FPS host loop (model.py:398-426) becomes one
    batched gather + masked FPS over every cluster at once;
  * union-find grouping runs via ops.grouping (see that module's docstring
    for the sequential-semantics argument).

Weak-label conventions follow the reference prep: weak ins/sem are 0-based
with -1 = unlabeled (dataset/scannet/util.py:745-752); exports add +1 so 0
means unannotated (model.py:559,587).
"""

from __future__ import annotations

from typing import NamedTuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from seggroup_tpu.ops import grouping as gr
from seggroup_tpu.ops.fps import masked_fps
from seggroup_tpu.ops.knn import cluster_knn, knn_brute
from seggroup_tpu.ops.segment_ops import segment_max, segment_mean, segment_sum
from seggroup_tpu.types import Scene

NUM_CLASSES = 40
# nyu40 ids used by the reference evaluator (model.py:27-28)
SEM_VALID_CLASS_IDS = (1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 14, 16, 24, 28, 33, 34, 36, 39)
INS_VALID_CLASS_IDS = (3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 14, 16, 24, 28, 33, 34, 36, 39)


# ---------------------------------------------------------------------------
# building blocks
# ---------------------------------------------------------------------------


class MaskedBatchNorm(nn.Module):
    """BatchNorm over the leading axes with a validity mask (padded rows do not
    pollute the statistics). Running stats live in the `batch_stats`
    collection, as in standard flax BatchNorm.

    axis_name: when the rows are point-sharded across a mesh axis (each
    device sees only its slab), psum the masked sums/counts over that axis so
    the statistics equal the single-device computation."""

    momentum: float = 0.9
    epsilon: float = 1e-5
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x: jax.Array, mask: jax.Array, train: bool) -> jax.Array:
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        ra_mean = self.variable("batch_stats", "mean", lambda: jnp.zeros((c,)))
        ra_var = self.variable("batch_stats", "var", lambda: jnp.ones((c,)))

        x = x.astype(jnp.float32)  # stats and normalization in f32
        if train:
            m = mask.reshape(mask.shape + (1,) * (x.ndim - mask.ndim)).astype(x.dtype)
            axes = tuple(range(x.ndim - 1))
            cnt = jnp.sum(m)
            ssum = jnp.sum(x * m, axis=axes)
            if self.axis_name is not None:
                cnt, ssum = jax.lax.psum((cnt, ssum), self.axis_name)
            cnt = jnp.maximum(cnt, 1.0)
            mean = ssum / cnt
            vsum = jnp.sum(jnp.square(x - mean) * m, axis=axes)
            if self.axis_name is not None:
                vsum = jax.lax.psum(vsum, self.axis_name)
            var = vsum / cnt
            if not self.is_initializing():
                ra_mean.value = self.momentum * ra_mean.value + (1 - self.momentum) * mean
                ra_var.value = self.momentum * ra_var.value + (1 - self.momentum) * var
        else:
            mean, var = ra_mean.value, ra_var.value
        y = (x - mean) * jax.lax.rsqrt(var + self.epsilon)
        return y * scale + bias


def _leaky(x):
    return nn.leaky_relu(x, negative_slope=0.2)


class MLP1(nn.Module):
    """Per-cluster edge-conv encoder: (S, P, 6) cluster clouds -> (S, 128)
    (max || mean pooled). Mirrors reference MLP1 + get_graph_feature1
    (model.py:39-80): kNN over xyz within the cluster cloud, neighbor xyz
    centered over k and scaled x10, 1x1 conv 6->64, LeakyReLU, max over k,
    then max/mean over points."""

    k: int = 10

    @nn.compact
    def __call__(self, clouds: jax.Array, slot_valid: jax.Array, train: bool) -> jax.Array:
        s, p, _ = clouds.shape
        idx = knn_brute(clouds[..., :3], self.k)  # (S, P, k) self included
        nbr = jnp.take_along_axis(
            clouds[:, :, None, :], idx[..., None], axis=1
        )  # (S, P, k, 6)
        xyz = nbr[..., :3]
        xyz = (xyz - jnp.mean(xyz, axis=2, keepdims=True)) * 10.0
        feat = jnp.concatenate([xyz, nbr[..., 3:]], axis=-1)  # (S, P, k, 6)
        h = nn.Dense(64, use_bias=False, name="conv1")(feat)
        mask = jnp.broadcast_to(slot_valid[:, None, None], (s, p, self.k))
        h = MaskedBatchNorm(name="bn1")(h, mask, train)
        h = _leaky(h)
        h = jnp.max(h, axis=2)  # over k -> (S, P, 64)
        x1 = jnp.max(h, axis=1)
        x2 = jnp.mean(h, axis=1)
        out = jnp.concatenate([x1, x2], axis=-1)  # (S, 128)
        return jnp.where(slot_valid[:, None], out, 0.0)


class EdgeConvBlock(nn.Module):
    """Shared body of MLP2/MLP3 (reference model.py:106-138): per-point edge
    conv over a precomputed kNN graph. Input (N, 9), idx (N, k); feature is
    concat(f_nbr - f_self, f_self) -> 18 dims; 1..2 conv layers; max over k.

    The (N, k, C) intermediates ride in `dtype` (default bfloat16: gathers
    and elementwise traffic are the cost here — see docs/ARCHITECTURE.md perf
    notes); matmul accumulation and BN statistics stay f32. dtype=float32 is
    the reference-precision path (used by the composed numpy-oracle test).

    Point sharding: pass rows for the LOCAL slab in x/idx/point_valid and
    the full (replicated) feature array as `src` — neighbor indices are
    global, so gathers read src; set axis_name so BN statistics psum across
    the slab axis and match the single-device values."""

    layers: int = 1
    dtype: jnp.dtype = jnp.bfloat16
    axis_name: str | None = None

    @nn.compact
    def __call__(
        self, x: jax.Array, idx: jax.Array, point_valid: jax.Array,
        train: bool, src: jax.Array | None = None,
    ) -> jax.Array:
        n, k = idx.shape
        xb = x.astype(self.dtype)
        srcb = xb if src is None else src.astype(self.dtype)
        nbr = srcb[idx]  # (N, k, 9)
        self_f = jnp.broadcast_to(xb[:, None, :], nbr.shape)
        feat = jnp.concatenate([nbr - self_f, self_f], axis=-1)  # (N, k, 18)
        mask = jnp.broadcast_to(point_valid[:, None], (n, k))
        h = nn.Dense(64, use_bias=False, dtype=self.dtype, name="conv1")(feat)
        h = MaskedBatchNorm(name="bn1", axis_name=self.axis_name)(h, mask, train)
        h = _leaky(h).astype(self.dtype)
        if self.layers == 2:
            h = nn.Dense(64, use_bias=False, dtype=self.dtype, name="conv2")(h)
            h = MaskedBatchNorm(name="bn2", axis_name=self.axis_name)(h, mask, train)
            h = _leaky(h).astype(self.dtype)
        h = jnp.max(h, axis=1).astype(jnp.float32)  # over k -> (N, 64)
        return jnp.where(point_valid[:, None], h, 0.0)


class GCN(nn.Module):
    """Row-normalized graph conv (reference model.py:141-151)."""

    dim: int

    @nn.compact
    def __call__(self, x: jax.Array, edge_matrix: jax.Array) -> jax.Array:
        norm = edge_matrix / jnp.sum(edge_matrix, axis=1, keepdims=True)
        h = nn.Dense(self.dim, use_bias=False, name="fc")(norm @ x)
        return nn.relu(h)


class Classifier(nn.Module):
    """256 -> 128 (BN, LeakyReLU, dropout .5) -> 40 (reference model.py:154-166)."""

    @nn.compact
    def __call__(self, x: jax.Array, valid: jax.Array, train: bool) -> jax.Array:
        h = nn.Dense(128, use_bias=False, name="linear1")(x)
        h = MaskedBatchNorm(name="bn1")(h, valid, train)
        h = _leaky(h)
        h = nn.Dropout(0.5, deterministic=not train)(h)
        return nn.Dense(NUM_CLASSES, name="linear2")(h)


def smoothed_cross_entropy(logits: jax.Array, labels: jax.Array, valid: jax.Array,
                           eps: float = 0.2) -> jax.Array:
    """Label-smoothed CE, summed (reference seggroup/util.py:12-29)."""
    n_class = logits.shape[-1]
    one_hot = jax.nn.one_hot(labels, n_class)
    soft = one_hot * (1 - eps) + (1 - one_hot) * eps / (n_class - 1)
    logp = jax.nn.log_softmax(logits, axis=-1)
    per_row = -jnp.sum(soft * logp, axis=-1)
    return jnp.sum(jnp.where(valid, per_row, 0.0))


# ---------------------------------------------------------------------------
# cluster point-cloud construction
# ---------------------------------------------------------------------------


def cluster_pointclouds(
    points: jax.Array,
    point2root: jax.Array,
    num_slots: int,
    p_out: int = 64,
    cap: int = 1024,
    transform: bool = True,
) -> tuple[jax.Array, jax.Array]:
    """Fixed-size per-cluster point clouds (reference get_cluster_pointcloud,
    model.py:398-426): clusters smaller than p_out are tiled rep times plus an
    FPS remainder; larger clusters contribute p_out FPS samples. All clusters
    are processed in one batch. Clusters beyond `cap` members feed FPS a
    deterministic strided subsample (the reference FPS scans all members on
    host; on device a static candidate budget keeps shapes fixed — the chosen
    samples are near-identical for any sensible cap).

    Returns (clouds (S, p_out, C), slot_valid (S,))."""
    n, c = points.shape
    s = num_slots
    cid = jnp.where(point2root < s, point2root, s)
    # cluster-major, Morton-minor order: the strided over-`cap` subsample
    # then reads spatially stratified members instead of arbitrary ones
    # (measured spread recovery in tests/test_approx_semantics.py)
    from seggroup_tpu.ops.knn import morton3d
    # mask padding rows (cid == s) out of the Morton bounding box: garbage
    # pad coords would blow up the quantization range and collapse real
    # points into few Morton cells
    m_order = jnp.argsort(morton3d(points[:, :3], valid=cid < s),
                          stable=True).astype(jnp.int32)
    order = m_order[jnp.argsort(cid[m_order], stable=True).astype(jnp.int32)]
    sorted_cid = cid[order]
    start = jnp.searchsorted(sorted_cid, jnp.arange(s), side="left").astype(jnp.int32)
    stop = jnp.searchsorted(sorted_cid, jnp.arange(s), side="right").astype(jnp.int32)
    count = stop - start  # (S,)
    slot_valid = count > 0

    i = jnp.arange(cap, dtype=jnp.int32)
    cnt = jnp.maximum(count, 1)[:, None]
    strided = (i[None, :].astype(jnp.float32) * cnt / cap).astype(jnp.int32)
    pos_in = jnp.where(cnt <= cap, jnp.minimum(i[None, :], cnt - 1), strided)
    members = order[jnp.clip(start[:, None] + pos_in, 0, n - 1)]  # (S, cap)
    mvalid = i[None, :] < jnp.minimum(cnt, cap)

    cand_xyz = points[members, :3]
    fps_idx = masked_fps(cand_xyz, mvalid, p_out)  # (S, p_out) into cap axis

    # output slot j: tiled members for j < rep*n, FPS picks afterwards
    rep = p_out // cnt  # (S, 1)
    j = jnp.arange(p_out, dtype=jnp.int32)[None, :]
    tiled_pos = j % cnt
    use_tile = j < rep * cnt
    fps_pos = jnp.take_along_axis(
        fps_idx, jnp.clip(j - rep * cnt, 0, p_out - 1), axis=1
    )
    pick = jnp.where(use_tile, tiled_pos, fps_pos)  # positions in cap axis
    out_members = jnp.take_along_axis(members, pick, axis=1)  # (S, p_out)
    clouds = points[out_members]  # (S, p_out, C)

    if transform:
        xyz = clouds[..., :3]
        xyz = xyz - jnp.mean(xyz, axis=1, keepdims=True)
        denom = jnp.maximum(jnp.max(jnp.abs(xyz), axis=(1, 2), keepdims=True), 1e-12)
        clouds = jnp.concatenate([xyz / denom, clouds[..., 3:]], axis=-1)
    clouds = jnp.where(slot_valid[:, None, None], clouds, 0.0)
    return clouds, slot_valid


# ---------------------------------------------------------------------------
# full pipeline
# ---------------------------------------------------------------------------


class Stage1Output(NamedTuple):
    loss_sum: jax.Array       # scalar
    loss_count: jax.Array     # scalar (instances in the classifier batch)
    iou_sem: jax.Array        # (2, 40) I / U per nyu40 class (resampled pts)
    iou_ins: jax.Array        # (2, 40)
    acc: jax.Array            # (4,) sem, ins, sem_sel, ins_sel
    layer_roots: jax.Array    # (4, N) per-layer point -> cluster root slot
    final_root: jax.Array     # (N,)
    final_sem: jax.Array      # (N,) exported convention: 1..40, -1 = none
    final_ins: jax.Array      # (N,)
    sem_layer2: jax.Array     # (N,) layer-2 semantic export (sem_infer output)
    ins_layer2: jax.Array     # (N,)
    max_segment_size: jax.Array  # scalar: largest layer-1 segment (binding
    # when > cluster_cap — FPS candidates truncate, model.py:398-426 analog)
    max_cluster_size: jax.Array  # scalar: largest merged cluster entering a
    # kNN layer (binding when > knn_window); CLIs warn and point at the
    # exact-path flags
    layer_sem: jax.Array      # (4, N) per-layer semantic export (+1 conv.;
    # reference export_semantic_label per layer, model.py:738-861)
    layer_ins: jax.Array      # (4, N) per-layer instance export


class SegGroupGNN(nn.Module):
    """The whole stage-1 per-scene pipeline as one module (reference
    SegModel.forward, model.py:684-932). `mode` selects the reference's three
    behaviors: 'train' (full pipeline + classifier loss), 'sem_infer' (stop
    after layer 2, structural threshold 3 instead of 6, model.py:754-755),
    'ins_infer' (full grouping, no classifier)."""

    th_structural: float = 6.0
    th_structural_sem_infer: float = 3.0
    th_semantic: float = 2.0
    gcn_alpha: float = 0.125
    sequential: bool = True  # True (default): bit-faithful sequential-order
    # merge emulation (ops.grouping.group_nearby_clusters_sequential) —
    # reference-parity pseudo-labels, a latency-bound lax.scan per layer.
    # False: parallel-rounds formulation — faster, exact on single-label
    # components, but measurably diverges (and loses pseudo-label quality)
    # once components hold conflicting weak labels; see
    # docs/ARCHITECTURE.md "Parallel vs sequential grouping" for the measured
    # divergence table (scripts/grouping_divergence.py).
    knn_k: int = 20
    knn_window: int = 8192  # sorted-candidate budget; clusters larger than
    # this get window-truncated (approximate) kNN — see ops.knn.cluster_knn
    fast_knn: bool = False  # lax.approx_max_k inside cluster_knn (~3.7x
    # faster per kNN call, recall 0.95) — pairs with parallel grouping as
    # the opt-in fast mode; default exact for reference parity
    knn_small_window: int | None = None  # bit-exact tiered fast path
    # (ops.knn.cluster_knn small_window); None = auto (window//4)
    mlp1_points: int = 64
    cluster_cap: int = 1024
    max_instances: int = 128
    compute_dtype: jnp.dtype = jnp.bfloat16  # edge-conv intermediate dtype;
    # float32 = reference precision (the composed-oracle test's configuration)
    shard_axis: str | None = None  # point-axis sharding (context-parallel
    # analog, SURVEY.md §5): when set, the model must run INSIDE a shard_map
    # over a mesh axis of this name with `shard_count` devices. The scene
    # stays replicated; each device computes the fat edge-conv intermediates
    # ((N, k, C) — the dominant per-scene memory term) for only its N/D point
    # slab, psums BN statistics, and all-gathers the (N, 64) result. Slot-
    # space work (grouping, GCN, classifier) is replicated. See
    # parallel/point_sharding.py for the step builders + equivalence tests.
    shard_count: int = 1

    def setup(self):
        self.mlp_1 = MLP1()
        self.mlp_2 = EdgeConvBlock(layers=1, dtype=self.compute_dtype,
                                   axis_name=self.shard_axis)
        self.gcn_2 = GCN(192)
        self.mlp_3 = EdgeConvBlock(layers=2, dtype=self.compute_dtype,
                                   axis_name=self.shard_axis)
        self.gcn_3 = GCN(256)
        self.classifier = Classifier()

    def __call__(self, scene: Scene, mode: str = "train", train: bool = True) -> Stage1Output:
        s = scene.num_slots
        n = scene.num_points
        pts = scene.points
        pt_valid = scene.point2seg < s

        # --- graph initialization (reference model.py:710-733)
        g = gr.init_graph(scene.point2seg, scene.weak_ins, scene.weak_sem, s)
        edges, ev = gr.normalize_edges(g, scene.edges, scene.edge_valid)
        roots_l1 = jnp.where(pt_valid, g.root[jnp.minimum(scene.point2seg, s - 1)], s)

        max_seg = jnp.max(segment_sum(
            pt_valid.astype(jnp.int32),
            jnp.where(pt_valid, roots_l1, s), s))
        # layer-1 export = weak labels on the un-merged segment graph
        # (reference model.py:736-738)
        sem_l1, ins_l1 = self._export_labels(g, roots_l1, pt_valid, s)

        # --- structural grouping layer (model.py:745-770)
        clouds, act1 = cluster_pointclouds(
            pts, roots_l1, s, p_out=self.mlp1_points, cap=self.cluster_cap
        )
        feat1 = self.mlp_1(clouds, act1, train)  # (S, 128)
        d1 = gr.edge_distances(feat1, g, edges)
        th1 = self.th_structural_sem_infer if mode == "sem_infer" else self.th_structural
        g, _ = self._group(g, edges, ev, jax.lax.stop_gradient(d1), th1)
        edges, ev = gr.normalize_edges(g, edges, ev)
        feat2 = gr.aggregate_cluster_feature(feat1, g, act1)  # (S, 128)
        roots_l2 = jnp.where(pt_valid, g.root[jnp.minimum(scene.point2seg, s - 1)], s)

        sem_l2, ins_l2 = self._export_labels(g, roots_l2, pt_valid, s)
        cl2 = jnp.max(segment_sum(pt_valid.astype(jnp.int32),
                                  jnp.where(pt_valid, roots_l2, s), s))

        if mode == "sem_infer":
            iou_sem, iou_ins, acc = evaluate_labels(
                sem_l2, ins_l2, scene.real_sem, scene.real_ins, pt_valid
            )
            zero = jnp.zeros(())
            return Stage1Output(
                zero, zero, iou_sem, iou_ins, acc,
                jnp.stack([roots_l1, roots_l2, roots_l2, roots_l2]),
                roots_l2, sem_l2, ins_l2, sem_l2, ins_l2, max_seg, cl2,
                jnp.stack([sem_l1, sem_l2, sem_l2, sem_l2]),
                jnp.stack([ins_l1, ins_l2, ins_l2, ins_l2]),
            )

        # --- semantic grouping layer 1 (model.py:786-824)
        feat2, g, edges, ev, act2 = self._semantic_layer(
            self.mlp_2, self.gcn_2, feat2, g, edges, ev, pts, roots_l2,
            pt_valid, train,
        )
        roots_l3 = jnp.where(pt_valid, g.root[jnp.minimum(scene.point2seg, s - 1)], s)
        sem_l3, ins_l3 = self._export_labels(g, roots_l3, pt_valid, s)
        cl3 = jnp.max(segment_sum(pt_valid.astype(jnp.int32),
                                  jnp.where(pt_valid, roots_l3, s), s))
        max_cluster = jnp.maximum(cl2, cl3)
        feat3 = gr.aggregate_cluster_feature(feat2, g, act2)

        # --- semantic grouping layer 2 (model.py:827-856)
        feat3, g, edges, ev, act3 = self._semantic_layer(
            self.mlp_3, self.gcn_3, feat3, g, edges, ev, pts, roots_l3,
            pt_valid, train,
        )
        roots_l4 = jnp.where(pt_valid, g.root[jnp.minimum(scene.point2seg, s - 1)], s)
        sem_l4, ins_l4 = self._export_labels(g, roots_l4, pt_valid, s)
        feat4 = gr.aggregate_cluster_feature(feat3, g, act3)

        # --- final clustering: absorb unlabeled (model.py:868-891)
        act4 = gr.active_mask(g)
        g, _, edges, ev = gr.group_unlabeled_clusters(
            g, feat4, edges, ev, pts[:, :3], scene.point2seg
        )
        # differentiable re-aggregation over the final grouping (max is
        # associative, so this equals the loop's incremental aggregation)
        feat5 = gr.aggregate_cluster_feature(feat4, g, act4)
        final_root = jnp.where(pt_valid, g.root[jnp.minimum(scene.point2seg, s - 1)], s)
        final_sem, final_ins = self._export_labels(g, final_root, pt_valid, s)

        iou_sem, iou_ins, acc = evaluate_labels(
            final_sem, final_ins, scene.real_sem, scene.real_ins, pt_valid
        )

        layer_roots = jnp.stack([roots_l1, roots_l2, roots_l3, roots_l4])
        layer_sem = jnp.stack([sem_l1, sem_l2, sem_l3, sem_l4])
        layer_ins = jnp.stack([ins_l1, ins_l2, ins_l3, ins_l4])

        if mode == "ins_infer":
            zero = jnp.zeros(())
            return Stage1Output(
                zero, zero, iou_sem, iou_ins, acc, layer_roots,
                final_root, final_sem, final_ins, sem_l2, ins_l2,
                max_seg, max_cluster, layer_sem, layer_ins,
            )

        # --- classifier over per-instance max-pooled features (model.py:900-929)
        act5 = gr.active_mask(g)
        i_max = self.max_instances
        ins_ids = jnp.where(act5, g.ins_label, -1)
        ins_ids = jnp.where((ins_ids >= 0) & (ins_ids < i_max), ins_ids, i_max)
        feat6 = segment_max(feat5, ins_ids, i_max)  # (I, 256)
        sem_gt = segment_max(jnp.where(act5, g.sem_label, -1), ins_ids, i_max,
                             fill_value=jnp.int32(-1))
        ins_present = segment_sum(act5.astype(jnp.int32), ins_ids, i_max) > 0
        inst_valid = ins_present & (sem_gt >= 0)
        logits = self.classifier(feat6, inst_valid, train)
        loss_sum = smoothed_cross_entropy(logits, jnp.maximum(sem_gt, 0), inst_valid)
        loss_count = jnp.sum(inst_valid.astype(jnp.float32))

        return Stage1Output(
            loss_sum, loss_count, iou_sem, iou_ins, acc, layer_roots,
            final_root, final_sem, final_ins, sem_l2, ins_l2,
            max_seg, max_cluster, layer_sem, layer_ins,
        )

    def _semantic_layer(self, mlp, gcn, feat_in, g, edges, ev, pts, roots,
                        pt_valid, train):
        s = g.num_slots
        knn_idx = cluster_knn(
            pts[:, :3], jnp.where(pt_valid, roots, jnp.int32(0x3FFFFFFF)),
            k=self.knn_k, window=self.knn_window, approx=self.fast_knn,
            valid=pt_valid, small_window=self.knn_small_window,
        )
        center = segment_mean(pts[:, :3], roots, s)  # (S, 3)
        centered = pts[:, :3] - center[jnp.minimum(roots, s - 1)]
        data9 = jnp.concatenate([pts, centered], axis=-1)  # (N, 9)
        point_feat = self._point_edge_conv(mlp, data9, knn_idx, pt_valid,
                                           train)  # (N, 64)
        pooled = segment_max(point_feat, jnp.where(pt_valid, roots, s), s)  # (S, 64)
        feat = jnp.concatenate([feat_in, pooled], axis=-1)

        sims = gr.edge_similarities(feat, g, edges, alpha=self.gcn_alpha)
        sim_m = gr.build_similarity_matrix(sims, edges, ev, s)
        feat = gcn(feat, sim_m)

        d = gr.edge_distances(feat, g, edges)
        act_before = gr.active_mask(g)
        g, _ = self._group(g, edges, ev, jax.lax.stop_gradient(d), self.th_semantic)
        edges, ev = gr.normalize_edges(g, edges, ev)
        return feat, g, edges, ev, act_before

    def _point_edge_conv(self, mlp, data9, knn_idx, pt_valid, train):
        """Run the per-point edge conv; with shard_axis set, each device
        computes its own N/D slab (indices are global, gathers read the
        replicated data9) and the slabs are all-gathered back. The fat
        (N/D, k, 2C) intermediates are the only sharded tensors, so peak
        per-device memory for the dominant term drops by shard_count."""
        if self.shard_axis is None:
            return mlp(data9, knn_idx, pt_valid, train)
        n = data9.shape[0]
        assert n % self.shard_count == 0, (n, self.shard_count)
        nl = n // self.shard_count
        i0 = jax.lax.axis_index(self.shard_axis) * nl
        d9_l = jax.lax.dynamic_slice_in_dim(data9, i0, nl, 0)
        idx_l = jax.lax.dynamic_slice_in_dim(knn_idx, i0, nl, 0)
        v_l = jax.lax.dynamic_slice_in_dim(pt_valid, i0, nl, 0)
        pf_l = mlp(d9_l, idx_l, v_l, train, src=data9)  # (N/D, 64)
        return jax.lax.all_gather(pf_l, self.shard_axis, axis=0, tiled=True)

    def _group(self, g, edges, ev, dists, th):
        fn = (gr.group_nearby_clusters_sequential if self.sequential
              else gr.group_nearby_clusters)
        return fn(g, edges, ev, dists, th)

    @staticmethod
    def _export_labels(g, roots, pt_valid, s):
        """Per-point exported labels: label+1 if labeled else -1 (reference
        export_{semantic,instance}_label, model.py:552-605)."""
        r = jnp.minimum(roots, s - 1)
        sem = g.sem_label[r]
        ins = g.ins_label[r]
        sem = jnp.where(pt_valid & (sem != -1), sem + 1, -1)
        ins = jnp.where(pt_valid & (ins != -1), ins + 1, -1)
        return sem.astype(jnp.int32), ins.astype(jnp.int32)


def evaluate_labels(
    sem_pred: jax.Array,
    ins_pred: jax.Array,
    sem_true: jax.Array,
    ins_true: jax.Array,
    pt_valid: jax.Array,
    max_instances: int = 256,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Per-scene I/U accumulators + accuracies (reference evaluate,
    model.py:608-655), restricted to annotated points (sem_true != 0)."""
    valid = pt_valid & (sem_true != 0)
    fv = valid.astype(jnp.float32)

    cls = jnp.arange(1, NUM_CLASSES + 1)
    sp = sem_pred[:, None] == cls[None, :]
    st = sem_true[:, None] == cls[None, :]
    i_sem = jnp.sum((sp & st) & valid[:, None], axis=0).astype(jnp.float32)
    u_sem = jnp.sum((sp | st) & valid[:, None], axis=0).astype(jnp.float32)
    iou_sem = jnp.stack([i_sem, u_sem])

    # instance I/U binned by the semantic class of each predicted instance
    # (pred instance ids match GT numbering by construction of weak labels)
    i_ins = jnp.zeros(NUM_CLASSES)
    u_ins = jnp.zeros(NUM_CLASSES)
    ins_ids = jnp.arange(1, max_instances + 1)

    def body(carry, ins):
        i_acc, u_acc = carry
        pred_mask = (ins_pred == ins) & valid
        true_mask = (ins_true == ins) & valid
        present = jnp.any(pred_mask)
        # semantic class of this predicted instance = sem_pred at its first point
        first = jnp.argmax(pred_mask)
        sem = sem_pred[first]
        cls_idx = jnp.clip(sem - 1, 0, NUM_CLASSES - 1)
        inter = jnp.sum((pred_mask & true_mask).astype(jnp.float32))
        union = jnp.sum((pred_mask | true_mask).astype(jnp.float32))
        i_acc = i_acc.at[cls_idx].add(jnp.where(present, inter, 0.0))
        u_acc = u_acc.at[cls_idx].add(jnp.where(present, union, 0.0))
        return (i_acc, u_acc), None

    (i_ins, u_ins), _ = jax.lax.scan(body, (i_ins, u_ins), ins_ids)
    iou_ins = jnp.stack([i_ins, u_ins])

    denom = jnp.maximum(jnp.sum(fv), 1.0)
    acc_sem = jnp.sum((sem_pred == sem_true) & valid) / denom
    acc_ins = jnp.sum((ins_pred == ins_true) & valid) / denom

    sem_sel = valid & jnp.isin(sem_true, jnp.array(SEM_VALID_CLASS_IDS))
    ins_sel = valid & jnp.isin(ins_true, jnp.array(INS_VALID_CLASS_IDS))
    acc_sem_sel = jnp.sum((sem_pred == sem_true) & sem_sel) / jnp.maximum(
        jnp.sum(sem_sel.astype(jnp.float32)), 1.0
    )
    acc_ins_sel = jnp.sum((ins_pred == ins_true) & ins_sel) / jnp.maximum(
        jnp.sum(ins_sel.astype(jnp.float32)), 1.0
    )
    acc = jnp.stack([acc_sem, acc_ins, acc_sem_sel, acc_ins_sel])
    return iou_sem, iou_ins, acc
