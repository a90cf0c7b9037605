"""PointGroup instance segmentation, TPU-native.

Reimplements the reference PointGroup (reference pointgroup/model/pointgroup/
pointgroup.py:19-521) on the shared sparse engine:

  * the 7-level spconv U-Net ([m..7m], pre-activation ResidualBlocks,
    kernel-2/stride-2 down, inverse up with indice_key reuse,
    pointgroup.py:64-157) maps 1:1 onto sparse/conv.py primitives;
  * dual clustering on original and offset-shifted coords (pointgroup.py:
    282-308) runs fully on device: ball query (grid hash) + semantic-
    constrained connected components instead of the reference's
    GPU->CPU->GPU ballquery/bfs_cluster round-trip;
  * proposal re-voxelization + ScoreNet (clusters_voxelization,
    pointgroup.py:205-253: center by proposal mean, fit to a fullscale^3
    grid at up to score_scale, random jitter) is a batched masked transform
    over a fixed 2N membership table (each point belongs to at most one
    proposal per clustering source);
  * losses (pointgroup.py:438-513): CE semantics (ignore -100), offset L1 +
    cosine direction, BCE score against IoU-binned soft targets
    (fg .75 / bg .25).

Config defaults follow pointgroup_run2_scannet.yaml (radius .03, npoint
threshold 50, score_scale 50, score_fullscale 14, loss weights 1/1/1/1).
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from seggroup_tpu.ops.cc import compact_labels
from seggroup_tpu.ops.iou import proposal_instance_iou
from seggroup_tpu.ops.pallas_cc import semantic_radius_cc
from seggroup_tpu.ops.segment_ops import segment_max, segment_mean, segment_min
from seggroup_tpu.ops.voxelize import voxelize
from seggroup_tpu.sparse.conv import (
    build_subm_rulebook,
    inverse_conv_up,
    strided_conv_down,
    strided_conv_down_planned,
)
from seggroup_tpu.sparse.tensor import SparseTensor
from seggroup_tpu.models.minkunet import SparseBatchNorm, SubMConv

IGNORE = -100


class ResidualBlock(nn.Module):
    """Pre-activation residual block (reference pointgroup.py:19-47):
    bn-relu-conv3-bn-relu-conv3 + (identity | 1x1)."""

    out_channels: int

    @nn.compact
    def __call__(self, st: SparseTensor, rulebook, train: bool,
                 windows: dict | None = None) -> SparseTensor:
        h = SparseBatchNorm(0.1, 1e-4, name="bn1")(st.feats, st.valid, train)
        h = nn.relu(h)
        pre = st.with_feats(h)
        if st.channels == self.out_channels:
            identity = st.feats
        else:
            identity = SubMConv(self.out_channels, 1, name="i_branch")(
                pre, jnp.arange(st.capacity, dtype=jnp.int32)[:, None]
            )
        h = SubMConv(self.out_channels, name="conv1")(pre, rulebook, windows)
        h = SparseBatchNorm(0.1, 1e-4, name="bn2")(h, st.valid, train)
        h = nn.relu(h)
        h = SubMConv(self.out_channels, name="conv2")(st.with_feats(h),
                                                      rulebook, windows)
        return st.with_feats(h + identity)


class UBlock(nn.Module):
    """Recursive U-Net (reference pointgroup.py:64-110).

    key_xy_bits: rulebook key packing widths (sparse/hashing.pack_keys).
    The ScoreNet instantiation narrows them to (5, 5): its "batch" column is
    a proposal id < 512, which overflows the default 3 batch bits and
    silently aliases rulebook rows across proposals (period 16)."""

    n_planes: Sequence[int]
    block_reps: int = 2
    level_caps: Sequence[int] | None = None
    key_xy_bits: tuple = (14, 14)

    @nn.compact
    def __call__(self, st: SparseTensor, train: bool,
                 plan: dict | None = None) -> SparseTensor:
        """`plan` (optional): host-built pyramid plan for this subtree
        (sparse/plan.py build_unet_plan with len(n_planes) level caps) —
        skips every on-device rulebook/downsample build. The recursion
        passes the tail of each plan list to the inner UBlock."""
        planes = list(self.n_planes)
        caps = list(self.level_caps or [st.capacity >> i for i in range(len(planes))])
        if plan is not None:
            rb = plan["rulebooks"][0]
            win = plan["windows"][0] if "windows" in plan else None
        else:
            rb = build_subm_rulebook(st, 3, xy_bits=self.key_xy_bits)
            win = None
        for i in range(self.block_reps):
            st = ResidualBlock(planes[0], name=f"block{i}")(st, rb, train, win)

        if len(planes) > 1:
            h = SparseBatchNorm(0.1, 1e-4, name="conv_bn")(st.feats, st.valid, train)
            h = nn.relu(h)
            w = self.param(
                "conv_kernel",
                nn.initializers.variance_scaling(1.0, "fan_in", "truncated_normal"),
                (8, planes[0], planes[1]),
            )
            if plan is not None:
                st_dn, key = strided_conv_down_planned(st.with_feats(h), w,
                                                       plan["down"][0])
                sub_plan = {k: v[1:] for k, v in plan.items()}
            else:
                st_dn, key = strided_conv_down(st.with_feats(h), w, caps[1])
                sub_plan = None
            st_dn = UBlock(planes[1:], self.block_reps, caps[1:],
                           self.key_xy_bits, name="u")(
                st_dn, train, sub_plan
            )
            h = SparseBatchNorm(0.1, 1e-4, name="deconv_bn")(
                st_dn.feats, st_dn.valid, train
            )
            st_dn = st_dn.with_feats(nn.relu(h))
            wu = self.param(
                "deconv_kernel",
                nn.initializers.variance_scaling(1.0, "fan_in", "truncated_normal"),
                (8, planes[1], planes[0]),
            )
            st_up = inverse_conv_up(st_dn, wu, key)
            cat = jnp.concatenate([st.feats, st_up.feats], axis=-1)
            st = st.with_feats(cat)
            rb_t = rb
            for i in range(self.block_reps):
                st = ResidualBlock(planes[0], name=f"tail{i}")(st, rb_t, train,
                                                               win)
        return st


class PGOutput(NamedTuple):
    semantic_scores: jax.Array   # (N, classes)
    pt_offsets: jax.Array        # (N, 3)
    scores: jax.Array            # (P,) proposal scores (pre-sigmoid)
    proposal_of_point: jax.Array  # (2, N) proposal id per clustering source, == P if none
    proposal_valid: jax.Array    # (P,)
    num_proposals: jax.Array     # scalar


class PointGroup(nn.Module):
    """Full model. `do_clustering` mirrors `epoch > prepare_epochs`
    (reference pointgroup.py:282)."""

    classes: int = 20
    m: int = 16
    block_reps: int = 2
    use_coords: bool = True
    cluster_radius: float = 0.03
    cluster_npoint_thre: int = 50
    cluster_neighbors: int = 32
    score_scale: float = 50.0
    score_fullscale: float = 14.0
    max_proposals_per_source: int = 128
    score_cap: int = 8192
    level_caps: Sequence[int] | None = None
    # Perf-probe knobs (bisect the train-step backward; not training config):
    score_stop_gradient: bool = False  # detach point_feats into the score branch
    skip_score_unet: bool = False      # bypass the ScoreNet UBlock

    @nn.compact
    def __call__(
        self,
        voxels: SparseTensor,
        p2v: jax.Array,          # (N,) point -> voxel row
        coords: jax.Array,       # (N, 3) float metric coords
        batch_ids: jax.Array,    # (N,)
        point_valid: jax.Array,  # (N,)
        do_clustering: bool = False,
        train: bool = True,
        jitter_rng: jax.Array | None = None,
        plan: dict | None = None,
        proposals_only: bool = False,
        score_plan: tuple | None = None,
    ):
        """`plan` (optional): 7-level host plan (sparse/plan.py
        build_unet_plan over the main UNet's voxel coords). The ScoreNet's
        small UBlock always builds on device — its voxelization depends on
        the predicted proposals, which the host cannot know ahead.

        Split-program mode (big-scene compile relief — the fused train step
        at pts=2^19/vox=2^18 lowers to ~5 MB StableHLO and OOMs the XLA:TPU
        compiler): gradients never flow through the discrete cluster
        assignment (the reference's BFS runs detached on CPU,
        pointgroup.py:293-301), so the step splits exactly into
          A) `proposals_only=True`: forward + dual clustering + proposal
             re-voxelization GEOMETRY; returns (PGOutput-with-zero-scores,
             score_vox VoxelMap). No gradients taken through this program.
          B) `score_plan=(proposal_of_point, proposal_valid, num_proposals,
             score_vox)`: same forward, but clustering + score-voxelization
             geometry replaced by the injected plan; runs the ScoreNet and
             returns the full PGOutput. Differentiate THIS program.
        Both programs see identical params/stats, so A's proposals equal the
        ones B's fused equivalent would compute; grads are bit-identical to
        the fused step (indices are stop-gradient there too)."""
        m = self.m
        planes = [m, 2 * m, 3 * m, 4 * m, 5 * m, 6 * m, 7 * m]

        if plan is not None:
            rb0 = plan["rulebooks"][0]
            win0 = plan["windows"][0] if "windows" in plan else None
        else:
            rb0 = build_subm_rulebook(voxels, 3)
            win0 = None
        h = SubMConv(m, name="input_conv")(voxels, rb0, win0)
        st = voxels.with_feats(h)
        st = UBlock(planes, self.block_reps, self.level_caps, name="unet")(
            st, train, plan)
        h = SparseBatchNorm(0.1, 1e-4, name="output_bn")(st.feats, st.valid, train)
        h = nn.relu(h)

        # voxel -> point
        cap = st.capacity
        feats_pad = jnp.concatenate([h, jnp.zeros((1, h.shape[1]))])
        point_feats = feats_pad[jnp.minimum(p2v, cap)]
        point_feats = jnp.where(point_valid[:, None], point_feats, 0.0)

        semantic_scores = nn.Dense(self.classes, name="linear")(point_feats)
        off = nn.Dense(m, name="offset_dense")(point_feats)
        off = SparseBatchNorm(0.1, 1e-4, name="offset_bn")(off, point_valid, train)
        off = nn.relu(off)
        pt_offsets = nn.Dense(3, name="offset_linear")(off)
        pt_offsets = jnp.where(point_valid[:, None], pt_offsets, 0.0)

        n = coords.shape[0]
        p_src = self.max_proposals_per_source
        p_total = 2 * p_src
        if not do_clustering:
            zero = jnp.zeros((p_total,))
            return PGOutput(
                semantic_scores, pt_offsets, zero,
                jnp.full((2, n), p_total, jnp.int32),
                jnp.zeros((p_total,), bool), jnp.int32(0),
            )

        if score_plan is not None:
            proposal_of_point, proposal_valid, num_proposals, score_ctx = \
                score_plan
            prop_a, prop_b = proposal_of_point[0], proposal_of_point[1]
            return self._score_branch(
                point_feats, semantic_scores, pt_offsets, coords, prop_a,
                prop_b, proposal_of_point, proposal_valid, num_proposals,
                score_ctx["vox"], train, score_ctx.get("unet_plan"))

        sem_pred = jnp.argmax(semantic_scores, axis=-1).astype(jnp.int32)
        # exclude wall/floor (classes 0, 1; reference pointgroup.py:285)
        obj = point_valid & (sem_pred > 1)

        def to_proposals(lab):
            compact, num, sizes = compact_labels(lab, obj, p_src)
            keep = sizes >= self.cluster_npoint_thre  # (P,)
            prop = jnp.where(
                (compact < p_src) & keep[jnp.minimum(compact, p_src - 1)],
                compact, p_src,
            )
            pvalid = keep & (jnp.arange(p_src) < num)
            return prop.astype(jnp.int32), pvalid

        # fused windowed ball-query + CC (ops/pallas_cc.py; the reference's
        # ballquery + CPU BFS pair, bfs_cluster.cu:14-90 +
        # bfs_cluster.cpp:27-112, with no neighbor cap at all). BOTH
        # clusterings (original + offset-shifted coords, reference
        # pointgroup.py:292-302) run as ONE CC over a doubled point set with
        # disambiguated batch ids — components cannot span the halves, so
        # the partition is identical to two separate runs at half the
        # sweep cost.
        pts2 = jax.lax.stop_gradient(
            jnp.concatenate([coords, coords + pt_offsets]))
        lab2 = semantic_radius_cc(
            pts2, self.cluster_radius,
            jnp.concatenate([batch_ids * 2, batch_ids * 2 + 1]),
            jnp.concatenate([obj, obj]),
            jnp.concatenate([sem_pred, sem_pred]),
            max_neighbors_fallback=self.cluster_neighbors,
            fused_halves=True,
        )
        # per-half labels: a first-half component's min combined index is its
        # min index; a second-half one's is (min index + n)
        prop_o, pv_o = to_proposals(lab2[:n])
        prop_s, pv_s = to_proposals(
            jnp.where(lab2[n:] < 2 * n, lab2[n:] - n, n))
        # combined id space: originals [0, P), shifted [P, 2P)
        prop_a = jnp.where(prop_o < p_src, prop_o, p_total)
        prop_b = jnp.where(prop_s < p_src, prop_s + p_src, p_total)
        proposal_of_point = jnp.stack([prop_a, prop_b])
        proposal_valid = jnp.concatenate([pv_o, pv_s])
        num_proposals = jnp.sum(proposal_valid.astype(jnp.int32))

        # ---- proposal re-voxelization (reference clusters_voxelization) ----
        flat_prop = jnp.concatenate([prop_a, prop_b])  # (2N,)
        flat_pt = jnp.tile(jnp.arange(n, dtype=jnp.int32), 2)
        fv = flat_prop < p_total
        fc = coords[flat_pt]
        mean = segment_mean(fc, jnp.where(fv, flat_prop, -1), p_total,
                            method="sorted")
        centered = fc - mean[jnp.minimum(flat_prop, p_total - 1)]
        cmin = segment_min(centered, jnp.where(fv, flat_prop, -1), p_total,
                           fill_value=jnp.float32(0), method="sorted")
        cmax = segment_max(centered, jnp.where(fv, flat_prop, -1), p_total,
                           fill_value=jnp.float32(0), method="sorted")
        fullscale = self.score_fullscale
        pscale = 1.0 / jnp.maximum(
            jnp.max(cmax - cmin, axis=1) / fullscale, 1e-6
        ) - 0.01
        pscale = jnp.minimum(pscale, self.score_scale)  # (P,)
        min_xyz = cmin * pscale[:, None]
        max_xyz = cmax * pscale[:, None]
        rng = jnp.zeros((3,)) if jitter_rng is None else jax.random.uniform(
            jitter_rng, (3,)
        )
        room = jnp.clip(fullscale - (max_xyz - min_xyz) - 0.001, 0, None)
        offset = -min_xyz + room * rng[None, :]
        scaled = centered * pscale[jnp.minimum(flat_prop, p_total - 1)][:, None]
        scaled = scaled + offset[jnp.minimum(flat_prop, p_total - 1)]
        icoords = jnp.clip(scaled, 0, fullscale - 1e-3).astype(jnp.int32)

        vmap_s = voxelize(icoords, jnp.where(fv, flat_prop, p_total),
                          fv, self.score_cap)
        if proposals_only:
            # the ScoreNet's rulebooks/down-maps are functions of the (now
            # known) proposal voxelization only — build them here so the grad
            # program carries no sort at all (see class docstring)
            from seggroup_tpu.sparse.device_plan import build_unet_plan_device

            score_ctx = {
                "vox": vmap_s,
                "unet_plan": build_unet_plan_device(
                    vmap_s.voxel_coords, vmap_s.num_voxels,
                    (self.score_cap, self.score_cap // 2),
                    with_windows=False, xy_bits=(5, 5)),
            }
            return PGOutput(
                semantic_scores, pt_offsets, jnp.zeros((p_total,)),
                proposal_of_point, proposal_valid, num_proposals), score_ctx
        return self._score_branch(
            point_feats, semantic_scores, pt_offsets, coords, prop_a, prop_b,
            proposal_of_point, proposal_valid, num_proposals, vmap_s, train,
            None)

    def _score_branch(self, point_feats, semantic_scores, pt_offsets, coords,
                      prop_a, prop_b, proposal_of_point, proposal_valid,
                      num_proposals, vmap_s, train,
                      score_unet_plan=None) -> PGOutput:
        """ScoreNet over the (given) proposal voxelization. Submodules are
        created here from the compact __call__ frame — same names either
        path, so the param tree is identical fused vs split."""
        m = self.m
        n = coords.shape[0]
        p_total = 2 * self.max_proposals_per_source
        flat_prop = jnp.concatenate([prop_a, prop_b])  # (2N,)
        flat_pt = jnp.tile(jnp.arange(n, dtype=jnp.int32), 2)
        fv = flat_prop < p_total
        pf_s = (jax.lax.stop_gradient(point_feats)
                if self.score_stop_gradient else point_feats)
        flat_feats = pf_s[flat_pt]
        sv_feats = segment_mean(
            jnp.where(fv[:, None], flat_feats, 0.0), vmap_s.point2voxel,
            self.score_cap, method="sorted",
        )
        st_score = SparseTensor(vmap_s.voxel_coords, sv_feats,
                                vmap_s.voxel_valid, vmap_s.num_voxels)
        if not self.skip_score_unet:
            st_score = UBlock([m, 2 * m], 2,
                              [self.score_cap, self.score_cap // 2],
                              key_xy_bits=(5, 5),
                              name="score_unet")(st_score, train,
                                                 score_unet_plan)
        hs = SparseBatchNorm(0.1, 1e-4, name="score_bn")(
            st_score.feats, st_score.valid, train
        )
        hs = nn.relu(hs)
        # voxel -> flat entries -> per-proposal max (roipool, reference
        # roipool.cu:12-31)
        hs_pad = jnp.concatenate([hs, jnp.zeros((1, hs.shape[1]))])
        flat_score_feats = hs_pad[jnp.minimum(vmap_s.point2voxel, self.score_cap)]
        prop_feats = segment_max(
            jnp.where(fv[:, None], flat_score_feats, 0.0),
            jnp.where(fv, flat_prop, -1), p_total, method="sorted",
        )
        scores = nn.Dense(1, name="score_linear")(prop_feats)[:, 0]
        return PGOutput(semantic_scores, pt_offsets, scores,
                        proposal_of_point, proposal_valid, num_proposals)


# ---------------------------------------------------------------------------
# losses (reference pointgroup.py:438-513)
# ---------------------------------------------------------------------------


def pg_score_targets(
    proposal_of_point: jax.Array,  # (2, N); ids == p_total mark "none"
    p_total: int,
    instance_labels: jax.Array,    # (N,) 0..I-1, IGNORE
    point_valid: jax.Array,
    instance_pointnum: jax.Array,  # (I,)
    num_instances_cap: int,
    fg_thresh: float = 0.75,
    bg_thresh: float = 0.25,
) -> jax.Array:
    """(P,) IoU-binned soft score targets (reference get_segmented_scores,
    pointgroup.py:499-513). Pure data — no parameter dependence — so the
    split-program trainer computes this in program A and injects it into the
    grad program via pointgroup_loss(gt_scores=...)."""
    n = instance_labels.shape[0]
    flat_prop = jnp.concatenate([proposal_of_point[0], proposal_of_point[1]])
    flat_pt = jnp.tile(jnp.arange(n, dtype=jnp.int32), 2)
    flat_inst = instance_labels[flat_pt]
    flat_ok = (flat_prop < p_total) & point_valid[flat_pt]
    ious = proposal_instance_iou(
        flat_prop, jnp.where(flat_inst == IGNORE, -1, flat_inst), flat_ok,
        p_total, num_instances_cap, instance_sizes=instance_pointnum,
    )
    gt_ious = jnp.max(ious, axis=1)  # (P,)
    k = 1.0 / (fg_thresh - bg_thresh)
    b = bg_thresh / (bg_thresh - fg_thresh)
    return jnp.clip(gt_ious * k + b, 0.0, 1.0)


def pointgroup_loss(
    out: PGOutput,
    labels: jax.Array,            # (N,) 0..classes-1, IGNORE
    instance_labels: jax.Array,   # (N,) 0..I-1, IGNORE
    instance_centroids: jax.Array,  # (N, 3) per-point GT instance mean xyz
    instance_pointnum: jax.Array,   # (I,)
    coords: jax.Array,
    point_valid: jax.Array,
    num_instances_cap: int,
    with_score: bool,
    fg_thresh: float = 0.75,
    bg_thresh: float = 0.25,
    loss_weight=(1.0, 1.0, 1.0, 1.0),
    gt_scores: jax.Array | None = None,
):
    classes = out.semantic_scores.shape[-1]
    ok = point_valid & (labels != IGNORE)
    lp = jax.nn.log_softmax(out.semantic_scores, axis=-1)
    nll = -jnp.take_along_axis(lp, jnp.clip(labels, 0, classes - 1)[:, None], 1)[:, 0]
    semantic_loss = jnp.sum(jnp.where(ok, nll, 0.0)) / jnp.maximum(jnp.sum(ok), 1)

    iv = point_valid & (instance_labels != IGNORE)
    gt_off = instance_centroids - coords
    diff = out.pt_offsets - gt_off
    l1 = jnp.sum(jnp.abs(diff), axis=-1)
    fiv = iv.astype(jnp.float32)
    offset_norm_loss = jnp.sum(l1 * fiv) / (jnp.sum(fiv) + 1e-6)
    def safe_norm(x):
        # sqrt at exactly 0 has a NaN gradient; masked (all-zero) rows would
        # poison the backward pass through nan * 0
        return jnp.sqrt(jnp.sum(x * x, axis=1, keepdims=True) + 1e-12)

    gt_n = gt_off / (safe_norm(gt_off) + 1e-8)
    pt_n = out.pt_offsets / (safe_norm(out.pt_offsets) + 1e-8)
    offset_dir_loss = jnp.sum(-jnp.sum(gt_n * pt_n, -1) * fiv) / (jnp.sum(fiv) + 1e-6)

    total = (loss_weight[0] * semantic_loss + loss_weight[1] * offset_norm_loss
             + loss_weight[2] * offset_dir_loss)
    aux = {"semantic_loss": semantic_loss, "offset_norm_loss": offset_norm_loss,
           "offset_dir_loss": offset_dir_loss}

    if with_score:
        if gt_scores is None:
            gt_scores = pg_score_targets(
                out.proposal_of_point, out.proposal_valid.shape[0],
                instance_labels, point_valid, instance_pointnum,
                num_instances_cap, fg_thresh, bg_thresh)
        pred = jax.nn.sigmoid(out.scores)
        bce = -(gt_scores * jnp.log(pred + 1e-12)
                + (1 - gt_scores) * jnp.log(1 - pred + 1e-12))
        score_loss = jnp.sum(
            jnp.where(out.proposal_valid, bce, 0.0)
        ) / jnp.maximum(jnp.sum(out.proposal_valid), 1)
        total = total + loss_weight[3] * score_loss
        aux["score_loss"] = score_loss
    return total, aux
