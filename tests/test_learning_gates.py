"""Learning-quality gates: every backbone + stage-1 must actually LEARN.

The reference's only correctness oracle is "training reaches the README
numbers" (pointgroup/README.md:71-74, kpconv/README.md:47-50,
minkowski/README_zh.md:56) — unreproducible here without ScanNet. These
gates substitute: each overfits a tiny FIXED synthetic set for a bounded
number of steps and asserts a metric bar, so a loss-weight sign flip, a
BN-stats bug, or a dead gradient path fails CI instead of shipping
(VERDICT r3 item 3).

Bars are set ~2x above the chance level and well below the measured
overfit level, so they are robust to seed jitter while still requiring
genuine learning.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

pytestmark = pytest.mark.slow  # real training loops; minutes of XLA-CPU


def _sgd_loop(train_step, params, stats, opt_state, steps, *batch):
    first = last = None
    for i in range(steps):
        params, stats, opt_state, loss = train_step(params, stats,
                                                    opt_state, *batch)
        if i == 0:
            first = float(loss)
    last = float(loss)
    return params, stats, first, last


# ---------------------------------------------------------------------------
# MinkUNet: voxel semantic segmentation, labels recoverable from input feats
# ---------------------------------------------------------------------------


def test_minkunet_overfits_tiny_scene():
    from seggroup_tpu.models.minkunet import make_minkunet
    from seggroup_tpu.sparse.tensor import SparseTensor

    rng = np.random.default_rng(0)
    m_cap, n, classes = 512, 400, 6
    rows = rng.choice(24 ** 3, size=n, replace=False)
    coords = np.zeros((m_cap, 4), np.int32)
    coords[:n, 1] = rows // (24 * 24)
    coords[:n, 2] = (rows // 24) % 24
    coords[:n, 3] = rows % 24
    labels = np.zeros(m_cap, np.int32)
    labels[:n] = rng.integers(0, classes, n)
    # feats carry the label signal through noise — learnable, not trivial:
    # 6 classes encoded as +/- one-hot over 3 channels
    code = np.concatenate([np.eye(3), -np.eye(3)]).astype(np.float32)
    feats = np.zeros((m_cap, 3), np.float32)
    feats[:n] = code[labels[:n]] + rng.normal(0, 0.25, (n, 3))
    valid = np.zeros(m_cap, bool)
    valid[:n] = True
    st = SparseTensor(jnp.asarray(coords), jnp.asarray(feats),
                      jnp.asarray(valid), jnp.int32(n))
    jlabels = jnp.asarray(labels)

    model = make_minkunet("Res16UNet14A", out_channels=classes,
                          level_caps=[m_cap, m_cap, 256, 128, 128])
    variables = model.init(jax.random.PRNGKey(0), st, train=True)
    params, stats = variables["params"], variables["batch_stats"]
    opt = optax.adam(3e-3)
    opt_state = opt.init(params)

    @jax.jit
    def train_step(params, stats, opt_state, st, labels):
        def loss_fn(p):
            logits, mut = model.apply({"params": p, "batch_stats": stats},
                                      st, train=True,
                                      mutable=["batch_stats"])
            lp = jax.nn.log_softmax(logits, -1)
            nll = -jnp.take_along_axis(lp, labels[:, None], 1)[:, 0]
            ce = jnp.sum(jnp.where(st.valid, nll, 0.0)) / jnp.maximum(
                jnp.sum(st.valid), 1)
            return ce, mut["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return (optax.apply_updates(params, updates), new_stats, opt_state,
                loss)

    params, stats, first, last = _sgd_loop(train_step, params, stats,
                                           opt_state, 60, st, jlabels)
    assert last < first, f"loss did not decrease: {first} -> {last}"

    logits = model.apply({"params": params, "batch_stats": stats}, st,
                         train=False)
    pred = np.asarray(logits).argmax(1)
    acc = (pred[:n] == labels[:n]).mean()
    assert acc >= 0.9, f"voxel acc {acc:.3f} < 0.9 after overfit (chance 1/6)"


# ---------------------------------------------------------------------------
# KPConv: point semantic segmentation on blob scenes, label from color
# ---------------------------------------------------------------------------


def test_kpfcnn_overfits_tiny_scene():
    from seggroup_tpu.models.kpconv import KPFCNN, build_pyramid

    arch = ("simple", "resnetb", "resnetb_strided", "resnetb",
            "resnetb_strided", "resnetb",
            "nearest_upsample", "unary", "nearest_upsample", "unary")
    rng = np.random.default_rng(0)
    n, classes = 1024, 4
    blobs = rng.uniform(0, 2, (8, 3)).astype(np.float32)
    which = np.arange(n) % 8
    pts = (blobs[which] + rng.normal(0, 0.08, (n, 3))).astype(np.float32)
    labels = (which % classes).astype(np.int32)
    feats = np.ones((n, 4), np.float32)
    feats[:, 1:] = (np.eye(classes)[labels, :3]
                    + rng.normal(0, 0.2, (n, 3)))
    valid = np.ones(n, bool)
    bids = np.zeros(n, np.int32)
    caps = [512, 256, 128]
    dl0 = 0.08

    model = KPFCNN(num_classes=classes, architecture=arch,
                   first_features_dim=32, dl0=dl0)
    jp, jb, jv, jf = (jnp.asarray(x) for x in (pts, bids, valid, feats))
    jl = jnp.asarray(labels)
    pyr0 = build_pyramid(jp, jb, jv, num_layers=3, dl0=dl0, level_caps=caps)
    variables = model.init(jax.random.PRNGKey(0), pyr0, jf, train=True)
    params, stats = variables["params"], variables["batch_stats"]
    opt = optax.adam(2e-3)
    opt_state = opt.init(params)

    @jax.jit
    def train_step(params, stats, opt_state, pts, bids, valid, feats,
                   labels):
        pyr = build_pyramid(pts, bids, valid, num_layers=3, dl0=dl0,
                            level_caps=caps)

        def loss_fn(p):
            (logits, regs), mut = model.apply(
                {"params": p, "batch_stats": stats}, pyr, feats, train=True,
                mutable=["batch_stats"])
            lp = jax.nn.log_softmax(logits, -1)
            nll = -jnp.take_along_axis(lp, labels[:, None], 1)[:, 0]
            ce = jnp.sum(jnp.where(valid, nll, 0.0)) / jnp.maximum(
                jnp.sum(valid), 1)
            return ce + 1e-3 * regs, mut["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return (optax.apply_updates(params, updates), new_stats, opt_state,
                loss)

    params, stats, first, last = _sgd_loop(train_step, params, stats,
                                           opt_state, 60, jp, jb, jv, jf, jl)
    assert last < first, f"loss did not decrease: {first} -> {last}"

    pyr = build_pyramid(jp, jb, jv, num_layers=3, dl0=dl0, level_caps=caps)
    logits, _ = model.apply({"params": params, "batch_stats": stats}, pyr,
                            jf, train=False)
    acc = (np.asarray(logits).argmax(1) == labels).mean()
    assert acc >= 0.9, f"point acc {acc:.3f} < 0.9 after overfit (chance 1/4)"


# ---------------------------------------------------------------------------
# PointGroup: semantic + offset learning, then clustering AP50 above a floor
# ---------------------------------------------------------------------------


def test_pointgroup_overfits_and_clusters():
    from seggroup_tpu.eval.instance_ap import (VALID_CLASS_IDS,
                                               assign_instances_for_scan,
                                               compute_averages,
                                               evaluate_matches)
    from seggroup_tpu.models.pointgroup import PointGroup, pointgroup_loss
    from seggroup_tpu.ops.voxelize import voxel_gather_mean, voxelize
    from seggroup_tpu.sparse.tensor import SparseTensor

    IGNORE = -100
    rng = np.random.default_rng(0)
    n, n_instances = 2048, 6
    per = 320  # > MIN_REGION_SIZE (100) so proposals are scoreable
    coords = np.zeros((n, 3), np.float32)
    labels = np.full(n, IGNORE, np.int32)
    inst = np.full(n, IGNORE, np.int32)
    centers = np.array([[0, 0, 0], [3, 0, 0], [0, 3, 0],
                        [3, 3, 0], [0, 0, 3], [3, 0, 3]], np.float32)
    for k in range(n_instances):
        sl = slice(k * per, (k + 1) * per)
        coords[sl] = centers[k] + rng.normal(0, 0.15, (per, 3))
        labels[sl] = 2 + (k % 3)  # classes 2..4 (instance classes, not
        inst[sl] = k              # wall=0/floor=1)
    n_valid = n_instances * per
    valid = np.zeros(n, bool)
    valid[:n_valid] = True
    bids = np.zeros(n, np.int32)
    colors = np.zeros((n, 3), np.float32)
    colors[:n_valid] = (np.eye(3)[labels[:n_valid] - 2]
                        + rng.normal(0, 0.2, (n_valid, 3)))

    icoords = np.floor(coords / 0.05).astype(np.int32)
    icoords -= icoords.min(0)
    vm = voxelize(jnp.asarray(icoords), jnp.asarray(bids),
                  jnp.asarray(valid), 2048)
    feats = np.concatenate([colors, coords], 1).astype(np.float32)
    vfeats = voxel_gather_mean(jnp.asarray(feats), vm)
    st = SparseTensor(vm.voxel_coords, vfeats, vm.voxel_valid,
                      vm.num_voxels)

    centroid = np.zeros((n, 3), np.float32)
    pointnum = np.zeros(16, np.int32)
    for k in range(n_instances):
        sel = inst == k
        centroid[sel] = coords[sel].mean(0)
        pointnum[k] = sel.sum()

    model = PointGroup(classes=8, m=8, max_proposals_per_source=32,
                       score_cap=2048, cluster_npoint_thre=20,
                       cluster_radius=0.3)
    jc, jb, jv = jnp.asarray(coords), jnp.asarray(bids), jnp.asarray(valid)
    jl, ji = jnp.asarray(labels), jnp.asarray(inst)
    jcen, jpn = jnp.asarray(centroid), jnp.asarray(pointnum)
    variables = jax.jit(
        lambda r: model.init(r, st, vm.point2voxel, jc, jb, jv,
                             do_clustering=True, train=True,
                             jitter_rng=jax.random.PRNGKey(1))
    )(jax.random.PRNGKey(0))
    params, stats = variables["params"], variables["batch_stats"]
    opt = optax.adam(2e-3)
    opt_state = opt.init(params)

    def make_step(do_clustering):
        @jax.jit
        def train_step(params, stats, opt_state, key):
            def loss_fn(p):
                out, mut = model.apply(
                    {"params": p, "batch_stats": stats}, st, vm.point2voxel,
                    jc, jb, jv, do_clustering=do_clustering, train=True,
                    jitter_rng=key, mutable=["batch_stats"])
                total, aux = pointgroup_loss(
                    out, jl, ji, jcen, jpn, jc, jv, num_instances_cap=16,
                    with_score=do_clustering)
                return total, (mut["batch_stats"], aux)

            (loss, (new_stats, aux)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params)
            updates, opt_state = opt.update(grads, opt_state, params)
            return (optax.apply_updates(params, updates), new_stats,
                    opt_state, loss)
        return train_step

    # the reference's own curriculum: semantic + offset losses only until
    # prepare_epochs, then clustering + ScoreNet (pointgroup run2 yaml
    # prepare_epochs 128 of 384)
    key = jax.random.PRNGKey(2)
    prep_step = make_step(False)
    first = None
    for i in range(200):
        params, stats, opt_state, loss = prep_step(params, stats, opt_state,
                                                   jax.random.fold_in(key, i))
        if i == 0:
            first = float(loss)
    last = float(loss)
    assert last < first, f"prep loss did not decrease: {first} -> {last}"
    full_step = make_step(True)
    for i in range(20):
        params, stats, opt_state, loss = full_step(
            params, stats, opt_state, jax.random.fold_in(key, 1000 + i))
    assert np.isfinite(float(loss))

    out = model.apply({"params": params, "batch_stats": stats}, st,
                      vm.point2voxel, jc, jb, jv, do_clustering=True,
                      train=False)
    sem_pred = np.asarray(out.semantic_scores).argmax(1)
    acc = (sem_pred[:n_valid] == labels[:n_valid]).mean()
    assert acc >= 0.9, f"semantic acc {acc:.3f} < 0.9 after overfit"
    # offsets point at centroids: mean residual far below blob radius
    off = np.asarray(out.pt_offsets)[:n_valid]
    resid = np.linalg.norm(coords[:n_valid] + off - centroid[:n_valid],
                           axis=1).mean()
    assert resid < 0.3, f"offset residual {resid:.3f} (blob sigma 0.15)"

    # clustering AP50 vs GT through the benchmark evaluator
    prop = np.asarray(out.proposal_of_point)  # (2 sources, N)
    scores = np.asarray(out.scores)
    nyu40_of = VALID_CLASS_IDS  # class20 c -> nyu40 id used by the bench
    masks, plabels, confs = [], [], []
    nprop = model.max_proposals_per_source
    for src in range(prop.shape[0]):
        for pid in range(nprop):
            mask = (prop[src] == pid) & valid
            if mask.sum() < 100:
                continue
            sem = sem_pred[mask][0]
            masks.append(mask)
            plabels.append(int(nyu40_of[sem]))
            confs.append(float(scores[src * nprop + pid]))
    assert masks, "no proposals of >=100 points survived clustering"
    gt_ids = np.where(valid,
                      nyu40_of[np.clip(labels, 0, 7)] * 1000 + inst + 1, 0)
    m = assign_instances_for_scan(np.array(masks), np.array(plabels),
                                  np.array(confs), gt_ids)
    avg = compute_averages(evaluate_matches([m]))
    ap50 = avg["all_ap_50%"]
    assert ap50 >= 0.5, f"AP50 {ap50:.3f} < 0.5 after overfit"


# ---------------------------------------------------------------------------
# Stage-1: classifier loss decreases AND pseudo-labels track synthetic GT
# ---------------------------------------------------------------------------


def test_stage1_loss_decreases_and_pseudolabels_track_gt():
    from seggroup_tpu.data.synthetic import make_synthetic_scene
    from seggroup_tpu.models.seggroup import SegGroupGNN, evaluate_labels

    scene = make_synthetic_scene(seed=3, num_points=4096, num_slots=64,
                                 num_edges=256, num_instances=6,
                                 segs_per_instance=6)
    model = SegGroupGNN(cluster_cap=256)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        scene, mode="train", train=True)
    params = variables["params"]
    stats = variables["batch_stats"]
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)

    @jax.jit
    def train_step(params, stats, opt_state, key):
        def loss_fn(p):
            out, mut = model.apply(
                {"params": p, "batch_stats": stats}, scene, mode="train",
                train=True, rngs={"dropout": key},
                mutable=["batch_stats"])
            return (out.loss_sum / jnp.maximum(out.loss_count, 1.0),
                    mut["batch_stats"])

        (loss, new_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return (optax.apply_updates(params, updates), new_stats, opt_state,
                loss)

    losses = []
    for i in range(12):
        params, stats, opt_state, loss = train_step(
            params, stats, opt_state, jax.random.fold_in(
                jax.random.PRNGKey(2), i))
        losses.append(float(loss))
    # smoothed-CE on per-instance pooled features over ~6 instances: a dozen
    # Adam steps must cut the loss; a sign-flipped loss would rise
    assert min(losses[-3:]) < losses[0], losses

    out = model.apply({"params": params, "batch_stats": stats}, scene,
                      mode="ins_infer", train=False)
    n_valid = int(np.sum(np.asarray(scene.point2seg) < scene.num_slots))
    iou_sem, _iou_ins, acc = evaluate_labels(
        out.final_sem, out.final_ins,
        scene.real_sem, scene.real_ins,
        jnp.arange(len(scene.real_sem)) < n_valid)
    i_sem, u_sem = np.asarray(iou_sem)
    present = u_sem > 0
    miou = (i_sem[present] / u_sem[present]).mean()
    # synthetic scenes: weak labels seed every instance, geometry separates
    # them; the pipeline must propagate labels to well over half the points
    assert miou >= 0.5, f"pseudo-label sem mIoU {miou:.3f} < 0.5"
    assert float(acc[0]) >= 0.6, f"sem acc {float(acc[0]):.3f} < 0.6"
