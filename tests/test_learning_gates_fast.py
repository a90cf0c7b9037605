"""FAST learning gates: one tiny-shape overfit per backbone in the fast CI
gate (VERDICT r4 item 7 — the full gates in test_learning_gates.py are
slow-marked, so a dead-gradient or sign-flipped-loss regression could ship
through the 13-min gate and only fail in the rarely-run full suite).

Each test runs a handful of optimizer steps on the smallest program that
still exercises the backbone's real loss path and asserts the loss FALLS
by a margin. A sign-flipped loss rises; a dead gradient path leaves it
flat; both fail these bars. Accuracy bars live in the slow gates."""

import jax
import jax.numpy as jnp
import numpy as np
import optax


def _loss_falls(train_step, params, stats, opt_state, steps, *batch,
                margin=0.85):
    first = None
    for i in range(steps):
        params, stats, opt_state, loss = train_step(params, stats,
                                                    opt_state, *batch)
        if i == 0:
            first = float(loss)
    last = float(loss)
    assert np.isfinite(first) and np.isfinite(last)
    assert last < first * margin, (
        f"loss did not fall by {(1 - margin) * 100:.0f}%: {first} -> {last}")
    return params, stats


def test_minkunet_learns_fast():
    from seggroup_tpu.models.minkunet import make_minkunet
    from seggroup_tpu.sparse.tensor import SparseTensor

    rng = np.random.default_rng(0)
    m_cap, n, classes = 256, 200, 4
    rows = rng.choice(16 ** 3, size=n, replace=False)
    coords = np.zeros((m_cap, 4), np.int32)
    coords[:n, 1] = rows // 256
    coords[:n, 2] = (rows // 16) % 16
    coords[:n, 3] = rows % 16
    labels = np.zeros(m_cap, np.int32)
    labels[:n] = rng.integers(0, classes, n)
    feats = np.zeros((m_cap, 3), np.float32)
    feats[:n] = np.eye(classes)[labels[:n], :3] + rng.normal(0, 0.2, (n, 3))
    valid = np.zeros(m_cap, bool)
    valid[:n] = True
    st = SparseTensor(jnp.asarray(coords), jnp.asarray(feats),
                      jnp.asarray(valid), jnp.int32(n))
    jl = jnp.asarray(labels)

    model = make_minkunet("Res16UNet14A", out_channels=classes,
                          level_caps=[m_cap, 128, 64, 32, 32])
    variables = model.init(jax.random.PRNGKey(0), st, train=True)
    opt = optax.adam(5e-3)

    @jax.jit
    def train_step(params, stats, opt_state, st, labels):
        def loss_fn(p):
            logits, mut = model.apply({"params": p, "batch_stats": stats},
                                      st, train=True, mutable=["batch_stats"])
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

    _loss_falls(train_step, variables["params"], variables["batch_stats"],
                opt.init(variables["params"]), 25, st, jl)


def test_kpfcnn_learns_fast():
    from seggroup_tpu.models.kpconv import KPFCNN, build_pyramid

    arch = ("simple", "resnetb_strided", "resnetb", "nearest_upsample",
            "unary")
    rng = np.random.default_rng(0)
    n, classes = 256, 3
    blobs = rng.uniform(0, 1.5, (6, 3)).astype(np.float32)
    which = np.arange(n) % 6
    pts = (blobs[which] + rng.normal(0, 0.06, (n, 3))).astype(np.float32)
    labels = (which % classes).astype(np.int32)
    feats = np.ones((n, 4), np.float32)
    feats[:, 1:] = np.eye(classes)[labels] + rng.normal(0, 0.15, (n, 3))
    valid = np.ones(n, bool)
    bids = np.zeros(n, np.int32)
    caps = [128]
    dl0 = 0.08

    model = KPFCNN(num_classes=classes, architecture=arch,
                   first_features_dim=16, dl0=dl0)
    jp, jb, jv, jf = (jnp.asarray(x) for x in (pts, bids, valid, feats))
    jl = jnp.asarray(labels)
    pyr0 = build_pyramid(jp, jb, jv, num_layers=2, dl0=dl0, level_caps=caps)
    variables = model.init(jax.random.PRNGKey(0), pyr0, jf, train=True)
    opt = optax.adam(3e-3)

    @jax.jit
    def train_step(params, stats, opt_state, pts, bids, valid, feats,
                   labels):
        pyr = build_pyramid(pts, bids, valid, num_layers=2, dl0=dl0,
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

    _loss_falls(train_step, variables["params"], variables["batch_stats"],
                opt.init(variables["params"]), 25, jp, jb, jv, jf, jl)


def test_pointgroup_learns_fast():
    """Semantic + offset loss path (the pre-prepare_epochs curriculum,
    reference train.py:38-93). Clustering/ScoreNet compile is minutes on
    XLA-CPU — covered by the slow gate."""
    from seggroup_tpu.models.pointgroup import PointGroup, pointgroup_loss
    from seggroup_tpu.ops.voxelize import voxel_gather_mean, voxelize
    from seggroup_tpu.sparse.tensor import SparseTensor

    IGNORE = -100
    rng = np.random.default_rng(0)
    n, n_inst, per = 512, 4, 128
    coords = np.zeros((n, 3), np.float32)
    labels = np.full(n, IGNORE, np.int32)
    inst = np.full(n, IGNORE, np.int32)
    centers = np.array([[0, 0, 0], [2, 0, 0], [0, 2, 0], [2, 2, 0]],
                       np.float32)
    for k in range(n_inst):
        sl = slice(k * per, (k + 1) * per)
        coords[sl] = centers[k] + rng.normal(0, 0.12, (per, 3))
        labels[sl] = 2 + (k % 2)
        inst[sl] = k
    valid = np.ones(n, bool)
    bids = np.zeros(n, np.int32)
    colors = np.eye(2)[labels - 2][:, :2].astype(np.float32)
    colors = np.concatenate([colors, np.zeros((n, 1), np.float32)], 1)
    colors += rng.normal(0, 0.15, (n, 3)).astype(np.float32)

    ic = np.floor(coords / 0.05).astype(np.int32)
    ic -= ic.min(0)
    vm = voxelize(jnp.asarray(ic), jnp.asarray(bids), jnp.asarray(valid), 512)
    feats = np.concatenate([colors, coords], 1).astype(np.float32)
    st = SparseTensor(vm.voxel_coords,
                      voxel_gather_mean(jnp.asarray(feats), vm),
                      vm.voxel_valid, vm.num_voxels)

    centroid = np.zeros((n, 3), np.float32)
    pointnum = np.zeros(8, np.int32)
    for k in range(n_inst):
        sel = inst == k
        centroid[sel] = coords[sel].mean(0)
        pointnum[k] = sel.sum()

    model = PointGroup(classes=6, m=8, block_reps=1, score_cap=256)
    jc, jb2, jv = jnp.asarray(coords), jnp.asarray(bids), jnp.asarray(valid)
    jl, ji = jnp.asarray(labels), jnp.asarray(inst)
    jcen, jpn = jnp.asarray(centroid), jnp.asarray(pointnum)
    variables = jax.jit(
        lambda r: model.init(r, st, vm.point2voxel, jc, jb2, jv,
                             do_clustering=False, train=True)
    )(jax.random.PRNGKey(0))
    opt = optax.adam(3e-3)

    @jax.jit
    def train_step(params, stats, opt_state, key):
        def loss_fn(p):
            out, mut = model.apply(
                {"params": p, "batch_stats": stats}, st, vm.point2voxel,
                jc, jb2, jv, do_clustering=False, train=True,
                mutable=["batch_stats"])
            total, _ = pointgroup_loss(
                out, jl, ji, jcen, jpn, jc, jv, num_instances_cap=8,
                with_score=False)
            return total, mut["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return (optax.apply_updates(params, updates), new_stats, opt_state,
                loss)

    params, stats = variables["params"], variables["batch_stats"]
    opt_state = opt.init(params)
    first = None
    for i in range(30):
        params, stats, opt_state, loss = train_step(
            params, stats, opt_state, jax.random.fold_in(
                jax.random.PRNGKey(1), i))
        if i == 0:
            first = float(loss)
    last = float(loss)
    assert np.isfinite(first) and np.isfinite(last)
    assert last < first * 0.85, f"loss did not fall: {first} -> {last}"


def test_stage1_learns_fast():
    from seggroup_tpu.data.synthetic import make_synthetic_scene
    from seggroup_tpu.models.seggroup import SegGroupGNN

    scene = make_synthetic_scene(seed=3, num_points=1024, num_slots=32,
                                 num_edges=128, num_instances=4,
                                 segs_per_instance=3)
    model = SegGroupGNN(cluster_cap=128)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        scene, mode="train", train=True)
    opt = optax.adam(2e-3)

    @jax.jit
    def train_step(params, stats, opt_state, key):
        def loss_fn(p):
            out, mut = model.apply(
                {"params": p, "batch_stats": stats}, scene, mode="train",
                train=True, rngs={"dropout": key}, mutable=["batch_stats"])
            return (out.loss_sum / jnp.maximum(out.loss_count, 1.0),
                    mut["batch_stats"])

        (loss, new_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return (optax.apply_updates(params, updates), new_stats, opt_state,
                loss)

    params, stats = variables["params"], variables["batch_stats"]
    opt_state = opt.init(params)
    losses = []
    for i in range(15):
        params, stats, opt_state, loss = train_step(
            params, stats, opt_state,
            jax.random.fold_in(jax.random.PRNGKey(2), i))
        losses.append(float(loss))
    assert all(np.isfinite(losses))
    # dropout jitters individual steps; require the smoothed tail below the
    # start (a sign-flipped classifier loss rises monotonically)
    assert min(losses[-3:]) < losses[0] * 0.9, losses
