"""Multi-device DP tests on the 8-device virtual CPU mesh — coverage the
reference never had (its DDP paths only ran on real GPUs, SURVEY.md §4)."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from seggroup_tpu.data.synthetic import make_synthetic_scene
from seggroup_tpu.models.seggroup import SegGroupGNN
from seggroup_tpu.parallel.dp import (
    build_stage1_infer_step,
    build_stage1_train_step,
    make_mesh,
    make_optimizer,
    replicate,
    shard_batch,
)
from seggroup_tpu.types import Scene


def _stack_scenes(scenes):
    return Scene(*(jnp.stack(x) for x in zip(*scenes)))


def _make_batch(n, **kw):
    return _stack_scenes([make_synthetic_scene(seed=i, **kw) for i in range(n)])


SCENE_KW = dict(num_points=1024, num_slots=32, num_edges=128,
                num_instances=3, segs_per_instance=3)


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8


@pytest.mark.slow
def test_dp_train_step_runs_and_syncs():
    mesh = make_mesh()
    model = SegGroupGNN(cluster_cap=128)
    scene0 = make_synthetic_scene(seed=0, **SCENE_KW)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        scene0, mode="train", train=True,
    )
    params, stats = variables["params"], variables["batch_stats"]
    opt = make_optimizer("adam", lr=1e-3)
    opt_state = opt.init(params)

    step = build_stage1_train_step(model, opt, mesh)
    batch = shard_batch(mesh, _make_batch(8, **SCENE_KW))
    params_r = replicate(mesh, params)
    opt_r = replicate(mesh, opt_state)
    stats_r = replicate(mesh, stats)

    p1, o1, s1, m1 = step(params_r, opt_r, stats_r, batch, jax.random.PRNGKey(7))
    assert np.isfinite(float(m1["loss"]))
    # params must be identical (replicated) after the update
    leaf = jax.tree.leaves(p1)[0]
    assert len(leaf.sharding.device_set) == 8
    # a second step with the updated params must also run
    p2, o2, s2, m2 = step(p1, o1, s1, batch, jax.random.PRNGKey(8))
    assert np.isfinite(float(m2["loss"]))
    assert float(m2["loss"]) != float(m1["loss"])  # params changed


@pytest.mark.slow
def test_dp_matches_single_device_grads():
    """pmean of per-scene grads over the mesh == mean of per-scene grads
    computed serially (DDP equivalence)."""
    mesh = make_mesh()
    model = SegGroupGNN(cluster_cap=128)
    scenes = [make_synthetic_scene(seed=i, **SCENE_KW) for i in range(8)]
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        scenes[0], mode="train", train=True,
    )
    params, stats = variables["params"], variables["batch_stats"]

    def scene_loss(p, scene):
        out, _ = model.apply(
            {"params": p, "batch_stats": stats}, scene, mode="train",
            train=False,  # no dropout/BN-update so grads are deterministic
            mutable=["batch_stats"],
        )
        return out.loss_sum / jnp.maximum(out.loss_count, 1.0)

    serial_grads = [jax.grad(scene_loss)(params, sc) for sc in scenes]
    mean_serial = jax.tree.map(
        lambda *g: sum(np.asarray(x) for x in g) / len(g), *serial_grads
    )

    from functools import partial
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    scene_specs = Scene(*(P("data") for _ in Scene._fields))

    @jax.jit
    @partial(shard_map, mesh=mesh, in_specs=(P(), scene_specs), out_specs=P(), check_vma=False)
    def dp_grads(p, batch):
        scene = jax.tree.map(lambda x: x[0], batch)
        g = jax.grad(scene_loss)(p, scene)
        return jax.lax.pmean(g, "data")

    batch = shard_batch(mesh, _stack_scenes(scenes))
    got = dp_grads(replicate(mesh, params), batch)
    for a, b in zip(jax.tree.leaves(got), jax.tree.leaves(mean_serial)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3, atol=1e-5)


def test_dp_infer_step():
    mesh = make_mesh()
    model = SegGroupGNN(cluster_cap=128)
    scene0 = make_synthetic_scene(seed=0, **SCENE_KW)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        scene0, mode="train", train=True,
    )
    infer = build_stage1_infer_step(model, mesh, mode="ins_infer")
    batch = shard_batch(mesh, _make_batch(8, **SCENE_KW))
    out = infer(replicate(mesh, {"params": variables["params"],
                                 "batch_stats": variables["batch_stats"]}), batch)
    assert out.final_sem.shape == (8, 1024)
    sems = np.asarray(out.final_sem)
    assert (sems >= 1).all()  # every point labeled in every scene


@pytest.mark.slow
def test_minkunet_dp_grad_equivalence():
    """DP-pmean'd MinkUNet update == the mean of serially-computed per-shard
    gradients (stage-2 DDP equivalence; the stage-1 analog is above)."""
    import optax

    from seggroup_tpu.data.voxel_dataset import IGNORE_LABEL, make_voxel_batch
    from seggroup_tpu.models.minkunet import make_minkunet
    from seggroup_tpu.parallel.dp import build_minkunet_dp_step
    from seggroup_tpu.sparse.plan import build_unet_plan
    from seggroup_tpu.sparse.tensor import SparseTensor

    n_dev = 8
    cap = 256
    caps = [cap, cap // 2, cap // 4, cap // 8, cap // 8]
    model = make_minkunet("Res16UNet14A", out_channels=20, level_caps=caps)
    rng = np.random.default_rng(0)
    sts, labs, plans = [], [], []
    for d in range(n_dev):
        pts = rng.normal(size=(300, 3)).astype(np.float32)
        cols = rng.uniform(0, 255, size=(300, 3)).astype(np.float32)
        ls = rng.integers(0, 20, size=300).astype(np.int32)
        vb = make_voxel_batch([(pts, cols, ls)], cap, 0.1, rng=rng)
        sts.append(SparseTensor(jnp.asarray(vb.coords), jnp.asarray(vb.feats),
                                jnp.asarray(vb.valid), jnp.asarray(vb.num)))
        labs.append(jnp.asarray(vb.labels))
        plans.append(jax.tree.map(
            jnp.asarray, build_unet_plan(vb.coords, int(vb.num), caps)))

    variables = model.init(jax.random.PRNGKey(0), sts[0], train=True,
                           plan=plans[0])
    params, stats = variables["params"], variables["batch_stats"]
    opt = optax.sgd(1e-1)
    mesh = make_mesh(n_dev)
    dp_step = build_minkunet_dp_step(model, opt, mesh)

    st_b = jax.tree.map(lambda *xs: jnp.stack(xs), *sts)
    plan_b = jax.tree.map(lambda *xs: jnp.stack(xs), *plans)
    lab_b = jnp.stack(labs)
    p1, s1, o1, loss, hist = dp_step(
        replicate(mesh, params), replicate(mesh, stats),
        replicate(mesh, opt.init(params)), shard_batch(mesh, st_b),
        shard_batch(mesh, lab_b), shard_batch(mesh, plan_b))
    # the psum'd train confusion matrix counts every valid labeled voxel
    n_valid = sum(
        int((np.asarray(s.valid) & (np.asarray(l) != IGNORE_LABEL)).sum())
        for s, l in zip(sts, labs))
    assert int(np.asarray(hist).sum()) == n_valid

    # serial reference: mean of per-shard grads, one SGD step
    def loss_fn(p, st, labels, plan):
        logits, _ = model.apply({"params": p, "batch_stats": stats}, st,
                                train=True, mutable=["batch_stats"],
                                plan=plan)
        ok = st.valid & (labels != IGNORE_LABEL)
        lp = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(lp, jnp.clip(labels, 0, 19)[:, None],
                                   axis=1)[:, 0]
        return jnp.sum(jnp.where(ok, nll, 0.0)) / jnp.maximum(jnp.sum(ok), 1)

    grad_fn = jax.jit(jax.grad(loss_fn))
    grads = [grad_fn(params, sts[d], labs[d], plans[d]) for d in range(n_dev)]
    mean_grads = jax.tree.map(lambda *g: sum(g) / n_dev, *grads)
    want = jax.tree.map(lambda p, g: p - 1e-1 * g, params, mean_grads)
    for a, b in zip(jax.tree.leaves(jax.device_get(p1)),
                    jax.tree.leaves(jax.device_get(want))):
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-5)
    assert np.isfinite(float(loss))


@pytest.mark.slow
def test_kpconv_dp_grad_equivalence():
    """DP-pmean'd KPConv update == the mean of serially-computed per-shard
    gradients (third stage-2 backbone over the mesh)."""
    import optax

    from seggroup_tpu.models.kpconv import KPFCNN, build_pyramid
    from seggroup_tpu.parallel.dp import build_kpconv_dp_step

    n_dev = 8
    n_cap = 256
    kcaps = [n_cap // 2, n_cap // 4, n_cap // 8, n_cap // 16]
    model = KPFCNN(num_classes=20, first_features_dim=16, dl0=0.1)
    rng = np.random.default_rng(0)
    pts_l, feat_l, lab_l, bid_l, val_l = [], [], [], [], []
    for d in range(n_dev):
        pts_l.append(rng.normal(size=(n_cap, 3)).astype(np.float32))
        feat_l.append(np.ones((n_cap, 4), np.float32))
        lab_l.append(rng.integers(0, 20, size=n_cap).astype(np.int32))
        bid_l.append(np.zeros(n_cap, np.int32))
        val_l.append(np.ones(n_cap, bool))

    pyr0 = build_pyramid(jnp.asarray(pts_l[0]), jnp.asarray(bid_l[0]),
                         jnp.asarray(val_l[0]), 5, 0.1, level_caps=kcaps)
    variables = model.init(jax.random.PRNGKey(0), pyr0,
                           jnp.asarray(feat_l[0]), train=True)
    params, stats = variables["params"], variables["batch_stats"]
    opt = optax.sgd(1e-1)
    mesh = make_mesh(n_dev)
    dp_step = build_kpconv_dp_step(model, opt, mesh, dl0=0.1,
                                   level_caps=kcaps)
    stack = lambda xs: jnp.stack([jnp.asarray(x) for x in xs])
    p1, s1, o1, loss, acc = dp_step(
        replicate(mesh, params), replicate(mesh, stats),
        replicate(mesh, opt.init(params)),
        shard_batch(mesh, stack(pts_l)), shard_batch(mesh, stack(feat_l)),
        shard_batch(mesh, stack(lab_l)), shard_batch(mesh, stack(bid_l)),
        shard_batch(mesh, stack(val_l)))
    assert 0.0 <= float(acc) <= 1.0

    def loss_fn(p, pts, feats, labels, bids, valid):
        pyr = build_pyramid(pts, bids, valid, 5, 0.1, level_caps=kcaps)
        (logits, regs), _ = model.apply(
            {"params": p, "batch_stats": stats}, pyr, feats, train=True,
            mutable=["batch_stats"])
        ok = labels != 255
        lp = jax.nn.log_softmax(logits, -1)
        nll = -jnp.take_along_axis(lp, jnp.clip(labels, 0, 19)[:, None],
                                   1)[:, 0]
        return (jnp.sum(jnp.where(ok, nll, 0.0))
                / jnp.maximum(jnp.sum(ok), 1)) + 0.1 * regs

    grad_fn = jax.jit(jax.grad(loss_fn))
    grads = [grad_fn(params, jnp.asarray(pts_l[d]), jnp.asarray(feat_l[d]),
                     jnp.asarray(lab_l[d]), jnp.asarray(bid_l[d]),
                     jnp.asarray(val_l[d])) for d in range(n_dev)]
    mean_grads = jax.tree.map(lambda *g: sum(g) / n_dev, *grads)
    want = jax.tree.map(lambda p, g: p - 1e-1 * g, params, mean_grads)
    for a, b in zip(jax.tree.leaves(jax.device_get(p1)),
                    jax.tree.leaves(jax.device_get(want))):
        np.testing.assert_allclose(a, b, rtol=3e-4, atol=3e-5)
    assert np.isfinite(float(loss))


@pytest.mark.slow
def test_pointgroup_dp_grad_equivalence():
    """DP-pmean'd PointGroup update (clustering ON) == serially-computed
    mean-gradient step with per-shard folded jitter keys."""
    import optax

    from seggroup_tpu.models.pointgroup import PointGroup, pointgroup_loss
    from seggroup_tpu.ops.voxelize import voxel_gather_mean, voxelize
    from seggroup_tpu.parallel.dp import build_pointgroup_dp_step
    from seggroup_tpu.sparse.tensor import SparseTensor

    n_dev, npt, vcap, icap = 8, 384, 192, 16
    model = PointGroup(classes=8, m=8, max_proposals_per_source=16,
                       score_cap=192, cluster_npoint_thre=10,
                       cluster_radius=0.3)
    rng = np.random.default_rng(0)
    cols = []
    for d in range(n_dev):
        coords = rng.uniform(0, 3, size=(npt, 3)).astype(np.float32)
        labels = rng.integers(2, 6, size=npt).astype(np.int32)
        inst = rng.integers(0, 4, size=npt).astype(np.int32)
        bids = np.zeros(npt, np.int32)
        valid = np.ones(npt, bool)
        ic = np.floor(coords / 0.1).astype(np.int32); ic -= ic.min(0)
        vm = voxelize(jnp.asarray(ic), jnp.asarray(bids), jnp.asarray(valid),
                      vcap)
        feats = jnp.concatenate([jnp.asarray(
            rng.normal(size=(npt, 3)).astype(np.float32)),
            jnp.asarray(coords)], 1)
        st = SparseTensor(vm.voxel_coords, voxel_gather_mean(feats, vm),
                          vm.voxel_valid, vm.num_voxels)
        centroid = np.zeros((npt, 3), np.float32)
        pointnum = np.zeros(icap, np.int32)
        for k in range(4):
            sel = inst == k
            centroid[sel] = coords[sel].mean(0)
            pointnum[k] = sel.sum()
        cols.append((st, vm.point2voxel, jnp.asarray(coords),
                     jnp.asarray(bids), jnp.asarray(valid),
                     jnp.asarray(labels), jnp.asarray(inst),
                     jnp.asarray(centroid), jnp.asarray(pointnum)))
    batched = jax.tree.map(lambda *xs: jnp.stack(xs), *cols)

    variables = model.init(
        jax.random.PRNGKey(0), *jax.tree.map(lambda x: x[0], batched[:5]),
        do_clustering=True, train=True, jitter_rng=jax.random.PRNGKey(0))
    params, stats = variables["params"], variables["batch_stats"]
    opt = optax.sgd(1e-2)
    mesh = make_mesh(n_dev)
    key = jax.random.PRNGKey(7)
    dp_step = build_pointgroup_dp_step(model, opt, mesh, pointgroup_loss,
                                       do_clustering=True, instance_cap=icap)
    p1, s1, o1, loss = dp_step(
        replicate(mesh, params), replicate(mesh, stats),
        replicate(mesh, opt.init(params)),
        *(shard_batch(mesh, x) for x in batched), {}, key)

    def loss_fn(p, shard, k):
        out, _ = model.apply(
            {"params": p, "batch_stats": stats}, *shard[:5],
            do_clustering=True, train=True, jitter_rng=k,
            mutable=["batch_stats"])
        total, _aux = pointgroup_loss(out, *shard[5:], shard[2], shard[4],
                                      num_instances_cap=icap, with_score=True)
        return total

    grad_fn = jax.jit(jax.grad(loss_fn))
    grads = [grad_fn(params, jax.tree.map(lambda x: x[d], batched),
                     jax.random.fold_in(key, d)) for d in range(n_dev)]
    mean_grads = jax.tree.map(lambda *g: sum(g) / n_dev, *grads)
    want = jax.tree.map(lambda p, g: p - 1e-2 * g, params, mean_grads)
    for a, b in zip(jax.tree.leaves(jax.device_get(p1)),
                    jax.tree.leaves(jax.device_get(want))):
        np.testing.assert_allclose(a, b, rtol=3e-4, atol=3e-5)
    assert np.isfinite(float(loss))


@pytest.mark.slow
def test_minkunet_packed_dp_matches_host_plan_dp():
    """The minimal-transfer DP step (wire batches + in-shard device plans)
    produces the same update as the host-plan DP step on the same batches
    (up to the f16 feature quantization of the wire format)."""
    import optax

    from seggroup_tpu.data.voxel_dataset import make_voxel_batch
    from seggroup_tpu.models.minkunet import make_minkunet
    from seggroup_tpu.parallel.dp import (build_minkunet_dp_step,
                                          build_minkunet_dp_step_packed)
    from seggroup_tpu.sparse.device_plan import pack_voxel_batch
    from seggroup_tpu.sparse.plan import build_unet_plan
    from seggroup_tpu.sparse.tensor import SparseTensor

    n_dev = 8
    cap = 256
    caps = [cap, cap // 2, cap // 4, cap // 8, cap // 8]
    model = make_minkunet("Res16UNet14A", out_channels=20, level_caps=caps)
    rng = np.random.default_rng(3)
    sts, labs, plans, vbs = [], [], [], []
    for d in range(n_dev):
        pts = rng.normal(size=(300, 3)).astype(np.float32)
        cols = rng.uniform(0, 255, size=(300, 3)).astype(np.float32)
        ls = rng.integers(0, 20, size=300).astype(np.int32)
        vb = make_voxel_batch([(pts, cols, ls)], cap, 0.1, rng=rng)
        # wire format ships f16 feats; feed the same f16-rounded feats to the
        # host-plan step so the two paths see identical inputs
        vb = vb._replace(feats=vb.feats.astype(np.float16).astype(np.float32))
        vbs.append(vb)
        sts.append(SparseTensor(jnp.asarray(vb.coords), jnp.asarray(vb.feats),
                                jnp.asarray(vb.valid), jnp.asarray(vb.num)))
        labs.append(jnp.asarray(vb.labels))
        plans.append(jax.tree.map(
            jnp.asarray, build_unet_plan(vb.coords, int(vb.num), caps)))

    variables = model.init(jax.random.PRNGKey(0), sts[0], train=True,
                           plan=plans[0])
    params, stats = variables["params"], variables["batch_stats"]
    opt = optax.sgd(1e-1)
    mesh = make_mesh(n_dev)

    dp_host = build_minkunet_dp_step(model, opt, mesh)
    st_b = jax.tree.map(lambda *xs: jnp.stack(xs), *sts)
    plan_b = jax.tree.map(lambda *xs: jnp.stack(xs), *plans)
    lab_b = jnp.stack(labs)
    ph, _, _, loss_h, hist_h = dp_host(
        replicate(mesh, params), replicate(mesh, stats),
        replicate(mesh, opt.init(params)), shard_batch(mesh, st_b),
        shard_batch(mesh, lab_b), shard_batch(mesh, plan_b))

    dp_packed = build_minkunet_dp_step_packed(model, opt, mesh, caps)
    packs = [pack_voxel_batch(vb) for vb in vbs]
    cols_w = [jnp.stack([jnp.asarray(p[i]) for p in packs]) for i in range(4)]
    pp, _, _, loss_p, hist_p = dp_packed(
        replicate(mesh, params), replicate(mesh, stats),
        replicate(mesh, opt.init(params)),
        *(shard_batch(mesh, c) for c in cols_w))

    np.testing.assert_allclose(float(loss_p), float(loss_h), rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(hist_p), np.asarray(hist_h))
    for a, b in zip(jax.tree.leaves(pp), jax.tree.leaves(ph)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)
