import jax
import jax.numpy as jnp
import numpy as np
import pytest

from seggroup_tpu.models.pointgroup import IGNORE, PointGroup, pointgroup_loss
from seggroup_tpu.ops.voxelize import voxelize
from seggroup_tpu.sparse.tensor import SparseTensor


@pytest.fixture(scope="module")
def batch(rng=None):
    rng = np.random.default_rng(0)
    # 2 scenes, 3 instances each in distinct spatial blobs
    n, n_valid = 2048, 1900
    coords = np.zeros((n, 3), np.float32)
    labels = np.full(n, IGNORE, np.int32)
    inst = np.full(n, IGNORE, np.int32)
    batch_ids = np.zeros(n, np.int32)
    per = n_valid // 6
    centers = rng.uniform(0, 4, size=(6, 3)).astype(np.float32)
    for k in range(6):
        sl = slice(k * per, (k + 1) * per)
        coords[sl] = centers[k] + rng.normal(scale=0.05, size=(per, 3))
        labels[sl] = 2 + (k % 3)  # classes 2..4 (not wall/floor)
        inst[sl] = k
        batch_ids[sl] = k // 3
    valid = np.zeros(n, bool)
    valid[: 6 * per] = True
    colors = rng.normal(size=(n, 3)).astype(np.float32)

    icoords = np.floor(coords / 0.02).astype(np.int32)
    icoords -= icoords.min(0)
    vm = voxelize(jnp.array(icoords), jnp.array(batch_ids), jnp.array(valid), 2048)
    feats = np.concatenate([colors, coords], 1).astype(np.float32)
    from seggroup_tpu.ops.voxelize import voxel_gather_mean

    vfeats = voxel_gather_mean(jnp.array(feats), vm)
    st = SparseTensor(vm.voxel_coords, vfeats, vm.voxel_valid, vm.num_voxels)

    centroid = np.zeros((n, 3), np.float32)
    pointnum = np.zeros(16, np.int32)
    for k in range(6):
        sel = inst == k
        centroid[sel] = coords[sel].mean(0)
        pointnum[k] = sel.sum()
    return dict(st=st, p2v=vm.point2voxel, coords=jnp.array(coords),
                batch_ids=jnp.array(batch_ids), valid=jnp.array(valid),
                labels=jnp.array(labels), inst=jnp.array(inst),
                centroid=jnp.array(centroid), pointnum=jnp.array(pointnum))


@pytest.fixture(scope="module")
def model_and_vars(batch):
    model = PointGroup(classes=8, m=8, max_proposals_per_source=32,
                       score_cap=2048, cluster_npoint_thre=20,
                       cluster_radius=0.25)
    variables = jax.jit(
        lambda r, st, p2v, c, b, v: model.init(
            r, st, p2v, c, b, v, do_clustering=True, train=True,
            jitter_rng=jax.random.PRNGKey(1))
    )(jax.random.PRNGKey(0), batch["st"], batch["p2v"], batch["coords"],
      batch["batch_ids"], batch["valid"])
    return model, variables


def test_forward_shapes(batch, model_and_vars):
    model, variables = model_and_vars
    out = model.apply(
        variables, batch["st"], batch["p2v"], batch["coords"],
        batch["batch_ids"], batch["valid"], do_clustering=True, train=False,
    )
    assert out.semantic_scores.shape == (2048, 8)
    assert out.pt_offsets.shape == (2048, 3)
    assert out.scores.shape == (64,)
    assert np.isfinite(np.asarray(out.scores)).all()


def test_clustering_finds_instances(batch, model_and_vars):
    """With GT semantics forced via a label-aligned head, clustering on raw
    coords must find the 6 spatial blobs as proposals."""
    model, variables = model_and_vars
    out = model.apply(
        variables, batch["st"], batch["p2v"], batch["coords"],
        batch["batch_ids"], batch["valid"], do_clustering=True, train=False,
    )
    # whatever the (random) semantics, proposals from the original-coords
    # source must be spatially coherent: all member points within a blob
    prop = np.asarray(out.proposal_of_point[0])
    coords = np.asarray(batch["coords"])
    for p in np.unique(prop):
        if p >= 64:
            continue
        pts = coords[prop == p]
        if len(pts) < 2:
            continue
        spread = np.linalg.norm(pts - pts.mean(0), axis=1).max()
        assert spread < 1.0, f"proposal {p} spans {spread}"


@pytest.mark.slow
def test_loss_and_grads(batch, model_and_vars):
    model, variables = model_and_vars
    params = variables["params"]
    stats = variables["batch_stats"]

    def loss_fn(p):
        out, _ = model.apply(
            {"params": p, "batch_stats": stats}, batch["st"], batch["p2v"],
            batch["coords"], batch["batch_ids"], batch["valid"],
            do_clustering=True, train=True,
            jitter_rng=jax.random.PRNGKey(2), mutable=["batch_stats"],
        )
        total, aux = pointgroup_loss(
            out, batch["labels"], batch["inst"], batch["centroid"],
            batch["pointnum"], batch["coords"], batch["valid"],
            num_instances_cap=16, with_score=True,
        )
        return total, aux

    (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    assert np.isfinite(float(loss))
    for k, v in aux.items():
        assert np.isfinite(float(v)), k
    flat = jax.tree.leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in flat)
    # both the backbone and the score branch receive gradient
    assert float(sum(jnp.sum(jnp.abs(x)) for x in jax.tree.leaves(grads["unet"]))) > 0
    assert float(sum(jnp.sum(jnp.abs(x)) for x in jax.tree.leaves(grads["score_unet"]))) > 0


def test_prepare_mode_no_clustering(batch, model_and_vars):
    model, variables = model_and_vars
    out = model.apply(
        variables, batch["st"], batch["p2v"], batch["coords"],
        batch["batch_ids"], batch["valid"], do_clustering=False, train=False,
    )
    assert int(out.num_proposals) == 0
    total, aux = pointgroup_loss(
        out, batch["labels"], batch["inst"], batch["centroid"],
        batch["pointnum"], batch["coords"], batch["valid"],
        num_instances_cap=16, with_score=False,
    )
    assert np.isfinite(float(total))
    assert "score_loss" not in aux


@pytest.mark.slow
def test_split_program_matches_fused(batch, model_and_vars, monkeypatch):
    """proposals_only + score_plan two-program step == fused step: identical
    discrete proposals, and (at f32 conv compute) identical loss and grads.
    Gradients never flow through the discrete cluster assignment (the
    reference's BFS runs detached on CPU, pointgroup.py:293-301), so the
    split is exact; with the production bf16 conv compute the two programs
    fuse differently and only agree to bf16 noise, hence the f32 pin here."""
    import functools

    import seggroup_tpu.models.minkunet as mk
    import seggroup_tpu.sparse.conv as sconv

    monkeypatch.setattr(
        mk, "subm_conv",
        functools.partial(sconv.subm_conv, compute_dtype=jnp.float32))

    model, variables = model_and_vars
    params = variables["params"]
    stats = variables["batch_stats"]
    key = jax.random.PRNGKey(2)

    def fused_fwd(p):
        return model.apply(
            {"params": p, "batch_stats": stats}, batch["st"], batch["p2v"],
            batch["coords"], batch["batch_ids"], batch["valid"],
            do_clustering=True, train=True, jitter_rng=key,
            mutable=["batch_stats"])[0]

    def fused_loss(p):
        out = fused_fwd(p)
        total, _ = pointgroup_loss(
            out, batch["labels"], batch["inst"], batch["centroid"],
            batch["pointnum"], batch["coords"], batch["valid"],
            num_instances_cap=16, with_score=True)
        return total

    # program A: forward + clustering + score-voxelization plan (no grad)
    (out_a, score_ctx), _ = jax.jit(
        lambda p: model.apply(
            {"params": p, "batch_stats": stats}, batch["st"], batch["p2v"],
            batch["coords"], batch["batch_ids"], batch["valid"],
            do_clustering=True, train=True, jitter_rng=key,
            proposals_only=True, mutable=["batch_stats"])
    )(params)

    # discrete artifacts equal the fused program's
    out_f = jax.jit(fused_fwd)(params)
    np.testing.assert_array_equal(np.asarray(out_a.proposal_of_point),
                                  np.asarray(out_f.proposal_of_point))
    np.testing.assert_array_equal(np.asarray(out_a.proposal_valid),
                                  np.asarray(out_f.proposal_valid))

    # program B: grad step with the discrete plan injected
    def split_loss(p):
        out, _ = model.apply(
            {"params": p, "batch_stats": stats}, batch["st"], batch["p2v"],
            batch["coords"], batch["batch_ids"], batch["valid"],
            do_clustering=True, train=True,
            score_plan=(out_a.proposal_of_point, out_a.proposal_valid,
                        out_a.num_proposals, score_ctx),
            mutable=["batch_stats"],
        )
        total, _ = pointgroup_loss(
            out, batch["labels"], batch["inst"], batch["centroid"],
            batch["pointnum"], batch["coords"], batch["valid"],
            num_instances_cap=16, with_score=True,
        )
        return total

    lf, gf = jax.jit(jax.value_and_grad(fused_loss))(params)
    ls, gs = jax.jit(jax.value_and_grad(split_loss))(params)
    np.testing.assert_allclose(float(lf), float(ls), rtol=1e-6)
    for kf, ks in zip(jax.tree.leaves(gf), jax.tree.leaves(gs)):
        np.testing.assert_allclose(np.asarray(kf), np.asarray(ks),
                                   rtol=1e-4, atol=1e-5)
