"""Stage-1 pipeline integration tests on synthetic scenes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from seggroup_tpu.data.synthetic import make_synthetic_scene
from seggroup_tpu.models.seggroup import SegGroupGNN, cluster_pointclouds, smoothed_cross_entropy


@pytest.fixture(scope="module")
def scene():
    return make_synthetic_scene(seed=1, num_points=2048, num_slots=64,
                                num_edges=256, num_instances=4,
                                segs_per_instance=4)


@pytest.fixture(scope="module")
def model_and_vars(scene):
    model = SegGroupGNN(cluster_cap=256)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        scene, mode="train", train=True,
    )
    return model, variables


def test_param_count(model_and_vars):
    _, variables = model_and_vars
    count = sum(x.size for x in jax.tree.leaves(variables["params"]))
    # reference SegGroup GNN is 0.15M params (FAQ.md:46)
    assert 120_000 < count < 180_000, count


def test_forward_train(scene, model_and_vars):
    model, variables = model_and_vars
    out, _ = model.apply(
        variables, scene, mode="train", train=True,
        rngs={"dropout": jax.random.PRNGKey(2)},
        mutable=["batch_stats"],
    )
    assert np.isfinite(float(out.loss_sum))
    assert float(out.loss_count) >= 1
    # every real point ends with a label in the final export
    n_valid = int(np.sum(np.asarray(scene.point2seg) < scene.num_slots))
    final_sem = np.asarray(out.final_sem)[:n_valid]
    assert (final_sem >= 1).all(), "unlabeled points remain after final clustering"
    # weak labels are seeds of GT instances, so accuracy should be decent even
    # with random weights (grouping is geometry-driven at layer 1)
    assert float(out.acc[0]) > 0.2


def test_forward_modes(scene, model_and_vars):
    model, variables = model_and_vars
    for mode in ["sem_infer", "ins_infer"]:
        out = model.apply(variables, scene, mode=mode, train=False)
        assert float(out.loss_sum) == 0.0
        sem2 = np.asarray(out.sem_layer2)
        assert sem2.max() <= 40


def test_per_layer_exports(scene, model_and_vars):
    """Per-layer sem/ins exports (reference model.py:736-861): layer 2 rows
    equal the layer-2 exports, layer 1 carries the raw weak seeds, and label
    coverage only grows as layers merge."""
    model, variables = model_and_vars
    out = model.apply(variables, scene, mode="ins_infer", train=False)
    n = out.final_sem.shape[0]
    assert out.layer_sem.shape == (4, n) and out.layer_ins.shape == (4, n)
    np.testing.assert_array_equal(np.asarray(out.layer_sem[1]),
                                  np.asarray(out.sem_layer2))
    np.testing.assert_array_equal(np.asarray(out.layer_ins[1]),
                                  np.asarray(out.ins_layer2))
    labeled = (np.asarray(out.layer_ins) >= 1).sum(axis=1)
    assert (np.diff(labeled) >= 0).all(), (
        f"instance coverage must be monotone across layers: {labeled}")


@pytest.mark.slow
def test_grad_flow(scene, model_and_vars):
    model, variables = model_and_vars
    params = variables["params"]
    others = {k: v for k, v in variables.items() if k != "params"}

    def loss_fn(p):
        out, _ = model.apply(
            {"params": p, **others}, scene, mode="train", train=True,
            rngs={"dropout": jax.random.PRNGKey(3)},
            mutable=["batch_stats"],
        )
        return out.loss_sum / jnp.maximum(out.loss_count, 1.0)

    grads = jax.grad(loss_fn)(params)
    flat = jax.tree.leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in flat)
    # the classifier must receive gradient; the MLP/GCN path flows through
    # feature aggregation (grouping decisions are stop_gradient'ed)
    norms = {
        k: float(jnp.linalg.norm(jnp.concatenate([jnp.ravel(x) for x in jax.tree.leaves(v)])))
        for k, v in grads.items()
    }
    assert norms["classifier"] > 0
    assert norms["gcn_3"] > 0
    assert norms["mlp_1"] > 0  # flows via feature aggregation into feat5


def test_cluster_pointclouds_small_and_large():
    pts = np.zeros((100, 6), np.float32)
    pts[:, :3] = np.random.default_rng(0).normal(size=(100, 3))
    # cluster 0: 3 members; cluster 1: 97 members
    p2r = np.array([0] * 3 + [1] * 97, np.int32)
    clouds, valid = cluster_pointclouds(
        jnp.array(pts), jnp.array(p2r), 4, p_out=16, cap=64
    )
    clouds, valid = np.asarray(clouds), np.asarray(valid)
    assert valid.tolist() == [True, True, False, False]
    # small cluster: tiled members (16 // 3 = 5 reps of 3 = 15, then 1 FPS pick)
    # all 16 output points must come from the 3 member positions
    orig = pts[:3, :3]
    orig = (orig - orig.mean(0))  # compare after centering: use raw gather check
    # instead verify all rows of cloud 0 equal one of the 3 member points
    raw, _ = cluster_pointclouds(
        jnp.array(pts), jnp.array(p2r), 4, p_out=16, cap=64, transform=False
    )
    raw = np.asarray(raw)
    for row in raw[0]:
        assert min(np.abs(row[:3] - pts[i, :3]).max() for i in range(3)) < 1e-6
    for row in raw[1]:
        assert min(np.abs(row[:3] - pts[i, :3]).max() for i in range(3, 100)) < 1e-6
    # transform: centered and max-abs-normalized
    assert np.abs(clouds[1, :, :3].mean(0)).max() < 1e-4
    assert np.abs(clouds[1, :, :3]).max() <= 1.0 + 1e-5
    # padding slots are zero
    assert (clouds[2:] == 0).all()


def test_smoothed_ce_matches_reference_formula(rng):
    logits = rng.normal(size=(5, 40)).astype(np.float32)
    labels = rng.integers(0, 40, size=5)
    valid = np.ones(5, bool)
    got = float(smoothed_cross_entropy(jnp.array(logits), jnp.array(labels), jnp.array(valid)))
    # reference formula (seggroup/util.py:17-25)
    eps, n_class = 0.2, 40
    one_hot = np.eye(n_class)[labels]
    soft = one_hot * (1 - eps) + (1 - one_hot) * eps / (n_class - 1)
    logp = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
    want = float(-(soft * logp).sum())
    np.testing.assert_allclose(got, want, rtol=1e-4)
