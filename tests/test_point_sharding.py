"""Point-axis (context-parallel analog) sharding: sharded edge conv must
equal the single-device computation exactly."""

import jax
import jax.numpy as jnp
import numpy as np

from seggroup_tpu.parallel.dp import make_mesh
from seggroup_tpu.parallel.point_sharding import point_sharded_edge_conv


def test_point_sharded_edge_conv_matches_single_device(rng):
    n, k, f, c = 1024, 16, 9, 32
    x = rng.normal(size=(n, f)).astype(np.float32)
    idx = rng.integers(0, n, size=(n, k)).astype(np.int32)
    w = rng.normal(size=(2 * f, c)).astype(np.float32) * 0.1

    def single(x, idx, w):
        nbr = x[idx]
        self_f = x[:, None, :]
        feat = np.concatenate(
            [nbr - self_f, np.broadcast_to(self_f, nbr.shape)], axis=-1
        )
        return np.maximum(feat @ w, 0.0).max(1)

    want = single(x, idx, w)
    mesh = make_mesh()
    got = np.asarray(
        point_sharded_edge_conv(mesh, jnp.array(x), jnp.array(idx),
                                jnp.array(w))
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
    # and the output really is point-sharded across all 8 devices
    out = point_sharded_edge_conv(mesh, jnp.array(x), jnp.array(idx),
                                  jnp.array(w))
    assert len(out.sharding.device_set) == 8


def _tiny_scene():
    from seggroup_tpu.data.synthetic import make_synthetic_scene

    # N=2048 divides the 8-device mesh; small slots keep compiles quick
    return make_synthetic_scene(seed=5, num_points=2048, num_slots=64,
                                num_edges=256, num_instances=4,
                                segs_per_instance=4)


def test_stage1_point_sharded_forward_matches_single_device():
    """The REAL stage-1 model (SegGroupGNN) with its edge-conv intermediates
    point-sharded over 8 devices produces the same pseudo-labels as the
    single-device forward (VERDICT r3 item 6)."""
    from seggroup_tpu.models.seggroup import SegGroupGNN
    from seggroup_tpu.parallel.point_sharding import (
        build_stage1_point_sharded_forward, make_point_sharded_model)

    scene = _tiny_scene()
    kwargs = dict(cluster_cap=256, compute_dtype=jnp.float32)
    base = SegGroupGNN(**kwargs)
    variables = base.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        scene, mode="train", train=True)

    want = base.apply(variables, scene, mode="ins_infer", train=False)

    mesh = make_mesh(axis="point")
    sharded = make_point_sharded_model(mesh, **kwargs)
    fwd = build_stage1_point_sharded_forward(sharded, mesh)
    got = fwd(variables, scene)

    np.testing.assert_array_equal(np.asarray(got.final_sem),
                                  np.asarray(want.final_sem))
    np.testing.assert_array_equal(np.asarray(got.final_ins),
                                  np.asarray(want.final_ins))
    np.testing.assert_array_equal(np.asarray(got.final_root),
                                  np.asarray(want.final_root))
    np.testing.assert_allclose(np.asarray(got.acc), np.asarray(want.acc),
                               rtol=1e-6)


def test_stage1_point_sharded_grads_match_single_device():
    """Gradient equivalence: psum'ed sharded grads == single-device grads."""
    import optax

    from seggroup_tpu.models.seggroup import SegGroupGNN
    from seggroup_tpu.parallel.point_sharding import (
        build_stage1_point_sharded_grad, make_point_sharded_model)

    scene = _tiny_scene()
    kwargs = dict(cluster_cap=256, compute_dtype=jnp.float32)
    base = SegGroupGNN(**kwargs)
    variables = base.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        scene, mode="train", train=True)
    params = variables["params"]
    others = {k: v for k, v in variables.items() if k != "params"}
    key = jax.random.PRNGKey(7)

    def loss_fn(p):
        out, _ = base.apply({"params": p, **others}, scene, mode="train",
                            train=True, rngs={"dropout": key},
                            mutable=["batch_stats"])
        return out.loss_sum / jnp.maximum(out.loss_count, 1.0)

    want_loss, want_grads = jax.value_and_grad(loss_fn)(params)

    mesh = make_mesh(axis="point")
    sharded = make_point_sharded_model(mesh, **kwargs)
    step = build_stage1_point_sharded_grad(sharded, mesh)
    got_loss, got_grads = step(variables, scene, key)

    np.testing.assert_allclose(float(got_loss), float(want_loss), rtol=1e-5)
    flat_w, _ = jax.flatten_util.ravel_pytree(want_grads)
    flat_g, _ = jax.flatten_util.ravel_pytree(got_grads)
    # psum/all-gather reassociate float sums; tolerances cover that only
    np.testing.assert_allclose(np.asarray(flat_g), np.asarray(flat_w),
                               rtol=2e-4, atol=2e-6)
    assert float(optax.global_norm(want_grads)) > 0
