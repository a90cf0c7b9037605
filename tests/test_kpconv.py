import jax
import jax.numpy as jnp
import numpy as np
import pytest

from seggroup_tpu.models.kpconv import (
    KPConvLayer,
    KPFCNN,
    build_pyramid,
    kernel_point_positions,
    kpconv_op,
)
from seggroup_tpu.ops.knn import ball_query_pair


def test_kernel_points_well_spread():
    kp = kernel_point_positions(15)
    assert kp.shape == (15, 3)
    np.testing.assert_allclose(kp[0], 0, atol=1e-6)  # center point fixed
    d = np.linalg.norm(kp[:, None] - kp[None], axis=-1)
    np.fill_diagonal(d, 1e9)
    assert d.min() > 0.3  # no collapsed pairs
    # reference normalization (kernel_points.py:176-177): mean radius of the
    # moving points == ratio (1.0)
    r = np.linalg.norm(kp[1:], axis=1)
    assert abs(float(r.mean()) - 1.0) < 1e-5
    assert r.max() < 1.6 and r.min() > 0.3


def test_kernel_points_verticals_mode():
    kp = kernel_point_positions(15, fixed="verticals")
    np.testing.assert_allclose(kp[0], 0, atol=1e-6)
    # points 1-2 stay on the z axis (xy gradients zeroed, reference
    # kernel_points.py:124-125)
    np.testing.assert_allclose(kp[1, :2], 0, atol=1e-6)
    np.testing.assert_allclose(kp[2, :2], 0, atol=1e-6)
    # opposite poles (either orientation — the potential is symmetric)
    assert kp[1, 2] * kp[2, 2] < 0


def test_ball_query_pair_oracle(rng):
    ns, nq = 200, 50
    sup = rng.random((ns, 3)).astype(np.float32) * 2
    que = rng.random((nq, 3)).astype(np.float32) * 2
    sb = np.zeros(ns, np.int32)
    qb = np.zeros(nq, np.int32)
    r = 0.3
    nbrs, counts, _ = ball_query_pair(
        jnp.array(sup), jnp.array(sb), jnp.ones(ns, bool),
        jnp.array(que), jnp.array(qb), jnp.ones(nq, bool),
        r, max_neighbors=64, bucket_cap=64,
    )
    nbrs, counts = np.asarray(nbrs), np.asarray(counts)
    for i in range(nq):
        d = ((sup - que[i]) ** 2).sum(-1)
        want = set(np.where(d <= r * r)[0])
        got = set(nbrs[i][nbrs[i] < ns])
        assert got == want
        # shadow slots point at ns
        assert (nbrs[i][counts[i]:] == ns).all()


def test_kpconv_op_center_only(rng):
    """A query whose only neighbor sits exactly at a kernel point position
    must produce exactly that kernel's weight row (influence 1 there)."""
    kp = jnp.asarray(kernel_point_positions(15)) * 0.1
    q = jnp.zeros((1, 3))
    sup = kp[3:4]  # support point at kernel point 3
    nbrs = jnp.array([[0]], jnp.int32)
    feats = jnp.ones((1, 2))
    w = jnp.array(np.random.default_rng(0).normal(size=(15, 2, 4)),
                  jnp.float32)
    out = kpconv_op(q, sup, nbrs, feats, kp, w, extent=0.1)
    # influence of kernel 3 = 1; other kernels ~ max(0, 1-d/extent)
    d = np.linalg.norm(np.asarray(kp) - np.asarray(kp)[3], axis=1)
    infl = np.maximum(0, 1 - d / 0.1)
    want = (infl[:, None, None] * np.asarray(w)).sum((0, 1))
    np.testing.assert_allclose(np.asarray(out)[0], want, rtol=1e-4, atol=1e-5)


def test_pyramid_shapes(rng):
    n = 1024
    pts = rng.random((n, 3)).astype(np.float32) * 4
    batch = (np.arange(n) % 2).astype(np.int32)
    valid = np.ones(n, bool)
    valid[1000:] = False
    pyr = build_pyramid(jnp.array(pts), jnp.array(batch), jnp.array(valid),
                        num_layers=5, dl0=0.08,
                        level_caps=[512, 256, 128, 64])
    assert len(pyr) == 5
    for lv in pyr[1:]:
        assert int(lv.valid.sum()) > 0
    # monotone shrink
    counts = [int(lv.valid.sum()) for lv in pyr]
    assert all(a >= b for a, b in zip(counts, counts[1:]))


@pytest.mark.slow
@pytest.mark.slow
def test_kpfcnn_forward_and_grads(rng):
    n = 1024
    pts = rng.random((n, 3)).astype(np.float32) * 3
    batch = np.zeros(n, np.int32)
    valid = np.ones(n, bool)
    colors = rng.random((n, 3)).astype(np.float32)
    feats = np.concatenate([np.ones((n, 1)), colors], 1).astype(np.float32)

    pyr = build_pyramid(jnp.array(pts), jnp.array(batch), jnp.array(valid),
                        num_layers=5, dl0=0.08,
                        level_caps=[512, 256, 128, 64])
    model = KPFCNN(num_classes=20, first_features_dim=16, dl0=0.08)
    variables = model.init(jax.random.PRNGKey(0), pyr, jnp.array(feats),
                           train=False)
    (logits, regs) = model.apply(variables, pyr, jnp.array(feats), train=False)
    assert logits.shape == (n, 20)
    assert np.isfinite(np.asarray(logits)).all()
    assert np.isfinite(float(regs))

    labels = jnp.array(rng.integers(0, 20, n))
    params = variables["params"]
    stats = variables["batch_stats"]

    def loss_fn(p):
        (lg, rg), _ = model.apply({"params": p, "batch_stats": stats}, pyr,
                                  jnp.array(feats), train=True,
                                  mutable=["batch_stats"])
        lp = jax.nn.log_softmax(lg, -1)
        nll = -jnp.take_along_axis(lp, labels[:, None], 1)[:, 0]
        return jnp.mean(nll) + 0.1 * rg

    grads = jax.grad(loss_fn)(params)
    flat = jax.tree.leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in flat)
    total = sum(float(jnp.sum(jnp.abs(g))) for g in flat)
    assert total > 0


@pytest.mark.slow
def test_kpfcnn_param_count():
    """Full ScanNet config (fdim 64, 15 kernel points) should land near the
    reference's 14.97M params (FAQ.md:46)."""
    n = 256
    rng = np.random.default_rng(0)
    pts = rng.random((n, 3)).astype(np.float32)
    pyr = build_pyramid(jnp.array(pts), jnp.zeros(n, jnp.int32),
                        jnp.ones(n, bool), num_layers=5, dl0=0.04,
                        level_caps=[128, 64, 32, 16])
    feats = jnp.ones((n, 4))
    model = KPFCNN(num_classes=20, first_features_dim=64, dl0=0.04)
    variables = model.init(jax.random.PRNGKey(0), pyr, feats, train=False)
    count = sum(x.size for x in jax.tree.leaves(variables["params"]))
    assert 12e6 < count < 18e6, count


def test_deformable_v2_init_equals_rigid(rng):
    """deformable_v2's offset MLP is zero-initialized, so at init (zero
    offsets) the conv must equal the rigid conv with the same kernel
    (reference convolution_ops.py:548-552)."""
    n, k, c = 256, 8, 16
    pts = jnp.array(rng.normal(size=(n, 3)).astype(np.float32))
    feats = jnp.array(rng.normal(size=(n, c)).astype(np.float32))
    nbrs = jnp.array(rng.integers(0, n, size=(n, k)).astype(np.int32))
    rigid = KPConvLayer(out_channels=12)
    v2 = KPConvLayer(out_channels=12, deformable_v2=True)
    vr = rigid.init(jax.random.PRNGKey(0), pts, pts, nbrs, feats, 0.1)
    vv = v2.init(jax.random.PRNGKey(0), pts, pts, nbrs, feats, 0.1)
    # share the main kernel
    vv = {"params": dict(vv["params"], kernel=vr["params"]["kernel"])}
    out_r, _ = rigid.apply(vr, pts, pts, nbrs, feats, 0.1)
    out_v, _ = v2.apply(vv, pts, pts, nbrs, feats, 0.1,
                        mutable=["intermediates"])[0]
    np.testing.assert_allclose(np.asarray(out_v), np.asarray(out_r),
                               rtol=1e-5, atol=1e-5)


def test_modulated_v2_runs_and_differs(rng):
    n, k, c = 128, 8, 8
    pts = jnp.array(rng.normal(size=(n, 3)).astype(np.float32))
    feats = jnp.array(rng.normal(size=(n, c)).astype(np.float32))
    nbrs = jnp.array(rng.integers(0, n, size=(n, k)).astype(np.int32))
    mod = KPConvLayer(out_channels=8, deformable_v2=True, modulated=True)
    vm = mod.init(jax.random.PRNGKey(0), pts, pts, nbrs, feats, 0.1)
    (out, reg), _ = mod.apply(vm, pts, pts, nbrs, feats, 0.1,
                              mutable=["intermediates"])
    assert np.isfinite(np.asarray(out)).all()
    assert np.isfinite(float(reg))


@pytest.mark.slow
def test_kpcnn_kp_classifier_forward_and_grads(rng):
    """True KPConv-block classifier (reference KPCNN_model.py): masked
    global-average pooling + fc head; grads flow."""
    from seggroup_tpu.models.kpconv import KPCNN, MODELNET_ARCHITECTURE

    n = 1024
    pts = rng.normal(size=(n, 3)).astype(np.float32) * 0.5
    batch = np.zeros(n, np.int32)
    batch[n // 2:] = 1
    valid = np.ones(n, bool)
    valid[-64:] = False
    pyr = build_pyramid(jnp.array(pts), jnp.array(batch), jnp.array(valid),
                        num_layers=5, dl0=0.08,
                        level_caps=[512, 256, 128, 64])
    feats = jnp.array(np.ones((n, 4), np.float32))
    model = KPCNN(num_classes=10, first_features_dim=16, dl0=0.08,
                  num_batches=4)
    variables = jax.jit(lambda r, py, f: model.init(r, py, f, train=False))(
        jax.random.PRNGKey(0), pyr, feats)
    (logits, regs), _ = model.apply(variables, pyr, feats, train=False,
                                    mutable=["intermediates"])
    logits = np.asarray(logits)
    assert logits.shape == (4, 10)
    assert np.isfinite(logits[:2]).all()
    assert (logits[2:] == 0).all()  # absent batch elements masked

    def loss(p):
        (lg, rg), _ = model.apply(
            {"params": p, "batch_stats": variables["batch_stats"]}, pyr,
            feats, train=False, mutable=["intermediates"])
        return jnp.sum(lg ** 2) + rg

    grads = jax.grad(loss)(variables["params"])
    gn = [float(jnp.abs(g).sum()) for g in jax.tree.leaves(grads)]
    assert all(np.isfinite(gn)) and sum(x > 0 for x in gn) > len(gn) * 0.5


def test_calibrate_batch_limit_convergence(rng):
    """Batch-limit calibration (reference calibrate_batches,
    common.py:487-549): greedy packing under the calibrated limit yields
    ~batch_num spheres per batch on average."""
    from seggroup_tpu.models.kpconv import calibrate_batch_limit

    sizes = np.clip(rng.lognormal(np.log(12000), 0.4, size=400), 2000,
                    60000).astype(np.int64)
    batch_num = 6
    lim, cap = calibrate_batch_limit(sizes, batch_num,
                                     rng=np.random.default_rng(1))
    assert cap % 1024 == 0 and cap >= lim
    # simulate packing: draw spheres until cumsum crosses lim
    fits = []
    sim = np.random.default_rng(2)
    for _ in range(300):
        pick = sim.choice(sizes, size=len(sizes), replace=False)
        fits.append(int(np.sum(np.cumsum(pick) < lim)))
    mean_fit = float(np.mean(fits))
    assert batch_num * 0.7 <= mean_fit <= batch_num * 1.3, (lim, mean_fit)


def test_sample_sphere_sizes_counts_neighbors(rng):
    """Sphere-size sampler matches a direct radius count on a known cloud."""
    from seggroup_tpu.models.kpconv import sample_sphere_sizes

    pts = rng.uniform(0, 4, size=(5000, 3)).astype(np.float32)
    sizes = sample_sphere_sizes([pts], in_radius=1.0, samples_per_cloud=10,
                                rng=np.random.default_rng(0))
    assert len(sizes) == 10 and (sizes > 0).all()
    # expected count for r=1 spheres in a 4^3 box of 5000 pts: ~(4/3)pi/64*5000
    # ~ 327, boundary-clipped below; sanity bounds only
    assert sizes.max() < 1500 and sizes.min() > 20
