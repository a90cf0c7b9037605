"""Host-built UNet plans == device-built rulebooks/down-maps (bit parity)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from seggroup_tpu import native
from seggroup_tpu.sparse.conv import build_subm_rulebook, downsample_coords
from seggroup_tpu.sparse.plan import build_unet_plan
from seggroup_tpu.sparse.tensor import SparseTensor
from tests.test_sparse_conv import make_sparse


def test_host_rulebook_matches_device(rng):
    st, coords, _ = make_sparse(rng, n=90, m_cap=256, grid=8)
    dev = np.asarray(build_subm_rulebook(st, 3))
    host = native.subm_rulebook3(np.asarray(st.coords), int(st.num), 256)
    np.testing.assert_array_equal(host, dev)


def test_host_downsample_matches_device(rng):
    st, coords, _ = make_sparse(rng, n=90, m_cap=256, grid=8)
    d_coords, d_valid, d_num, d_row, d_delta = (
        np.asarray(x) for x in downsample_coords(st, 128))
    h_coords, h_num, h_row, h_delta = native.downsample_plan(
        np.asarray(st.coords), int(st.num), 128)
    assert h_num == int(d_num)
    np.testing.assert_array_equal(h_coords[:h_num], d_coords[:h_num])
    # rows/deltas only meaningful for valid inputs
    v = np.asarray(st.valid)
    np.testing.assert_array_equal(h_row[v], d_row[v])
    np.testing.assert_array_equal(h_delta[v], d_delta[v])


def test_unet_plan_end_to_end_parity(rng):
    """MinkUNet(plan=host_plan) output == MinkUNet(plan=None) output."""
    import jax

    from seggroup_tpu.models.minkunet import make_minkunet

    st, _, _ = make_sparse(rng, n=200, m_cap=512, cin=3, grid=16)
    caps = [512, 256, 128, 64, 64]
    model = make_minkunet("Res16UNet14A", out_channels=5, level_caps=caps)
    variables = model.init(jax.random.PRNGKey(0), st, train=False)

    plan_np = build_unet_plan(np.asarray(st.coords), int(st.num), caps)
    plan = jax.tree.map(jnp.asarray, plan_np)

    out_dev = np.asarray(model.apply(variables, st, train=False))
    out_plan = np.asarray(model.apply(variables, st, train=False, plan=plan))
    # windowed Pallas convs sum groups in a different order: tiny float noise
    np.testing.assert_allclose(out_plan, out_dev, rtol=1e-5, atol=1e-6)

    # without windows the plan path is bit-identical to the device path
    plan_nw = {k: v for k, v in plan.items() if k != "windows"}
    out_plan_nw = np.asarray(model.apply(variables, st, train=False,
                                         plan=plan_nw))
    np.testing.assert_array_equal(out_plan_nw, out_dev)


@pytest.mark.slow
def test_pointgroup_plan_end_to_end_parity(rng):
    """PointGroup(plan=7-level host plan) == PointGroup(plan=None), bit-exact
    without windows (VERDICT round-1 item 2: the 7-level UBlock must consume
    host plans instead of rebuilding rulebooks on device every step)."""
    import jax

    from seggroup_tpu.models.pointgroup import PointGroup

    st, _, _ = make_sparse(rng, n=200, m_cap=512, cin=6, grid=16)
    caps = [512 >> i for i in range(7)]
    npt = 256
    coords = rng.uniform(0, 3, size=(npt, 3)).astype(np.float32)
    p2v = rng.integers(0, 200, size=npt).astype(np.int32)
    bids = np.zeros(npt, np.int32)
    pvalid = np.ones(npt, bool)
    model = PointGroup(classes=8, m=8, max_proposals_per_source=16,
                       score_cap=128, level_caps=caps)
    variables = model.init(
        jax.random.PRNGKey(0), st, jnp.asarray(p2v), jnp.asarray(coords),
        jnp.asarray(bids), jnp.asarray(pvalid), do_clustering=True,
        train=False, jitter_rng=jax.random.PRNGKey(1))

    plan_np = build_unet_plan(np.asarray(st.coords), int(st.num), caps)
    plan = jax.tree.map(jnp.asarray, plan_np)
    plan_nw = {k: v for k, v in plan.items() if k != "windows"}

    def fwd(plan_arg):
        return model.apply(
            variables, st, jnp.asarray(p2v), jnp.asarray(coords),
            jnp.asarray(bids), jnp.asarray(pvalid), do_clustering=True,
            train=False, jitter_rng=jax.random.PRNGKey(1), plan=plan_arg)

    out_dev = fwd(None)
    out_plan = fwd(plan_nw)
    for a, b in zip(out_dev, out_plan):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # windowed path: same up to group summation order
    out_win = fwd(plan)
    np.testing.assert_allclose(np.asarray(out_win.semantic_scores),
                               np.asarray(out_dev.semantic_scores),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.slow
@pytest.mark.parametrize("cin,cout", [(8, 6), (48, 40), (96, 70)])
def test_windowed_conv_matches_plain(rng, cin, cout):
    """Pallas windowed gather (interpret mode on CPU) == plain gather, fwd
    and both gradients, including absent neighbors and window fallback.
    cin 8/48/96 cover the lane-pack factors 4/2/1 (pallas_conv._pack_shift)."""
    import jax

    from seggroup_tpu.sparse import pallas_conv
    from seggroup_tpu.sparse.conv import _subm_apply, subm_conv

    m = 8 * pallas_conv.TILE
    base = np.arange(m)[:, None]
    rb = np.clip(base + rng.integers(-40, 40, size=(m, 27)), 0, m - 1)
    rb = np.where(rng.random((m, 27)) < 0.3, m, rb).astype(np.int32)
    win_base, rb_win, ovf = native.subm_windows(
        rb, pallas_conv.TILE, pallas_conv.WINDOW)
    assert ovf == 0
    feats = rng.normal(size=(m, cin)).astype(np.float32)
    w = (rng.normal(size=(27, cin, cout)) * 0.1).astype(np.float32)

    st = SparseTensor(jnp.zeros((m, 4), jnp.int32), jnp.asarray(feats),
                      jnp.ones((m,), bool), jnp.int32(m))
    windows = {"rb_win": jnp.asarray(rb_win), "win_base": jnp.asarray(win_base),
               "use_window": jnp.asarray(True)}
    rbj, wj = jnp.asarray(rb), jnp.asarray(w)
    dout = jnp.asarray(rng.normal(size=(m, cout)).astype(np.float32))

    def loss_win(w, f):
        return jnp.sum(subm_conv(st.with_feats(f), w, rbj,
                                 compute_dtype=jnp.float32,
                                 windows=windows) * dout)

    def loss_plain(w, f):
        return jnp.sum(subm_conv(st.with_feats(f), w, rbj,
                                 compute_dtype=jnp.float32) * dout)

    out_w = subm_conv(st, wj, rbj, compute_dtype=jnp.float32, windows=windows)
    out_p = subm_conv(st, wj, rbj, compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(out_w), np.asarray(out_p),
                               rtol=1e-5, atol=1e-5)
    gw1, gf1 = jax.grad(loss_win, argnums=(0, 1))(wj, st.feats)
    gw2, gf2 = jax.grad(loss_plain, argnums=(0, 1))(wj, st.feats)
    np.testing.assert_allclose(np.asarray(gw1), np.asarray(gw2), rtol=1e-4,
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(gf1), np.asarray(gf2), rtol=1e-4,
                               atol=1e-4)

    # overflow fallback: use_window False routes through the plain path
    windows_off = dict(windows, use_window=jnp.asarray(False))
    out_f = subm_conv(st, wj, rbj, compute_dtype=jnp.float32,
                      windows=windows_off)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_p),
                               rtol=1e-6, atol=1e-6)


def test_prefetcher_order_and_errors():
    from seggroup_tpu.utils.prefetch import HostPrefetcher

    pf = HostPrefetcher(lambda step: step * step, depth=3, workers=2)
    got = [next(pf) for _ in range(10)]
    assert got == [i * i for i in range(10)]
    pf.close()

    def boom(step):
        if step == 2:
            raise ValueError("boom")
        return step

    pf = HostPrefetcher(boom, depth=1, workers=1)
    assert next(pf) == 0
    assert next(pf) == 1
    try:
        next(pf)
        raise AssertionError("expected ValueError")
    except ValueError:
        pass
    finally:
        pf.close()


def _sorted_voxels(rng, cap, n, grid, batches=2):
    """Unique (b,x,y,z) voxels in lexicographic order, valid prefix first,
    zero padding — the host voxelizer's output contract."""
    seen = set()
    rows = []
    while len(rows) < n:
        c = (int(rng.integers(0, batches)),) + tuple(
            int(v) for v in rng.integers(0, grid, 3))
        if c not in seen:
            seen.add(c)
            rows.append(c)
    rows.sort()
    coords = np.zeros((cap, 4), np.int32)
    coords[:n] = np.asarray(rows, np.int32)
    return coords


def test_device_plan_matches_host_plan(rng):
    """build_unet_plan_device == build_unet_plan bit-for-bit: rulebooks,
    down maps, Pallas windows and the use_window flags (the minimal-transfer
    training path must be exactly the host-plan program)."""
    from seggroup_tpu.sparse.device_plan import build_unet_plan_device
    from seggroup_tpu.sparse.pallas_conv import TILE

    cap = 8 * TILE  # big enough that level 0 gets a Pallas window plan
    n = cap - 117
    coords = _sorted_voxels(rng, cap, n, grid=40)
    caps = (cap, cap // 2, cap // 4, cap // 8, cap // 8)

    host = build_unet_plan(coords, n, list(caps))
    dev = jax.tree_util.tree_map(
        np.asarray,
        build_unet_plan_device(jnp.asarray(coords), jnp.int32(n), caps))

    for lvl, (h, d) in enumerate(zip(host["rulebooks"], dev["rulebooks"])):
        np.testing.assert_array_equal(h, d, err_msg=f"rulebook level {lvl}")
    for lvl, (h, d) in enumerate(zip(host["down"], dev["down"])):
        assert int(h["num"]) == int(d["num"])
        np.testing.assert_array_equal(h["coords"], d["coords"])
        np.testing.assert_array_equal(h["delta"], d["delta"])
        np.testing.assert_array_equal(h["out_row"], d["out_row"])
    assert len(host["windows"]) == len(dev["windows"])
    for lvl, (h, d) in enumerate(zip(host["windows"], dev["windows"])):
        assert (h is None) == (d is None), f"windows level {lvl}"
        if h is None:
            continue
        assert bool(h["use_window"]) == bool(d["use_window"])
        np.testing.assert_array_equal(h["win_base"], d["win_base"])
        np.testing.assert_array_equal(h["rb_win"], d["rb_win"])


def test_windows_device_saturated_capacity(rng):
    """Windows parity when num == capacity (no padding rows): the fully
    saturated case a real 2^19 batch hits when scenes overflow the budget.

    Regression context: on TPU v5e the previous build_windows_device
    formulation — reshape(M, 27) -> (n_tiles, tile, 9, 3) + min(axis=(1,3))
    over the big 4-D array — MISCOMPILED for the last (tile, group) element
    at M=2^19 (XLA tail-tile bug: out-of-bounds garbage in the reduce,
    verified with an isolated reshape+slice repro on real hardware). The
    production code now uses 2-D/3-D shapes only; windows stay bit-equal to
    native.subm_windows. CPU executes both formulations correctly, so this
    test guards the *contract* (and the TPU bench re-checks on hardware)."""
    from seggroup_tpu.sparse.conv import build_subm_rulebook
    from seggroup_tpu.sparse.device_plan import build_windows_device
    from seggroup_tpu.sparse.pallas_conv import TILE, WINDOW

    cap = 8 * TILE
    coords = _sorted_voxels(rng, cap, cap, grid=40)  # num == capacity
    st = SparseTensor(jnp.asarray(coords), jnp.zeros((cap, 1)),
                      jnp.ones((cap,), bool), jnp.int32(cap))
    rb = np.asarray(build_subm_rulebook(st, 3, assume_sorted=True))
    h_base, h_rb_win, h_ovf = native.subm_windows(rb, TILE, WINDOW)
    dev = jax.tree_util.tree_map(
        np.asarray,
        jax.jit(lambda r: build_windows_device(r, TILE, WINDOW))(
            jnp.asarray(rb)))
    np.testing.assert_array_equal(h_base, dev["win_base"])
    np.testing.assert_array_equal(h_rb_win, dev["rb_win"])
    assert bool(dev["use_window"]) == (h_ovf == 0)


def test_device_plan_window_levels_structure(rng):
    """window_levels gates which levels carry Pallas window plans (None
    entries keep the pytree structure host/device identical)."""
    from seggroup_tpu.sparse.device_plan import build_unet_plan_device
    from seggroup_tpu.sparse.pallas_conv import TILE

    cap = 8 * TILE
    coords = _sorted_voxels(rng, cap, cap - 31, grid=40)
    caps = (cap, cap // 2, cap // 4)
    dev = build_unet_plan_device(jnp.asarray(coords), jnp.int32(cap - 31),
                                 caps, window_levels=0)
    assert all(w is None for w in dev["windows"])
    host = build_unet_plan(coords, cap - 31, list(caps), window_levels=0)
    assert all(w is None for w in host["windows"])


def test_pack_unpack_roundtrip_and_packed_forward(rng):
    """pack_voxel_batch -> unpack_voxel_batch roundtrips the batch (coords and
    labels exactly, feats at f16 precision), and a forward pass with the
    device-built plan from the unpacked tensors matches the host-plan path
    (the minimal-transfer training pipeline)."""
    from seggroup_tpu.data.voxel_dataset import VoxelBatch
    from seggroup_tpu.models.minkunet import make_minkunet
    from seggroup_tpu.sparse.device_plan import (build_unet_plan_device,
                                                 pack_voxel_batch,
                                                 unpack_voxel_batch)

    cap = 256
    n = 211
    coords = np.zeros((cap, 4), np.int32)
    rows = sorted({(int(b), int(x), int(y), int(z))
                   for b, x, y, z in zip(rng.integers(0, 2, 500),
                                         rng.integers(0, 9, 500),
                                         rng.integers(0, 9, 500),
                                         rng.integers(0, 9, 500))})[:n]
    n = len(rows)
    coords[:n] = np.asarray(rows, np.int32)
    feats = np.zeros((cap, 3), np.float32)
    feats[:n] = rng.normal(size=(n, 3)).astype(np.float32)
    labels = np.full((cap,), 255, np.int32)
    labels[:n] = rng.integers(0, 20, n)
    valid = np.arange(cap) < n
    vb = VoxelBatch(coords, feats, labels, valid, np.int32(n), [])

    packed = pack_voxel_batch(vb)
    st, lab = unpack_voxel_batch(*jax.tree.map(jnp.asarray, packed))
    np.testing.assert_array_equal(np.asarray(st.coords), coords)
    np.testing.assert_array_equal(np.asarray(lab), labels)
    np.testing.assert_array_equal(np.asarray(st.valid), valid)
    np.testing.assert_allclose(np.asarray(st.feats), feats,
                               rtol=1e-3, atol=1e-3)

    caps = (cap, cap // 2, cap // 4, cap // 8, cap // 8)
    model = make_minkunet("Res16UNet14A", out_channels=20,
                          level_caps=list(caps))
    variables = model.init(jax.random.PRNGKey(0), st, train=False)

    host_plan = build_unet_plan(coords, n, list(caps))
    st_f32 = SparseTensor(jnp.asarray(coords), jnp.asarray(st.feats),
                          jnp.asarray(valid), jnp.int32(n))
    ref = model.apply(variables, st_f32, train=False,
                      plan=jax.tree.map(jnp.asarray, host_plan))

    @jax.jit
    def packed_fwd(c16, f16, l8, num):
        s, _ = unpack_voxel_batch(c16, f16, l8, num)
        plan = build_unet_plan_device(s.coords, s.num, caps)
        return model.apply(variables, s, train=False, plan=plan)

    got = packed_fwd(*jax.tree.map(jnp.asarray, packed))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("cin,jit_lo,jit_hi", [(96, -40, 40), (128, -10, 10)])
def test_chunked_windowed_conv_matches_full(rng, cin, jit_lo, jit_hi):
    """subm_conv_windowed_chunked == subm_conv_windowed (interpret mode).

    jitter +-40 makes 64-row chunk spans exceed the 128-row slice on many
    chunks (forces the gated exact-repair pass); +-10 keeps every chunk
    narrow (pure fast path). Both must be exact."""
    from seggroup_tpu.sparse import pallas_conv

    cout = 72
    m = 8 * pallas_conv.TILE
    base = np.arange(m)[:, None]
    rb = np.clip(base + rng.integers(jit_lo, jit_hi, size=(m, 27)), 0, m - 1)
    rb = np.where(rng.random((m, 27)) < 0.3, m, rb).astype(np.int32)
    win_base, rb_win, ovf = native.subm_windows(
        rb, pallas_conv.TILE, pallas_conv.WINDOW)
    assert ovf == 0
    feats = jnp.asarray(rng.normal(size=(m, cin)).astype(np.float32))
    w = jnp.asarray((rng.normal(size=(27, cin, cout)) * 0.1)
                    .astype(np.float32))
    rb_win = jnp.asarray(rb_win)
    win_base = jnp.asarray(win_base)

    # repair coverage guard: the wide-jitter case must actually have
    # over-span chunks (else the test silently stops exercising the repair)
    words, left = pallas_conv._chunk_plan(
        rb_win, m // pallas_conv.TILE, pallas_conv.TILE, pallas_conv.WINDOW)
    if jit_hi - jit_lo > 40:
        assert int(jnp.count_nonzero(left)) > 0

    full = pallas_conv.subm_conv_windowed(feats, w, rb_win, win_base)
    chunked = pallas_conv.subm_conv_windowed_chunked(feats, w, rb_win,
                                                     win_base)
    np.testing.assert_allclose(np.asarray(chunked), np.asarray(full),
                               rtol=1e-5, atol=1e-5)
    # narrower chunk/slice parametrizations (the roofline A/B knobs) must be
    # exact too — the wide-jitter case pushes many chunks through repair
    for chunk, cslice in [(64, 64), (32, 64)]:
        got = pallas_conv.subm_conv_windowed_chunked(
            feats, w, rb_win, win_base, chunk=chunk, cslice=cslice)
        np.testing.assert_allclose(np.asarray(got), np.asarray(full),
                                   rtol=1e-5, atol=1e-5,
                                   err_msg=f"chunk={chunk} cslice={cslice}")
