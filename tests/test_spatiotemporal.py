"""4-D spatio-temporal variants + instance norm + MinkUNetHyper.

Covers the reference's ConvType/NormType zoo (minkowski/models/modules/
common.py:9-60), the STRes* model families (res16unet.py:334-376,
resnet.py:167-219, resunet.py:488-536) and the MinkUNetHyper hypercolumn
head (resunet.py:270-485) on the TPU sparse engine.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from seggroup_tpu.sparse.conv import (build_subm_rulebook,
                                      build_subm_rulebook_offsets,
                                      region_offsets)
from seggroup_tpu.sparse.hashing import pack_keys
from seggroup_tpu.sparse.tensor import SparseTensor


def make_st_input(rng, m_cap=256, n=160, cin=3, grid=12, frames=4, batches=2):
    """(M, 5) spatio-temporal sparse input: batch, x, y, z, t."""
    coords = np.zeros((m_cap, 5), np.int32)
    seen = set()
    rows = []
    while len(rows) < n:
        c = (rng.integers(0, batches), *rng.integers(0, grid, 3),
             rng.integers(0, frames))
        if c not in seen:
            seen.add(c)
            rows.append(c)
    coords[:n] = np.array(rows, np.int32)
    feats = np.zeros((m_cap, cin), np.float32)
    feats[:n] = rng.normal(size=(n, cin)).astype(np.float32)
    valid = np.zeros(m_cap, bool)
    valid[:n] = True
    return SparseTensor(jnp.array(coords), jnp.array(feats), jnp.array(valid),
                        jnp.int32(n))


# ---------------------------------------------------------------- regions

def test_region_offsets_counts():
    # 3-D: cube 27, cross 7; 4-D: spatial cube 27 (dt=0), hybrid 29,
    # tesseract 81, 4-D cross 9 (reference common.py:27-60 region zoo)
    assert region_offsets("hypercube", 3, 3).shape == (27, 3)
    assert region_offsets("hypercross", 3, 3).shape == (7, 3)
    o = region_offsets("spatial_hypercube", 3, 4)
    assert o.shape == (27, 4) and (o[:, 3] == 0).all()
    h = region_offsets("spatial_hypercube_temporal_hypercross", 3, 4)
    assert h.shape == (29, 4)
    # the two extra offsets are the pure-temporal arms (0,0,0,±1)
    t_arms = h[np.abs(h[:, 3]) == 1]
    assert len(t_arms) == 2 and (t_arms[:, :3] == 0).all()
    assert region_offsets("hypercube", 3, 4).shape == (81, 4)


def test_region_offsets_negation_symmetry():
    """The subm custom-VJP transposes the rulebook via offs[K-1-k] == -offs[k];
    every region must be sorted so that holds."""
    for ct, nd in [("hypercube", 3), ("hypercross", 3),
                   ("spatial_hypercube", 4),
                   ("spatial_hypercube_temporal_hypercross", 4),
                   ("hypercube", 4)]:
        offs = region_offsets(ct, 3, nd)
        np.testing.assert_array_equal(offs, -offs[::-1])


def test_pack_keys_5col_unique_and_ordered():
    rng = np.random.default_rng(0)
    seen = set()
    rows = []
    while len(rows) < 300:
        c = (rng.integers(0, 4), *rng.integers(0, 50, 3),
             rng.integers(0, 500))
        if c not in seen:
            seen.add(c)
            rows.append(c)
    coords = jnp.array(np.array(rows, np.int32))
    hi, lo = pack_keys(coords)
    packed = {(int(a), int(b)) for a, b in zip(np.asarray(hi), np.asarray(lo))}
    assert len(packed) == 300  # injective on distinct coords


# ---------------------------------------------------------------- rulebooks

def bruteforce_rulebook(coords, n, offs):
    m = len(coords)
    table = {tuple(c): i for i, c in enumerate(coords[:n].tolist())}
    rb = np.full((m, len(offs)), m, np.int32)
    for i in range(n):
        for k, off in enumerate(offs.tolist()):
            q = tuple((np.array(coords[i]) +
                       np.concatenate([[0], off])).tolist())
            if min(q[1:]) >= 0 and q in table:
                rb[i, k] = table[q]
    return rb


@pytest.mark.parametrize("conv_type", [
    "spatial_hypercube_temporal_hypercross", "hypercube"])
def test_st_rulebook_matches_bruteforce(rng, conv_type):
    st = make_st_input(rng, m_cap=192, n=120, grid=6, frames=3)
    offs = region_offsets(conv_type, 3, 4)
    rb = np.asarray(build_subm_rulebook(st, 3, conv_type=conv_type))
    want = bruteforce_rulebook(np.asarray(st.coords), 120, offs)
    np.testing.assert_array_equal(rb[:120], want[:120])
    assert (rb[120:] == 192).all()


def test_3d_hypercross_rulebook_matches_bruteforce(rng):
    """Explicit-offsets path on plain 3-D coords (HYPERCROSS region)."""
    from tests.test_minkunet import make_sparse_input

    st = make_sparse_input(rng, m_cap=128, n=90, grid=8)
    offs = region_offsets("hypercross", 3, 3)
    rb = np.asarray(build_subm_rulebook_offsets(st, offs))
    want = bruteforce_rulebook(np.asarray(st.coords), 90, offs)
    np.testing.assert_array_equal(rb[:90], want[:90])


def test_downsample_keeps_temporal_column(rng):
    """Stride-2 downsample halves space only (reference space_n_time_m(2,1),
    res16unet.py:48-55): same spatial cell at different t stays distinct."""
    from seggroup_tpu.sparse.conv import downsample_coords

    coords = np.zeros((8, 5), np.int32)
    coords[0] = [0, 2, 2, 2, 0]
    coords[1] = [0, 3, 3, 3, 0]   # same spatial parent as row 0, same t
    coords[2] = [0, 2, 2, 2, 1]   # same spatial parent, different t
    valid = np.zeros(8, bool)
    valid[:3] = True
    st = SparseTensor(jnp.array(coords), jnp.zeros((8, 1)), jnp.array(valid),
                      jnp.int32(3))
    coords_out, valid_out, num_out, out_row, delta = downsample_coords(st, 8)
    assert int(num_out) == 2  # rows 0+1 merge; row 2 is its own site
    out = np.asarray(coords_out)[np.asarray(valid_out)]
    assert {tuple(r) for r in out.tolist()} == {(0, 1, 1, 1, 0),
                                                (0, 1, 1, 1, 1)}
    r = np.asarray(out_row)
    assert r[0] == r[1] != r[2]


# ---------------------------------------------------------------- norms

def test_instance_norm_matches_numpy_oracle(rng):
    """SparseInstanceNorm == per-(scene, channel) standardization over each
    scene's valid voxels (reference MinkowskiInstanceNorm semantics)."""
    from seggroup_tpu.models.minkunet import SparseInstanceNorm

    m, n, c = 96, 70, 5
    feats = rng.normal(size=(m, c)).astype(np.float32)
    batch = rng.integers(0, 3, m).astype(np.int32)
    valid = np.zeros(m, bool)
    valid[:n] = True

    mod = SparseInstanceNorm(max_batches=4)
    vs = mod.init(jax.random.PRNGKey(0), jnp.array(feats), jnp.array(batch),
                  jnp.array(valid))
    out = np.asarray(mod.apply(vs, jnp.array(feats), jnp.array(batch),
                               jnp.array(valid)))

    for b in range(3):
        sel = valid & (batch == b)
        if not sel.any():
            continue
        mu = feats[sel].mean(0)
        var = ((feats[sel] - mu) ** 2).mean(0)
        want = (feats[sel] - mu) / np.sqrt(var + 1e-5)
        np.testing.assert_allclose(out[sel], want, rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------- models

def test_st_res16unet_forward_masks_padding(rng):
    from seggroup_tpu.models import get_model

    st = make_st_input(rng, m_cap=256, n=160)
    model = get_model("STRes16UNet14A", out_channels=8,
                      level_caps=[256, 256, 128, 64, 64])
    variables = model.init(jax.random.PRNGKey(0), st, train=False)
    logits = np.asarray(model.apply(variables, st, train=False))
    assert logits.shape == (256, 8)
    assert np.isfinite(logits[:160]).all()
    assert (logits[160:] == 0).all()


def test_st_hybrid_uses_time_but_3d_reduces_to_cube(rng):
    """On 5-col coords the hybrid block kernel must read the temporal arms:
    perturbing a feature at (x,y,z,t+1) changes the output at (x,y,z,t)."""
    st = make_st_input(rng, m_cap=64, n=2, grid=4, frames=3)
    coords = np.zeros((64, 5), np.int32)
    coords[0] = [0, 1, 1, 1, 0]
    coords[1] = [0, 1, 1, 1, 1]  # temporal neighbor only
    feats = np.zeros((64, 3), np.float32)
    feats[:2] = 1.0
    valid = np.zeros(64, bool)
    valid[:2] = True
    st = SparseTensor(jnp.array(coords), jnp.array(feats), jnp.array(valid),
                      jnp.int32(2))
    rb = np.asarray(build_subm_rulebook(
        st, 3, conv_type="spatial_hypercube_temporal_hypercross"))
    # row 0 sees row 1 through a temporal arm and itself through the center
    assert (rb[0] == 1).sum() == 1
    # the pure-spatial region must NOT see the temporal neighbor
    rb_sp = np.asarray(build_subm_rulebook(
        st, 3, conv_type="spatial_hypercube"))
    assert (rb_sp[0] == 1).sum() == 0


@pytest.mark.slow
def test_st_tesseract_forward_and_grads(rng):
    from seggroup_tpu.models import get_model

    st = make_st_input(rng, m_cap=128, n=80, grid=6, frames=3)
    model = get_model("STResTesseract16UNet18A", out_channels=8,
                      level_caps=[128, 128, 64, 32, 32])
    variables = model.init(jax.random.PRNGKey(0), st, train=False)
    # 81-point block kernels
    assert variables["params"]["block1_0"]["conv1"]["kernel"].shape[0] == 81
    logits = np.asarray(model.apply(variables, st, train=False))
    assert np.isfinite(logits[:80]).all() and (logits[80:] == 0).all()

    def loss(p):
        out, _ = model.apply(
            {"params": p, "batch_stats": variables["batch_stats"]}, st,
            train=True, mutable=["batch_stats"])
        return jnp.sum(out ** 2)

    grads = jax.grad(loss)(variables["params"])
    gn = [float(jnp.abs(g).sum()) for g in jax.tree.leaves(grads)]
    assert all(np.isfinite(gn)) and sum(x > 0 for x in gn) > len(gn) * 0.8


@pytest.mark.slow
def test_minkunet_hyper_forward_and_grads(rng):
    """MinkUNetHyper (resunet.py:270-485): hypercolumn head concatenates
    block5/block6 pool-transposed to full res; INBN variant runs instance
    then batch norm."""
    from tests.test_minkunet import make_sparse_input

    from seggroup_tpu.models import get_model

    st = make_sparse_input(rng, m_cap=128, n=80)
    model = get_model("MinkUNetHyper14INBN", out_channels=8,
                      level_caps=[128, 64, 32, 16])
    variables = model.init(jax.random.PRNGKey(0), st, train=False)
    logits = np.asarray(model.apply(variables, st, train=False))
    assert logits.shape == (128, 8)
    assert np.isfinite(logits[:80]).all() and (logits[80:] == 0).all()

    def loss(p):
        out, _ = model.apply(
            {"params": p, "batch_stats": variables["batch_stats"]}, st,
            train=True, mutable=["batch_stats"])
        return jnp.sum(out ** 2)

    grads = jax.grad(loss)(variables["params"])
    gn = [float(jnp.abs(g).sum()) for g in jax.tree.leaves(grads)]
    assert all(np.isfinite(gn)) and sum(x > 0 for x in gn) > len(gn) * 0.8


def test_pool_transpose_oracle(rng):
    """_pool_transpose: fine site reads coarse feature / child count."""
    from seggroup_tpu.models.minkunet import _pool_transpose

    coarse = SparseTensor(
        jnp.zeros((4, 4), jnp.int32),
        jnp.array([[2.0], [6.0], [1.0], [0.0]]),
        jnp.array([True, True, True, False]), jnp.int32(3))
    rows = jnp.array([0, 0, 1, 1, 1, 2, 4, 4], jnp.int32)
    fine_valid = jnp.array([1, 1, 1, 1, 1, 1, 0, 0], bool)
    out = np.asarray(_pool_transpose(coarse, rows, fine_valid))[:, 0]
    np.testing.assert_allclose(out, [1.0, 1.0, 2.0, 2.0, 2.0, 1.0, 0, 0])


def test_new_registry_names():
    from seggroup_tpu.models import get_model

    assert get_model("STRes16UNet34", out_channels=20).layers[3] == 6
    m = get_model("ResUNet18INBN", out_channels=20)
    assert m.norm_type == "instance_batch"
    t = get_model("STResTesseractUNet18", out_channels=20)
    assert t.block_conv_type == "hypercube"
    r = get_model("STResNet18")
    assert r.block_conv_type == "spatial_hypercube_temporal_hypercross"
    h = get_model("MinkUNetHyper", out_channels=20)
    assert h.layers == (2,) * 6
