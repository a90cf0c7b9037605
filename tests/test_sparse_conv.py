"""Sparse conv engine vs dense-conv numpy oracles."""

import jax.numpy as jnp
import numpy as np

from seggroup_tpu.sparse.conv import (
    build_subm_rulebook,
    inverse_conv_up,
    kernel_offsets,
    strided_conv_down,
    subm_conv,
)
from seggroup_tpu.sparse.tensor import SparseTensor


def make_sparse(rng, m_cap=256, n=100, cin=8, grid=10, batches=2):
    coords = np.zeros((m_cap, 4), np.int32)
    seen = set()
    rows = []
    while len(rows) < n:
        c = (rng.integers(0, batches), *rng.integers(0, grid, 3))
        if c not in seen:
            seen.add(c)
            rows.append(c)
    coords[:n] = np.array(rows, np.int32)
    feats = np.zeros((m_cap, cin), np.float32)
    feats[:n] = rng.normal(size=(n, cin)).astype(np.float32)
    valid = np.zeros(m_cap, bool)
    valid[:n] = True
    st = SparseTensor(jnp.array(coords), jnp.array(feats), jnp.array(valid),
                      jnp.int32(n))
    return st, coords[:n], feats[:n]


def test_subm_rulebook_and_conv(rng):
    st, coords, feats = make_sparse(rng)
    n, cin, cout, k = len(coords), feats.shape[1], 6, 3
    w = rng.normal(size=(k ** 3, cin, cout)).astype(np.float32) * 0.1

    rb = np.asarray(build_subm_rulebook(st, k))
    offs = kernel_offsets(k)
    cmap = {tuple(c): i for i, c in enumerate(coords)}
    out = np.asarray(subm_conv(st, jnp.array(w), jnp.array(rb), compute_dtype=jnp.float32))

    for i in range(n):
        want = np.zeros(cout, np.float32)
        for kk, off in enumerate(offs):
            q = (coords[i, 0], coords[i, 1] + off[0], coords[i, 2] + off[1],
                 coords[i, 3] + off[2])
            j = cmap.get(q)
            # rulebook agreement
            if j is None:
                assert rb[i, kk] == st.capacity
            else:
                assert rb[i, kk] == j
                want += feats[j] @ w[kk]
        np.testing.assert_allclose(out[i], want, rtol=1e-4, atol=1e-5)
    # padding rows are zero
    assert (out[n:] == 0).all()


def test_strided_down_oracle(rng):
    st, coords, feats = make_sparse(rng)
    n, cin, cout = len(coords), feats.shape[1], 5
    w = rng.normal(size=(8, cin, cout)).astype(np.float32) * 0.1
    st_out, key = strided_conv_down(st, jnp.array(w), cap_out=128)

    want = {}
    for i in range(n):
        b, x, y, z = coords[i]
        o = (b, x // 2, y // 2, z // 2)
        kk = (x % 2) * 4 + (y % 2) * 2 + (z % 2)
        want.setdefault(o, np.zeros(cout, np.float32))
        want[o] += feats[i] @ w[kk]

    assert int(st_out.num) == len(want)
    oc = np.asarray(st_out.coords)
    of = np.asarray(st_out.feats)
    ov = np.asarray(st_out.valid)
    for r in range(int(st_out.num)):
        assert ov[r]
        o = tuple(oc[r])
        np.testing.assert_allclose(of[r], want[o], rtol=1e-4, atol=1e-5)


def test_down_up_roundtrip_sites(rng):
    """Inverse conv must restore exactly the saved fine sites (indice_key
    semantics, reference pointgroup.py:35-38)."""
    st, coords, feats = make_sparse(rng)
    cin, cmid, cout = feats.shape[1], 7, 4
    wd = rng.normal(size=(8, cin, cmid)).astype(np.float32) * 0.1
    wu = rng.normal(size=(8, cmid, cout)).astype(np.float32) * 0.1
    st_dn, key = strided_conv_down(st, jnp.array(wd), cap_out=128)
    st_up = inverse_conv_up(st_dn, jnp.array(wu), key)

    np.testing.assert_array_equal(np.asarray(st_up.coords), np.asarray(st.coords))
    np.testing.assert_array_equal(np.asarray(st_up.valid), np.asarray(st.valid))
    # oracle: fine voxel j reads coarse feats at coords//2 through W[delta_j]
    dn_map = {tuple(c): i for i, c in enumerate(np.asarray(st_dn.coords)[: int(st_dn.num)])}
    dn_feats = np.asarray(st_dn.feats)
    up = np.asarray(st_up.feats)
    for j, c in enumerate(coords):
        b, x, y, z = c
        kk = (x % 2) * 4 + (y % 2) * 2 + (z % 2)
        i = dn_map[(b, x // 2, y // 2, z // 2)]
        np.testing.assert_allclose(up[j], dn_feats[i] @ wu[kk], rtol=1e-4,
                                   atol=1e-5)


def test_subm_conv_grad(rng):
    import jax

    st, coords, feats = make_sparse(rng, n=40, m_cap=64)
    k = 3
    w = jnp.array(rng.normal(size=(k ** 3, 8, 4)).astype(np.float32) * 0.1)
    rb = build_subm_rulebook(st, k)

    def loss(w, f):
        out = subm_conv(st.with_feats(f), w, rb, compute_dtype=jnp.float32)
        return jnp.sum(out ** 2)

    gw, gf = jax.grad(loss, argnums=(0, 1))(w, st.feats)
    assert np.isfinite(np.asarray(gw)).all()
    assert np.isfinite(np.asarray(gf)).all()
    assert float(jnp.abs(gw).sum()) > 0


def test_subm_conv_custom_vjp_matches_autodiff(rng):
    """The symmetric-transpose backward (custom VJP) must equal the gradient
    of a plain gather+einsum implementation."""
    import jax

    from seggroup_tpu.sparse.conv import _subm_apply

    st, coords, feats = make_sparse(rng, n=70, m_cap=128)
    k = 3
    w = jnp.array(rng.normal(size=(k ** 3, 8, 4)).astype(np.float32) * 0.1)
    rb = build_subm_rulebook(st, k)
    dout = jnp.array(rng.normal(size=(128, 4)).astype(np.float32))

    def loss_custom(w, f):
        out = subm_conv(st.with_feats(f), w, rb, compute_dtype=jnp.float32)
        return jnp.sum(out * dout)

    def loss_ref(w, f):
        f = jnp.where(st.valid[:, None], f, 0.0)
        out = _subm_apply(f, w, rb, jnp.float32)
        out = jnp.where(st.valid[:, None], out, 0.0)
        return jnp.sum(out * dout)

    gw1, gf1 = jax.grad(loss_custom, argnums=(0, 1))(w, st.feats)
    gw2, gf2 = jax.grad(loss_ref, argnums=(0, 1))(w, st.feats)
    np.testing.assert_allclose(np.asarray(gw1), np.asarray(gw2), rtol=1e-4,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(gf1), np.asarray(gf2), rtol=1e-4,
                               atol=1e-5)


def test_grouped_rulebook_matches_generic(rng):
    """k=3 grouped z-run builder == generic 27-search builder."""
    from seggroup_tpu.sparse.conv import _build_subm_rulebook_generic

    for n in (1, 37, 100):
        st, _, _ = make_sparse(rng, n=n, m_cap=128, grid=6)
        fast = np.asarray(build_subm_rulebook(st, 3))
        slow = np.asarray(_build_subm_rulebook_generic(st, 3))
        np.testing.assert_array_equal(fast, slow)


def test_subm_conv_bf16_close_to_f32(rng):
    st, coords, feats = make_sparse(rng, n=60, m_cap=128)
    w = jnp.array(rng.normal(size=(27, 8, 4)).astype(np.float32) * 0.1)
    rb = build_subm_rulebook(st, 3)
    full = np.asarray(subm_conv(st, w, rb, compute_dtype=jnp.float32))
    half = np.asarray(subm_conv(st, w, rb))  # bf16 default
    np.testing.assert_allclose(half, full, rtol=3e-2, atol=3e-2)


def test_rulebook_wide_batch_ids_narrow_keys(rng):
    """Batch ids >= 8 overflow the default (14,14) key packing's 3 batch
    bits (keys alias with period 16, silently mixing rows across batches —
    the PointGroup ScoreNet case, where "batch" is a proposal id < 256).
    xy_bits=(5,5) must produce the exact rulebook for small grids."""
    st, coords, feats = make_sparse(rng, m_cap=512, n=300, grid=14,
                                    batches=40)
    rb = np.asarray(build_subm_rulebook(st, 3, xy_bits=(5, 5)))
    offs = kernel_offsets(3)
    cmap = {tuple(c): i for i, c in enumerate(coords)}
    for i in range(len(coords)):
        for kk, off in enumerate(offs):
            q = (coords[i, 0], coords[i, 1] + off[0], coords[i, 2] + off[1],
                 coords[i, 3] + off[2])
            j = cmap.get(q)
            assert rb[i, kk] == (st.capacity if j is None else j), (i, kk)
    # regression: the default packing DOES alias at batch 16 vs 0 — this
    # guards that the test data would catch it (two aliasing batches with
    # coincident coords exist)
    b = coords[:, 0]
    alias_pairs = {(tuple(c[1:]), c[0] % 16) for c in coords}
    assert len(alias_pairs) < len(coords) or (b >= 16).any()
