"""Gather-GEMM-scatter sparse convolution engine.

One engine replaces three reference native stacks (SURVEY.md §2.6 items 8-9
and the KPConv gather path): spconv's SubMConv3d/SparseConv3d/
SparseInverseConv3d (reference pointgroup/model/pointgroup/pointgroup.py:19-157)
and MinkowskiEngine's generalized sparse conv (reference minkowski models).

Design (TPU-first):
  * rulebooks are built on device from lexsorted coordinate keys
    (sparse/hashing.py) — a (M, K) neighbor-index table per kernel instead of
    spconv's host-built CSR pair lists. For the static training path the
    rulebooks can instead be built ON HOST in C++ (seggroup_tpu/native.py
    subm_rulebook) and fed as step inputs — see sparse/plan.py;
  * the conv itself is ONE gather + ONE dense (M, K*Cin) x (K*Cin, Cout)
    matmul — it lands on the MXU; padding rows are masked;
  * subm_conv carries a custom VJP: because the kernel-offset set is
    symmetric (off[K-1-k] == -off[k] for odd kernels), the data gradient is
    *the same conv* with flipped+transposed weights and the SAME rulebook —
    no (M, K, C) residuals are stored and the backward pass needs no scatter.
    This is what makes batch-8 / 2cm / 2^17-voxel training fit in one v5e
    chip's HBM (without it, autodiff keeps every gathered block: ~18 GB);
  * stride-2 kernel-2 down/up convs exploit the fact that kernel 2 / stride 2
    PARTITIONS fine voxels: down is a segment-sum over out = in//2, up is a
    single gather (the transpose), matching spconv's indice_key reuse
    semantics (pointgroup.py:35-38) by construction (output coords of up are
    exactly the saved finer-level coords).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from seggroup_tpu.ops.segment_ops import invert_permutation, segment_sum
from seggroup_tpu.sparse.hashing import lookup, pack_keys, sort_coords
from seggroup_tpu.sparse.tensor import SparseTensor


def kernel_offsets(kernel_size: int) -> np.ndarray:
    """(K, 3) integer offsets, centered for odd kernels ({-1,0,1} for 3)."""
    r = np.arange(kernel_size) - (kernel_size - 1) // 2
    g = np.stack(np.meshgrid(r, r, r, indexing="ij"), -1).reshape(-1, 3)
    return g.astype(np.int32)


def region_offsets(conv_type: str, kernel_size: int = 3,
                   ndim: int = 3) -> np.ndarray:
    """(K, ndim) kernel-region offsets for the reference's ConvType zoo
    (minkowski/models/modules/common.py:27-60): 'hypercube' (full k^ndim),
    'hypercross' (axis-aligned cross), 'spatial_hypercube' (k^3 spatial,
    dt=0), 'spatial_hypercube_temporal_hypercross' (spatial cube at dt=0
    plus the center at dt=+-1 — ME's HYBRID region for kernel [k,k,k,3]).

    Offsets are sorted lexicographically; any negation-closed set then
    satisfies offs[K-1-k] == -offs[k], which the subm custom VJP requires.
    """
    r = np.arange(kernel_size) - (kernel_size - 1) // 2
    half_t = 1  # temporal kernel 3 (reference space_n_time_m(n, m) uses m=1
    # for strides and the block convs fix temporal extent 3 via HYBRID)
    if conv_type in ("hypercube", "spatio_temporal_hypercube"):
        grids = np.meshgrid(*([r] * ndim), indexing="ij")
        offs = np.stack(grids, -1).reshape(-1, ndim)
    elif conv_type in ("hypercross", "spatio_temporal_hypercross"):
        offs = [np.zeros(ndim, np.int64)]
        for d in range(ndim):
            for s in r[r != 0]:
                o = np.zeros(ndim, np.int64)
                o[d] = s
                offs.append(o)
        offs = np.stack(offs)
    elif conv_type == "spatial_hypercube":
        cube = np.stack(np.meshgrid(r, r, r, indexing="ij"), -1).reshape(-1, 3)
        if ndim == 3:
            offs = cube
        else:
            offs = np.concatenate([cube, np.zeros((len(cube), 1), np.int64)], 1)
    elif conv_type == "spatial_hypercube_temporal_hypercross":
        cube = np.stack(np.meshgrid(r, r, r, indexing="ij"), -1).reshape(-1, 3)
        if ndim == 3:
            offs = cube
        else:
            offs = np.concatenate([cube, np.zeros((len(cube), 1), np.int64)], 1)
            t_arm = []
            for dt in range(-half_t, half_t + 1):
                if dt != 0:
                    t_arm.append([0, 0, 0, dt])
            offs = np.concatenate([offs, np.asarray(t_arm, np.int64)], 0)
    else:
        raise ValueError(f"unknown conv_type {conv_type!r}")
    order = np.lexsort(offs.T[::-1])
    return offs[order].astype(np.int32)


def build_subm_rulebook(st: SparseTensor, kernel_size: int = 3,
                        assume_sorted: bool = False,
                        conv_type: str = "spatial_hypercube",
                        xy_bits: tuple[int, int] = (14, 14)) -> jax.Array:
    """(M, K) neighbor row index per kernel offset; == M where absent.
    Output sites == input sites (submanifold semantics).

    Grouped z-run search: keys are lexsorted by (batch,x,y,z), so the three
    dz in {-1,0,+1} neighbors of a query (dx,dy) column are CONSECUTIVE in
    sorted order — one binary search per (dx,dy) group (8 searches for k=3
    instead of 27) plus three candidate-position probes resolves all of them.
    The center group needs no search at all (self rank +- 1).

    assume_sorted: rows are already in lexicographic (batch,x,y,z) order
    with the valid prefix first (the host voxelizer's contract,
    data/voxel_dataset.py:39-42) — skips the device argsort entirely.

    conv_type selects the kernel region (region_offsets). 5-column
    spatio-temporal coords always take the generic offsets path (the k3
    fast path's consecutive-z-run trick assumes lo == z).
    """
    ndim = st.coords.shape[1] - 1
    if ndim == 3 and kernel_size == 3 and conv_type in (
            "hypercube", "spatial_hypercube",
            "spatial_hypercube_temporal_hypercross"):
        return _build_subm_rulebook_k3(st, assume_sorted, xy_bits)
    if ndim == 3 and conv_type in (
            "hypercube", "spatial_hypercube",
            "spatial_hypercube_temporal_hypercross"):
        return _build_subm_rulebook_generic(st, kernel_size)
    return build_subm_rulebook_offsets(
        st, region_offsets(conv_type, kernel_size, ndim))


def _lower_bound(hi_sorted, lo_sorted, q_hi, q_lo):
    """First sorted position with key >= (q_hi, q_lo); in [0, m]."""
    m = hi_sorted.shape[0]
    steps = max(1, m.bit_length())
    lo_b = jnp.zeros(q_hi.shape, jnp.int32)
    hi_b = jnp.full(q_hi.shape, m, jnp.int32)

    def body(_, carry):
        lo_bound, hi_bound = carry
        mid = (lo_bound + hi_bound) // 2
        mh = hi_sorted[jnp.minimum(mid, m - 1)]
        ml = lo_sorted[jnp.minimum(mid, m - 1)]
        less = (mh < q_hi) | ((mh == q_hi) & (ml < q_lo))
        lo_bound = jnp.where(less, mid + 1, lo_bound)
        hi_bound = jnp.where(less, hi_bound, mid)
        return lo_bound, hi_bound

    lo_b, _ = jax.lax.fori_loop(0, steps, body, (lo_b, hi_b))
    return lo_b


def _k3_cols_joined(st: SparseTensor, hi_s, lo_s, tile: int,
                    xy_bits=(14, 14)):
    """(27, M) rulebook columns for the assume_sorted layout via the windowed
    sorted-join (sparse/merge_join.py). Returns (cols, ok): when ok is False
    (a tile's key window overflowed — adversarial density skew) the caller
    must use the binary-search path instead."""
    from seggroup_tpu.sparse.merge_join import windowed_join3

    m = st.capacity
    yb = xy_bits[1]
    big_k = jnp.int32(jnp.iinfo(jnp.int32).max)
    dxy = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)]
    # per-group queries from the SORTED keys: (hi + c) preserves order; pad
    # rows pin to (BIG, BIG-4) so each group's query stream stays sorted and
    # q_lo + 3 cannot overflow
    q_hi = jnp.stack([jnp.where(st.valid, hi_s + ((dx << yb) + dy), big_k)
                      for dx, dy in dxy])            # (9, M)
    q_lo = jnp.broadcast_to(
        jnp.where(st.valid, lo_s - 1, big_k - 4)[None, :], (9, m))
    pm1, p0, pp1, ok = windowed_join3(
        hi_s, lo_s, q_hi.reshape(-1), q_lo.reshape(-1), tile=tile)
    pm1, p0, pp1 = (p.reshape(9, m) for p in (pm1, p0, pp1))

    cols = []
    x, y, z = st.coords[:, 1], st.coords[:, 2], st.coords[:, 3]
    for gi, (dx, dy) in enumerate(dxy):
        ok_xy = st.valid & (x + dx >= 0) & (y + dy >= 0)
        for pos, dz in ((pm1[gi], -1), (p0[gi], 0), (pp1[gi], 1)):
            cols.append(jnp.where(ok_xy & (z + dz >= 0), pos, m))
    return jnp.stack(cols), ok  # (27, M) in kernel_offsets(3) order


def _build_subm_rulebook_k3(st: SparseTensor,
                            assume_sorted: bool = False,
                            xy_bits=(14, 14)) -> jax.Array:
    m = st.capacity
    hi, lo = pack_keys(st.coords, xy_bits)
    if assume_sorted:
        order = jnp.arange(m, dtype=jnp.int32)
        rank = order
        big_k = jnp.int32(jnp.iinfo(jnp.int32).max)
        hi_s = jnp.where(st.valid, hi, big_k)
        lo_s = jnp.where(st.valid, lo, big_k)
    else:
        order, hi_s, lo_s = sort_coords(st.coords, st.valid, xy_bits)
        rank = invert_permutation(order)
    order_pad = jnp.concatenate([order, jnp.full((1,), m, jnp.int32)])
    big = jnp.int32(jnp.iinfo(jnp.int32).max)
    hi_pad = jnp.concatenate([hi_s, jnp.full((1,), big, jnp.int32)])
    lo_pad = jnp.concatenate([lo_s, jnp.full((1,), big, jnp.int32)])

    def search_path():
        return _k3_cols_searched(st, hi, lo, hi_s, lo_s, order_pad, hi_pad,
                                 lo_pad, rank, xy_bits)

    _tile = 512
    if assume_sorted and m % _tile == 0 and m >= 8 * _tile:
        # fast path: windowed sorted-join (sparse/merge_join.py) — positions
        # ARE row ids in the assume_sorted layout; lax.cond falls back to the
        # binary-search path on window overflow (exactness contract)
        cols_j, ok = _k3_cols_joined(st, hi_s, lo_s, _tile, xy_bits)
        nbr = jax.lax.cond(ok, lambda: cols_j, search_path)
        return nbr.T.astype(jnp.int32)
    return search_path().T.astype(jnp.int32)


def _k3_cols_searched(st, hi, lo, hi_s, lo_s, order_pad, hi_pad, lo_pad,
                      rank, xy_bits=(14, 14)):
    """(27, M) columns via the vectorized binary-search path (the general
    path: works for any row order; the fallback when the windowed join's
    overflow check trips)."""
    m = st.capacity

    def resolve(p0, q_hi):
        """Given p0 = lower_bound(q_hi, lo-1), match dz in {-1,0,+1}.
        Valid keys are strictly increasing, so the (up to) three hits sit at
        consecutive positions starting at p0. Returns (3, M) row indices."""
        cols = []
        cand = [jnp.clip(p0 + t, 0, m) for t in range(3)]
        ch = [hi_pad[c] for c in cand]
        cl = [lo_pad[c] for c in cand]
        for dz in (-1, 0, 1):
            tgt = lo + dz
            row = jnp.full(q_hi.shape, m, jnp.int32)
            for t in range(3):
                hit = (ch[t] == q_hi) & (cl[t] == tgt)
                row = jnp.where((row == m) & hit, order_pad[cand[t]], row)
            ok = st.valid & (st.coords[:, 3] + dz >= 0)
            cols.append(jnp.where(ok, row, m))
        return cols

    cols_by_offset = {}
    # center (dx,dy) group: positions are self rank -1 / self / +1 — no search
    p0c = rank - 1
    c = resolve(p0c, hi)
    for t, dz in enumerate((-1, 0, 1)):
        cols_by_offset[(0, 0, dz)] = c[t]
    # the 8 off-center (dx,dy) groups, one lower_bound each
    dxy = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)
           if (dx, dy) != (0, 0)]

    yb = xy_bits[1]

    def per_group(shift):
        dx, dy = shift[0], shift[1]
        q_hi = hi + (dx << yb) + dy
        p0 = _lower_bound(hi_s, lo_s, q_hi, lo - 1)
        rows = resolve(p0, q_hi)  # list of 3 (M,)
        ok_xy = (st.coords[:, 1] + dx >= 0) & (st.coords[:, 2] + dy >= 0)
        return jnp.stack([jnp.where(ok_xy, r, m) for r in rows])

    grouped = jax.vmap(per_group)(jnp.asarray(dxy, jnp.int32))  # (8, 3, M)
    for gi, (dx, dy) in enumerate(dxy):
        for t, dz in enumerate((-1, 0, 1)):
            cols_by_offset[(dx, dy, dz)] = grouped[gi, t]

    offs = kernel_offsets(3)
    return jnp.stack([cols_by_offset[tuple(o)] for o in offs])  # (27, M)


def _build_subm_rulebook_generic(st: SparseTensor, kernel_size: int) -> jax.Array:
    return build_subm_rulebook_offsets(
        st, kernel_offsets(kernel_size))


def build_subm_rulebook_offsets(st: SparseTensor,
                                offsets: np.ndarray) -> jax.Array:
    """(M, K) rulebook for an explicit (K, ndim) offset list over (M, 1+ndim)
    coords — the path for non-cube kernel regions and the 4-D spatio-temporal
    models (reference ME RegionType.HYPERCROSS/HYBRID kernels)."""
    offs = jnp.asarray(offsets)  # (K, ndim)
    order, hi_s, lo_s = sort_coords(st.coords, st.valid)
    m = st.capacity

    def per_offset(off):
        q = st.coords.at[:, 1:].add(off[None, :])
        in_range = jnp.all(q[:, 1:] >= 0, axis=1)  # negative coords never pack
        q_hi, q_lo = pack_keys(q)
        pos = lookup(hi_s, lo_s, q_hi, q_lo)  # sorted positions or M
        idx = jnp.where(pos < m, order[jnp.minimum(pos, m - 1)], m)
        return jnp.where(st.valid & in_range, idx, m)

    nbr = jax.vmap(per_offset)(offs)  # (K, M)
    return nbr.T.astype(jnp.int32)


# --- submanifold conv with symmetric-transpose custom VJP -------------------

# rows per gather+matmul tile: bounds the transient (chunk, K, Cin) block to
# ~100 MB so train steps fit HBM at million-voxel capacities, while each tile
# is still a big MXU matmul (chunk, K*Cin) x (K*Cin, Cout)
_SUBM_CHUNK = 16384


def _subm_apply(feats, weights, rulebook, compute_dtype):
    """out[i] = sum_k W[k]^T feats[nbr[i,k]]; feats already masked/padded-safe
    (absent neighbors index the zero pad row M). Tiled over rows via lax.map
    so the gathered block never materialises whole."""
    feats_pad = jnp.concatenate(
        [feats.astype(compute_dtype),
         jnp.zeros((1, feats.shape[1]), compute_dtype)], axis=0)
    w = weights.astype(compute_dtype)
    m, k = rulebook.shape

    def tile(rb):
        g = feats_pad[rb]  # (chunk, K, Cin)
        return jnp.einsum("mkc,kco->mo", g, w,
                          preferred_element_type=jnp.float32)

    if m <= _SUBM_CHUNK or m % _SUBM_CHUNK != 0:
        return tile(rulebook)
    out = jax.lax.map(tile, rulebook.reshape(m // _SUBM_CHUNK, _SUBM_CHUNK, k))
    return out.reshape(m, -1)


@partial(jax.custom_vjp, nondiff_argnums=(3,))
def _subm_conv_core(feats, weights, rulebook, compute_dtype):
    return _subm_apply(feats, weights, rulebook, compute_dtype)


def _subm_fwd(feats, weights, rulebook, compute_dtype):
    return _subm_apply(feats, weights, rulebook, compute_dtype), (
        feats, weights, rulebook)


def _subm_bwd(compute_dtype, res, dout):
    feats, weights, rulebook = res
    k = weights.shape[0]
    # data grad: nbr[i,k]=j  <=>  nbr[j,K-1-k]=i (offset set is symmetric for
    # odd kernels), so dfeats = subm_conv(dout, W[::-1] transposed, SAME
    # rulebook) — a gather, not a scatter.
    w_flip = jnp.flip(weights, axis=0).transpose(0, 2, 1)  # (K, Cout, Cin)
    dfeats = _subm_apply(dout, w_flip, rulebook, compute_dtype)
    # weight grad: recompute the gather (rematerialised, never stored),
    # tiled like the forward with a (K, Cin, Cout) f32 accumulator
    feats_pad = jnp.concatenate(
        [feats.astype(compute_dtype),
         jnp.zeros((1, feats.shape[1]), compute_dtype)], axis=0)
    dout_c = dout.astype(compute_dtype)
    m, k = rulebook.shape

    def dw_tile(rb, do):
        g = feats_pad[rb]  # (chunk, K, Cin)
        return jnp.einsum("mkc,mo->kco", g, do,
                          preferred_element_type=jnp.float32)

    if m <= _SUBM_CHUNK or m % _SUBM_CHUNK != 0:
        dw = dw_tile(rulebook, dout_c)
    else:
        n_tiles = m // _SUBM_CHUNK

        def body(acc, args):
            return acc + dw_tile(*args), None

        dw, _ = jax.lax.scan(
            body,
            jnp.zeros(weights.shape, jnp.float32),
            (rulebook.reshape(n_tiles, _SUBM_CHUNK, k),
             dout_c.reshape(n_tiles, _SUBM_CHUNK, -1)),
        )
    return dfeats.astype(feats.dtype), dw.astype(weights.dtype), None


_subm_conv_core.defvjp(_subm_fwd, _subm_bwd)


# --- windowed (Pallas fused gather-GEMM) variant -----------------------------
#
# Same math, but the gather runs as contiguous window DMAs + one-hot MXU
# matmuls (sparse/pallas_conv.py) — ~2-3x the plain path on v5e, which is
# gather-bound at ~2% of HBM bandwidth. `use_window` is a traced scalar from
# the host plan: when the host window planner reported overflow (a neighbor
# that did not fit its window) the lax.cond falls back to the exact global
# gather, so results are ALWAYS exact.


def _win_or_plain(feats, weights, rulebook, rb_win, win_base, use_window,
                  compute_dtype, tile, window):
    from seggroup_tpu.sparse.pallas_conv import subm_conv_windowed

    return jax.lax.cond(
        use_window,
        lambda f, w: subm_conv_windowed(f, w, rb_win, win_base,
                                        compute_dtype=compute_dtype,
                                        tile=tile, window=window),
        lambda f, w: _subm_apply(f, w, rulebook, compute_dtype),
        feats, weights,
    )


@partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8))
def _subm_conv_win_core(feats, weights, rulebook, rb_win, win_base,
                        use_window, compute_dtype, tile, window):
    return _win_or_plain(feats, weights, rulebook, rb_win, win_base,
                         use_window, compute_dtype, tile, window)


def _subm_win_fwd(feats, weights, rulebook, rb_win, win_base, use_window,
                  compute_dtype, tile, window):
    out = _win_or_plain(feats, weights, rulebook, rb_win, win_base,
                        use_window, compute_dtype, tile, window)
    return out, (feats, weights, rulebook, rb_win, win_base, use_window)


def _subm_win_bwd(compute_dtype, tile, window, res, dout):
    from seggroup_tpu.sparse.pallas_conv import subm_dw_windowed

    feats, weights, rulebook, rb_win, win_base, use_window = res
    w_flip = jnp.flip(weights, axis=0).transpose(0, 2, 1)
    dfeats = _win_or_plain(dout, w_flip, rulebook, rb_win, win_base,
                           use_window, compute_dtype, tile, window)

    def dw_win(f, do):
        return subm_dw_windowed(f, do, rb_win, win_base,
                                compute_dtype=compute_dtype, tile=tile,
                                window=window)

    def dw_plain(f, do):
        feats_pad = jnp.concatenate(
            [f.astype(compute_dtype),
             jnp.zeros((1, f.shape[1]), compute_dtype)], axis=0)
        do_c = do.astype(compute_dtype)
        m, k = rulebook.shape
        if m <= _SUBM_CHUNK or m % _SUBM_CHUNK != 0:
            return jnp.einsum("mkc,mo->kco", feats_pad[rulebook], do_c,
                              preferred_element_type=jnp.float32)
        n_tiles = m // _SUBM_CHUNK

        def body(acc, args):
            rb, d = args
            return acc + jnp.einsum("mkc,mo->kco", feats_pad[rb], d,
                                    preferred_element_type=jnp.float32), None

        dw, _ = jax.lax.scan(
            body, jnp.zeros(weights.shape, jnp.float32),
            (rulebook.reshape(n_tiles, _SUBM_CHUNK, k),
             do_c.reshape(n_tiles, _SUBM_CHUNK, -1)))
        return dw

    dw = jax.lax.cond(use_window, dw_win, dw_plain, feats, dout)
    return (dfeats.astype(feats.dtype), dw.astype(weights.dtype), None, None,
            None, None)


_subm_conv_win_core.defvjp(_subm_win_fwd, _subm_win_bwd)


def subm_conv(
    st: SparseTensor, weights: jax.Array, rulebook: jax.Array,
    compute_dtype=jnp.bfloat16, windows: dict | None = None,
) -> jax.Array:
    """weights (K, Cin, Cout); returns (M, Cout) float32. out[i] = sum_k
    W[k]^T feats[nbr[i,k]] over present neighbors.

    The gathered (M, K, Cin) block rides in `compute_dtype` (bf16 by default
    — gathers are byte-bound on TPU and bf16 is MXU-native); accumulation is
    always f32 via preferred_element_type. Gradients flow through a custom
    VJP that stores only (feats, weights, rulebook) — see module docstring.

    `windows` (optional): host-built windowed-gather plan for this level
    (sparse/plan.py: {"rb_win", "win_base", "use_window"}; tile/window sizes
    are the pallas_conv.TILE/WINDOW constants) — routes the gather through
    the Pallas fused kernel."""
    from seggroup_tpu.sparse import pallas_conv

    assert weights.shape[0] % 2 == 1, (
        "subm_conv custom VJP requires an odd (symmetric) kernel")
    feats = jnp.where(st.valid[:, None], st.feats, 0.0)
    if (windows is None or st.capacity % pallas_conv.TILE != 0
            or st.capacity < 8 * pallas_conv.TILE):  # small levels: plain path
        out = _subm_conv_core(feats, weights, rulebook, compute_dtype)
    else:
        out = _subm_conv_win_core(
            feats, weights, rulebook, windows["rb_win"], windows["win_base"],
            windows["use_window"], compute_dtype, pallas_conv.TILE,
            pallas_conv.WINDOW)
    return jnp.where(st.valid[:, None], out, 0.0)


@partial(jax.jit, static_argnames=("cap_out",))
def downsample_coords(st: SparseTensor, cap_out: int):
    """Unique coords//2 (stride-2 output sites) + the per-input output row and
    kernel index. Returns (coords_out (Mo,4), valid_out, num_out,
    out_row (M,), delta (M,))."""
    m = st.capacity
    c = st.coords
    # halve the spatial columns only; a 5th (temporal) column rides through
    # unchanged — the reference's D=4 downsamples use stride [2,2,2,1]
    # (res16unet.py space_n_time_m(2, 1))
    half = jnp.concatenate([c[:, :1], c[:, 1:4] >> 1, c[:, 4:]], axis=1)
    delta = c[:, 1] % 2 * 4 + c[:, 2] % 2 * 2 + c[:, 3] % 2  # in {0..7}

    # compact unique halved coords (same lexsort trick as ops.voxelize)
    invalid = (~st.valid).astype(jnp.int32)
    order = jnp.lexsort(
        tuple(half[:, j] for j in range(half.shape[1] - 1, -1, -1))
        + (invalid,)
    ).astype(jnp.int32)
    s_half = half[order]
    s_ok = st.valid[order]
    prev_same = jnp.all(s_half[1:] == s_half[:-1], axis=1)
    firsts = jnp.concatenate([jnp.array([True]), ~prev_same]) & s_ok
    compact_sorted = jnp.cumsum(firsts.astype(jnp.int32)) - 1
    num_out = jnp.sum(firsts.astype(jnp.int32))
    row_sorted = jnp.where(
        s_ok & (compact_sorted < cap_out), compact_sorted, cap_out
    )
    out_row = row_sorted[invert_permutation(order)]

    coords_out = segment_sum(
        jnp.where(firsts[:, None], s_half, 0), jnp.where(firsts, row_sorted, -1),
        cap_out,
    ).astype(jnp.int32)
    valid_out = jnp.arange(cap_out) < num_out
    return coords_out, valid_out, num_out, out_row, delta.astype(jnp.int32)


def _strided_apply(st, weights, cap_out, coords_out, valid_out, num_out,
                   out_row, delta, compute_dtype):
    """contrib[i] = feats[i] @ W[delta_i] via an (M,8,Cout) batched matmul +
    one-hot select, then ONE segment-sum scatter (scatters are the expensive
    op on TPU; the 8x matmul FLOPs are noise next to the UNet blocks)."""
    feats = jnp.where(st.valid[:, None], st.feats, 0.0).astype(compute_dtype)
    all_out = jnp.einsum("mc,kco->mko", feats, weights.astype(compute_dtype),
                         preferred_element_type=jnp.float32)  # (M, 8, Cout)
    oh = jax.nn.one_hot(delta, 8, dtype=jnp.float32)
    contrib = jnp.einsum("mko,mk->mo", all_out, oh)
    out = segment_sum(contrib, jnp.where(st.valid, out_row, -1), cap_out)
    st_out = SparseTensor(coords_out, out, valid_out, num_out)
    key = {"out_row": out_row, "delta": delta, "fine_coords": st.coords,
           "fine_valid": st.valid, "fine_num": st.num}
    return st_out, key


def strided_conv_down(
    st: SparseTensor, weights: jax.Array, cap_out: int,
    compute_dtype=jnp.float32,
) -> tuple[SparseTensor, dict]:
    """Kernel-2 stride-2 sparse conv (spconv SparseConv3d(k=2,s=2) /
    MinkowskiConvolution(k=2,s=2)). weights (8, Cin, Cout). Also returns the
    `indice_key` dict needed by the matching inverse conv."""
    coords_out, valid_out, num_out, out_row, delta = downsample_coords(
        st, cap_out
    )
    return _strided_apply(st, weights, cap_out, coords_out, valid_out,
                          num_out, out_row, delta, compute_dtype)


def strided_conv_down_planned(
    st: SparseTensor, weights: jax.Array, down_plan: dict,
    compute_dtype=jnp.float32,
) -> tuple[SparseTensor, dict]:
    """strided_conv_down with a host-precomputed down map (sparse/plan.py):
    skips the on-device lexsort/compaction entirely."""
    coords_out = down_plan["coords"]
    num_out = down_plan["num"]
    cap_out = coords_out.shape[0]
    valid_out = jnp.arange(cap_out) < num_out
    return _strided_apply(st, weights, cap_out, coords_out, valid_out,
                          num_out, down_plan["out_row"], down_plan["delta"],
                          compute_dtype)


def inverse_conv_up(
    st_coarse: SparseTensor, weights: jax.Array, indice_key: dict,
    compute_dtype=jnp.float32,
) -> SparseTensor:
    """Kernel-2 stride-2 inverse/transposed conv back to the saved fine sites
    (spconv SparseInverseConv3d / MinkowskiConvolutionTranspose(k=2,s=2)).
    weights (8, Cin, Cout). Each fine voxel reads exactly one coarse voxel.

    Implemented as 8 masked (Mf,Cin)x(Cin,Cout) matmuls — NOT a per-row
    weights[delta] gather, which materialises an (Mf,Cin,Cout) tensor (6 GB
    at 2^17 x 96 x 96) and OOMs the backward pass."""
    out_row = indice_key["out_row"]  # (Mf,) coarse row per fine voxel
    delta = indice_key["delta"]
    fine_valid = indice_key["fine_valid"]
    cap_c = st_coarse.capacity
    feats = jnp.where(st_coarse.valid[:, None], st_coarse.feats, 0.0)
    feats_pad = jnp.concatenate([feats, jnp.zeros((1, feats.shape[1]))])
    g = feats_pad[jnp.minimum(out_row, cap_c)].astype(compute_dtype)  # (Mf, Cin)
    w = weights.astype(compute_dtype)
    out = jnp.zeros((g.shape[0], weights.shape[2]), jnp.float32)
    for kk in range(8):
        sel = (delta == kk)
        term = jnp.dot(jnp.where(sel[:, None], g, 0), w[kk],
                       preferred_element_type=jnp.float32)
        out = out + term
    out = jnp.where((fine_valid & (out_row < cap_c))[:, None], out, 0.0)
    return SparseTensor(
        indice_key["fine_coords"], out, fine_valid, indice_key["fine_num"]
    )


def sparse_batch_norm_stats(feats: jax.Array, valid: jax.Array):
    """Masked mean/var over valid voxels (for flax BN with padding)."""
    m = valid.astype(feats.dtype)[:, None]
    cnt = jnp.maximum(jnp.sum(m), 1.0)
    mean = jnp.sum(feats * m, axis=0) / cnt
    var = jnp.sum(jnp.square(feats - mean) * m, axis=0) / cnt
    return mean, var


def global_pool(st: SparseTensor, num_batches: int, mode: str = "mean"):
    """Per-scene pooling (MinkowskiGlobalPooling analog)."""
    ids = jnp.where(st.valid, st.coords[:, 0], num_batches)
    if mode == "mean":
        from seggroup_tpu.ops.segment_ops import segment_mean

        return segment_mean(st.feats, ids, num_batches)
    from seggroup_tpu.ops.segment_ops import segment_max

    return segment_max(st.feats, ids, num_batches)
