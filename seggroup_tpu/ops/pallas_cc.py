"""Fused windowed radius-graph connected components (Pallas TPU).

TPU replacement for the reference's ballquery + CPU BFS clustering pair
(pointgroup bfs_cluster.cu:14-90 + bfs_cluster.cpp:27-112) as used by
PointGroup's dual clustering: the neighbor lists were only ever consumed by
the connected-components pass, so this kernel never materializes them.

Why: at 2^19 points the XLA path costs ~14 s for ball_query (element
gathers run at ~140M elem/s on v5e) plus ~12 s for scatter-min label
propagation — 50+ s per training step. This kernel runs the whole
clustering in well under a second by exploiting the same structure as the
windowed sparse conv (sparse/pallas_conv.py):

  1. points are sorted by (batch, cell) linear key with cell = radius
     (auto-escalated to 2x/4x radius when the extent would overflow the
     int32 key space — exactness is cell-size-free, see _prep.grid_at), so
     all in-radius candidates of a TILE of 256 consecutive rows live, for
     each of the 9 (dx,dy) stencil column groups, in ONE short contiguous
     row window (the 3 dz cells of a column are adjacent keys);
  2. per (tile, group) a single 32 KB DMA pulls the window's packed
     support slab — a LANE-MAJOR (8, N) array whose rows are
     [x, y, z, sem, key_hi, key_lo, label, 0] — HBM -> VMEM. Lane-major
     layout keeps the slice 128-aligned (Mosaic tiling) and makes the
     window DMA fully contiguous;
  3. the sweep recomputes the edge mask from geometry on the VPU — exact
     per-axis f32 distances plus an exact two-piece f32 key-delta test
     (key = hi*4096 + lo; products by 4096 and small in-range deltas are
     exact in f32; far deltas only need to stay far) — and takes a masked
     label-min per query row. Key aliasing across cell rows is
     geometrically impossible for grids >= 5 cells/axis (aliased cells are
     >= (dims-3) cells apart, far beyond the radius);
  4. between sweeps XLA does pointer jumping; a while_loop stops at the
     fixpoint.

The resulting components are the EXACT radius graph's (better than the
reference's 1000-neighbor cap, bfs_cluster.cu:20-44, and than our
ball_query's per-cell bucket caps — no truncation at all).

Window / key-range overflow or a tiny grid falls back to the exact XLA
path (ball_query + semantic_connected_components) under the same lax.cond
contract as the windowed conv. Both branches canonicalize labels to the
min ORIGINAL point index per component, so they are interchangeable.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from seggroup_tpu.ops.segment_ops import invert_permutation
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 256
WINDOW = 1024
_PAD_XYZ = 1.0e8
_KEY_SPLIT = 4096.0  # key = hi * 4096 + lo, both exact in f32


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _sweep_kernel(base_ref, off_ref, r2_ref, q_ref, s_ref, out_ref,
                  win, sems):
    """One masked label-min sweep over one tile of TILE sorted rows.

    Slab rows: 0-2 xyz, 3 semantic class, 4 key_hi, 5 key_lo, 6 label."""
    window = win.shape[2]
    tile = q_ref.shape[1]

    def dma(g):
        base = pl.multiple_of(base_ref[pl.program_id(0) % 8, g], 128)
        return pltpu.make_async_copy(
            s_ref.at[:, pl.ds(base, window)], win.at[g], sems.at[g])

    for g in range(9):
        dma(g).start()

    q = q_ref[...]                          # (8, T)
    acc = q[6]                              # (T,) f32 current labels
    big = jnp.float32(3.0e38)
    r2 = r2_ref[0]

    for g in range(9):
        dma(g).wait()
        w = win[g]                          # (8, W)
        d2 = jnp.zeros((tile, window), jnp.float32)
        for c in range(3):
            dc = q[c][:, None] - w[c][None, :]
            d2 = d2 + dc * dc
        delta = ((w[4][None, :] - q[4][:, None]) * _KEY_SPLIT
                 + (w[5][None, :] - q[5][:, None]))
        off = off_ref[g]
        mask = ((delta >= off - 1.0) & (delta <= off + 1.0)
                & (d2 <= r2)
                & (w[3][None, :] == q[3][:, None]))
        cand = jnp.where(mask, w[6][None, :], big)
        acc = jnp.minimum(acc, jnp.min(cand, axis=1))
    out_ref[0, :] = acc


@functools.partial(jax.jit, static_argnames=("tile", "window"))
def _sweep(labels_f, slab, win_base, offs, r2, tile=TILE, window=WINDOW):
    """labels_f (N,) f32 sorted-domain -> one min-sweep result (N,) f32.
    slab: (8, N + window) lane-major support (row 6 overwritten here)."""
    n = labels_f.shape[0]
    n_tiles = n // tile
    slab = slab.at[6].set(
        jnp.concatenate([labels_f, jnp.full((window,), jnp.float32(n))]))
    grid_spec = pl.GridSpec(
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((8, 9), lambda t: (t // 8, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((9,), lambda t: (0,), memory_space=pltpu.SMEM),
            pl.BlockSpec((1,), lambda t: (0,), memory_space=pltpu.SMEM),
            pl.BlockSpec((8, tile), lambda t: (0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, tile), lambda t: (0, t),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((9, 8, window), jnp.float32),
            pltpu.SemaphoreType.DMA((9,)),
        ],
    )
    out = pl.pallas_call(
        _sweep_kernel,
        out_shape=jax.ShapeDtypeStruct((1, n), jnp.float32),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(win_base, offs, r2[None], slab[:, :n], slab)
    return out[0]


def _prep(coords, radius, batch_ids, valid, semantics, tile, window):
    """Sort by (batch, cell) key; build the lane-major slab and per-(tile,
    group) 128-aligned window bases.

    Returns (order, slab (8, N+W), win_base (n_tiles, 9) int32,
    offs (9,) f32, use_window bool scalar)."""
    n = coords.shape[0]
    nb = jnp.max(jnp.where(valid, batch_ids, 0)) + 1

    def grid_at(mul):
        """Cells/dims at cell size mul*radius. Exactness is cell-size-free:
        the sweep re-tests true distances, and any in-radius pair is within
        one cell per axis for ANY cell >= radius, so the 27-stencil always
        covers it. Bigger cells shrink the key space (prodf / mul^3) at the
        price of denser windows (overflow falls back exactly)."""
        cell = jnp.float32(radius) * mul
        cells = jnp.floor(coords / cell).astype(jnp.int32)
        cmin = jnp.min(jnp.where(valid[:, None], cells, 2 ** 30), axis=0)
        cells = cells - cmin + 1
        cmax = jnp.max(jnp.where(valid[:, None], cells, 0), axis=0)
        # invalid rows' cells are garbage after the shift (up to ±2^30 when
        # no valid point bounds an axis); their keys are replaced below, but
        # keep the intermediate arithmetic in-range
        cells = jnp.clip(cells, 0, jnp.maximum(cmax, 1))
        # clamp tiny grids up to the alias-safety floor instead of falling
        # back: the key-delta alias argument needs >= 5 cells/axis (aliased
        # cells are then >= dims-3 >= 2 cells > radius apart); padding empty
        # key space costs nothing, and a DEGENERATE problem (few/no valid
        # points — e.g. PointGroup before the semantic head predicts
        # objects) would otherwise pay the full exact-fallback sweep
        dims = jnp.maximum(cmax + 2, 5)
        # int32 key-range guard (float headroom flags overflow safely)
        prodf = (dims[0].astype(jnp.float32) * dims[1].astype(jnp.float32)
                 * dims[2].astype(jnp.float32) * nb.astype(jnp.float32))
        # the sweep's two-piece f32 key-delta test is only exact near `off`
        # when |off|+2 is exactly representable: bound max|offs| (≈ d1*d2 +
        # d2) under the 2^22 margin the kernel comments assume — prodf alone
        # lets d1*d2 reach 2^24 (extreme aspect ratios) where f32 spacing is
        # 2 and a true dz=±1 edge could fail `delta <= off + 1`
        off_mag = (dims[1].astype(jnp.float32) * dims[2].astype(jnp.float32)
                   + dims[2].astype(jnp.float32))
        ok = ((prodf < jnp.float32(2 ** 30))
              & (off_mag + 2.0 < jnp.float32(2 ** 22)))
        return cells, dims, ok

    # adaptive cell scale: smallest of {1, 2, 4}x radius whose key space
    # fits int32 — huge extents (untrained PointGroup offsets reach tens of
    # meters; outdoor scenes) would otherwise be permanently exiled to the
    # exact fallback
    c1, d1, ok1 = grid_at(1.0)
    c2, d2, ok2 = grid_at(2.0)
    c4, d4, ok4 = grid_at(4.0)
    cells = jnp.where(ok1, c1, jnp.where(ok2, c2, c4))
    dims = jnp.where(ok1, d1, jnp.where(ok2, d2, d4))
    ok_range = ok1 | ok2 | ok4

    key = ((batch_ids * dims[0] + cells[:, 0]) * dims[1]
           + cells[:, 1]) * dims[2] + cells[:, 2]
    key = jnp.where(valid, key, jnp.int32(2 ** 30))
    order = jnp.argsort(key).astype(jnp.int32)
    skey = key[order]

    khi = (skey >> 12).astype(jnp.float32)
    klo = (skey & 4095).astype(jnp.float32)
    rows = [
        jnp.where(valid, coords[:, 0], _PAD_XYZ)[order],
        jnp.where(valid, coords[:, 1], _PAD_XYZ)[order],
        jnp.where(valid, coords[:, 2], _PAD_XYZ)[order],
        jnp.where(valid, semantics.astype(jnp.float32), -3.0)[order],
        khi,
        klo,
        jnp.zeros((n,), jnp.float32),   # labels, set per sweep
        jnp.zeros((n,), jnp.float32),
    ]
    slab = jnp.stack(rows)                                   # (8, N)
    pad = jnp.zeros((8, window), jnp.float32)
    pad = (pad.at[:3].set(_PAD_XYZ).at[3].set(-3.0)
           .at[4].set(jnp.float32(2 ** 19)))                 # far key
    slab = jnp.concatenate([slab, pad], axis=1)              # (8, N+W)

    offs = (
        jnp.array([-1, -1, -1, 0, 0, 0, 1, 1, 1], jnp.int32)
        * (dims[1] * dims[2])
        + jnp.array([-1, 0, 1, -1, 0, 1, -1, 0, 1], jnp.int32) * dims[2]
    )

    n_tiles = n // tile
    sk2 = skey.reshape(n_tiles, tile)
    real = sk2 < 2 ** 30
    # pad filler must be >= any REAL key (keys reach prodf ~ 2^30, not 2^29):
    # a smaller filler collapses the valid/pad boundary tile's t_first and
    # spuriously trips the window-overflow guard on any grid whose keys
    # exceed the filler — which permanently exiled large scenes (e.g.
    # PointGroup's offset-shifted half under train-mode BN at init) to the
    # exact fallback
    t_first = jnp.min(jnp.where(real, sk2, 2 ** 30), axis=1)
    t_last = jnp.max(jnp.where(real, sk2, -1), axis=1)
    lo_key = t_first[:, None] + offs[None, :] - 1            # (n_tiles, 9)
    hi_key = t_last[:, None] + offs[None, :] + 1
    lo = jnp.searchsorted(skey, lo_key, side="left").astype(jnp.int32)
    hi = jnp.searchsorted(skey, hi_key, side="right").astype(jnp.int32)
    base = lo & ~127                       # lane-dim slices are 128-aligned
    overflow = jnp.any((hi - base > window) & (t_last[:, None] >= 0))
    use_window = ok_range & ~overflow
    # |offs| < 2^22 so the f32 SMEM values are exact
    return order, slab, base, offs.astype(jnp.float32), use_window


def _canonicalize(labels, n):
    """Any per-component representative -> min ORIGINAL index member.

    Scatter-free: a per-representative min over member indices is a sorted
    segment-min (TPU serializes the colliding scatter-min this replaces)."""
    from seggroup_tpu.ops.segment_sorted import segment_min
    rep = segment_min(jnp.arange(n, dtype=jnp.int32), labels, n + 1,
                      fill_value=jnp.int32(n))
    lab = rep[jnp.minimum(labels, n)]
    return jnp.where(labels < n, lab, n)


def _cc_loop(order, slab, win_base, offs, r2, valid,
             tile=TILE, window=WINDOW, max_sweeps=64, jumps=2):
    """Sweep-to-fixpoint over prepped inputs -> original-domain canonical
    labels. Kept separate so semantic_radius_cc can place it INSIDE the
    lax.cond branch (an eager operand would make every fallback-taking
    batch pay for the full useless sweep loop too)."""
    n = valid.shape[0]
    s_valid = valid[order]
    init = jnp.where(s_valid, jnp.arange(n, dtype=jnp.int32), n)

    def body(carry):
        lab, _changed, it = carry
        new_f = _sweep(lab.astype(jnp.float32), slab, win_base, offs, r2,
                       tile=tile, window=window)
        new = jnp.minimum(lab, new_f.astype(jnp.int32))
        # hook: every provisional component (rows sharing the OLD label)
        # collectively adopts its members' best discovery this sweep —
        # Shiloach-Vishkin-style hooking turns the O(graph diameter) sweep
        # count into a near-logarithmic one (a discovery propagates to the
        # whole component at once, not one edge-hop per sweep)
        from seggroup_tpu.ops.segment_sorted import segment_min as _smin
        grp = _smin(new, jnp.where(s_valid, lab, -1), n + 1,
                    fill_value=jnp.int32(n))
        new = jnp.minimum(new, grp[jnp.minimum(lab, n)])
        for _ in range(jumps):  # pointer jumping flattens residual chains
            new = jnp.minimum(new, new[jnp.minimum(new, n - 1)])
        new = jnp.where(s_valid, new, jnp.int32(n))
        return new, jnp.any(new != lab), it + 1

    def cond(carry):
        return carry[1] & (carry[2] < max_sweeps)

    lab_s, _, _ = jax.lax.while_loop(cond, body,
                                     (init, jnp.array(True), jnp.int32(0)))
    # sorted-domain rep -> original-domain member index, per original row
    rep_orig = jnp.concatenate(
        [order, jnp.array([n], jnp.int32)])[jnp.minimum(lab_s, n)]
    lab_o = jnp.where(lab_s < n, rep_orig, n)[invert_permutation(order)]
    return _canonicalize(lab_o, n)


def semantic_radius_cc(
    coords: jax.Array,
    radius: float | jax.Array,
    batch_ids: jax.Array,
    valid: jax.Array,
    semantics: jax.Array,
    max_neighbors_fallback: int = 32,
    tile: int = TILE,
    window: int = WINDOW,
    fused_halves: bool = False,
    return_use_window: bool = False,
) -> jax.Array:
    """Connected components of the radius graph restricted to equal
    `semantics`, batch-local, over `valid` points. Returns (N,) int32
    labels = min original point index per component (== N for invalid);
    with return_use_window=True, returns (labels, use_window) where
    use_window is the traced bool selecting the fused windowed kernel over
    the exact XLA fallback (False when the shape precludes the kernel).

    Fast path: the fused windowed sweep kernel above. Fallback (window or
    key-range overflow, tiny grids, or N not a multiple of 8*tile): the
    exact XLA ball_query + semantic_connected_components pair — same
    partition up to the per-cell candidate caps of the fallback's ball
    query.

    fused_halves: set when the input is two equal stacked half-problems
    whose batch ids are even/odd-interleaved (first half 2b, second half
    2b+1 — PointGroup's fused dual clustering; n must be even). The
    windowed kernel handles the doubled id space directly; the FALLBACK
    instead runs the halves separately with the ids renormalized back to b
    (>> 1), so ball_query's int32 (batch*span + cell) key keeps the exact
    single-problem range — the doubled range could otherwise wrap int32 on
    large scenes and silently merge scenes/halves."""
    from seggroup_tpu.ops.cc import semantic_connected_components
    from seggroup_tpu.ops.knn import ball_query_pair_fast

    n = coords.shape[0]

    def one_fallback(c, b, v, s):
        m = c.shape[0]
        # windowed-sorted neighbor lists (ops/knn.py) — the 27-stencil
        # gather formulation ran at ~3 s per 131k-point half on v5e, an
        # order of magnitude slower than the MXU distance-matrix sweep;
        # ball_query_pair_fast carries its own exact fallback, and for CC
        # the windowed path's weaker truncation (global K instead of
        # per-cell bucket caps) only brings the partition CLOSER to exact
        nbrs, _cnt, _ovf = ball_query_pair_fast(
            c, b, v, c, b, v, radius,
            max_neighbors=max_neighbors_fallback)
        # pair variant marks empty slots with index m; mask them
        lab = semantic_connected_components(
            jnp.minimum(nbrs, m - 1), nbrs < m, v, s)
        return _canonicalize(jnp.where(v, lab, m), m)

    if fused_halves:
        assert n % 2 == 0, "fused_halves requires two equal stacked halves"

    def fallback(_):
        if not fused_halves:
            return one_fallback(coords, batch_ids, valid, semantics)
        h = n // 2
        # renormalize 2b / 2b+1 -> b so each half's key range is the
        # single-problem one (the whole point of splitting)
        la = one_fallback(coords[:h], batch_ids[:h] >> 1, valid[:h],
                          semantics[:h])
        lb = one_fallback(coords[h:], batch_ids[h:] >> 1, valid[h:],
                          semantics[h:])
        return jnp.concatenate([jnp.where(la < h, la, n),
                                jnp.where(lb < h, lb + h, n)])

    if n % (8 * tile) != 0:
        out = fallback(None)
        return (out, jnp.array(False)) if return_use_window else out

    # distinct name: `radius` stays the caller's value for the fallback
    # closure above (which may want a static python float)
    radius_f = jnp.float32(radius)
    order, slab, win_base, offs, use_window = _prep(
        coords, radius_f, batch_ids, valid, semantics, tile, window)

    def windowed(_):
        return _cc_loop(order, slab, win_base, offs, radius_f * radius_f,
                        valid, tile=tile, window=window)

    out = jax.lax.cond(use_window, windowed, fallback, None)
    return (out, use_window) if return_use_window else out
