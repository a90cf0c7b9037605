"""Neighbor search, TPU-style.

Replaces three reference native/GPU paths:
  * dense brute-force kNN over small point sets (reference seggroup/model.py:30-36,
    the DGCNN `knn`) -> `knn_brute` / `masked_knn`, formulated as a -2*x@x^T
    Gram matmul so the MXU does the work;
  * per-cluster kNN over the full 150k-point scene (reference
    seggroup/model.py:512-522 `get_knn`, a host loop over clusters) ->
    `cluster_knn`, which sorts points by cluster id so each cluster is a
    contiguous block and runs a fixed-window blocked top-k over the sorted
    layout (block-diagonal structure means the window, not N, bounds the work);
  * fixed-radius neighbor lists (reference
    pointgroup/lib/pointgroup_ops/src/bfs_cluster/bfs_cluster.cu:14-90
    `ballquery_batch_p`) -> `ball_query`, built on a device-side uniform-grid
    hash (sort by cell key + searchsorted) with a static 27-cell candidate
    stencil instead of an atomic-append CUDA kernel. Neighbor counts are capped
    at a static K (the reference caps at 1000 and retries on overflow,
    pointgroup_ops.py:135-142; we keep a fixed cap and report overflow — the
    flag covers both K-slot truncation and stencil cells denser than
    bucket_cap, so callers can calibrate caps from data like the reference's
    calibrate_neighbors, kpconv/datasets/common.py:551-656).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from seggroup_tpu.ops.segment_ops import invert_permutation

__all__ = [
    "pairwise_sqdist",
    "knn_brute",
    "masked_knn",
    "cluster_knn",
    "ball_query",
    "ball_query_pair",
    "ball_query_pair_windowed",
    "ball_query_pair_fast",
    "grid_hash",
    "morton3d",
]


def morton3d(points: jax.Array, valid: jax.Array | None = None,
             bits: int = 10) -> jax.Array:
    """Morton (Z-order) code of 3-D points, (N,) int32. Points are quantized
    to `bits` per axis over their (valid-)bounding box; bit interleaving via
    the standard parallel-prefix spread. Used to make sorted-position windows
    spatially local (cluster_knn / cluster_pointclouds): consecutive Morton
    ranks are spatial neighbors, so a position window over a Morton-sorted
    cluster covers a compact region instead of an arbitrary member subset."""
    assert bits * 3 <= 31
    if valid is None:
        lo = jnp.min(points, axis=0)
        hi = jnp.max(points, axis=0)
    else:
        big = jnp.float32(3e38)
        lo = jnp.min(jnp.where(valid[:, None], points, big), axis=0)
        hi = jnp.max(jnp.where(valid[:, None], points, -big), axis=0)
    scale = (2.0 ** bits - 1.0) / jnp.maximum(hi - lo, 1e-9)
    q = jnp.clip((points - lo) * scale, 0, 2.0 ** bits - 1).astype(jnp.int32)

    def spread(x):
        # 10-bit -> every 3rd bit (magic-number bit spreading)
        x = (x | (x << 16)) & 0x030000FF
        x = (x | (x << 8)) & 0x0300F00F
        x = (x | (x << 4)) & 0x030C30C3
        x = (x | (x << 2)) & 0x09249249
        return x

    return (spread(q[:, 0]) | (spread(q[:, 1]) << 1)
            | (spread(q[:, 2]) << 2)).astype(jnp.int32)


def pairwise_sqdist(x: jax.Array, y: jax.Array) -> jax.Array:
    """Squared euclidean distances, (..., N, D) x (..., M, D) -> (..., N, M).

    Uses the |x|^2 - 2<x,y> + |y|^2 expansion so the cross term is a single
    MXU matmul (same algebra as reference seggroup/model.py:31-33).

    precision=HIGHEST is load-bearing: TPU's DEFAULT matmul precision runs
    f32 inputs through one bf16 MXU pass, whose absolute error on the cross
    term is O(|x||y| * 2^-8) — ~1.0 for meter-scale scene coords (measured
    on v5e), swamping centimeter-scale radius/neighbor comparisons. HIGHEST
    (bf16x6) restores ~f32 accuracy (measured 5e-5) at trivial cost here
    (D=3 contractions are negligible FLOPs next to the downstream top-k)."""
    xx = jnp.sum(x * x, axis=-1, keepdims=True)
    yy = jnp.sum(y * y, axis=-1, keepdims=True)
    cross = jnp.einsum("...nd,...md->...nm", x, y,
                       preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)
    d = xx - 2.0 * cross + jnp.swapaxes(yy, -1, -2)
    return jnp.maximum(d, 0.0)


def knn_brute(points: jax.Array, k: int) -> jax.Array:
    """kNN indices over small batched point sets: (B, P, D) -> (B, P, k).
    Includes self (distance 0), matching reference model.py:35."""
    d = pairwise_sqdist(points, points)
    _, idx = jax.lax.top_k(-d, k)
    return idx.astype(jnp.int32)


def masked_knn(points: jax.Array, valid: jax.Array, k: int) -> jax.Array:
    """kNN with per-point validity: invalid points are never neighbors, and
    rows with < k valid candidates repeat the self index."""
    d = pairwise_sqdist(points, points)
    big = jnp.float32(1e30)
    d = jnp.where(valid[..., None, :], d, big)
    neg_d, idx = jax.lax.top_k(-d, k)
    self_idx = jnp.broadcast_to(
        jnp.arange(points.shape[-2], dtype=jnp.int32), idx.shape[:-1]
    )[..., None]
    idx = jnp.where(neg_d <= -big, self_idx, idx)
    return idx.astype(jnp.int32)


# ---------------------------------------------------------------------------
# cluster-restricted kNN over a full scene
# ---------------------------------------------------------------------------


def _exact_topk_neg(d: jax.Array, k: int, chunk: int | None) -> tuple[jax.Array, jax.Array]:
    """top_k(-d, k) with identical results to the flat call (values AND
    tie-breaking), optionally via a hierarchical two-level reduction.

    With `chunk`, the (R, W) matrix is split into W/chunk column chunks;
    each chunk's top-k is taken, then the final top-k over the merged
    (R, n_chunks*k) candidates. Exact: every global top-k element is a
    top-k element of its own chunk (fewer than k elements precede it
    globally, so fewer precede it in-chunk). Tie-breaking matches the flat
    call: lax.top_k orders equal values by ascending index, chunks partition
    the index space in ascending order, and within a chunk equal values get
    candidate positions in ascending index order — so 'ascending candidate
    position' == 'ascending original index' among equal values.

    Measured on v5e (scripts/bench_topk.py): at W=9216/k=20 the flat top_k
    is 3.78 ms/1024-row block and the best two-level split only 3.63 ms —
    XLA's top_k is near-flat in W here, so the default stays None (flat);
    the knob is kept for wider windows where the split may pay."""
    if chunk is None or d.shape[-1] <= chunk:
        return jax.lax.top_k(-d, k)
    r, w = d.shape
    n_chunks = -(-w // chunk)
    if w % chunk:
        pad = n_chunks * chunk - w
        d = jnp.concatenate([d, jnp.full((r, pad), jnp.float32(3e38))], axis=1)
    dc = d.reshape(r, n_chunks, chunk)
    negc, idxc = jax.lax.top_k(-dc, k)  # (r, n_chunks, k)
    base = (jnp.arange(n_chunks, dtype=jnp.int32) * chunk)[None, :, None]
    cand_idx = (idxc.astype(jnp.int32) + base).reshape(r, n_chunks * k)
    cand_neg = negc.reshape(r, n_chunks * k)
    neg, sel = jax.lax.top_k(cand_neg, k)
    return neg, jnp.take_along_axis(cand_idx, sel, axis=1)


def _iter_min_topk(d: jax.Array, k: int) -> tuple[jax.Array, jax.Array]:
    """Exact top_k(-d, k) via k rounds of (min, argmin, mask) — identical
    values AND tie order to lax.top_k (argmin takes the first minimum, and
    masking one column per round yields equal values in ascending column
    order, which is exactly top_k's ordering among equals).

    Why: XLA's top_k lowers to a PartialSort whose cost is near-flat in k and
    heavy per element (measured 3.8 ms per (1024, 9216) f32 block on v5e —
    ~84x the pure HBM-traffic floor). k rounds of fused min+argmin+mask are
    plain VPU passes: measured ~3x faster at k=20, and the win grows as k
    shrinks. Used by cluster_knn (the stage-1 kNN bound, reference get_knn
    model.py:512-522)."""
    r, w = d.shape
    col = jax.lax.broadcasted_iota(jnp.int32, (r, w), 1)
    big = jnp.float32(3e38)

    def round_body(i, carry):
        d_cur, vals, idxs = carry
        m = jnp.min(d_cur, axis=1)
        win = d_cur == m[:, None]
        j = jnp.min(jnp.where(win, col, w), axis=1).astype(jnp.int32)
        d_cur = jnp.where(col == j[:, None], big, d_cur)
        vals = vals.at[:, i].set(-m)
        idxs = idxs.at[:, i].set(j)
        return d_cur, vals, idxs

    _, vals, idxs = jax.lax.fori_loop(
        0, k, round_body,
        (d, jnp.zeros((r, k), d.dtype), jnp.zeros((r, k), jnp.int32)))
    return vals, idxs


@partial(jax.jit, static_argnames=("k", "row_block", "col_block", "window",
                                   "approx", "topk_chunk", "topk_method",
                                   "small_window"))
def cluster_knn(
    points: jax.Array,
    cluster_ids: jax.Array,
    k: int = 20,
    row_block: int = 1024,
    col_block: int = 1024,
    window: int = 16384,
    approx: bool = False,
    valid: jax.Array | None = None,
    topk_chunk: int | None = None,
    topk_method: str = "iter_min",
    small_window: int | None = None,
) -> jax.Array:
    """Per-point kNN restricted to points sharing `cluster_ids` (self included).

    points:      (N, D) float32; N must be a multiple of row_block (pad first).
    cluster_ids: (N,) int32; use a large sentinel (> any real id) for padding
                 points so they sort to the end and never match real clusters.
    window:      static cap on the sorted-candidate window per row block;
                 clusters larger than `window` get approximate kNN over the
                 window. Controls the compute budget: work is O(N * window)
                 instead of O(N^2). Points are Morton-ordered within each
                 cluster and the window is centered on the row block, so the
                 truncated candidate set is the rows' spatial NEIGHBORHOOD,
                 not an arbitrary member subset (measured: <2% neighbor-
                 distance inflation at 2x over-window,
                 tests/test_approx_semantics.py; an arbitrary-order window
                 inflates ~24%).

    Returns (N, k) int32 indices in the ORIGINAL point order. Rows whose
    cluster has < k members repeat the self index (deviation from reference
    get_knn which zero-fills, model.py:513 — zero-fill aliases point 0, which we
    deliberately do not reproduce).

    `valid` (optional, (N,) bool) masks padding rows out of the Morton
    bounding box — garbage pad coordinates would otherwise blow up the
    quantization range and collapse real points into few Morton cells,
    destroying the spatial locality the centered window relies on.

    `small_window`: tiered fast path. Stage-1 clusters average a few hundred
    points while `window` must budget for the largest (reference get_knn is
    per-cluster, model.py:512-522) — so most row blocks' true candidate span
    (first row's cluster start to last row's cluster end) is far under the
    window. Each block checks its span with two scalar searchsorteds and
    takes a `small_window` slice when everything fits (lax.cond inside the
    sequential lax.map — a real branch, not a select). Bit-exact: when the
    small window covers every row's whole cluster, the masked candidate set,
    its column order, and the d values (length-3 contraction, no reduction-
    order freedom) are identical to the big window's. None = auto (window//4
    when window >= 4096); 0 disables."""
    N, D = points.shape
    assert N % row_block == 0, "pad N to a multiple of row_block"
    if small_window is None:
        small_window = window // 4 if window >= 4096 else 0
    small_window = 0 if small_window >= window else small_window

    # two-key stable sort: cluster id major, Morton code minor
    m_order = jnp.argsort(morton3d(points, valid), stable=True).astype(jnp.int32)
    order = m_order[
        jnp.argsort(cluster_ids[m_order], stable=True).astype(jnp.int32)
    ]
    s_pts = points[order]
    s_cid = cluster_ids[order]

    n_row_blocks = N // row_block
    big = jnp.float32(1e30)
    # full candidate window per row block: the block's rows plus up to
    # `window` sorted positions (a cluster is contiguous after the sort)
    w = row_block + window

    # pad the sorted layout so windows never need clamping (clamped windows
    # would overlap and feed duplicate candidates into the top-k)
    s_pts = jnp.concatenate([s_pts, jnp.zeros((w, D), s_pts.dtype)], axis=0)
    s_cid = jnp.concatenate(
        [s_cid, jnp.full((w,), -0x7FFFFFFF, s_cid.dtype)], axis=0
    )

    def do_row_block(b):
        r0 = b * row_block
        rows = jax.lax.dynamic_slice(s_pts, (r0, 0), (row_block, D))
        rows_cid = jax.lax.dynamic_slice(s_cid, (r0,), (row_block,))
        # window: centered on the row block, clamped to the first row's
        # cluster start (Morton order makes the window a spatial
        # neighborhood of the block's rows)
        c0 = jnp.searchsorted(
            s_cid[:N], rows_cid[0], side="left"
        ).astype(jnp.int32)

        def topk_block(w0, width):
            cols = jax.lax.dynamic_slice(s_pts, (w0, 0), (width, D))
            cols_cid = jax.lax.dynamic_slice(s_cid, (w0,), (width,))
            # one MXU matmul + one top-k over the whole window (measured ~3x
            # faster than a col-block scan with running-merge top-ks on v5e)
            d = pairwise_sqdist(rows, cols)  # (row_block, width)
            same = rows_cid[:, None] == cols_cid[None, :]
            d = jnp.where(same, d, big)
            if approx:
                # TPU-native approximate top-k (lax.approx_max_k): may
                # miss/duplicate a tail neighbor — opt-in fast path, NOT used
                # when reference parity matters
                neg_d, bi = jax.lax.approx_max_k(-d, k, recall_target=0.95)
            elif topk_method == "iter_min":
                # exact k-round min extraction — identical values and tie
                # order to lax.top_k, ~3x faster at k=20 on v5e
                # (see _iter_min_topk)
                neg_d, bi = _iter_min_topk(d, k)
            else:
                # exact, hierarchical (identical values AND tie-breaks to the
                # flat lax.top_k — see _exact_topk_neg)
                neg_d, bi = _exact_topk_neg(d, k, topk_chunk)
            best_i = (bi + w0).astype(jnp.int32)
            # rows with < k same-cluster candidates: fall back to self
            self_sorted = (r0 + jnp.arange(row_block, dtype=jnp.int32))[:, None]
            return jnp.where(neg_d <= -big, self_sorted, best_i)

        def big_branch(_):
            w0 = jnp.maximum(c0, jnp.int32(r0) - jnp.int32(window // 2))
            return topk_block(w0, w)

        if not small_window:
            return big_branch(None)

        # tiered fast path: if every row's whole cluster fits in the small
        # window, the small slice is bit-identical to the big one (superset
        # candidates are all masked out) at a fraction of the top-k cost.
        # Left coverage must be exact too: the small tier only fires when its
        # centered start clamps to c0 (otherwise a cluster extending far
        # before the block would lose left candidates the big window keeps)
        c_end = jnp.searchsorted(
            s_cid[:N], rows_cid[-1], side="right"
        ).astype(jnp.int32)
        w0s = jnp.maximum(c0, jnp.int32(r0) - jnp.int32(small_window // 2))
        fits = (w0s == c0) & (
            (c_end - c0) <= jnp.int32(row_block + small_window))
        return jax.lax.cond(
            fits,
            lambda _: topk_block(w0s, row_block + small_window),
            big_branch, None)

    knn_sorted = jax.lax.map(do_row_block, jnp.arange(n_row_blocks))
    knn_sorted = knn_sorted.reshape(N, k)
    # map sorted positions -> original ids, and rows back to original order
    knn_orig = order[knn_sorted]
    return knn_orig[invert_permutation(order)]


# ---------------------------------------------------------------------------
# uniform-grid hashing + fixed-radius neighbor lists
# ---------------------------------------------------------------------------


def grid_hash(coords: jax.Array, cell_size: float) -> jax.Array:
    """Quantize (N, 3) coords to int cell coords. Caller offsets to >= 0."""
    return jnp.floor(coords / cell_size).astype(jnp.int32)


def _cell_key(cells: jax.Array, dims: jax.Array) -> jax.Array:
    """Row-major linear key for 3D integer cells (cells assumed >= 0)."""
    return (cells[..., 0] * dims[1] + cells[..., 1]) * dims[2] + cells[..., 2]


@partial(jax.jit, static_argnames=("max_neighbors", "bucket_cap"))
def ball_query_pair(
    support: jax.Array,
    support_batch: jax.Array,
    support_valid: jax.Array,
    queries: jax.Array,
    query_batch: jax.Array,
    query_valid: jax.Array,
    radius: float | jax.Array,
    max_neighbors: int = 64,
    bucket_cap: int = 16,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Fixed-radius neighbors of `queries` among `support` (two point sets;
    the KPConv 'pools' neighborhoods, reference tf_batch_neighbors.cpp:8-120).
    Returns (neighbors (Nq, K) into support — == Ns for empty slots, counts,
    overflow). Empty slots point at support row Ns (a shadow row; callers pad
    features with a zero row, exactly the reference's shadow-point scheme,
    convolution_ops.py:190-194)."""
    ns = support.shape[0]
    nq = queries.shape[0]
    K = max_neighbors
    radius = jnp.float32(radius)
    cell = radius

    s_cells = grid_hash(support, cell)
    q_cells = grid_hash(queries, cell)
    cmin = jnp.minimum(
        jnp.min(jnp.where(support_valid[:, None], s_cells, 2**30), axis=0),
        jnp.min(jnp.where(query_valid[:, None], q_cells, 2**30), axis=0),
    )
    s_cells = s_cells - cmin + 1
    q_cells = q_cells - cmin + 1
    cmax = jnp.max(jnp.where(support_valid[:, None], s_cells, 0), axis=0)
    dims = cmax + 2

    span = dims[0] * dims[1] * dims[2]
    s_key = _cell_key(s_cells, dims) + support_batch.astype(jnp.int32) * span
    s_key = jnp.where(support_valid, s_key, jnp.iinfo(jnp.int32).max)
    order = jnp.argsort(s_key).astype(jnp.int32)
    s_key_sorted = s_key[order]

    offsets = jnp.stack(
        jnp.meshgrid(
            jnp.arange(-1, 2), jnp.arange(-1, 2), jnp.arange(-1, 2), indexing="ij"
        ),
        axis=-1,
    ).reshape(27, 3)

    # flat (Nq, 27*cap) candidate layout (see ball_query: the per-cell vmap
    # gathers with minor dim `cap`, which TPU tiling pads 16 -> 128 lanes)
    base_key = _cell_key(q_cells, dims) + query_batch.astype(jnp.int32) * span
    off_key = (offsets[:, 0] * dims[1] + offsets[:, 1]) * dims[2] + offsets[:, 2]
    nb_key = base_key[:, None] + off_key[None, :]  # (Nq, 27)
    start = jnp.searchsorted(s_key_sorted, nb_key, side="left")
    stop = jnp.searchsorted(s_key_sorted, nb_key, side="right")
    # true cell occupancy: candidates beyond bucket_cap are never gathered
    # and must still trip the overflow flag (they may be in-radius)
    bucket_overflow = jnp.any((stop - start) > bucket_cap, axis=1) & query_valid
    slots_raw = (start[:, :, None] + jnp.arange(bucket_cap)[None, None, :]
                 ).reshape(nq, 27 * bucket_cap)
    # the end-clamp would alias past-the-end slots onto row ns-1, whose key
    # EQUALS nb_key whenever the stencil includes the globally-last cell —
    # duplicating that support row (only observable with zero padding rows,
    # since padding's intmax key otherwise sits at ns-1)
    slots = jnp.minimum(slots_raw, ns - 1)
    nb_key_flat = jnp.broadcast_to(
        nb_key[:, :, None], (nq, 27, bucket_cap)).reshape(nq, 27 * bucket_cap)
    cand_ok = (s_key_sorted[slots] == nb_key_flat) & (slots_raw < ns)
    cand_idx = order[slots]

    # per-axis gathered differences (see ball_query: a fused (Nq, 27*cap, 3)
    # gather pads its trailing dim 3 -> 128 lanes under TPU tiling)
    d = jnp.zeros(cand_idx.shape, jnp.float32)
    for c in range(3):
        dc = support[:, c][cand_idx] - queries[:, c, None]
        d = d + dc * dc
    in_ball = (cand_ok & (d <= radius * radius) & query_valid[:, None]
               & support_valid[cand_idx])
    big = jnp.float32(1e30)
    d = jnp.where(in_ball, d, big)
    neg_d, sel = jax.lax.top_k(-d, K)
    nbrs = jnp.take_along_axis(cand_idx, sel, axis=1).astype(jnp.int32)
    got = neg_d > -big
    counts = jnp.sum(got, axis=1).astype(jnp.int32)
    nbrs = jnp.where(got, nbrs, jnp.int32(ns))  # shadow index
    overflow = (jnp.sum(in_ball, axis=1).astype(jnp.int32) > K) | bucket_overflow
    return nbrs, counts, overflow


@partial(jax.jit, static_argnames=("max_neighbors", "tile", "window"))
def ball_query_pair_windowed(
    support: jax.Array,
    support_batch: jax.Array,
    support_valid: jax.Array,
    queries: jax.Array,
    query_batch: jax.Array,
    query_valid: jax.Array,
    radius: float | jax.Array,
    max_neighbors: int = 32,
    tile: int = 256,
    window: int = 4096,
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Windowed-sorted formulation of ball_query_pair — same results, no
    random-row gathers.

    ball_query_pair's cost on TPU is its (Nq, 27*cap) candidate gathers and
    its 27-key searchsorted: both lower to random scalar-row fetches at well
    under 1 GB/s effective (measured r3: 2.8 s of a 4.0 s level-0 KPConv
    query at 131k points). Here queries are processed in CELL-KEY-SORTED
    order, so each tile of `tile` queries' whole 27-cell stencil lies in ONE
    contiguous range of the (sorted) support rows: one scalar searchsorted
    pair per tile locates it, one dynamic_slice pulls a (window, .) slab,
    and a (tile, window) MXU distance matrix + radius/batch masks + the
    k-round min-extraction replace all per-candidate bookkeeping. Exact by
    the stencil-containment argument (cell == radius: every in-radius
    support is inside the 27-cell key range, which the tile window covers;
    out-of-stencil window rows fail the distance test).

    Returns (neighbors (Nq,K) into support == Ns for empty, counts,
    overflow, window_overflow_any). `window_overflow_any` is a traced scalar
    — True when some tile's stencil range exceeded `window` (adversarial
    density skew); the caller must then fall back to the exact
    ball_query_pair (see ball_query_pair_fast)."""
    ns = support.shape[0]
    nq = queries.shape[0]
    K = max_neighbors
    radius = jnp.float32(radius)
    cell = radius
    big_key = jnp.iinfo(jnp.int32).max

    s_cells = grid_hash(support, cell)
    q_cells = grid_hash(queries, cell)
    cmin = jnp.minimum(
        jnp.min(jnp.where(support_valid[:, None], s_cells, 2**30), axis=0),
        jnp.min(jnp.where(query_valid[:, None], q_cells, 2**30), axis=0),
    )
    s_cells = s_cells - cmin + 1
    q_cells = q_cells - cmin + 1
    cmax = jnp.maximum(
        jnp.max(jnp.where(support_valid[:, None], s_cells, 0), axis=0),
        jnp.max(jnp.where(query_valid[:, None], q_cells, 0), axis=0),
    )
    dims = cmax + 2
    span = dims[0] * dims[1] * dims[2]
    # stencil key extremes: off_key(dx,dy,dz) = (dx*d1 + dy)*d2 + dz
    off_max = (dims[1] + 1) * dims[2] + 1
    off_min = -off_max
    # int32 key-space guard: keys are cell_key + batch*span; on huge
    # extent/radius ratios (e.g. untrained PointGroup offsets spanning tens
    # of meters at cm radii) dims-product × num_batches can exceed 2^31 and
    # wrap, scrambling the sorted order the range-containment exactness
    # relies on. Detect in f32 and fold into window_overflow_any so
    # ball_query_pair_fast falls back to the exact bucket path (whose key
    # use is equality-only, hence wrap-consistent).
    num_batches = jnp.maximum(
        jnp.max(jnp.where(support_valid,
                          support_batch.astype(jnp.int32), 0)),
        jnp.max(jnp.where(query_valid, query_batch.astype(jnp.int32), 0)),
    ) + 1
    prodf = (dims[0].astype(jnp.float32) * dims[1].astype(jnp.float32)
             * dims[2].astype(jnp.float32) * num_batches.astype(jnp.float32))
    key_space_overflow = prodf >= jnp.float32(2 ** 31)

    s_key = _cell_key(s_cells, dims) + support_batch.astype(jnp.int32) * span
    s_key = jnp.where(support_valid, s_key, big_key)
    q_key = _cell_key(q_cells, dims) + query_batch.astype(jnp.int32) * span
    q_key = jnp.where(query_valid, q_key, big_key)

    order_s = jnp.argsort(s_key).astype(jnp.int32)
    sk = s_key[order_s]
    # sorted + window-padded support columns (pad rows: key MAX, far coords)
    pad_xyz = jnp.full((window, 3), jnp.float32(3e38))
    sxyz = jnp.concatenate([support[order_s], pad_xyz])
    sb = jnp.concatenate(
        [support_batch[order_s].astype(jnp.int32),
         jnp.full((window,), -1, jnp.int32)])
    skp = jnp.concatenate([sk, jnp.full((window,), big_key, jnp.int32)])
    ord_pad = jnp.concatenate(
        [order_s, jnp.full((window,), ns, jnp.int32)])

    order_q = jnp.argsort(q_key, stable=True).astype(jnp.int32)
    nq_pad = -(-nq // tile) * tile
    qpad = nq_pad - nq
    qk = jnp.concatenate([q_key[order_q], jnp.full((qpad,), big_key,
                                                   jnp.int32)])
    qxyz = jnp.concatenate([queries[order_q], jnp.zeros((qpad, 3))])
    qb = jnp.concatenate([query_batch[order_q].astype(jnp.int32),
                          jnp.full((qpad,), -2, jnp.int32)])
    qv = jnp.concatenate([query_valid[order_q], jnp.zeros((qpad,), bool)])

    big = jnp.float32(1e30)

    def do_tile(t):
        q0 = t * tile
        qk_t = jax.lax.dynamic_slice(qk, (q0,), (tile,))
        qxyz_t = jax.lax.dynamic_slice(qxyz, (q0, 0), (tile, 3))
        qb_t = jax.lax.dynamic_slice(qb, (q0,), (tile,))
        qv_t = jax.lax.dynamic_slice(qv, (q0,), (tile,))
        real = qk_t != big_key
        lo_key = qk_t[0] + off_min  # sorted tile: first is min
        hi_key = jnp.max(jnp.where(real, qk_t, -(2**30))) + off_max
        w0 = jnp.searchsorted(sk, lo_key, side="left").astype(jnp.int32)
        w_end = jnp.searchsorted(sk, hi_key, side="right").astype(jnp.int32)
        ovf_t = (w_end - w0) > window

        win_xyz = jax.lax.dynamic_slice(sxyz, (w0, 0), (window, 3))
        win_key = jax.lax.dynamic_slice(skp, (w0,), (window,))
        win_b = jax.lax.dynamic_slice(sb, (w0,), (window,))
        # per-axis differences, NOT the Gram-expansion matmul: bit-matches
        # the exact ball_query_pair's formulation (knn.py:373-376), and VPU
        # f32 subtract/square has none of the MXU bf16-pass cross-term error
        # that broke radius tests at meter-scale coords (measured ~1.0
        # absolute on v5e before this change — 178/200 wrong counts)
        d = jnp.zeros((tile, window), jnp.float32)
        for c in range(3):
            dc = qxyz_t[:, c][:, None] - win_xyz[:, c][None, :]
            d = d + dc * dc
        ok = ((win_key[None, :] != big_key)
              & (qb_t[:, None] == win_b[None, :])
              & qv_t[:, None] & (d <= radius * radius))
        d = jnp.where(ok, d, big)
        neg_d, sel = _iter_min_topk(d, K)
        got = neg_d > -big
        orig = jax.lax.dynamic_slice(ord_pad, (w0,), (window,))[sel]
        nbrs = jnp.where(got, orig, jnp.int32(ns))
        counts = jnp.sum(got, axis=1).astype(jnp.int32)
        over = ((jnp.sum(ok, axis=1) > K) | ovf_t) & qv_t
        return nbrs, counts, over, ovf_t

    nbrs, counts, over, ovf = jax.lax.map(
        do_tile, jnp.arange(nq_pad // tile, dtype=jnp.int32))
    nbrs = nbrs.reshape(nq_pad, K)[:nq]
    counts = counts.reshape(nq_pad)[:nq]
    over = over.reshape(nq_pad)[:nq]
    # rows are in sorted-query order (pad tiles are the tail); one inverse
    # gather restores the original order
    inv = invert_permutation(order_q)
    return nbrs[inv], counts[inv], over[inv], jnp.any(ovf) | key_space_overflow


def ball_query_pair_fast(
    support, support_batch, support_valid, queries, query_batch, query_valid,
    radius, max_neighbors: int = 32, bucket_cap: int = 16,
    tile: int = 256, window: int = 4096,
):
    """ball_query_pair semantics via the windowed path, with a lax.cond
    fallback to the exact 27-cell/bucket path when a tile's stencil range
    overflows `window`. Drop-in for build_pyramid's hot queries."""

    nbrs_w, counts_w, over_w, any_ovf = ball_query_pair_windowed(
        support, support_batch, support_valid, queries, query_batch,
        query_valid, radius, max_neighbors=max_neighbors, tile=tile,
        window=window)

    def fallback(_):
        return ball_query_pair(
            support, support_batch, support_valid, queries, query_batch,
            query_valid, radius, max_neighbors=max_neighbors,
            bucket_cap=bucket_cap)

    return jax.lax.cond(
        any_ovf, fallback, lambda _: (nbrs_w, counts_w, over_w), None)


@partial(jax.jit, static_argnames=("max_neighbors", "bucket_cap"))
def ball_query(
    coords: jax.Array,
    radius: float | jax.Array,
    batch_ids: jax.Array,
    valid: jax.Array,
    max_neighbors: int = 64,
    bucket_cap: int = 16,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Fixed-radius neighbor lists over a uniform grid.

    coords:    (N, 3) float32.
    batch_ids: (N,) int32 — neighbors must share batch id (reference constrains
               ball query to per-scene ranges via batch offsets,
               bfs_cluster.cu:30-39).
    valid:     (N,) bool — padding points never match.
    max_neighbors / bucket_cap: static caps. A point's returned neighbors are
               drawn from the 27-cell stencil, at most `bucket_cap` candidates
               per cell, nearest-first up to `max_neighbors`.

    Returns (neighbors (N, K) int32, counts (N,) int32, overflow (N,) bool).
    Self is included (the reference includes self, bfs_cluster.cu:40-44).
    Unused neighbor slots hold the self index."""
    N = coords.shape[0]
    K = max_neighbors
    radius = jnp.float32(radius)
    cell = radius  # cell size == radius => all in-radius pairs are in 3^3 stencil

    cells = grid_hash(coords, cell)
    cmin = jnp.min(jnp.where(valid[:, None], cells, 2**30), axis=0)
    cells = cells - cmin + 1  # leave a halo so stencil offsets stay >= 0
    cmax = jnp.max(jnp.where(valid[:, None], cells, 0), axis=0)
    dims = cmax + 2

    # include batch id in the key so buckets never cross scenes
    key = _cell_key(cells, dims) + batch_ids.astype(jnp.int32) * (
        dims[0] * dims[1] * dims[2]
    )
    key = jnp.where(valid, key, jnp.iinfo(jnp.int32).max)  # padding sorts last

    order = jnp.argsort(key).astype(jnp.int32)
    s_key = key[order]

    # candidate gather: for each point, 27 stencil cells x bucket_cap slots
    offsets = jnp.stack(
        jnp.meshgrid(
            jnp.arange(-1, 2), jnp.arange(-1, 2), jnp.arange(-1, 2), indexing="ij"
        ),
        axis=-1,
    ).reshape(27, 3)

    # all 27 offset keys at once, then flat (B, 27*cap) gathers per query
    # chunk: a per-cell vmap gathers (27, N, cap) with minor dim `cap` —
    # under TPU tiling that pads cap=16 -> 128 lanes (8x, 6.75 GB at 2^19
    # points). The flat layout's minor dim 27*cap tiles cleanly, and the
    # lax.map over query chunks bounds PEAK memory at a few (B, 27*cap)
    # buffers (~60 MB at B=32768) instead of N-sized gigabyte temporaries.
    span = dims[0] * dims[1] * dims[2]
    base_key = _cell_key(cells, dims) + batch_ids.astype(jnp.int32) * span
    # key(cell + off) = key(cell) + off·(strides): the linear key is affine
    off_key = (offsets[:, 0] * dims[1] + offsets[:, 1]) * dims[2] + offsets[:, 2]

    big = jnp.float32(1e30)
    cw = 27 * bucket_cap

    def query_block(args):
        bkey, qxyz, qvalid, self_idx = args  # (B,), (B,3), (B,), (B,)
        nb_key = bkey[:, None] + off_key[None, :]  # (B, 27)
        start = jnp.searchsorted(s_key, nb_key, side="left")
        stop = jnp.searchsorted(s_key, nb_key, side="right")
        # true cell occupancy so candidates beyond bucket_cap (never
        # gathered, possibly in-radius) still trip the overflow flag
        b_over = jnp.any((stop - start) > bucket_cap, axis=1) & qvalid
        b = bkey.shape[0]
        slots_raw = (start[:, :, None] + jnp.arange(bucket_cap)[None, None, :]
                     ).reshape(b, cw)
        # see ball_query_pair: past-the-end slots must not alias row N-1
        slots = jnp.minimum(slots_raw, N - 1)
        nb_key_flat = jnp.broadcast_to(
            nb_key[:, :, None], (b, 27, bucket_cap)).reshape(b, cw)
        cand_ok = (s_key[slots] == nb_key_flat) & (slots_raw < N)
        cand_idx = order[slots]
        # per-axis gathered differences: a fused (B, 27*cap, 3) gather would
        # be materialized as f32[B*27*cap, 3] whose trailing dim pads to 128
        # lanes under TPU tiling (43x memory)
        d = jnp.zeros((b, cw), jnp.float32)
        for c in range(3):
            dc = coords[:, c][cand_idx] - qxyz[:, c, None]
            d = d + dc * dc
        in_ball = (cand_ok & (d <= radius * radius) & qvalid[:, None]
                   & valid[cand_idx])
        d = jnp.where(in_ball, d, big)
        neg_d, sel = jax.lax.top_k(-d, K)
        nbrs = jnp.take_along_axis(cand_idx, sel, axis=1).astype(jnp.int32)
        got = neg_d > -big
        counts = jnp.sum(got, axis=1).astype(jnp.int32)
        nbrs = jnp.where(got, nbrs, self_idx[:, None])
        # overflow: more in-radius candidates than K slots, or a stencil
        # cell denser than bucket_cap
        over = (jnp.sum(in_ball, axis=1).astype(jnp.int32) > K) | b_over
        return nbrs, counts, over

    chunk = 32768 if N % 32768 == 0 and N > 32768 else N
    nb_blocks = N // chunk
    args = (base_key.reshape(nb_blocks, chunk),
            coords.reshape(nb_blocks, chunk, 3),
            valid.reshape(nb_blocks, chunk),
            jnp.arange(N, dtype=jnp.int32).reshape(nb_blocks, chunk))
    if nb_blocks == 1:
        nbrs, counts, overflow = query_block(jax.tree.map(lambda x: x[0], args))
    else:
        nbrs, counts, overflow = jax.lax.map(query_block, args)
        nbrs = nbrs.reshape(N, K)
        counts = counts.reshape(N)
        overflow = overflow.reshape(N)
    return nbrs, counts, overflow
