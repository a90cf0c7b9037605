"""Pallas TPU fused windowed gather-GEMM for submanifold sparse conv.

The engine's hot op is out[i] = sum_k W[k]^T feats[nbr[i,k]] over a (M, 27)
rulebook. XLA lowers the neighbor gather to serial row fetches that achieve
~18 GB/s on v5e (~2% of HBM bandwidth) — measured in scripts/bench_gather.py.

This kernel exploits structure instead: with voxel rows lexicographically
sorted by (batch,x,y,z), the neighbors of T consecutive query rows for one
(dx,dy) kernel-offset column live in a SHORT CONTIGUOUS row window (measured
max span 336 rows for T=256 on 2cm ScanNet-like batches; see
native.subm_windows which builds the window plan on host). Per (tile, group):

  1. one contiguous async DMA pulls the (W, Cin) window HBM -> VMEM at full
     bandwidth; windows are double-buffered ACROSS TILES (tile t computes
     from buffers filled at step t-1 while tile t+1's 9 windows prefetch),
     so the MXU never stalls on HBM latency even at small tile sizes;
  2. the in-window gather is a one-hot (T, W) x (W, Cin) matmul on the MXU —
     exact (one-hot rows select exactly one bf16 row) and never touching HBM;
  3. the conv weight apply (T, Cin) x (Cin, Cout) fuses right behind it.

Absent neighbors carry local index == W, matching no one-hot column — they
contribute exactly zero, no padding row needed. Window overflow is impossible
by contract: the host planner counts non-fitting entries and the caller
falls back to the global-gather path when any exist (sparse/conv.py cond).

Backward reuses the forward kernel for the data gradient (kernel-offset
symmetry: same window plan, flipped+transposed weights) plus a weight-grad
kernel that accumulates dW across the grid in a resident VMEM block.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 256     # query rows per grid step
WINDOW = 512   # rows per (tile, group) gather window; measured real-data
               # spans max ~336 at TILE=256 (overflow -> exact fallback)


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _pad128(c: int) -> int:
    # DMA slices must be 128-aligned along the lane dim (Mosaic tiling)
    return (c + 127) // 128 * 128


def _make_dma(f_ref, win_buf, sems, base_ref, t, g, slot, window):
    # base_ref is the WHOLE win_base array, flattened to (n_tiles * 9,) and
    # scalar-prefetched into SMEM (flat: a 2-D (n_tiles, 9) SMEM operand
    # would pad its lane dim 9 -> 128 and blow the 1 MB SMEM budget);
    # window starts are 16-aligned by the planner
    base = pl.multiple_of(base_ref[t * 9 + g], 16)
    return pltpu.make_async_copy(
        f_ref.at[pl.ds(base, window), :],
        win_buf.at[slot, g],
        sems.at[slot, g],
    )


def _start_tile(f_ref, win_buf, sems, base_ref, t, slot, window):
    for g in range(9):
        _make_dma(f_ref, win_buf, sems, base_ref, t, g, slot, window).start()


def _fwd_kernel(base_ref, rbl_ref, f_ref, w_ref, out_ref, win_buf, sems):
    # rbl_ref block: (3T, 9) dz-block-interleaved local indices — rows
    # [dz*T, (dz+1)*T) hold the dz-th offset column of this tile, so the
    # whole group gathers with ONE (3T, W) x (W, Cin) MXU dot.
    #
    # Cross-tile double buffering: tile t computes from buffer slot t%2
    # (whose 9 window DMAs were issued at step t-1), while slot (t+1)%2
    # prefetches tile t+1's windows — the MXU never stalls on HBM latency,
    # which is what makes SMALL tiles (tighter windows -> fewer one-hot
    # MACs) actually faster instead of wait-bound.
    t = pl.program_id(0)
    n_tiles = pl.num_programs(0)
    tile = rbl_ref.shape[0] // 3
    window = win_buf.shape[2]

    @pl.when(t == 0)
    def _():
        _start_tile(f_ref, win_buf, sems, base_ref, 0, 0, window)

    @pl.when(t + 1 < n_tiles)
    def _():
        _start_tile(f_ref, win_buf, sems, base_ref, t + 1, (t + 1) % 2,
                    window)

    slot = t % 2
    iota_w = jax.lax.broadcasted_iota(jnp.int32, (3 * tile, window), 1)
    acc = jnp.zeros(out_ref.shape, jnp.float32)
    for g in range(9):
        _make_dma(f_ref, win_buf, sems, base_ref, t, g, slot, window).wait()
        win = win_buf[slot, g]
        oh = (iota_w == rbl_ref[:, g][:, None]).astype(win.dtype)
        # (Mosaic requires 32-bit matmul accumulators, so the one-hot product
        # lands in f32 and is cast back — the selection itself is exact)
        rows = jnp.dot(oh, win,
                       preferred_element_type=jnp.float32).astype(win.dtype)
        for dz in range(3):
            acc = acc + jnp.dot(rows[dz * tile:(dz + 1) * tile],
                                w_ref[3 * g + dz],
                                preferred_element_type=jnp.float32)
    out_ref[:] = acc


# --- chunked one-hot variant (A/B experiment, docs/ARCHITECTURE.md plan of
# record for the ~5.6 ms/conv floor) ------------------------------------------
#
# The full-width kernel pays a (3T, W) x (W, Cin) one-hot dot per group —
# W*Cin MACs per selected row. But window-local indices are NONDECREASING
# within each dz block of a sorted tile, so a 64-row chunk's indices span
# ~W/12 rows: one-hot each chunk against a 128-row dynamic slice of the VMEM
# window instead (located by a precomputed per-chunk base), cutting one-hot
# MACs and iota-build work 4x. Chunks whose span exceeds 128 (local density
# spikes) are EXACTLY repaired by a per-group correction pass: their entries
# are zeroed out of the narrow one-hots (no match past the slice) and
# re-gathered with a full-width one-hot restricted to the dropped rows,
# gated by a per-(tile, group) bit so the common case never pays it.
#
# Per-chunk bases ride in SMEM packed 4-per-int32 in 16-row units
# (12 chunks x 9 groups = 27 words/tile; 2048 tiles -> 221 KB, inside the
# 1 MB SMEM budget where raw int32 bases would not be).

CHUNK = 64  # rows per narrow one-hot; must divide TILE
CSLICE = 128  # window-slice rows each chunk gathers against


def _chunk_plan(rb_local, n_tiles, tile, window, chunk=CHUNK, cslice=CSLICE):
    """(chunk_words (n_tiles*27,) int32, left_mask (n_tiles,) int32).
    Pure jnp — runs fused into the surrounding jit, ~one pass over rb."""
    n_c = tile // chunk                      # chunks per dz block
    r = rb_local.reshape(n_tiles, 3, n_c, chunk, 9)
    valid = r < window
    rmin = jnp.min(jnp.where(valid, r, window), axis=3)  # (nt, 3, n_c, 9)
    rmax = jnp.max(jnp.where(valid, r, -1), axis=3)
    base = jnp.minimum(rmin & ~15, window - cslice)
    dropped = rmax - base >= cslice                      # (nt, 3, n_c, 9)
    left = jnp.any(dropped, axis=(1, 2))                 # (nt, 9)
    left_mask = jnp.sum(
        left.astype(jnp.int32) << jnp.arange(9, dtype=jnp.int32)[None, :],
        axis=1).astype(jnp.int32)
    # pack offsets [t][g][dz*n_c+cc] as u8 16-row units, 4 per int32
    offs = (base >> 4).transpose(0, 3, 1, 2).reshape(n_tiles, 9, 3 * n_c)
    o4 = offs.reshape(n_tiles, 9, (3 * n_c) // 4, 4)
    words = (o4[..., 0] | (o4[..., 1] << 8) | (o4[..., 2] << 16)
             | (o4[..., 3] << 24)).reshape(n_tiles, -1)
    return words.reshape(-1).astype(jnp.int32), left_mask


def _fwd_kernel_chunked(base_ref, chunk_ref, left_ref, rbl_ref, f_ref, w_ref,
                        out_ref, win_buf, sems, *, window, chunk=CHUNK,
                        cslice=CSLICE):
    t = pl.program_id(0)
    n_tiles = pl.num_programs(0)
    tile = rbl_ref.shape[0] // 3
    n_c = tile // chunk
    words_per_g = (3 * n_c) // 4

    @pl.when(t == 0)
    def _():
        _start_tile(f_ref, win_buf, sems, base_ref, 0, 0, window)

    @pl.when(t + 1 < n_tiles)
    def _():
        _start_tile(f_ref, win_buf, sems, base_ref, t + 1, (t + 1) % 2,
                    window)

    slot = t % 2
    iota_c = jax.lax.broadcasted_iota(jnp.int32, (chunk, cslice), 1)
    acc = jnp.zeros(out_ref.shape, jnp.float32)
    for g in range(9):
        _make_dma(f_ref, win_buf, sems, base_ref, t, g, slot, window).wait()
        chunks = []
        for c in range(3 * n_c):
            word = chunk_ref[t * 9 * words_per_g + g * words_per_g + c // 4]
            base = pl.multiple_of(((word >> (8 * (c % 4))) & 0xFF) << 4, 16)
            sl = win_buf[slot, g, pl.ds(base, cslice), :]
            rc = rbl_ref[c * chunk:(c + 1) * chunk, g]
            oh = (iota_c == (rc - base)[:, None]).astype(sl.dtype)
            chunks.append(jnp.dot(oh, sl,
                                  preferred_element_type=jnp.float32))
        rows = jnp.concatenate(chunks, axis=0).astype(win_buf.dtype)
        for dz in range(3):
            acc = acc + jnp.dot(rows[dz * tile:(dz + 1) * tile],
                                w_ref[3 * g + dz],
                                preferred_element_type=jnp.float32)
    out_ref[:] = acc

    # exact repair for over-span chunks, gated per (tile, group)
    iota_w = jax.lax.broadcasted_iota(jnp.int32, (3 * tile, window), 1)
    for g in range(9):
        bit = (left_ref[t] >> g) & 1

        @pl.when(bit == 1)
        def _(g=g):
            win = win_buf[slot, g]
            # 2-D (CHUNK, 1) pieces: Mosaic can't concatenate 1-D i1 vectors
            # ("input offsets outside of the first tile")
            masks = []
            for c in range(3 * n_c):
                word = chunk_ref[t * 9 * words_per_g + g * words_per_g
                                 + c // 4]
                base = ((word >> (8 * (c % 4))) & 0xFF) << 4
                rc = rbl_ref[c * chunk:(c + 1) * chunk, g]
                masks.append(((rc < window)
                              & (rc - base >= cslice))[:, None])
            dropped = jnp.concatenate(masks, axis=0)      # (3T, 1)
            r = rbl_ref[:, g]
            oh = ((iota_w == r[:, None]) & dropped).astype(win.dtype)
            rows = jnp.dot(oh, win,
                           preferred_element_type=jnp.float32).astype(win.dtype)
            corr = jnp.zeros(out_ref.shape, jnp.float32)
            for dz in range(3):
                corr = corr + jnp.dot(rows[dz * tile:(dz + 1) * tile],
                                      w_ref[3 * g + dz],
                                      preferred_element_type=jnp.float32)
            out_ref[:] = out_ref[:] + corr


@functools.partial(jax.jit, static_argnames=("compute_dtype", "tile",
                                              "window", "chunk", "cslice"))
def subm_conv_windowed_chunked(feats, weights, rb_local, win_base,
                               compute_dtype=jnp.bfloat16, tile=TILE,
                               window=WINDOW, chunk=CHUNK, cslice=CSLICE):
    """Chunked-one-hot forward (same contract as subm_conv_windowed; exact,
    including over-span chunks via the gated repair pass). Cin > 64 only —
    narrow channels should keep the lane-packed kernel."""
    m, cin = feats.shape
    cout = weights.shape[2]
    assert m % tile == 0 and tile % chunk == 0 and window % 16 == 0
    assert cslice % 16 == 0 and window >= cslice
    n_tiles = m // tile
    cin_p = _pad128(cin)
    f = feats.astype(compute_dtype)
    f_pad = jnp.zeros((m + window, cin_p), compute_dtype).at[:m, :cin].set(f)
    if cin_p != cin:
        weights = jnp.zeros((27, cin_p, cout),
                            weights.dtype).at[:, :cin, :].set(weights)
    cin = cin_p
    chunk_words, left_mask = _chunk_plan(rb_local, n_tiles, tile, window,
                                         chunk, cslice)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((3 * tile, 9), lambda t, *_: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, cout), lambda t, *_: (t, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, 9, window, cin), compute_dtype),
            pltpu.SemaphoreType.DMA((2, 9)),
        ],
    )
    kern = functools.partial(_fwd_kernel_chunked, window=window,
                             chunk=chunk, cslice=cslice)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((m, cout), jnp.float32),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * 27 * cin * (cslice + cout),
            bytes_accessed=9 * n_tiles * window * cin * 2 + m * 27 * 4
            + m * cout * 4,
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(win_base.reshape(-1), chunk_words, left_mask, rb_local, f_pad,
      weights.astype(compute_dtype))


# --- lane-packed variant (true Cin <= 64) ------------------------------------
#
# Narrow channels waste the one-hot: the window's lane dim must pad to 128,
# so a Cin=32 level pays 4x the one-hot MACs AND 4x the window DMA traffic
# for zero information. Instead, p = 128 // sub consecutive feature rows are
# PACKED into one 128-lane row (feats.reshape((M+W)/p, p*sub)); the one-hot
# then selects a packed row (p-fold narrower dot) and a per-row lane-block
# mask (VPU) zeroes the p-1 sibling rows that rode along. The conv weights
# are lane-tiled p times so the masked (3T, 128) row block multiplies in one
# dot — exact: masked lanes are exactly zero, and w_tiled's j-th block equals
# the true weights, so only the selected block contributes.
#
# Window starts re-align inside the kernel: packed DMA starts must be
# 16-aligned in PACKED rows (16p original rows) while the planner aligns to
# 16 original rows, so each (tile, group) carries d = base - p*base_p in
# [0, 16p) and the buffer holds W/p + 16 packed rows to cover the tail.


def _make_dma_packed(f_ref, win_buf, sems, base_ref, t, g, slot, wp, shift):
    base = base_ref[t * 9 + g]
    base_p = pl.multiple_of((base >> shift) & ~15, 16)
    return pltpu.make_async_copy(
        f_ref.at[pl.ds(base_p, wp), :],
        win_buf.at[slot, g],
        sems.at[slot, g],
    )


def _start_tile_packed(f_ref, win_buf, sems, base_ref, t, slot, wp, shift):
    for g in range(9):
        _make_dma_packed(f_ref, win_buf, sems, base_ref, t, g, slot, wp,
                         shift).start()


def _gather_rows_packed(base_ref, rbl_ref, win_buf, sems, f_ref, t, slot,
                        g, window, sub, shift):
    """One group's packed gather -> (3T, 128) masked rows (selected lane
    block live, sibling blocks zero)."""
    _make_dma_packed(f_ref, win_buf, sems, base_ref, t, g, slot,
                     win_buf.shape[2], shift).wait()
    win = win_buf[slot, g]                      # (Wp, 128)
    wp = win.shape[0]
    n3t = rbl_ref.shape[0]
    base = base_ref[t * 9 + g]
    d = base - (((base >> shift) & ~15) << shift)
    r = rbl_ref[:, g]                           # (3T,) in [0, window]
    ok = r < window                             # window == absent sentinel
    rp = (r + d) >> shift
    blk = (r + d) & ((1 << shift) - 1)
    iota_p = jax.lax.broadcasted_iota(jnp.int32, (n3t, wp), 1)
    oh = ((iota_p == rp[:, None]) & ok[:, None]).astype(win.dtype)
    rows = jnp.dot(oh, win,
                   preferred_element_type=jnp.float32).astype(win.dtype)
    lane = jax.lax.broadcasted_iota(jnp.int32, (n3t, 128), 1)
    mask = (lane >> (7 - shift)) == blk[:, None]   # lane // sub == blk
    return jnp.where(mask, rows, jnp.zeros((), win.dtype))


def _fwd_kernel_packed(base_ref, rbl_ref, f_ref, w_ref, out_ref, win_buf,
                       sems, *, window, sub, shift):
    t = pl.program_id(0)
    n_tiles = pl.num_programs(0)
    tile = rbl_ref.shape[0] // 3
    wp = win_buf.shape[2]

    @pl.when(t == 0)
    def _():
        _start_tile_packed(f_ref, win_buf, sems, base_ref, 0, 0, wp, shift)

    @pl.when(t + 1 < n_tiles)
    def _():
        _start_tile_packed(f_ref, win_buf, sems, base_ref, t + 1,
                           (t + 1) % 2, wp, shift)

    slot = t % 2
    acc = jnp.zeros(out_ref.shape, jnp.float32)
    for g in range(9):
        rows = _gather_rows_packed(base_ref, rbl_ref, win_buf, sems, f_ref,
                                   t, slot, g, window, sub, shift)
        for dz in range(3):
            acc = acc + jnp.dot(rows[dz * tile:(dz + 1) * tile],
                                w_ref[3 * g + dz],
                                preferred_element_type=jnp.float32)
    out_ref[:] = acc


def _dw_kernel_packed(base_ref, rbl_ref, f_ref, dout_ref, dw_ref, win_buf,
                      sems, *, window, sub, shift):
    t = pl.program_id(0)
    n_tiles = pl.num_programs(0)
    tile = rbl_ref.shape[0] // 3
    wp = win_buf.shape[2]

    @pl.when(t == 0)
    def _():
        dw_ref[:] = jnp.zeros_like(dw_ref)
        _start_tile_packed(f_ref, win_buf, sems, base_ref, 0, 0, wp, shift)

    @pl.when(t + 1 < n_tiles)
    def _():
        _start_tile_packed(f_ref, win_buf, sems, base_ref, t + 1,
                           (t + 1) % 2, wp, shift)

    slot = t % 2
    dout = dout_ref[:]
    for g in range(9):
        rows = _gather_rows_packed(base_ref, rbl_ref, win_buf, sems, f_ref,
                                   t, slot, g, window, sub, shift)
        for dz in range(3):
            k = 3 * g + dz
            upd = jax.lax.dot_general(
                rows[dz * tile:(dz + 1) * tile], dout.astype(rows.dtype),
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dw_ref[k] = dw_ref[k] + upd


def _dw_kernel(base_ref, rbl_ref, f_ref, dout_ref, dw_ref, win_buf, sems):
    t = pl.program_id(0)
    n_tiles = pl.num_programs(0)
    tile = rbl_ref.shape[0] // 3
    window = win_buf.shape[2]

    @pl.when(t == 0)
    def _():
        dw_ref[:] = jnp.zeros_like(dw_ref)
        _start_tile(f_ref, win_buf, sems, base_ref, 0, 0, window)

    @pl.when(t + 1 < n_tiles)
    def _():
        _start_tile(f_ref, win_buf, sems, base_ref, t + 1, (t + 1) % 2,
                    window)

    slot = t % 2
    iota_w = jax.lax.broadcasted_iota(jnp.int32, (3 * tile, window), 1)
    dout = dout_ref[:]
    for g in range(9):
        _make_dma(f_ref, win_buf, sems, base_ref, t, g, slot, window).wait()
        win = win_buf[slot, g]
        oh = (iota_w == rbl_ref[:, g][:, None]).astype(win.dtype)
        rows = jnp.dot(oh, win,
                       preferred_element_type=jnp.float32).astype(win.dtype)
        for dz in range(3):
            k = 3 * g + dz
            upd = jax.lax.dot_general(
                rows[dz * tile:(dz + 1) * tile], dout.astype(win.dtype),
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dw_ref[k] = dw_ref[k] + upd
    # dw block has a constant index map: it stays resident in VMEM across
    # grid steps and is written back once at the end


def _pack_shift(cin: int) -> int:
    """log2 of the lane-pack factor for a true channel count."""
    if cin <= 32:
        return 2
    if cin <= 64:
        return 1
    return 0


@functools.partial(jax.jit, static_argnames=("compute_dtype", "tile", "window"))
def subm_conv_windowed(feats, weights, rb_local, win_base,
                       compute_dtype=jnp.bfloat16, tile=TILE, window=WINDOW):
    """feats (M, Cin) f32, weights (27, Cin, Cout), rb_local (3M, 9) int32
    dz-block-interleaved window-local indices (native.subm_windows layout;
    == window for absent), win_base (M//tile, 9) int32 16-aligned window
    starts. Returns (M, Cout) f32. Cin <= 64 routes through the lane-packed
    kernel (see module comment above _fwd_kernel_packed)."""
    m, cin = feats.shape
    cout = weights.shape[2]
    assert m % tile == 0, "capacity must be a multiple of tile"
    n_tiles = m // tile
    shift = _pack_shift(cin)
    if shift:
        return _subm_conv_windowed_packed(feats, weights, rb_local, win_base,
                                          compute_dtype, tile, window, shift)
    if (tile % CHUNK == 0 and (3 * (tile // CHUNK)) % 4 == 0
            and window >= CSLICE and window % 16 == 0):
        # chunked one-hot: ~1.4x the full-width kernel measured IN-PROGRAM
        # (3.2 vs 4.5 ms/conv at M=2^17 Cin=Cout=128 W=384 on v5e; the
        # per-dispatch A/B that showed no gain was tunnel-latency-bound).
        # Exact, incl. over-span chunks (gated repair pass; tested vs full).
        return subm_conv_windowed_chunked(feats, weights, rb_local, win_base,
                                          compute_dtype=compute_dtype,
                                          tile=tile, window=window)
    cin_p = _pad128(cin)
    f = feats.astype(compute_dtype)
    f_pad = jnp.zeros((m + window, cin_p), compute_dtype).at[:m, :cin].set(f)
    if cin_p != cin:
        weights = jnp.zeros((27, cin_p, cout), weights.dtype).at[:, :cin, :].set(weights)
    cin = cin_p
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # win_base (n_tiles, 9) rides whole in SMEM
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((3 * tile, 9), lambda t, base: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, cout), lambda t, base: (t, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, 9, window, cin), compute_dtype),
            pltpu.SemaphoreType.DMA((2, 9)),
        ],
    )
    return pl.pallas_call(
        _fwd_kernel,
        out_shape=jax.ShapeDtypeStruct((m, cout), jnp.float32),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * 27 * cin * (window + cout),
            bytes_accessed=9 * n_tiles * window * cin * 2 + m * 27 * 4
            + m * cout * 4,
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(win_base.reshape(-1), rb_local, f_pad, weights.astype(compute_dtype))


def _pack_feats(feats, window, shift, compute_dtype):
    """(M, cin) -> ((M+window)/p, 128) packed rows + lane-tiled weight pad."""
    m, cin = feats.shape
    p = 1 << shift
    sub = 128 >> shift
    f = feats.astype(compute_dtype)
    f_sub = jnp.zeros((m + window, sub), compute_dtype).at[:m, :cin].set(f)
    return f_sub.reshape((m + window) // p, 128), sub


def _tile_weights(weights, sub, shift):
    """(27, cin, cout) -> (27, 128, cout): pad cin -> sub, repeat p times
    along the lane axis so any selected lane block multiplies true weights."""
    cin, cout = weights.shape[1], weights.shape[2]
    w = jnp.zeros((27, sub, cout), weights.dtype).at[:, :cin, :].set(weights)
    return jnp.tile(w, (1, 1 << shift, 1))


def _subm_conv_windowed_packed(feats, weights, rb_local, win_base,
                               compute_dtype, tile, window, shift):
    m, cin = feats.shape
    cout = weights.shape[2]
    n_tiles = m // tile
    f_packed, sub = _pack_feats(feats, window, shift, compute_dtype)
    w_tiled = _tile_weights(weights, sub, shift).astype(compute_dtype)
    wp = (window >> shift) + 16  # +16 packed rows: in-kernel 16p re-align
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((3 * tile, 9), lambda t, base: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, cout), lambda t, base: (t, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, 9, wp, 128), compute_dtype),
            pltpu.SemaphoreType.DMA((2, 9)),
        ],
    )
    kern = functools.partial(_fwd_kernel_packed, window=window, sub=sub,
                             shift=shift)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((m, cout), jnp.float32),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * 27 * m * 128 * (wp + cout),
            bytes_accessed=9 * n_tiles * wp * 128 * 2 + m * 27 * 4
            + m * cout * 4,
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(win_base.reshape(-1), rb_local, f_packed, w_tiled)


def _subm_dw_windowed_packed(feats, dout, rb_local, win_base,
                             compute_dtype, tile, window, shift):
    m, cin = feats.shape
    cout = dout.shape[1]
    n_tiles = m // tile
    f_packed, sub = _pack_feats(feats, window, shift, compute_dtype)
    wp = (window >> shift) + 16
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((3 * tile, 9), lambda t, base: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((tile, cout), lambda t, base: (t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((27, 128, cout), lambda t, base: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, 9, wp, 128), compute_dtype),
            pltpu.SemaphoreType.DMA((2, 9)),
        ],
    )
    kern = functools.partial(_dw_kernel_packed, window=window, sub=sub,
                             shift=shift)
    dw_big = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((27, 128, cout), jnp.float32),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(win_base.reshape(-1), rb_local, f_packed, dout)
    # fold the p lane blocks (p-1 are exactly zero per row, so the sum IS
    # the selected block) and drop the cin->sub padding
    return dw_big.reshape(27, 1 << shift, sub, cout).sum(axis=1)[:, :cin, :]


@functools.partial(jax.jit, static_argnames=("compute_dtype", "tile", "window"))
def subm_dw_windowed(feats, dout, rb_local, win_base,
                     compute_dtype=jnp.bfloat16, tile=TILE, window=WINDOW):
    """Weight gradient: dW[k] = sum_i feats[nbr[i,k]] dout[i]^T, computed
    tile-by-tile with the same window DMAs. Returns (27, Cin, Cout) f32.
    Cin <= 64 routes through the lane-packed kernel."""
    m, cin_in = feats.shape
    cout = dout.shape[1]
    n_tiles = m // tile
    shift = _pack_shift(cin_in)
    if shift:
        return _subm_dw_windowed_packed(feats, dout, rb_local, win_base,
                                        compute_dtype, tile, window, shift)
    cin = _pad128(cin_in)
    f = feats.astype(compute_dtype)
    f_pad = jnp.zeros((m + window, cin), compute_dtype).at[:m, :cin_in].set(f)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((3 * tile, 9), lambda t, base: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((tile, cout), lambda t, base: (t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((27, cin, cout), lambda t, base: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, 9, window, cin), compute_dtype),
            pltpu.SemaphoreType.DMA((2, 9)),
        ],
    )
    dw = pl.pallas_call(
        _dw_kernel,
        out_shape=jax.ShapeDtypeStruct((27, cin, cout), jnp.float32),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(win_base.reshape(-1), rb_local, f_pad, dout)
    return dw[:, :cin_in, :]
