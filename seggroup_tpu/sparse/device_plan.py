"""Device-built UNet pyramid plans (the minimal-transfer training path).

The host-built plans (sparse/plan.py) are bit-exact and ~10 ms/level in C++,
but shipping them to the device costs ~240 MB per 2^19-voxel batch — through
a remote-TPU tunnel (or any bandwidth-constrained host link) that transfer
dominates the train step several times over. This module builds the SAME
plan pytree on device from nothing but the (already lexicographically
sorted) voxel coordinates, so the wire carries only coords+feats+labels
(~10 MB): the analog of the reference's design point where spconv /
MinkowskiEngine build rulebooks host-side next to a PCIe-attached GPU
(reference pointgroup voxelize.cpp:59-152) — on TPU the joins are
sort-free binary searches that vectorize better on device than they ship.

Bit-equality with sparse/plan.build_unet_plan is asserted by
tests/test_sparse_plan.py (same rulebooks, same down maps, same Pallas
windows, same use_window flags).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

import numpy as np

from seggroup_tpu.sparse.conv import build_subm_rulebook, downsample_coords
from seggroup_tpu.sparse.tensor import SparseTensor


def pack_voxel_batch(vb):
    """Compact wire format for a VoxelBatch: (coords int16, feats float16,
    labels uint8, num int32). At 2^19 voxels this is ~7.5 MB vs ~24 MB raw
    and ~250 MB with host plans — the transfer is what dominates a training
    iteration on a bandwidth-constrained host link. `valid` is not shipped:
    make_voxel_batch packs valid rows first, so it is `arange(cap) < num`."""
    coords = np.asarray(vb.coords)
    if abs(int(coords.max(initial=0))) >= 32000 or \
            int(coords.min(initial=0)) <= -32000:
        raise ValueError("voxel coords exceed int16 wire range; use the "
                         "host-plan path (--plan_mode host)")
    labels = np.asarray(vb.labels)
    if labels.max(initial=0) > 255 or labels.min(initial=0) < 0:
        raise ValueError("labels exceed uint8 wire range")
    return (coords.astype(np.int16), np.asarray(vb.feats).astype(np.float16),
            labels.astype(np.uint8), np.int32(vb.num))


def unpack_voxel_batch(coords16, feats16, labels8, num):
    """Device-side inverse of pack_voxel_batch (call under jit). Returns
    (SparseTensor, labels int32)."""
    cap = coords16.shape[0]
    coords = coords16.astype(jnp.int32)
    valid = jnp.arange(cap) < num
    st = SparseTensor(coords, feats16.astype(jnp.float32), valid,
                      jnp.int32(num))
    return st, labels8.astype(jnp.int32)


def build_windows_device(rulebook: jax.Array, tile: int, window: int):
    """Device analog of native.subm_windows (same layout, same overflow
    contract — see native.py:215-247): per-(tile, dx/dy-group) aligned window
    bases + window-local dz-block-interleaved indices for the Pallas fused
    gather. Returns {"rb_win", "win_base", "use_window"} with use_window a
    traced bool (False => the conv takes the exact global-gather branch)."""
    m = rulebook.shape[0]
    n_tiles = m // tile
    # per-(tile, group) minima via a 3-D reshape + small (n_tiles, 9, 3)
    # split. Deliberately NOT the natural reshape(n_tiles, tile, 9, 3) +
    # min(axis=(1,3)): that 4-D big-array reduce miscompiles on TPU (XLA
    # tail-tile bug, observed on v5e at m=2^19: the LAST (tile, group)
    # element reads out-of-bounds garbage — /tmp repro kept in
    # tests/test_sparse_plan.py::test_windows_device_last_tile notes).
    clipped = jnp.minimum(rulebook, m)  # absent entries are already == m
    lo27 = jnp.min(clipped.reshape(n_tiles, tile, 27), axis=1)
    lo = jnp.min(lo27.reshape(n_tiles, 9, 3), axis=2)  # (n_tiles, 9)
    base = jnp.where(lo == m, 0, lo & ~15).astype(jnp.int32)
    # window-local rewrite on the flat (M, 27) layout: row r's group-g base
    base_rows = jnp.repeat(base, tile, axis=0)          # (M, 9)
    d27 = rulebook - jnp.repeat(base_rows, 3, axis=1)   # (M, 27)
    present = rulebook < m
    fits = present & (d27 >= 0) & (d27 < window)
    local = jnp.where(fits, d27, window).astype(jnp.int32)
    use_window = ~jnp.any(present & ~fits)
    # dz-block-interleaved layout rb_win[(t*3+dz)*tile + i, g] =
    # local[t*tile + i, 3g + dz], built from three strided column slices
    # (2-D ops only, same TPU-bug avoidance as above)
    per_dz = [local[:, dz::3].reshape(n_tiles, tile, 9) for dz in range(3)]
    rb_win = jnp.stack(per_dz, axis=1).reshape(3 * m, 9)
    return {"rb_win": rb_win, "win_base": base, "use_window": use_window}


@partial(jax.jit, static_argnames=("level_caps", "with_windows",
                                   "window_levels"))
def build_unet_plan_device(coords: jax.Array, num: jax.Array,
                           level_caps: tuple[int, ...],
                           with_windows: bool = True,
                           window_levels: int | None = None,
                           xy_bits: tuple[int, int] = (14, 14)) -> dict:
    """Device twin of sparse/plan.build_unet_plan: coords (cap0, 4) int32 in
    lexicographic order with the first `num` rows valid -> the same plan
    pytree, built entirely on device (one jitted program, no host round
    trip). level_caps must be a hashable tuple (static)."""
    from seggroup_tpu.sparse import pallas_conv

    assert coords.shape[0] == level_caps[0], (coords.shape, level_caps)
    valid = jnp.arange(level_caps[0]) < num
    st = SparseTensor(coords, jnp.zeros((level_caps[0], 1)), valid, num)
    rulebooks = [build_subm_rulebook(st, assume_sorted=True,
                                     xy_bits=xy_bits)]
    down = []
    cur = st
    for cap_out in level_caps[1:]:
        # the down map needs a real lexsort (halving coords creates ties in
        # earlier components, so `>> 1` does NOT preserve lexicographic
        # order) — but its OUTPUT is emitted sorted-unique, so the next
        # level's rulebook search is sort-free again
        out_c, valid_out, m_out, out_row, delta = downsample_coords(
            cur, cap_out)
        # host plans clamp num at cap_out (native.downsample_plan's m)
        down.append({"coords": out_c,
                     "num": jnp.minimum(m_out, cap_out).astype(jnp.int32),
                     "out_row": out_row, "delta": delta})
        cur = SparseTensor(out_c, jnp.zeros((cap_out, 1)), valid_out, m_out)
        rulebooks.append(build_subm_rulebook(cur, assume_sorted=True,
                                             xy_bits=xy_bits))
    plan = {"rulebooks": rulebooks, "down": down}
    if with_windows:
        windows = []
        for lvl, rb in enumerate(rulebooks):
            if window_levels is not None and lvl >= window_levels:
                windows.append(None)
            elif (rb.shape[0] % pallas_conv.TILE == 0
                    and rb.shape[0] >= 8 * pallas_conv.TILE):
                windows.append(build_windows_device(
                    rb, pallas_conv.TILE, pallas_conv.WINDOW))
            else:
                windows.append(None)
        plan["windows"] = windows
    return plan
