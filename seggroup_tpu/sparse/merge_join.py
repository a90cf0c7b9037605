"""Windowed sorted-join: the fast path for k3 rulebook construction.

The submanifold rulebook search joins the lexsorted voxel keys against
themselves shifted by constant kernel offsets (reference analog: spconv /
MinkowskiEngine host hash maps, pointgroup voxelize.cpp:59-152). The
previous device path ran a 20-step vectorized binary search per (dx,dy)
group — 40 rounds of random scalar gathers that achieve ~3 GB/s effective
on TPU and dominated the device plan build (1.6 s for one 2^19-voxel level,
scripts/profile_device_plan.py).

This module exploits the structure those searches ignore: for one offset
group, the query sequence (hi + c, lo - 1) is ITSELF sorted (adding a
constant preserves order), so the join is a tiled merge of two sorted
sequences:

  1. one cheap binary search per query TILE (n_tiles, not n_queries)
     locates each tile's contiguous key window;
  2. the window rows are fetched with contiguous row gathers (full HBM
     bandwidth, no random access);
  3. within a (tile, window) block, positions and matches come from
     vectorized compare+count reductions that XLA fuses — O(tile * window)
     VPU ops, no gathers at all.

Match resolution uses a count-difference identity: with targets
(q_hi, q_lo + t) for t in {0,1,2} (q_lo = z-1, so t maps dz in {-1,0,+1}),

  c0  = #{keys < (q_hi, q_lo)}          (a prefix count)
  e_t = #{keys == (q_hi, q_lo + t)}     (0 or 1 — keys are unique)

give every match position without touching the keys again:
  pos(dz=-1) = c0,            exists iff e_0
  pos(dz= 0) = c0 + e_0,      exists iff e_1
  pos(dz=+1) = c0 + e_0 + e_1, exists iff e_2

Exactness: per tile, the key window [s*kw, s*kw + 2*kw) is valid iff
  s*kw <= lb(first query)  and  lb((last q_hi, last q_lo + 3)) <= s*kw + 2*kw
— the first holds by construction (s = lb // kw), the second is checked and
reduced into a traced `ok` flag; callers lax.cond to the binary-search path
when any tile overflows (adversarial density skew only; see
tests/test_merge_join.py for a forced case).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

__all__ = ["lower_bound_pair", "windowed_join3"]

_BIG = jnp.iinfo(jnp.int32).max


def lower_bound_pair(hi_sorted, lo_sorted, q_hi, q_lo):
    """First sorted position with key >= (q_hi, q_lo); in [0, m]. Vectorized
    binary search — use only for SMALL query sets (per-tile heads); for bulk
    joins use windowed_join3."""
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


@partial(jax.jit, static_argnames=("tile", "kw", "chunk_tiles"))
def windowed_join3(hi_s: jax.Array, lo_s: jax.Array,
                   q_hi: jax.Array, q_lo: jax.Array,
                   tile: int = 512, kw: int = 1024,
                   chunk_tiles: int = 8):
    """3-consecutive-target join of sorted queries into sorted unique keys.

    hi_s, lo_s: (M,) int32, strictly increasing over the valid prefix,
        INT32_MAX on padding rows.
    q_hi, q_lo: (Nq,) int32, sorted (nondecreasing) within every aligned
        `tile`-sized block; Nq % tile == 0. Padding queries must use
        (INT32_MAX, INT32_MAX - 4) so q_lo + 3 cannot overflow.

    Returns (pos_m1, pos_0, pos_p1, ok): for each query, the sorted key
    position matching (q_hi, q_lo + t) for t = 0, 1, 2, or M if absent;
    `ok` is a traced scalar bool — when False some tile's window overflowed
    and the positions are NOT trustworthy (caller must fall back).
    """
    m = hi_s.shape[0]
    nq = q_hi.shape[0]
    assert nq % tile == 0, (nq, tile)
    n_tiles = nq // tile

    # pad keys so any window start in [0, mp - 2*kw] is in bounds
    mp = (-(-m // kw) + 2) * kw
    khp = jnp.concatenate([hi_s, jnp.full((mp - m,), _BIG, jnp.int32)])
    klp = jnp.concatenate([lo_s, jnp.full((mp - m,), _BIG, jnp.int32)])

    q_hi2 = q_hi.reshape(n_tiles, tile)
    q_lo2 = q_lo.reshape(n_tiles, tile)
    lb_head = lower_bound_pair(hi_s, lo_s, q_hi2[:, 0], q_lo2[:, 0])
    need_end = lower_bound_pair(hi_s, lo_s, q_hi2[:, -1], q_lo2[:, -1] + 3)
    s_blk = jnp.minimum(lb_head // kw, mp // kw - 2).astype(jnp.int32)
    ok = jnp.all(need_end <= s_blk * kw + 2 * kw)

    # contiguous key windows: two adjacent kw-blocks per tile (row gathers)
    kh2 = khp.reshape(mp // kw, kw)
    kl2 = klp.reshape(mp // kw, kw)
    win_h = jnp.concatenate([kh2[s_blk], kh2[s_blk + 1]], axis=1)
    win_l = jnp.concatenate([kl2[s_blk], kl2[s_blk + 1]], axis=1)

    def do_chunk(args):
        qh, ql, wh, wl, base = args  # (ct,tile) (ct,tile) (ct,2kw) (ct,2kw) (ct,)
        # broadcast compare over (ct, tile, 2kw); XLA fuses the elementwise
        # predicates into the axis=-1 count reductions, so nothing of this
        # shape ever hits HBM
        lt_h = wh[:, None, :] < qh[:, :, None]
        eq_h = wh[:, None, :] == qh[:, :, None]
        d = wl[:, None, :] - ql[:, :, None]  # int32; eq_h gates any wrap
        c0 = jnp.sum((lt_h | (eq_h & (d < 0))).astype(jnp.int32), axis=-1)
        e0 = jnp.sum((eq_h & (d == 0)).astype(jnp.int32), axis=-1)
        e1 = jnp.sum((eq_h & (d == 1)).astype(jnp.int32), axis=-1)
        e2 = jnp.sum((eq_h & (d == 2)).astype(jnp.int32), axis=-1)
        p_m1 = base[:, None] + c0
        p_0 = p_m1 + e0
        p_p1 = p_0 + e1
        mm = jnp.int32(m)
        return (jnp.where(e0 > 0, p_m1, mm),
                jnp.where(e1 > 0, p_0, mm),
                jnp.where(e2 > 0, p_p1, mm))

    base = s_blk * kw
    if n_tiles % chunk_tiles == 0 and n_tiles > chunk_tiles:
        nc = n_tiles // chunk_tiles
        args = (q_hi2.reshape(nc, chunk_tiles, tile),
                q_lo2.reshape(nc, chunk_tiles, tile),
                win_h.reshape(nc, chunk_tiles, 2 * kw),
                win_l.reshape(nc, chunk_tiles, 2 * kw),
                base.reshape(nc, chunk_tiles))
        pm1, p0, pp1 = jax.lax.map(do_chunk, args)
    else:
        pm1, p0, pp1 = do_chunk((q_hi2, q_lo2, win_h, win_l, base))
    return (pm1.reshape(nq), p0.reshape(nq), pp1.reshape(nq), ok)
