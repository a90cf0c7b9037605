"""Sorted-key coordinate lookup for rulebook construction.

The reference builds rulebooks with host hash maps (google::dense_hash_map,
pointgroup voxelize.cpp:59-152) or inside spconv/MinkowskiEngine. On TPU we
keep voxel coords sorted lexicographically (one lexsort per tensor) and
resolve exact-match queries with a vectorized binary search over (hi, lo)
int32 key pairs — no 64-bit ints (x64 is disabled), no host round-trip.

Key packing: hi = (batch << 28) | (x << 14) | y, lo = z. Valid for
batch < 16 and x, y < 16384 — far beyond any ScanNet scene at 2 cm.
5-column spatio-temporal coords (b, x, y, z, t) — the reference's D=4
models (minkowski/models/res16unet.py:334-376 STRes16UNet*) — pack the
frame index into the low key: lo = (z << 9) | t, valid for t < 512 and
z < 2^22.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["pack_keys", "sort_coords", "lookup"]


def pack_keys(coords: jax.Array,
              xy_bits: tuple[int, int] = (14, 14)) -> tuple[jax.Array, jax.Array]:
    """coords (M, 4) or (M, 5) int32 -> (hi, lo) int32 keys. A 5th column
    is a temporal frame index t < 512 packed into the low key.

    xy_bits = (x_bits, y_bits): hi = (b << (x_bits+y_bits)) | (x << y_bits)
    | y, so batch must stay < 2^(31 - x_bits - y_bits). The default leaves
    only 3 batch bits — id spaces bigger than 8 (e.g. PointGroup's ScoreNet,
    where the "batch" column is a proposal id < 256) MUST narrow xy_bits or
    hi aliases with period 2^(32 - x_bits - y_bits) and rulebooks silently
    mix rows across batches."""
    b, x, y, z = coords[:, 0], coords[:, 1], coords[:, 2], coords[:, 3]
    xb, yb = xy_bits
    hi = (b << (xb + yb)) | (x << yb) | y
    if coords.shape[1] == 5:
        return hi, (z << 9) | coords[:, 4]
    return hi, z


def sort_coords(coords: jax.Array, valid: jax.Array,
                xy_bits: tuple[int, int] = (14, 14)):
    """Returns (order, hi_sorted, lo_sorted): lexicographic order with invalid
    rows last (their keys are int32 max)."""
    hi, lo = pack_keys(coords, xy_bits)
    big = jnp.int32(jnp.iinfo(jnp.int32).max)
    hi = jnp.where(valid, hi, big)
    lo = jnp.where(valid, lo, big)
    order = jnp.lexsort((lo, hi)).astype(jnp.int32)
    return order, hi[order], lo[order]


def lookup(
    hi_sorted: jax.Array,
    lo_sorted: jax.Array,
    q_hi: jax.Array,
    q_lo: jax.Array,
) -> jax.Array:
    """For each query key pair, the sorted position holding an exact match,
    or M (capacity) if absent. Vectorized binary search over the pair order
    (hi, lo); ~log2(M) steps."""
    m = hi_sorted.shape[0]
    steps = max(1, m.bit_length())  # resolve among m+1 positions [0, m]

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
    pos = jnp.minimum(lo_b, m - 1)
    hit = (hi_sorted[pos] == q_hi) & (lo_sorted[pos] == q_lo)
    return jnp.where(hit, lo_b, m).astype(jnp.int32)
