"""Sort-based, scatter-free segment reductions.

TPU alternative to the `jax.ops.segment_*` scatter reductions in
`segment_ops.py`. XLA lowers an unsorted scatter with colliding indices to a
serialized update loop on TPU; at PointGroup's flat-membership scale (2^20
rows -> a few hundred proposals, reference pointgroup/lib/pointgroup_ops/src/
sec_mean/sec_mean.cu:12-86 and roipool.cu:12-57) that's the difference
between milliseconds and seconds per op. Here every reduction is built from
TPU-friendly primitives only — one stable sort, segmented pairwise scans
(`lax.associative_scan` over (start-flag, value) pairs, which also keeps
float error at O(log segment_size), better than sequential accumulation),
and boundary gathers located by `searchsorted`. The per-segment result is
read at each segment's last sorted row.

max/min return the *value* re-gathered from the input at the winning row, so
autodiff routes the gradient through a (num_segments, C)-sized gather — the
same single-argmax backward as the reference roipool_bp (roipool.cu:30-41) —
never a row-scale scatter. `segment_sum`/`segment_mean` carry custom VJPs
whose backward is a plain gather (`g[ids]`), keeping the backward pass
scatter-free as well.

Semantics match `segment_ops.py` (ids outside [0, num_segments) are padding;
empty segments yield 0 for sum/mean and `fill_value` for max/min;
`segment_argmax` returns the smallest row index among a segment's maxima;
arbitrary trailing data dims) with one deliberate difference: a non-empty
segment whose true extreme equals the scatter engine's +/-inf (or integer
min/max) sentinel returns that real value here, where the scatter engine
misreports it as `fill_value` (sentinel collision).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

__all__ = [
    "segment_sum",
    "segment_mean",
    "segment_max",
    "segment_min",
    "segment_argmax",
]


def _plan(segment_ids: jax.Array, num_segments: int):
    """One stable sort shared by every reduction on these ids."""
    valid = (segment_ids >= 0) & (segment_ids < num_segments)
    key = jnp.where(valid, segment_ids, num_segments).astype(jnp.int32)
    order = jnp.argsort(key, stable=True).astype(jnp.int32)
    sk = key[order]
    probe = jnp.arange(num_segments, dtype=jnp.int32)
    starts = jnp.searchsorted(sk, probe, side="left").astype(jnp.int32)
    ends = jnp.searchsorted(sk, probe, side="right").astype(jnp.int32)
    return valid, order, sk, starts, ends


def _flat2d(data: jax.Array):
    """(N, ...) -> ((N, C), trailing shape); C = prod of trailing dims."""
    return data.reshape(data.shape[0], -1), data.shape[1:]


def _seg_flags(sk: jax.Array) -> jax.Array:
    return jnp.concatenate([jnp.ones((1,), bool), sk[1:] != sk[:-1]])


def _sum_impl(data, valid, order, sk, starts, ends):
    d2, tail = _flat2d(data)
    acc = d2.dtype
    if acc in (jnp.bfloat16, jnp.float16):
        acc = jnp.float32
    sd = jnp.where(valid[order][:, None], d2[order].astype(acc), 0)
    fs = _seg_flags(sk)

    def comb(a, b):
        fa, va = a
        fb, vb = b
        return fa | fb, jnp.where(fb[:, None], vb, va + vb)

    _, run = jax.lax.associative_scan(comb, (fs, sd), axis=0)
    nonempty = ends > starts
    last = jnp.maximum(ends - 1, 0)
    out = jnp.where(nonempty[:, None], run[last], 0).astype(d2.dtype)
    return out.reshape((ends.shape[0],) + tail)


def _int_zero(x):
    import numpy as np
    return np.zeros(x.shape, dtype=jax.dtypes.float0)


def _gather_g(g, segment_ids, num_segments, scale=None):
    """Backward helper: route per-segment cotangents to rows via a gather."""
    valid = (segment_ids >= 0) & (segment_ids < num_segments)
    ids_c = jnp.where(valid, segment_ids, 0)
    g2, tail = _flat2d(g)
    gd = g2[ids_c]
    if scale is not None:
        gd = gd / scale[ids_c].astype(gd.dtype)[:, None]
    gd = jnp.where(valid[:, None], gd, 0)
    return gd.reshape((segment_ids.shape[0],) + tail)


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def segment_sum(data: jax.Array, segment_ids: jax.Array,
                num_segments: int) -> jax.Array:
    valid, order, sk, starts, ends = _plan(segment_ids, num_segments)
    return _sum_impl(data, valid, order, sk, starts, ends)


def _sum_fwd(data, segment_ids, num_segments):
    return segment_sum(data, segment_ids, num_segments), (segment_ids,)


def _sum_bwd(num_segments, res, g):
    (segment_ids,) = res
    return (_gather_g(g, segment_ids, num_segments), _int_zero(segment_ids))


segment_sum.defvjp(_sum_fwd, _sum_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def segment_mean(data: jax.Array, segment_ids: jax.Array,
                 num_segments: int) -> jax.Array:
    out, _ = _mean_impl(data, segment_ids, num_segments)
    return out


def _mean_impl(data, segment_ids, num_segments):
    valid, order, sk, starts, ends = _plan(segment_ids, num_segments)
    counts = jnp.maximum(ends - starts, 1)
    s = _sum_impl(data, valid, order, sk, starts, ends)
    c = counts.reshape(counts.shape + (1,) * (s.ndim - 1))
    if jnp.issubdtype(s.dtype, jnp.floating):
        return s / c.astype(s.dtype), counts
    return s / c, counts  # int data: true-divide promotes, like jax.ops path


def _mean_fwd(data, segment_ids, num_segments):
    out, counts = _mean_impl(data, segment_ids, num_segments)
    return out, (segment_ids, counts)


def _mean_bwd(num_segments, res, g):
    segment_ids, counts = res
    return (_gather_g(g, segment_ids, num_segments, scale=counts),
            _int_zero(segment_ids))


segment_mean.defvjp(_mean_fwd, _mean_bwd)


def _extreme(data, segment_ids, num_segments, fill_value, mode):
    valid, order, sk, starts, ends = _plan(segment_ids, num_segments)
    d2, tail = _flat2d(data)
    c = d2.shape[1]

    sv = jax.lax.stop_gradient(d2)[order]
    # padding rows sort last and only ever combine among themselves (their
    # segment id `num_segments` is never queried), so no masking is needed
    fs = _seg_flags(sk)
    iv = jnp.broadcast_to(order[:, None], (order.shape[0], c))

    if mode == "max":
        def better(vb, va):
            return vb > va          # strict: earlier row wins ties
    else:
        def better(vb, va):
            return vb < va

    def comb(a, b):
        fa, va, ia = a
        fb, vb, ib = b
        take_b = fb[:, None] | better(vb, va)
        return (fa | fb,
                jnp.where(take_b, vb, va),
                jnp.where(take_b, ib, ia))

    _, _, run_i = jax.lax.associative_scan(comb, (fs, sv, iv), axis=0)

    nonempty = ends > starts
    last = jnp.maximum(ends - 1, 0)
    arg = jnp.where(nonempty[:, None], run_i[last], 0)  # (S, C) rows of data
    vals = jnp.take_along_axis(d2, arg, axis=0)          # grad: (S,C) scatter
    if fill_value is None:
        fill_value = jnp.zeros((), dtype=d2.dtype)
    out = jnp.where(nonempty[:, None], vals, fill_value)
    s = ends.shape[0]
    return out.reshape((s,) + tail), arg.reshape((s,) + tail), nonempty


def segment_max(data, segment_ids, num_segments, fill_value=None):
    out, _, _ = _extreme(data, segment_ids, num_segments, fill_value, "max")
    return out


def segment_min(data, segment_ids, num_segments, fill_value=None):
    out, _, _ = _extreme(data, segment_ids, num_segments, fill_value, "min")
    return out


def segment_argmax(data, segment_ids, num_segments):
    _, arg, _ = _extreme(data, segment_ids, num_segments, None, "max")
    return arg
