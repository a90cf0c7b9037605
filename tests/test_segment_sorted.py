"""Sorted scatter-free segment reductions agree with the scatter engine."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from seggroup_tpu.ops import segment_ops as scat
from seggroup_tpu.ops import segment_sorted as srt


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def _ids(rng, n, s):
    # includes invalid ids (negative and >= s) and empty segments
    ids = rng.integers(-3, s + 5, n).astype(np.int32)
    ids[ids == s // 2] = -1  # force an empty segment
    return ids


@pytest.mark.parametrize("shape", [(257,), (257, 5)])
def test_sum_mean_match(rng, shape):
    s = 19
    data = rng.normal(size=shape).astype(np.float32)
    ids = _ids(rng, shape[0], s)
    np.testing.assert_allclose(
        srt.segment_sum(jnp.array(data), jnp.array(ids), s),
        scat.segment_sum(jnp.array(data), jnp.array(ids), s),
        rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        srt.segment_mean(jnp.array(data), jnp.array(ids), s),
        scat.segment_mean(jnp.array(data), jnp.array(ids), s),
        rtol=1e-5, atol=1e-5)


def test_sum_int_exact(rng):
    s = 11
    ids = _ids(rng, 300, s)
    data = rng.integers(0, 9, (300,)).astype(np.int32)
    np.testing.assert_array_equal(
        srt.segment_sum(jnp.array(data), jnp.array(ids), s),
        scat.segment_sum(jnp.array(data), jnp.array(ids), s))


@pytest.mark.parametrize("fill", [None, -7.0])
def test_max_min_match(rng, fill):
    s = 13
    data = rng.normal(size=(211, 4)).astype(np.float32)
    ids = _ids(rng, 211, s)
    fv = None if fill is None else jnp.float32(fill)
    for a, b in [(srt.segment_max, scat.segment_max),
                 (srt.segment_min, scat.segment_min)]:
        np.testing.assert_array_equal(
            a(jnp.array(data), jnp.array(ids), s, fill_value=fv),
            b(jnp.array(data), jnp.array(ids), s, fill_value=fv))


def test_argmax_match(rng):
    s = 9
    data = rng.normal(size=(157, 3)).astype(np.float32)
    # ties: duplicate some rows so first-index tie-breaking is exercised
    data[40] = data[10]
    ids = _ids(rng, 157, s)
    ids[40] = ids[10]
    np.testing.assert_array_equal(
        srt.segment_argmax(jnp.array(data), jnp.array(ids), s),
        scat.segment_argmax(jnp.array(data), jnp.array(ids), s))


def test_sum_mean_grads(rng):
    s = 7
    data = rng.normal(size=(123, 4)).astype(np.float32)
    ids = _ids(rng, 123, s)
    w = rng.normal(size=(s, 4)).astype(np.float32)

    for a, b in [(srt.segment_sum, scat.segment_sum),
                 (srt.segment_mean, scat.segment_mean)]:
        ga = jax.grad(lambda d: jnp.sum(
            a(d, jnp.array(ids), s) * w))(jnp.array(data))
        gb = jax.grad(lambda d: jnp.sum(
            b(d, jnp.array(ids), s) * w))(jnp.array(data))
        np.testing.assert_allclose(ga, gb, rtol=1e-5, atol=1e-6)


def test_max_grad_routes_to_single_argmax(rng):
    s = 5
    data = rng.normal(size=(61, 3)).astype(np.float32)
    ids = np.abs(_ids(rng, 61, s)) % s  # all valid for clean comparison
    w = rng.normal(size=(s, 3)).astype(np.float32)
    g = jax.grad(lambda d: jnp.sum(
        srt.segment_max(d, jnp.array(ids), s) * w))(jnp.array(data))
    # each (segment, channel) contributes its weight at exactly the argmax row
    arg = np.asarray(scat.segment_argmax(jnp.array(data), jnp.array(ids), s))
    expect = np.zeros_like(data)
    for seg in range(s):
        for c in range(3):
            expect[arg[seg, c], c] += w[seg, c]
    np.testing.assert_allclose(g, expect, rtol=1e-5, atol=1e-6)


def test_jit_and_grad_under_jit(rng):
    s = 6
    data = jnp.array(rng.normal(size=(97, 2)).astype(np.float32))
    ids = jnp.array(_ids(rng, 97, s))

    @jax.jit
    def f(d):
        return jnp.sum(srt.segment_mean(d, ids, s) ** 2) + jnp.sum(
            srt.segment_max(d, ids, s))

    v, g = jax.value_and_grad(f)(data)
    assert np.isfinite(float(v)) and np.all(np.isfinite(np.asarray(g)))


@pytest.mark.slow
def test_ndim3_and_precision(rng):
    """3-D trailing dims follow the scatter engine's shapes, and segmented
    pairwise summation stays accurate on long all-positive streams (where a
    prefix-sum-difference formulation loses ~1% on late small segments)."""
    s = 6
    data = rng.normal(size=(64, 4, 3)).astype(np.float32)
    ids = _ids(rng, 64, s)
    np.testing.assert_allclose(
        srt.segment_sum(jnp.array(data), jnp.array(ids), s),
        scat.segment_sum(jnp.array(data), jnp.array(ids), s),
        rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(
        srt.segment_argmax(jnp.array(data), jnp.array(ids), s),
        scat.segment_argmax(jnp.array(data), jnp.array(ids), s))

    n = 1 << 20
    big = np.ones((n,), np.float32)
    big_ids = np.zeros((n,), np.int32)
    big_ids[-17:] = 1  # tiny segment at the very end of the sorted stream
    out = np.asarray(srt.segment_sum(jnp.array(big), jnp.array(big_ids), 2))
    np.testing.assert_allclose(out, [n - 17, 17.0], rtol=1e-6)


def test_facade_dispatch(rng):
    """segment_ops(method=\"sorted\") routes to the sorted engine and agrees
    with the scatter default."""
    s = 8
    data = rng.normal(size=(301, 6)).astype(np.float32)
    ids = _ids(rng, 301, s)
    for name in ("segment_sum", "segment_mean", "segment_max", "segment_min"):
        a = getattr(scat, name)(jnp.array(data), jnp.array(ids), s,
                                method="sorted")
        b = getattr(scat, name)(jnp.array(data), jnp.array(ids), s)
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)
    scat.set_default_method("sorted")
    try:
        a = scat.segment_argmax(jnp.array(data), jnp.array(ids), s)
    finally:
        scat.set_default_method("scatter")
    np.testing.assert_array_equal(
        a, scat.segment_argmax(jnp.array(data), jnp.array(ids), s))
