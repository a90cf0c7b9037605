"""Pallas FPS kernel vs the XLA reference implementation (element-exact).
Runs in Pallas interpret mode on the CPU test mesh; the compiled path is
exercised on real TPU by bench/verify runs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jax.experimental.pallas import tpu as pltpu

from seggroup_tpu.ops.fps import masked_fps


def _pallas_fps(points, valid, k):
    from seggroup_tpu.ops.pallas_fps import masked_fps_pallas

    with pltpu.force_tpu_interpret_mode():
        return masked_fps_pallas(points, valid, k)


def test_matches_xla_fps(rng):
    b, p, k = 4, 128, 16
    pts = rng.normal(size=(b, p, 3)).astype(np.float32)
    valid = np.ones((b, p), bool)
    valid[1, 100:] = False
    valid[2, 8:] = False  # tiny cluster: fewer valid points than k
    want = np.asarray(masked_fps(jnp.array(pts), jnp.array(valid), k))
    got = np.asarray(_pallas_fps(jnp.array(pts), jnp.array(valid), k))
    np.testing.assert_array_equal(got, want)


def test_never_selects_invalid(rng):
    b, p, k = 2, 64, 8
    pts = rng.normal(size=(b, p, 3)).astype(np.float32)
    pts[0, 50] = [100, 100, 100]  # far outlier in the invalid region
    valid = np.ones((b, p), bool)
    valid[0, 40:] = False
    got = np.asarray(_pallas_fps(jnp.array(pts), jnp.array(valid), k))
    assert (got[0] < 40).all()
