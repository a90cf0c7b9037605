"""Point-axis (context-parallel analog) sharding: sharded edge conv must
equal the single-device computation exactly."""

import jax
import jax.numpy as jnp
import numpy as np

from seggroup_tpu.parallel.dp import make_mesh
from seggroup_tpu.parallel.point_sharding import point_sharded_edge_conv


def test_point_sharded_edge_conv_matches_single_device(rng):
    n, k, f, c = 1024, 16, 9, 32
    x = rng.normal(size=(n, f)).astype(np.float32)
    idx = rng.integers(0, n, size=(n, k)).astype(np.int32)
    w = rng.normal(size=(2 * f, c)).astype(np.float32) * 0.1

    def single(x, idx, w):
        nbr = x[idx]
        self_f = x[:, None, :]
        feat = np.concatenate(
            [nbr - self_f, np.broadcast_to(self_f, nbr.shape)], axis=-1
        )
        return np.maximum(feat @ w, 0.0).max(1)

    want = single(x, idx, w)
    mesh = make_mesh()
    got = np.asarray(
        point_sharded_edge_conv(mesh, jnp.array(x), jnp.array(idx),
                                jnp.array(w))
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
    # and the output really is point-sharded across all 8 devices
    out = point_sharded_edge_conv(mesh, jnp.array(x), jnp.array(idx),
                                  jnp.array(w))
    assert len(out.sharding.device_set) == 8
