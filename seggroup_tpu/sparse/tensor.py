"""Fixed-capacity sparse voxel tensor.

The TPU-native replacement for spconv's SparseConvTensor / MinkowskiEngine's
SparseTensor (reference pointgroup/model/pointgroup/pointgroup.py:265-268,
minkowski models). Rows beyond `num` are padding; every op is masked on
`valid`. Capacity M is static so the whole network compiles once.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class SparseTensor(NamedTuple):
    coords: jax.Array  # (M, 4) int32: batch, x, y, z (non-negative)
    feats: jax.Array   # (M, C) float32
    valid: jax.Array   # (M,) bool
    num: jax.Array     # scalar int32

    @property
    def capacity(self) -> int:
        return self.coords.shape[0]

    @property
    def channels(self) -> int:
        return self.feats.shape[-1]

    def with_feats(self, feats: jax.Array) -> "SparseTensor":
        return self._replace(feats=jnp.where(self.valid[:, None], feats, 0.0))
