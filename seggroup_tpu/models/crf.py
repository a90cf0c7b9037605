"""Bilateral mean-field CRF wrapper, TPU-native.

Reimplements the reference's MeanField / BilateralCRF wrapper (reference
minkowski/models/conditional_random_fields.py:14-155, wrapper.py:7-30):
the backbone's per-voxel logits are refined by `iterations` mean-field steps
whose pairwise potential is a *learned sparse convolution over a bilateral
grid* — voxels are re-keyed by (batch, floor(xyz/spatial_sigma),
floor(rgb/chromatic_sigma)) so message passing couples voxels that are close
in space AND color.

TPU re-design (vs the reference's 6-D MinkowskiEngine convolution):
  * the bilateral "conv" is linear per kernel offset, so same-cell features
    are pre-summed per cell (one segment-sum) and each offset's message is a
    single (cells, C) gather + (K, C, C) einsum — no 6-D coordinate manager,
    no duplicate-coordinate special cases;
  * the kernel region is the 6-D hypercross (center + 2*6 face neighbors =
    13 offsets; reference wrapper_region_type=1, config.py:36-38) — a
    hypercube k=3 would be 3^6=729 offsets for no reported gain;
  * fixed shapes: cells live in the same M rows as the voxels (there are at
    most M distinct cells), keyed by a sorted hash like sparse/hashing.py.

Mean-field update (reference forward, conditional_random_fields.py:122-137):
    out = unary
    repeat iterations:
        out = softmax(out)
        out = pairwise_conv(out)
        out = out + unary
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from seggroup_tpu.sparse.tensor import SparseTensor

__all__ = ["MeanFieldCRF", "CRFWrapped"]


def _hypercross_offsets_6d() -> jnp.ndarray:
    offs = [jnp.zeros((6,), jnp.int32)]
    for d in range(6):
        for s in (-1, 1):
            o = jnp.zeros((6,), jnp.int32).at[d].set(s)
            offs.append(o)
    return jnp.stack(offs)  # (13, 6)


class MeanFieldCRF(nn.Module):
    """`iterations` mean-field steps over the bilateral grid.

    channels:        logit width (num classes).
    spatial_sigma:   xyz quantization of the bilateral grid, in voxel units
                     (reference crf_spatial_sigma=1, config.py:40).
    chromatic_sigma: rgb quantization (reference crf_chromatic_sigma=12).
    iterations:      mean-field iterations (reference meanfield_iterations=10).
    """

    channels: int
    spatial_sigma: float = 1.0
    chromatic_sigma: float = 12.0
    iterations: int = 10

    @nn.compact
    def __call__(self, logits: jax.Array, st: SparseTensor,
                 colors: jax.Array) -> jax.Array:
        m = st.capacity
        c = self.channels
        offsets = _hypercross_offsets_6d()
        k = offsets.shape[0]
        w = self.param(
            "kernel",
            nn.initializers.variance_scaling(1.0, "fan_in", "truncated_normal"),
            (k, c, c),
        )

        # --- bilateral 6-D cells -----------------------------------------
        sp = jnp.floor(st.coords[:, 1:4].astype(jnp.float32)
                       / self.spatial_sigma).astype(jnp.int32)
        ch = jnp.floor(colors.astype(jnp.float32)
                       / self.chromatic_sigma).astype(jnp.int32)
        cell = jnp.concatenate([sp, ch], axis=1)  # (M, 6)
        lo = jnp.min(jnp.where(st.valid[:, None], cell, 2 ** 20), axis=0)
        cell = cell - lo + 1  # leave halo >= 0 for the -1 offsets
        hi = jnp.max(jnp.where(st.valid[:, None], cell, 0), axis=0)
        dims = hi + 2

        def key_of(cells6):
            key = cells6[:, 0].astype(jnp.uint32)
            for d in range(1, 6):
                key = key * dims[d].astype(jnp.uint32) + cells6[:, d].astype(
                    jnp.uint32)
            return key

        span = jnp.uint32(1)
        for d in range(6):
            span = span * dims[d].astype(jnp.uint32)
        key = key_of(cell) + st.coords[:, 0].astype(jnp.uint32) * span
        key = jnp.where(st.valid, key, jnp.uint32(0xFFFFFFFF))
        order = jnp.argsort(key).astype(jnp.int32)
        skey = key[order]
        # cell id per voxel: rank of first occurrence in sorted keys
        first = jnp.searchsorted(skey, key).astype(jnp.int32)
        cell_id = jnp.where(st.valid, first, m)  # padding -> dropped row

        # per-offset target cell row (in sorted-key space), once — the grid
        # doesn't change across iterations
        tgt_rows = []
        tgt_ok = []
        for i in range(k):
            nb = cell + offsets[i][None, :]
            nkey = key_of(nb) + st.coords[:, 0].astype(jnp.uint32) * span
            row = jnp.searchsorted(skey, nkey).astype(jnp.int32)
            ok = (skey[jnp.minimum(row, m - 1)] == nkey) & st.valid
            tgt_rows.append(jnp.where(ok, row, m))
            tgt_ok.append(ok)
        tgt_rows = jnp.stack(tgt_rows, axis=1)  # (M, K)
        tgt_ok = jnp.stack(tgt_ok, axis=1)      # (M, K)

        unary = jnp.where(st.valid[:, None], logits, 0.0)

        def pairwise(x):
            # sum features per cell (rows indexed like sorted keys)
            cell_sum = jnp.zeros((m + 1, c), x.dtype).at[cell_id].add(
                jnp.where(st.valid[:, None], x, 0.0))
            msgs = cell_sum[jnp.minimum(tgt_rows, m)]          # (M, K, C)
            msgs = jnp.where(tgt_ok[..., None], msgs, 0.0)
            return jnp.einsum("mkc,kcd->md", msgs, w,
                              preferred_element_type=jnp.float32)

        out = unary
        for _ in range(self.iterations):
            out = jax.nn.softmax(out, axis=-1)
            out = pairwise(out)
            out = out + unary
        return jnp.where(st.valid[:, None], out, 0.0)


class CRFWrapped(nn.Module):
    """Backbone + CRF filter (reference Wrapper, wrapper.py:7-30). During
    training the filter is applied stochastically (p=0.5 in the reference,
    wrapper.py:24) so the backbone stays filter-invariant; pass
    `apply_filter` from a host coin flip to reproduce that."""

    backbone: nn.Module
    num_classes: int = 20
    spatial_sigma: float = 1.0
    chromatic_sigma: float = 12.0
    iterations: int = 10

    @nn.compact
    def __call__(self, st: SparseTensor, colors: jax.Array,
                 train: bool = True, apply_filter: bool = True,
                 plan: dict | None = None) -> jax.Array:
        logits = self.backbone(st, train=train, plan=plan)
        if not apply_filter:
            return logits
        return MeanFieldCRF(self.num_classes, self.spatial_sigma,
                            self.chromatic_sigma, self.iterations,
                            name="crf")(logits, st, colors)
