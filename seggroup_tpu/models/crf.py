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
    most M distinct cells), keyed by a sorted hash like sparse/hashing.py —
    a *triple* int32 key (batch+x, y+z, rgb) so the 6-D cell space never
    wraps 32 bits (a single packed key would alias for realistic scenes:
    ~500 spatial cells/axis x ~23 chromatic cells/axis is ~1e12 >> 2^32).

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


def _hypercross_offsets(ndim: int) -> jnp.ndarray:
    """Center + 2*ndim face neighbors (reference wrapper_region_type=1)."""
    offs = [jnp.zeros((ndim,), jnp.int32)]
    for d in range(ndim):
        for s in (-1, 1):
            o = jnp.zeros((ndim,), jnp.int32).at[d].set(s)
            offs.append(o)
    return jnp.stack(offs)  # (2*ndim+1, ndim)


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
    temporal: bool = False  # 7-D trilateral grid (reference is_temporal)

    @nn.compact
    def __call__(self, logits: jax.Array, st: SparseTensor,
                 colors: jax.Array, times: jax.Array | None = None) -> jax.Array:
        """`times` (optional, (M,) int32): per-voxel frame index for the
        trilateral (temporal) grid — the reference's 7th dimension with
        temporal sigma 1 (conditional_random_fields.py:23-26,108-113). Only
        read when `temporal`; defaults to all-zero (a static scene)."""
        m = st.capacity
        c = self.channels
        ndim = 7 if self.temporal else 6
        offsets = _hypercross_offsets(ndim)
        k = offsets.shape[0]
        w = self.param(
            "kernel",
            nn.initializers.variance_scaling(1.0, "fan_in", "truncated_normal"),
            (k, c, c),
        )

        # --- bilateral 6-D / trilateral 7-D cells ------------------------
        sp = jnp.floor(st.coords[:, 1:4].astype(jnp.float32)
                       / self.spatial_sigma).astype(jnp.int32)
        ch = jnp.floor(colors.astype(jnp.float32)
                       / self.chromatic_sigma).astype(jnp.int32)
        parts = [sp, ch]
        if self.temporal:
            t = (jnp.zeros((m,), jnp.int32) if times is None
                 else times.astype(jnp.int32))
            parts.append(t[:, None])  # temporal sigma 1: unquantized
        cell = jnp.concatenate(parts, axis=1)  # (M, ndim)
        lo = jnp.min(jnp.where(st.valid[:, None], cell, 2 ** 20), axis=0)
        cell = cell - lo + 1  # leave halo >= 0 for the -1 offsets
        hi = jnp.max(jnp.where(st.valid[:, None], cell, 0), axis=0)
        dims = hi + 2

        # Triple int32 key: ((batch·dimsT + t)·dims0 + c0, c1·dims2 + c2,
        # (c3·dims4 + c4)·dims5 + c5). Each component stays far below 2^31
        # for any realistic sigma / scene extent, so distinct cells never
        # alias (cf. sparse/hashing.py's (hi, lo) pair for 4-D coords).
        batch_idx = st.coords[:, 0].astype(jnp.int32)

        def keys_of(cells, b):
            k0 = b
            if self.temporal:
                k0 = k0 * dims[6] + cells[:, 6]
            k0 = k0 * dims[0] + cells[:, 0]
            k1 = cells[:, 1] * dims[2] + cells[:, 2]
            k2 = (cells[:, 3] * dims[4] + cells[:, 4]) * dims[5] + cells[:, 5]
            return k0.astype(jnp.int32), k1.astype(jnp.int32), k2.astype(jnp.int32)

        big = jnp.int32(jnp.iinfo(jnp.int32).max)
        k0, k1, k2 = keys_of(cell, batch_idx)
        k0 = jnp.where(st.valid, k0, big)
        k1 = jnp.where(st.valid, k1, big)
        k2 = jnp.where(st.valid, k2, big)
        order = jnp.lexsort((k2, k1, k0)).astype(jnp.int32)
        s0, s1, s2 = k0[order], k1[order], k2[order]

        def lower_bound(q0, q1, q2):
            """First sorted position >= the query triple (vectorized binary
            search; ~log2(M) steps)."""
            steps = max(1, int(m).bit_length())
            lo_b = jnp.zeros(q0.shape, jnp.int32)
            hi_b = jnp.full(q0.shape, m, jnp.int32)

            def body(_, carry):
                lo_bound, hi_bound = carry
                mid = (lo_bound + hi_bound) // 2
                p = jnp.minimum(mid, m - 1)
                m0, m1, m2 = s0[p], s1[p], s2[p]
                less = ((m0 < q0)
                        | ((m0 == q0) & (m1 < q1))
                        | ((m0 == q0) & (m1 == q1) & (m2 < q2)))
                lo_bound = jnp.where(less, mid + 1, lo_bound)
                hi_bound = jnp.where(less, hi_bound, mid)
                return lo_bound, hi_bound

            lo_b, _ = jax.lax.fori_loop(0, steps, body, (lo_b, hi_b))
            p = jnp.minimum(lo_b, m - 1)
            hit = (s0[p] == q0) & (s1[p] == q1) & (s2[p] == q2)
            return lo_b, hit

        # cell id per voxel: rank of first occurrence in sorted keys
        first, _ = lower_bound(k0, k1, k2)
        cell_id = jnp.where(st.valid, first, m)  # padding -> dropped row

        # per-offset target cell row (in sorted-key space), once — the grid
        # doesn't change across iterations
        tgt_rows = []
        tgt_ok = []
        for i in range(k):
            nb = cell + offsets[i][None, :]
            n0, n1, n2 = keys_of(nb, batch_idx)
            row, hit = lower_bound(n0, n1, n2)
            ok = hit & st.valid
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
    temporal: bool = False  # TrilateralCRF (reference crf.py:157-166)

    @nn.compact
    def __call__(self, st: SparseTensor, colors: jax.Array,
                 train: bool = True, apply_filter: bool = True,
                 plan: dict | None = None,
                 times: jax.Array | None = None) -> jax.Array:
        logits = self.backbone(st, train=train, plan=plan)
        if not apply_filter:
            return logits
        return MeanFieldCRF(self.num_classes, self.spatial_sigma,
                            self.chromatic_sigma, self.iterations,
                            temporal=self.temporal,
                            name="crf")(logits, st, colors, times)
