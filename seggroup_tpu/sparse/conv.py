"""Gather-GEMM-scatter sparse convolution engine.

One engine replaces three reference native stacks (SURVEY.md §2.6 items 8-9
and the KPConv gather path): spconv's SubMConv3d/SparseConv3d/
SparseInverseConv3d (reference pointgroup/model/pointgroup/pointgroup.py:19-157)
and MinkowskiEngine's generalized sparse conv (reference minkowski models).

Design (TPU-first):
  * rulebooks are built on device from lexsorted coordinate keys
    (sparse/hashing.py) — a (M, K) neighbor-index table per kernel instead of
    spconv's host-built CSR pair lists;
  * the conv itself is K gathers + K dense (M, Cin) x (Cin, Cout) matmuls —
    each one lands on the MXU; padding rows are masked, XLA fuses the adds;
  * stride-2 kernel-2 down/up convs exploit the fact that kernel 2 / stride 2
    PARTITIONS fine voxels: down is a segment-sum over out = in//2, up is a
    single gather (the transpose), matching spconv's indice_key reuse
    semantics (pointgroup.py:35-38) by construction (output coords of up are
    exactly the saved finer-level coords).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from seggroup_tpu.ops.segment_ops import segment_sum
from seggroup_tpu.sparse.hashing import lookup, pack_keys, sort_coords
from seggroup_tpu.sparse.tensor import SparseTensor


def kernel_offsets(kernel_size: int) -> np.ndarray:
    """(K, 3) integer offsets, centered for odd kernels ({-1,0,1} for 3)."""
    r = np.arange(kernel_size) - (kernel_size - 1) // 2
    g = np.stack(np.meshgrid(r, r, r, indexing="ij"), -1).reshape(-1, 3)
    return g.astype(np.int32)


def build_subm_rulebook(st: SparseTensor, kernel_size: int = 3) -> jax.Array:
    """(M, K) neighbor row index per kernel offset; == M where absent.
    Output sites == input sites (submanifold semantics)."""
    offs = jnp.asarray(kernel_offsets(kernel_size))  # (K, 3)
    order, hi_s, lo_s = sort_coords(st.coords, st.valid)
    m = st.capacity

    def per_offset(off):
        q = st.coords.at[:, 1:4].add(off[None, :])
        in_range = jnp.all(q[:, 1:4] >= 0, axis=1)  # negative coords never pack
        q_hi, q_lo = pack_keys(q)
        pos = lookup(hi_s, lo_s, q_hi, q_lo)  # sorted positions or M
        idx = jnp.where(pos < m, order[jnp.minimum(pos, m - 1)], m)
        return jnp.where(st.valid & in_range, idx, m)

    nbr = jax.vmap(per_offset)(offs)  # (K, M)
    return nbr.T.astype(jnp.int32)  # (M, K)


def subm_conv(
    st: SparseTensor, weights: jax.Array, rulebook: jax.Array,
    compute_dtype=jnp.bfloat16,
) -> jax.Array:
    """weights (K, Cin, Cout); returns (M, Cout) float32. out[i] = sum_k
    W[k]^T feats[nbr[i,k]] over present neighbors.

    The gathered (M, K, Cin) block rides in `compute_dtype` (bf16 by default
    — gathers are byte-bound on TPU and bf16 is MXU-native); accumulation is
    always f32 via preferred_element_type."""
    feats = jnp.where(st.valid[:, None], st.feats, 0.0).astype(compute_dtype)
    # pad row M with zeros so absent neighbors contribute nothing
    feats_pad = jnp.concatenate(
        [feats, jnp.zeros((1, feats.shape[1]), compute_dtype)], axis=0
    )
    # ONE gather + ONE contraction: (M, K, Cin) x (K, Cin, Cout) lowers to a
    # single (M, K*Cin) @ (K*Cin, Cout) MXU matmul — 27x fewer HLO ops than
    # per-offset gathers (compile time) and full MXU utilization (runtime)
    g = feats_pad[rulebook]  # (M, K, Cin)
    out = jnp.einsum("mkc,kco->mo", g, weights.astype(compute_dtype),
                     preferred_element_type=jnp.float32)
    return jnp.where(st.valid[:, None], out, 0.0)


@partial(jax.jit, static_argnames=("cap_out",))
def downsample_coords(st: SparseTensor, cap_out: int):
    """Unique coords//2 (stride-2 output sites) + the per-input output row and
    kernel index. Returns (coords_out (Mo,4), valid_out, num_out,
    out_row (M,), delta (M,))."""
    m = st.capacity
    c = st.coords
    half = jnp.concatenate([c[:, :1], c[:, 1:4] >> 1], axis=1)
    delta = c[:, 1] % 2 * 4 + c[:, 2] % 2 * 2 + c[:, 3] % 2  # in {0..7}

    # compact unique halved coords (same lexsort trick as ops.voxelize)
    invalid = (~st.valid).astype(jnp.int32)
    order = jnp.lexsort(
        (half[:, 3], half[:, 2], half[:, 1], half[:, 0], invalid)
    ).astype(jnp.int32)
    s_half = half[order]
    s_ok = st.valid[order]
    prev_same = jnp.all(s_half[1:] == s_half[:-1], axis=1)
    firsts = jnp.concatenate([jnp.array([True]), ~prev_same]) & s_ok
    compact_sorted = jnp.cumsum(firsts.astype(jnp.int32)) - 1
    num_out = jnp.sum(firsts.astype(jnp.int32))
    row_sorted = jnp.where(
        s_ok & (compact_sorted < cap_out), compact_sorted, cap_out
    )
    out_row = jnp.zeros((m,), jnp.int32).at[order].set(row_sorted)

    coords_out = segment_sum(
        jnp.where(firsts[:, None], s_half, 0), jnp.where(firsts, row_sorted, -1),
        cap_out,
    ).astype(jnp.int32)
    valid_out = jnp.arange(cap_out) < num_out
    return coords_out, valid_out, num_out, out_row, delta.astype(jnp.int32)


def strided_conv_down(
    st: SparseTensor, weights: jax.Array, cap_out: int
) -> tuple[SparseTensor, dict]:
    """Kernel-2 stride-2 sparse conv (spconv SparseConv3d(k=2,s=2) /
    MinkowskiConvolution(k=2,s=2)). weights (8, Cin, Cout). Also returns the
    `indice_key` dict needed by the matching inverse conv."""
    coords_out, valid_out, num_out, out_row, delta = downsample_coords(
        st, cap_out
    )
    feats = jnp.where(st.valid[:, None], st.feats, 0.0)
    cout = weights.shape[2]
    out = jnp.zeros((cap_out, cout), jnp.float32)
    for kk in range(8):
        sel = (delta == kk) & st.valid
        contrib = jnp.dot(
            jnp.where(sel[:, None], feats, 0.0), weights[kk],
            preferred_element_type=jnp.float32,
        )
        out = out + segment_sum(contrib, jnp.where(sel, out_row, -1), cap_out)
    st_out = SparseTensor(coords_out, out, valid_out, num_out)
    key = {"out_row": out_row, "delta": delta, "fine_coords": st.coords,
           "fine_valid": st.valid, "fine_num": st.num}
    return st_out, key


def inverse_conv_up(
    st_coarse: SparseTensor, weights: jax.Array, indice_key: dict
) -> SparseTensor:
    """Kernel-2 stride-2 inverse/transposed conv back to the saved fine sites
    (spconv SparseInverseConv3d / MinkowskiConvolutionTranspose(k=2,s=2)).
    weights (8, Cin, Cout). Each fine voxel reads exactly one coarse voxel."""
    out_row = indice_key["out_row"]  # (Mf,) coarse row per fine voxel
    delta = indice_key["delta"]
    fine_valid = indice_key["fine_valid"]
    cap_c = st_coarse.capacity
    feats = jnp.where(st_coarse.valid[:, None], st_coarse.feats, 0.0)
    feats_pad = jnp.concatenate([feats, jnp.zeros((1, feats.shape[1]))])
    g = feats_pad[jnp.minimum(out_row, cap_c)]  # (Mf, Cin)
    # per-delta weight apply: out[j] = W[delta_j]^T g[j]
    w_per = weights[delta]  # (Mf, Cin, Cout)
    out = jnp.einsum("mi,mio->mo", g, w_per, preferred_element_type=jnp.float32)
    out = jnp.where((fine_valid & (out_row < cap_c))[:, None], out, 0.0)
    return SparseTensor(
        indice_key["fine_coords"], out, fine_valid, indice_key["fine_num"]
    )


def sparse_batch_norm_stats(feats: jax.Array, valid: jax.Array):
    """Masked mean/var over valid voxels (for flax BN with padding)."""
    m = valid.astype(feats.dtype)[:, None]
    cnt = jnp.maximum(jnp.sum(m), 1.0)
    mean = jnp.sum(feats * m, axis=0) / cnt
    var = jnp.sum(jnp.square(feats - mean) * m, axis=0) / cnt
    return mean, var


def global_pool(st: SparseTensor, num_batches: int, mode: str = "mean"):
    """Per-scene pooling (MinkowskiGlobalPooling analog)."""
    ids = jnp.where(st.valid, st.coords[:, 0], num_batches)
    if mode == "mean":
        from seggroup_tpu.ops.segment_ops import segment_mean

        return segment_mean(st.feats, ids, num_batches)
    from seggroup_tpu.ops.segment_ops import segment_max

    return segment_max(st.feats, ids, num_batches)
