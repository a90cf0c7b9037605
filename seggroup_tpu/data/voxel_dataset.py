"""Voxelization dataset: scenes -> fixed-capacity SparseTensor batches.

Host-side analog of the reference's VoxelizationDataset + cfl_collate
(reference minkowski/lib/dataset.py:243-302, lib/transforms.py:237-300) and of
pointgroup's trainMerge (data/scannetv2_inst.py:171-249): quantize at
voxel_size, dedup per voxel, concatenate scenes with batch indices, pad to a
static capacity. Per-voxel label = label of the first point in the voxel
(ME.sparse_quantize behaviour). Returns numpy; callers device_put once.
"""

from __future__ import annotations

from typing import Iterable, NamedTuple

import numpy as np

from seggroup_tpu.data import transforms as T


class VoxelBatch(NamedTuple):
    coords: np.ndarray   # (M, 4) int32 batch,x,y,z
    feats: np.ndarray    # (M, C) float32
    labels: np.ndarray   # (M,) int32 (ignore = 255)
    valid: np.ndarray    # (M,) bool
    num: np.ndarray      # () int32
    point2voxel: list    # per-scene (N_i,) mapping for point-level eval;
                         # -1 marks points whose voxel overflowed capacity


IGNORE_LABEL = 255


def voxelize_scene(coords: np.ndarray, colors: np.ndarray, labels: np.ndarray,
                   voxel_size: float):
    """Returns (int_coords (V,3), feats (V,3), labels (V,), point2voxel (N,)).
    Uses the native C++ rulebook builder when available (csrc/, the analog of
    reference voxelize.cpp:59-152).

    Voxels come out LEXICOGRAPHICALLY sorted by (x,y,z): the sparse engine's
    windowed Pallas gather (sparse/pallas_conv.py) relies on sorted rows for
    tight neighbor windows (unsorted input still works — the engine falls
    back to the global gather — just slower)."""
    from seggroup_tpu import native

    fused = native.voxelize_sorted(coords, voxel_size)
    if fused is not None:
        ic_s, first, p2v = fused
        return ic_s, colors[first], labels[first], p2v

    ic = np.floor(coords / voxel_size).astype(np.int32)
    ic -= ic.min(0)
    p2v, vc = native.voxelize_rulebook(ic, np.zeros(len(ic), np.int32))
    # first occurrence of each voxel id (ME.sparse_quantize first-point rule)
    seen = np.full(len(vc), -1, np.int64)
    seen[p2v[::-1]] = np.arange(len(ic))[::-1]
    first = seen
    order = np.lexsort((vc[:, 3], vc[:, 2], vc[:, 1]))
    rank = np.empty(len(vc), np.int32)
    rank[order] = np.arange(len(vc), dtype=np.int32)
    return (vc[order][:, 1:4], colors[first[order]], labels[first[order]],
            rank[p2v])


def make_voxel_batch(
    scenes: Iterable[tuple[np.ndarray, np.ndarray, np.ndarray]],
    capacity: int,
    voxel_size: float = 0.02,
    rng: np.random.Generator | None = None,
    augment: bool = False,
    feat_norm: bool = True,
    dropout_ratio: float = 0.2,
) -> VoxelBatch:
    """scenes: iterable of (coords (N,3) meters, colors (N,3) 0..255,
    labels (N,) int with IGNORE_LABEL for unlabeled).

    When augment=True the reference training recipe applies, including
    RandomDropout (minkowski lib/dataset.py:451, transforms.py:141-156)
    before the geometric/chromatic transforms."""
    all_c, all_f, all_l, p2v_list = [], [], [], []
    total = 0
    for b, (coords, colors, labels) in enumerate(scenes):
        if augment:
            assert rng is not None
            if dropout_ratio:
                coords, colors, labels = T.random_dropout(
                    coords, colors, labels, rng, dropout_ratio)
            coords, colors = T.default_train_transform(coords, colors, rng)
        ic, f, l, p2v = voxelize_scene(coords, colors, labels, voxel_size)
        keep = min(len(ic), capacity - total)
        if keep < len(ic):
            ic, f, l = ic[:keep], f[:keep], l[:keep]
            # points whose voxel was dropped get sentinel -1 so point-level
            # eval can EXCLUDE them instead of silently scoring them with
            # voxel 0's prediction
            p2v = np.where(p2v < keep, p2v, -1 - total)  # -1 after offset
        bc = np.concatenate([np.full((len(ic), 1), b, np.int32), ic], axis=1)
        all_c.append(bc)
        all_f.append(f)
        all_l.append(l)
        p2v_list.append(p2v + total)
        total += len(ic)
        if total >= capacity:
            break

    coords = np.zeros((capacity, 4), np.int32)
    feats = np.zeros((capacity, 3), np.float32)
    labels = np.full((capacity,), IGNORE_LABEL, np.int32)
    n = min(total, capacity)
    coords[:n] = np.concatenate(all_c)[:n]
    feats[:n] = np.concatenate(all_f)[:n]
    labels[:n] = np.concatenate(all_l)[:n]
    if feat_norm:
        feats = feats / 127.5 - 1.0  # match stage-1 color convention
    valid = np.zeros(capacity, bool)
    valid[:n] = True
    return VoxelBatch(coords, feats, labels, valid, np.int32(n), p2v_list)
