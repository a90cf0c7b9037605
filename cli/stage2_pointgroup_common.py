"""Shared batch assembly for PointGroup training/testing (host side).

Mirrors the reference collate (pointgroup/data/scannetv2_inst.py:171-380):
augment -> voxelize -> concat scenes -> instance bookkeeping (compact ids,
per-point centroid, per-instance point counts)."""

from __future__ import annotations

import os
from typing import NamedTuple

import numpy as np

from seggroup_tpu.data import transforms as T
from seggroup_tpu.models.pointgroup import IGNORE

VALID_CLASS_IDS = (1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 14, 16, 24, 28, 33, 34, 36, 39)
NYU40_TO_20 = np.full(41, IGNORE, np.int32)
for _i, _c in enumerate(VALID_CLASS_IDS):
    NYU40_TO_20[_c] = _i


class PGHostBatch(NamedTuple):
    coords: np.ndarray          # (N, 3) float
    feats: np.ndarray           # (N, C)
    batch_ids: np.ndarray       # (N,)
    valid: np.ndarray           # (N,)
    labels: np.ndarray          # (N,) 20-class or IGNORE
    instance_labels: np.ndarray  # (N,) compact or IGNORE
    instance_centroid: np.ndarray  # (N, 3)
    instance_pointnum: np.ndarray  # (I_cap,)
    sem_nyu40: np.ndarray       # (N,) for eval gt ids


def scene_instance_tuple(scene, extras, pseudo_root, name):
    pts = np.asarray(scene.points)
    coords = pts[:, :3].astype(np.float32)
    colors = ((pts[:, 3:] + 1.0) * 127.5).astype(np.float32)
    if pseudo_root is not None:
        sem = np.loadtxt(os.path.join(pseudo_root, name, "ins_infer",
                                      "final.sem.txt"), dtype=np.int64)
        ins = np.loadtxt(os.path.join(pseudo_root, name, "ins_infer",
                                      "final.ins.txt"), dtype=np.int64)
        if "mapping" in extras:  # exported at original-vertex resolution
            sem = sem[extras["mapping"]]
            ins = ins[extras["mapping"]]
        else:
            sem = sem[: len(coords)]
            ins = ins[: len(coords)]
        # drop wall/floor instances (reference prepare_data_inst2.py:63-64)
        ins = np.where((sem == 1) | (sem == 2), 0, np.maximum(ins, 0))
        sem = np.clip(sem, 0, 40)
    else:
        sem = np.asarray(scene.real_sem).astype(np.int64)
        ins = np.asarray(scene.real_ins).astype(np.int64)
    return coords, colors, sem.astype(np.int32), ins.astype(np.int32)


def make_pg_batch(tuples, n_cap, i_cap, rng=None, augment=False,
                  max_points_per_scene=None, crop_scale=50.0,
                  crop_full_scale=512):
    """tuples: list of (coords, colors, sem_nyu40 (0=unlabeled), ins (0=none)).

    Over-budget scenes are cut by the reference's *spatial* crop (a random
    [0, full_scale)^3 window whose xy extent shrinks until the scene fits —
    pointgroup data/scannetv2_inst.py:142-158, on voxel-scaled coords at
    scale 50), not first-N truncation, so the surviving points stay a
    spatially coherent region."""
    cs, fs, bs, ls, il, sn = [], [], [], [], [], []
    total, next_inst = 0, 0
    for b, (coords, colors, sem, ins) in enumerate(tuples):
        if augment:
            coords, colors = T.default_train_transform(coords, colors, rng)
        budget = n_cap - total
        if max_points_per_scene:
            budget = min(budget, max_points_per_scene)
        if len(coords) > budget:
            # eval path (rng=None): deterministic crops, but seeded per
            # scene index so different scenes don't all share one 'random'
            # window (which would bias evaluation coverage)
            crop_rng = rng if rng is not None else np.random.default_rng(b)
            xyz = (coords - coords.min(0)) * crop_scale
            _, mask = T.spatial_crop(xyz, budget, crop_rng,
                                     full_scale=crop_full_scale)
            coords, colors, sem, ins = (coords[mask], colors[mask],
                                        sem[mask], ins[mask])
        lab20 = NYU40_TO_20[np.clip(sem, 0, 40)]
        inst = np.full(len(ins), IGNORE, np.int32)
        for u in np.unique(ins):
            if u <= 0:
                continue
            inst[ins == u] = next_inst
            next_inst += 1
        cs.append(coords); fs.append(colors / 127.5 - 1.0)
        bs.append(np.full(len(coords), b, np.int32))
        ls.append(lab20); il.append(inst); sn.append(sem)
        total += len(coords)
        if total >= n_cap:
            break

    n = min(total, n_cap)
    coords = np.zeros((n_cap, 3), np.float32)
    feats = np.zeros((n_cap, 3), np.float32)
    batch_ids = np.zeros(n_cap, np.int32)
    labels = np.full(n_cap, IGNORE, np.int32)
    inst = np.full(n_cap, IGNORE, np.int32)
    semn = np.zeros(n_cap, np.int32)
    coords[:n] = np.concatenate(cs)[:n]
    feats[:n] = np.concatenate(fs)[:n]
    batch_ids[:n] = np.concatenate(bs)[:n]
    labels[:n] = np.concatenate(ls)[:n]
    inst[:n] = np.concatenate(il)[:n]
    semn[:n] = np.concatenate(sn)[:n]
    valid = np.zeros(n_cap, bool)
    valid[:n] = True

    centroid = np.zeros((n_cap, 3), np.float32)
    pointnum = np.zeros(i_cap, np.int32)
    for u in np.unique(inst):
        if u == IGNORE or u >= i_cap:
            continue
        sel = inst == u
        centroid[sel] = coords[sel].mean(0)
        pointnum[u] = sel.sum()
    inst = np.where((inst != IGNORE) & (inst < i_cap), inst, IGNORE)
    return PGHostBatch(coords, feats, batch_ids, valid, labels, inst,
                       centroid, pointnum, semn)


def host_voxelize_plan(hb: PGHostBatch, voxel_size: float, voxel_cap: int,
                       level_caps=None, window_levels: int | None = 0):
    """Host-side voxelization + (optional) 7-level UNet plan for PointGroup.

    The reference builds every spconv rulebook host-side (pointgroup
    voxelize.cpp:59-152); this is the same division of labour — voxel dedup,
    lexicographic ordering and the full pyramid plan run in the prefetch
    worker so the device never waits for rulebook construction
    (sparse/plan.py). Returns (voxel_coords (cap,4) int32 lex-sorted,
    num_voxels, point2voxel (N,) with voxel_cap for dropped/invalid points,
    plan | None).

    window_levels defaults to 0 for PointGroup (no Pallas windowed-gather
    levels): at m=16 the channel counts (6..112) pad to 128 MXU lanes, so
    the one-hot in-window gather buys little over the XLA gather, while each
    windowed level adds ~9 Mosaic kernels to an already-huge train-step
    program — measured r3: windows take the step's StableHLO from 4.0 MB to
    9.5 MB, and the remote TPU compile helper OOMs on the windowed program
    at the full 2^19-pt/2^18-vox reference budget."""
    from seggroup_tpu import native
    from seggroup_tpu.sparse.plan import build_unet_plan

    n_valid = int(hb.valid.sum())
    ic = np.floor(hb.coords[:n_valid] / voxel_size).astype(np.int32)
    if n_valid:
        ic -= ic.min(0)
    p2v_c, vc = native.voxelize_rulebook(ic, hb.batch_ids[:n_valid])
    order = np.lexsort((vc[:, 3], vc[:, 2], vc[:, 1], vc[:, 0]))
    rank = np.empty(len(vc), np.int32)
    rank[order] = np.arange(len(vc), dtype=np.int32)
    m = min(len(vc), voxel_cap)
    vcoords = np.zeros((voxel_cap, 4), np.int32)
    vcoords[:m] = vc[order][:m]
    p2v = np.full(len(hb.coords), voxel_cap, np.int32)
    ranked = rank[p2v_c]
    p2v[:n_valid] = np.where(ranked < voxel_cap, ranked, voxel_cap)
    plan = None
    if level_caps is not None:
        plan = build_unet_plan(vcoords, m, level_caps,
                               window_levels=window_levels)
    return vcoords, np.int32(m), p2v, plan


# wire format lives in the library; re-exported here for the CLIs
from seggroup_tpu.data.pg_wire import pack_pg_batch, unpack_pg_batch  # noqa: E402,F401
