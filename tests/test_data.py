"""Data layer: PLY IO roundtrip, prep pipeline on a synthetic raw scene,
weak-label styles, transforms, visualization."""

import json
import os

import numpy as np
import pytest

from seggroup_tpu.data import transforms as T
from seggroup_tpu.data.ply import read_ply, write_ply
from seggroup_tpu.data.scannet import (
    PrepConfig,
    generate_weak_seg_ids,
    prepare_scene,
    resample_map,
    save_scene_npz,
    load_scene_npz,
    segment_adjacency,
)
from seggroup_tpu.data.visualize import colorize_labels, visualize_labels
from seggroup_tpu.data.voxel_dataset import make_voxel_batch


def make_raw_scene(rng, v=800, n_seg=16, n_inst=4):
    verts = np.zeros((v, 6), np.float32)
    seg_labels = np.zeros(v, np.int64)
    real_sem = np.zeros(v, np.int32)
    real_ins = np.zeros(v, np.int32)
    per = v // n_seg
    centers = rng.uniform(0, 8, (n_inst, 3))
    for s in range(n_seg):
        inst = s % n_inst
        c = centers[inst] + rng.normal(scale=0.3, size=3)
        sl = slice(s * per, (s + 1) * per if s < n_seg - 1 else v)
        cnt = sl.stop - sl.start
        verts[sl, :3] = c + rng.normal(scale=0.1, size=(cnt, 3))
        verts[sl, 3:] = rng.integers(0, 255, 3)
        seg_labels[sl] = s * 7 + 3  # non-compact raw ids
        real_sem[sl] = 3 + inst
        real_ins[sl] = inst + 1
    # faces: triangles within segments + a few linking consecutive segments
    faces = []
    for s in range(n_seg):
        base = s * per
        for i in range(0, per - 3, 3):
            faces.append([base + i, base + i + 1, base + i + 2])
        if s + 1 < n_seg:
            faces.append([base, base + 1, (s + 1) * per])
    faces = np.array(faces, np.int32)
    return dict(vertices=verts, faces=faces, seg_labels=seg_labels,
                real_sem=real_sem, real_ins=real_ins)


def test_ply_roundtrip(tmp_path, rng):
    pts = {
        "x": rng.random(50).astype(np.float32),
        "y": rng.random(50).astype(np.float32),
        "z": rng.random(50).astype(np.float32),
        "red": rng.integers(0, 255, 50).astype(np.uint8),
        "green": rng.integers(0, 255, 50).astype(np.uint8),
        "blue": rng.integers(0, 255, 50).astype(np.uint8),
    }
    faces = rng.integers(0, 50, (20, 3)).astype(np.int32)
    p = str(tmp_path / "test.ply")
    write_ply(p, pts, faces)
    back = read_ply(p)
    np.testing.assert_allclose(back["vertex"]["x"], pts["x"], rtol=1e-6)
    np.testing.assert_array_equal(back["vertex"]["red"], pts["red"])
    np.testing.assert_array_equal(back["face"], faces)


def test_resample_map():
    rng = np.random.default_rng(0)
    m = resample_map(100, 350, rng)
    assert len(m) == 350
    np.testing.assert_array_equal(np.sort(np.unique(m)), np.arange(100))
    # first 300 = 3 full repeats
    np.testing.assert_array_equal(m[:100], np.arange(100))


def test_prepare_scene_roundtrip(tmp_path, rng):
    raw = make_raw_scene(rng)
    cfg = PrepConfig(num_points=1024, max_segments=32, max_edges=256)
    prep = prepare_scene(raw, cfg, style="maxseg")
    assert prep["points"].shape == (1024, 6)
    assert prep["points"][:, 3:].max() <= 1.0 + 1e-6
    assert prep["point2seg"].max() < 32
    # one weak label per instance (maxseg, connected scenes)
    labeled = prep["weak_ins"][prep["weak_ins"] >= 0]
    assert len(np.unique(labeled)) == 4
    # weak sem matches GT sem - 1 for labeled segments
    for s in np.where(prep["weak_ins"] >= 0)[0]:
        pts = prep["point2seg"] == s
        gt = prep["real_sem"][pts]
        assert prep["weak_sem"][s] == np.bincount(gt[gt > 0]).argmax() - 1

    path = str(tmp_path / "scene.npz")
    save_scene_npz(path, prep)
    scene, extras = load_scene_npz(path)
    assert scene.points.shape == (1024, 6)
    assert "unmap" in extras


def test_weak_label_styles(rng):
    raw = make_raw_scene(rng)
    adj = segment_adjacency(raw["faces"], raw["seg_labels"].astype(np.int32))
    for style in ["maxseg", "rand", "mainseg"]:
        ids = generate_weak_seg_ids(
            raw["seg_labels"], raw["real_ins"], adj, style=style,
            rng=np.random.default_rng(1), main_num=3,
        )
        assert len(ids) >= 4  # at least one per instance
        # every chosen segment belongs to exactly one instance
        for s in ids:
            sel = raw["seg_labels"] == s
            assert len(np.unique(raw["real_ins"][sel])) == 1


def test_manual_style():
    seg_labels = np.array([0, 0, 1, 1, 2, 2])
    ids = generate_weak_seg_ids(
        seg_labels, np.zeros(6, np.int32), np.zeros((0, 2), np.int32),
        style="manual", manual={"1": [0], "2": [2, 1]},
    )
    assert ids == [0, 2, 1]


def test_transforms_shapes(rng):
    coords = rng.random((500, 3)).astype(np.float32) * 4
    colors = rng.integers(0, 255, (500, 3)).astype(np.float32)
    c2, col2 = T.default_train_transform(coords, colors, rng)
    assert c2.shape == coords.shape and col2.shape == colors.shape
    assert np.isfinite(c2).all()
    assert col2.min() >= 0 and col2.max() <= 255


def test_random_dropout(rng):
    """Reference RandomDropout semantics (minkowski lib/transforms.py:141-156):
    applied with probability == dropout_ratio; keeps N*(1-ratio) points."""
    coords = rng.random((1000, 3)).astype(np.float32)
    colors = rng.random((1000, 3)).astype(np.float32)
    labels = np.arange(1000, dtype=np.int32)
    sizes = set()
    for _ in range(64):
        c, f, l = T.random_dropout(coords, colors, labels, rng, 0.2)
        assert len(c) == len(f) == len(l)
        assert len(c) in (1000, 800)
        if len(c) == 800:
            # surviving rows are rows of the input, labels stay aligned
            assert (coords[l] == c).all()
        sizes.add(len(c))
    assert sizes == {1000, 800}  # both branches taken over 64 draws
    # ratio 0 -> identity
    c, f, l = T.random_dropout(coords, colors, labels, rng, 0.0)
    assert len(c) == 1000


def test_spatial_crop(rng):
    """Reference crop (pointgroup scannetv2_inst.py:142-158): result fits
    the budget, survivors form a contiguous spatial window."""
    xyz = rng.random((5000, 3)).astype(np.float64) * 700.0  # > full_scale
    shifted, mask = T.spatial_crop(xyz, 2000, rng, full_scale=512)
    assert mask.sum() <= 2000
    assert mask.sum() > 0
    sel = shifted[mask]
    assert (sel.min(1) >= 0).all()
    # every point inside the final window is kept (spatial coherence):
    # survivors are exactly the window members, not an arbitrary subset
    inside = (shifted.min(1) >= 0) & (shifted.max(1) < 512)
    assert mask.sum() == (mask & inside).sum()
    # a scene already under budget is untouched
    small = xyz[:100]
    shifted, mask = T.spatial_crop(small, 2000, rng, full_scale=512)
    assert mask.all() and (shifted == small).all()


def test_make_pg_batch_spatial_crop(rng):
    """Over-budget scenes are spatially cropped, not first-N truncated."""
    from cli.stage2_pointgroup_common import make_pg_batch

    n = 4000
    coords = rng.random((n, 3)).astype(np.float32) * 10.0
    colors = rng.integers(0, 255, (n, 3)).astype(np.float32)
    sem = rng.integers(1, 10, n).astype(np.int32)
    ins = rng.integers(1, 5, n).astype(np.int32)
    hb = make_pg_batch([(coords, colors, sem, ins)], n_cap=2048, i_cap=16,
                       rng=rng)
    nv = int(hb.valid.sum())
    assert 0 < nv <= 2048
    # survivors span a sub-window of the room, not its first-N prefix:
    # the kept coords' bbox must be strictly smaller than the room in xy
    # (crop shrinks xy extent; first-N truncation keeps the full extent)
    kept = hb.coords[:nv]
    room = coords.max(0) - coords.min(0)
    window = kept.max(0) - kept.min(0)
    assert (window[:2] < room[:2] - 1e-3).any()


def test_voxel_batch(rng):
    scenes = []
    for _ in range(3):
        c = rng.random((400, 3)).astype(np.float32)
        col = rng.integers(0, 255, (400, 3)).astype(np.float32)
        lab = rng.integers(0, 20, 400).astype(np.int32)
        scenes.append((c, col, lab))
    vb = make_voxel_batch(scenes, capacity=2048, voxel_size=0.05)
    n = int(vb.num)
    assert n > 0
    assert vb.valid[:n].all() and not vb.valid[n:].any()
    assert (vb.coords[:n, 0] <= 2).all()
    assert len(vb.point2voxel) == 3
    # per-scene point->voxel maps are consistent
    for b, p2v in enumerate(vb.point2voxel):
        assert (vb.coords[p2v, 0] == b).all()


def test_visualize_roundtrip(tmp_path, rng):
    raw = make_raw_scene(rng)
    mesh = str(tmp_path / "mesh.ply")
    from seggroup_tpu.data.ply import write_ply

    v = raw["vertices"]
    write_ply(mesh, {
        "x": v[:, 0], "y": v[:, 1], "z": v[:, 2],
        "red": v[:, 3].astype(np.uint8), "green": v[:, 4].astype(np.uint8),
        "blue": v[:, 5].astype(np.uint8),
    }, raw["faces"])
    out = str(tmp_path / "vis.ply")
    visualize_labels(mesh, raw["real_sem"], out, "semantic")
    back = read_ply(out)
    assert len(back["vertex"]) == len(v)
    cols = colorize_labels(raw["real_sem"], "semantic")
    np.testing.assert_array_equal(back["vertex"]["red"], cols[:, 0])


def test_colorize_grouping_progress(rng):
    """Merge-progress coloring (reference visualize_grouping_process,
    util.py:489-527): instance-assigned vertices take instance colors,
    ungrouped vertices take their segment color, unlabeled-and-unsegmented
    vertices are white."""
    from seggroup_tpu.data.visualize import (_instance_palette,
                                             colorize_grouping)

    n = 200
    seg = rng.integers(0, 12, n)
    ins = np.full(n, -1, np.int64)
    ins[:80] = rng.integers(0, 4, 80)
    seg[190:] = -1
    cols = colorize_grouping(ins, seg, shuffle=False, seed=0)
    assert cols.shape == (n, 3) and cols.dtype == np.uint8
    # same instance -> same color; different instances -> different colors
    for k in range(4):
        sel = ins == k
        assert (cols[sel] == cols[sel][0]).all()
    inst_colors = {tuple(cols[ins == k][0]) for k in range(4)}
    assert len(inst_colors) == 4
    # ungrouped vertices keep segment coloring
    seg_pal = _instance_palette(64, shuffle=False, seed=0)
    ungrouped = (ins < 0) & (seg >= 0)
    np.testing.assert_array_equal(cols[ungrouped], seg_pal[seg[ungrouped] % 64])
    # invalid seg + no instance -> white
    assert (cols[(ins < 0) & (seg < 0)] == 255).all()
    # more grouping -> more instance-colored vertices (progress is visible)
    ins2 = ins.copy(); ins2[80:160] = rng.integers(0, 4, 80)
    cols2 = colorize_grouping(ins2, seg, shuffle=False, seed=0)
    changed = (cols2 != cols).any(1)
    assert changed.sum() > 0 and (np.where(changed)[0] >= 80).all()
