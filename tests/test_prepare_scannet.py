"""Cold end-to-end raw-ScanNet ingestion: fixture PLY/segs.json/
aggregation.json/TSV files on disk -> cli.prepare_scannet subprocess -> npz
budgets + weak-label stats -> stage-1 consumable Scene (VERDICT r1 item 8;
reference formats: seggroup/dataset/scannet/util.py:103-220,
prepare_data.py:36-91)."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from seggroup_tpu.data.ply import write_ply

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def make_raw_scene(scans_dir, scene, rng, duplicate_segs=False):
    """A 20x25 grid mesh: 500 vertices, 4 instances over 20 raw segments."""
    os.makedirs(os.path.join(scans_dir, scene), exist_ok=True)
    gw, gh = 25, 20
    xs, ys = np.meshgrid(np.arange(gw), np.arange(gh), indexing="xy")
    verts = np.stack([xs.ravel() * 0.1, ys.ravel() * 0.1,
                      rng.random(gw * gh) * 0.02], 1).astype(np.float32)
    cols = rng.integers(0, 255, (gw * gh, 3)).astype(np.uint8)
    faces = []
    for y in range(gh - 1):
        for x in range(gw - 1):
            a = y * gw + x
            faces.append((a, a + 1, a + gw))
            faces.append((a + 1, a + gw + 1, a + gw))
    faces = np.array(faces, np.int32)

    # 20 raw segments: 5-column x 4-row blocks, ids 100..119
    seg_of = (np.minimum(xs // 5, 4) + 5 * np.minimum(ys // 5, 3)).ravel()
    seg_ids = 100 + seg_of
    # 4 instances of 5 segments each (one block row), classes from the TSV
    categories = ["wall", "chair", "table", "sofa"]
    agg = {"segGroups": []}
    for ins in range(4):
        segs = [int(100 + 5 * ins + k) for k in range(5)]
        agg["segGroups"].append(
            {"objectId": ins, "label": categories[ins], "segments": segs})

    write_ply(os.path.join(scans_dir, scene, f"{scene}_vh_clean_2.ply"),
              {"x": verts[:, 0], "y": verts[:, 1], "z": verts[:, 2],
               "red": cols[:, 0], "green": cols[:, 1], "blue": cols[:, 2]},
              faces)
    seg_list = seg_ids.tolist()
    if duplicate_segs:  # the scene0217_00 ship-broken layout (util.py:120)
        seg_list = seg_list + seg_list
    with open(os.path.join(scans_dir, scene,
                           f"{scene}_vh_clean_2.0.010000.segs.json"), "w") as f:
        json.dump({"segIndices": seg_list}, f)
    with open(os.path.join(scans_dir, scene, f"{scene}.aggregation.json"),
              "w") as f:
        json.dump(agg, f)
    return seg_ids


def write_tsv(path):
    rows = [("wall", 1), ("chair", 5), ("table", 7), ("sofa", 6)]
    with open(path, "w") as f:
        f.write("id\traw_category\tcategory\tnyu40id\n")
        for i, (cat, nyu) in enumerate(rows):
            f.write(f"{i}\t{cat}\t{cat}\t{nyu}\n")


def run_prepare(tmp_path, style, scenes, manual_dir=None):
    cmd = [sys.executable, "-m", "cli.prepare_scannet",
           "--scans_dir", str(tmp_path / "scans"),
           "--tsv", str(tmp_path / "labels.tsv"),
           "--out", str(tmp_path / "prepared"),
           "--label_style", style,
           "--num_points", "2048", "--max_segments", "64",
           "--max_edges", "512", "--workers", "1"]
    if manual_dir:
        cmd += ["--manual_dir", str(manual_dir)]
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=REPO)
    res = subprocess.run(cmd, cwd=REPO, capture_output=True, text=True,
                         env=env, timeout=420)
    assert res.returncode == 0, res.stderr[-2000:]
    return res.stdout


def test_prepare_maxseg_cold(tmp_path, rng):
    make_raw_scene(tmp_path / "scans", "scene0001_00", rng)
    write_tsv(tmp_path / "labels.tsv")
    out = run_prepare(tmp_path, "maxseg", ["scene0001_00"])
    assert "prepared 1/1" in out, out

    npz = np.load(tmp_path / "prepared" / "maxseg" / "scene0001_00.npz")
    # fixed-shape budgets
    assert npz["points"].shape == (2048, 6)
    assert npz["point2seg"].shape == (2048,)
    assert npz["edges"].shape == (512, 2)
    assert npz["weak_ins"].shape == (64,)
    # one annotated over-segment per instance (4 instances)
    labeled = npz["weak_ins"] >= 0
    assert labeled.sum() == 4
    # weak sem classes map through the TSV: nyu40 of wall/chair/table/sofa
    sems = sorted(npz["weak_sem"][labeled].tolist())
    assert sems == sorted([0, 4, 6, 5])  # 0-based (nyu40 - 1)
    # colors normalized to [-1, 1] (reference util.py:656)
    assert np.abs(npz["points"][:, 3:]).max() <= 1.0 + 1e-6
    # real labels cover all 4 instances
    assert set(np.unique(npz["real_ins"])) >= {1, 2, 3, 4}

    # the npz round-trips into a stage-1 Scene via the dataset loader
    from seggroup_tpu.data.scannet import load_scene_npz

    scene, extras = load_scene_npz(
        str(tmp_path / "prepared" / "maxseg" / "scene0001_00.npz"))
    assert scene.points.shape == (2048, 6)
    assert "mapping" in extras or "unmap" in extras


def test_prepare_scene0217_dedup_branch(tmp_path, rng):
    """scene0217_00 ships segIndices duplicated 2x (reference util.py:120)."""
    make_raw_scene(tmp_path / "scans", "scene0217_00", rng,
                   duplicate_segs=True)
    write_tsv(tmp_path / "labels.tsv")
    out = run_prepare(tmp_path, "rand", ["scene0217_00"])
    assert "prepared 1/1" in out, out
    npz = np.load(tmp_path / "prepared" / "rand" / "scene0217_00.npz")
    assert (npz["weak_ins"] >= 0).sum() == 4


def test_prepare_manual_style(tmp_path, rng):
    """Manual annotator JSONs {ins: [segID,..]} (reference README.md:57-67)."""
    make_raw_scene(tmp_path / "scans", "scene0002_00", rng)
    write_tsv(tmp_path / "labels.tsv")
    manual_dir = tmp_path / "manual"
    os.makedirs(manual_dir)
    # annotate the first segment of each instance
    manual = {str(ins): [100 + 5 * ins] for ins in range(4)}
    with open(manual_dir / "scene0002_00.json", "w") as f:
        json.dump(manual, f)
    out = run_prepare(tmp_path, "manual", ["scene0002_00"],
                      manual_dir=manual_dir)
    assert "prepared 1/1" in out, out
    npz = np.load(tmp_path / "prepared" / "manual" / "scene0002_00.npz")
    labeled = np.where(npz["weak_ins"] >= 0)[0]
    assert len(labeled) == 4
    # the manually chosen segments carry their instance's semantic class
    assert sorted(npz["weak_sem"][labeled].tolist()) == sorted([0, 4, 6, 5])


def test_prepare_rasterized_cold(tmp_path, rng):
    """--rasterize_dl densifies the mesh before resampling (reference 3 mm
    rasterization); weak labels and budgets still hold."""
    make_raw_scene(tmp_path / "scans", "scene0003_00", rng)
    write_tsv(tmp_path / "labels.tsv")
    cmd = [sys.executable, "-m", "cli.prepare_scannet",
           "--scans_dir", str(tmp_path / "scans"),
           "--tsv", str(tmp_path / "labels.tsv"),
           "--out", str(tmp_path / "prepared"),
           "--label_style", "maxseg", "--rasterize_dl", "0.05",
           "--num_points", "2048", "--max_segments", "64",
           "--max_edges", "512", "--workers", "1"]
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=REPO)
    res = subprocess.run(cmd, cwd=REPO, capture_output=True, text=True,
                         env=env, timeout=420)
    assert res.returncode == 0, res.stderr[-2000:]
    assert "prepared 1/1" in res.stdout, res.stdout
    npz = np.load(tmp_path / "prepared" / "maxseg" / "scene0003_00.npz")
    assert npz["points"].shape == (2048, 6)
    assert (npz["weak_ins"] >= 0).sum() == 4
    assert npz["edge_valid"].sum() > 0  # mesh adjacency survives rasterization
