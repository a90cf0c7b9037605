"""Full two-stage pipeline through the real CLIs (subprocess): stage-1 train
-> infer (pseudo-label export) -> offline evaluate -> stage-2 backbones
consume the pseudo-label files. This is the reference's cross-stage on-disk
interface (SURVEY.md §0) exercised end-to-end — coverage the reference never
had."""

import pytest

pytestmark = pytest.mark.slow  # subprocess e2e, ~7 min of XLA-CPU compiles

import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(args, cwd):
    env = dict(os.environ)
    env["SEGGROUP_TPU_PLATFORM"] = "cpu"
    env["PYTHONPATH"] = REPO
    r = subprocess.run([sys.executable, "-m"] + args, cwd=cwd, env=env,
                       capture_output=True, text=True, timeout=1200)
    assert r.returncode == 0, f"{args}\nSTDOUT:{r.stdout[-2000:]}\nSTDERR:{r.stderr[-2000:]}"
    return r.stdout


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    return str(tmp_path_factory.mktemp("e2e"))


NS = ["--synthetic", "4", "--exp_name", "e2e", "--data_root", "unused"]


@pytest.mark.slow
def test_stage1_train_infer_evaluate(workdir):
    run(["cli.stage1_train"] + NS + ["--epochs", "1", "--num_devices", "1",
                                     "--cluster_cap", "256"], workdir)
    assert os.path.exists(os.path.join(workdir, "checkpoints/e2e/models"))

    run(["cli.stage1_infer"] + NS + ["--ins_infer", "--num_devices", "1",
                                     "--cluster_cap", "256"], workdir)
    run(["cli.stage1_infer"] + NS + ["--sem_infer", "--num_devices", "1",
                                     "--cluster_cap", "256"], workdir)
    sem_file = os.path.join(workdir, "results/e2e/synthetic0000/ins_infer/final.sem.txt")
    assert os.path.exists(sem_file)
    sem = np.loadtxt(sem_file, dtype=np.int64)
    assert sem.shape == (4096,)
    assert (sem >= 1).all()  # every point labeled after final clustering

    out = run(["cli.stage1_evaluate"] + NS + ["--mode", "ins_infer",
                                              "--layer", "final",
                                              "--workers", "1"], workdir)
    assert "semantic mIoU" in out


@pytest.mark.slow
def test_stage2_consumes_pseudo_labels(workdir):
    # minkunet on layer-2 pseudo semantics
    run(["cli.stage2_train_minkunet"] + NS + [
        "--pseudo_root", os.path.join(workdir, "results/e2e"),
        "--max_iter", "3", "--batch_size", "2", "--capacity", "4096",
        "--model", "Res16UNet14A", "--val_freq", "3"], workdir)
    # pointgroup on final pseudo instances
    run(["cli.stage2_train_pointgroup"] + NS + [
        "--pseudo_root", os.path.join(workdir, "results/e2e"),
        "--steps", "3", "--prepare_steps", "99", "--batch_size", "1",
        "--point_cap", "4096", "--voxel_cap", "4096", "--m", "4",
        "--save_freq", "3"], workdir)
    log = open(os.path.join(workdir, "checkpoints/e2e/pointgroup.log")).read()
    assert "saved step 3" in log
    assert "val loss" in log  # validation ran with best-ckpt tracking
    mlog = open(os.path.join(workdir, "checkpoints/e2e/minkunet.log")).read()
    assert "val mIoU" in mlog
    assert os.path.exists(os.path.join(workdir,
                                       "checkpoints/e2e/minkunet_best"))


@pytest.mark.slow
def test_kpconv_trainer_smoke(workdir):
    """KPConv trainer end-to-end via subprocess: calibration line, training
    steps, vote-smoothed validation with best checkpoint and per-level
    overflow accounting."""
    run(["cli.stage2_train_kpconv", "--synthetic", "3", "--exp_name", "kpe2e",
         "--data_root", "unused", "--steps", "2", "--point_cap", "1024",
         "--batch_size", "1", "--save_freq", "2", "--calib_batches", "1"],
        workdir)
    log = open(os.path.join(workdir, "checkpoints/kpe2e/kpconv.log")).read()
    assert "calibrated neighbor caps" in log
    assert "val acc" in log
    assert "ball-query overflow %/level" in log
    assert os.path.exists(os.path.join(workdir,
                                       "checkpoints/kpe2e/kpconv_best"))


@pytest.mark.slow
def test_stage2_resume_continues_step_and_lr(workdir):
    """Kill-and-resume (VERDICT round-1 item 4): a stage-2 run that stops at
    iter 4 and restarts with --resume continues the iteration counter and the
    LR schedule from the restored optimizer state (reference
    minkowski/lib/train.py:50-66 restores model AND optimizer state)."""
    ns = ["--synthetic", "3", "--exp_name", "resume_e2e",
          "--data_root", "unused", "--batch_size", "1",
          "--capacity", "2048", "--model", "Res16UNet14A",
          "--val_freq", "2", "--lr", "0.1"]
    # phase 1: "dies" after iter 4 — the checkpoint at iter 4 is what a
    # killed long run would leave behind
    run(["cli.stage2_train_minkunet"] + ns + ["--max_iter", "4"], workdir)
    log1 = open(os.path.join(workdir,
                             "checkpoints/resume_e2e/minkunet.log")).read()
    assert "saved iter 4" in log1
    # phase 2: resume and run to 6
    run(["cli.stage2_train_minkunet"] + ns + ["--max_iter", "6", "--resume"],
        workdir)
    log2 = open(os.path.join(workdir,
                             "checkpoints/resume_e2e/minkunet.log")).read()
    assert "resumed from iter 4" in log2
    assert "saved iter 6" in log2
    # the restored PolyLR continues (lr at iter 4 of a 6-iter schedule is
    # printed on resume and is below the base lr)
    import re
    m = re.search(r"lr continues at ([0-9.eE+-]+)", log2)
    assert m and 0 < float(m.group(1)) < 0.1


def test_lenient_restore_partial_weights(tmp_path):
    """lenient_restore (reference lenient_weight_loading minkowski
    main.py:129-146): matching-shape leaves load, mismatched/missing leaves
    keep their fresh init."""
    import jax.numpy as jnp

    from seggroup_tpu.utils.checkpoint import CheckpointManager, lenient_restore

    src = {"a": {"w": np.ones((4, 4), np.float32)},
           "b": {"w": np.full((3,), 2.0, np.float32)}}
    mgr = CheckpointManager(str(tmp_path / "ck"))
    mgr.save(1, {"params": src, "batch_stats": {}})

    template = {"a": {"w": jnp.zeros((4, 4))},          # match -> loaded
                "b": {"w": jnp.zeros((5,))},            # shape mismatch -> kept
                "c": {"w": jnp.full((2,), 7.0)}}        # absent -> kept
    out, n_loaded, n_total = lenient_restore(str(tmp_path / "ck"), template,
                                             log=lambda *_: None)
    assert (n_loaded, n_total) == (1, 3)
    np.testing.assert_array_equal(np.asarray(out["a"]["w"]), src["a"]["w"])
    np.testing.assert_array_equal(np.asarray(out["b"]["w"]), np.zeros((5,)))
    np.testing.assert_array_equal(np.asarray(out["c"]["w"]), np.full((2,), 7.0))


@pytest.mark.slow
def test_kpcnn_classification_eval_smoke(workdir):
    """KPCNN classification tester (reference kpconv/utils/tester.py:127-215
    test_classification): vote-averaged probs + confusion-matrix accuracy."""
    out = run(["cli.stage2_test_classification", "--synthetic", "6",
               "--votes", "1", "--points_per_cloud", "128",
               "--batch_clouds", "3", "--exp_name", "e2e"], workdir)
    assert "Test Accuracy" in out
    assert "FINAL accuracy" in out


@pytest.mark.slow
def test_demo_semantic_writes_colored_ply(workdir):
    """Standalone inference demo (reference minkowski/demo/scannet.py):
    synthetic cloud -> colored NYU40-palette prediction PLY aligned to the
    input points."""
    out = os.path.join(workdir, "demo_pred.ply")
    log = run(["cli.demo_semantic", "--synthetic", "--variant",
               "Res16UNet14A", "--capacity", "16384", "--out", out], workdir)
    assert "wrote" in log
    from seggroup_tpu.data.ply import read_ply

    v = read_ply(out)["vertex"]
    assert len(v) > 10000
    assert {"x", "y", "z", "red", "green", "blue"} <= set(v.dtype.names)
