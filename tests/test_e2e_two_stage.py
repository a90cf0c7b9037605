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
    steps, vote-smoothed validation with best checkpoint."""
    run(["cli.stage2_train_kpconv", "--synthetic", "3", "--exp_name", "kpe2e",
         "--data_root", "unused", "--steps", "2", "--point_cap", "1024",
         "--batch_size", "1", "--save_freq", "2", "--calib_batches", "1"],
        workdir)
    log = open(os.path.join(workdir, "checkpoints/kpe2e/kpconv.log")).read()
    assert "calibrated neighbor caps" in log
    assert "val acc" in log
    assert os.path.exists(os.path.join(workdir,
                                       "checkpoints/kpe2e/kpconv_best"))
