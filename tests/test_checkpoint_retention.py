"""Checkpoint retention GC + graceful-stop kill-file (VERDICT r4 item 9).

Reference semantics: pointgroup deletes the previous epoch's snapshot unless
it is a power of two or a multiple of save_freq=16 (util/utils.py:85-98);
kpconv stops training cleanly when its running_PID.txt kill-file disappears
(utils/trainer.py:217-220 — ours inverts to a CREATE-a-STOP-file contract)."""

import os

import numpy as np


def test_pow2_or_mult16_retention(tmp_path):
    from seggroup_tpu.utils.checkpoint import CheckpointManager

    mgr = CheckpointManager(str(tmp_path / "ck"), max_to_keep=2,
                            pow2_retention=True)
    for step in range(1, 13):
        mgr.save(step, {"w": np.full(3, step, np.float32)})
    kept = sorted(int(d) for d in os.listdir(tmp_path / "ck")
                  if d.isdigit())
    # pow2 steps survive beyond max_to_keep; 12 survives only as one of the
    # 2 most recent; plain steps like 5/6/7 are GC'ed
    for p in (1, 2, 4, 8):
        assert p in kept, f"pow2 step {p} was GC'ed: {kept}"
    for gone in (5, 6, 7, 9, 10):
        assert gone not in kept, f"step {gone} should be GC'ed: {kept}"
    assert mgr.latest_step() == 12
    got = mgr.restore(8)
    assert float(np.asarray(got["w"])[0]) == 8.0


def test_default_manager_keeps_max_to_keep_only(tmp_path):
    from seggroup_tpu.utils.checkpoint import CheckpointManager

    mgr = CheckpointManager(str(tmp_path / "ck"), max_to_keep=3)
    for step in range(1, 8):
        mgr.save(step, {"w": np.zeros(2, np.float32)})
    kept = sorted(int(d) for d in os.listdir(tmp_path / "ck") if d.isdigit())
    assert kept == [5, 6, 7], kept


def test_should_stop_kill_file(tmp_path, monkeypatch):
    from cli.stage1_common import should_stop

    monkeypatch.chdir(tmp_path)
    assert not should_stop("expX")
    os.makedirs("checkpoints/expX", exist_ok=True)
    assert not should_stop("expX")
    open("checkpoints/expX/STOP", "w").close()
    assert should_stop("expX")
