"""Multi-process (multi-host analog) exercise of initialize_multihost
(VERDICT r2 item 9): two jax.distributed processes x 4 CPU devices drive one
real MinkUNet DP step over the global 8-device mesh — the DCN-analog path
the single-process dryrun cannot cover (reference analog: the NCCL TCP
rendezvous, seggroup/train.py:83-84)."""

import os
import socket
import subprocess
import sys

import pytest


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_dp_step():
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = os.path.join(root, "tests", "_multihost_worker.py")
    coordinator = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ)
    # the workers pin their own backend; drop the test-harness CPU forcing so
    # they configure from scratch, and drop any axon remote-TPU autoload
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, worker, coordinator, str(pid), "2"],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env, cwd=root)
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=900)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    lines = []
    for pid, (p, out) in enumerate(zip(procs, outs)):
        ok = [ln for ln in out.splitlines() if ln.startswith("MULTIHOST_OK")]
        assert p.returncode == 0 and ok, (
            f"worker {pid} rc={p.returncode}\n{out[-3000:]}")
        lines.append(ok[0])
    # both processes computed the same psum'd loss on the same global step
    assert lines[0] == lines[1], lines
    assert "procs=2 devs=8" in lines[0]
