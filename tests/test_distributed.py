"""Multi-host smoke test: 2 OS processes x 4 virtual CPU devices running the
production sharded stage-2 step over one global 8-device mesh, with
cross-process collectives (VERDICT r1 item #4; SURVEY.md §2.7 comm-backend
row). On TPU the same code path rides ICI/DCN."""

import os
import socket
import subprocess
import sys

import pytest


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_sharded_step():
    port = _free_port()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = os.path.join(repo, "tests", "distributed_worker.py")
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.pop("XLA_FLAGS", None)  # worker sets its own 4-device count
        env.update({
            "SPN4CIR_DIST_COORDINATOR": f"localhost:{port}",
            "SPN4CIR_DIST_NPROCS": "2",
            "SPN4CIR_DIST_PROC_ID": str(pid),
            "PYTHONPATH": repo,
        })
        procs.append(subprocess.Popen(
            [sys.executable, worker], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out}"
        assert f"OK process={pid}" in out, out


def test_initialize_distributed_noop_without_gate(monkeypatch):
    """No env vars, no args -> returns False without touching the backend."""
    from spn4cir_tpu.parallel.mesh import initialize_distributed

    for var in ("SPN4CIR_DISTRIBUTED", "SPN4CIR_DIST_COORDINATOR",
                "SPN4CIR_DIST_NPROCS", "SPN4CIR_DIST_PROC_ID"):
        monkeypatch.delenv(var, raising=False)
    assert initialize_distributed() is False
