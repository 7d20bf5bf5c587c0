"""Multi-host simulation: the full sharded train step across TWO
PROCESSES (jax.distributed + gloo over localhost), row axis on the
cross-process channel — the CPU stand-in for a multi-host TPU pod slice
(SURVEY.md §4's multiprocess simulation strategy)."""

import os
import socket
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "scripts", "multihost_sim.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_sharded_step():
    port = _free_port()
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(pid), "2", str(port)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out[-3000:]}"
        assert f"MULTIHOST_OK pid={pid}" in out, out[-3000:]
    # Both processes computed the identical psum'd loss.
    losses = {
        line.split("loss=")[1].strip()
        for out in outs
        for line in out.splitlines()
        if "MULTIHOST_OK" in line
    }
    assert len(losses) == 1, losses
