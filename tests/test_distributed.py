"""Multi-process jax.distributed test (SURVEY §5.8 / VERDICT r1 item 8).

Spawns two real OS processes, each with 4 virtual CPU devices, that form one
8-device global mesh via ``initialize_distributed`` — exercising the
non-no-op branch that a single-process suite can never reach — then run a
cross-process reduction and one data-parallel training step."""

import socket
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
WORKER = Path(__file__).resolve().parent / "distributed_worker.py"


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_global_mesh():
    port = _free_port()
    procs = [
        subprocess.Popen(
            [sys.executable, str(WORKER), str(port), str(pid)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            cwd=REPO,
        )
        for pid in (0, 1)
    ]
    outputs = []
    for p in procs:
        out, _ = p.communicate(timeout=300)
        outputs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outputs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"
        assert f"DIST OK process={pid}" in out, out
