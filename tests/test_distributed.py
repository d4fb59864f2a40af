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


def _scrape(out: str, tag: str) -> float:
    for line in out.splitlines():
        if tag in line:
            return float(line.rsplit("=", 1)[1])
    raise AssertionError(f"{tag} not found in:\n{out}")


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
        out, _ = p.communicate(timeout=600)
        outputs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outputs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"
        assert f"DIST OK process={pid}" in out, out

    # Topology parity: the 2-process DP run and population sweep must agree
    # with the SAME programs run single-process over this suite's own
    # 8-device CPU mesh (conftest) — proving process topology does not
    # change the math, only where the devices live.
    import numpy as np
    import jax

    from differential_equations_dnn_tpu.equations import Heat1D, SimpleODE
    from differential_equations_dnn_tpu.parallel import make_mesh
    from differential_equations_dnn_tpu.sweep import random_search
    from differential_equations_dnn_tpu.train import TrainConfig, train

    cfg5 = TrainConfig(iterations=5, batch_size=16, chunk_size=5,
                       verbose=False, snapshot_every=0)
    local_dp5 = float(train(Heat1D(), jax.random.key(1), cfg5,
                            mesh=make_mesh({"data": 8})).loss_history[-1])
    local_sweep = random_search(
        SimpleODE(), jax.random.key(2), num_samples=8, max_iters=40,
        mesh=make_mesh({"pop": 8}), seed=3, chunk_size=20).best_score
    for out in outputs:
        np.testing.assert_allclose(_scrape(out, "DIST DP5"), local_dp5,
                                   rtol=1e-6)
        np.testing.assert_allclose(_scrape(out, "DIST SWEEP"), local_sweep,
                                   rtol=1e-6)
