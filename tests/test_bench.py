"""bench.py capture robustness (VERDICT r3 #1).

BENCH_r03.json was rc=124/parsed=null: the old bench computed everything
before printing its single JSON line, so one mid-run tunnel stall lost the
round's only official perf record. The restructured bench emits a parseable
line from second zero and re-emits after the headline and every section; a
watchdog thread re-emits and hard-exits before the global budget expires.
This test simulates the failure mode on CPU: the scan section hangs forever
(BENCH_STALL=scan) and the run must STILL end with a parseable headline line.
"""

import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def _last_json_line(stdout: str) -> dict:
    lines = [ln for ln in stdout.splitlines() if ln.startswith("{")]
    assert lines, f"no JSON line in output:\n{stdout[-2000:]}"
    return json.loads(lines[-1])


def test_stalled_section_still_emits_headline():
    env = dict(
        os.environ,
        BENCH_PLATFORM="cpu",
        BENCH_ITERS="150",
        BENCH_HEADLINE_SAMPLES="1",
        # Must leave >120 s remaining when the scan section starts (its
        # section budget) or it is skipped instead of started-then-stalled.
        BENCH_BUDGET_S="160",
        BENCH_STALL="scan",  # the scan section hangs forever
        BENCH_SKIP=("probe,provisional,fp32,lbfgs,calibration,sweep,"
                    "packed,equations"),
    )
    out = subprocess.run(
        [sys.executable, str(REPO / "bench.py")],
        capture_output=True, text=True, timeout=240, env=env, cwd=str(REPO))
    # The watchdog hard-exits 0 after re-emitting the best-known line.
    assert out.returncode == 0, out.stderr[-2000:]
    rec = _last_json_line(out.stdout)
    assert rec["metric"] == "heat_train_iters_per_sec"
    assert rec["value"] > 0, rec  # the measured headline survived the stall
    assert rec["extras"]["mae_vs_exact"] < 0.0529
    assert "watchdog_fired_at_s" in rec["extras"]
    # Every intermediate line must parse too — a driver that takes ANY line
    # (first, last, or all) gets valid JSON.
    for ln in out.stdout.splitlines():
        if ln.startswith("{"):
            json.loads(ln)
