"""bench.py capture robustness (VERDICT r3 #1, r4 #1/#2).

BENCH_r03.json was rc=124/parsed=null: the old bench computed everything
before printing its single JSON line, so one mid-run tunnel stall lost the
round's only official perf record. BENCH_r04.json was rc=0/parsed=null for
the OPPOSITE reason: every line parsed, but the enriched line grew to
~3.6 kB — past the driver's 2,000-char stdout TAIL window — so the tail
began mid-JSON and nothing parsed. The bench now emits a parseable line
from second zero, re-emits after the headline and every section, runs a
watchdog thread that re-emits and hard-exits before the global budget
expires, and hard-caps EVERY emitted line at ``bench.MAX_LINE_BYTES``
(1,500 — bulky extras live only in the full side record). These tests
simulate the stall on CPU and assert the tail-window capture contract.
"""

import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]

# The driver's capture: keep a 2,000-char stdout tail, parse the last
# complete JSON line inside it (matches the BENCH_r01/r02 capture format).
TAIL_CHARS = 2000


def _driver_parse(stdout: str) -> dict:
    """Replicate the driver: last complete JSON line within the tail."""
    tail = stdout[-TAIL_CHARS:]
    recs = []
    for ln in tail.splitlines():
        try:
            recs.append(json.loads(ln))
        except json.JSONDecodeError:
            continue
    assert recs, f"no complete JSON line in the {TAIL_CHARS}-char tail:\n{tail}"
    return recs[-1]


def _run_bench(**env_overrides) -> subprocess.CompletedProcess:
    env = dict(os.environ, BENCH_PLATFORM="cpu", **env_overrides)
    return subprocess.run(
        [sys.executable, str(REPO / "bench.py")],
        capture_output=True, text=True, timeout=240, env=env, cwd=str(REPO))


def test_stalled_section_still_emits_headline():
    out = _run_bench(
        BENCH_ITERS="150",
        BENCH_HEADLINE_SAMPLES="1",
        # Must leave >120 s remaining when the scan section starts (its
        # section budget) or it is skipped instead of started-then-stalled.
        BENCH_BUDGET_S="160",
        BENCH_STALL="scan",  # the scan section hangs forever
        BENCH_SKIP=("probe,provisional,fp32,lbfgs,calibration,sweep,"
                    "packed,mxu_heavy,equations"),
    )
    # The watchdog hard-exits 0 after re-emitting the best-known line.
    assert out.returncode == 0, out.stderr[-2000:]
    rec = _driver_parse(out.stdout)
    assert rec["metric"] == "heat_train_iters_per_sec"
    assert rec["value"] > 0, rec  # the measured headline survived the stall
    assert rec["extras"]["mae_vs_exact"] < 0.0529
    assert "watchdog_fired_at_s" in rec["extras"]
    _assert_lines_capped(out.stdout)


def test_every_line_fits_driver_tail_window():
    """VERDICT r4 #1 acceptance: every emitted line parses AND fits the
    driver tail window, including after the extras-heavy sections, and the
    full record lands in the per-platform side file with the bulky keys."""
    out = _run_bench(
        BENCH_ITERS="150",
        BENCH_HEADLINE_SAMPLES="2",
        BENCH_BUDGET_S="200",
        BENCH_SKIP=("probe,provisional,lbfgs,packed,calibration,scan,"
                    "sweep,mxu_heavy,equations"),
    )
    assert out.returncode == 0, out.stderr[-2000:]
    _assert_lines_capped(out.stdout)
    rec = _driver_parse(out.stdout)
    assert rec["value"] > 0
    assert rec["extras"]["mae_vs_exact"] < 0.0529
    # Bulky extras must NOT be inline (sample lists / long strings)...
    assert "iters_per_sec_samples" not in rec["extras"]
    assert "device" not in rec["extras"]
    assert "engine" not in rec["extras"]
    # ...but must be in the full side record, which the line points to.
    full = json.loads((REPO / rec["extras"]["full_record"]).read_text())
    assert full["value"] == rec["value"]
    assert "iters_per_sec_samples" in full["extras"]
    assert "device" in full["extras"]
    assert full["extras"]["mae_vs_exact"] == rec["extras"]["mae_vs_exact"]
    # Per-platform mirror: a CPU (test) run writes bench_last.cpu.json and
    # can never clobber the on-chip bench_last.tpu.json record.
    mirror = json.loads((REPO / "bench_last.cpu.json").read_text())
    assert mirror["value"] == rec["value"]


def _assert_lines_capped(stdout: str) -> None:
    import bench  # repo-root module (conftest adds the root to sys.path)

    n = 0
    for ln in stdout.splitlines():
        if ln.startswith("{"):
            json.loads(ln)  # every line parses on its own
            assert len(ln) <= bench.MAX_LINE_BYTES, (len(ln), ln[:200])
            n += 1
    assert n >= 2  # startup line + at least one measured line
