"""Driver-interface tests: __graft_entry__.entry() and dryrun_multichip().

Run in subprocesses because dryrun_multichip mutates global JAX platform
config, which must happen before backend initialisation."""

import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def _run(code: str):
    return subprocess.run([sys.executable, "-c", code], cwd=REPO,
                          capture_output=True, text=True, timeout=600)


def test_entry_compiles():
    r = _run(
        "import jax; jax.config.update('jax_platforms', 'cpu');\n"
        "import __graft_entry__ as g\n"
        "fn, args = g.entry()\n"
        "out = jax.jit(fn)(*args)\n"
        "assert out.shape == (64, 1), out.shape\n"
        "print('OK')\n"
    )
    assert r.returncode == 0, r.stderr
    assert "OK" in r.stdout


def test_dryrun_multichip_8():
    r = _run(
        "import __graft_entry__ as g\n"
        "g.dryrun_multichip(8)\n"
    )
    assert r.returncode == 0, r.stderr
    assert "dryrun_multichip OK" in r.stdout
