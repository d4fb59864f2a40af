"""Utility tests: timing decorator, manifest writer, artifact IO, metrics."""

import numpy as np

from differential_equations_dnn_tpu.utils import (
    fn_timer,
    Timer,
    parameters_summary,
    save_array,
    load_array,
)
from differential_equations_dnn_tpu.train import mean_absolute_error, l2_error


def test_fn_timer_passthrough(capsys):
    @fn_timer
    def f(a, b=1):
        return a + b

    assert f(2, b=3) == 5
    out = capsys.readouterr().out
    assert "Total time running f" in out


def test_timer_rate():
    with Timer() as t:
        sum(range(1000))
    assert t.elapsed > 0
    assert t.rate(100) > 0


def test_parameters_summary(tmp_path):
    pms = parameters_summary(
        {"iterations": 5000, "batch_size": 64, "lrate": 1e-4},
        tmp_path, name="heat_run",
    )
    text = pms.read_text()
    assert "iterations" in text and "5000" in text
    assert (tmp_path / "heat_run.json").exists()


def test_artifact_roundtrip(tmp_path):
    arr = np.arange(12.0).reshape(3, 4)
    save_array("heat_sol_1d_dgm", arr, directory=tmp_path)
    back = load_array("heat_sol_1d_dgm", directory=tmp_path)
    np.testing.assert_array_equal(arr, back)


def test_metrics_match_sklearn():
    rng = np.random.default_rng(0)
    a, b = rng.standard_normal((5, 5)), rng.standard_normal((5, 5))
    try:
        from sklearn.metrics import mean_absolute_error as sk_mae
        np.testing.assert_allclose(mean_absolute_error(a, b), sk_mae(a, b))
    except ImportError:
        pass
    assert l2_error(a, a) == 0.0
    assert l2_error(a, b) > 0
