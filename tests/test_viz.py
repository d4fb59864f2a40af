"""Figure-generation tests (Agg backend; asserts files and MAE values)."""

import numpy as np

from differential_equations_dnn_tpu import viz


def test_plot_solution_and_loss(tmp_path):
    grid = np.linspace(0, 1, 20)
    exact = 2 * np.exp(-grid)
    approx = exact + 0.01
    loss = np.geomspace(1, 1e-4, 100)
    fig, mae = viz.plot_solution_and_loss(grid, exact, approx, loss, "test",
                                          savepath=tmp_path / "a.pdf")
    assert (tmp_path / "a.pdf").exists()
    np.testing.assert_allclose(mae, 0.01, rtol=1e-6)


def test_plot_heat(tmp_path):
    exact = np.random.default_rng(0).random((20, 20))
    approx = exact + 0.005
    loss = np.geomspace(1, 1e-5, 500)
    fig, mae = viz.plot_heat(exact, approx, loss, n_iters=500,
                             savepath=tmp_path / "h.pdf")
    assert (tmp_path / "h.pdf").exists()
    np.testing.assert_allclose(mae, 0.005, rtol=1e-6)


def test_plot_fitzhugh_nagumo(tmp_path):
    t = np.linspace(0, 30, 50)
    exact = np.stack([np.sin(t), np.cos(t)], axis=1)
    approx = exact + 0.002
    fig, mae = viz.plot_fitzhugh_nagumo(t, exact, approx,
                                        np.geomspace(1, 1e-4, 100),
                                        savepath=tmp_path / "f.pdf")
    assert (tmp_path / "f.pdf").exists()
    np.testing.assert_allclose(mae, 0.002, rtol=1e-5)


def test_plot_ablation(tmp_path):
    curves = {"4": np.geomspace(1, 1e-3, 400), "64": np.geomspace(1, 1e-4, 400)}
    viz.plot_ablation(curves, savepath=tmp_path / "ab.pdf")
    assert (tmp_path / "ab.pdf").exists()
    # Short curves skip smoothing/inset without error.
    viz.plot_ablation({"x": np.ones(10)}, savepath=tmp_path / "ab2.pdf",
                      smooth=50)
    assert (tmp_path / "ab2.pdf").exists()
