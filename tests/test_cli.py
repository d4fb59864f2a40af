"""CLI tests: the reference's flag surface (--solve/--plot/--savefig/--niters/
--nnodes/--batch-size) through the single entry point, artifact layout, and
the sweep/ablation subcommands (tiny budgets)."""

import json
import os
from pathlib import Path

import numpy as np
import pytest

from differential_equations_dnn_tpu.cli import main, build_parser, ARTIFACTS


def test_simple_ode_solve_and_plot(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    rd = str(tmp_path / "temp_results")
    main(["simple-ode", "--solve", "--niters", "300", "--batch-size", "32",
          "--nnodes", "10", "--lrate", "1e-3", "--results-dir", rd])
    sol, loss, exact, _ = ARTIFACTS["simple_ode"]
    y = np.load(Path(rd) / f"{sol}.npy")
    assert y.shape == (10,)
    assert np.load(Path(rd) / f"{loss}.npy").shape == (300,)
    # Manifest written alongside.
    assert (Path(rd) / "simple_ode_run.pms").exists()
    # Plot phase reloads artifacts (the reference's resume split).
    main(["simple-ode", "--plot", "--savefig", "--nnodes", "10",
          "--results-dir", rd])
    assert (tmp_path / "figs/simple_ode_solution.pdf").exists()


def test_heat_solve_writes_reference_layout(tmp_path):
    rd = str(tmp_path / "temp_results")
    main(["heat", "--solve", "--niters", "50", "--batch-size", "16",
          "--nnodes", "8", "--results-dir", rd])
    assert (Path(rd) / "heat_sol_1d_dgm.npy").exists()
    assert (Path(rd) / "heat_sol_1d_dgm_loss.npy").exists()
    assert (Path(rd) / "heat_sol_exact_1d.npy").exists()
    assert np.load(Path(rd) / "heat_sol_1d_dgm.npy").shape == (8, 8)


def test_fredholm_gauss_flag(tmp_path):
    rd = str(tmp_path / "temp_results")
    main(["fredholm", "--solve", "--niters", "50", "--batch-size", "8",
          "--nnodes", "10", "--quadrature", "gauss", "--quad-nodes", "8",
          "--results-dir", rd])
    assert (Path(rd) / "fredholm_approx.npy").exists()


def test_checkpoint_flag(tmp_path):
    rd = str(tmp_path / "temp_results")
    ck = str(tmp_path / "ckpt")
    main(["simple-ode", "--solve", "--niters", "50", "--batch-size", "8",
          "--nnodes", "5", "--checkpoint", ck, "--results-dir", rd])
    assert any(Path(ck).iterdir())


def test_sweep_subcommand(tmp_path):
    rd = str(tmp_path / "temp_results")
    main(["sweep", "--equation", "simple_ode", "--num-samples", "3",
          "--max-iters", "100", "--max-batch-size", "32",
          "--results-dir", rd, "--seed", "1"])
    data = json.loads((Path(rd) / "sweep_simple_ode.json").read_text())
    assert "best_config" in data and len(data["configs"]) == 3


def test_ablation_batchnorm_subcommand(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    rd = str(tmp_path / "temp_results")
    main(["ablation-batchnorm", "--runs", "1", "--niters", "10",
          "--results-dir", rd])
    assert (Path(rd) / "relu_heat_loss_nobn.npy").exists()
    assert (Path(rd) / "relu_heat_loss_bn_pre.npy").exists()
    assert (Path(rd) / "relu_heat_loss_bn_post.npy").exists()


def test_parser_rejects_unknown_equation():
    with pytest.raises(SystemExit):
        build_parser().parse_args(["wave-equation", "--solve"])


def test_no_action_prints_hint(capsys):
    main(["simple-ode"])
    assert "Nothing to do" in capsys.readouterr().out


def test_checkpoint_restore_roundtrip(tmp_path):
    rd = str(tmp_path / "temp_results")
    ck = str(tmp_path / "ckpt")
    main(["simple-ode", "--solve", "--niters", "100", "--batch-size", "8",
          "--nnodes", "5", "--checkpoint", ck, "--results-dir", rd])
    main(["simple-ode", "--solve", "--niters", "50", "--batch-size", "8",
          "--nnodes", "5", "--restore", ck, "--results-dir", rd])
    # loss history from the resumed run exists and is the requested length
    loss = np.load(Path(rd) / "test_simple_ode_nn_loss.npy")
    assert loss.shape == (50,)


def test_ensemble_flag(tmp_path):
    rd = str(tmp_path / "temp_results")
    main(["simple-ode", "--solve", "--niters", "60", "--batch-size", "8",
          "--nnodes", "5", "--ensemble", "3", "--results-dir", rd])
    assert np.load(Path(rd) / "test_simple_ode_nn_loss.npy").shape == (60,)


def test_export_flag(tmp_path):
    rd = str(tmp_path / "temp_results")
    ex = str(tmp_path / "sol.stablehlo")
    main(["simple-ode", "--solve", "--niters", "50", "--batch-size", "8",
          "--nnodes", "5", "--export", ex, "--results-dir", rd])
    from differential_equations_dnn_tpu.serving import load_solution
    fn = load_solution(ex)
    assert fn(np.zeros((3, 1), np.float32)).shape == (3, 1)


def test_heat_taps_flag(tmp_path):
    rd = str(tmp_path / "temp_results")
    main(["heat", "--solve", "--niters", "40", "--batch-size", "16",
          "--nnodes", "8", "--taps", "taylor", "--results-dir", rd])
    assert np.load(Path(rd) / "heat_sol_1d_dgm_loss.npy").shape == (40,)


def test_heat2d_cli(tmp_path):
    rd = str(tmp_path / "temp_results")
    main(["heat2d", "--solve", "--plot", "--niters", "40", "--batch-size", "32",
          "--nnodes", "6", "--results-dir", rd])
    assert np.load(Path(rd) / "heat_sol_2d_dgm.npy").shape == (6, 6, 6)
