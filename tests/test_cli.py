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


def test_sweep_asha_fused_subcommand(tmp_path):
    """--scheduler asha-fused / tpe-asha-fused run the in-kernel halving
    schedulers end-to-end through the CLI (tiny budgets, CPU interpret)."""
    for sched in ("asha-fused", "tpe-asha-fused"):
        rd = str(tmp_path / f"tr_{sched}")
        main(["sweep", "--equation", "simple_ode", "--scheduler", sched,
              "--num-samples", "4", "--max-iters", "24", "--min-budget", "6",
              "--eta", "2", "--brackets", "2", "--max-batch-size", "8",
              "--results-dir", rd, "--seed", "1"])
        data = json.loads((Path(rd) / "sweep_simple_ode.json").read_text())
        assert len(data["configs"]) == 4
        assert data["best_config"]["n_iters"] == 24  # winner fully trained


def test_sweep_tpe_fused_concurrent_subcommand(tmp_path):
    """--scheduler tpe-fused --concurrent q: rounds of q proposals, each
    round one packed dispatch (the reference's max_concurrent=5 role)."""
    rd = str(tmp_path / "tr_conc")
    main(["sweep", "--equation", "simple_ode", "--scheduler", "tpe-fused",
          "--num-samples", "5", "--concurrent", "2", "--max-iters", "24",
          "--max-batch-size", "8", "--results-dir", rd, "--seed", "1"])
    data = json.loads((Path(rd) / "sweep_simple_ode.json").read_text())
    assert len(data["configs"]) == 5
    assert "best_config" in data


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


def test_restore_is_bit_identical(tmp_path):
    """CLI --checkpoint/--restore resumes EXACTLY: params + Adam moments +
    step + seed round-trip, and the step-keyed collocation stream makes the
    resumed run bit-identical to an uninterrupted one (round-2 fix: round 1
    silently reset the optimizer moments on restore)."""
    rd_a = str(tmp_path / "a")
    rd_b = str(tmp_path / "b")
    ck = str(tmp_path / "ckpt")
    # Uninterrupted: 150 iterations in one go.
    main(["simple-ode", "--solve", "--niters", "150", "--batch-size", "8",
          "--nnodes", "5", "--seed", "3", "--results-dir", rd_a])
    # Interrupted: 100 iterations, checkpoint, restore, 50 more.
    main(["simple-ode", "--solve", "--niters", "100", "--batch-size", "8",
          "--nnodes", "5", "--seed", "3", "--checkpoint", ck,
          "--results-dir", rd_b])
    main(["simple-ode", "--solve", "--niters", "50", "--batch-size", "8",
          "--nnodes", "5", "--seed", "3", "--restore", ck,
          "--results-dir", rd_b])
    sol_a = np.load(Path(rd_a) / "test_simple_ode_nn_sol.npy")
    sol_b = np.load(Path(rd_b) / "test_simple_ode_nn_sol.npy")
    np.testing.assert_array_equal(sol_a, sol_b)


def test_restore_overrides_mismatched_seed(tmp_path, capsys):
    ck = str(tmp_path / "ckpt")
    rd = str(tmp_path / "temp_results")
    main(["simple-ode", "--solve", "--niters", "30", "--batch-size", "8",
          "--nnodes", "5", "--seed", "7", "--checkpoint", ck,
          "--results-dir", rd])
    main(["simple-ode", "--solve", "--niters", "10", "--batch-size", "8",
          "--nnodes", "5", "--seed", "0", "--restore", ck,
          "--results-dir", rd])
    assert "using it instead" in capsys.readouterr().out


def test_fredholm_parity_flag(tmp_path):
    """--parity forces the FULL reference-exact protocol: Monte-Carlo k=50
    quadrature AND lr 1e-4 + constant schedule (fredholm.py:142-144); the
    default is Gauss-Legendre + the tuned lr 3e-3 cosine."""
    rd = str(tmp_path / "temp_results")
    main(["fredholm", "--solve", "--niters", "30", "--batch-size", "8",
          "--nnodes", "10", "--parity", "--results-dir", rd])
    assert (Path(rd) / "fredholm_approx.npy").exists()
    manifest = json.loads((Path(rd) / "fredholm_run.json").read_text())
    assert manifest["params"]["lrate"] == pytest.approx(1e-4)
    parser = build_parser()
    args = parser.parse_args(["fredholm", "--solve"])
    assert args.quadrature == "gauss"
    assert args.lrate is None  # sentinel: resolved after --parity remap
    # A user-set --lrate survives --parity (only the default is swapped) —
    # including the tricky case where it EQUALS the tuned default 3e-3,
    # which a compare-by-value check could not distinguish.
    rd2 = str(tmp_path / "temp_results2")
    main(["fredholm", "--solve", "--niters", "30", "--batch-size", "8",
          "--nnodes", "10", "--parity", "--lrate", "3e-3",
          "--results-dir", rd2])
    manifest2 = json.loads((Path(rd2) / "fredholm_run.json").read_text())
    assert manifest2["params"]["lrate"] == pytest.approx(3e-3)


def test_sweep_grid_equation_default_cap(tmp_path):
    """Sweeping a fixed-grid equation with the default --max-batch-size 512
    must clamp to the sampler capacity instead of crashing (ADVICE r1)."""
    rd = str(tmp_path / "temp_results")
    main(["sweep", "--equation", "uat", "--num-samples", "2",
          "--max-iters", "30", "--results-dir", rd, "--seed", "1"])
    data = json.loads((Path(rd) / "sweep_uat.json").read_text())
    assert all(c["batch_size"] <= 50 for c in data["configs"])


def test_sweep_tpe_subcommand(tmp_path):
    rd = str(tmp_path / "temp_results")
    main(["sweep", "--equation", "simple_ode", "--scheduler", "tpe",
          "--num-samples", "4", "--max-iters", "60", "--max-batch-size", "16",
          "--results-dir", rd, "--seed", "1"])
    data = json.loads((Path(rd) / "sweep_simple_ode.json").read_text())
    assert len(data["configs"]) >= 4
    assert np.isfinite(data["best_score"])


def test_bn_model_checkpoint_roundtrip(tmp_path):
    """BatchNorm running stats ride the checkpoint (state key)."""
    from differential_equations_dnn_tpu.models import MLP
    from differential_equations_dnn_tpu.train import (
        TrainConfig,
        checkpoint_like,
        restore_checkpoint,
        save_checkpoint,
        train,
    )
    from differential_equations_dnn_tpu.equations import Heat1D
    import jax

    problem = Heat1D()
    model = MLP(2, 1, 8, 1, activation="tanh", batch_norm="pre")
    config = TrainConfig(iterations=10, batch_size=8, verbose=False)
    result = train(problem, jax.random.key(0), config, model=model)
    ck = tmp_path / "bn_ckpt"
    save_checkpoint(ck, {"params": result.params,
                         "opt_state": result.opt_state,
                         "state": result.state,
                         "step": np.asarray(10, np.int64),
                         "seed": np.asarray(0, np.int64)})
    like = checkpoint_like(problem, config, model=model)
    ckpt = restore_checkpoint(ck, like=like)
    np.testing.assert_array_equal(np.asarray(ckpt["state"]["mean"]),
                                  np.asarray(result.state["mean"]))


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


def test_export_inverse_heat(tmp_path):
    """--export on inverse_heat works (round-1 ADVICE: _InverseModel lacked
    the input_dim attribute the export path reads)."""
    rd = str(tmp_path / "temp_results")
    ex = str(tmp_path / "inv.stablehlo")
    main(["inverse-heat", "--solve", "--niters", "40", "--batch-size", "8",
          "--nnodes", "5", "--export", ex, "--results-dir", rd])
    from differential_equations_dnn_tpu.serving import load_solution
    fn = load_solution(ex)
    assert fn(np.zeros((2, 2), np.float32)).shape == (2, 1)


def test_fused_engine_restore_bit_identical(tmp_path):
    """The fused Pallas engine checkpoints/resumes exactly like the scan
    engine: Adam moments + absolute-step bias correction + per-step-keyed
    collocation draws make the resumed run bit-identical."""
    rd_a = str(tmp_path / "a")
    rd_b = str(tmp_path / "b")
    ck = str(tmp_path / "ckpt")
    base = ["heat", "--solve", "--engine", "fused", "--batch-size", "16",
            "--nnodes", "5", "--seed", "3"]
    main(base + ["--niters", "100", "--results-dir", rd_a])
    main(base + ["--niters", "60", "--checkpoint", ck, "--results-dir", rd_b])
    main(base + ["--niters", "40", "--restore", ck, "--results-dir", rd_b])
    sol_a = np.load(Path(rd_a) / "heat_sol_1d_dgm.npy")
    sol_b = np.load(Path(rd_b) / "heat_sol_1d_dgm.npy")
    np.testing.assert_array_equal(sol_a, sol_b)


def test_poisson_cli(tmp_path):
    rd = str(tmp_path / "temp_results")
    main(["poisson", "--solve", "--plot", "--niters", "40", "--batch-size",
          "32", "--nnodes", "6", "--results-dir", rd])
    assert np.load(Path(rd) / "poisson_sol_dgm.npy").shape == (6, 6)


def test_volterra_cli_quadrature_flag(tmp_path):
    rd = str(tmp_path / "temp_results")
    main(["volterra", "--solve", "--plot", "--niters", "40", "--batch-size",
          "16", "--nnodes", "8", "--quadrature", "montecarlo",
          "--quad-nodes", "12", "--results-dir", rd])
    assert np.load(Path(rd) / "volterra_approx.npy").shape == (8,)
