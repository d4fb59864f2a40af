"""Trainer integration tests: convergence at small budgets (CPU-friendly),
chunking, resume, and determinism."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from differential_equations_dnn_tpu.equations import SimpleODE, SineFit
from differential_equations_dnn_tpu.train import (
    TrainConfig,
    train,
    save_checkpoint,
    restore_checkpoint,
)


def test_simple_ode_converges_fast(key):
    """2k iterations must already reach MAE < 0.02 on CPU (full reference
    budget reaches 0.0017 — verified on TPU; kept short for CI)."""
    prob = SimpleODE()
    cfg = TrainConfig(iterations=2000, batch_size=64, lrate=1e-3, verbose=False)
    res = train(prob, key, cfg)
    mae = prob.mae(prob.default_model().apply, res.params, nodes=25)
    assert mae < 0.02, mae
    assert res.loss_history.shape == (2000,)
    # Loss must have decreased by orders of magnitude.
    assert res.loss_history[-1] < res.loss_history[0] * 1e-2


def test_loss_history_matches_chunking(key):
    """Chunked execution must be invisible: 3 chunks of 300 ≡ 1 chunk of 900."""
    prob = SineFit(n_points=16)
    cfg_a = TrainConfig(iterations=900, batch_size=16, chunk_size=300, verbose=False)
    cfg_b = TrainConfig(iterations=900, batch_size=16, chunk_size=900, verbose=False)
    res_a = train(prob, key, cfg_a)
    res_b = train(prob, key, cfg_b)
    np.testing.assert_allclose(res_a.loss_history, res_b.loss_history,
                               rtol=1e-5, atol=1e-7)


def test_training_is_deterministic(key):
    prob = SimpleODE()
    cfg = TrainConfig(iterations=200, batch_size=32, verbose=False)
    r1 = train(prob, key, cfg)
    r2 = train(prob, key, cfg)
    np.testing.assert_array_equal(r1.loss_history, r2.loss_history)


def test_remainder_chunk(key):
    prob = SineFit(n_points=8)
    cfg = TrainConfig(iterations=250, batch_size=8, chunk_size=100, verbose=False)
    res = train(prob, key, cfg)
    assert res.loss_history.shape == (250,)


def test_checkpoint_roundtrip(key, tmp_path):
    prob = SimpleODE()
    cfg = TrainConfig(iterations=100, batch_size=16, verbose=False)
    res = train(prob, key, cfg)
    ckpt = {"params": res.params, "step": jnp.asarray(100)}
    path = save_checkpoint(tmp_path / "ckpt", ckpt)
    restored = restore_checkpoint(path)
    assert int(restored["step"]) == 100
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b)),
        res.params, restored["params"],
    )


def test_resume_from_params(key):
    """Passing params/opt_state continues training rather than restarting."""
    prob = SimpleODE()
    cfg1 = TrainConfig(iterations=300, batch_size=32, verbose=False)
    r1 = train(prob, key, cfg1)
    cfg2 = TrainConfig(iterations=300, batch_size=32, verbose=False)
    r2 = train(prob, key, cfg2, params=r1.params, opt_state=r1.opt_state,
               start_step=300)
    assert r2.loss_history[0] < r1.loss_history[0] * 0.5  # warm start


def test_adaptive_oversampling_improves_mae(key):
    """Residual-based adaptive collocation (adaptive_oversample) must at
    least match uniform sampling at equal iteration budget."""
    from differential_equations_dnn_tpu.equations import Heat1D

    prob = Heat1D()
    model = prob.default_model()
    maes = {}
    for ov in (0, 4):
        cfg = TrainConfig(iterations=400, batch_size=32,
                          adaptive_oversample=ov, verbose=False)
        res = train(prob, key, cfg)
        maes[ov] = prob.mae(model.apply, res.params, nodes=20)
    assert maes[4] < maes[0] * 1.5  # never catastrophically worse
    assert all(np.isfinite(v) for v in maes.values())


def test_metrics_jsonl(key, tmp_path):
    import json
    from differential_equations_dnn_tpu.equations import SineFit

    mf = tmp_path / "metrics.jsonl"
    cfg = TrainConfig(iterations=250, batch_size=8, chunk_size=100,
                      verbose=False, metrics_file=str(mf))
    train(SineFit(n_points=8), key, cfg)
    records = [json.loads(l) for l in mf.read_text().splitlines()]
    assert [r["step"] for r in records] == [100, 200, 250]
    assert all("iters_per_sec" in r and np.isfinite(r["loss"]) for r in records)


def test_elastic_recovery_from_injected_fault(key):
    """A device failure mid-run restores the host snapshot and produces the
    SAME result as an uninterrupted run (deterministic per-step keys)."""
    from differential_equations_dnn_tpu.train import trainer as trainer_mod
    from differential_equations_dnn_tpu.equations import SineFit

    prob = SineFit(n_points=8)
    cfg = TrainConfig(iterations=300, batch_size=8, chunk_size=100,
                      verbose=False)
    clean = train(prob, key, cfg)
    with trainer_mod.inject_fault(at_dispatch=1):
        recovered = train(prob, key, cfg)
    np.testing.assert_allclose(clean.loss_history, recovered.loss_history,
                               rtol=1e-6)


def test_recovery_exhausts_retries(key):
    from differential_equations_dnn_tpu.train import trainer as trainer_mod
    from differential_equations_dnn_tpu.equations import SineFit

    prob = SineFit(n_points=8)
    cfg = TrainConfig(iterations=200, batch_size=8, chunk_size=100,
                      verbose=False, max_retries=1)
    with trainer_mod.inject_fault(at_dispatch=0):
        trainer_mod._FAULT_QUEUE.extend([1, 2])  # fail three times total
        with pytest.raises(trainer_mod._InjectedFault):
            train(prob, key, cfg)


def test_recovery_disabled(key):
    from differential_equations_dnn_tpu.train import trainer as trainer_mod
    from differential_equations_dnn_tpu.equations import SineFit

    prob = SineFit(n_points=8)
    cfg = TrainConfig(iterations=100, batch_size=8, verbose=False,
                      snapshot_every=0)
    with trainer_mod.inject_fault(at_dispatch=0):
        with pytest.raises(trainer_mod._InjectedFault):
            train(prob, key, cfg)


def test_lbfgs_finetune_improves(key):
    from differential_equations_dnn_tpu.equations import Heat1D
    from differential_equations_dnn_tpu.train import finetune_lbfgs

    prob = Heat1D(taps="taylor")
    model = prob.default_model()
    res = train(prob, key, TrainConfig(iterations=800, batch_size=64,
                                       lrate=1e-3, verbose=False))
    mae0 = prob.mae(model.apply, res.params, nodes=20)
    params, losses = finetune_lbfgs(prob, res.params, key, steps=60,
                                    batch_size=1024, model=model)
    mae1 = prob.mae(model.apply, params, nodes=20)
    assert losses[-1] < losses[0]
    assert mae1 < mae0 * 1.2  # typically much better, never much worse
