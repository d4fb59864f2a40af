"""Multi-chip logic on the 8-device simulated CPU mesh (conftest)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from differential_equations_dnn_tpu.equations import SimpleODE, Heat1D
from differential_equations_dnn_tpu.models import MLP
from differential_equations_dnn_tpu.parallel import (
    make_mesh,
    single_axis_mesh,
    shard_batch,
    replicate,
    PopulationConfig,
    train_population,
    take_trials,
)
from differential_equations_dnn_tpu.train import TrainConfig, train


def test_eight_simulated_devices():
    assert jax.device_count() == 8


def test_make_mesh_shapes():
    mesh = make_mesh({"pop": 2, "data": 4})
    assert mesh.shape == {"pop": 2, "data": 4}
    mesh = single_axis_mesh("data")
    assert mesh.shape == {"data": 8}


def test_data_parallel_training_matches_single(key):
    """DP over 8 devices must produce the same loss trajectory as 1 device —
    the batch is identical; only its placement changes."""
    prob = SimpleODE()
    cfg = TrainConfig(iterations=100, batch_size=64, verbose=False)
    res_single = train(prob, key, cfg)
    mesh = single_axis_mesh("data")
    res_dp = train(prob, key, cfg, mesh=mesh)
    np.testing.assert_allclose(res_single.loss_history, res_dp.loss_history,
                               rtol=1e-4, atol=1e-6)


def test_data_parallel_heat_runs(key):
    mesh = single_axis_mesh("data")
    cfg = TrainConfig(iterations=20, batch_size=64, verbose=False)
    res = train(Heat1D(), key, cfg, mesh=mesh)
    assert np.isfinite(res.loss_history).all()


def test_shard_and_replicate_helpers(key):
    mesh = single_axis_mesh("data")
    batch = {"x": jnp.ones((64, 2))}
    sharded = shard_batch(batch, mesh)
    assert len(sharded["x"].sharding.device_set) == 8
    params = {"w": jnp.ones((4, 4))}
    rep = replicate(params, mesh)
    assert len(rep["w"].sharding.device_set) == 8


def test_population_training_basic(key):
    prob = SimpleODE()
    model = prob.default_model()
    lrates = jnp.asarray([1e-3, 1e-4, 1e-5, 1e-2])
    config = PopulationConfig(iterations=200, max_batch_size=32)
    params, _, losses = train_population(prob, model, key, lrates, config=config)
    assert losses.shape == (200, 4)
    # Different lrs must yield different loss curves.
    assert not np.allclose(losses[:, 0], losses[:, 1])
    # Params are stacked [P, ...].
    assert params["fc_in"]["w"].shape[0] == 4


def test_population_masked_batch_sizes(key):
    """A trial with bs=8 inside a max_bs=32 population must match a plain
    bs=8 run exactly (same per-trial key stream)."""
    prob = SimpleODE()
    model = prob.default_model()
    config = PopulationConfig(iterations=50, max_batch_size=32)
    _, _, losses = train_population(
        prob, model, key, jnp.asarray([1e-3]), jnp.asarray([8]), config=config
    )
    assert np.isfinite(losses).all()
    # Masked loss at step 0 must equal the loss computed on the first 8
    # points only — already covered at the op level in test_equations; here
    # we assert the mask changes the trajectory vs the full batch.
    _, _, losses_full = train_population(
        prob, model, key, jnp.asarray([1e-3]), jnp.asarray([32]), config=config
    )
    assert not np.allclose(losses, losses_full)


def test_population_sharded_over_pop_axis(key):
    prob = SimpleODE()
    model = prob.default_model()
    mesh = single_axis_mesh("pop")
    lrates = jnp.full((16,), 1e-3)
    config = PopulationConfig(iterations=50, max_batch_size=16)
    params, _, losses = train_population(prob, model, key, lrates,
                                         config=config, mesh=mesh)
    assert losses.shape == (50, 16)
    assert np.isfinite(losses).all()


def test_take_trials(key):
    tree = {"a": jnp.arange(12).reshape(4, 3)}
    sub = take_trials(tree, np.array([2, 0]))
    np.testing.assert_array_equal(np.asarray(sub["a"]),
                                  np.asarray([[6, 7, 8], [0, 1, 2]]))


def test_population_resume_continues(key):
    prob = SimpleODE()
    model = prob.default_model()
    lrates = jnp.asarray([1e-3, 1e-3])
    c1 = PopulationConfig(iterations=100, max_batch_size=16)
    p1, o1, l1 = train_population(prob, model, key, lrates, config=c1)
    c2 = PopulationConfig(iterations=50, max_batch_size=16)
    p2, o2, l2 = train_population(prob, model, key, lrates, config=c2,
                                  params=p1, opt_state=o1)
    assert l2[0].max() < l1[0].max()  # warm start, loss already low


def test_population_rejects_indivisible_sharding(key):
    prob = SimpleODE()
    model = prob.default_model()
    mesh = single_axis_mesh("pop")
    with pytest.raises(ValueError, match="divide evenly"):
        train_population(prob, model, key, jnp.full((5,), 1e-3),
                         config=PopulationConfig(iterations=1, max_batch_size=4),
                         mesh=mesh)


def test_global_mesh_default():
    from differential_equations_dnn_tpu.parallel import global_mesh

    mesh = global_mesh()
    assert mesh.shape == {"data": 8}
    mesh2 = global_mesh({"pop": 4, "data": 2})
    assert mesh2.shape == {"pop": 4, "data": 2}
