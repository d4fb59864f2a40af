"""Fused Pallas training-kernel tests (interpret mode on CPU).

The kernel's step math is verified three ways: hand-derived backward vs
jax.grad, kernel-vs-pure-loop exactness on identical uniforms, and end-to-end
convergence.
"""

import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from differential_equations_dnn_tpu.equations import Heat1D
from differential_equations_dnn_tpu.kernels import fused_train as ft
from differential_equations_dnn_tpu.models import MLP


@pytest.fixture
def setup(key):
    prob = Heat1D()
    model = prob.default_model()
    params = model.init(key)
    return prob, model, params


def test_hand_backward_matches_jax_grad(setup, key):
    prob, model, params = setup
    flat = ft.pack_params(model, params)
    u = jax.random.uniform(key, (16, 2))

    loss, grads = ft.fused_step_math(flat, u, 16, model.num_layers)
    ref = jax.grad(lambda f: ft.fused_step_math(f, u, 16, model.num_layers)[0])(flat)
    for a, b in zip(grads, ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


def test_step_math_matches_taylor_streams(setup, key):
    """The kernel's in-step loss equals the library loss on the same points."""
    prob, model, params = setup
    flat = ft.pack_params(model, params)
    u = jax.random.uniform(key, (32, 2))
    loss_k, _ = ft.fused_step_math(flat, u, 32, model.num_layers)

    x = math.pi * u[:, :1]
    t = 3.0 * u[:, 1:]
    batch = {
        "xt": jnp.concatenate([x, t], 1),
        "x0": jnp.concatenate([x, jnp.zeros_like(x)], 1),
        "xb1": jnp.concatenate([jnp.zeros_like(x), t], 1),
        "xb2": jnp.concatenate([jnp.full_like(x, math.pi), t], 1),
    }
    loss_lib = prob.loss(model.apply, params, batch)
    np.testing.assert_allclose(float(loss_k), float(loss_lib), rtol=1e-5)


def test_kernel_matches_pure_loop(setup, key):
    prob, model, params = setup
    flat = ft.pack_params(model, params)
    m = tuple(jnp.zeros_like(p) for p in flat)
    v = tuple(jnp.zeros_like(p) for p in flat)
    K, B = 4, 16
    u = jax.random.uniform(key, (K, B, 2))

    fp, mp, vp = flat, m, v
    pure_losses = []
    for i in range(K):
        loss, grads = ft.fused_step_math(fp, u[i], B, model.num_layers)
        pure_losses.append(float(loss))
        upd = [ft._adam_update(p_, m_, v_, g_, 1e-4, float(i + 1))
               for p_, m_, v_, g_ in zip(fp, mp, vp, grads)]
        fp = tuple(x[0] for x in upd)
        mp = tuple(x[1] for x in upd)
        vp = tuple(x[2] for x in upd)

    fk, mk, vk, losses = ft.heat_fused_train_chunk(model, flat, m, v, u, 0, 1e-4)
    np.testing.assert_allclose(np.asarray(losses), pure_losses, rtol=1e-5)
    for a, b in zip(fp, fk):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7)


def test_batch_tiling_matches_full_batch(setup, key):
    """Gradient-accumulation tiles (batch_tile < B) produce the same training
    trajectory as the untiled kernel — averaging equal-size tile gradients IS
    the full-batch gradient."""
    prob, model, params = setup
    flat = ft.pack_params(model, params)
    m = tuple(jnp.zeros_like(p) for p in flat)
    v = tuple(jnp.zeros_like(p) for p in flat)
    u = jax.random.uniform(key, (3, 32, 2))
    full = ft.heat_fused_train_chunk(model, flat, m, v, u, 0, 1e-4,
                                     batch_tile=32)
    tiled = ft.heat_fused_train_chunk(model, flat, m, v, u, 0, 1e-4,
                                      batch_tile=8)
    np.testing.assert_allclose(np.asarray(tiled[3]), np.asarray(full[3]),
                               rtol=1e-5)
    for a, b in zip(full[0], tiled[0]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7)


def test_batch_tile_must_divide(setup, key):
    prob, model, params = setup
    flat = ft.pack_params(model, params)
    with pytest.raises(ValueError, match="divisible"):
        ft.heat_fused_train_chunk(model, flat, flat, flat,
                                  jnp.zeros((1, 24, 2)), 0, 1e-4,
                                  batch_tile=16)


def test_train_heat_fused_converges(key):
    prob = Heat1D()
    model = prob.default_model()
    params, losses = ft.train_heat_fused(prob, key, iterations=600,
                                         batch_size=32, lrate=1e-3,
                                         chunk_size=300)
    assert losses.shape == (600,)
    assert losses[-1] < losses[0] * 0.1
    mae = prob.mae(model.apply, params, nodes=16)
    assert np.isfinite(mae)


def test_fused_rejects_unsupported_models(key):
    model = MLP(input_dim=2, output_dim=1, hidden_size=8, activation="relu")
    with pytest.raises(ValueError, match="tanh"):
        ft.heat_fused_train_chunk(model, (), (), (),
                                  jnp.zeros((1, 8, 2)), 0, 1e-4)


def test_mixed_precision_schedule_single_dispatch(key):
    """precision='mixed' chains the bf16 and fp32 kernels in one program;
    the collocation stream is keyed by absolute step index, so on CPU
    (where MXU precision modes are equivalent) the trajectory must match
    the pure-fp32 run exactly."""
    prob = Heat1D()
    r_mixed = ft.train_heat_fused_result(
        prob, jax.random.key(0), 10, batch_size=8, chunk_size=10,
        steps_per_cell=2, precision="mixed", mixed_split=0.6)
    r_fp32 = ft.train_heat_fused_result(
        prob, jax.random.key(0), 10, batch_size=8, chunk_size=10,
        steps_per_cell=2)
    assert r_mixed.loss_history.shape == (10,)
    np.testing.assert_allclose(r_mixed.loss_history, r_fp32.loss_history,
                               rtol=1e-6)


def test_mixed_precision_chunked_path(key):
    """iterations > chunk_size takes the two-call resume route; the keyed
    collocation stream keeps it equal to the single-dispatch trajectory."""
    prob = Heat1D()
    r = ft.train_heat_fused_result(
        prob, jax.random.key(0), 10, batch_size=8, chunk_size=4,
        steps_per_cell=2, precision="mixed", mixed_split=0.6)
    r_one = ft.train_heat_fused_result(
        prob, jax.random.key(0), 10, batch_size=8, chunk_size=10,
        steps_per_cell=2, precision="mixed", mixed_split=0.6)
    np.testing.assert_allclose(r.loss_history, r_one.loss_history, rtol=1e-6)
