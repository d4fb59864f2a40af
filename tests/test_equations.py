"""Equation-definition tests: the residual loss must (a) vanish at the
analytic solution and (b) be positive away from it. This validates the
physics independent of any training."""

import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from differential_equations_dnn_tpu.equations import (
    SimpleODE,
    Heat1D,
    Fredholm2,
    FitzHughNagumo,
    SineFit,
)


def _exact_apply(fn):
    """Wrap an analytic solution as an apply_fn(params, x)."""
    return lambda params, x: fn(x)


def test_simple_ode_loss_zero_at_exact(key):
    prob = SimpleODE()
    exact = _exact_apply(lambda t: 2.0 * jnp.exp(-t))
    batch = prob.sample(key, 64)
    loss = prob.loss(exact, None, batch)
    assert float(loss) < 1e-9
    wrong = _exact_apply(lambda t: 2.0 * jnp.exp(t))
    assert float(prob.loss(wrong, None, batch)) > 0.1


def test_heat_loss_zero_at_exact(key):
    prob = Heat1D()
    exact = _exact_apply(
        lambda z: (jnp.sin(z[..., :1]) * jnp.exp(-z[..., 1:2]))
    )
    batch = prob.sample(key, 64)
    assert float(prob.loss(exact, None, batch)) < 1e-9


def test_fredholm_loss_small_at_exact_gauss(key):
    prob = Fredholm2(quadrature="gauss", k=20)
    exact = _exact_apply(lambda x: 2.0 * jnp.sin(x))
    batch = prob.sample(key, 32)
    # Gauss rule is near-exact for the smooth kernel → residual ~ 0.
    assert float(prob.loss(exact, None, batch)) < 1e-8


def test_fredholm_mc_loss_small_at_exact(key):
    prob = Fredholm2(quadrature="montecarlo", k=4000)
    exact = _exact_apply(lambda x: 2.0 * jnp.sin(x))
    batch = prob.sample(key, 32)
    # Monte-Carlo noise shrinks as 1/sqrt(k).
    assert float(prob.loss(exact, None, batch)) < 1e-3


def test_fitzhugh_nagumo_residual_consistency(key):
    """The loss at the odeint ground truth (interpolated by a spline-free
    check: evaluate the residual algebra directly on odeint values and
    derivatives from the RHS) must be ~0 — verified by substituting the RHS."""
    prob = FitzHughNagumo()

    # Build an apply_fn from cubic interpolation of a fine odeint trajectory.
    t_fine = np.linspace(0.0, prob.t_max, 3001)
    from scipy.integrate import odeint
    from differential_equations_dnn_tpu.equations.fitzhugh_nagumo import fzn_rhs
    sol = odeint(fzn_rhs, [0.0, 0.0], t_fine,
                 args=(prob.i_ext, prob.alpha, prob.beta, prob.tau))

    def apply_fn(params, t):
        tt = jnp.clip(t[:, 0], 0.0, prob.t_max)
        y = jnp.interp(tt, jnp.asarray(t_fine), jnp.asarray(sol[:, 0]))
        w = jnp.interp(tt, jnp.asarray(t_fine), jnp.asarray(sol[:, 1]))
        return jnp.stack([y, w], axis=1)

    batch = prob.sample(key, 64)
    # Linear interpolation limits accuracy; residual should still be small.
    assert float(prob.loss(apply_fn, None, batch)) < 5e-3


def test_masked_loss_matches_subset(key):
    """Masking the point loss must equal computing on the subset (the
    population-sweep batch-size mechanism)."""
    prob = SimpleODE()
    model = prob.default_model()
    params = model.init(key)
    batch = prob.sample(key, 32)
    mask = jnp.arange(32) < 10
    masked = float(prob.loss(model.apply, params, batch, mask=mask))
    sub_batch = {k: v[:10] for k, v in batch.items()}
    subset = float(prob.loss(model.apply, params, sub_batch))
    np.testing.assert_allclose(masked, subset, rtol=1e-6)


def test_exact_solutions_shapes():
    assert SimpleODE().exact(25).shape == (25,)
    assert Heat1D().exact(40).shape == (40, 40)
    assert Fredholm2().exact(50).shape == (50,)
    assert FitzHughNagumo().exact(50).shape == (50, 2)
    assert SineFit().exact(50).shape == (50,)


def test_heat_exact_boundary_values():
    sol = Heat1D().exact(40)
    np.testing.assert_allclose(sol[:, 0], 0.0, atol=1e-12)   # x = 0
    np.testing.assert_allclose(sol[:, -1], 0.0, atol=1e-12)  # x = π
    np.testing.assert_allclose(sol[0], np.sin(np.linspace(0, math.pi, 40)),
                               atol=1e-12)                    # t = 0


def test_evaluate_grid_batched(key):
    prob = Heat1D()
    model = prob.default_model()
    params = model.init(key)
    out = prob.evaluate(model.apply, params, nodes=16)
    assert out.shape == (16, 16)
    mae = prob.mae(model.apply, params, nodes=16)
    assert np.isfinite(mae)


def test_heat2d_loss_zero_at_exact(key):
    from differential_equations_dnn_tpu.equations import Heat2D

    prob = Heat2D()
    exact = _exact_apply(
        lambda z: (jnp.sin(z[..., :1]) * jnp.sin(z[..., 1:2])
                   * jnp.exp(-2.0 * z[..., 2:3]))
    )
    batch = prob.sample(key, 64)
    assert float(prob.loss(exact, None, batch)) < 1e-9
    assert prob.exact(12).shape == (12, 12, 12)
    # exact field respects boundaries and IC
    sol = prob.exact(12)
    np.testing.assert_allclose(sol[:, 0, :], 0.0, atol=1e-12)
    np.testing.assert_allclose(sol[:, :, -1], 0.0, atol=1e-10)


def test_heat2d_short_training_decreases_loss(key):
    from differential_equations_dnn_tpu.equations import Heat2D
    from differential_equations_dnn_tpu.train import TrainConfig, train

    prob = Heat2D()
    cfg = TrainConfig(iterations=150, batch_size=64, lrate=1e-3, verbose=False)
    res = train(prob, key, cfg)
    assert res.loss_history[-1] < res.loss_history[0] * 0.8
    out = prob.evaluate(prob.default_model().apply, res.params, nodes=8)
    assert out.shape == (8, 8, 8)


def test_fitzhugh_nagumo_arch_variants(key):
    from differential_equations_dnn_tpu.equations import FitzHughNagumo

    dgm = FitzHughNagumo().default_model()
    fmlp = FitzHughNagumo(arch="fourier_mlp").default_model()
    assert type(dgm).__name__ == "DGM"
    assert fmlp.fourier_features == 16
    with pytest.raises(ValueError, match="unknown arch"):
        FitzHughNagumo(arch="transformer").default_model()
    # fourier model trains through the FN loss
    prob = FitzHughNagumo(arch="fourier_mlp")
    params = fmlp.init(key)
    batch = prob.sample(key, 16)
    loss = prob.loss(fmlp.apply, params, batch)
    assert np.isfinite(float(loss))


def test_burgers_loss_zero_at_exact(key):
    from differential_equations_dnn_tpu.equations import Burgers

    prob = Burgers()
    exact = _exact_apply(
        lambda z: prob._exact_fn(z[..., :1], z[..., 1:2])
    )
    batch = prob.sample(key, 64)
    assert float(prob.loss(exact, None, batch)) < 1e-8
    # Wrong viscosity must NOT satisfy the residual.
    wrong = Burgers(nu=0.2)
    assert float(wrong.loss(exact, None, batch)) > 1e-4
    assert prob.exact(20).shape == (20, 20)


def test_burgers_short_training(key):
    from differential_equations_dnn_tpu.equations import Burgers
    from differential_equations_dnn_tpu.train import TrainConfig, train

    prob = Burgers()
    cfg = TrainConfig(iterations=400, batch_size=64, lrate=1e-3, verbose=False)
    res = train(prob, key, cfg)
    assert res.loss_history[-1] < res.loss_history[0] * 0.5
    mae = prob.mae(prob.default_model().apply, res.params, nodes=16)
    assert np.isfinite(mae)


def test_inverse_heat_identifies_kappa(key):
    from differential_equations_dnn_tpu.equations import InverseHeat1D
    from differential_equations_dnn_tpu.train import TrainConfig, train

    prob = InverseHeat1D()
    cfg = TrainConfig(iterations=1500, batch_size=128, lrate=1e-3,
                      verbose=False)
    res = train(prob, key, cfg)
    # kappa moves decisively from the 0.5 guess toward the true 1.0.
    assert prob.kappa_error(res.params) < 0.15
    # masked loss path (population sweeps) also works
    import jax.numpy as jnp
    batch = prob.sample(key, 32)
    model = prob.default_model()
    masked = prob.loss(model.apply, res.params, batch,
                       mask=jnp.arange(32) < 16)
    assert np.isfinite(float(masked))
    # point_loss is deliberately unsupported
    with pytest.raises(NotImplementedError):
        prob.point_loss(model.apply, res.params, batch)


def test_wave_loss_zero_at_exact(key):
    from differential_equations_dnn_tpu.equations import Wave1D

    prob = Wave1D()
    exact = _exact_apply(
        lambda z: jnp.sin(z[..., :1]) * jnp.cos(z[..., 1:2])
    )
    batch = prob.sample(key, 64)
    assert float(prob.loss(exact, None, batch)) < 1e-9
    # A travelling wave satisfies the PDE and the boundary-ish terms but NOT
    # the velocity IC — the term that makes hyperbolic problems distinct.
    travelling = _exact_apply(
        lambda z: jnp.sin(z[..., :1] - z[..., 1:2])
    )
    assert float(prob.loss(travelling, None, batch)) > 0.1


def test_wave_short_training_decreases_loss(key):
    from differential_equations_dnn_tpu.equations import Wave1D
    from differential_equations_dnn_tpu.train import TrainConfig, train

    prob = Wave1D()
    result = train(prob, key, TrainConfig(iterations=150, batch_size=32,
                                          lrate=1e-3, schedule="cosine",
                                          verbose=False))
    h = result.loss_history
    assert h[-30:].mean() < h[:30].mean()
    assert np.isfinite(prob.mae(prob.default_model().apply, result.params,
                                nodes=8))


def test_wave_exact_shape_and_ic():
    from differential_equations_dnn_tpu.equations import Wave1D

    prob = Wave1D()
    u = prob.exact(12)
    assert u.shape == (12, 12)
    np.testing.assert_allclose(u[0], np.sin(np.linspace(0, math.pi, 12)),
                               atol=1e-12)
    np.testing.assert_allclose(u[:, 0], 0.0, atol=1e-12)


def test_poisson_loss_zero_at_exact(key):
    from differential_equations_dnn_tpu.equations import Poisson2D

    prob = Poisson2D()
    exact = _exact_apply(
        lambda z: jnp.sin(z[..., :1]) * jnp.sin(z[..., 1:2])
    )
    batch = prob.sample(key, 64)
    assert float(prob.loss(exact, None, batch)) < 1e-9
    # A harmonic function (Δu = 0) misses the source term and the boundary.
    harmonic = _exact_apply(lambda z: z[..., :1] * z[..., 1:2])
    assert float(prob.loss(harmonic, None, batch)) > 0.1


def test_poisson_short_training_decreases_loss(key):
    from differential_equations_dnn_tpu.equations import Poisson2D
    from differential_equations_dnn_tpu.train import TrainConfig, train

    prob = Poisson2D()
    result = train(prob, key, TrainConfig(iterations=150, batch_size=64,
                                          lrate=1e-3, schedule="cosine",
                                          verbose=False))
    h = result.loss_history
    assert h[-30:].mean() < h[:30].mean()
    assert np.isfinite(prob.mae(prob.default_model().apply, result.params,
                                nodes=8))


def test_poisson_exact_boundary():
    from differential_equations_dnn_tpu.equations import Poisson2D

    u = Poisson2D().exact(12)
    assert u.shape == (12, 12)
    np.testing.assert_allclose(u[0], 0.0, atol=1e-12)
    np.testing.assert_allclose(u[:, -1], 0.0, atol=1e-12)


def test_volterra_loss_zero_at_exact(key):
    from differential_equations_dnn_tpu.equations import Volterra2

    prob = Volterra2()
    exact = _exact_apply(lambda t: jnp.sin(t))
    batch = prob.sample(key, 64)
    # Gauss-Legendre with k=50 integrates (t-x)·sin t essentially exactly.
    assert float(prob.loss(exact, None, batch)) < 1e-8
    wrong = _exact_apply(lambda t: jnp.cos(t))
    assert float(prob.loss(wrong, None, batch)) > 0.1


def test_volterra_quadrature_rescaling(key):
    """The rescaled Gauss rule must reproduce ∫₀ˣ (t−x)·sin t dt
    = sin x − x exactly (that identity is WHY y=sin x solves the IE)."""
    from differential_equations_dnn_tpu.equations import Volterra2

    prob = Volterra2(k=20)
    batch = prob.sample(key, 16)
    x, tq, wq = batch["x"], batch["tq"], batch["wq"]
    integral = np.sum(np.asarray((tq - x) * jnp.sin(tq) * wq), axis=1)
    np.testing.assert_allclose(integral, np.asarray(jnp.sin(x) - x)[:, 0],
                               atol=1e-6)


def test_volterra_montecarlo_mode(key):
    from differential_equations_dnn_tpu.equations import Volterra2

    prob = Volterra2(quadrature="montecarlo", k=4000)
    exact = _exact_apply(lambda t: jnp.sin(t))
    batch = prob.sample(key, 32)
    # MC quadrature: loss at the exact solution is small but nonzero.
    assert float(prob.loss(exact, None, batch)) < 1e-2


def test_volterra_short_training_converges(key):
    from differential_equations_dnn_tpu.api import solve

    res = solve("volterra", iterations=400, batch_size=64, nodes=20)
    assert res.mae < 0.2


def test_fn_causal_sample_prefix_covers_domain(key):
    """The causal stratified sampler must return SHUFFLED rows: population
    sweeps mask trials to a row prefix, and a time-sorted layout would
    train a bs=50-of-200 trial only on the first quarter of [0, t_max]
    (round-3 review finding)."""
    import jax

    from differential_equations_dnn_tpu.equations import PROBLEMS

    prob = PROBLEMS["fitzhugh_nagumo"]()
    assert prob.causal_eps > 0
    t = np.asarray(prob.sample(jax.random.key(0), 200)["t"])[:, 0]
    prefix = t[:50]
    assert prefix.min() < 0.15 * prob.t_max
    assert prefix.max() > 0.85 * prob.t_max
    # ... while remaining stratified over the full batch (gap-free).
    gaps = np.diff(np.sort(t))
    assert gaps.max() < 3.0 * prob.t_max / 200


def test_advection_loss_zero_at_exact(key):
    from differential_equations_dnn_tpu.equations import Advection1D

    prob = Advection1D()
    exact = _exact_apply(
        lambda z: jnp.sin(z[..., :1] - prob.c * z[..., 1:2]))
    batch = prob.sample(key, 64)
    assert float(prob.loss(exact, None, batch)) < 1e-9
    # A standing profile satisfies the IC but NOT the transport residual.
    standing = _exact_apply(lambda z: jnp.sin(z[..., :1]))
    assert float(prob.loss(standing, None, batch)) > 0.1


def test_advection_causal_weighting(key):
    """causal_eps > 0: stratified-t sampling, and the weighted loss equals
    the plain loss for a net with zero residual (weights anneal to 1)
    while discounting late-time residual for a bad net."""
    from differential_equations_dnn_tpu.equations import Advection1D

    prob = Advection1D(causal_eps=10.0)
    batch = prob.sample(key, 64)
    # Stratified t: one point per slice of [0, t_max].
    t = np.sort(np.asarray(batch["xt"][:, 1]))
    edges = np.arange(64) * (prob.t_max / 64)
    assert (t >= edges).all() and (t <= edges + prob.t_max / 64).all()
    exact = _exact_apply(
        lambda z: jnp.sin(z[..., :1] - prob.c * z[..., 1:2]))
    assert float(prob.loss(exact, None, batch)) < 1e-9
    # A net whose transport residual is nonzero at all times: the causal
    # weights discount the late-time residual, so the weighted loss sits
    # strictly below the plain mean of the same pointwise energies.
    bad = _exact_apply(lambda z: jnp.sin(z[..., :1]) * z[..., 1:2])
    assert (float(prob.loss(bad, None, batch))
            < float(prob.point_loss(bad, None, batch).mean()))


def test_advection_short_training_decreases_loss(key):
    from differential_equations_dnn_tpu.equations import Advection1D
    from differential_equations_dnn_tpu.train import TrainConfig, train

    prob = Advection1D()
    result = train(prob, key, TrainConfig(iterations=150, batch_size=32,
                                          lrate=1e-3, schedule="cosine",
                                          verbose=False))
    h = result.loss_history
    assert h[-30:].mean() < h[:30].mean()
    assert np.isfinite(prob.mae(prob.default_model().apply, result.params,
                                nodes=8))


def test_advection_exact_shape():
    from differential_equations_dnn_tpu.equations import Advection1D

    prob = Advection1D()
    u = prob.exact(12)
    assert u.shape == (12, 12)
    np.testing.assert_allclose(
        u[0], np.sin(np.linspace(0, prob.x_max, 12)), atol=1e-12)
