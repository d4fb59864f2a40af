"""Exactness tests for the derivative taps (SURVEY §4: compare forward-mode
taps against analytic derivatives of known functions)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from differential_equations_dnn_tpu.ops import (
    dirderiv,
    dirderiv2,
    coord_direction,
    value_dt,
    value_dx_dxx,
    time_jacobian,
    hessian_diag,
)


def test_dirderiv_matches_analytic():
    f = lambda x: jnp.sin(x)
    x = jnp.asarray([0.3, 1.2, 2.0])
    v = jnp.ones_like(x)
    y, dy = dirderiv(f, x, v)
    np.testing.assert_allclose(np.asarray(dy), np.cos(np.asarray(x)), rtol=1e-6)


def test_dirderiv2_second_order():
    f = lambda x: jnp.sin(x)
    x = jnp.asarray([0.5, 1.5])
    v = jnp.ones_like(x)
    y, dy, d2y = dirderiv2(f, x, v)
    np.testing.assert_allclose(np.asarray(y), np.sin(np.asarray(x)), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(dy), np.cos(np.asarray(x)), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(d2y), -np.sin(np.asarray(x)), rtol=1e-5)


def test_value_dx_dxx_on_heat_exact_solution():
    """u(x,t) = sin(x)e^{-t} satisfies u_t = u_xx; the taps must see that."""

    def u(z):  # z = [..., (x, t)]
        return (jnp.sin(z[..., 0]) * jnp.exp(-z[..., 1]))[..., None]

    z = jnp.asarray([[0.7, 0.2], [1.1, 2.5], [3.0, 0.0]])
    _, _, u_xx = value_dx_dxx(u, z, x_axis=0)
    _, u_t = value_dt(u, z, t_axis=1)
    np.testing.assert_allclose(np.asarray(u_t), np.asarray(u_xx), rtol=1e-5,
                               atol=1e-6)


def test_batched_direction_broadcast():
    x = jnp.zeros((4, 3))
    v = coord_direction(x, 1)
    assert v.shape == (4, 3)
    np.testing.assert_allclose(np.asarray(v[:, 1]), 1.0)
    np.testing.assert_allclose(np.asarray(v[:, 0]), 0.0)


def test_time_jacobian_system():
    """y(t) = (sin t, cos t): one jvp must return both components' rates."""

    def f(t):  # [B,1] -> [B,2]
        return jnp.concatenate([jnp.sin(t), jnp.cos(t)], axis=1)

    t = jnp.asarray([[0.0], [1.0], [2.0]])
    y, dy = time_jacobian(f, t)
    tt = np.asarray(t)[:, 0]
    np.testing.assert_allclose(np.asarray(dy),
                               np.stack([np.cos(tt), -np.sin(tt)], axis=1),
                               rtol=1e-6, atol=1e-7)


def test_hessian_diag_quadratic():
    A = jnp.asarray([[2.0, 0.5], [0.5, 3.0]])

    def f(x):
        return 0.5 * x @ A @ x

    x = jnp.asarray([0.3, -1.2])
    d = hessian_diag(f, x)
    np.testing.assert_allclose(np.asarray(d), np.diag(np.asarray(A)), rtol=1e-6)


def test_taps_work_through_real_model(key):
    """Forward-mode taps through an MLP must agree with reverse-mode
    ``jax.grad``/``jax.hessian`` — exactly the derivative the reference
    extracts via ``torch.autograd.grad`` (heat.py:73-85). fp32 finite
    differences are NOT usable here: XLA's vectorised tanh carries ~1e-6
    absolute error, which the 1/eps² amplification turns into O(10%) noise
    on the second difference."""
    from differential_equations_dnn_tpu.models import MLP

    model = MLP(input_dim=2, output_dim=1, hidden_size=16, num_layers=2,
                activation="tanh")
    params = model.init(key)
    f = lambda z: model.apply(params, z)

    z = jnp.asarray([[0.5, 1.0], [2.0, 0.3]])
    _, ux, uxx = value_dx_dxx(f, z, x_axis=0)

    g = lambda p: model.apply(params, p[None, :])[0, 0]
    rev_grad = jax.vmap(jax.grad(g))(z)            # [B, 2]
    rev_hess = jax.vmap(jax.hessian(g))(z)         # [B, 2, 2]
    np.testing.assert_allclose(np.asarray(ux)[:, 0], np.asarray(rev_grad)[:, 0],
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(uxx)[:, 0], np.asarray(rev_hess)[:, 0, 0],
                               rtol=1e-4, atol=1e-5)
