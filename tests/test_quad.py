"""Quadrature tests: the Fredholm kernel's integral has a closed form —
∫₀^{π/2} cos(t)·2sin(t) dt = 1 — so the rules are checked against it
(SURVEY §4)."""

import math

import numpy as np

import jax
import jax.numpy as jnp

from differential_equations_dnn_tpu.ops import (
    montecarlo_nodes,
    gauss_legendre_nodes,
    integrate,
)


def test_gauss_legendre_exact_for_polynomials():
    nodes, weights = gauss_legendre_nodes(4, 0.0, 2.0)
    # degree-7 polynomial integrates exactly with k=4
    vals = nodes**7
    np.testing.assert_allclose(float(integrate(vals, weights)), 2.0**8 / 8.0,
                               rtol=1e-10)


def test_gauss_legendre_fredholm_kernel():
    nodes, weights = gauss_legendre_nodes(20, 0.0, math.pi / 2)
    vals = jnp.cos(nodes) * 2.0 * jnp.sin(nodes)
    np.testing.assert_allclose(float(integrate(vals, weights)), 1.0, rtol=1e-8)


def test_montecarlo_converges(key):
    nodes, weights = montecarlo_nodes(key, 200_000, 0.0, math.pi / 2)
    vals = jnp.cos(nodes) * 2.0 * jnp.sin(nodes)
    assert abs(float(integrate(vals, weights)) - 1.0) < 0.01


def test_montecarlo_batch_shape(key):
    nodes, weights = montecarlo_nodes(key, 50, 0.0, 1.0, batch_shape=(8,))
    assert nodes.shape == (8, 50)
    assert weights.shape == (50,)
    # Each batch row gets independent nodes.
    assert not np.allclose(np.asarray(nodes[0]), np.asarray(nodes[1]))


def test_halton_low_discrepancy():
    from differential_equations_dnn_tpu.ops import halton_nodes

    nodes, weights = halton_nodes(512, 0.0, math.pi / 2)
    vals = jnp.cos(nodes) * 2.0 * jnp.sin(nodes)
    # QMC at k=512 should beat plain MC's ~1/sqrt(k) noise comfortably.
    assert abs(float(integrate(vals, weights)) - 1.0) < 0.005
    # offset shifts the sequence window
    n2, _ = halton_nodes(512, 0.0, math.pi / 2, offset=512)
    assert not np.allclose(np.asarray(nodes), np.asarray(n2))
    # nodes stay inside the interval
    assert float(nodes.min()) >= 0.0 and float(nodes.max()) <= math.pi / 2


def test_fredholm_halton_quadrature(key):
    from differential_equations_dnn_tpu.equations import Fredholm2

    prob = Fredholm2(quadrature="halton", k=64)
    exact = lambda params, x: 2.0 * jnp.sin(x)
    batch = prob.sample(key, 16)
    assert float(prob.loss(exact, None, batch)) < 1e-4


def test_halton_traced_offset_jits(key):
    """halton_nodes must accept a TRACED offset (it runs inside the jitted
    training step via Fredholm2's sampler)."""
    from differential_equations_dnn_tpu.ops import halton_nodes

    @jax.jit
    def f(off):
        return halton_nodes(16, 0.0, 1.0, offset=off)[0]

    out = f(jnp.asarray(7))
    assert out.shape == (16,)
