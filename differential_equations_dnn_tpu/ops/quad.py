"""Quadrature operators for integral equations.

The reference estimates the Fredholm integral with a Python loop of k=50
Monte-Carlo draws, each a separate net forward *inside the loss*
(fredholm.py:63-69). Here quadrature is data: a (nodes, weights) pair. The
integrand is evaluated in ONE batched forward over all nodes — on TPU this is
a single [k·B, d] matmul chain instead of 50 sequential kernel launches.

Two rules are provided: Monte-Carlo (parity with the reference, fresh nodes
per step via an explicit key) and Gauss–Legendre (deterministic, exact for
smooth kernels at far lower k).
"""

import numpy as np

import jax
import jax.numpy as jnp


def montecarlo_nodes(key, k, a=0.0, b=1.0, batch_shape=()):
    """Uniform Monte-Carlo nodes on [a, b] with constant weights (b−a)/k.

    ``batch_shape`` prepends per-sample axes so each collocation point can get
    its own node set (the reference draws fresh nodes per batch element via
    ``rand_like``, fredholm.py:66)."""
    nodes = jax.random.uniform(key, (*batch_shape, k), minval=a, maxval=b)
    weights = jnp.full((k,), (b - a) / k)
    return nodes, weights


def gauss_legendre_nodes(k, a=0.0, b=1.0):
    """Gauss–Legendre rule on [a, b]; exact for polynomials of degree 2k−1.
    Computed on host (static, cached by jit closure)."""
    x, w = np.polynomial.legendre.leggauss(k)
    nodes = 0.5 * (b - a) * (x + 1.0) + a
    weights = 0.5 * (b - a) * w
    return jnp.asarray(nodes), jnp.asarray(weights)


def halton_nodes(k, a=0.0, b=1.0, base=2, offset=0):
    """Quasi-Monte-Carlo nodes: the base-``base`` Halton (van der Corput)
    low-discrepancy sequence mapped to [a, b], with constant weights.

    QMC error decays ~O(log k / k) vs Monte-Carlo's O(1/√k) — a drop-in
    upgrade for the Fredholm quadrature when deterministic Gauss–Legendre is
    not wanted (e.g. kernels with limited smoothness). Computed on device
    with integer bit arithmetic; ``offset`` shifts the sequence start so
    successive training steps see fresh node sets."""
    # Static-length arange + traced offset (offset may be a traced value
    # inside jitted training steps).
    idx = jnp.arange(1, k + 1, dtype=jnp.uint32) + jnp.asarray(offset, jnp.uint32)
    result = jnp.zeros((k,), jnp.float32)
    denom = jnp.ones((k,), jnp.float32)
    # 32 digits cover indices < base^32; fori keeps it jit-friendly.
    def body(_, carry):
        idx, result, denom = carry
        denom = denom * base
        result = result + (idx % base).astype(jnp.float32) / denom
        return idx // base, result, denom

    _, result, _ = jax.lax.fori_loop(0, 32, body, (idx, result, denom))
    nodes = a + (b - a) * result
    weights = jnp.full((k,), (b - a) / k)
    return nodes, weights


def integrate(values, weights):
    """Σ_i w_i · f_i along the last axis. ``values``: [..., k]; ``weights``:
    [k] or broadcastable."""
    return jnp.sum(values * weights, axis=-1)
