"""Activation registry.

Mirrors the reference's name→activation selector (neural_networks.py:24-41:
relu / sigmoid / tanh / leaky_relu, with a relu fallback on unknown names),
but as jnp-level callables that are transparent to jit/vmap/grad and cheap to
differentiate twice (needed for second-order PDE residuals).
"""

import logging

import jax
import jax.numpy as jnp

logger = logging.getLogger(__name__)

ACTIVATIONS = {
    "relu": jax.nn.relu,
    "sigmoid": jax.nn.sigmoid,
    "tanh": jnp.tanh,
    "leaky_relu": jax.nn.leaky_relu,
    "identity": lambda x: x,
}


def get_activation(name: str):
    """Look up an activation by name; unknown names fall back to relu with a
    warning (reference behaviour, neural_networks.py:39-41)."""
    fn = ACTIVATIONS.get(name)
    if fn is None:
        logger.warning("Activation %r not found; falling back to relu.", name)
        return ACTIVATIONS["relu"]
    return fn
