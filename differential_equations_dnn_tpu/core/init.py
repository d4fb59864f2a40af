"""Weight initializers.

Semantics match the reference's PyTorch init choices so that convergence
behaviour carries over (reference: neural_networks.py:247-270 uses
``xavier_uniform_`` with activation-dependent gain for tanh/sigmoid nets and
``kaiming_uniform_`` for relu/leaky_relu nets; DGM gate matrices use
xavier-uniform with relu gain, neural_networks.py:67-96; plain ``nn.Linear``
layers keep torch's default kaiming-uniform(a=sqrt(5)) + uniform bias,
dgm_net.py:38-48).

Weights are stored ``[fan_in, fan_out]`` (JAX convention, ``y = x @ W + b``),
so ``fan_in = shape[0]`` — the transpose of torch's ``[out, in]`` layout; the
sampled distributions are identical.
"""

import math

import jax
import jax.numpy as jnp

_GAINS = {
    "linear": 1.0,
    "sigmoid": 1.0,
    "tanh": 5.0 / 3.0,
    "relu": math.sqrt(2.0),
    "leaky_relu": math.sqrt(2.0 / (1.0 + 0.01**2)),
    "identity": 1.0,
}


def calculate_gain(nonlinearity: str, param: float | None = None) -> float:
    """Gain factor per nonlinearity (same table as torch.nn.init.calculate_gain)."""
    if nonlinearity == "leaky_relu" and param is not None:
        return math.sqrt(2.0 / (1.0 + param**2))
    try:
        return _GAINS[nonlinearity]
    except KeyError:
        raise ValueError(f"Unsupported nonlinearity for gain: {nonlinearity!r}")


def xavier_uniform(key, shape, gain: float = 1.0, dtype=jnp.float32):
    """Glorot/Xavier uniform: U(-a, a), a = gain * sqrt(6 / (fan_in + fan_out))."""
    fan_in, fan_out = shape[0], shape[1]
    bound = gain * math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


def kaiming_uniform(key, shape, nonlinearity: str = "relu", dtype=jnp.float32):
    """He/Kaiming uniform with fan_in mode: U(-b, b), b = gain * sqrt(3 / fan_in)."""
    gain = calculate_gain(nonlinearity)
    fan_in = shape[0]
    bound = gain * math.sqrt(3.0 / fan_in)
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


def torch_linear_default(key, shape, with_bias: bool = True, dtype=jnp.float32):
    """torch.nn.Linear default init: kaiming_uniform(a=sqrt(5)) on the weight
    (which reduces to U(-1/sqrt(fan_in), 1/sqrt(fan_in))) and the same bound
    for the bias. Returns (W, b) or (W, None)."""
    fan_in = shape[0]
    bound = 1.0 / math.sqrt(fan_in)
    wkey, bkey = jax.random.split(key)
    w = jax.random.uniform(wkey, shape, dtype, minval=-bound, maxval=bound)
    b = None
    if with_bias:
        b = jax.random.uniform(bkey, (shape[1],), dtype, minval=-bound, maxval=bound)
    return w, b


def zeros_init(_key, shape, dtype=jnp.float32):
    return jnp.zeros(shape, dtype)
