"""Core substrate: initializers, activations, PRNG plumbing, precision."""

from differential_equations_dnn_tpu.core.init import (
    calculate_gain,
    xavier_uniform,
    kaiming_uniform,
    torch_linear_default,
    zeros_init,
)
from differential_equations_dnn_tpu.core.activations import (
    get_activation,
    ACTIVATIONS,
)
from differential_equations_dnn_tpu.core.prng import key_chain, fold_index
from differential_equations_dnn_tpu.core.precision import (
    DOT_PRECISION,
    dense,
)

__all__ = [
    "calculate_gain",
    "xavier_uniform",
    "kaiming_uniform",
    "torch_linear_default",
    "zeros_init",
    "get_activation",
    "ACTIVATIONS",
    "key_chain",
    "fold_index",
    "DOT_PRECISION",
    "dense",
]
