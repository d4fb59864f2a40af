"""Model zoo: pure-functional pytree modules.

Every model is a frozen dataclass of *static* configuration with two methods:

* ``init(key) -> params``  — build the parameter pytree.
* ``apply(params, x)``     — pure forward pass (jit/vmap/grad-transparent).

Stateful models (BatchNorm variants) additionally carry a ``state`` pytree of
running statistics: ``init_state()`` and ``apply(params, x, state=..., train=...)``.
"""

from differential_equations_dnn_tpu.models.mlp import MLP
from differential_equations_dnn_tpu.models.dgm import DGM, dgm_cell
from differential_equations_dnn_tpu.models.perceptron import Perceptron
from differential_equations_dnn_tpu.models.hard import HardConstraint
from differential_equations_dnn_tpu.models.resnet import ResNet, ResidualBlock
from differential_equations_dnn_tpu.models.stateful import (
    eval_apply,
    init_model_state,
    train_apply,
    update_state,
)

__all__ = ["MLP", "DGM", "dgm_cell", "HardConstraint", "Perceptron", "ResNet", "ResidualBlock",
           "eval_apply", "init_model_state", "train_apply", "update_state"]
