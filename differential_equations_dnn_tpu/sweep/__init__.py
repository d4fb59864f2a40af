"""Hyperparameter search and ablation studies, TPU-native.

Replaces the reference's Ray Tune driver (optimize_heat_ray.py: Optuna search
+ ASHA over 10 trials, ≤5 concurrent processes) with vmapped population
training sharded over the device mesh, and the batch-size / batch-norm
ablation scripts (batchsize_effect_heat.py, batchnorm_effect_heat.py) with
population configs — including fixes for the reference's sweep bugs (the
swept batch size was never actually passed, batchsize_effect_heat.py:197, and
nets were reused across runs without re-init, :180-199).
"""

from differential_equations_dnn_tpu.sweep.search import (
    SearchSpace,
    loguniform,
    randint,
    uniform,
    choice,
    heat_search_space,
    random_search,
    successive_halving,
    halving_search_fused,
    tpe_halving,
    tpe_halving_fused,
    tpe_search,
    tpe_search_fused,
    SweepResult,
)
from differential_equations_dnn_tpu.sweep.tpe import TPESampler
from differential_equations_dnn_tpu.sweep.ablations import (
    batch_size_effect,
    batchnorm_effect,
)

__all__ = [
    "SearchSpace",
    "loguniform",
    "randint",
    "uniform",
    "choice",
    "heat_search_space",
    "random_search",
    "successive_halving",
    "halving_search_fused",
    "tpe_halving",
    "tpe_halving_fused",
    "tpe_search",
    "tpe_search_fused",
    "TPESampler",
    "SweepResult",
    "batch_size_effect",
    "batchnorm_effect",
]
