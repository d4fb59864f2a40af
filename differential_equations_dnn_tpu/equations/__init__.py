"""Declarative equation definitions (residual loss + sampler + ground truth).

The reference duplicates its loss/trainer/evaluator per script (the heat loss
alone is pasted four times: heat.py:50, optimize_heat_ray.py:32,
batchsize_effect_heat.py:50, batchnorm_effect_heat.py:191). Here each equation
is ONE declarative object consumed by the single jitted trainer in ``train``.
"""

from differential_equations_dnn_tpu.equations.base import Problem, TrainDefaults
from differential_equations_dnn_tpu.equations.simple_ode import SimpleODE
from differential_equations_dnn_tpu.equations.heat import Heat1D
from differential_equations_dnn_tpu.equations.heat2d import Heat2D
from differential_equations_dnn_tpu.equations.burgers import Burgers
from differential_equations_dnn_tpu.equations.inverse_heat import InverseHeat1D
from differential_equations_dnn_tpu.equations.fredholm import Fredholm2
from differential_equations_dnn_tpu.equations.fitzhugh_nagumo import FitzHughNagumo
from differential_equations_dnn_tpu.equations.uat import SineFit
from differential_equations_dnn_tpu.equations.wave import Wave1D
from differential_equations_dnn_tpu.equations.poisson import Poisson2D
from differential_equations_dnn_tpu.equations.volterra import Volterra2
from differential_equations_dnn_tpu.equations.advection import Advection1D

PROBLEMS = {
    "simple_ode": SimpleODE,
    "heat": Heat1D,
    "heat2d": Heat2D,
    "burgers": Burgers,
    "inverse_heat": InverseHeat1D,
    "fredholm": Fredholm2,
    "volterra": Volterra2,
    "fitzhugh_nagumo": FitzHughNagumo,
    "uat": SineFit,
    "wave": Wave1D,
    "advection": Advection1D,
    "poisson": Poisson2D,
}

__all__ = [
    "Problem",
    "TrainDefaults",
    "SimpleODE",
    "Heat1D",
    "Heat2D",
    "Burgers",
    "InverseHeat1D",
    "Fredholm2",
    "FitzHughNagumo",
    "SineFit",
    "Wave1D",
    "Advection1D",
    "Poisson2D",
    "Volterra2",
    "PROBLEMS",
]
