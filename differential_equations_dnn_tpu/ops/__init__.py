"""Differential/integral operators and collocation samplers."""

from differential_equations_dnn_tpu.ops.diff import (
    dirderiv,
    dirderiv2,
    coord_direction,
    value_dt,
    value_dx_dxx,
    time_jacobian,
    hessian_diag,
)
from differential_equations_dnn_tpu.ops.quad import (
    montecarlo_nodes,
    gauss_legendre_nodes,
    halton_nodes,
    integrate,
)
from differential_equations_dnn_tpu.ops.sampling import UniformBox, GridSubsample

__all__ = [
    "dirderiv",
    "dirderiv2",
    "coord_direction",
    "hessian_diag",
    "value_dt",
    "value_dx_dxx",
    "time_jacobian",
    "montecarlo_nodes",
    "gauss_legendre_nodes",
    "halton_nodes",
    "integrate",
    "UniformBox",
    "GridSubsample",
]
