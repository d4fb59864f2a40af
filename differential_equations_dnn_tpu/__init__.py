"""differential_equations_dnn_tpu — a TPU-native deep differential-equation
solver framework (JAX / XLA / Pallas / pjit).

Re-designed from scratch with the capabilities of the reference repository
``gdetor/differential_equations_dnn`` (Deep Galerkin Method / physics-informed
losses for ODEs, PDEs and integral equations; see that repo's README.md:4-14):

* ``models``     — MLP (+BatchNorm pre/post variants), DGM LSTM-like networks,
                   ResNet, Perceptron — pure-functional pytree modules.
* ``ops``        — forward-mode derivative taps (u_t, u_x, u_xx, Jacobians),
                   Monte-Carlo / Gauss-Legendre quadrature, collocation
                   samplers with explicit PRNG keys.
* ``equations``  — declarative problem definitions: residual loss + sampler +
                   analytic solution + evaluation grid for each equation.
* ``train``      — a single jitted Adam trainer (lax.scan over steps,
                   device-resident loss history), checkpointing, metrics.
* ``parallel``   — device-mesh utilities: data-parallel collocation sharding
                   and population (ensemble / hyperparameter) sharding.
* ``sweep``      — vmapped population hyperparameter search (replaces the
                   reference's Ray Tune driver) and ablation studies.
* ``kernels``    — Pallas TPU kernels for fused forward+derivative+residual
                   evaluation.

Everything on the compute path is functional: parameters are pytrees, RNG is
explicit, and the entire training loop compiles to one XLA program per chunk.
"""

__version__ = "0.1.0"

from differential_equations_dnn_tpu import core, models, ops, equations, train
from differential_equations_dnn_tpu import parallel, sweep, utils
from differential_equations_dnn_tpu.api import solve, SolveResult
from differential_equations_dnn_tpu.serving import export_solution, load_solution

__all__ = [
    "core",
    "models",
    "ops",
    "equations",
    "train",
    "parallel",
    "sweep",
    "utils",
    "solve",
    "SolveResult",
    "export_solution",
    "load_solution",
    "__version__",
]
