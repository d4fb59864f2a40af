"""First-order linear ODE:  dy/dt = −y,  y(0) = 2,  t ∈ [0, 1].

Reference: simple_ode.py — loss :41-63 (mean((dy/dt + y)² + (y0 − y_ic)²)),
sampling t ~ 1.01·U[0,1) :92, exact solution 2e^{−t} :35-38, defaults 5000
iters / batch 64 / lr 1e-4 / 25-node grid :136-138, MLP 1→32→1 :167.
"""

from dataclasses import dataclass, field

import numpy as np
import jax.numpy as jnp

from differential_equations_dnn_tpu.equations.base import Problem, TrainDefaults
from differential_equations_dnn_tpu.models import MLP
from differential_equations_dnn_tpu.ops import UniformBox, value_dt


@dataclass(frozen=True)
class SimpleODE(Problem):
    name: str = "simple_ode"
    y_ic: float = 2.0
    t_max: float = 1.0
    sample_scale: float = 1.01  # reference samples t ~ 1.01·U[0,1)
    defaults: TrainDefaults = field(
        default_factory=lambda: TrainDefaults(iterations=5000, batch_size=64, nodes=25)
    )
    # "soft" = reference-style weighted loss terms; "hard" = Lagaris
    # trial function (models/hard.py) satisfying IC/BC exactly.
    constraint: str = "soft"

    def default_model(self):
        net = MLP(input_dim=1, output_dim=1, hidden_size=32, num_layers=1,
                  activation="tanh")
        if self.constraint == "hard":
            from differential_equations_dnn_tpu.models.hard import (
                HardConstraint,
                time_ic_ansatz,
            )

            return HardConstraint(net, time_ic_ansatz(self.y_ic, self.t_max))
        return net

    def sample(self, key, n):
        sampler = UniformBox((0.0,), (self.sample_scale * self.t_max,))
        t = sampler.sample(key, n)
        return {"t": t, "t0": jnp.zeros((n, 1))}

    def point_loss(self, apply_fn, params, batch):
        t, t0 = batch["t"], batch["t0"]
        y, dydt = value_dt(lambda z: apply_fn(params, z), t, t_axis=0)
        y0 = apply_fn(params, t0)
        return (jnp.square(dydt + y) + jnp.square(y0 - self.y_ic))[:, 0]

    def grid_inputs(self, nodes):
        return jnp.linspace(0.0, self.t_max, nodes)[:, None]

    def exact(self, nodes):
        t = np.linspace(0.0, self.t_max, nodes)
        return self.y_ic * np.exp(-t)
