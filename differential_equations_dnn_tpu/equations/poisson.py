"""2-D Poisson equation (capability extension beyond the reference):

    −Δu = f   on (x, y) ∈ [0, π]²,   u = 0 on the boundary
    f = 2·sin x · sin y,   exact: u = sin x · sin y

Completes the PDE-class coverage with an ELLIPTIC boundary-value problem —
the reference's only PDE is parabolic (heat.py); this framework adds
hyperbolic (wave), nonlinear conservation (burgers), and here a steady-state
equation with no time axis at all, which exercises the Problem protocol's
pure-boundary-value shape (no initial-condition term, 2-D solution grid).

TPU design: the Laplacian is two jvp-over-jvp second-order taps (one per
spatial axis) on the interior batch, four boundary faces contribute one
forward each, and all of it rides the standard jitted trainer unchanged.
"""

import math
from dataclasses import dataclass, field

import numpy as np
import jax
import jax.numpy as jnp

from differential_equations_dnn_tpu.equations.base import Problem, TrainDefaults
from differential_equations_dnn_tpu.models import MLP
from differential_equations_dnn_tpu.ops import value_dx_dxx


@dataclass(frozen=True)
class Poisson2D(Problem):
    name: str = "poisson"
    x_max: float = math.pi
    defaults: TrainDefaults = field(
        default_factory=lambda: TrainDefaults(iterations=10000, batch_size=256,
                                              lrate=1e-3, nodes=40,
                                              schedule="cosine")
    )
    # "soft" = reference-style weighted loss terms; "hard" = Lagaris
    # trial function (models/hard.py) satisfying IC/BC exactly.
    constraint: str = "soft"

    def default_model(self):
        net = MLP(input_dim=2, output_dim=1, hidden_size=128, num_layers=3,
                  activation="tanh")
        if self.constraint == "hard":
            from differential_equations_dnn_tpu.models.hard import (
                HardConstraint,
                poisson_ansatz,
            )

            return HardConstraint(net, poisson_ansatz(self.x_max))
        return net

    def source(self, xy):
        return 2.0 * jnp.sin(xy[:, :1]) * jnp.sin(xy[:, 1:2])

    def sample(self, key, n):
        kxy, kb = jax.random.split(key)
        xy = self.x_max * jax.random.uniform(kxy, (n, 2))
        edge = self.x_max * jax.random.uniform(kb, (n, 1))
        zeros = jnp.zeros((n, 1))
        pi = jnp.full((n, 1), self.x_max)
        return {
            "xy": xy,                                      # interior
            "b_x0": jnp.concatenate([zeros, edge], axis=1),
            "b_x1": jnp.concatenate([pi, edge], axis=1),
            "b_y0": jnp.concatenate([edge, zeros], axis=1),
            "b_y1": jnp.concatenate([edge, pi], axis=1),
        }

    def domain_inputs(self, batch):
        return batch["xy"]

    def point_loss(self, apply_fn, params, batch):
        f = lambda z: apply_fn(params, z)
        _, _, u_xx = value_dx_dxx(f, batch["xy"], x_axis=0)
        _, _, u_yy = value_dx_dxx(f, batch["xy"], x_axis=1)
        r_domain = -(u_xx + u_yy) - self.source(batch["xy"])
        r_b = sum(jnp.square(f(batch[k]))
                  for k in ("b_x0", "b_x1", "b_y0", "b_y1"))
        return (jnp.square(r_domain) + r_b)[:, 0]

    def grid_inputs(self, nodes):
        x = jnp.linspace(0.0, self.x_max, nodes)
        xx, yy = jnp.meshgrid(x, x, indexing="ij")
        return jnp.stack([xx.ravel(), yy.ravel()], axis=1)

    def solution_shape(self, nodes):
        return (nodes, nodes)

    def exact(self, nodes):
        x = np.linspace(0.0, self.x_max, nodes)
        return np.sin(x)[:, None] * np.sin(x)[None, :]
