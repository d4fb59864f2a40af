"""2-D heat equation (capability extension beyond the reference):

    u_t = κ·(u_xx + u_yy)   on (x, y) ∈ [0, π]², t ∈ [0, T]
    u(x, y, 0) = sin x · sin y,   u = 0 on the boundary
    exact: u = sin x · sin y · e^{−2κt}

Demonstrates that the declarative Problem interface and the forward-mode tap
library scale to higher-dimensional PDEs: the Laplacian is two jvp-over-jvp
taps (one per spatial axis), the boundary contributes four edge terms, and
the same jitted trainer/serving/sweep machinery applies unchanged. No
counterpart exists in the reference repository (its only PDE is 1-D,
heat.py); included for parity-plus.
"""

import math
from dataclasses import dataclass, field

import numpy as np
import jax
import jax.numpy as jnp

from differential_equations_dnn_tpu.equations.base import Problem, TrainDefaults
from differential_equations_dnn_tpu.models import MLP
from differential_equations_dnn_tpu.ops import value_dt, value_dx_dxx


@dataclass(frozen=True)
class Heat2D(Problem):
    name: str = "heat2d"
    kappa: float = 1.0
    x_max: float = math.pi
    t_max: float = 1.0
    # "jvp" = generic taps (any model); "taylor" = generalized stacked
    # streams (ops.taylor.mlp_streams): value + (x, xx) + (y, yy) + t
    # + 5 constraint forwards = 11 logical streams, ONE matmul per layer.
    taps: str = "jvp"
    taps_model: object = None
    # Cosine lr decay: at a CONSTANT 1e-3 the full 20k-iteration budget ends
    # WORSE than a reduced one (MAE 0.014 @ 20k vs 0.002 @ short — late
    # large-lr steps bounce the iterate around the minimum); decaying to
    # lrate/10 makes the long budget strictly better (round-2 fix).
    defaults: TrainDefaults = field(
        default_factory=lambda: TrainDefaults(iterations=20000, batch_size=256,
                                              lrate=1e-3, nodes=24,
                                              schedule="cosine")
    )
    constraint: str = "soft"  # "hard" = Lagaris trial function (jvp taps)

    def default_model(self):
        net = MLP(input_dim=3, output_dim=1, hidden_size=128, num_layers=3,
                  activation="tanh")
        if self.constraint == "hard":
            if self.taps != "jvp":
                raise ValueError("constraint='hard' wraps the model — use "
                                 "Heat2D(taps='jvp')")
            from differential_equations_dnn_tpu.models.hard import (
                HardConstraint,
                heat2d_ansatz,
            )

            return HardConstraint(net, heat2d_ansatz(self.x_max, self.t_max))
        return net

    def sample(self, key, n):
        kxy, kt, kb = jax.random.split(key, 3)
        xy = self.x_max * jax.random.uniform(kxy, (n, 2))
        t = self.t_max * jax.random.uniform(kt, (n, 1))
        zeros = jnp.zeros((n, 1))
        x, y = xy[:, :1], xy[:, 1:]
        pi = jnp.full((n, 1), self.x_max)
        # One representative point per boundary face per sample (4 faces).
        edge = self.x_max * jax.random.uniform(kb, (n, 1))
        return {
            "xt": jnp.concatenate([xy, t], axis=1),
            "x0": jnp.concatenate([xy, zeros], axis=1),
            "b_x0": jnp.concatenate([zeros, edge, t], axis=1),
            "b_x1": jnp.concatenate([pi, edge, t], axis=1),
            "b_y0": jnp.concatenate([edge, zeros, t], axis=1),
            "b_y1": jnp.concatenate([edge, pi, t], axis=1),
        }

    def point_loss(self, apply_fn, params, batch):
        if self.taps == "taylor":
            from differential_equations_dnn_tpu.ops.taylor import mlp_streams

            model = self.taps_model or self.default_model()
            _, (u_xx, u_yy), _, (u_t,), cons = mlp_streams(
                model, params, batch["xt"],
                second_dirs=([1.0, 0.0, 0.0], [0.0, 1.0, 0.0]),
                first_dirs=([0.0, 0.0, 1.0],),
                constraints=(batch["x0"], batch["b_x0"], batch["b_x1"],
                             batch["b_y0"], batch["b_y1"]),
            )
            u0, b1, b2, b3, b4 = cons
            r_init = u0 - (jnp.sin(batch["x0"][:, :1])
                           * jnp.sin(batch["x0"][:, 1:2]))
            r_b = sum(jnp.square(b) for b in (b1, b2, b3, b4))
        elif self.taps == "jvp":
            f = lambda z: apply_fn(params, z)
            _, _, u_xx = value_dx_dxx(f, batch["xt"], x_axis=0)
            _, _, u_yy = value_dx_dxx(f, batch["xt"], x_axis=1)
            _, u_t = value_dt(f, batch["xt"], t_axis=2)
            r_init = f(batch["x0"]) - (jnp.sin(batch["x0"][:, :1])
                                       * jnp.sin(batch["x0"][:, 1:2]))
            r_b = sum(jnp.square(f(batch[k]))
                      for k in ("b_x0", "b_x1", "b_y0", "b_y1"))
        else:
            raise ValueError(f"unknown taps mode {self.taps!r}")
        r_domain = u_t - self.kappa * (u_xx + u_yy)
        return (jnp.square(r_domain) + jnp.square(r_init) + r_b)[:, 0]

    def grid_inputs(self, nodes):
        t = jnp.linspace(0.0, self.t_max, nodes)
        x = jnp.linspace(0.0, self.x_max, nodes)
        tt, xx, yy = jnp.meshgrid(t, x, x, indexing="ij")
        return jnp.stack([xx.ravel(), yy.ravel(), tt.ravel()], axis=1)

    def solution_shape(self, nodes):
        return (nodes, nodes, nodes)

    def exact(self, nodes):
        t = np.linspace(0.0, self.t_max, nodes)
        x = np.linspace(0.0, self.x_max, nodes)
        field_xy = np.sin(x)[:, None] * np.sin(x)[None, :]
        return field_xy[None] * np.exp(-2.0 * self.kappa * t)[:, None, None]
