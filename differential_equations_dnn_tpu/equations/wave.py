"""1-D wave equation (capability extension beyond the reference):

    u_tt = c²·u_xx   on x ∈ [0, π], t ∈ [0, 2]
    u(x, 0) = sin x,  u_t(x, 0) = 0,  u(0, t) = u(π, t) = 0
    exact: u = sin x · cos(c t)

Completes the PDE-class coverage: the reference solves one parabolic PDE
(heat.py); this framework adds elliptic-like steady behaviour via the same
machinery, a nonlinear conservation law (burgers), and — here — a HYPERBOLIC
equation, whose second-order time derivative and velocity initial condition
exercise two tap patterns no other equation uses: a second-order tap along
the time axis and a first-order time tap on the t=0 face.

TPU design: u_xx and u_tt are two jvp-over-jvp taps on the interior batch;
the velocity IC is one forward-mode tap on the t=0 points. Everything rides
the standard Problem/trainer/solve/CLI path unchanged.
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
class Wave1D(Problem):
    name: str = "wave"
    c: float = 1.0
    x_max: float = math.pi
    t_max: float = 2.0
    # Velocity-IC weight: the u_t(x,0)=0 constraint is the hardest term for
    # a hyperbolic PINN (it fixes the standing- vs travelling-wave split).
    velocity_weight: float = 1.0
    # Cosine decay: like heat2d, a constant lr lets late large steps undo
    # the converged standing wave.
    defaults: TrainDefaults = field(
        default_factory=lambda: TrainDefaults(iterations=15000, batch_size=128,
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
                wave1d_ansatz,
            )

            return HardConstraint(net, wave1d_ansatz(self.x_max, self.t_max))
        return net

    def sample(self, key, n):
        kx, kt = jax.random.split(key)
        x = self.x_max * jax.random.uniform(kx, (n, 1))
        t = self.t_max * jax.random.uniform(kt, (n, 1))
        zeros = jnp.zeros((n, 1))
        return {
            "xt": jnp.concatenate([x, t], axis=1),       # interior
            "x0": jnp.concatenate([x, zeros], axis=1),    # t = 0 face
            "xb1": jnp.concatenate([zeros, t], axis=1),   # x = 0 boundary
            "xb2": jnp.concatenate([jnp.full((n, 1), self.x_max), t], axis=1),
        }

    def point_loss(self, apply_fn, params, batch):
        f = lambda z: apply_fn(params, z)
        # Domain residual: u_tt − c²·u_xx (two second-order taps).
        _, _, u_xx = value_dx_dxx(f, batch["xt"], x_axis=0)
        _, _, u_tt = value_dx_dxx(f, batch["xt"], x_axis=1)
        r_domain = u_tt - (self.c ** 2) * u_xx
        # Position IC u(x,0)=sin x AND velocity IC u_t(x,0)=0 — the latter is
        # a first-order time tap on the initial face.
        u0, u0_t = value_dt(f, batch["x0"], t_axis=1)
        r_pos = u0 - jnp.sin(batch["x0"][:, :1])
        r_vel = u0_t
        r_b1 = f(batch["xb1"])
        r_b2 = f(batch["xb2"])
        return (jnp.square(r_domain) + jnp.square(r_pos)
                + self.velocity_weight * jnp.square(r_vel)
                + jnp.square(r_b1) + jnp.square(r_b2))[:, 0]

    def grid_inputs(self, nodes):
        t = jnp.linspace(0.0, self.t_max, nodes)
        x = jnp.linspace(0.0, self.x_max, nodes)
        tt, xx = jnp.meshgrid(t, x, indexing="ij")
        return jnp.stack([xx.ravel(), tt.ravel()], axis=1)

    def solution_shape(self, nodes):
        return (nodes, nodes)

    def exact(self, nodes):
        t = np.linspace(0.0, self.t_max, nodes)
        x = np.linspace(0.0, self.x_max, nodes)
        return np.sin(x)[None, :] * np.cos(self.c * t)[:, None]
