"""Viscous Burgers equation (capability extension beyond the reference):

    u_t + u·u_x = ν·u_xx    on x ∈ [0, 1], t ∈ [0, 1]

with the exact traveling-wave solution

    u*(x, t) = c − a·tanh( a·(x − c·t − x₀) / (2ν) ),

whose initial and Dirichlet boundary conditions are taken from u* itself.
A canonical NONLINEAR PDE benchmark: the advection term u·u_x couples the
value and first-derivative streams, which the same forward-mode taps handle
without any new machinery (value_dx_dxx yields u, u_x, u_xx in one nest).
No counterpart exists in the reference repository.
"""

from dataclasses import dataclass, field

import numpy as np
import jax
import jax.numpy as jnp

from differential_equations_dnn_tpu.equations.base import Problem, TrainDefaults
from differential_equations_dnn_tpu.models import MLP
from differential_equations_dnn_tpu.ops import value_dt, value_dx_dxx


@dataclass(frozen=True)
class Burgers(Problem):
    name: str = "burgers"
    nu: float = 0.05      # viscosity
    wave_amp: float = 0.4  # a
    wave_speed: float = 0.6  # c
    x0: float = 0.3       # initial front position
    x_max: float = 1.0
    t_max: float = 1.0
    defaults: TrainDefaults = field(
        default_factory=lambda: TrainDefaults(iterations=15000, batch_size=128,
                                              lrate=1e-3, nodes=40)
    )

    def default_model(self):
        return MLP(input_dim=2, output_dim=1, hidden_size=128, num_layers=3,
                   activation="tanh")

    # -- exact solution ------------------------------------------------------
    def _exact_fn(self, x, t):
        a, c, nu = self.wave_amp, self.wave_speed, self.nu
        return c - a * jnp.tanh(a * (x - c * t - self.x0) / (2.0 * nu))

    def sample(self, key, n):
        kx, kt = jax.random.split(key)
        x = self.x_max * jax.random.uniform(kx, (n, 1))
        t = self.t_max * jax.random.uniform(kt, (n, 1))
        zeros = jnp.zeros((n, 1))
        return {
            "xt": jnp.concatenate([x, t], axis=1),
            "x0t": jnp.concatenate([x, zeros], axis=1),        # IC points
            "b0": jnp.concatenate([zeros, t], axis=1),          # x = 0
            "b1": jnp.concatenate([jnp.full((n, 1), self.x_max), t], axis=1),
        }

    def point_loss(self, apply_fn, params, batch):
        f = lambda z: apply_fn(params, z)
        u, u_x, u_xx = value_dx_dxx(f, batch["xt"], x_axis=0)
        _, u_t = value_dt(f, batch["xt"], t_axis=1)
        # Nonlinear advection: u·u_x enters the residual directly.
        r_domain = u_t + u * u_x - self.nu * u_xx
        # IC and both Dirichlet boundaries from the exact traveling wave.
        r_init = f(batch["x0t"]) - self._exact_fn(batch["x0t"][:, :1],
                                                  batch["x0t"][:, 1:])
        r_b0 = f(batch["b0"]) - self._exact_fn(batch["b0"][:, :1],
                                               batch["b0"][:, 1:])
        r_b1 = f(batch["b1"]) - self._exact_fn(batch["b1"][:, :1],
                                               batch["b1"][:, 1:])
        return (jnp.square(r_domain) + jnp.square(r_init)
                + jnp.square(r_b0) + jnp.square(r_b1))[:, 0]

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
        xx, tt = np.meshgrid(x, t)  # rows = time (matches grid_inputs)
        a, c, nu = self.wave_amp, self.wave_speed, self.nu
        return c - a * np.tanh(a * (xx - c * tt - self.x0) / (2.0 * nu))
