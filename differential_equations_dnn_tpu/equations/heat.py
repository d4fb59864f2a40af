"""1-D heat equation:  u_t = κ·u_xx  on (x, t) ∈ [0, π] × [0, 3],
u(x, 0) = sin x,  u(0, t) = u(π, t) = 0.

Reference: heat.py — loss :50-95 (domain residual via two nested reverse-mode
taps + IC + two Dirichlet BC terms, mean of the SUM of all four terms),
sampling x~π·U, t~3·U :125-126, exact sin(x)·e^{−κt} :36-47, defaults 15000
iters / batch 64 / lr 1e-4 / 40×40 grid :176-178, MLP 2→128×3→1 :181-184.

TPU design: u, u_x, u_xx come from ONE jvp-over-jvp along e_x and u_t from one
jvp along e_t — four batched forward-equivalents total, all fused by XLA into
a single program with the Adam update (no per-step host sync). Input layout is
[x, t] (axis 0 = space, axis 1 = time), matching heat.py:128.
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
class Heat1D(Problem):
    name: str = "heat"
    kappa: float = 1.0
    x_max: float = math.pi
    t_max: float = 3.0
    # Derivative-tap implementation:
    #   "jvp"    — generic jvp-over-jvp taps; works with ANY model (incl. BN).
    #   "taylor" — stacked Taylor streams, one matmul per layer for all 7
    #              logical evaluations (ops.taylor); plain MLPs only.
    #   "pallas" — Pallas TPU kernel of the same fused computation
    #              (kernels.taylor_mlp); plain MLPs only.
    # The fused paths need the MLP *structure*, not just apply_fn: they read
    # ``taps_model`` (defaults to default_model()). If you train a custom
    # plain MLP with fused taps, pass the SAME config here — a mismatch
    # raises at trace time via pytree-structure disagreement.
    taps: str = "jvp"
    taps_model: object = None
    defaults: TrainDefaults = field(
        default_factory=lambda: TrainDefaults(iterations=15000, batch_size=64, nodes=40)
    )
    # "soft" = reference-style weighted loss terms; "hard" = Lagaris
    # trial function (models/hard.py) satisfying IC/BC exactly (jvp taps).
    constraint: str = "soft"

    def default_model(self):
        net = MLP(input_dim=2, output_dim=1, hidden_size=128, num_layers=3,
                  activation="tanh")
        if self.constraint == "hard":
            if self.taps != "jvp":
                raise ValueError("constraint='hard' wraps the model, so the "
                                 "fused Taylor-stream taps cannot read its "
                                 "MLP structure — use Heat1D(taps='jvp')")
            from differential_equations_dnn_tpu.models.hard import (
                HardConstraint,
                heat1d_ansatz,
            )

            return HardConstraint(net, heat1d_ansatz(self.x_max, self.t_max))
        return net

    def sample(self, key, n):
        kx, kt = jax.random.split(key)
        x = self.x_max * jax.random.uniform(kx, (n, 1))
        t = self.t_max * jax.random.uniform(kt, (n, 1))
        zeros = jnp.zeros((n, 1))
        return {
            "xt": jnp.concatenate([x, t], axis=1),       # interior
            "x0": jnp.concatenate([x, zeros], axis=1),    # t = 0 (IC)
            "xb1": jnp.concatenate([zeros, t], axis=1),   # x = 0 boundary
            "xb2": jnp.concatenate([jnp.full((n, 1), self.x_max), t], axis=1),
        }

    def point_loss(self, apply_fn, params, batch):
        if self.taps == "jvp":
            f = lambda z: apply_fn(params, z)
            # Domain residual: u_t − κ·u_xx.
            _, _, u_xx = value_dx_dxx(f, batch["xt"], x_axis=0)
            _, u_t = value_dt(f, batch["xt"], t_axis=1)
            r_init = f(batch["x0"]) - jnp.sin(batch["x0"][:, :1])
            r_b1 = f(batch["xb1"])
            r_b2 = f(batch["xb2"])
        else:
            # Fused stacked-stream paths (plain MLPs only): all 7 network
            # evaluations in one matmul chain per layer.
            model = self.taps_model or self.default_model()
            if self.taps == "taylor":
                from differential_equations_dnn_tpu.ops.taylor import heat_fused_streams

                _, _, u_xx, u_t, u0, ub1, ub2 = heat_fused_streams(
                    model, params, batch["xt"], batch["x0"], batch["xb1"],
                    batch["xb2"])
            elif self.taps == "pallas":
                from differential_equations_dnn_tpu.kernels.taylor_mlp import (
                    heat_fused_streams_pallas,
                )

                _, _, u_xx, u_t, u0, ub1, ub2 = heat_fused_streams_pallas(
                    model, params, batch["xt"], batch["x0"], batch["xb1"],
                    batch["xb2"])
            else:
                raise ValueError(f"unknown taps mode {self.taps!r}")
            r_init = u0 - jnp.sin(batch["x0"][:, :1])
            r_b1, r_b2 = ub1, ub2
        r_domain = u_t - self.kappa * u_xx
        # Reference takes the mean of the summed squares (heat.py:95).
        return (jnp.square(r_domain) + jnp.square(r_init)
                + jnp.square(r_b1) + jnp.square(r_b2))[:, 0]

    def grid_inputs(self, nodes):
        # Grid rows = time, cols = space (heat.py:152-166: sol[i_t, j_x]).
        t = jnp.linspace(0.0, self.t_max, nodes)
        x = jnp.linspace(0.0, self.x_max, nodes)
        tt, xx = jnp.meshgrid(t, x, indexing="ij")
        return jnp.stack([xx.ravel(), tt.ravel()], axis=1)

    def solution_shape(self, nodes):
        return (nodes, nodes)

    def exact(self, nodes):
        t = np.linspace(0.0, self.t_max, nodes)
        x = np.linspace(0.0, self.x_max, nodes)
        return np.sin(x)[None, :] * np.exp(-self.kappa * t)[:, None]
