"""1-D linear advection (transport) equation — capability extension:

    u_t + c·u_x = 0   on x ∈ [0, 2π], t ∈ [0, 1]
    u(x, 0) = sin x,   inflow BC u(0, t) = sin(−c·t)
    exact: u = sin(x − c·t)

The missing PDE class in the collection: pure FIRST-ORDER hyperbolic
transport. It is also the canonical PINN stress test — at large transport
speed c the loss landscape develops the same "wrong branch" multi-stability
the FitzHugh–Nagumo system shows in time (Krishnapriyan et al. 2021,
"Characterizing possible failure modes in physics-informed neural
networks"), which makes it the natural PDE showcase for the framework's
causal residual weighting (``causal_eps > 0``: Wang et al. 2022, the same
comparison-mask cumsum machinery as equations.fitzhugh_nagumo — weights
ride the TIME coordinate of each collocation point, so training marches
the transported profile forward in time).

TPU design: the residual needs only two FIRST-order taps (u_x, u_t — one
jvp each; no Hessian), so the fused-engine spec (kernels.fused_engine
AdvectionSpec) is the leanest PDE spec in the registry: R = 5 stacked
streams (3 interior + IC + inflow) vs heat's 7. Everything rides the
standard Problem/trainer/solve/CLI path.
"""

import math
from dataclasses import dataclass, field

import numpy as np
import jax
import jax.numpy as jnp

from differential_equations_dnn_tpu.equations.base import Problem, TrainDefaults
from differential_equations_dnn_tpu.models import MLP
from differential_equations_dnn_tpu.ops import value_dt


@dataclass(frozen=True)
class Advection1D(Problem):
    name: str = "advection"
    c: float = 2.0 * math.pi        # one full transit over t_max
    x_max: float = 2.0 * math.pi
    t_max: float = 1.0
    # Causal residual weighting (0 = off). The default speed trains fine
    # without it; at c >~ 4π the plain loss settles on a damped wrong
    # branch and causal weighting recovers the transported profile.
    causal_eps: float = 0.0
    defaults: TrainDefaults = field(
        default_factory=lambda: TrainDefaults(iterations=15000,
                                              batch_size=128,
                                              lrate=1e-3, nodes=40,
                                              schedule="cosine")
    )

    def default_model(self):
        return MLP(input_dim=2, output_dim=1, hidden_size=128, num_layers=3,
                   activation="tanh")

    def sample(self, key, n):
        kx, kt, kp = jax.random.split(key, 3)
        x = self.x_max * jax.random.uniform(kx, (n, 1))
        if self.causal_eps > 0.0:
            # Stratified-uniform t in SHUFFLED row order (the causal loss
            # is permutation-invariant; population sweeps mask trials to a
            # row prefix — see equations.fitzhugh_nagumo.sample).
            u = jax.random.uniform(kt, (n, 1))
            t = (jnp.arange(n, dtype=u.dtype)[:, None] + u) * (self.t_max / n)
            t = jax.random.permutation(kp, t, axis=0)
        else:
            t = self.t_max * jax.random.uniform(kt, (n, 1))
        zeros = jnp.zeros((n, 1))
        return {
            "xt": jnp.concatenate([x, t], axis=1),      # interior
            "x0": jnp.concatenate([x, zeros], axis=1),   # t = 0 face
            "xb": jnp.concatenate([zeros, t], axis=1),   # inflow x = 0
        }

    def _residuals(self, apply_fn, params, batch):
        """Interior residual energy [B] and IC+BC energy [B]."""
        f = lambda z: apply_fn(params, z)
        # Two first-order forward taps — no second derivatives anywhere.
        u, u_t = value_dt(f, batch["xt"], t_axis=1)
        _, u_x = value_dt(f, batch["xt"], t_axis=0)
        r = u_t + self.c * u_x
        u0 = f(batch["x0"])
        r0 = u0 - jnp.sin(batch["x0"][:, :1])
        ub = f(batch["xb"])
        rb = ub - jnp.sin(-self.c * batch["xb"][:, 1:2])
        return jnp.square(r)[:, 0], (jnp.square(r0) + jnp.square(rb))[:, 0]

    def point_loss(self, apply_fn, params, batch):
        res, icbc = self._residuals(apply_fn, params, batch)
        return res + icbc

    def loss(self, apply_fn, params, batch, mask=None):
        """Causal-weighted loss when ``causal_eps > 0`` (single-run
        protocol; masked population calls keep the plain loss): interior
        residuals at time t are down-weighted by the accumulated residual
        at earlier times — one comparison-mask matmul, sort-free (see
        equations.fitzhugh_nagumo.loss for the derivation)."""
        if self.causal_eps <= 0.0 or mask is not None:
            return super().loss(apply_fn, params, batch, mask)
        res, icbc = self._residuals(apply_fn, params, batch)
        t = batch["xt"][:, 1]
        earlier = (t[None, :] < t[:, None]).astype(res.dtype)   # [B, B]
        dt = self.t_max / res.shape[0]
        cum = (earlier @ jax.lax.stop_gradient(res)) * dt
        wgt = jax.lax.stop_gradient(jnp.exp(-self.causal_eps * cum))
        return jnp.mean(wgt * res) + jnp.mean(icbc)

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
        return np.sin(x[None, :] - self.c * t[:, None])
