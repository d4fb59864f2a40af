"""Inverse problem: identify the heat equation's diffusivity κ from data.

Given noisy observations of u on a sparse space-time set, learn BOTH the
solution network AND the unknown coefficient κ by minimising

    L = mean (u_t − κ̂·u_xx)²  +  λ·mean (u_θ(x_i) − u_obs_i)²  +  BC/IC terms

with κ̂ = exp(log κ̂) a trainable scalar carried in the parameter pytree —
the standard PINN inverse formulation. Everything else (jitted trainer,
population sweeps, ensembles, checkpointing, serving) applies unchanged
because κ̂ is just one more leaf in params.

A capability extension with no reference counterpart (the reference solves
forward problems only). Ground truth for validation: synthetic data from the
analytic solution sin(x)e^{−κ*t} at the true κ*.
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
class _InverseModel:
    """Solution MLP + trainable log-diffusivity in one parameter pytree."""

    net: MLP
    kappa_init: float = 0.5  # deliberately wrong starting guess

    def init(self, key):
        return {
            "net": self.net.init(key),
            "log_kappa": jnp.asarray(math.log(self.kappa_init), jnp.float32),
        }

    def apply(self, params, x):
        return self.net.apply(params["net"], x)

    @property
    def input_dim(self):
        # Solution-export path reads model.input_dim (serving.export_solution
        # via cli --export); delegate to the wrapped net.
        return self.net.input_dim

    # Engine-view dims (kernels.fused_engine._engine_dims): the fused spec
    # trains the wrapped MLP's tensors plus log κ̂ as an extra state tensor.
    @property
    def hidden_size(self):
        return self.net.hidden_size

    @property
    def num_layers(self):
        return self.net.num_layers

    @property
    def output_dim(self):
        return self.net.output_dim

    def kappa(self, params):
        return jnp.exp(params["log_kappa"])

    __call__ = apply


@dataclass(frozen=True)
class InverseHeat1D(Problem):
    name: str = "inverse_heat"
    kappa_true: float = 1.0
    kappa_init: float = 0.5
    x_max: float = math.pi
    t_max: float = 3.0
    n_obs: int = 200          # observation points
    noise: float = 0.01       # observation noise std
    data_weight: float = 10.0
    obs_seed: int = 0         # observations are a fixed synthetic dataset
    defaults: TrainDefaults = field(
        default_factory=lambda: TrainDefaults(iterations=15000, batch_size=128,
                                              lrate=1e-3, nodes=40)
    )

    def default_model(self):
        return _InverseModel(
            MLP(input_dim=2, output_dim=1, hidden_size=128, num_layers=3,
                activation="tanh"),
            kappa_init=self.kappa_init,
        )

    # -- synthetic observations (fixed dataset, generated once per config) ---
    def observations(self):
        key = jax.random.key(self.obs_seed)
        kx, kt, kn = jax.random.split(key, 3)
        x = self.x_max * jax.random.uniform(kx, (self.n_obs, 1))
        t = self.t_max * jax.random.uniform(kt, (self.n_obs, 1))
        u = jnp.sin(x) * jnp.exp(-self.kappa_true * t)
        u = u + self.noise * jax.random.normal(kn, u.shape)
        return jnp.concatenate([x, t], axis=1), u

    def sample(self, key, n):
        kx, kt, ko = jax.random.split(key, 3)
        x = self.x_max * jax.random.uniform(kx, (n, 1))
        t = self.t_max * jax.random.uniform(kt, (n, 1))
        obs_x, obs_u = self.observations()
        idx = jax.random.randint(ko, (n,), 0, self.n_obs)
        return {
            "xt": jnp.concatenate([x, t], axis=1),
            "obs_x": obs_x[idx],
            "obs_u": obs_u[idx],
        }

    def loss(self, apply_fn, params, batch, mask=None):
        # κ̂ lives in params, so this must be the full-loss override (the
        # pointwise form would hide the coefficient from point_loss users).
        f = lambda z: apply_fn(params, z)
        _, _, u_xx = value_dx_dxx(f, batch["xt"], x_axis=0)
        _, u_t = value_dt(f, batch["xt"], t_axis=1)
        kappa_hat = jnp.exp(params["log_kappa"])
        r = jnp.square(u_t - kappa_hat * u_xx)[:, 0]
        d = jnp.square(f(batch["obs_x"]) - batch["obs_u"])[:, 0]
        pointwise = r + self.data_weight * d
        if mask is None:
            return jnp.mean(pointwise)
        mask = mask.astype(pointwise.dtype)
        return jnp.sum(pointwise * mask) / jnp.sum(mask)

    def point_loss(self, apply_fn, params, batch):
        raise NotImplementedError("inverse problems override loss() directly")

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
        return np.sin(x)[None, :] * np.exp(-self.kappa_true * t)[:, None]

    def kappa_error(self, params) -> float:
        """|κ̂ − κ*| — the inverse problem's acceptance metric."""
        return float(abs(np.exp(np.asarray(params["log_kappa"]))
                         - self.kappa_true))
