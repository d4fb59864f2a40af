"""Volterra integral equation of the second kind (capability extension):

    y(x) = x + ∫₀ˣ (t − x)·y(t) dt   on x ∈ [0, π],   exact y = sin(x)

(the integral form of y'' + y = 0, y(0)=0, y'(0)=1). Completes the
integral-equation family: the reference solves one FREDHOLM equation with a
fixed integration interval (fredholm.py:47-74); a Volterra kernel's upper
limit is the collocation point itself, so the quadrature nodes move with x.

TPU design: the variable-limit integral is rescaled Gauss–Legendre — nodes
u ∈ (−1, 1) map to t = x·(u+1)/2 with weights w·x/2, giving a per-collocation
[n, k] node tensor evaluated in ONE fused forward of shape [n·k, 1] (the same
single-matmul-chain pattern as Fredholm, vs the reference's 50 sequential
forwards per step). ``quadrature="montecarlo"`` draws fresh t ~ x·U per step
for a stochastic-quadrature mode symmetric with Fredholm's parity mode.
"""

import math
from dataclasses import dataclass, field

import numpy as np
import jax
import jax.numpy as jnp

from differential_equations_dnn_tpu.equations.base import Problem, TrainDefaults
from differential_equations_dnn_tpu.models import MLP
from differential_equations_dnn_tpu.ops import gauss_legendre_nodes


@dataclass(frozen=True)
class Volterra2(Problem):
    name: str = "volterra"
    upper: float = math.pi
    k: int = 50                      # quadrature nodes per collocation point
    quadrature: str = "gauss"        # "gauss" | "montecarlo"
    defaults: TrainDefaults = field(
        default_factory=lambda: TrainDefaults(iterations=3000, batch_size=64,
                                              lrate=1e-3, nodes=50,
                                              schedule="cosine")
    )

    def default_model(self):
        return MLP(input_dim=1, output_dim=1, hidden_size=64, num_layers=2,
                   activation="tanh")

    def sample(self, key, n):
        kx, kq = jax.random.split(key)
        x = self.upper * jax.random.uniform(kx, (n, 1))
        if self.quadrature == "gauss":
            # Reference nodes on (-1, 1); rescaled to (0, x) per point below.
            u, w = gauss_legendre_nodes(self.k, -1.0, 1.0)
            tq = x * (u[None, :] + 1.0) * 0.5        # [n, k], t ∈ (0, x)
            wq = x * w[None, :] * 0.5                # Jacobian dt = (x/2)·du
        else:
            tq = x * jax.random.uniform(kq, (n, self.k))
            wq = jnp.broadcast_to(x / self.k, (n, self.k))
        return {"x": x, "tq": tq, "wq": wq}

    def point_loss(self, apply_fn, params, batch):
        x, tq, wq = batch["x"], batch["tq"], batch["wq"]
        n, k = tq.shape
        # One fused forward over all n·k quadrature points.
        y_nodes = apply_fn(params, tq.reshape(n * k, 1)).reshape(n, k)
        integral = jnp.sum((tq - x) * y_nodes * wq, axis=1, keepdims=True)
        yhat = apply_fn(params, x)
        return jnp.square(yhat - x - integral)[:, 0]

    def grid_inputs(self, nodes):
        return jnp.linspace(0.0, self.upper, nodes)[:, None]

    def exact(self, nodes):
        return np.sin(np.linspace(0.0, self.upper, nodes))
