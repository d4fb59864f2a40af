"""Universal-approximation-theorem demo: fit f(x) = sin(3x) on [−1, 1].

Reference: demo_universal_approx_theorem.py — Perceptron 1→3→1 :26-37,
full-batch MSE on a fixed 50-point linspace :50-73, 100k iters, lr 1e-4
:46-47. Not a differential equation — a pure supervised fit — but part of the
reference's capability surface, so it rides the same Problem/trainer path.
"""

from dataclasses import dataclass, field

import numpy as np
import jax.numpy as jnp

from differential_equations_dnn_tpu.equations.base import Problem, TrainDefaults
from differential_equations_dnn_tpu.models import Perceptron


@dataclass(frozen=True)
class SineFit(Problem):
    name: str = "uat"
    freq: float = 3.0
    low: float = -1.0
    high: float = 1.0
    n_points: int = 50
    defaults: TrainDefaults = field(
        default_factory=lambda: TrainDefaults(iterations=100_000, batch_size=50,
                                              nodes=50)
    )

    def default_model(self):
        return Perceptron(input_dim=1, output_dim=1, hidden_size=3)

    @property
    def max_sample_size(self):
        return self.n_points

    def sample(self, key, n):
        # Full-batch training on the fixed grid (reference :50); n is ignored
        # by design — the batch IS the grid.
        x = jnp.linspace(self.low, self.high, self.n_points)[:, None]
        return {"x": x, "y": jnp.sin(self.freq * x)}

    def point_loss(self, apply_fn, params, batch):
        return jnp.square(apply_fn(params, batch["x"]) - batch["y"])[:, 0]

    def grid_inputs(self, nodes):
        return jnp.linspace(self.low, self.high, nodes)[:, None]

    def exact(self, nodes):
        x = np.linspace(self.low, self.high, nodes)
        return np.sin(self.freq * x)
