"""Tiny perceptron used by the universal-approximation-theorem demo.

Reference: demo_universal_approx_theorem.py:26-37 — Linear(1→n)·tanh·Linear(n→1)
with torch-default init, n=3 in the demo."""

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from differential_equations_dnn_tpu.core.init import torch_linear_default
from differential_equations_dnn_tpu.core.precision import dense


@dataclass(frozen=True)
class Perceptron:
    input_dim: int = 1
    output_dim: int = 1
    hidden_size: int = 3
    dtype: jnp.dtype = jnp.float32

    def init(self, key):
        k1, k2 = jax.random.split(key)
        w1, b1 = torch_linear_default(k1, (self.input_dim, self.hidden_size), dtype=self.dtype)
        w2, b2 = torch_linear_default(k2, (self.hidden_size, self.output_dim), dtype=self.dtype)
        return {"fc1": {"w": w1, "b": b1}, "fc2": {"w": w2, "b": b2}}

    def apply(self, params, x):
        h = jnp.tanh(dense(x, params["fc1"]["w"], params["fc1"]["b"]))
        return dense(h, params["fc2"]["w"], params["fc2"]["b"])

    __call__ = apply
