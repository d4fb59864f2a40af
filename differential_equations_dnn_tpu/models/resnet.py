"""Linear ResNet (fully-connected residual network).

Capability parity with the reference's dead-code residual stack
(neural_networks.py:273-364: ``ResidualBlock`` → ``ResNetLayer`` → ``ResNet``,
2 layers × 3 blocks, BN after each bias-free Linear, relu) — here promoted to
a tested first-class model. The reference sizes every ``BatchNorm1d`` by a
constant ``running_elems=100`` instead of the feature dimension
(neural_networks.py:287-289) — a latent shape bug; this implementation sizes
BN by the feature dimension, which is the only semantics that type-checks for
arbitrary batch sizes.

Running-statistic tracking follows the same ``(params, state)`` stateful
convention as ``MLP`` (``init_state()`` + ``apply(params, x, state=...,
train=...)``), so ResNet trains on the standard trainer path and evaluates
with eval-mode statistics. Calling ``apply(params, x)`` without state keeps
the plain train-mode (batch statistics) forward.
"""

from dataclasses import dataclass

import jax
import jax.numpy as jnp
from jax import lax

from differential_equations_dnn_tpu.core.init import torch_linear_default
from differential_equations_dnn_tpu.core.precision import dense

_BN_EPS = 1e-5
_BN_MOMENTUM = 0.1


def _bn(x, gamma, beta):
    mean = jnp.mean(x, axis=0)
    var = jnp.var(x, axis=0)
    return ((x - mean) * lax.rsqrt(var + _BN_EPS)) * gamma + beta


def _bn_stateful(x, gamma, beta, stats, train):
    """BatchNorm with running-stat tracking (torch semantics: biased batch
    var normalises, unbiased updates the running var)."""
    if not train:
        xhat = (x - stats["mean"]) * lax.rsqrt(stats["var"] + _BN_EPS)
        return xhat * gamma + beta, stats
    mean = jnp.mean(x, axis=0)
    var = jnp.var(x, axis=0)
    n = x.shape[0]
    unbiased = var * n / max(n - 1, 1)
    new = {
        "mean": (1 - _BN_MOMENTUM) * stats["mean"] + _BN_MOMENTUM * mean,
        "var": (1 - _BN_MOMENTUM) * stats["var"] + _BN_MOMENTUM * unbiased,
    }
    return ((x - mean) * lax.rsqrt(var + _BN_EPS)) * gamma + beta, new


@dataclass(frozen=True)
class ResidualBlock:
    input_dim: int
    output_dim: int
    downsample: bool = False
    dtype: jnp.dtype = jnp.float32

    def init(self, key):
        k1, k2, k3 = jax.random.split(key, 3)
        p = {
            "fc1": {
                "w": torch_linear_default(k1, (self.input_dim, self.output_dim),
                                          with_bias=False, dtype=self.dtype)[0],
                "gamma": jnp.ones((self.output_dim,), self.dtype),
                "beta": jnp.zeros((self.output_dim,), self.dtype),
            },
            "fc2": {
                "w": torch_linear_default(k2, (self.output_dim, self.output_dim),
                                          with_bias=False, dtype=self.dtype)[0],
                "gamma": jnp.ones((self.output_dim,), self.dtype),
                "beta": jnp.zeros((self.output_dim,), self.dtype),
            },
        }
        if self.downsample:
            p["down"] = {
                "w": torch_linear_default(k3, (self.input_dim, self.output_dim),
                                          with_bias=False, dtype=self.dtype)[0]
            }
        return p

    def init_state(self):
        z = jnp.zeros((self.output_dim,), self.dtype)
        o = jnp.ones((self.output_dim,), self.dtype)
        return {"fc1": {"mean": z, "var": o}, "fc2": {"mean": z, "var": o}}

    def apply(self, params, x, state=None, train=True):
        if state is None:
            out = jax.nn.relu(_bn(dense(x, params["fc1"]["w"]),
                                  params["fc1"]["gamma"], params["fc1"]["beta"]))
            out = jax.nn.relu(_bn(dense(out, params["fc2"]["w"]),
                                  params["fc2"]["gamma"], params["fc2"]["beta"]))
            residual = dense(x, params["down"]["w"]) if self.downsample else x
            return jax.nn.relu(out + residual)
        h1, s1 = _bn_stateful(dense(x, params["fc1"]["w"]),
                              params["fc1"]["gamma"], params["fc1"]["beta"],
                              state["fc1"], train)
        out = jax.nn.relu(h1)
        h2, s2 = _bn_stateful(dense(out, params["fc2"]["w"]),
                              params["fc2"]["gamma"], params["fc2"]["beta"],
                              state["fc2"], train)
        out = jax.nn.relu(h2)
        residual = dense(x, params["down"]["w"]) if self.downsample else x
        return jax.nn.relu(out + residual), {"fc1": s1, "fc2": s2}

    __call__ = apply


@dataclass(frozen=True)
class ResNet:
    """Two stages of ``n_blocks`` residual blocks plus a final Linear head
    (reference defaults: hidden 32, 3 blocks per stage, neural_networks.py:340-357)."""

    input_dim: int = 2
    output_dim: int = 1
    hidden_size: int = 32
    n_blocks: int = 3
    dtype: jnp.dtype = jnp.float32

    def _stage_blocks(self, in_dim):
        blocks = [ResidualBlock(in_dim, self.hidden_size,
                                downsample=in_dim != self.hidden_size, dtype=self.dtype)]
        blocks += [
            ResidualBlock(self.hidden_size, self.hidden_size, dtype=self.dtype)
            for _ in range(self.n_blocks - 1)
        ]
        return blocks

    def init(self, key):
        k1, k2, k3 = jax.random.split(key, 3)
        stage1 = self._stage_blocks(self.input_dim)
        stage2 = self._stage_blocks(self.hidden_size)
        wout, bout = torch_linear_default(
            k3, (self.hidden_size, self.output_dim), dtype=self.dtype
        )
        return {
            "stage1": [b.init(k) for b, k in zip(stage1, jax.random.split(k1, len(stage1)))],
            "stage2": [b.init(k) for b, k in zip(stage2, jax.random.split(k2, len(stage2)))],
            "fc_out": {"w": wout, "b": bout},
        }

    def init_state(self):
        stage1 = self._stage_blocks(self.input_dim)
        stage2 = self._stage_blocks(self.hidden_size)
        return {"stage1": [b.init_state() for b in stage1],
                "stage2": [b.init_state() for b in stage2]}

    def apply(self, params, x, state=None, train=True):
        out = x
        if state is None:
            for block, p in zip(self._stage_blocks(self.input_dim), params["stage1"]):
                out = block.apply(p, out)
            for block, p in zip(self._stage_blocks(self.hidden_size), params["stage2"]):
                out = block.apply(p, out)
            return dense(out, params["fc_out"]["w"], params["fc_out"]["b"])
        new_state = {"stage1": [], "stage2": []}
        for name, in_dim in (("stage1", self.input_dim),
                             ("stage2", self.hidden_size)):
            for block, p, s in zip(self._stage_blocks(in_dim), params[name],
                                   state[name]):
                out, ns = block.apply(p, out, state=s, train=train)
                new_state[name].append(ns)
        y = dense(out, params["fc_out"]["w"], params["fc_out"]["b"])
        return y, new_state

    __call__ = apply
