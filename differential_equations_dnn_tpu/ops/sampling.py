"""Collocation-point samplers.

All samplers are pure: ``sample(key, n) -> [n, d]``. They run *inside* the
jitted train step, so collocation points are generated on-device each
iteration — no host→device transfer per step (the reference re-allocates
host/device tensors every iteration, heat.py:125-134).
"""

from dataclasses import dataclass

import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class UniformBox:
    """Uniform sampling over an axis-aligned box ∏ [low_i, high_i).

    Covers the reference's per-equation sampling: t ~ 1.01·U[0,1)
    (simple_ode.py:92), (x, t) ~ U[0,π)×U[0,3) (heat.py:125-126),
    t ~ (π/2)·U (fredholm.py:100)."""

    lows: tuple
    highs: tuple

    @property
    def dim(self):
        return len(self.lows)

    def sample(self, key, n):
        lows = jnp.asarray(self.lows)
        highs = jnp.asarray(self.highs)
        u = jax.random.uniform(key, (n, self.dim))
        return lows + u * (highs - lows)

    __call__ = sample


@dataclass(frozen=True)
class GridSubsample:
    """Uniform subsample *without replacement* from a fixed grid — the
    FitzHugh–Nagumo sampling scheme (200-point linspace + multinomial,
    fitzhugh_nagumo.py:124-131)."""

    low: float
    high: float
    num_points: int

    def sample(self, key, n):
        grid = jnp.linspace(self.low, self.high, self.num_points)
        idx = jax.random.choice(key, self.num_points, (n,), replace=False)
        return grid[idx][:, None]

    __call__ = sample
