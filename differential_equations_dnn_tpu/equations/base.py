"""Problem protocol: what the trainer, sweeps, and CLI consume.

A Problem bundles, for one differential/integral equation:

* ``default_model()``      — the reference's network for this equation
* ``sample(key, n)``       — one training batch of collocation data (pure,
                             device-side; runs inside the jitted step)
* ``loss(apply_fn, params, batch)``
                           — the physics residual loss (pure)
* ``grid_inputs(nodes)``   — flattened evaluation-grid inputs [M, d]
* ``solution_shape(nodes)``— shape the evaluated grid reshapes to
* ``exact(nodes)``         — analytic / classical-integrator ground truth
* ``defaults``             — reference iteration budget / batch size / lr

``evaluate`` is shared: one batched jitted forward over the whole grid
(replacing the reference's per-point Python loops, e.g. heat.py:164-171) and
``mae`` reproduces the reference's acceptance metric
(sklearn.mean_absolute_error, heat.py:232).
"""

from dataclasses import dataclass

import numpy as np

import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class TrainDefaults:
    iterations: int
    batch_size: int
    lrate: float = 1e-4
    nodes: int = 40
    # Default learning-rate schedule for this equation ("constant" matches
    # the reference's fixed-lr Adam, heat.py:115; equations whose accuracy
    # regresses with budget at a fixed lr override with "cosine").
    schedule: str = "constant"


@dataclass(frozen=True)
class Problem:
    name: str = "problem"

    # -- interface every equation implements --------------------------------
    def default_model(self):
        raise NotImplementedError

    def sample(self, key, n):
        raise NotImplementedError

    def validation_sample(self, key, n):
        """Collocation batch for VALIDATION (model selection). Defaults to
        the training sampler; problems that train on a fixed grid override
        this with dense off-grid sampling — a trial can drive the residual
        to zero ON the grid while oscillating between grid points (observed
        on FitzHugh–Nagumo), and only off-grid residuals expose that."""
        return self.sample(key, n)

    @property
    def max_sample_size(self):
        """Largest per-step collocation batch ``sample`` can produce, or None
        if unbounded. Fixed-grid problems (FitzHugh–Nagumo's 200-point grid,
        the UAT demo's 50-point grid) override this; hyperparameter sweeps
        clamp their batch-size search space to it."""
        return None

    def domain_inputs(self, batch):
        """The interior-collocation inputs of a training batch [B, d].

        Used by the trainer to refresh stateful-model (BatchNorm) running
        statistics from the training distribution. The shared samplers name
        the interior points "xt" (PDEs), "t" (ODEs) or "x" (function fits);
        problems with other layouts override this."""
        if isinstance(batch, dict):
            for name in ("xt", "t", "x"):
                if name in batch:
                    return batch[name]
        return jax.tree.leaves(batch)[0]

    def point_loss(self, apply_fn, params, batch):
        """Per-collocation-point summed squared residuals, shape [B].

        Every reference loss is the batch mean of a pointwise residual sum
        (e.g. heat.py:95: ``mean(L_domain + L_init + L_boundary)``). Exposing
        the pointwise vector lets the trainer mask it — which is how
        population sweeps run *heterogeneous batch sizes* inside one vmapped
        program (see sweep.search)."""
        raise NotImplementedError

    def loss(self, apply_fn, params, batch, mask=None):
        """Scalar training loss: (masked) mean of ``point_loss``."""
        r = self.point_loss(apply_fn, params, batch)
        if mask is None:
            return jnp.mean(r)
        mask = mask.astype(r.dtype)
        return jnp.sum(r * mask) / jnp.sum(mask)

    def grid_inputs(self, nodes):
        raise NotImplementedError

    def solution_shape(self, nodes):
        return (nodes,)

    def exact(self, nodes):
        raise NotImplementedError

    # -- shared machinery ----------------------------------------------------
    def evaluate(self, apply_fn, params, nodes):
        """Evaluate the trained net on the problem's grid: ONE batched
        forward, reshaped to the solution grid."""
        from differential_equations_dnn_tpu.kernels.aot_cache import (
            cached_call,
        )

        inputs = self.grid_inputs(nodes)
        y = cached_call(jax.jit(apply_fn), params, inputs,
                        label=f"eval-{self.name}")
        return np.asarray(y).reshape(self.solution_shape(nodes))

    def mae(self, apply_fn, params, nodes):
        """Mean absolute error against the ground truth — the reference's
        acceptance metric."""
        approx = self.evaluate(apply_fn, params, nodes)
        return float(np.mean(np.abs(self.exact(nodes) - approx)))


def mse(x):
    return jnp.mean(jnp.square(x))
