"""Ablation studies: batch-size effect and batch-norm placement effect.

Reference: batchsize_effect_heat.py (E2) sweeps batch sizes 2^0..2^10 × 5
runs × 15000 iters; batchnorm_effect_heat.py (E3) compares no-BN /
pre-activation-BN / post-activation-BN MLPs, 5 runs × 15000 iters each.

Both reference scripts run trials SEQUENTIALLY (hours) and carry two bugs we
fix: the swept batch size was never passed to the trainer (hardcoded 64,
batchsize_effect_heat.py:197) and the same net instance was reused across
runs without re-initialisation (:180-199). Here each (config, run) pair is an
independent trial in ONE vmapped population — fresh init per trial, true
batch size per trial via loss masking — so the whole ablation is a single
sharded TPU program.
"""

from dataclasses import dataclass

import numpy as np

import jax
import jax.numpy as jnp

from differential_equations_dnn_tpu.equations.heat import Heat1D
from differential_equations_dnn_tpu.models import MLP
from differential_equations_dnn_tpu.parallel.population import (
    PopulationConfig,
    train_population,
)


@dataclass
class AblationResult:
    labels: list                 # one per config
    mean_losses: np.ndarray      # [n_configs, iterations] averaged over runs
    all_losses: np.ndarray       # [n_configs, runs, iterations]

    def as_dict(self):
        return dict(zip(self.labels, self.mean_losses))


def batch_size_effect(problem=None, key=None, batch_sizes=None, runs: int = 5,
                      iterations: int = 15_000, lrate: float = 1e-4,
                      mesh=None, chunk_size: int = 1000) -> AblationResult:
    """Loss-vs-iteration curves per batch size, averaged over ``runs`` fresh
    inits (reference protocol: batchsize_effect_heat.py:186-205 with bugs
    fixed). All ``len(batch_sizes) × runs`` trials train simultaneously."""
    problem = problem or Heat1D()
    key = key if key is not None else jax.random.key(0)
    if batch_sizes is None:
        batch_sizes = [2**i for i in range(11)]  # reference :186
    batch_sizes = list(batch_sizes)
    model = problem.default_model()

    n_trials = len(batch_sizes) * runs
    bs_per_trial = jnp.asarray(np.repeat(batch_sizes, runs), jnp.int32)
    lrates = jnp.full((n_trials,), lrate, jnp.float32)

    config = PopulationConfig(iterations=iterations,
                              max_batch_size=int(max(batch_sizes)),
                              chunk_size=chunk_size)
    _, _, losses = train_population(problem, model, key, lrates, bs_per_trial,
                                    config=config, mesh=mesh)
    # losses: [iterations, n_trials] -> [n_configs, runs, iterations]
    curves = losses.T.reshape(len(batch_sizes), runs, iterations)
    return AblationResult(
        labels=[str(b) for b in batch_sizes],
        mean_losses=curves.mean(axis=1),
        all_losses=curves,
    )


def batchnorm_effect(problem=None, key=None, runs: int = 5,
                     iterations: int = 15_000, batch_size: int = 64,
                     lrate: float = 1e-4, hidden_size: int = 128,
                     num_layers: int = 3, activation: str = "relu",
                     mesh=None, chunk_size: int = 1000) -> AblationResult:
    """No-BN vs pre-activation-BN vs post-activation-BN on the heat equation
    (reference protocol: batchnorm_effect_heat.py:292-347). The three configs
    have different parameter pytrees, so each config is its own ``runs``-wide
    population; the three populations run back-to-back."""
    problem = problem or Heat1D()
    key = key if key is not None else jax.random.key(0)

    configs = [
        ("none", MLP(2, 1, hidden_size, num_layers, activation=activation)),
        ("pre", MLP(2, 1, hidden_size, num_layers, activation=activation,
                    batch_norm="pre")),
        ("post", MLP(2, 1, hidden_size, num_layers, activation=activation,
                     batch_norm="post")),
    ]
    pop_config = PopulationConfig(iterations=iterations,
                                  max_batch_size=batch_size,
                                  chunk_size=chunk_size)
    curves = []
    for i, (label, model) in enumerate(configs):
        lrates = jnp.full((runs,), lrate, jnp.float32)
        # BN models ride the standard stateful population path (their
        # running statistics are threaded automatically; the loss uses
        # train-mode batch stats exactly like the reference's forwards).
        _, _, losses = train_population(
            problem, model, jax.random.fold_in(key, i), lrates,
            config=pop_config, mesh=mesh,
        )
        curves.append(losses.T)  # [runs, iterations]

    all_losses = np.stack(curves)
    return AblationResult(
        labels=[label for label, _ in configs],
        mean_losses=all_losses.mean(axis=1),
        all_losses=all_losses,
    )
