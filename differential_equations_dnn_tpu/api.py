"""High-level one-call API: ``solve(...)``.

What a reference user types instead of running a whole script:

    from differential_equations_dnn_tpu import solve
    result = solve("heat")          # reference defaults, reference budgets
    result.mae, result.solution, result.loss_history
"""

from dataclasses import dataclass
from typing import Any

import numpy as np

import jax

from differential_equations_dnn_tpu.equations import PROBLEMS, Problem
from differential_equations_dnn_tpu.train import TrainConfig, train
from differential_equations_dnn_tpu.train.metrics import mean_absolute_error


@dataclass
class SolveResult:
    problem: Problem
    params: Any
    solution: np.ndarray        # net evaluated on the problem grid
    exact: np.ndarray           # analytic / classical ground truth
    mae: float
    loss_history: np.ndarray
    iters_per_sec: float
    wall_time: float

    def __repr__(self):
        return (f"SolveResult({self.problem.name}: mae={self.mae:.4g}, "
                f"final_loss={self.loss_history[-1]:.3g}, "
                f"{self.iters_per_sec:.0f} iters/s)")


def solve(equation: str | Problem, *, iterations: int | None = None,
          batch_size: int | None = None, lrate: float | None = None,
          nodes: int | None = None, seed: int = 0, model=None, mesh=None,
          ensemble: int = 0, finetune: int = 0, verbose: bool = False,
          **problem_kwargs) -> SolveResult:
    """Train a network on ``equation`` and validate against its ground truth.

    ``equation`` is a registry name ("simple_ode", "heat", "fredholm",
    "fitzhugh_nagumo", "uat") or a Problem instance. Unset hyperparameters
    default to the reference's published configuration for that equation.

    ``ensemble=N`` trains N independently-initialised replicas as ONE vmapped
    population (shardable over a 'pop' mesh axis) and returns the replica
    with the lowest smoothed final training loss. Init sensitivity dominates
    stiff problems like FitzHugh–Nagumo — a single seed lands anywhere
    between MAE 0.005 and 0.76 at the reference budget; best-of-8 reliably
    beats the reference's published number, at ~the cost of one run on TPU.
    """
    if isinstance(equation, str):
        try:
            problem = PROBLEMS[equation](**problem_kwargs)
        except KeyError:
            raise ValueError(
                f"unknown equation {equation!r}; available: {sorted(PROBLEMS)}"
            ) from None
    else:
        problem = equation

    d = problem.defaults
    config = TrainConfig(
        iterations=iterations if iterations is not None else d.iterations,
        batch_size=batch_size if batch_size is not None else d.batch_size,
        lrate=lrate if lrate is not None else d.lrate,
        verbose=verbose,
    )
    nodes = nodes if nodes is not None else d.nodes
    model = model or problem.default_model()

    if ensemble > 1:
        import jax.numpy as jnp

        from differential_equations_dnn_tpu.parallel import (
            PopulationConfig,
            train_population,
        )
        from differential_equations_dnn_tpu.utils.timing import Timer

        pc = PopulationConfig(iterations=config.iterations,
                              max_batch_size=config.batch_size,
                              chunk_size=min(config.iterations, 25_000))
        with Timer() as t:
            stacked, _, losses = train_population(
                problem, model, jax.random.key(seed),
                jnp.full((ensemble,), config.lrate), config=pc, mesh=mesh,
            )
        # Select by residual on a dense off-grid validation batch (pure
        # physics, no ground truth): grid-trained trials can zero the loss
        # on their collocation grid while oscillating between grid points.
        val_batch = problem.validation_sample(jax.random.key(seed + 1), 4096)
        val_losses = jax.jit(jax.vmap(
            lambda p: problem.loss(model.apply, p, val_batch)
        ))(stacked)
        pick = int(np.argmin(np.asarray(val_losses)))
        params = jax.tree.map(lambda a: a[pick], stacked)
        loss_history = losses[:, pick]
        iters_per_sec = config.iterations / t.elapsed
        wall_time = t.elapsed
    else:
        result = train(problem, jax.random.key(seed), config, model=model,
                       mesh=mesh)
        params = result.params
        loss_history = result.loss_history
        iters_per_sec = result.iters_per_sec
        wall_time = result.wall_time

    if finetune:
        from differential_equations_dnn_tpu.train import finetune_lbfgs

        params, ft_losses = finetune_lbfgs(
            problem, params, jax.random.key(seed + 1), steps=finetune,
            model=model)
        loss_history = np.concatenate([loss_history, ft_losses])

    solution = problem.evaluate(model.apply, params, nodes=nodes)
    exact = problem.exact(nodes)
    return SolveResult(
        problem=problem,
        params=params,
        solution=solution,
        exact=exact,
        mae=mean_absolute_error(exact, solution),
        loss_history=loss_history,
        iters_per_sec=iters_per_sec,
        wall_time=wall_time,
    )
