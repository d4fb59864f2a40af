"""Secondary benchmark: population-sweep throughput (trials/min per chip).

The reference's Ray Tune run trains 10 trials, ≤5 concurrent processes, each
a full PyTorch training loop (optimize_heat_ray.py:184-196). Here a
256-trial population — the reference search space over batch size and
learning rate — advances in lock-step as ONE vmapped XLA program on a single
chip.

Prints one JSON line: trials/min at a 2,000-iteration budget per trial.
"""

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

import jax
import jax.numpy as jnp


def main(num_trials: int = 256, iterations: int = 2000):
    from differential_equations_dnn_tpu.equations import Heat1D
    from differential_equations_dnn_tpu.parallel import (
        PopulationConfig,
        train_population,
    )
    from differential_equations_dnn_tpu.sweep.search import heat_search_space

    problem = Heat1D(taps="taylor")
    model = problem.default_model()
    draws = heat_search_space().sample(seed=0, n=num_trials)
    lrates = jnp.asarray(draws["lrate"], jnp.float32)
    batch_sizes = jnp.minimum(jnp.asarray(draws["batch_size"], jnp.int32), 128)

    config = PopulationConfig(iterations=iterations, max_batch_size=128,
                              chunk_size=iterations)
    # train_population compiles its chunk program before its timed loop and
    # reports the split in `timings` — steady-state throughput, same
    # convention as bench.py.
    timings = {}
    _, _, losses = train_population(problem, model, jax.random.key(0),
                                    lrates, batch_sizes, config=config,
                                    timings=timings)
    trials_per_min = num_trials / (timings["run_time"] / 60.0)
    best = int(np.argmin(losses[-1]))
    print(json.dumps({
        "metric": "sweep_trials_per_min",
        "value": round(trials_per_min, 1),
        "unit": "trials/min",
        "extras": {
            "num_trials": num_trials,
            "iterations_per_trial": iterations,
            "wall_time_s": round(timings["run_time"], 2),
            "compile_time_s": round(timings["compile_time"], 2),
            "best_config": {"batch_size": int(batch_sizes[best]),
                            "lrate": float(lrates[best])},
            "best_final_loss": float(losses[-1, best]),
            "device": str(jax.devices()[0]),
            "reference": "Ray Tune: 10 trials, <=5 concurrent processes",
        },
    }))


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:]))
