"""Checkpoint / resume.

The reference never saves model state — persistence is results-only
(``temp_results/*.npy``, heat.py:220-225; SURVEY §5.4). Here params +
opt_state + step are first-class checkpoints via orbax (async-capable,
sharding-aware — restores correctly onto multi-chip meshes), so long sweeps
and 150k-iteration runs (fitzhugh_nagumo.py:181) survive preemption.
"""

from pathlib import Path

import numpy as np

import jax


def _ocp():
    # Lazy: `import orbax.checkpoint` drags in google.cloud.logging —
    # ~4.1 s, half the package's import time — and most processes
    # (solve/bench/sweep without --checkpoint) never touch a checkpoint.
    import orbax.checkpoint as ocp

    return ocp


def checkpoint_like(problem, config, model=None, seed: int = 0,
                    engine: str = "scan"):
    """Abstract skeleton of a full training checkpoint — pass as ``like`` to
    ``restore_checkpoint`` for dtype/sharding-correct restore.

    Matches the tree the CLI saves: params + opt_state (+ model state for
    BatchNorm nets) + step + seed. Everything is built with ``jax.eval_shape``
    so no device memory is touched. ``engine="fused"`` matches the fused
    Pallas trainer's opt_state layout ({"m": params, "v": params}) instead
    of optax's."""
    from differential_equations_dnn_tpu.models.stateful import init_model_state
    from differential_equations_dnn_tpu.train.trainer import _make_optimizer

    model = model or problem.default_model()
    params = jax.eval_shape(model.init, jax.random.key(seed))
    if engine == "fused":
        opt_state = {"m": params, "v": params}
    else:
        opt_state = jax.eval_shape(_make_optimizer(config).init, params)
    like = {
        "params": params,
        "opt_state": opt_state,
        "step": np.zeros((), np.int64),
        "seed": np.zeros((), np.int64),
    }
    state = jax.eval_shape(lambda: init_model_state(model))
    if state is not None:
        like["state"] = state
    return like


def save_checkpoint(path: str | Path, tree, *, force: bool = True):
    """Save a pytree (e.g. ``{"params": ..., "opt_state": ..., "step": ...}``)."""
    path = Path(path).absolute()
    with _ocp().StandardCheckpointer() as ckptr:
        ckptr.save(path, tree, force=force)
    return path


def restore_checkpoint(path: str | Path, like=None):
    """Restore a pytree. ``like`` (an abstract/concrete pytree of the same
    structure, e.g. from ``jax.eval_shape``) restores with correct dtypes and
    shardings; without it, arrays come back as numpy."""
    path = Path(path).absolute()
    with _ocp().StandardCheckpointer() as ckptr:
        if like is not None:
            return ckptr.restore(path, like)
        return ckptr.restore(path)
