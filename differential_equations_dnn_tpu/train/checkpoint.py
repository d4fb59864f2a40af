"""Checkpoint / resume.

The reference never saves model state — persistence is results-only
(``temp_results/*.npy``, heat.py:220-225; SURVEY §5.4). Here params +
opt_state + step are first-class checkpoints via orbax (async-capable,
sharding-aware — restores correctly onto multi-chip meshes), so long sweeps
and 150k-iteration runs (fitzhugh_nagumo.py:181) survive preemption.
"""

from pathlib import Path

import orbax.checkpoint as ocp


def save_checkpoint(path: str | Path, tree, *, force: bool = True):
    """Save a pytree (e.g. ``{"params": ..., "opt_state": ..., "step": ...}``)."""
    path = Path(path).absolute()
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, tree, force=force)
    return path


def restore_checkpoint(path: str | Path, like=None):
    """Restore a pytree. ``like`` (an abstract/concrete pytree of the same
    structure, e.g. from ``jax.eval_shape``) restores with correct dtypes and
    shardings; without it, arrays come back as numpy."""
    path = Path(path).absolute()
    with ocp.StandardCheckpointer() as ckptr:
        if like is not None:
            return ckptr.restore(path, like)
        return ckptr.restore(path)
