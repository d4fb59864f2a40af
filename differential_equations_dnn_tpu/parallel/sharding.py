"""Sharding annotations for batches and parameter pytrees.

``shard_batch``/``replicate`` place host data (device_put — outside jit);
``constrain_batch`` annotates traced values (with_sharding_constraint —
inside jit). The trainer's data-parallel path uses ``constrain_batch`` on
every collocation batch (train.trainer.make_train_step); the population
engine uses ``shard_batch`` to lay trials over the 'pop' axis
(parallel.population.train_population)."""

import jax
from jax import lax
from jax.sharding import NamedSharding, PartitionSpec as P


def _put(a, sharding):
    """Place one array under ``sharding``. Multi-process (global) meshes
    contain devices this process cannot address — ``device_put`` rejects
    those, so each process contributes its addressable shards from the
    (identically computed on every process) full-shape value instead."""
    if sharding.is_fully_addressable:
        return jax.device_put(a, sharding)
    import jax.numpy as jnp

    return jax.make_array_from_callback(jnp.shape(a), sharding,
                                        lambda idx: a[idx])


def shard_batch(batch, mesh, axis: str = "data"):
    """Place every leaf of a batch pytree sharded along its leading
    (collocation / population) dimension over mesh axis ``axis``."""
    sharding = NamedSharding(mesh, P(axis))
    return jax.tree.map(lambda a: _put(a, sharding), batch)


def replicate(tree, mesh):
    """Fully replicate a pytree (params / opt_state) across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda a: _put(a, sharding), tree)


def constrain_batch(batch, mesh, axis: str = "data"):
    """In-jit equivalent of ``shard_batch``: constrain every leaf's leading
    dimension to be sharded over mesh axis ``axis`` so XLA partitions the
    residual evaluation data-parallel and inserts one gradient psum."""
    sharding = NamedSharding(mesh, P(axis))
    return jax.tree.map(lambda a: lax.with_sharding_constraint(a, sharding),
                        batch)
