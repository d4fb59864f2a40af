"""Sharding annotations for batches and parameter pytrees."""

import jax
from jax.sharding import NamedSharding, PartitionSpec as P


def shard_batch(batch, mesh, axis: str = "data"):
    """Annotate every leaf of a batch pytree as sharded along its leading
    (collocation) dimension over mesh axis ``axis``."""
    sharding = NamedSharding(mesh, P(axis))
    return jax.tree.map(lambda a: jax.device_put(a, sharding), batch)


def replicate(tree, mesh):
    """Fully replicate a pytree (params / opt_state) across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda a: jax.device_put(a, sharding), tree)
