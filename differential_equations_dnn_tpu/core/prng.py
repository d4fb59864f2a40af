"""Explicit PRNG plumbing.

The reference relies on unseeded global ``torch.rand`` (e.g. heat.py:125-126),
which is nondeterministic run-to-run. Here every source of randomness threads
an explicit ``jax.random`` key, so training is bitwise reproducible and safe
under jit/vmap/shard_map.
"""

import jax


def key_chain(key, n: int):
    """Split ``key`` into ``n`` independent keys (stacked, shape [n, ...])."""
    return jax.random.split(key, n)


def fold_index(key, i):
    """Derive the key for step/device/trial ``i`` without materialising a key
    array — used inside lax.scan training loops and shard_map bodies."""
    return jax.random.fold_in(key, i)
