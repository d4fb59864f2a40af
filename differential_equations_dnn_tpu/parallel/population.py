"""Population training: P independent trials as ONE vmapped, sharded program.

This is the TPU-native replacement for the reference's Ray Tune driver
(optimize_heat_ray.py:160-203) and the engine under ``sweep``:

* every trial gets its own init, PRNG stream, learning rate, and (masked)
  batch size — all batched along a leading population axis;
* the whole population advances in lock-step inside one ``lax.scan`` /
  ``jit``; there is no driver↔worker RPC, no process boundary, no stragglers;
* on a mesh, the population axis is sharded across chips ('pop'); trials are
  embarrassingly parallel so no collectives are emitted at all.

Heterogeneous *batch sizes* use the mask trick: every trial samples
``max_batch_size`` collocation points and masks its ``point_loss`` down to
its own budget (see equations.base.Problem.loss). Heterogeneous *learning
rates* enter as a vmapped scalar: the optimizer is ``scale_by_adam`` and the
per-trial lr multiplies the update direction.
"""

from dataclasses import dataclass
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
import optax
from jax import lax
from jax.sharding import NamedSharding, PartitionSpec as P


@dataclass(frozen=True)
class PopulationConfig:
    iterations: int = 1000
    max_batch_size: int = 64
    chunk_size: int = 1000
    pop_axis: str = "pop"


def _adam():
    # Matches optax.adam's transform minus the lr scaling, which is applied
    # per trial (torch Adam defaults, reference heat.py:115).
    return optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8)


def train_population(problem, model, key, lrates, batch_sizes=None,
                     config: PopulationConfig | None = None, mesh=None,
                     params=None, opt_state=None, apply_fn=None):
    """Train ``P = len(lrates)`` trials simultaneously.

    Args:
      problem: an ``equations.Problem``.
      model: the network config (shared architecture across trials).
      key: base PRNG key; trial i derives ``fold_in(key, i)``.
      lrates: [P] array of per-trial learning rates.
      batch_sizes: optional [P] int array (≤ config.max_batch_size); None
        means every trial uses the full ``max_batch_size``.
      mesh: optional Mesh with a ``config.pop_axis`` axis to shard trials.
      params/opt_state: optional stacked [P, ...] pytrees to resume from
        (e.g. successive-halving rungs re-entering survivors).

    Returns:
      (params [P, ...], opt_state, losses [iterations, P] as np.ndarray)
    """
    config = config or PopulationConfig()
    lrates = jnp.asarray(lrates)
    n_trials = lrates.shape[0]
    if batch_sizes is None:
        batch_sizes = jnp.full((n_trials,), config.max_batch_size, jnp.int32)
    else:
        batch_sizes = jnp.asarray(batch_sizes, jnp.int32)

    apply_fn = apply_fn or model.apply
    opt = _adam()

    init_key, run_key = jax.random.split(key)
    trial_keys = jax.vmap(lambda i: jax.random.fold_in(run_key, i))(
        jnp.arange(n_trials)
    )
    if params is None:
        params = jax.vmap(model.init)(jax.random.split(init_key, n_trials))
    if opt_state is None:
        opt_state = jax.vmap(opt.init)(params)

    if mesh is not None:
        n_shards = mesh.shape[config.pop_axis]
        if n_trials % n_shards:
            raise ValueError(
                f"population size {n_trials} must divide evenly over the "
                f"'{config.pop_axis}' mesh axis ({n_shards} shards)")
        pop_sharding = NamedSharding(mesh, P(config.pop_axis))
        put = lambda t: jax.tree.map(lambda a: jax.device_put(a, pop_sharding), t)
        params, opt_state = put(params), put(opt_state)
        trial_keys = put(trial_keys)
        lrates, batch_sizes = put(lrates), put(batch_sizes)

    mask_iota = jnp.arange(config.max_batch_size)

    def trial_step(params, opt_state, tkey, step_idx, lr, bs):
        skey = jax.random.fold_in(tkey, step_idx)
        batch = problem.sample(skey, config.max_batch_size)
        mask = mask_iota < bs
        loss, grads = jax.value_and_grad(
            lambda p: problem.loss(apply_fn, p, batch, mask=mask)
        )(params)
        updates, opt_state = opt.update(grads, opt_state)
        params = jax.tree.map(lambda p, u: p - lr * u, params, updates)
        return params, opt_state, loss

    v_step = jax.vmap(trial_step, in_axes=(0, 0, 0, None, 0, 0))

    @partial(jax.jit, static_argnames=("length",))
    def run_chunk(params, opt_state, start, length):
        def body(carry, i):
            params, opt_state = carry
            params, opt_state, loss = v_step(
                params, opt_state, trial_keys, i, lrates, batch_sizes
            )
            return (params, opt_state), loss

        (params, opt_state), losses = lax.scan(
            body, (params, opt_state), start + jnp.arange(length)
        )
        return params, opt_state, losses

    chunk = max(1, min(config.chunk_size, config.iterations))
    n_full, rem = divmod(config.iterations, chunk)
    losses_out = []
    done = 0
    for length in [chunk] * n_full + ([rem] if rem else []):
        params, opt_state, losses = run_chunk(params, opt_state, done, length)
        losses_out.append(np.asarray(losses))
        done += length

    losses = np.concatenate(losses_out) if losses_out else np.zeros((0, n_trials))
    return params, opt_state, losses


def take_trials(stacked_tree, indices):
    """Select trials ``indices`` from a stacked [P, ...] pytree (host-side;
    used by successive-halving rungs to re-enter survivors)."""
    indices = jnp.asarray(indices)
    return jax.tree.map(lambda a: a[indices], stacked_tree)
