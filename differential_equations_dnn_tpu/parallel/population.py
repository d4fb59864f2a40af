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

from differential_equations_dnn_tpu.kernels.aot_cache import cached_compile
from differential_equations_dnn_tpu.core.prng import fold_index, key_chain
from differential_equations_dnn_tpu.models.stateful import (
    init_model_state,
    train_apply,
    update_state,
)
from differential_equations_dnn_tpu.parallel.sharding import shard_batch
from differential_equations_dnn_tpu.utils.timing import Timer


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
                     params=None, opt_state=None, apply_fn=None,
                     state=None, timings: dict | None = None):
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
      apply_fn: override the loss forward (defaults to ``model.apply``; for
        stateful/BatchNorm models the train-mode forward is built
        automatically).
      state: optional stacked [P, ...] model state to resume from; stateful
        models get fresh per-trial running stats by default.
      timings: optional dict, filled with ``compile_time`` / ``run_time``
        seconds (compilation is measured separately so callers can report
        steady-state throughput — same split as train.trainer).

    Returns:
      (params [P, ...], opt_state, losses [iterations, P] as np.ndarray).
      Stateful models: retrieve the trained running stats from
      ``timings["state"]`` — kept out of the positional returns for
      backward compatibility.
    """
    config = config or PopulationConfig()
    lrates = jnp.asarray(lrates)
    n_trials = lrates.shape[0]
    if batch_sizes is None:
        batch_sizes = jnp.full((n_trials,), config.max_batch_size, jnp.int32)
    else:
        batch_sizes = jnp.asarray(batch_sizes, jnp.int32)

    state0 = init_model_state(model)
    stateful = state0 is not None and apply_fn is None
    if apply_fn is None and not stateful:
        apply_fn = model.apply
    opt = _adam()

    init_key, run_key = jax.random.split(key)
    trial_keys = jax.vmap(lambda i: fold_index(run_key, i))(
        jnp.arange(n_trials)
    )
    if params is None:
        params = jax.vmap(model.init)(key_chain(init_key, n_trials))
    if stateful and state is None:
        state = jax.vmap(lambda _: init_model_state(model))(
            jnp.arange(n_trials))
    if opt_state is None:
        opt_state = jax.vmap(opt.init)(params)

    if mesh is not None:
        n_shards = mesh.shape[config.pop_axis]
        if n_trials % n_shards:
            raise ValueError(
                f"population size {n_trials} must divide evenly over the "
                f"'{config.pop_axis}' mesh axis ({n_shards} shards)")
        put = lambda t: shard_batch(t, mesh, config.pop_axis)
        params, opt_state = put(params), put(opt_state)
        trial_keys = put(trial_keys)
        lrates, batch_sizes = put(lrates), put(batch_sizes)
        if stateful:
            state = put(state)

    mask_iota = jnp.arange(config.max_batch_size)

    def trial_step(params, t_state, opt_state, tkey, step_idx, lr, bs):
        skey = fold_index(tkey, step_idx)
        batch = problem.sample(skey, config.max_batch_size)
        mask = mask_iota < bs
        loss_apply = (train_apply(model, t_state) if stateful else apply_fn)
        loss, grads = jax.value_and_grad(
            lambda p: problem.loss(loss_apply, p, batch, mask=mask)
        )(params)
        updates, opt_state = opt.update(grads, opt_state)
        params = jax.tree.map(lambda p, u: p - lr * u, params, updates)
        if stateful:
            t_state = update_state(model, params, t_state,
                                   problem.domain_inputs(batch))
        return params, t_state, opt_state, loss

    v_step = jax.vmap(trial_step, in_axes=(0, 0, 0, 0, None, 0, 0))

    # trial_keys/lrates/batch_sizes enter as ARGUMENTS, not closures: on a
    # multi-process global mesh, jit cannot close over arrays spanning
    # non-addressable devices.
    @partial(jax.jit, static_argnames=("length",))
    def run_chunk(params, state, opt_state, trial_keys, lrates, batch_sizes,
                  start, length):
        def body(carry, i):
            params, state, opt_state = carry
            params, state, opt_state, loss = v_step(
                params, state, opt_state, trial_keys, i, lrates, batch_sizes
            )
            return (params, state, opt_state), loss

        (params, state, opt_state), losses = lax.scan(
            body, (params, state, opt_state), start + jnp.arange(length)
        )
        return params, state, opt_state, losses

    chunk = max(1, min(config.chunk_size, config.iterations))
    n_full, rem = divmod(config.iterations, chunk)
    compiled_chunk = None
    compile_timer = Timer()
    with compile_timer:
        if n_full > 0:
            compiled_chunk = cached_compile(
                run_chunk, params, state, opt_state, trial_keys, lrates,
                batch_sizes, 0, length=chunk, label=f"pop-{problem.name}")
    losses_out = []
    done = 0
    run_timer = Timer()
    with run_timer:
        for length in [chunk] * n_full + ([rem] if rem else []):
            if length == chunk and compiled_chunk is not None:
                # AOT Compiled objects take only the dynamic args.
                params, state, opt_state, losses = compiled_chunk(
                    params, state, opt_state, trial_keys, lrates,
                    batch_sizes, done)
            else:
                params, state, opt_state, losses = run_chunk(
                    params, state, opt_state, trial_keys, lrates,
                    batch_sizes, done, length)
            losses_out.append(_host_losses(losses))
            done += length
        jax.block_until_ready(params)

    if timings is not None:
        timings["compile_time"] = compile_timer.elapsed
        timings["run_time"] = run_timer.elapsed
        timings["state"] = state
    losses = np.concatenate(losses_out) if losses_out else np.zeros((0, n_trials))
    return params, opt_state, losses


def _host_losses(losses):
    """Fetch a [chunk, P] loss block to host. On a multi-process global mesh
    the block's population axis spans non-addressable devices — gather it
    across processes first (every process gets the full block, matching the
    single-process return contract)."""
    if isinstance(losses, jax.Array) and not losses.is_fully_addressable:
        from jax.experimental import multihost_utils

        losses = multihost_utils.process_allgather(losses, tiled=True)
    return np.asarray(losses)


def take_trials(stacked_tree, indices):
    """Select trials ``indices`` from a stacked [P, ...] pytree (host-side;
    used by successive-halving rungs to re-enter survivors)."""
    indices = jnp.asarray(indices)
    return jax.tree.map(lambda a: a[indices], stacked_tree)
