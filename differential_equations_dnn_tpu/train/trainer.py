"""The jitted Deep-Galerkin trainer.

One trainer serves every equation (the reference re-implements
``minimize_loss_dgm`` per script: simple_ode.py:66, heat.py:98,
fredholm.py:77, fitzhugh_nagumo.py:100, optimize_heat_ray.py:80, ...).

TPU-first structure:

* The entire optimisation step — collocation sampling, residual loss with its
  derivative taps, Adam update — is ONE pure function, scanned over a chunk of
  iterations inside a single jit. XLA fuses sampling + forward + taps +
  update; there is **zero host↔device traffic inside a chunk** (the reference
  syncs ``loss.item()`` every single iteration, heat.py:143).
* The loss history is device-resident ([chunk] array per scan), fetched once
  per chunk for logging — the reference's per-100-iteration print cadence
  (heat.py:144-147) maps to ``log_every``.
* PRNG: the step key is ``fold_in(run_key, step_index)`` — reproducible,
  checkpoint-resumable at any step boundary, no key array materialised.
* Multi-chip: pass a ``jax.sharding.Mesh`` and the collocation batch is
  annotated with a data-parallel sharding; params stay replicated and XLA
  inserts the single gradient ``psum`` over ICI.
"""

import math
from dataclasses import dataclass
from functools import partial
from typing import Any

import numpy as np

import jax
import jax.numpy as jnp
import optax
from jax import lax

from differential_equations_dnn_tpu.core.prng import fold_index
from differential_equations_dnn_tpu.kernels.aot_cache import cached_compile
from differential_equations_dnn_tpu.models.stateful import (
    init_model_state,
    train_apply,
    update_state,
)
from differential_equations_dnn_tpu.parallel.sharding import constrain_batch
from differential_equations_dnn_tpu.utils.timing import Timer

# ---------------------------------------------------------------------------
# Fault injection (testing hook for the elastic-recovery path; SURVEY §5.3)
# ---------------------------------------------------------------------------

_FAULT_QUEUE: list[int] = []


class _InjectedFault(Exception):
    pass


def inject_fault(at_dispatch: int):
    """Context manager: make the ``at_dispatch``-th chunk dispatch of the
    next training run raise, exercising snapshot/retry recovery in tests."""
    import contextlib

    @contextlib.contextmanager
    def _ctx():
        _FAULT_QUEUE.append(at_dispatch)
        try:
            yield
        finally:
            _FAULT_QUEUE.clear()

    return _ctx()


# Known device/worker-failure signatures (substring match on runtime errors).
# Deterministic runtime errors (shape mismatches, OOM) are NOT retried —
# restarting from a snapshot cannot fix them and only delays the diagnosis.
_RECOVERABLE = (
    "TPU worker process crashed",   # observed on this hardware (round 1)
    "worker process restarted",
    "DATA_LOSS",
    "device is in an invalid state",
    "failed to connect",
)


def _is_recoverable(err: Exception) -> bool:
    if isinstance(err, _InjectedFault):
        return True
    msg = str(err)
    return any(sig in msg for sig in _RECOVERABLE)


@dataclass(frozen=True)
class TrainConfig:
    iterations: int = 1000
    batch_size: int = 32
    lrate: float = 1e-4
    log_every: int = 100        # host-side loss print cadence (0 = silent)
    # Scan length per jit dispatch. Large chunks amortize the per-dispatch
    # device round-trip — measured 80 ms to >1 s PER DISPATCH over the
    # remote-device tunnel, which at 1000-step chunks capped the 150k-step
    # FitzHugh-Nagumo run at ~900 it/s vs ~20k at 25k-step chunks.
    chunk_size: int = 25_000
    optimizer: str = "adam"
    # Learning-rate schedule: "constant" | "cosine" | "exponential".
    # (The reference hand-rolls LR decay in commented-out code,
    # fitzhugh_nagumo.py:149-152; here it is a first-class option.)
    schedule: str = "constant"
    schedule_decay: float = 0.1   # final lr = lrate * schedule_decay
    # Residual-based adaptive collocation (beyond the reference; cf. RAD /
    # PACMANN-style adaptive sampling): draw `adaptive_oversample`× the batch
    # each step, keep the batch_size points with the LARGEST current
    # residual. 0/1 disables. Stays fully inside the jitted scan.
    adaptive_oversample: int = 0
    data_axis: str = "data"     # mesh axis name for collocation sharding
    verbose: bool = True
    # Optional JSONL metrics stream: one record per chunk (step, loss stats,
    # iters/sec) — the framework's observability hook (SURVEY §5.5); loss
    # stays device-resident within a chunk.
    metrics_file: str | None = None
    # Elastic recovery (SURVEY §5.3 — the reference has none; TPU workers DO
    # crash): host-side numpy snapshots of (params, opt_state) every
    # ``snapshot_every`` chunks; on a device runtime failure the trainer
    # restores the snapshot and retries up to ``max_retries`` times.
    # snapshot_every=0 disables snapshots and recovery. NOTE: the unit is
    # CHUNKS, so the maximum replayed work on recovery is
    # snapshot_every * chunk_size steps — if you lower the recovery window
    # rather than the dispatch granularity, lower snapshot_every, not
    # chunk_size (small chunks pay the per-dispatch tunnel latency).
    snapshot_every: int = 1
    max_retries: int = 2


@dataclass
class TrainResult:
    params: Any
    opt_state: Any
    loss_history: np.ndarray
    wall_time: float
    iters_per_sec: float
    compile_time: float = 0.0
    # Mutable model state (BatchNorm running statistics); None for the
    # stateless models. Pass to ``models.stateful.eval_apply`` for eval-mode
    # forwards.
    state: Any = None

    @property
    def final_loss(self) -> float:
        return float(self.loss_history[-1])


def _make_schedule(config: TrainConfig):
    if config.schedule == "constant":
        return config.lrate
    if config.schedule == "cosine":
        return optax.cosine_decay_schedule(
            config.lrate, config.iterations, alpha=config.schedule_decay)
    if config.schedule == "exponential":
        return optax.exponential_decay(
            config.lrate, config.iterations, config.schedule_decay)
    raise ValueError(f"unknown schedule {config.schedule!r}")


def _make_optimizer(config: TrainConfig):
    lr = _make_schedule(config)
    if config.optimizer == "adam":
        # torch.optim.Adam defaults (reference heat.py:115): eps inside sqrt
        # differs between torch/optax by eps_root; torch uses eps outside —
        # optax.adam(eps=1e-8, eps_root=0) matches.
        return optax.adam(lr, b1=0.9, b2=0.999, eps=1e-8)
    if config.optimizer == "adamw":
        return optax.adamw(lr)
    if config.optimizer == "sgd":
        return optax.sgd(lr)
    raise ValueError(f"unknown optimizer {config.optimizer!r}")


def make_train_step(problem, apply_fn, optimizer, batch_size, mesh=None,
                    data_axis="data", adaptive_oversample=0, model=None):
    """Build the pure per-iteration step:
    ``step((params, state, opt_state), key) -> ((params, state, opt_state), loss)``.

    ``state`` is the model's mutable pytree (BatchNorm running statistics) —
    ``None`` for stateless models, in which case the step traces to exactly
    the stateless program. Stateful models require ``model`` (the reference
    trains BN nets through the same loop, batchnorm_effect_heat.py:239; here
    the loss uses train-mode batch statistics — state-independent — and the
    running stats are refreshed once per step from the domain batch)."""

    def step(carry, key):
        params, state, opt_state = carry
        if adaptive_oversample > 1:
            # Residual-based adaptive collocation: oversample candidates,
            # keep the hardest points under the CURRENT params (selection is
            # gradient-stopped; only the selected batch is differentiated).
            cand = problem.sample(key, batch_size * adaptive_oversample)
            r = lax.stop_gradient(problem.point_loss(apply_fn, params, cand))
            _, idx = lax.top_k(r, batch_size)
            batch = jax.tree.map(lambda a: a[idx], cand)
        else:
            batch = problem.sample(key, batch_size)
        if mesh is not None:
            batch = constrain_batch(batch, mesh, data_axis)
        loss_apply = apply_fn if state is None else train_apply(model, state)
        loss, grads = jax.value_and_grad(
            lambda p: problem.loss(loss_apply, p, batch)
        )(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        if state is not None:
            state = update_state(model, params, state,
                                 problem.domain_inputs(batch))
        return (params, state, opt_state), loss

    return step


def train(problem, key, config: TrainConfig | None = None, model=None,
          params=None, opt_state=None, state=None, mesh=None,
          start_step: int = 0, profile_dir: str | None = None) -> TrainResult:
    """Train ``model`` (default: ``problem.default_model()``) on ``problem``.

    Chunked execution: ``ceil(iterations / chunk_size)`` jit dispatches, each
    a ``lax.scan`` over up to ``chunk_size`` fully-fused steps. At most two
    distinct scan lengths compile (full chunk + remainder).

    Stateful models (BatchNorm variants) train on this same path — the state
    pytree (running statistics) is threaded through the scan carry and
    returned as ``TrainResult.state`` (reference parity: BN nets go through
    the one shared loop, batchnorm_effect_heat.py:239-290).
    """
    config = config or TrainConfig(
        iterations=problem.defaults.iterations,
        batch_size=problem.defaults.batch_size,
        lrate=problem.defaults.lrate,
    )
    model = model or problem.default_model()
    apply_fn = model.apply

    init_key, run_key = jax.random.split(key)
    if params is None:
        params = model.init(init_key)
    if state is None:
        state = init_model_state(model)
    optimizer = _make_optimizer(config)
    if opt_state is None:
        opt_state = optimizer.init(params)

    step = make_train_step(problem, apply_fn, optimizer, config.batch_size,
                           mesh=mesh, data_axis=config.data_axis,
                           adaptive_oversample=config.adaptive_oversample,
                           model=model)

    @partial(jax.jit, static_argnames=("length",))
    def run_chunk(params, state, opt_state, start, length):
        steps = start + jnp.arange(length)
        keys = jax.vmap(lambda i: fold_index(run_key, i))(steps)
        (params, state, opt_state), losses = lax.scan(
            step, (params, state, opt_state), keys)
        return params, state, opt_state, losses

    chunk = max(1, min(config.chunk_size, config.iterations))
    n_full, rem = divmod(config.iterations, chunk)

    losses_out = []
    compiled_chunk = None
    compile_timer = Timer()
    with compile_timer:
        # Compile the full-chunk program before timing the run — through the
        # AOT executable cache, so a warm process skips the compiler.
        if n_full > 0:
            compiled_chunk = cached_compile(
                run_chunk, params, state, opt_state, 0, length=chunk,
                label=f"scan-{problem.name}")

    metrics_fh = open(config.metrics_file, "a") if config.metrics_file else None
    chunks = [chunk] * n_full + ([rem] if rem else [])
    snapshot = None
    if config.snapshot_every:
        snapshot = (jax.tree.map(np.asarray, (params, state, opt_state)),
                    start_step, 0)
    retries = 0
    dispatch_idx = 0
    with Timer() as t:
        done = start_step
        if profile_dir:
            jax.profiler.start_trace(profile_dir)
        try:
            ci = 0
            while ci < len(chunks):
                chunk_len = chunks[ci]
                try:
                    if _FAULT_QUEUE and dispatch_idx == _FAULT_QUEUE[0]:
                        _FAULT_QUEUE.pop(0)
                        raise _InjectedFault(f"injected at dispatch {dispatch_idx}")
                    chunk_timer = Timer()
                    with chunk_timer:
                        # AOT Compiled objects take only the dynamic args
                        # (``length`` was fixed at lowering time).
                        step_fn = (
                            (lambda p, s, o, d: compiled_chunk(p, s, o, d))
                            if chunk_len == chunk and compiled_chunk is not None
                            else (lambda p, s, o, d: run_chunk(
                                p, s, o, d, chunk_len)))
                        params, state, opt_state, losses = step_fn(
                            params, state, opt_state, done)
                        losses = np.asarray(losses)
                except Exception as err:  # noqa: BLE001 — filtered below
                    dispatch_idx += 1
                    if (snapshot is None or retries >= config.max_retries
                            or not _is_recoverable(err)):
                        raise
                    retries += 1
                    (host_state, done, n_chunks_kept) = snapshot
                    params, state, opt_state = jax.tree.map(
                        jnp.asarray, host_state)
                    losses_out = losses_out[:n_chunks_kept]
                    ci = n_chunks_kept
                    print(f"[recovery] device failure ({type(err).__name__}); "
                          f"restored snapshot at step {done}, retry "
                          f"{retries}/{config.max_retries}")
                    continue
                dispatch_idx += 1
                losses_out.append(losses)
                if config.verbose and config.log_every:
                    for j in range(0, chunk_len, config.log_every):
                        i = done + j
                        if i % config.log_every == 0:
                            print(f"Iteration: {i}, Loss: {losses[j]}, "
                                  f"LR: {config.lrate}")
                done += chunk_len
                ci += 1
                if config.snapshot_every and ci % config.snapshot_every == 0:
                    snapshot = (jax.tree.map(np.asarray,
                                             (params, state, opt_state)),
                                done, ci)
                if metrics_fh:
                    import json

                    metrics_fh.write(json.dumps({
                        "step": done,
                        "loss": float(losses[-1]),
                        "loss_mean": float(losses.mean()),
                        "loss_min": float(losses.min()),
                        "iters_per_sec": round(chunk_len / chunk_timer.elapsed, 1),
                    }) + "\n")
                    metrics_fh.flush()
        finally:
            if profile_dir:
                jax.profiler.stop_trace()
            if metrics_fh:
                metrics_fh.close()
        jax.block_until_ready(params)

    loss_history = np.concatenate(losses_out) if losses_out else np.zeros((0,))
    return TrainResult(
        params=params,
        opt_state=opt_state,
        loss_history=loss_history,
        wall_time=t.elapsed,
        iters_per_sec=config.iterations / t.elapsed if t.elapsed else math.inf,
        compile_time=compile_timer.elapsed,
        state=state,
    )
