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
from differential_equations_dnn_tpu.models.stateful import (
    eval_apply,
    train_apply,
    update_state,
)
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
    compile_time: float = 0.0
    state: Any = None           # BatchNorm running stats (stateful models)

    def __repr__(self):
        return (f"SolveResult({self.problem.name}: mae={self.mae:.4g}, "
                f"final_loss={self.loss_history[-1]:.3g}, "
                f"{self.iters_per_sec:.0f} iters/s)")


def _auto_defaults(problem, model) -> tuple[int, int]:
    """(ensemble, finetune) used when the caller leaves them ``None``.

    * FitzHugh–Nagumo DGM arch: with the default CAUSAL residual
      weighting (``causal_eps > 0``, equations/fitzhugh_nagumo.py) a
      SINGLE run beats the reference's published 0.0088 on every seed
      tested (round-3 TPU measurement: MAE 0.0024-0.0060 over 15 runs at
      ε ∈ {1, 5, 20}) — no ensemble needed. The round-2 multi-start
      (16 replicas + top-3 L-BFGS polish, MAE 0.0024-0.0048 at ~65x the
      cost) remains available explicitly and is the auto fallback when
      causal weighting is turned OFF (``causal_eps=0`` reproduces the
      reference's multi-stable training, single-seed MAE ∈ [0.005, 0.76]).
    * Everything else — including Fredholm since its default moved to
      lr 3e-3 + cosine (the reference's lr 1e-4 underfits the 3k budget;
      the tuned default's single unpolished run lands MAE 0.0008-0.0024
      over 10 seeds vs the reference's 0.0134, so the round-2 auto
      L-BFGS polish is retired) — trains reliably from one seed,
      unpolished."""
    if model is not None:
        return 0, 0
    if (problem.name == "fitzhugh_nagumo"
            and getattr(problem, "arch", None) == "dgm"
            and getattr(problem, "causal_eps", 0.0) <= 0.0):
        return 16, 200
    return 0, 0


def _polish_and_select(problem, model, stacked, val_losses, seed, steps,
                       top_k: int = 3):
    """L-BFGS-polish the ``top_k`` ensemble candidates (by pre-polish
    validation residual) and keep the one with the lowest residual on a
    FRESH off-grid batch. Returns (picked index, params, polish losses)."""
    from differential_equations_dnn_tpu.train import finetune_lbfgs

    import jax.numpy as jnp

    order = np.argsort(np.where(np.isfinite(val_losses), val_losses, np.inf))
    fresh = problem.validation_sample(jax.random.key(seed + 4), 4096)
    # Selection metric = the PLAIN mean residual (point_loss), not
    # problem.loss: training protocols like FN's causal weighting would
    # otherwise discount late-time divergence out of the selection score.
    select = jax.jit(
        lambda p: jnp.mean(problem.point_loss(model.apply, p, fresh)))
    best = None
    for i in order[: min(top_k, len(order))]:
        p = jax.tree.map(lambda a: a[int(i)], stacked)
        polished, fl = finetune_lbfgs(problem, p, jax.random.key(seed + 3),
                                      steps=steps, batch_size=8192,
                                      model=model)
        r = float(select(polished))
        if best is None or r < best[0]:
            best = (r, int(i), polished, fl)
    return best[1], best[2], best[3]


def _fused_route(problem, model, batch_size) -> str:
    """Which fused engine serves (problem, model): "heat" (the specialised
    tuned kernel, kernels.fused_train), "dgm" (kernels.fused_dgm) or
    "engine" (the generic spec engine, kernels.fused_engine). The single
    source of truth for fused dispatch — solve() and the CLI both consume
    the returned route.

    Raises an error naming the engine whose requirements ALMOST matched —
    a combo that just misses the DGM engine's conditions (fitzhugh_nagumo
    fourier_mlp arch, fredholm montecarlo quadrature) must not fall through
    to the generic MLP engine and surface ITS error, which never mentions
    the condition that actually failed."""
    from differential_equations_dnn_tpu.kernels import fused_dgm, fused_engine

    if type(model).__name__ == "HardConstraint":
        # heat/wave/poisson hard constraints have interior-only fused specs
        # (the analytic ansatz derivatives compose in the spec loss);
        # other ansatz-wrapped models train on the scan engine.
        if (fused_engine.spec_for(problem) is not None
                and fused_engine.supports(problem, model)):
            return "engine"
        raise ValueError(
            f"{problem.name!r} with constraint='hard' trains on the scan "
            f"engine (fused hard-constraint specs exist for "
            f"{sorted(fused_engine.HARD_SPECS)} with the default ansatz + "
            f"plain tanh MLP)")
    dgm_spec = fused_dgm.spec_for(problem, batch_size)
    if dgm_spec is not None:
        if fused_dgm.supports(problem, model, batch_size):
            return "dgm"
        raise ValueError(
            f"{problem.name!r}'s fused path is the DGM engine, which needs "
            f"a DGM model with {dgm_spec.act!r} gates (got "
            f"{type(model).__name__}); pass model=None for the default, or "
            f"use engine='scan'")
    if problem.name == "fredholm":
        raise ValueError(
            "fredholm's fused path is the DGM engine, which needs "
            "quadrature='gauss' (the montecarlo mode draws fresh nodes per "
            "step — compile-time node scalars are impossible); drop "
            "quadrature='montecarlo' or use engine='scan'")
    if problem.name == "fitzhugh_nagumo":
        raise ValueError(
            "fitzhugh_nagumo's fused path is the DGM engine, which needs "
            "arch='dgm' (the fourier_mlp arch trains on the scan engine); "
            "drop arch= or use engine='scan'")
    if fused_engine.spec_for(problem) is None:
        raise ValueError(
            f"no fused-engine spec for equation {problem.name!r} "
            f"(available: {sorted(fused_engine.SPECS)}); use engine='scan'")
    if not fused_engine.supports(problem, model):
        raise ValueError(
            f"{problem.name!r}'s fused path is the generic MLP engine, "
            f"which needs a plain tanh MLP (no BatchNorm, no Fourier "
            f"features; got {type(model).__name__}); use engine='scan'")
    if problem.name == "heat":
        return "heat"  # soft-constraint heat: the specialised tuned kernel
    return "engine"


def solve(equation: str | Problem, *, iterations: int | None = None,
          batch_size: int | None = None, lrate: float | None = None,
          nodes: int | None = None, seed: int = 0, model=None, mesh=None,
          ensemble: int | None = None, finetune: int | None = None,
          engine: str = "scan", precision: str = "highest",
          schedule: str | None = None, verbose: bool = False,
          **problem_kwargs) -> SolveResult:
    """Train a network on ``equation`` and validate against its ground truth.

    ``equation`` is a registry name ("simple_ode", "heat", "fredholm",
    "fitzhugh_nagumo", "uat") or a Problem instance. Unset hyperparameters
    default to the reference's published configuration for that equation.

    ``ensemble=N`` trains N independently-initialised replicas — as ONE
    vmapped population on the scan engine (shardable over a 'pop' mesh
    axis), or on the fused engine as N dispatches of ONE AOT-compiled
    Mosaic kernel (``mesh=None``; compiles in seconds vs. minutes for a
    wide vmapped program) or as shard_map'd per-replica kernels over the
    mesh's 'pop' axis (``mesh=make_mesh({'pop': N})``) — and returns the
    replica with the lowest off-grid validation residual. ``finetune=N``
    polishes with N full-batch L-BFGS steps. Both default to ``None`` =
    automatic: single-shot without polish for almost everything —
    FitzHugh–Nagumo's causal residual weighting (on by default) makes one
    run beat the reference on every seed tested, so the round-2
    16-replica auto-ensemble now only activates when causal weighting is
    explicitly disabled (``causal_eps=0``). Pass ``0`` to force off.

    Stateful models (BatchNorm MLPs) train on the same path; the trained
    running statistics ride ``SolveResult.state`` and evaluation uses
    eval-mode forwards.

    ``engine`` selects the training executor: "scan" (default) is the
    generic jitted lax.scan trainer; "fused" runs the whole loop inside one
    Pallas kernel (heat via the specialised kernels.fused_train; the other
    MLP equations — wave, poisson, heat2d, burgers, simple_ode, volterra,
    plus uat's Perceptron and inverse_heat's net + learnable κ̂ —
    via the generic kernels.fused_engine; the DGM-architecture equations —
    fitzhugh_nagumo dgm arch, fredholm gauss — via kernels.fused_dgm with
    a hand-derived VJP of the gate recurrence; heat/wave/poisson with
    ``constraint="hard"`` via interior-only hard-constraint specs that
    compose the analytic ansatz derivatives — FEWER streams than soft, so
    the hard fused path is also the fastest). For the fused engine,
    ``precision`` picks the MXU mode: "highest" (exact fp32, default),
    "default" (bf16 in / fp32 accumulate, fastest, ~10x MAE), or "mixed"
    (bf16 coarse phase + exact-fp32 final phase chained in ONE dispatch —
    ~1.4x the fp32 throughput at equal-or-better MAE; measured 91-95k it/s,
    MAE 0.0003 vs 63-66k / 0.0007 on the same chip).

    ``schedule`` ("constant" | "cosine" | "exponential") overrides the
    equation's default lr schedule (``problem.defaults.schedule``).
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
        # ``schedule`` overrides the equation's deployment default — e.g.
        # reproducing fredholm's reference protocol needs
        # solve("fredholm", quadrature="montecarlo", lrate=1e-4,
        # schedule="constant") now that its tuned default is cosine.
        schedule=(schedule if schedule is not None
                  else getattr(d, "schedule", "constant")),
        verbose=verbose,
    )
    nodes = nodes if nodes is not None else d.nodes
    if ensemble is None or finetune is None:
        auto_ens, auto_ft = _auto_defaults(problem, model)
        if ensemble is None:
            ensemble = auto_ens
        if finetune is None:
            finetune = auto_ft
    model = model or problem.default_model()

    state = None
    route = (_fused_route(problem, model, config.batch_size)
             if engine == "fused" else None)
    if ensemble > 1 and engine == "fused":
        if mesh is not None:
            # Sharded fused ensemble: replicas distributed over the mesh's
            # 'pop' axis via shard_map, each running its whole training
            # loop inside its own Mosaic kernel (zero cross-replica comms).
            from differential_equations_dnn_tpu.kernels import (
                fused_dgm,
                fused_engine,
            )

            timings = {}
            train_ens = (fused_dgm.train_dgm_fused_ensemble
                         if route == "dgm"
                         else fused_engine.train_fused_ensemble)
            stacked, losses_nr = train_ens(
                problem, jax.random.key(seed), config.iterations, ensemble,
                mesh=mesh, batch_size=config.batch_size, lrate=config.lrate,
                model=model, precision=precision, schedule=config.schedule,
                timings=timings)
            losses = losses_nr.T  # [iters, ensemble] for selection below
            wall_time = timings.get("run_time", 0.0)
            compile_time = timings.get("compile_time", 0.0)
            stacked_state = None
        else:
            # Single-chip fused ensemble: ALL replicas PACKED into every
            # kernel dispatch (replica-stacked state, unrolled per-step
            # replica chains for the Mosaic scheduler to overlap) — one
            # dispatch instead of N, and N independent MXU/VPU chains per
            # step keep the chip fed where tiny sequential programs left
            # it idle (VERDICT r3 #3). Replica r stays equivalent to
            # sequential trial r (same fold_in-keyed inits, shared
            # collocation stream — tested in test_fused_engine/_dgm).
            if route == "dgm":
                from differential_equations_dnn_tpu.kernels import fused_dgm

                train_packed = fused_dgm.train_dgm_fused_ensemble_packed
            else:
                from differential_equations_dnn_tpu.kernels import (
                    fused_engine,
                )

                train_packed = fused_engine.train_fused_ensemble_packed
            timings = {}
            stacked, losses_nr = train_packed(
                problem, jax.random.key(seed), config.iterations, ensemble,
                batch_size=config.batch_size, lrate=config.lrate,
                model=model, precision=precision, schedule=config.schedule,
                timings=timings)
            losses = np.asarray(losses_nr).T
            wall_time = timings.get("run_time", 0.0)
            compile_time = timings.get("compile_time", 0.0)
            stacked_state = None
    elif ensemble > 1:
        import jax.numpy as jnp

        from differential_equations_dnn_tpu.parallel import (
            PopulationConfig,
            train_population,
        )

        pc = PopulationConfig(iterations=config.iterations,
                              max_batch_size=config.batch_size,
                              chunk_size=min(config.iterations, 25_000))
        timings = {}
        stacked, _, losses = train_population(
            problem, model, jax.random.key(seed),
            jnp.full((ensemble,), config.lrate), config=pc, mesh=mesh,
            timings=timings,
        )
        # Select by residual on a dense off-grid validation batch (pure
        # physics, no ground truth): grid-trained trials can zero the loss
        # on their collocation grid while oscillating between grid points.
        stacked_state = timings.get("state")
        wall_time = timings["run_time"]
        compile_time = timings["compile_time"]
    if ensemble > 1:
        val_batch = problem.validation_sample(jax.random.key(seed + 1), 4096)

        def trial_loss(p, s):
            import jax.numpy as jnp

            # Plain mean residual (see _polish_and_select): protocol
            # weightings (causal) must not distort replica selection.
            apply_fn = model.apply if s is None else train_apply(model, s)
            return jnp.mean(problem.point_loss(apply_fn, p, val_batch))

        if stacked_state is None:
            val_losses = jax.jit(jax.vmap(lambda p: trial_loss(p, None)))(stacked)
        else:
            val_losses = jax.jit(jax.vmap(trial_loss))(stacked, stacked_state)
        val_losses = np.asarray(val_losses)
        pick = int(np.argmin(np.where(np.isfinite(val_losses), val_losses,
                                      np.inf)))
        if finetune and stacked_state is None:
            # Polish the top-3 candidates and select POST-polish: which
            # replica polishes best depends on the polish batch, so deciding
            # before polishing leaves accuracy on the table (measured on the
            # FitzHugh-Nagumo DGM arch: pre-polish pick can end 1.6x worse).
            pick, params, ft_losses = _polish_and_select(
                problem, model, stacked, val_losses, seed, finetune)
            loss_history = np.concatenate([losses[:, pick], ft_losses])
            finetune = 0  # already applied
        else:
            params = jax.tree.map(lambda a: a[pick], stacked)
            loss_history = losses[:, pick]
        if stacked_state is not None:
            state = jax.tree.map(lambda a: a[pick], stacked_state)
        # Steady-state ENSEMBLE throughput: population steps per second —
        # the N replicas advance together per counted step on BOTH engines
        # (vmapped concurrently on scan, sequential kernel dispatches on
        # fused), so the two engines' numbers are directly comparable.
        iters_per_sec = config.iterations / wall_time if wall_time else 0.0
    else:
        if engine == "fused":
            if mesh is not None:
                # A single fused run cannot data-shard: splitting its batch
                # over chips would need a cross-chip gradient psum inside
                # every Adam step of the Mosaic program, which contradicts
                # the zero-comms whole-loop-in-one-kernel design. The
                # multi-chip fused options are population-parallel:
                raise ValueError(
                    "a SINGLE fused run is one on-chip Mosaic program and "
                    "cannot shard over a mesh; use ensemble=N with "
                    "mesh=make_mesh({'pop': K}) (sharded fused ensemble — "
                    "kernels.fused_engine.train_fused_ensemble), or "
                    "engine='scan' with mesh=make_mesh({'data': K}) for "
                    "data-parallel single-run training")
            common = dict(batch_size=config.batch_size, lrate=config.lrate,
                          model=model, precision=precision)
            if route == "heat" and config.schedule != "constant":
                # The specialised heat kernel is constant-lr only; a
                # requested decay schedule runs on the generic spec engine
                # (same heat spec, in-kernel schedules) instead of being
                # silently ignored.
                route = "engine"
            if route == "heat":
                from differential_equations_dnn_tpu.kernels.fused_train import (
                    train_heat_fused_result,
                )

                result = train_heat_fused_result(
                    problem, jax.random.key(seed), config.iterations,
                    **common)
            elif route == "dgm":
                # DGM-architecture equations (fitzhugh_nagumo dgm arch,
                # fredholm gauss — kernels.fused_dgm).
                from differential_equations_dnn_tpu.kernels import fused_dgm

                result = fused_dgm.train_dgm_fused_result(
                    problem, jax.random.key(seed), config.iterations,
                    schedule=config.schedule, **common)
            else:
                # Generic spec-driven engine (wave, poisson, heat2d,
                # burgers, simple_ode, volterra, hard-constraint specs —
                # kernels.fused_engine.SPECS / HARD_SPECS).
                from differential_equations_dnn_tpu.kernels.fused_engine import (
                    train_fused_result,
                )

                result = train_fused_result(
                    problem, jax.random.key(seed), config.iterations,
                    schedule=config.schedule, **common)
        elif engine == "scan":
            result = train(problem, jax.random.key(seed), config, model=model,
                           mesh=mesh)
        else:
            raise ValueError(f"unknown engine {engine!r} (scan | fused)")
        params = result.params
        state = result.state
        loss_history = result.loss_history
        iters_per_sec = result.iters_per_sec
        wall_time = result.wall_time
        compile_time = result.compile_time

    if finetune:
        from differential_equations_dnn_tpu.train import finetune_lbfgs

        # key(seed+3): decorrelated from the ensemble-selection batch
        # (key(seed+1)) so the polish set is not the selection set.
        params, ft_losses = finetune_lbfgs(
            problem, params, jax.random.key(seed + 3), steps=finetune,
            model=model, apply_fn=train_apply(model, state))
        loss_history = np.concatenate([loss_history, ft_losses])
        if state is not None:
            # Refresh the running stats for the polished params.
            refresh = problem.validation_sample(jax.random.key(seed + 2), 1024)
            state = update_state(model, params, state,
                                 problem.domain_inputs(refresh))

    apply_fn = eval_apply(model, state)
    solution = problem.evaluate(apply_fn, params, nodes=nodes)
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
        compile_time=compile_time,
        state=state,
    )
