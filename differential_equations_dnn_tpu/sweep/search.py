"""Population hyperparameter search.

Mirrors the reference search space (optimize_heat_ray.py:173-176:
``batch_size ~ randint[1,512)``, ``n_iters ~ randint[1000,50000)``,
``lrate ~ loguniform[1e-4,1e-1]``) and its metric (final training loss,
:157), but executes ALL trials as one vmapped program:

* learning rate   — vmapped scalar per trial
* batch size      — mask over a shared max_batch_size (equations.base)
* n_iters         — every trial runs to the max budget in lock-step; a
                    trial's score is read from the loss history at ITS OWN
                    budget (losses[n_iters_i − 1, i]), so shorter-budget
                    trials are scored exactly as if they had stopped early.

``successive_halving`` is the ASHA role (optimize_heat_ray.py:181): rungs on
the host, survivors re-entered via ``parallel.take_trials`` — at most one
[P]-scalar device→host fetch per rung.
"""

from dataclasses import dataclass, field
from typing import Any

import numpy as np

import jax
import jax.numpy as jnp

from differential_equations_dnn_tpu.parallel.population import (
    PopulationConfig,
    train_population,
    take_trials,
)


# ---- search-space primitives (Ray-Tune-style) -------------------------------

@dataclass(frozen=True)
class loguniform:
    low: float
    high: float

    def sample(self, rng, n):
        return np.exp(rng.uniform(np.log(self.low), np.log(self.high), n))


@dataclass(frozen=True)
class uniform:
    low: float
    high: float

    def sample(self, rng, n):
        return rng.uniform(self.low, self.high, n)


@dataclass(frozen=True)
class randint:
    low: int
    high: int  # exclusive, like ray.tune.randint

    def sample(self, rng, n):
        return rng.integers(self.low, self.high, n)


@dataclass(frozen=True)
class choice:
    values: tuple

    def sample(self, rng, n):
        return np.asarray(self.values)[rng.integers(0, len(self.values), n)]


@dataclass(frozen=True)
class SearchSpace:
    """Named distributions; ``sample(seed, n)`` draws a dict of [n] arrays."""

    specs: dict

    def sample(self, seed: int, n: int) -> dict:
        rng = np.random.default_rng(seed)
        return {name: spec.sample(rng, n) for name, spec in self.specs.items()}


def heat_search_space() -> SearchSpace:
    """The reference's exact space (optimize_heat_ray.py:173-176)."""
    return SearchSpace({
        "batch_size": randint(1, 512),
        "n_iters": randint(1000, 50_000),
        "lrate": loguniform(1e-4, 1e-1),
    })


# ---- results ----------------------------------------------------------------

@dataclass
class SweepResult:
    configs: list            # list of per-trial config dicts
    scores: np.ndarray       # [P] final losses (at each trial's own budget)
    losses: np.ndarray | None  # [iters, P] full loss curves (None if dropped)
    params: Any              # stacked trained params (see param_indices)
    param_indices: np.ndarray | None = None  # trial ids the params stack holds
    best_index: int = field(init=False)

    def __post_init__(self):
        finite = np.where(np.isfinite(self.scores), self.scores, np.inf)
        if self.param_indices is not None:
            # Only trials still holding params (e.g. halving survivors) are
            # eligible — their scores are also the fully-trained ones.
            eligible = np.full_like(finite, np.inf)
            eligible[self.param_indices] = finite[self.param_indices]
            if not np.isfinite(eligible).any():
                # Every param-holding trial diverged (all-NaN final rung):
                # still point at one of THEM — argmin over all-inf would
                # land on index 0, which may be a pruned trial whose
                # params were dropped (best_params() would IndexError).
                self.best_index = int(self.param_indices[0])
                return
            finite = eligible
        self.best_index = int(np.argmin(finite))

    @property
    def best_config(self) -> dict:
        return self.configs[self.best_index]

    @property
    def best_score(self) -> float:
        return float(self.scores[self.best_index])

    def best_params(self):
        """Trained params of the best trial (leading axis of size 1 removed)."""
        if self.param_indices is None:
            pos = self.best_index
        else:
            pos = int(np.where(self.param_indices == self.best_index)[0][0])
        return take_trials(self.params, np.array([pos]))


# ---- bucketed compile tiles for the fused sweep evaluators ------------------

#: Default row-tile rungs for full-space fused sweeps (VERDICT r4 #3): a
#: bs=64 trial through a 512-row executable computes 8x its needed rows, so
#: trials route to the smallest compiled tile >= their batch_size instead.
#: Runtime row masking still applies WITHIN a bucket; each tile is its own
#: AOT-cached executable, built lazily (a sweep that never draws a large bs
#: never compiles the large tile).
BUCKET_TILES = (64, 128, 256, 512)


def _tiles_for(max_bs: int, bucket_tiles, floor: int = 1) -> list[int]:
    """The compile tiles for a sweep capped at ``max_bs``: every bucket rung
    in [floor, top) plus the sublane-rounded top tile itself. ``floor`` is
    the smallest legal tile (e.g. Fredholm's quadrature nodes must fit)."""
    top = max(-(-int(max_bs) // 64) * 64, int(floor))
    return sorted({t for t in bucket_tiles if floor <= t < top} | {top})


def _bucketed(tiles: list[int], make):
    """Lazy per-tile evaluator table: ``make(tile)`` compiles an evaluator
    at that row tile on first use; ``get(bs)`` returns the evaluator of the
    smallest tile >= bs. NOTE the collocation stream is drawn at tile width,
    so a trial's trajectory depends on its bucket (each bucket is exactly
    the unbucketed evaluator compiled at that tile — tested equivalence)."""
    evs: dict[int, Any] = {}

    def get(bs: int):
        tile = next((t for t in tiles if t >= bs), tiles[-1])
        if tile not in evs:
            evs[tile] = make(tile)
        return evs[tile]

    return get


# ---- random search (the reference's 10-sample Optuna run) -------------------

def _clamp_batch_cap(problem, max_batch_size: int) -> int:
    """Clamp the sweep's batch-size ceiling to what the problem's sampler can
    produce per step (fixed-grid samplers cannot exceed their grid — e.g.
    FitzHugh–Nagumo's 200-point grid, the UAT demo's 50-point grid)."""
    cap = problem.max_sample_size
    return int(min(max_batch_size, cap)) if cap else int(max_batch_size)


def random_search(problem, key, num_samples: int = 10, space: SearchSpace | None = None,
                  model=None, seed: int = 0, mesh=None, max_batch_size: int = 512,
                  max_iters: int | None = None, chunk_size: int = 1000) -> SweepResult:
    """Sample ``num_samples`` configs and train them all as one population.

    Scores each trial by its final-loss-at-own-budget, minimised — the
    reference's metric (optimize_heat_ray.py:157,196)."""
    space = space or heat_search_space()
    model = model or problem.default_model()
    max_batch_size = _clamp_batch_cap(problem, max_batch_size)
    draws = space.sample(seed, num_samples)

    lrates = np.asarray(draws.get("lrate", np.full(num_samples, problem.defaults.lrate)),
                        dtype=np.float32)
    batch_sizes = np.asarray(
        draws.get("batch_size", np.full(num_samples, problem.defaults.batch_size)),
        dtype=np.int32,
    )
    n_iters = np.asarray(
        draws.get("n_iters", np.full(num_samples, problem.defaults.iterations)),
        dtype=np.int64,
    )
    budget = int(max_iters if max_iters is not None else n_iters.max())
    n_iters = np.minimum(n_iters, budget)
    batch_sizes = np.minimum(batch_sizes, max_batch_size)

    config = PopulationConfig(iterations=budget, max_batch_size=max_batch_size,
                              chunk_size=chunk_size)
    params, _, losses = train_population(
        problem, model, key, jnp.asarray(lrates), jnp.asarray(batch_sizes),
        config=config, mesh=mesh,
    )
    scores = losses[n_iters - 1, np.arange(num_samples)]
    configs = [
        {"batch_size": int(b), "n_iters": int(i), "lrate": float(l)}
        for b, i, l in zip(batch_sizes, n_iters, lrates)
    ]
    return SweepResult(configs=configs, scores=scores, losses=losses, params=params)


# ---- successive halving (ASHA role) ------------------------------------------

def successive_halving(problem, key, num_samples: int = 27, space: SearchSpace | None = None,
                       model=None, seed: int = 0, mesh=None, eta: int = 3,
                       min_budget: int = 500, max_budget: int | None = None,
                       max_batch_size: int = 512, chunk_size: int = 500,
                       draws: dict | None = None) -> SweepResult:
    """Synchronous successive halving: train the whole population for the
    rung budget, keep the best 1/eta, continue the survivors (with their
    optimizer state) at eta× the budget. Replaces ASHA
    (optimize_heat_ray.py:181) without any worker processes — the reference's
    scheduler was inert anyway since trials reported once (SURVEY §3.5).

    ``draws`` (dict of [num_samples] config arrays) overrides the random
    draws — how ``tpe_halving`` injects model-proposed configs."""
    space = space or heat_search_space()
    model = model or problem.default_model()
    max_batch_size = _clamp_batch_cap(problem, max_batch_size)
    if draws is None:
        draws = space.sample(seed, num_samples)

    lrates = jnp.asarray(draws.get("lrate", np.full(num_samples, problem.defaults.lrate)),
                         dtype=jnp.float32)
    batch_sizes = jnp.asarray(
        np.minimum(
            draws.get("batch_size", np.full(num_samples, problem.defaults.batch_size)),
            max_batch_size,
        ),
        dtype=jnp.int32,
    )
    max_budget = int(max_budget or problem.defaults.iterations)
    if eta < 2:
        # keep = len(alive)//eta would never prune and budget*eta never
        # grow — the rung loop would spin forever (eta=0: ZeroDivision).
        raise ValueError(f"halving needs eta >= 2 (got {eta})")
    min_budget = max(1, min(int(min_budget), max_budget))

    alive = np.arange(num_samples)
    params = opt_state = None
    # A single trial has nothing to prune against — train it to the full
    # budget immediately instead of stopping at the first rung.
    budget = max_budget if num_samples == 1 else int(min_budget)
    spent = 0
    last_scores = np.zeros(num_samples)
    # Per-trial realised budget: the rung at which the trial stopped. The
    # space's n_iters draw is deliberately ignored — the halving scheduler
    # OWNS budget allocation (that is its whole function); configs report
    # the iterations each trial actually trained.
    iters_done = np.zeros(num_samples, dtype=np.int64)
    total_losses = []

    while True:
        config = PopulationConfig(iterations=budget - spent,
                                  max_batch_size=max_batch_size,
                                  chunk_size=chunk_size)
        params, opt_state, losses = train_population(
            problem, model, jax.random.fold_in(key, spent),
            lrates[alive], batch_sizes[alive],
            config=config, mesh=mesh, params=params, opt_state=opt_state,
        )
        total_losses.append(losses)
        rung_scores = losses[-1]
        last_scores[alive] = rung_scores
        spent = budget
        iters_done[alive] = spent
        if budget >= max_budget or len(alive) <= 1:
            break
        keep = max(1, len(alive) // eta)
        order = np.argsort(np.where(np.isfinite(rung_scores), rung_scores, np.inf))
        survivors = order[:keep]
        alive = alive[survivors]
        params = take_trials(params, survivors)
        opt_state = take_trials(opt_state, survivors)
        budget = min(budget * eta, max_budget)

    configs = [
        {"batch_size": int(batch_sizes[i]), "lrate": float(lrates[i]),
         "n_iters": int(iters_done[i])}
        for i in range(num_samples)
    ]
    # Non-survivors keep their last rung score; survivors their final score.
    return SweepResult(configs=configs, scores=np.asarray(last_scores),
                       losses=None, params=params, param_indices=alive)


# ---- TPE search (the reference's OptunaSearch role) --------------------------

def tpe_search(problem, key, num_samples: int = 10, space: SearchSpace | None = None,
               model=None, seed: int = 0, mesh=None, max_batch_size: int = 512,
               max_iters: int | None = None, chunk_size: int = 1000,
               rounds: int = 3, gamma: float = 0.25) -> SweepResult:
    """Adaptive model-based search: TPE ask/tell on the host between vmapped
    population rounds on device.

    This completes the Ray-Tune replacement — the reference's sweep is
    OptunaSearch (TPE) + ASHA (optimize_heat_ray.py:179-181); ``tpe_search``
    is the TPE half, ``successive_halving`` the ASHA half. ``num_samples``
    trials run in ``rounds`` equal device batches (first batch random
    bootstrap, later batches TPE proposals informed by all previous scores),
    so every round reuses ONE compiled population program.

    Every trial trains to the shared budget (``max_iters`` or the problem's
    reference budget); a trial drawing a smaller ``n_iters`` is scored from
    the loss history at its own budget, exactly like ``random_search``."""
    from differential_equations_dnn_tpu.sweep.tpe import TPESampler

    space = space or heat_search_space()
    model = model or problem.default_model()
    max_batch_size = _clamp_batch_cap(problem, max_batch_size)
    budget = int(max_iters if max_iters is not None
                 else problem.defaults.iterations)

    rounds = max(1, min(rounds, num_samples))
    per_round = -(-num_samples // rounds)  # ceil: equal program shape per round
    sampler = TPESampler(space=space, seed=seed, gamma=gamma,
                         n_initial=per_round)

    pop_config = PopulationConfig(iterations=budget,
                                  max_batch_size=max_batch_size,
                                  chunk_size=chunk_size)
    all_configs: list[dict] = []
    all_scores: list[float] = []
    best_params = None
    best_flat_idx = -1
    best_score = np.inf
    n_done = 0
    r = 0
    while n_done < num_samples:
        proposals = sampler.ask(per_round)
        lrates = jnp.asarray(
            [float(c.get("lrate", problem.defaults.lrate)) for c in proposals],
            dtype=jnp.float32)
        batch_sizes = jnp.asarray(
            [min(int(c.get("batch_size", problem.defaults.batch_size)),
                 max_batch_size) for c in proposals], dtype=jnp.int32)
        n_iters = np.asarray(
            [min(int(c.get("n_iters", budget)), budget) for c in proposals],
            dtype=np.int64)
        params, _, losses = train_population(
            problem, model, jax.random.fold_in(key, r), lrates, batch_sizes,
            config=pop_config, mesh=mesh,
        )
        scores = losses[n_iters - 1, np.arange(per_round)]
        resolved = [
            {"batch_size": int(b), "n_iters": int(i), "lrate": float(l)}
            for b, i, l in zip(batch_sizes, n_iters, lrates)
        ]
        sampler.tell(resolved, scores)
        finite = np.where(np.isfinite(scores), scores, np.inf)
        round_best = int(np.argmin(finite))
        if finite[round_best] < best_score:
            # Retain the GLOBAL best trial's trained params across rounds.
            best_score = float(finite[round_best])
            best_flat_idx = len(all_configs) + round_best
            best_params = take_trials(params, np.array([round_best]))
        all_configs.extend(resolved)
        all_scores.extend(float(s) for s in scores)
        n_done += per_round
        r += 1

    return SweepResult(configs=all_configs, scores=np.asarray(all_scores),
                       losses=None, params=best_params,
                       param_indices=np.array([best_flat_idx]))


def tpe_search_fused(problem, key, num_samples: int = 16, seed: int = 0,
                     model=None, space: SearchSpace | None = None,
                     max_iters: int | None = None,
                     batch_size: int | None = None,
                     max_batch_size: int = 512,
                     gamma: float = 0.25,
                     schedule: str | None = None,
                     q: int = 1,
                     bucket_tiles=BUCKET_TILES) -> SweepResult:
    """TPE with every proposal trained inside the fused Pallas kernel
    through ONE compiled executable.

    The FULL reference space (optimize_heat_ray.py:173-176) is supported:
    lr is a runtime SMEM scalar, batch_size masks rows ≥ bs out of the
    loss at runtime (iota mask over a max-batch tile, as the population
    path does), and n_iters freezes every later step in-kernel, so a
    trial's returned loss is exactly its own-budget final loss
    (kernels.fused_engine.make_sweep_evaluator). This trades the vmapped
    population's concurrency for full-budget, sequentially-informed
    proposals: TPE sees every completed trial before proposing the next
    (the vmapped ``tpe_search`` gets feedback only between rounds).

    lr-only spaces route through the leaner fixed-shape evaluator
    (make_lr_evaluator / the DGM engine's make_trial_evaluator). Both
    engines support the full space: the DGM engine compiles at a
    max-batch tile and masks collocation rows >= bs at runtime
    (fused_dgm.make_sweep_evaluator — FN sweeps evaluate the reference
    protocol; Fredholm needs its quadrature nodes to fit the tile).

    ``schedule`` sets the per-trial lr schedule. ``None`` (default): lr-
    only sweeps inherit the equation's deployment schedule
    (``problem.defaults.schedule`` — a selected lr transfers to solve());
    spaces with a per-trial n_iters default to "constant", the
    reference's fixed-lr Optuna protocol. Pass "cosine"/"exponential"
    explicitly to decay over each trial's own n_iters via the runtime
    in-kernel horizon.

    ``q`` (default 1) proposes q trials per TPE round and trains each
    round as ONE packed Mosaic dispatch — the reference's
    ``ConcurrencyLimiter(max_concurrent=5)`` role
    (optimize_heat_ray.py:180) made MXU-filling instead of
    process-parallel; see :func:`_tpe_fused_batched`.

    ``bucket_tiles``: full-space sweeps compile one executable per row
    tile in this ladder and route each trial to the smallest tile >= its
    batch_size (lazily — unused tiles never compile), keeping the runtime
    row mask within the bucket (VERDICT r4 #3: one 512-row executable
    made a bs=64 trial compute 8x its needed rows). A trial's collocation
    stream is drawn at its bucket's width, so each bucket reproduces the
    unbucketed evaluator compiled at that tile exactly."""
    from differential_equations_dnn_tpu.kernels import fused_dgm, fused_engine
    from differential_equations_dnn_tpu.sweep.tpe import TPESampler

    space = space or SearchSpace({"lrate": loguniform(1e-4, 1e-1)})
    names = set(space.specs)
    if not names <= {"lrate", "batch_size", "n_iters"}:
        raise ValueError("tpe_search_fused sweeps lrate/batch_size/"
                         f"n_iters (got {sorted(names)})")
    model = model or problem.default_model()
    bs = int(batch_size if batch_size is not None
             else problem.defaults.batch_size)
    lr_only = names == {"lrate"}
    nspec = space.specs.get("n_iters")
    budget = int(max_iters if max_iters is not None
                 else (nspec.high - 1 if isinstance(nspec, randint)
                       else problem.defaults.iterations))
    if not lr_only and schedule is None:
        schedule = "constant"
    if q < 1:
        raise ValueError(f"q (concurrent proposals) must be >= 1 (got {q})")
    if q > 1:
        return _tpe_fused_batched(problem, key, num_samples, seed, model,
                                  space, budget, bs, max_batch_size, gamma,
                                  schedule, q, bucket_tiles)

    if lr_only and fused_dgm.supports(problem, model, bs):
        _ev = fused_dgm.make_trial_evaluator(problem, key, budget,
                                             batch_size=bs, model=model,
                                             schedule=schedule)
        eval_fn = lambda t, c: _ev(t, float(c["lrate"]))
        resolve = lambda c: {"lrate": float(c["lrate"]), "n_iters": budget,
                             "batch_size": bs}
        unpack_params = lambda m, fl: fused_dgm.unpack_dgm(fl)
    elif lr_only:
        _ev = fused_engine.make_lr_evaluator(problem, key, budget,
                                             batch_size=bs, model=model,
                                             schedule=schedule)
        eval_fn = lambda t, c: _ev(t, float(c["lrate"]))
        resolve = lambda c: {"lrate": float(c["lrate"]), "n_iters": budget,
                             "batch_size": bs}
        unpack_params = fused_engine.unpack_params
    elif fused_dgm.supports(problem, model, bs):
        if "batch_size" in names:
            # Full reference space on the DGM engine (VERDICT r3 #2):
            # compile once at a sublane-friendly max-batch tile, mask
            # collocation rows >= bs at runtime. FN evaluates the
            # reference protocol (causal is a single-run protocol — see
            # fused_dgm.make_sweep_evaluator); Fredholm's quadrature
            # nodes must fit the tile (k <= compile_bs).
            max_bs = _clamp_batch_cap(problem, max_batch_size)
            bspec = space.specs.get("batch_size")
            if isinstance(bspec, randint):
                max_bs = min(max_bs, bspec.high - 1)
            floor = (-(-problem.k // 64) * 64 if problem.name == "fredholm"
                     else 1)
            tiles = _tiles_for(max_bs, bucket_tiles, floor)
            get_ev = _bucketed(tiles, lambda tile:
                               fused_dgm.make_sweep_evaluator(
                                   problem, key, budget, max_batch=tile,
                                   model=model, schedule=schedule))

            def resolve(c):
                return {"lrate": float(c.get("lrate",
                                             problem.defaults.lrate)),
                        "batch_size": min(int(c.get("batch_size", bs)),
                                          max_bs),
                        "n_iters": min(int(c.get("n_iters", budget)),
                                       budget)}

            eval_fn = lambda t, c: get_ev(c["batch_size"])(
                t, c["lrate"], c["batch_size"], c["n_iters"])
        else:
            _ev = fused_dgm.make_sweep_evaluator(problem, key, budget,
                                                 batch_size=bs, model=model,
                                                 schedule=schedule)

            def resolve(c):
                return {"lrate": float(c.get("lrate",
                                             problem.defaults.lrate)),
                        "batch_size": bs,
                        "n_iters": min(int(c.get("n_iters", budget)),
                                       budget)}

            eval_fn = lambda t, c: _ev(t, c["lrate"], c["n_iters"])
        unpack_params = lambda m, fl: fused_dgm.unpack_dgm(fl)
    else:
        max_bs = _clamp_batch_cap(problem, max_batch_size)
        bspec = space.specs.get("batch_size")
        if isinstance(bspec, randint):
            max_bs = min(max_bs, bspec.high - 1)
        # Bucketed sublane-friendly tiles (multiples of 64): trials clamp
        # to max_bs, route to the smallest tile >= their bs, and the
        # runtime row mask covers the remainder within the bucket.
        # The default schedule="constant" mirrors the reference's sweep
        # protocol (optimize_heat_ray.py trials run fixed-lr Adam);
        # "cosine"/"exponential" decay over each trial's OWN n_iters
        # (runtime horizon in-kernel), so sweeping an equation whose
        # solve() default is cosine can match its deployment schedule.
        tiles = _tiles_for(max_bs, bucket_tiles)
        get_ev = _bucketed(tiles, lambda tile:
                           fused_engine.make_sweep_evaluator(
                               problem, key, budget, max_batch=tile,
                               model=model, schedule=schedule))

        def resolve(c):
            return {"lrate": float(c.get("lrate", problem.defaults.lrate)),
                    "batch_size": min(int(c.get("batch_size", bs)), max_bs),
                    "n_iters": min(int(c.get("n_iters", budget)), budget)}

        eval_fn = lambda t, c: get_ev(c["batch_size"])(
            t, c["lrate"], c["batch_size"], c["n_iters"])
        unpack_params = fused_engine.unpack_params

    sampler = TPESampler(space=space, seed=seed, gamma=gamma,
                         n_initial=min(4, num_samples))
    configs: list[dict] = []
    scores: list[float] = []
    best = None
    for t in range(num_samples):
        config = resolve(sampler.ask(1)[0])
        trial_losses, flat = eval_fn(t, config)
        # Score at the trial's own budget — the reference metric
        # (optimize_heat_ray.py:157: final loss via session.report).
        loss = float(trial_losses[-1])
        sampler.tell([config], [loss])
        configs.append(config)
        scores.append(loss)
        if np.isfinite(loss) and (best is None or loss < best[0]):
            best = (loss, t, flat)
    params = None
    best_idx = int(np.nanargmin(np.where(np.isfinite(scores), scores,
                                         np.inf)))
    if best is not None:
        import jax as _jax

        params = _jax.tree.map(lambda a: a[None],
                               unpack_params(model, best[2]))
    return SweepResult(configs=configs, scores=np.asarray(scores),
                       losses=None, params=params,
                       param_indices=np.array([best_idx]))


def _tpe_fused_batched(problem, key, num_samples, seed, model, space,
                       budget, bs, max_batch_size, gamma, schedule, q,
                       bucket_tiles=BUCKET_TILES):
    """Batched TPE on the packed fused tier (``tpe_search_fused(q>1)``):
    rounds of q concurrent proposals — the reference's
    ``ConcurrencyLimiter(max_concurrent=5)`` role
    (optimize_heat_ray.py:180) — each round trained as packed Mosaic
    dispatches (``make_packed_rung_evaluator``, both engines). Proposals
    within a round share the surrogate state (batched-BO semantics; the
    sampler's forced-diversity radius provides in-batch spread), so
    results differ from q=1's fully-sequential proposals — the trade is
    q× fewer dispatches and q MXU/VPU chains overlapping in-kernel. A
    round's proposals are grouped by bucket tile (smallest compiled tile
    >= each trial's bs — VERDICT r4 #3) and each group is one dispatch;
    unused slots pad with n_iters=0 (pruned in-kernel, ~free)."""
    from differential_equations_dnn_tpu.kernels import fused_dgm, fused_engine
    from differential_equations_dnn_tpu.sweep.tpe import TPESampler

    q = min(q, num_samples)
    has_bs = "batch_size" in space.specs
    max_bs = _clamp_batch_cap(problem, max_batch_size)
    bspec = space.specs.get("batch_size")
    if isinstance(bspec, randint):
        max_bs = min(max_bs, bspec.high - 1)
    cap = max_bs if has_bs else bs
    is_dgm = fused_dgm.supports(problem, model, bs)
    if is_dgm:
        unpack = lambda fl: fused_dgm.unpack_dgm(fl)
        if has_bs:
            floor = (-(-problem.k // 64) * 64
                     if problem.name == "fredholm" else 1)
            tiles = _tiles_for(max_bs, bucket_tiles, floor)
            get_ev = _bucketed(tiles, lambda tile:
                               fused_dgm.make_packed_rung_evaluator(
                                   problem, key, budget, q, batch_size=bs,
                                   max_batch=tile, model=model,
                                   schedule=schedule, horizon="trial"))
        else:
            _ev = fused_dgm.make_packed_rung_evaluator(
                problem, key, budget, q, batch_size=bs, max_batch=None,
                model=model, schedule=schedule, horizon="trial")
            get_ev = lambda bs_: _ev
    else:
        unpack = lambda fl: fused_engine.unpack_params(model, fl)
        tiles = _tiles_for(cap, bucket_tiles if has_bs else ())
        get_ev = _bucketed(tiles, lambda tile:
                           fused_engine.make_packed_rung_evaluator(
                               problem, key, budget, q, max_batch=tile,
                               model=model, schedule=schedule,
                               horizon="trial"))

    def resolve(c):
        return {"lrate": float(c.get("lrate", problem.defaults.lrate)),
                "batch_size": min(int(c.get("batch_size", bs)), cap),
                "n_iters": min(int(c.get("n_iters", budget)), budget)}

    sampler = TPESampler(space=space, seed=seed, gamma=gamma,
                         n_initial=min(4, num_samples))
    configs: list[dict] = []
    scores: list[float] = []
    best = None
    t0 = 0
    while t0 < num_samples:
        n = min(q, num_samples - t0)
        batch = [resolve(c) for c in sampler.ask(n)]
        # Group this round's proposals by their evaluator (bucket tile):
        # same-bucket trials share one packed dispatch.
        groups: dict[int, list[int]] = {}
        for j, c in enumerate(batch):
            groups.setdefault(id(get_ev(c["batch_size"])), []).append(j)
        round_scores = [np.inf] * n
        round_flats = [None] * n
        for js in groups.values():
            ev = get_ev(batch[js[0]]["batch_size"])
            pad = q - len(js)
            finals, stacked = ev(
                [t0 + j for j in js] + [0] * pad,
                [batch[j]["lrate"] for j in js] + [0.0] * pad,
                [batch[j]["batch_size"] for j in js] + [1] * pad,
                [batch[j]["n_iters"] for j in js] + [0] * pad)
            for pos, j in enumerate(js):
                round_scores[j] = float(finals[pos])
                round_flats[j] = tuple(np.asarray(t[pos]) for t in stacked)
        sampler.tell(batch, round_scores)
        for j, (cfg, loss) in enumerate(zip(batch, round_scores)):
            configs.append(cfg)
            scores.append(loss)
            if np.isfinite(loss) and (best is None or loss < best[0]):
                best = (loss, t0 + j, round_flats[j])
        t0 += n
    params = None
    best_idx = int(np.nanargmin(np.where(np.isfinite(scores), scores,
                                         np.inf)))
    if best is not None:
        params = jax.tree.map(lambda a: a[None], unpack(best[2]))
    return SweepResult(configs=configs, scores=np.asarray(scores),
                       losses=None, params=params,
                       param_indices=np.array([best_idx]))


def halving_search_fused(problem, key, num_samples: int = 27, seed: int = 0,
                         space: SearchSpace | None = None, model=None,
                         eta: int = 3, min_budget: int = 500,
                         max_budget: int | None = None,
                         batch_size: int | None = None,
                         max_batch_size: int = 512,
                         schedule: str | None = None,
                         draws: dict | None = None,
                         trial_offset: int = 0,
                         mesh=None,
                         bucket_tiles=BUCKET_TILES) -> SweepResult:
    """Successive halving (the ASHA role) with every rung evaluation inside
    ONE compiled fused Pallas kernel.

    The runtime n_iters step gate prices each rung at its own budget (a
    min_budget rung costs ~min_budget/max_budget of a full trial), and
    shared-stream determinism makes restart == promotion: a survivor
    re-evaluated at eta× the budget trains over exactly the prefix it ran
    at the lower rung (same init fold, same collocation stream), so
    halving-with-restarts reproduces ``successive_halving``'s
    continue-the-survivor semantics without carrying optimizer state
    between rungs. Total kernel work for the geometric rung schedule is
    ≤ eta/(eta−1) × the continuation cost — at fused-kernel speed.

    The space covers {lrate, batch_size} on both engines and on both the
    packed (single-chip) and sharded (mesh) rung evaluators — per-trial
    runtime row masks over a max-batch tile; n_iters is OWNED by the
    rung schedule, exactly as in ``successive_halving``.
    ``schedule`` defaults to "constant" (the reference's fixed-lr
    protocol). Decay schedules keep the identity EXACT too: rung
    evaluations run with the FIXED max_budget decay horizon
    (``horizon="fixed"`` on the evaluators — VERDICT r3 #5), so every
    restart replays the identical lr(t) prefix and the winner's final
    rung equals a standalone max_budget run of that schedule. (The
    tpe-fused evaluators use per-trial horizons instead — there each
    trial's n_iters is a hyperparameter, not a rung checkpoint.)

    ``draws`` (dict of [num_samples] config arrays) overrides the random
    draws — how ``tpe_halving_fused`` injects model-proposed configs;
    ``trial_offset`` shifts the init fold indices so successive brackets
    get independent initialisations through the same executable.

    ``mesh`` (a 'pop'-axis mesh, MLP engine only) evaluates each rung's
    surviving trials in ONE sharded dispatch
    (``fused_engine.make_sharded_rung_evaluator``) — rungs pad to a
    multiple of the axis size by repeating trials, and results are
    bit-identical to the sequential path (same init folds, same
    stream)."""
    from differential_equations_dnn_tpu.kernels import fused_dgm, fused_engine

    model = model or problem.default_model()
    bs = int(batch_size if batch_size is not None
             else problem.defaults.batch_size)
    max_budget = int(max_budget or problem.defaults.iterations)
    if eta < 2:
        raise ValueError(f"halving needs eta >= 2 (got {eta})")
    min_budget = max(1, min(int(min_budget), max_budget))
    schedule = schedule or "constant"

    sharded_ev = None
    packed_ev = None
    if fused_dgm.supports(problem, model, bs):
        space = space or SearchSpace({"lrate": loguniform(1e-4, 1e-1)})
        if not set(space.specs) <= {"lrate", "batch_size"}:
            raise ValueError(
                "halving_search_fused sweeps lrate/batch_size; n_iters is "
                f"owned by the rung schedule (got {sorted(space.specs)})")
        has_bs = "batch_size" in space.specs
        if has_bs:
            # Full {lrate, batch_size} rungs on the DGM engine: per-slot
            # runtime row masks (FN slots evaluate the reference
            # protocol; Fredholm's quadrature nodes must fit the compile
            # tile — see fused_dgm.make_sweep_evaluator).
            max_bs = _clamp_batch_cap(problem, max_batch_size)
            bspec = space.specs.get("batch_size")
            if isinstance(bspec, randint):
                max_bs = min(max_bs, bspec.high - 1)
            compile_bs = -(-max_bs // 64) * 64
            if problem.name == "fredholm":
                compile_bs = max(compile_bs, -(-problem.k // 64) * 64)
        else:
            max_bs = bs
            compile_bs = None
        if mesh is not None:
            sharded_ev = fused_dgm.make_sharded_rung_evaluator(
                problem, key, max_budget, mesh, batch_size=bs,
                max_batch=compile_bs, model=model, schedule=schedule,
                horizon="fixed")
            if not has_bs:
                _shev = sharded_ev
                sharded_ev = lambda idx, lrs, bss, ns: _shev(idx, lrs, ns)
            eval_fn = None
        else:
            # Single-chip rungs run PACKED (one dispatch per rung and
            # bucket tile, per-slot lr/bs/n_iters runtime vectors —
            # VERDICT r3 #3; tiles per r4 #3).
            if has_bs:
                floor = (-(-problem.k // 64) * 64
                         if problem.name == "fredholm" else 1)
                tiles = _tiles_for(max_bs, bucket_tiles, floor)
                packed_ev = _bucketed(tiles, lambda tile:
                                      fused_dgm.make_packed_rung_evaluator(
                                          problem, key, max_budget,
                                          num_samples, batch_size=bs,
                                          max_batch=tile, model=model,
                                          schedule=schedule,
                                          horizon="fixed"))
            else:
                _pev = fused_dgm.make_packed_rung_evaluator(
                    problem, key, max_budget, num_samples,
                    batch_size=bs, max_batch=None, model=model,
                    schedule=schedule, horizon="fixed")
                packed_ev = lambda bs_: _pev
            eval_fn = None
        unpack = lambda stacked: fused_dgm.unpack_dgm(stacked)
    else:
        space = space or SearchSpace({"lrate": loguniform(1e-4, 1e-1),
                                      "batch_size": randint(1, 512)})
        if not set(space.specs) <= {"lrate", "batch_size"}:
            raise ValueError(
                "halving_search_fused sweeps lrate/batch_size; n_iters is "
                f"owned by the rung schedule (got {sorted(space.specs)})")
        max_bs = _clamp_batch_cap(problem, max_batch_size)
        bspec = space.specs.get("batch_size")
        if isinstance(bspec, randint):
            max_bs = min(max_bs, bspec.high - 1)
        compile_bs = -(-max_bs // 64) * 64
        if mesh is not None:
            sharded_ev = fused_engine.make_sharded_rung_evaluator(
                problem, key, max_budget, mesh, max_batch=compile_bs,
                model=model, schedule=schedule, horizon="fixed")
            eval_fn = None
        else:
            # Single-chip rungs run PACKED: every rung is one dispatch per
            # bucket tile with per-slot lr/bs/n_iters runtime vectors —
            # pruned slots gate to zero steps (VERDICT r3 #3; bucketed
            # tiles per r4 #3 — trials pay their own row tile).
            tiles = _tiles_for(max_bs, bucket_tiles)
            packed_ev = _bucketed(tiles, lambda tile:
                                  fused_engine.make_packed_rung_evaluator(
                                      problem, key, max_budget, num_samples,
                                      max_batch=tile, model=model,
                                      schedule=schedule, horizon="fixed"))
            eval_fn = None
        unpack = lambda stacked: fused_engine.unpack_params(model, stacked)

    if draws is None:
        draws = space.sample(seed, num_samples)
    lrates = np.asarray(
        draws.get("lrate", np.full(num_samples, problem.defaults.lrate)),
        np.float64)
    batch_sizes = np.minimum(
        np.asarray(draws.get("batch_size", np.full(num_samples, bs)),
                   np.int64), max_bs)

    alive = np.arange(num_samples)
    # A single trial has nothing to prune against — train it to the full
    # budget immediately (also reached via tpe_halving_fused brackets of 1).
    budget = max_budget if num_samples == 1 else min_budget
    last_scores = np.zeros(num_samples)
    iters_done = np.zeros(num_samples, dtype=np.int64)
    flats: dict[int, tuple] = {}
    def eval_rung(alive, budget):
        if packed_ev is not None:
            # The rung as one packed dispatch PER BUCKET TILE: a trial's
            # tile is fixed by its bs across rungs (so restart ==
            # promotion holds bucket-locally); dead slots train 0 steps
            # in-kernel, live ones their rung budget.
            groups: dict[int, list[int]] = {}
            for t in alive:
                groups.setdefault(id(packed_ev(int(batch_sizes[t]))),
                                  []).append(int(t))
            for members in groups.values():
                pev = packed_ev(int(batch_sizes[members[0]]))
                ns = np.zeros(num_samples, np.int64)
                ns[members] = budget
                finals, flat_out = pev(
                    np.arange(num_samples) + trial_offset, lrates,
                    batch_sizes, ns)
                for t in members:
                    last_scores[t] = float(finals[t])
                    flats[int(t)] = tuple(np.asarray(f[t])
                                          for f in flat_out)
            return
        if sharded_ev is None:
            for t in alive:
                losses, flat = eval_fn(int(t) + trial_offset,
                                       float(lrates[t]),
                                       int(batch_sizes[t]), int(budget))
                last_scores[t] = float(losses[-1])
                flats[int(t)] = flat
            return
        idx = [int(t) for t in alive]
        pad = (-len(idx)) % mesh.shape["pop"]
        idx_p = idx + [idx[-1]] * pad  # duplicates cost their gated budget
        finals, flat_out = sharded_ev(
            [t + trial_offset for t in idx_p],
            [float(lrates[t]) for t in idx_p],
            [int(batch_sizes[t]) for t in idx_p],
            [int(budget)] * len(idx_p))
        for pos, t in enumerate(idx):
            last_scores[t] = float(finals[pos])
            flats[t] = tuple(f[pos] for f in flat_out)

    while True:
        eval_rung(alive, budget)
        iters_done[alive] = budget
        if budget >= max_budget or len(alive) <= 1:
            break
        keep = max(1, len(alive) // eta)
        rung = last_scores[alive]
        order = np.argsort(np.where(np.isfinite(rung), rung, np.inf))
        alive = alive[order[:keep]]
        budget = min(budget * eta, max_budget)
        if len(alive) == 1:
            # The lone survivor gets the whole remaining budget (a rung
            # with nothing left to prune has no reason to stop short).
            budget = max_budget

    n_tensors = len(flats[int(alive[0])])
    stacked = tuple(jnp.stack([flats[int(t)][k] for t in alive])
                    for k in range(n_tensors))
    params = unpack(stacked)
    configs = [
        {"batch_size": int(batch_sizes[i]), "lrate": float(lrates[i]),
         "n_iters": int(iters_done[i])}
        for i in range(num_samples)
    ]
    return SweepResult(configs=configs, scores=np.asarray(last_scores),
                       losses=None, params=params, param_indices=alive)


def _tpe_brackets(space, seed: int, gamma: float, brackets: int,
                  num_samples: int, inner) -> SweepResult:
    """Shared TPE×halving bracket driver (tpe_halving / tpe_halving_fused):
    ``inner(bracket_index, per_bracket, draws) -> SweepResult`` runs one
    halving bracket on the proposed configs; the sampler is told every
    trial's realised (config, score) — dropped trials report their last
    rung score at their realised budget — and the best fully-trained
    trial across brackets wins."""
    from differential_equations_dnn_tpu.sweep.tpe import TPESampler

    brackets = max(1, min(brackets, num_samples))
    per_bracket = -(-num_samples // brackets)
    sampler = TPESampler(space=space, seed=seed, gamma=gamma,
                         n_initial=per_bracket)

    all_configs: list[dict] = []
    all_scores: list[float] = []
    best_params = None
    best_flat_idx = -1
    best_score = np.inf
    res = None
    for b in range(brackets):
        proposals = sampler.ask(per_bracket)
        draws = {name: np.asarray([c[name] for c in proposals])
                 for name in space.specs}
        res = inner(b, per_bracket, draws)
        sampler.tell(res.configs, res.scores)
        finite = np.where(np.isfinite(res.scores), res.scores, np.inf)
        eligible = np.full_like(finite, np.inf)
        eligible[res.param_indices] = finite[res.param_indices]
        b_best = int(np.argmin(eligible))
        if eligible[b_best] < best_score:
            best_score = float(eligible[b_best])
            best_flat_idx = len(all_configs) + b_best
            best_params = res.best_params()
        all_configs.extend(res.configs)
        all_scores.extend(float(s) for s in res.scores)
    if best_params is None:
        # Every bracket's survivors diverged (all-NaN final rungs): fall
        # back to the last bracket's well-defined best so the result is
        # still inspectable instead of crashing downstream.
        best_flat_idx = len(all_configs) - len(res.configs) + res.best_index
        best_params = res.best_params()
    return SweepResult(configs=all_configs, scores=np.asarray(all_scores),
                       losses=None, params=best_params,
                       param_indices=np.array([best_flat_idx]))


def tpe_halving_fused(problem, key, num_samples: int = 27, seed: int = 0,
                      space: SearchSpace | None = None, model=None,
                      eta: int = 3, min_budget: int = 500,
                      max_budget: int | None = None,
                      batch_size: int | None = None,
                      max_batch_size: int = 512,
                      schedule: str | None = None,
                      brackets: int = 3, gamma: float = 0.1,
                      mesh=None, bucket_tiles=BUCKET_TILES) -> SweepResult:
    """The reference's full scheduler pairing (OptunaSearch + ASHA,
    optimize_heat_ray.py:179-181) entirely on the fused tier: TPE proposes
    each bracket's configs, ``halving_search_fused`` prunes them with
    rungs priced in-kernel, and every bracket reuses the SAME compiled
    executable (same key → same stream, ``trial_offset`` keys fresh
    inits), so the whole BOHB-style search costs one compile total.

    The sampler is told every trial's realised (config, score) — dropped
    trials report their last rung score at their realised budget, exactly
    like ``tpe_halving`` on the population tier."""
    model = model or problem.default_model()
    if space is None:
        from differential_equations_dnn_tpu.kernels import fused_dgm

        bs = int(batch_size if batch_size is not None
                 else problem.defaults.batch_size)
        if fused_dgm.supports(problem, model, bs):
            space = SearchSpace({"lrate": loguniform(1e-4, 1e-1)})
        else:
            space = SearchSpace({"lrate": loguniform(1e-4, 1e-1),
                                 "batch_size": randint(1, 512)})

    def inner(b, per_bracket, draws):
        return halving_search_fused(
            problem, key, num_samples=per_bracket, seed=seed + b,
            space=space, model=model, eta=eta, min_budget=min_budget,
            max_budget=max_budget, batch_size=batch_size,
            max_batch_size=max_batch_size, schedule=schedule,
            draws=draws, trial_offset=b * per_bracket, mesh=mesh,
            bucket_tiles=bucket_tiles,
        )

    return _tpe_brackets(space, seed, gamma, brackets, num_samples, inner)


# ---- TPE × successive halving (the reference's full scheduler pairing) ------

def tpe_halving(problem, key, num_samples: int = 27, space: SearchSpace | None = None,
                model=None, seed: int = 0, mesh=None, eta: int = 3,
                min_budget: int = 500, max_budget: int | None = None,
                max_batch_size: int = 512, chunk_size: int = 500,
                brackets: int = 3, gamma: float = 0.1) -> SweepResult:
    """The full Ray-Tune pairing: OptunaSearch (TPE) proposing configs AND
    AsyncHyperBandScheduler (halving) pruning them
    (optimize_heat_ray.py:179-181) — BOHB-style.

    ``brackets`` sequential halving brackets run on device; each bracket's
    population is proposed by the TPE sampler informed by every previous
    bracket's (config, score) observations (the first bracket is the random
    bootstrap). Within a bracket the rung schedule owns budget allocation,
    exactly like ``successive_halving``."""
    space = space or heat_search_space()
    model = model or problem.default_model()
    max_batch_size = _clamp_batch_cap(problem, max_batch_size)

    def inner(b, per_bracket, draws):
        return successive_halving(
            problem, jax.random.fold_in(key, b), num_samples=per_bracket,
            space=space, model=model, seed=seed + b, mesh=mesh, eta=eta,
            min_budget=min_budget, max_budget=max_budget,
            max_batch_size=max_batch_size, chunk_size=chunk_size,
            draws=draws,
        )

    return _tpe_brackets(space, seed, gamma, brackets, num_samples, inner)
