"""Command-line interface.

One entry point with per-equation subcommands, preserving the reference's
flag set exactly (``--solve --plot --savefig --niters --nnodes --batch-size``,
heat.py:191-205) plus framework extensions (``--lrate --seed --checkpoint
--results-dir``), and subcommands for the sweep/ablation drivers
(optimize_heat_ray.py, batchsize_effect_heat.py, batchnorm_effect_heat.py).

Artifact filenames match the reference's ``temp_results/`` layout so existing
downstream tooling keeps working (heat.py:220-225, simple_ode.py:184-186,
fredholm.py:184-185, fitzhugh_nagumo.py:226-227).

Usage:
    python -m differential_equations_dnn_tpu heat --solve --plot --savefig
    python -m differential_equations_dnn_tpu sweep --equation heat --num-samples 10
    python -m differential_equations_dnn_tpu ablation-batchsize
"""

import argparse
import json
from pathlib import Path

import numpy as np

import jax

from differential_equations_dnn_tpu.equations import PROBLEMS
from differential_equations_dnn_tpu.train import TrainConfig, train, save_checkpoint
from differential_equations_dnn_tpu.utils import (
    fn_timer,
    parameters_summary,
    save_array,
    load_array,
)

# (solution, loss, exact, figure) artifact names per equation — reference layout.
ARTIFACTS = {
    "simple_ode": ("test_simple_ode_nn_sol", "test_simple_ode_nn_loss",
                   "test_simple_ode_sol", "figs/simple_ode_solution.pdf"),
    "heat": ("heat_sol_1d_dgm", "heat_sol_1d_dgm_loss",
             "heat_sol_exact_1d", "figs/heat_1dim_solution.pdf"),
    "heat2d": ("heat_sol_2d_dgm", "heat_sol_2d_dgm_loss",
               "heat_sol_exact_2d", "figs/heat_2dim_solution.pdf"),
    "burgers": ("burgers_sol_dgm", "burgers_sol_dgm_loss",
                "burgers_sol_exact", "figs/burgers_solution.pdf"),
    "inverse_heat": ("inverse_heat_sol_dgm", "inverse_heat_sol_dgm_loss",
                     "inverse_heat_sol_exact", "figs/inverse_heat_solution.pdf"),
    "fredholm": ("fredholm_approx", "fredholm_loss",
                 "fredholm_exact", "figs/fredholm_solution.pdf"),
    "fitzhugh_nagumo": ("new_fn_solution_dgm", "new_fn_loss_dgm",
                        "new_fn_solution_exact", "figs/fitzhugh_nagumo_solution.pdf"),
    "uat": ("approximation", "uat_loss", "ground_truth", "figs/universal_approx.pdf"),
    "wave": ("wave_sol_dgm", "wave_sol_dgm_loss",
             "wave_sol_exact", "figs/wave_solution.pdf"),
    "advection": ("advection_sol_dgm", "advection_sol_dgm_loss",
                  "advection_sol_exact", "figs/advection_solution.pdf"),
    "poisson": ("poisson_sol_dgm", "poisson_sol_dgm_loss",
                "poisson_sol_exact", "figs/poisson_solution.pdf"),
    "volterra": ("volterra_approx", "volterra_loss",
                 "volterra_exact", "figs/volterra_solution.pdf"),
}


def _add_common_flags(p: argparse.ArgumentParser, defaults):
    p.add_argument("--solve", action="store_true")
    p.add_argument("--plot", action="store_true")
    p.add_argument("--savefig", action="store_true")
    p.add_argument("--niters", type=int, default=defaults.iterations)
    p.add_argument("--nnodes", type=int, default=defaults.nodes)
    p.add_argument("--batch-size", type=int, default=defaults.batch_size)
    # default None = sentinel for "not set on the command line": the
    # effective default (problem.defaults.lrate, possibly remapped by
    # --parity) resolves in _cmd_equation AFTER the problem is built —
    # comparing against the parser default by value cannot distinguish an
    # explicit --lrate equal to it.
    p.add_argument("--lrate", type=float, default=None,
                   help=f"default: {defaults.lrate}")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--schedule",
                   choices=["constant", "cosine", "exponential"],
                   default=None,
                   help=f"lr schedule (default: the equation's own, "
                        f"{defaults.schedule}; --parity on fredholm "
                        f"forces constant)")
    p.add_argument("--checkpoint", type=str, default=None,
                   help="save trained params/opt_state to this directory")
    p.add_argument("--restore", type=str, default=None,
                   help="resume training from a checkpoint directory")
    p.add_argument("--export", type=str, default=None, dest="export_path",
                   help="serialise the trained solution (StableHLO via "
                        "jax.export) to this file for serving")
    p.add_argument("--finetune", type=int, default=None,
                   help="polish with N full-batch L-BFGS steps after Adam "
                        "(~2-3x lower MAE; try 200). Default: auto — 200 "
                        "for the init-sensitive fitzhugh-nagumo DGM arch, "
                        "off otherwise; pass 0 to force off")
    p.add_argument("--results-dir", type=str, default="temp_results")
    p.add_argument("--mesh", type=int, default=0,
                   help="shard the collocation batch over N devices (0 = off)")
    p.add_argument("--ensemble", type=int, default=None,
                   help="train N replicas as one vmapped population and keep "
                        "the best by off-grid validation residual (default: "
                        "auto — 16 for the init-sensitive fitzhugh-nagumo "
                        "DGM arch, single run otherwise; pass 1 to force "
                        "single)")
    p.add_argument("--platform", type=str, default=None,
                   help="force a JAX platform (e.g. 'cpu') before any "
                        "computation")


@fn_timer
def _solve(problem, args):
    if getattr(args, "ensemble", 0) and args.ensemble > 1:
        return _solve_ensemble(problem, args)
    config = TrainConfig(iterations=args.niters, batch_size=args.batch_size,
                         lrate=args.lrate,
                         schedule=(getattr(args, "schedule", None)
                                   or problem.defaults.schedule))
    mesh = None
    if args.mesh:
        from differential_equations_dnn_tpu.parallel import make_mesh

        mesh = make_mesh({"data": args.mesh})
    model = problem.default_model()
    fused = getattr(args, "engine", "scan") == "fused"
    if fused and args.mesh:
        raise SystemExit("--engine fused is single-chip (use the default "
                         "scan engine with --mesh)")
    route = None
    if fused:
        from differential_equations_dnn_tpu.api import _fused_route

        try:
            route = _fused_route(problem, model, args.batch_size)
        except ValueError as e:
            raise SystemExit(str(e)) from None
    params = opt_state = state = None
    start_step = 0
    if args.restore:
        from differential_equations_dnn_tpu.train import (
            checkpoint_like,
            restore_checkpoint,
        )

        # ``like`` makes orbax restore with the training dtypes/shardings
        # instead of falling back to host numpy.
        like = checkpoint_like(problem, config, model=model, seed=args.seed,
                               engine="fused" if fused else "scan")
        ckpt = restore_checkpoint(args.restore, like=like)
        params, opt_state = ckpt["params"], ckpt["opt_state"]
        state = ckpt.get("state")
        start_step = int(ckpt["step"])
        if int(ckpt["seed"]) != args.seed:
            # The collocation stream is keyed by the seed; resuming under a
            # different one would silently change the trajectory.
            print(f"[restore] checkpoint was trained with --seed "
                  f"{int(ckpt['seed'])}; using it instead of {args.seed}")
            args.seed = int(ckpt["seed"])
        print(f"Restored checkpoint at step {start_step} from {args.restore}")
    if fused:
        # Dispatch by the route api._fused_route already validated — the
        # single source of truth for fused engine selection.
        common = dict(batch_size=args.batch_size, lrate=args.lrate,
                      model=model, params=params, opt_state=opt_state,
                      start_step=start_step,
                      precision=getattr(args, "precision", "highest"))
        if route == "heat" and config.schedule != "constant":
            # The specialised heat kernel is constant-lr only; a requested
            # decay schedule runs on the generic spec engine instead.
            route = "engine"
        if route == "heat":
            from differential_equations_dnn_tpu.kernels.fused_train import (
                train_heat_fused_result as _fused,
            )

            result = _fused(problem, jax.random.key(args.seed), args.niters,
                            **common)
        elif route == "dgm":
            from differential_equations_dnn_tpu.kernels import fused_dgm

            result = fused_dgm.train_dgm_fused_result(
                problem, jax.random.key(args.seed), args.niters,
                schedule=config.schedule, **common)
        else:
            from differential_equations_dnn_tpu.kernels.fused_engine import (
                train_fused_result,
            )

            result = train_fused_result(
                problem, jax.random.key(args.seed), args.niters,
                schedule=config.schedule, **common)
    else:
        result = train(problem, jax.random.key(args.seed), config, mesh=mesh,
                       model=model, params=params, opt_state=opt_state,
                       state=state, start_step=start_step)
    if getattr(args, "finetune", 0):
        from differential_equations_dnn_tpu.models import train_apply
        from differential_equations_dnn_tpu.train import finetune_lbfgs

        result.params, ft_losses = finetune_lbfgs(
            problem, result.params, jax.random.key(args.seed + 1),
            steps=args.finetune, model=model,
            apply_fn=train_apply(model, result.state))
        result.loss_history = np.concatenate([result.loss_history, ft_losses])
        print(f"[{problem.name}] L-BFGS finetune: loss "
              f"{ft_losses[0]:.3e} -> {ft_losses[-1]:.3e}")
    from differential_equations_dnn_tpu.models import eval_apply

    y_approx = problem.evaluate(eval_apply(model, result.state), result.params,
                                nodes=args.nnodes)
    y_exact = problem.exact(args.nnodes)

    sol_name, loss_name, exact_name, _ = ARTIFACTS[problem.name]
    save_array(sol_name, y_approx, directory=args.results_dir)
    save_array(loss_name, result.loss_history, directory=args.results_dir)
    save_array(exact_name, y_exact, directory=args.results_dir)
    if problem.name == "uat":
        # Reference also saves the evaluation grid
        # (demo_universal_approx_theorem.py:89: np.save("space", x0)).
        save_array("space", problem.grid_inputs(args.nnodes),
                   directory=args.results_dir)

    if args.checkpoint:
        # Full optimisation state: resuming continues BIT-identically to an
        # uninterrupted run (Adam moments included; the step-keyed
        # collocation stream makes the data identical too).
        tree = {"params": result.params,
                "opt_state": result.opt_state,
                "step": np.asarray(start_step + args.niters, np.int64),
                "seed": np.asarray(args.seed, np.int64)}
        if result.state is not None:
            tree["state"] = result.state
        save_checkpoint(args.checkpoint, tree)
    if args.export_path:
        from differential_equations_dnn_tpu.serving import export_solution

        export_solution(eval_apply(model, result.state), result.params,
                        input_dim=model.input_dim, path=args.export_path)
        print(f"Exported solution artifact to {args.export_path}")
    parameters_summary(
        {"equation": problem.name, "iterations": args.niters,
         "batch_size": args.batch_size, "lrate": args.lrate,
         "schedule": (getattr(args, "schedule", None)
                      or problem.defaults.schedule),
         "engine": getattr(args, "engine", "scan"),
         "precision": getattr(args, "precision", "highest"),
         "nnodes": args.nnodes, "seed": args.seed,
         "iters_per_sec": round(result.iters_per_sec, 1),
         "wall_time_s": round(result.wall_time, 3),
         "compile_time_s": round(result.compile_time, 3),
         "final_loss": result.final_loss},
        args.results_dir, name=f"{problem.name}_run",
    )
    if hasattr(problem, "kappa_error"):
        kappa_hat = float(np.exp(np.asarray(result.params["log_kappa"])))
        print(f"[{problem.name}] identified kappa = {kappa_hat:.4f} "
              f"(true {problem.kappa_true}, |err| "
              f"{problem.kappa_error(result.params):.4f})")
    print(f"[{problem.name}] {result.iters_per_sec:.0f} iters/s, "
          f"final loss {result.final_loss:.3e}")
    return result


def _solve_ensemble(problem, args):
    from differential_equations_dnn_tpu.api import solve as api_solve

    res = api_solve(problem, iterations=args.niters,
                    batch_size=args.batch_size, lrate=args.lrate,
                    nodes=args.nnodes, seed=args.seed, ensemble=args.ensemble,
                    finetune=getattr(args, "finetune", 0),
                    engine=getattr(args, "engine", "scan"),
                    precision=getattr(args, "precision", "highest"),
                    schedule=getattr(args, "schedule", None))
    sol_name, loss_name, exact_name, _ = ARTIFACTS[problem.name]
    save_array(sol_name, res.solution, directory=args.results_dir)
    save_array(loss_name, res.loss_history, directory=args.results_dir)
    save_array(exact_name, res.exact, directory=args.results_dir)
    if args.checkpoint:
        tree = {"params": res.params,
                "step": np.asarray(args.niters, np.int64),
                "seed": np.asarray(args.seed, np.int64)}
        if res.state is not None:
            tree["state"] = res.state
        save_checkpoint(args.checkpoint, tree)
    print(f"[{problem.name}] ensemble={args.ensemble}: best-trial MAE "
          f"{res.mae:.6f}, {res.iters_per_sec:.0f} iters/s (population, "
          f"compile {res.compile_time:.1f}s excluded)")
    return res


def _plot(problem, args):
    from differential_equations_dnn_tpu import viz

    sol_name, loss_name, exact_name, fig_name = ARTIFACTS[problem.name]
    try:
        y_approx = load_array(sol_name, directory=args.results_dir)
        loss = load_array(loss_name, directory=args.results_dir)
        y_exact = load_array(exact_name, directory=args.results_dir)
    except FileNotFoundError as e:
        raise SystemExit(
            f"No saved results for '{problem.name}' in {args.results_dir}/ "
            f"({e.filename}). Run with --solve first."
        ) from e
    savepath = fig_name if args.savefig else None

    if problem.name in ("heat", "inverse_heat", "wave", "poisson",
                        "advection"):
        _, mae = viz.plot_heat(y_exact, y_approx, loss, args.niters,
                               savepath=savepath)
    elif problem.name == "burgers":
        _, mae = viz.plot_heat(y_exact, y_approx, loss, args.niters,
                               savepath=savepath, vmin=None, vmax=None)
    elif problem.name == "heat2d":
        # Plot the mid-time (x, y) slice of the 3-D solution cube.
        mid = y_approx.shape[0] // 2
        _, mae = viz.plot_heat(y_exact[mid], y_approx[mid], loss, args.niters,
                               savepath=savepath)
        from differential_equations_dnn_tpu.train.metrics import mean_absolute_error

        mae = mean_absolute_error(y_exact, y_approx)  # full-cube MAE
    elif problem.name == "fitzhugh_nagumo":
        grid = np.asarray(problem.grid_inputs(len(y_approx)))[:, 0]
        _, mae = viz.plot_fitzhugh_nagumo(grid, y_exact, y_approx, loss,
                                          savepath=savepath)
    else:
        grid = np.asarray(problem.grid_inputs(len(y_approx)))[:, 0]
        _, mae = viz.plot_solution_and_loss(
            grid, y_exact, y_approx, loss, problem.name, savepath=savepath)
    print(f"[{problem.name}] DGM MAE: {np.round(mae, 6)}")
    return mae


def _cmd_equation(name, args):
    problem_cls = PROBLEMS[name]
    extra = {}
    if getattr(args, "constraint", "soft") == "hard":
        extra["constraint"] = "hard"
        if name in ("heat", "heat2d"):
            # Hard constraints wrap the model, so the fused Taylor-stream
            # taps cannot read its MLP structure.
            args.taps = "jvp"
    if name == "fredholm":
        parity = getattr(args, "parity", False)
        if parity:
            # Reference-exact configuration (fredholm.py:142-144): k=50
            # Monte-Carlo quadrature nodes, lr 1e-4, constant schedule.
            # Seed-noisy (MAE 0.011-0.026 straddling the reference's
            # 0.0134); the default Gauss-Legendre quadrature + tuned lr
            # 3e-3 cosine beats it on every seed (worst 0.0024/10 seeds).
            args.quadrature, args.quad_nodes = "montecarlo", 50
        problem = problem_cls(quadrature=args.quadrature, k=args.quad_nodes)
        if parity:
            from dataclasses import replace

            problem = replace(problem, defaults=replace(
                problem.defaults, lrate=1e-4, schedule="constant"))
    elif name == "volterra":
        problem = problem_cls(quadrature=args.quadrature, k=args.quad_nodes)
    elif name == "advection":
        kw = {}
        if getattr(args, "c", None) is not None:
            kw["c"] = args.c
        if getattr(args, "causal_eps", 0.0):
            kw["causal_eps"] = args.causal_eps
        problem = problem_cls(**kw)
    elif name == "fitzhugh_nagumo":
        problem = problem_cls(arch=args.arch, **extra)
    elif name in ("heat", "heat2d"):
        problem = problem_cls(taps=args.taps, **extra)
    else:
        problem = problem_cls(**extra)
    if args.lrate is None:
        # Resolve the sentinel against the FINAL problem (after --parity's
        # defaults remap); an explicit --lrate always survives.
        args.lrate = problem.defaults.lrate
    # Robust defaults (mirrors api._auto_defaults): the FitzHugh-Nagumo DGM
    # arch with causal weighting OFF gets ensemble 16 + top-3 L-BFGS
    # post-polish selection (beats the reference on every seed: MAE
    # 0.0024-0.0048 vs 0.0088). Force off with --ensemble 1 / --finetune 0.
    from differential_equations_dnn_tpu.api import _auto_defaults

    auto_ens, auto_ft = _auto_defaults(problem, None)
    if getattr(args, "ensemble", None) is None:
        args.ensemble = auto_ens
        if args.ensemble:
            print(f"[{name}] arch=dgm is init-sensitive: defaulting to "
                  f"--ensemble {args.ensemble} (pass --ensemble 1 to force "
                  f"a single run)")
    if getattr(args, "finetune", None) is None:
        args.finetune = auto_ft
    if args.solve:
        _solve(problem, args)
    if args.plot:
        _plot(problem, args)
    if not (args.solve or args.plot):
        print("Nothing to do: pass --solve and/or --plot")


def _cmd_sweep(args):
    from differential_equations_dnn_tpu.sweep import (
        halving_search_fused,
        random_search,
        tpe_halving_fused,
        successive_halving,
        tpe_halving,
        tpe_search,
        tpe_search_fused,
    )

    problem = PROBLEMS[args.equation]()
    key = jax.random.key(args.seed)
    mesh = None
    if args.mesh:
        from differential_equations_dnn_tpu.parallel import make_mesh

        mesh = make_mesh({"pop": args.mesh})
    if args.scheduler == "asha":
        result = successive_halving(
            problem, key, num_samples=args.num_samples,
            max_budget=args.max_iters, max_batch_size=args.max_batch_size,
            eta=args.eta, min_budget=args.min_budget, mesh=mesh,
            seed=args.seed,
        )
    elif args.scheduler == "asha-fused":
        # --mesh N shards each rung's trials over a 'pop' mesh (one
        # shard_map dispatch of runtime-gated kernels per rung).
        result = halving_search_fused(
            problem, key, num_samples=args.num_samples,
            max_budget=args.max_iters, max_batch_size=args.max_batch_size,
            eta=args.eta, min_budget=args.min_budget,
            seed=args.seed, schedule=args.lr_schedule, mesh=mesh,
        )
    elif args.scheduler == "tpe-asha-fused":
        result = tpe_halving_fused(
            problem, key, num_samples=args.num_samples,
            max_budget=args.max_iters, max_batch_size=args.max_batch_size,
            eta=args.eta, min_budget=args.min_budget,
            brackets=args.brackets, seed=args.seed,
            schedule=args.lr_schedule, mesh=mesh,
        )
    elif args.scheduler == "tpe":
        result = tpe_search(
            problem, key, num_samples=args.num_samples,
            max_iters=args.max_iters, max_batch_size=args.max_batch_size,
            mesh=mesh, seed=args.seed,
        )
    elif args.scheduler == "tpe-asha":
        result = tpe_halving(
            problem, key, num_samples=args.num_samples,
            max_budget=args.max_iters, max_batch_size=args.max_batch_size,
            eta=args.eta, min_budget=args.min_budget,
            brackets=args.brackets, mesh=mesh, seed=args.seed,
        )
    elif args.scheduler == "tpe-fused":
        if args.mesh:
            raise SystemExit("--scheduler tpe-fused is single-chip")
        space = None  # lr-only default
        if args.space == "full":
            from differential_equations_dnn_tpu.kernels import (
                fused_dgm,
                fused_engine,
            )
            from differential_equations_dnn_tpu.sweep import (
                heat_search_space,
            )

            # The full reference space rides the runtime-masked evaluators
            # on BOTH engines (batch_size = iota row mask, n_iters = step
            # gate, lr = SMEM scalar — one executable per equation).
            if fused_dgm.supports(problem, None,
                                  problem.defaults.batch_size):
                from differential_equations_dnn_tpu.sweep.search import (
                    SearchSpace,
                    loguniform,
                    randint,
                )

                # Derive the budget range from the equation's OWN protocol
                # (the reference's 1000..50000 is heat-specific — it would
                # exclude FN's known-good 150k and compile fredholm's
                # executable at 16x its 3k budget). batch_size spans the
                # reference's randint[1, 512) clamped to the sampler cap.
                it = args.max_iters or problem.defaults.iterations
                space = SearchSpace({
                    "batch_size": randint(1, args.max_batch_size),
                    "n_iters": randint(max(100, it // 10), it + 1),
                    "lrate": loguniform(1e-4, 1e-1),
                })
                print(f"[{args.equation}] DGM fused engine: sweeping the "
                      f"full space — batch_size, lrate, n_iters in "
                      f"[{max(100, it // 10)}, {it}]")
            elif fused_engine.spec_for(problem) is not None:
                space = heat_search_space()
        result = tpe_search_fused(
            problem, key, num_samples=args.num_samples,
            max_iters=args.max_iters, seed=args.seed, space=space,
            max_batch_size=args.max_batch_size,
            schedule=args.lr_schedule, q=args.concurrent,
        )
    else:
        result = random_search(
            problem, key, num_samples=args.num_samples,
            max_iters=args.max_iters, max_batch_size=args.max_batch_size,
            mesh=mesh,
        )
    print("Best config:", json.dumps(result.best_config))
    print(f"Best loss: {result.best_score:.6e}")
    out = Path(args.results_dir)
    out.mkdir(parents=True, exist_ok=True)
    with (out / f"sweep_{args.equation}.json").open("w") as f:
        json.dump({"best_config": result.best_config,
                   "best_score": result.best_score,
                   "configs": result.configs,
                   "scores": result.scores.tolist()}, f, indent=2)
    return result


def _cmd_ablation_batchsize(args):
    from differential_equations_dnn_tpu.sweep import batch_size_effect
    from differential_equations_dnn_tpu import viz

    res = batch_size_effect(key=jax.random.key(args.seed), runs=args.runs,
                            iterations=args.niters)
    for label, curve in zip(res.labels, res.mean_losses):
        save_array(f"heat_loss_bs_{label}", curve, directory=args.results_dir)
    # Reference-compatible pickle (batchsize_effect_heat.py:204-205).
    import pickle

    with (Path(args.results_dir) / "losses.pkl").open("wb") as f:
        pickle.dump({int(l): c for l, c in zip(res.labels, res.mean_losses)}, f)
    savepath = "figs/batchsize_effect.pdf" if args.savefig else None
    viz.plot_ablation(res.as_dict(), savepath=savepath)
    return res


def _cmd_ablation_batchnorm(args):
    from differential_equations_dnn_tpu.sweep import batchnorm_effect
    from differential_equations_dnn_tpu import viz

    res = batchnorm_effect(key=jax.random.key(args.seed), runs=args.runs,
                           iterations=args.niters)
    # Reference artifact names (batchnorm_effect_heat.py:312,330,347).
    names = {"none": "relu_heat_loss_nobn", "pre": "relu_heat_loss_bn_pre",
             "post": "relu_heat_loss_bn_post"}
    for label, curves in zip(res.labels, res.all_losses):
        save_array(names[label], curves, directory=args.results_dir)
    savepath = "figs/batchnorm_effect.pdf" if args.savefig else None
    viz.plot_ablation(res.as_dict(), savepath=savepath)
    return res


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        prog="differential_equations_dnn_tpu",
        description="TPU-native Deep Galerkin solvers for ODEs, PDEs and "
                    "integral equations",
        epilog="-",
    )
    sub = parser.add_subparsers(dest="command", required=True)

    for name in PROBLEMS:
        p = sub.add_parser(name.replace("_", "-"), help=f"solve {name}")
        _add_common_flags(p, PROBLEMS[name]().defaults)
        if name == "fredholm":
            p.add_argument("--quadrature",
                           choices=["montecarlo", "gauss", "halton"],
                           default="gauss",
                           help="integral quadrature (default gauss: beats "
                                "the reference MAE on every seed)")
            p.add_argument("--quad-nodes", type=int, default=50)
            p.add_argument("--parity", action="store_true",
                           help="reference-exact mode: Monte-Carlo "
                                "quadrature with k=50, lr 1e-4, constant "
                                "schedule (fredholm.py:142-144; seed-noisy "
                                "by construction)")
        if name == "heat":
            p.add_argument("--taps", choices=["jvp", "taylor", "pallas"],
                           default="taylor",
                           help="derivative-tap path; taylor = fused stacked "
                                "streams (fastest, default), jvp = generic")
        if name in ("simple_ode", "heat", "burgers", "wave", "poisson",
                    "heat2d", "fitzhugh_nagumo", "fredholm", "volterra",
                    "advection"):
            p.add_argument("--engine", choices=["scan", "fused"],
                           default="scan",
                           help="training executor: scan = generic jitted "
                                "trainer; fused = whole loop in one Pallas "
                                "kernel (1.6-4x faster; heat uses the "
                                "specialised kernel, MLP equations the "
                                "spec-driven fused engine, DGM equations "
                                "the hand-VJP DGM engine)")
            p.add_argument("--precision",
                           choices=["highest", "mixed", "default"],
                           default="highest",
                           help="fused-engine MXU mode: highest = exact "
                                "fp32 (bit-identical resume); mixed = bf16 "
                                "coarse phase + fp32 final phase in one "
                                "dispatch (~1.4x faster, equal-or-better "
                                "MAE); default = bf16 throughout "
                                "(fastest, ~10x MAE)")
        if name == "heat2d":
            p.add_argument("--taps", choices=["jvp", "taylor"],
                           default="taylor")
        if name == "volterra":
            p.add_argument("--quadrature", choices=["gauss", "montecarlo"],
                           default="gauss",
                           help="variable-limit quadrature: gauss = rescaled "
                                "Gauss-Legendre (deterministic), montecarlo "
                                "= fresh t ~ x*U per step")
            p.add_argument("--quad-nodes", type=int, default=50)
        if name == "advection":
            p.add_argument("--speed", type=float, default=None, dest="c",
                           help="transport speed c (default 2*pi; high c "
                                "is the canonical PINN failure mode — "
                                "pair with --causal-eps)")
            p.add_argument("--causal-eps", type=float, default=0.0,
                           help="causal residual weighting strength "
                                "(Wang et al. 2022; 0 = off)")
        if name == "fitzhugh_nagumo":
            p.add_argument("--arch", choices=["dgm", "fourier_mlp"],
                           default="dgm",
                           help="dgm = reference parity (init-sensitive; "
                                "pair with --ensemble); fourier_mlp = "
                                "seed-robust, ~10x lower MAE")
        if name in ("simple_ode", "heat", "wave", "poisson", "heat2d",
                    "fitzhugh_nagumo"):
            p.add_argument("--constraint", choices=["soft", "hard"],
                           default="soft",
                           help="soft = reference-style weighted IC/BC loss "
                                "terms; hard = Lagaris trial function — "
                                "IC/BC hold EXACTLY, only the domain "
                                "residual trains (scan engine, jvp taps)")
        p.set_defaults(func=lambda a, n=name: _cmd_equation(n, a))

    p = sub.add_parser("sweep", help="population hyperparameter search "
                                     "(replaces Ray Tune)")
    p.add_argument("--equation", choices=list(PROBLEMS), default="heat")
    p.add_argument("--num-samples", type=int, default=10)
    p.add_argument("--max-iters", type=int, default=None)
    p.add_argument("--max-batch-size", type=int, default=512)
    p.add_argument("--eta", type=int, default=3,
                   help="halving keep-fraction 1/eta per rung "
                        "(asha/tpe-asha/*-fused variants)")
    p.add_argument("--min-budget", type=int, default=500,
                   help="first halving rung's iteration budget")
    p.add_argument("--brackets", type=int, default=3,
                   help="TPE x halving brackets (tpe-asha, tpe-asha-fused)")
    p.add_argument("--scheduler",
                   choices=["random", "asha", "tpe", "tpe-asha", "tpe-fused",
                            "asha-fused", "tpe-asha-fused"],
                   default="random",
                   help="random = pure sampling; asha = successive halving; "
                        "tpe = adaptive model-based (the reference's "
                        "OptunaSearch role, optimize_heat_ray.py:179); "
                        "tpe-asha = both composed (the reference's full "
                        "scheduler pairing); tpe-fused = TPE with every "
                        "trial trained to its own budget inside the fused "
                        "Pallas kernel (one compile for the whole space — "
                        "lr, batch_size and n_iters are runtime scalars; "
                        "fused-spec equations only); asha-fused = "
                        "successive halving with every rung priced at its "
                        "own budget inside the fused kernel (restart == "
                        "promotion via shared-stream determinism); "
                        "tpe-asha-fused = the reference's full TPE+ASHA "
                        "pairing on the fused tier (brackets of TPE "
                        "proposals pruned by in-kernel rungs, ONE compile "
                        "total)")
    p.add_argument("--lr-schedule",
                   choices=["constant", "cosine", "exponential"],
                   default=None,
                   help="per-trial lr schedule for the fused schedulers "
                        "(tpe-fused, asha-fused, tpe-asha-fused); decay "
                        "schedules follow each trial's/rung's OWN budget "
                        "(runtime horizon in-kernel). Default: tpe-fused "
                        "lr-only sweeps inherit the equation's deployment "
                        "schedule; full spaces and the halving schedulers "
                        "use constant (the reference's fixed-lr protocol — "
                        "and the only schedule under which a halving "
                        "promotion extends the identical trajectory)")
    p.add_argument("--concurrent", type=int, default=1,
                   help="tpe-fused: q concurrent proposals per TPE round, "
                        "each round ONE packed kernel dispatch (the "
                        "reference's ConcurrencyLimiter(max_concurrent=5), "
                        "optimize_heat_ray.py:180, made MXU-filling)")
    p.add_argument("--space", choices=["full", "lr"], default="full",
                   help="tpe-fused search space: full = the reference's "
                        "batch_size/n_iters/lrate "
                        "(optimize_heat_ray.py:173-176, runtime-masked); "
                        "lr = learning rate only (fixed-shape evaluator)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--mesh", type=int, default=0,
                   help="shard trials over a {'pop': N} mesh (population "
                        "schedulers vmap+shard; asha-fused/tpe-asha-fused "
                        "run each rung as one shard_map dispatch of "
                        "runtime-gated kernels)")
    p.add_argument("--results-dir", type=str, default="temp_results")
    p.add_argument("--platform", type=str, default=None)
    p.set_defaults(func=_cmd_sweep)

    for cmd, fn, niters in [("ablation-batchsize", _cmd_ablation_batchsize, 15000),
                            ("ablation-batchnorm", _cmd_ablation_batchnorm, 15000)]:
        p = sub.add_parser(cmd)
        p.add_argument("--runs", type=int, default=5)
        p.add_argument("--niters", type=int, default=niters)
        p.add_argument("--savefig", action="store_true")
        p.add_argument("--seed", type=int, default=0)
        p.add_argument("--results-dir", type=str, default="temp_results")
        p.add_argument("--platform", type=str, default=None)
        p.set_defaults(func=fn)

    return parser


def main(argv=None):
    args = build_parser().parse_args(argv)
    if getattr(args, "platform", None):
        # Must run before any JAX computation; overrides the environment's
        # platform plugin (env vars are shadowed by site customisations).
        jax.config.update("jax_platforms", args.platform)
    return args.func(args)


if __name__ == "__main__":
    main()
