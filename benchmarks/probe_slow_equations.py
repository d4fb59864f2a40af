"""Probe: where do volterra's and fredholm's fused steps spend their time?

VERDICT r4 weak #4: the fused equation tier spans 4.4x — volterra 8.7k and
fredholm 9.0k it/s vs advection 38.2k — with no analysis of whether that is
inherent work (volterra's 51 value groups = 3264 stream rows/step vs
advection's 320) or waste (per-step selection-matrix construction, lane
padding at H=64, tiny-op latency in the B=32/H=32 DGM).

This probe measures, on the real chip:
  * per-equation steady step time + achieved useful matmul TFLOP/s
    (step_flops from the spec layout — same counting as bench.py);
  * volterra variants isolating the selection-matrix cost;
  * fredholm DGM vs FN DGM step-time scaling (both tiny-op latency cases).

Run: python benchmarks/probe_slow_equations.py
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

from differential_equations_dnn_tpu.equations import PROBLEMS
from differential_equations_dnn_tpu.kernels import fused_engine as fe


def mlp_step_flops(model, rows):
    """Useful MXU FLOPs per fused step for an R-row stream stack."""
    H, L, D = model.hidden_size, model.num_layers, model.input_dim
    O = model.output_dim
    fwd = rows * (D * H + L * H * H + H * O)
    bwd = rows * (H * O * 2 + L * H * H * 2 + D * H)
    return 2 * (fwd + bwd)


def run_engine(name, iters=3000, reps=2, **kw):
    prob = PROBLEMS[name]()
    spec = fe.spec_for(prob)
    model = prob.default_model()
    bs = kw.pop("batch_size", prob.defaults.batch_size)
    best = None
    for _ in range(reps):
        r = fe.train_fused_result(prob, jax.random.key(0), iters,
                                  batch_size=bs, lrate=prob.defaults.lrate,
                                  chunk_size=iters, **kw)
        if best is None or r.wall_time < best.wall_time:
            best = r
    rows = fe._n_rows(spec.groups) * bs
    tf = mlp_step_flops(model, rows) * (iters / best.wall_time) / 1e12
    print(f"{name:12s} bs={bs:4d} rows={rows:5d} H={model.hidden_size:4d} "
          f"L={model.num_layers} iters/s={iters / best.wall_time:9.1f} "
          f"us/step={1e6 * best.wall_time / iters:7.1f} "
          f"useful_matmul_TFLOPs={tf:6.2f}")
    return best


def run_dgm(name, iters=3000, reps=2, **kw):
    from differential_equations_dnn_tpu.kernels import fused_dgm as fd

    prob = PROBLEMS[name]()
    bs = kw.pop("batch_size", prob.defaults.batch_size)
    best = None
    for _ in range(reps):
        r = fd.train_dgm_fused_result(prob, jax.random.key(0), iters,
                                      batch_size=bs,
                                      lrate=prob.defaults.lrate,
                                      chunk_size=iters, **kw)
        if best is None or r.wall_time < best.wall_time:
            best = r
    print(f"{name:12s} bs={bs:4d} iters/s={iters / best.wall_time:9.1f} "
          f"us/step={1e6 * best.wall_time / iters:7.1f}")
    return best


if __name__ == "__main__":
    print("device:", jax.devices()[0])
    t0 = time.time()
    run_engine("advection")
    run_engine("volterra")
    run_engine("simple_ode")
    run_dgm("fredholm")
    run_dgm("fitzhugh_nagumo", iters=2000)
    print(f"total {time.time() - t0:.0f}s")
