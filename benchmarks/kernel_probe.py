"""Device-side performance probe: where do the microseconds go?

Times, on the real chip:
  1. matmul calibration — big bf16/fp32 MXU throughput (device health check
     against known-good v5e numbers) and small-matmul latency chains;
  2. the XLA scan training step (taps="taylor"), per-step time;
  3. the fused Pallas training kernel at several steps_per_cell and MXU
     precision settings.

Usage:  python benchmarks/kernel_probe.py [--iters 5000]
Prints one JSON dict per probe line.
"""

import argparse
import functools
import json
import math
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
from jax import lax


def timed(fn, *args, warmup=1, reps=3):
    """Best-of wall time; fetches a scalar from the result each rep so the
    tunnel cannot report completion before the device really finished."""
    def run():
        out = fn(*args)
        leaf = jax.tree.leaves(out)[0]
        return float(jnp.ravel(leaf)[0])

    for _ in range(warmup):
        run()
    best = math.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        run()
        best = min(best, time.perf_counter() - t0)
    return best


def probe_matmul_calibration():
    """MXU health: sustained TFLOP/s on a big matmul chain."""
    out = {}
    for dtype, name in [(jnp.bfloat16, "bf16"), (jnp.float32, "fp32")]:
        n = 4096
        # Scaled random values: keeps the chain numerically ~O(1) (all-ones
        # overflows bf16 to inf, which can hit special-value fast paths).
        a = (jax.random.normal(jax.random.key(0), (n, n)) / math.sqrt(n)).astype(dtype)
        b = (jax.random.normal(jax.random.key(1), (n, n)) / math.sqrt(n)).astype(dtype)

        @jax.jit
        def chain(a, b, reps=8):
            def body(c, _):
                return jnp.dot(c, b, preferred_element_type=dtype), None
            c, _ = lax.scan(body, a, None, length=reps)
            return c

        t = timed(chain, a, b)
        flops = 2 * n**3 * 8
        out[f"matmul_{name}_tflops"] = round(flops / t / 1e12, 2)
    # Small-matmul latency chain: 128x128 @ 128x128, sequentially dependent
    # (the shape class of a Deep-Galerkin training step).
    w = jnp.ones((128, 128), jnp.float32)
    x = jnp.ones((448, 128), jnp.float32)

    @jax.jit
    def small_chain(x, w):
        def body(c, _):
            return jnp.tanh(jnp.dot(c, w, preferred_element_type=jnp.float32)), None
        c, _ = lax.scan(body, x, None, length=1000)
        return c

    t = timed(small_chain, x, w)
    out["small_matmul_chain_us_per_op"] = round(t / 1000 * 1e6, 3)
    return out


def probe_scan_trainer(iters):
    from differential_equations_dnn_tpu.equations import Heat1D
    from differential_equations_dnn_tpu.train import TrainConfig, train

    problem = Heat1D(taps="taylor")
    config = TrainConfig(iterations=iters, batch_size=64, lrate=1e-4,
                         chunk_size=iters, verbose=False, snapshot_every=0)
    r1 = train(problem, jax.random.key(42), config)
    r2 = train(problem, jax.random.key(42), config, params=r1.params)
    best = max(r1.iters_per_sec, r2.iters_per_sec)
    return {"scan_iters_per_sec": round(best, 1),
            "scan_us_per_step": round(1e6 / best, 2),
            "scan_compile_s": round(r1.compile_time, 1)}


def probe_fused_kernel(iters, steps_per_cell, precision):
    import differential_equations_dnn_tpu.kernels.fused_train as ft
    from differential_equations_dnn_tpu.equations import Heat1D
    from differential_equations_dnn_tpu.models import MLP

    old = ft._HIGH
    ft._HIGH = precision
    try:
        problem = Heat1D()
        model = problem.default_model()
        params = model.init(jax.random.key(0))
        flat = ft.pack_params(model, params)
        m = tuple(jnp.zeros_like(p) for p in flat)
        v = tuple(jnp.zeros_like(p) for p in flat)
        u = jax.random.uniform(jax.random.key(1), (iters, 64, 2))

        run = jax.jit(functools.partial(
            ft.heat_fused_train_chunk, model,
            x_max=problem.x_max, t_max=problem.t_max, kappa=problem.kappa,
            lrate=1e-4, steps_per_cell=steps_per_cell))
        t0 = time.perf_counter()
        jax.block_until_ready(run(flat, m, v, u, 0))
        compile_s = time.perf_counter() - t0
        t = timed(run, flat, m, v, u, 0, warmup=0, reps=3)
        out = run(flat, m, v, u, 0)
        loss = float(np.asarray(out[3])[-1])
        return {"fused_iters_per_sec": round(iters / t, 1),
                "fused_us_per_step": round(t / iters * 1e6, 2),
                "steps_per_cell": steps_per_cell,
                "precision": str(precision),
                "final_loss": round(loss, 6),
                "compile_s": round(compile_s, 1)}
    finally:
        ft._HIGH = old


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=5000)
    ap.add_argument("--skip-scan", action="store_true")
    args = ap.parse_args()

    print(json.dumps({"device": str(jax.devices()[0])}), flush=True)
    print(json.dumps(probe_matmul_calibration()), flush=True)
    if not args.skip_scan:
        print(json.dumps(probe_scan_trainer(args.iters)), flush=True)
    for spc in (50, 250):
        for prec in (lax.Precision.HIGHEST, lax.Precision.DEFAULT):
            print(json.dumps(probe_fused_kernel(args.iters, spc, prec)),
                  flush=True)


if __name__ == "__main__":
    main()
