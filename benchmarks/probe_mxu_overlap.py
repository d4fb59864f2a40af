"""Probe: can Mosaic overlap INDEPENDENT small matmuls inside one kernel?

Answers the VERDICT r3 #3 design question with silicon measurements.
The packed ensemble kernel (engine_core.fused_packed_adam_kernel) runs
each replica's full step chain in sequence; bench measured 0.97x vs
sequential dispatches. Hypotheses to distinguish:

  H1 (latency-bound, schedulable): a dependent chain of tiny
     (64,128)@(128,128) matmuls is latency-bound; issuing R independent
     matmuls back-to-back (op-level interleave) pipelines them through
     the MXU, so per-matmul time drops ~Rx until throughput-bound.
     -> restructure the packed kernel to interleave at op level.
  H2 (throughput-bound already): the single-replica chain already
     saturates whatever binds (MXU weight-load, VPU, VMEM bandwidth);
     interleaving gains little. -> the honest MXU-filling demo is a
     bigger per-replica shape, not packing.

Methodology notes (both pitfalls were observed before fixing):
 * the chain must provably depend on every iteration or Mosaic/XLA folds
   it — we use a roll-by-one permutation weight and CHECK the output is
   the input rolled by T mod H;
 * per-call wall time over the axon tunnel carries a ~26 ms round-trip,
   so T*R is sized so the kernel body dominates (>30 ms) and we take the
   best of several calls.

MEASURED 2026-08-18 (TPU v5 lite, healthy tunnel, this script):

    dep   R=1  (64,128)@(128,128) fp32: 214.8 ns/matmul  ~ 9.8 TFLOP/s
    intl  R=4                     fp32: 138.2 ns/matmul  ~15.2 TFLOP/s
    intl  R=8                     fp32: 125.2 ns/matmul  ~16.8 TFLOP/s
    intl  R=16                    fp32: 120.2 ns/matmul  ~17.5 TFLOP/s
    big   R=1 (1024,512)@(512,512) fp32: 80.5 TFLOP/s, bf16: 85.4 TFLOP/s
    big   R=1 (512,512)@(512,512)  fp32: 80.0 TFLOP/s, bf16: 84.6 TFLOP/s
    (at the tiny shape bf16-in/f32-acc is within 2% of fp32 everywhere —
    the weight-load port does not care about dtype)

Verdict: BOTH hypotheses partly hold. Interleaving R independent chains
is real but saturates at ~1.8x (215 -> 120 ns), far below Rx. The
~120 ns floor at R=16 is consistent with the MXU reloading a DIFFERENT
128x128 weight matrix per matmul (~128 cycles at ~940 MHz ~= 136 ns):
with distinct weights per replica the weight-load port, not the FLOPs,
is the bind, and dtype cannot help (identical fp32/bf16 times). The
implications for the framework:

 1. op-level interleaving in the packed kernel is worth ~1.8x on the
    matmul-bound portion (plus MXU/VPU cross-replica overlap) — done via
    in-kernel jax.vmap over the replica axis (engine_core.run_fused_packed
    interleave mode);
 2. >=0.25 MXU utilisation at the reference shape (B=64) is physically
    impossible at ~17.5 TFLOP/s ceiling vs the 121.9 TFLOP/s calibration
    anchor; the honest MXU-filling demo is a WIDE shape (big_shape cases
    below), which amortises each weight load over many more rows —
    bench.py's "mxu" section measures the fused engine at such a shape.
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def chain_kernel(T, R, B, H, dtype, x_ref, w_ref, o_ref):
    hs = [x_ref[r * B:(r + 1) * B, :].astype(dtype) for r in range(R)]
    ws = [w_ref[r * H:(r + 1) * H, :].astype(dtype) for r in range(R)]

    def body(t, hs):
        return tuple(
            jnp.dot(h, w, preferred_element_type=jnp.float32).astype(dtype)
            for h, w in zip(hs, ws))

    hs = jax.lax.fori_loop(0, T, body, tuple(hs))
    for r in range(R):
        o_ref[r * B:(r + 1) * B, :] = hs[r].astype(jnp.float32)


def run_case(name, T, R, B, H, dtype):
    # x rows cycle 0..6 so rolls are visible; w = roll-by-one permutation,
    # so after T steps the output must equal x rolled by T mod H: the
    # compiler cannot elide or fold any iteration.
    x = jnp.asarray(np.tile(
        np.arange(B * H, dtype=np.float32).reshape(B, H) % 7, (R, 1)))
    w = jnp.asarray(np.tile(
        np.roll(np.eye(H, dtype=np.float32), 1, axis=1), (R, 1)))
    fn = jax.jit(pl.pallas_call(
        functools.partial(chain_kernel, T, R, B, H, dtype),
        out_shape=jax.ShapeDtypeStruct((R * B, H), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024)))
    t0 = time.perf_counter()
    out = fn(x, w)
    out.block_until_ready()
    compile_s = time.perf_counter() - t0
    ok = np.allclose(np.asarray(out)[:B],
                     np.roll(np.asarray(x)[:B], T % H, axis=1))
    best = float("inf")
    for _ in range(4):
        t0 = time.perf_counter()
        fn(x, w).block_until_ready()
        best = min(best, time.perf_counter() - t0)
    n_mm = T * R
    flops = 2 * B * H * H * n_mm
    print(f"{name:24s} dtype={dtype.__name__:9s} ok={ok} "
          f"wall={best*1e3:8.2f}ms ns/matmul={best/n_mm*1e9:7.1f} "
          f"TFLOP/s={flops/best/1e12:7.2f} (compile {compile_s:.1f}s)")


if __name__ == "__main__":
    print("devices:", jax.devices())
    for dtype in (jnp.float32, jnp.bfloat16):
        run_case("dep R=1 64x128", 262144, 1, 64, 128, dtype)
        run_case("intl R=4 64x128", 65536, 4, 64, 128, dtype)
        run_case("intl R=8 64x128", 32768, 8, 64, 128, dtype)
        run_case("intl R=16 64x128", 16384, 16, 64, 128, dtype)
        run_case("big R=1 1024x512", 8192, 1, 1024, 512, dtype)
        run_case("big R=1 512x512", 16384, 1, 512, 512, dtype)
