"""Fully-fused Pallas training kernel for the heat equation.

ONE kernel executes K Adam steps end-to-end on-chip:

* grid = (K,): each grid step consumes one pre-sampled `[B, 2]` slice of
  uniform collocation draws (streamed HBM→VMEM with automatic
  double-buffering) — RNG stays in `jax.random` for reproducibility;
* params / Adam moments live in VMEM output buffers with a constant
  index_map, so they are initialised once (step 0) and revisited in place —
  zero HBM traffic for the optimiser state between steps;
* forward = the 7-stream stacked Taylor propagation (ops.taylor): interior
  value + x/xx/t derivative streams + IC/BC constraint forwards, one MXU
  matmul per layer;
* backward = hand-derived VJP of the Taylor stream algebra (verified against
  `jax.grad` of the pure implementation in tests), two MXU matmuls per layer;
* Adam with torch-default hyperparameters and bias correction by true step
  index (carried across kernel launches via `step0`).

This removes ALL per-step XLA scheduling overhead: the entire training loop
for the reference heat configuration runs inside one Mosaic program.
Measured on TPU v5 lite (round 2): **65-76k iters/s at exact-fp32 MXU
precision, and 91-95k iters/s with the ``precision="mixed"`` schedule (bf16
coarse phase + exact-fp32 final phase chained in ONE dispatch), MAE 0.0003
at the reference 15k-iteration budget** vs 29.6k iters/s for the XLA-scan
trainer on the same chip/day — 3.2x, and ~450x the reference's torch-CPU
loop; wins at batch 256 (25.9k vs 10.2k) and batch 512 via
gradient-accumulation tiles (14.7k vs 7.1k) too. Reachable via
``solve("heat", engine="fused")`` or ``heat --engine fused`` on the CLI;
bench.py uses the mixed schedule as the headline path.

Restriction: plain tanh MLP (the heat equation's reference net,
heat.py:181-184). The generic path (any model/equation) remains
train.trainer.
"""

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from differential_equations_dnn_tpu.kernels.aot_cache import (
    cached_call,
    cached_compile,
    fused_prologue,
)

_B1, _B2, _EPS = 0.9, 0.999, 1e-8
# MXU precision for the kernel's matmuls. HIGHEST = exact fp32 (multi-pass
# MXU): measured 70k it/s and MAE 0.0011 at the reference heat budget.
# DEFAULT (bf16 inputs, fp32 accumulate) is ~1.6x faster (110k it/s) but the
# bf16 rounding of the Taylor derivative streams costs ~14x MAE (0.015) —
# still under the reference's 0.0529. ``precision="mixed"`` combines them as
# a schedule: the coarse descent phase runs bf16, the final phase re-runs
# exact fp32 (Adam state carries over bit-exactly via the resume path), which
# recovers fp32-level MAE at near-bf16 throughput.
_HIGH = jax.lax.Precision.HIGHEST
_PRECISIONS = {
    "highest": jax.lax.Precision.HIGHEST,
    "default": jax.lax.Precision.DEFAULT,
}


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


# ---------------------------------------------------------------------------
# Shared step math (pure jnp — used inside the kernel AND as the test twin)
# ---------------------------------------------------------------------------


def _stack_inputs(u, B, x_max, t_max):
    """u: [B, 2] uniforms in [0,1) → the 7-stream stacked input [7B, 2]."""
    x = x_max * u[:, :1]
    t = t_max * u[:, 1:]
    zero = jnp.zeros_like(x)
    one = jnp.ones_like(x)
    rows = [
        jnp.concatenate([x, t], 1),            # interior value
        jnp.concatenate([one, zero], 1),       # x-tangent
        jnp.concatenate([zero, zero], 1),      # xx-tangent (2nd order seed)
        jnp.concatenate([zero, one], 1),       # t-tangent
        jnp.concatenate([x, zero], 1),         # IC points (x, 0)
        jnp.concatenate([zero, t], 1),         # boundary x=0
        jnp.concatenate([jnp.full_like(x, x_max), t], 1),  # boundary x=x_max
    ]
    return jnp.concatenate(rows, 0), x


def _bias_mask(B, dtype):
    # Value streams (interior + 3 constraints) receive the bias; tangent
    # streams do not (constants have zero derivative).
    return jnp.concatenate([
        jnp.ones((B, 1), dtype), jnp.zeros((3 * B, 1), dtype),
        jnp.ones((3 * B, 1), dtype),
    ], 0)


def _act_fwd(z, B):
    """tanh value rule on value streams, Taylor rules on tangent streams.
    Returns (a, saved) where saved = z (pre-activations) for the backward."""
    z0, z1, z2, z3, zc = (z[:B], z[B:2 * B], z[2 * B:3 * B], z[3 * B:4 * B],
                          z[4 * B:])
    a0 = jnp.tanh(z0)
    d = 1.0 - a0 * a0
    a1 = d * z1
    a2 = d * z2 - 2.0 * a0 * d * (z1 * z1)
    a3 = d * z3
    ac = jnp.tanh(zc)
    return jnp.concatenate([a0, a1, a2, a3, ac], 0)


def _act_bwd(z, g, B):
    """VJP of _act_fwd: upstream grads g (w.r.t. streams a) → grads dz.

    With a0=tanh(z0), d=1−a0², d' = −2 a0 d:
      dz0 = d·g0 + d'(z1 g1 + z2 g2 + z3 g3) − 2 z1² d (d − 2 a0²) g2
      dz1 = d·g1 − 4 a0 d z1 g2
      dz2 = d·g2
      dz3 = d·g3
      dzc = (1 − tanh²(zc))·gc
    """
    z0, z1, z2, z3, zc = (z[:B], z[B:2 * B], z[2 * B:3 * B], z[3 * B:4 * B],
                          z[4 * B:])
    g0, g1, g2, g3, gc = (g[:B], g[B:2 * B], g[2 * B:3 * B], g[3 * B:4 * B],
                          g[4 * B:])
    a0 = jnp.tanh(z0)
    d = 1.0 - a0 * a0
    dp = -2.0 * a0 * d
    dz0 = (d * g0 + dp * (z1 * g1 + z2 * g2 + z3 * g3)
           - 2.0 * (z1 * z1) * d * (d - 2.0 * a0 * a0) * g2)
    dz1 = d * g1 - 4.0 * a0 * d * z1 * g2
    dz2 = d * g2
    dz3 = d * g3
    ac = jnp.tanh(zc)
    dzc = (1.0 - ac * ac) * gc
    return jnp.concatenate([dz0, dz1, dz2, dz3, dzc], 0)


def fused_step_math(params, u, B, L, x_max=math.pi, t_max=3.0, kappa=1.0,
                    precision=_HIGH):
    """One training step's loss and parameter gradients, written in plain
    jnp so it runs identically inside the Pallas kernel and as the pure-JAX
    test twin. ``params`` = (w_in, b_in, w_hid [L,H,H], b_hid [L,H], w_out,
    b_out); ``u`` = [B, 2] uniforms.

    Returns (loss, grads_tuple)."""
    w_in, b_in, w_hid, b_hid, w_out, b_out = params
    X, x_interior = _stack_inputs(u, B, x_max, t_max)
    mask = _bias_mask(B, X.dtype)

    # ---- forward, saving pre-activations ONLY (activations are recomputed
    # pointwise from zs in the backward — halves live VMEM) ----
    zs = []
    z = jnp.dot(X, w_in, precision=precision) + mask * b_in
    zs.append(z)
    a = _act_fwd(z, B)
    for l in range(L):
        z = jnp.dot(a, w_hid[l], precision=precision) + mask * b_hid[l]
        zs.append(z)
        a = _act_fwd(z, B)
    out = jnp.dot(a, w_out, precision=precision) + mask * b_out

    u_xx = out[2 * B:3 * B]
    u_t = out[3 * B:4 * B]
    u0 = out[4 * B:5 * B]
    ub1 = out[5 * B:6 * B]
    ub2 = out[6 * B:]
    r = u_t - kappa * u_xx
    r0 = u0 - jnp.sin(x_interior)
    loss = jnp.mean(r * r + r0 * r0 + ub1 * ub1 + ub2 * ub2)

    # ---- output-grad assembly ----
    s = 2.0 / B
    zeros = jnp.zeros_like(r)
    G = jnp.concatenate([zeros, zeros, -kappa * s * r, s * r,
                         s * r0, s * ub1, s * ub2], 0)

    # ---- backward (layer inputs recomputed as act(z_{l-1})) ----
    d_w_out = _dot_tn(_act_fwd(zs[L], B), G, precision)
    d_b_out = jnp.sum(mask * G, axis=0)
    g = _dot_nt(G, w_out, precision)

    d_w_hid = []
    d_b_hid = []
    for l in range(L - 1, -1, -1):
        dz = _act_bwd(zs[l + 1], g, B)
        d_w_hid.append(_dot_tn(_act_fwd(zs[l], B), dz, precision))
        d_b_hid.append(jnp.sum(mask * dz, axis=0))
        g = _dot_nt(dz, w_hid[l], precision)
    d_w_hid = jnp.stack(d_w_hid[::-1]) if L > 0 else jnp.zeros_like(w_hid)
    d_b_hid = jnp.stack(d_b_hid[::-1]) if L > 0 else jnp.zeros_like(b_hid)

    dz = _act_bwd(zs[0], g, B)
    d_w_in = _dot_tn(X, dz, precision)
    d_b_in = jnp.sum(mask * dz, axis=0)

    return loss, (d_w_in, d_b_in, d_w_hid, d_b_hid, d_w_out, d_b_out)


def _dot_tn(a, b, precision=_HIGH):
    """aᵀ @ b without materialising the transpose: contract dim 0 of both
    operands (MXU consumes the layout natively via dimension numbers)."""
    return jax.lax.dot_general(a, b, (((0,), (0,)), ((), ())),
                               precision=precision,
                               preferred_element_type=jnp.float32)


def _dot_nt(a, b, precision=_HIGH):
    """a @ bᵀ without materialising the transpose: contract last dims."""
    return jax.lax.dot_general(a, b, (((1,), (1,)), ((), ())),
                               precision=precision,
                               preferred_element_type=jnp.float32)


def _adam_update(p, m, v, g, lr, t):
    """Adam with torch defaults; t is the 1-indexed global step (float)."""
    m = _B1 * m + (1.0 - _B1) * g
    v = _B2 * v + (1.0 - _B2) * (g * g)
    c1 = 1.0 - jnp.exp(t * math.log(_B1))
    c2 = 1.0 - jnp.exp(t * math.log(_B2))
    p = p - lr * (m / c1) / (jnp.sqrt(v / c2) + _EPS)
    return p, m, v


# ---------------------------------------------------------------------------
# The kernel
# ---------------------------------------------------------------------------

_N_TENSORS = 6  # w_in, b_in, w_hid, b_hid, w_out, b_out


def _train_kernel(B, L, S, T, x_max, t_max, kappa, lr, precision,
                  step0_ref, u_ref, *refs):
    # refs layout: params_in (6), m_in (6), v_in (6),
    #              losses_out, params_out (6), m_out (6), v_out (6).
    # (Aliasing the state inputs onto the outputs was tried and REVERTED:
    # it saves ~1.2 MB VMEM but on real TPUs the revisited output windows
    # lose the cross-grid-cell state — chunk boundaries silently reset the
    # optimiser. Interpret mode does not reproduce it; keep the explicit
    # copy-in.)
    p_in = refs[0:6]
    m_in = refs[6:12]
    v_in = refs[12:18]
    loss_ref = refs[18]
    p_out = refs[19:25]
    m_out = refs[25:31]
    v_out = refs[31:37]

    i = pl.program_id(0)

    # First grid cell: copy initial state into the VMEM-resident buffers.
    @pl.when(i == 0)
    def _():
        for k in range(_N_TENSORS):
            p_out[k][:] = p_in[k][:]
            m_out[k][:] = m_in[k][:]
            v_out[k][:] = v_in[k][:]

    def body(s, _):
        """One Adam step; S steps run per grid cell to amortise grid/DMA
        overhead (the [S, B, 2] uniforms block is already in VMEM).

        Batches larger than the VMEM working set run as T gradient-
        accumulation tiles of B/T points each: the live activation footprint
        is one tile's, and averaging the equal-size tile gradients IS the
        full-batch gradient (the loss is a batch mean)."""
        params = tuple(p_out[k][:] for k in range(_N_TENSORS))
        tile = B // T
        loss, grads = fused_step_math(params, u_ref[s, :tile], tile, L,
                                      x_max, t_max, kappa, precision)
        for t in range(1, T):
            loss_t, grads_t = fused_step_math(
                params, u_ref[s, t * tile:(t + 1) * tile], tile, L,
                x_max, t_max, kappa, precision)
            loss = loss + loss_t
            grads = tuple(g + gt for g, gt in zip(grads, grads_t))
        if T > 1:
            inv = 1.0 / T
            loss = loss * inv
            grads = tuple(g * inv for g in grads)
        # Lane-packed loss history: row = grid cell, lane = step-in-cell.
        # (A [K, 1] layout pads every row to 128 lanes — megabytes of VMEM
        # wasted on scalars; [K/S, 128] costs S·cells·4 bytes.)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        row = loss_ref[pl.ds(i, 1), :]
        loss_ref[pl.ds(i, 1), :] = jnp.where(lane == s, loss, row)
        step = i * S + s

        t = (step0_ref[0] + step + 1).astype(jnp.float32)
        for k in range(_N_TENSORS):
            p_new, m_new, v_new = _adam_update(
                p_out[k][:], m_out[k][:], v_out[k][:], grads[k], lr, t)
            p_out[k][:] = p_new
            m_out[k][:] = m_new
            v_out[k][:] = v_new
        return 0

    jax.lax.fori_loop(0, S, body, 0)


def heat_fused_train_chunk(model, params, m, v, uniforms, step0, lrate,
                           x_max=math.pi, t_max=3.0, kappa=1.0,
                           steps_per_cell: int | None = None,
                           batch_tile: int | None = None,
                           precision=_HIGH):
    """Run ``K = uniforms.shape[0]`` Adam steps entirely inside one Pallas
    kernel. ``params``/``m``/``v`` are the flat tuples
    (w_in, b_in, w_hid, b_hid, w_out, b_out); ``uniforms`` is [K, B, 2] of
    U[0,1) draws (from jax.random, so runs are reproducible).

    ``steps_per_cell`` Adam steps execute per grid cell inside a fori_loop
    (must divide K); larger values amortise grid sequencing overhead at the
    cost of a bigger uniforms block in VMEM (S·B·2 floats). Default: adaptive
    to the batch size from measured VMEM ceilings (see train_heat_fused_result).

    ``batch_tile`` caps the live activation working set: batches larger than
    it are processed as gradient-accumulation tiles (default 256 — measured
    VMEM ceiling for the 7-stream fp32 working set; B must be divisible).

    Returns (params, m, v, losses[K])."""
    if model.batch_norm is not None or model.activation != "tanh":
        raise ValueError("fused train kernel supports plain tanh MLPs only")
    K, B, _ = uniforms.shape
    L, H = model.num_layers, model.hidden_size
    D, O = model.input_dim, model.output_dim
    if steps_per_cell is None:
        steps_per_cell = 100 if B <= 64 else max(1, 3200 // B)
    S = math.gcd(steps_per_cell, K)
    if S > 128:
        # Lane-packed loss rows hold ≤128 steps per grid cell.
        S = math.gcd(S, 128)
    # Default tile: whole batch up to 256 rows; beyond that the bigger
    # uniforms block squeezes the budget — 128-row tiles fit (measured:
    # bs512/tile128/spc6 runs at 14.4k it/s vs 7.1k for the XLA scan).
    batch_tile = batch_tile or (min(B, 256) if B <= 256 else 128)
    if B % batch_tile:
        raise ValueError(f"batch {B} not divisible by batch_tile {batch_tile}")
    T = B // batch_tile

    kernel = functools.partial(_train_kernel, B, L, S, T, float(x_max),
                               float(t_max), float(kappa), float(lrate),
                               precision)

    shapes = [(D, H), (H,), (max(L, 1), H, H), (max(L, 1), H), (H, O), (O,)]
    # Whole-array blocks with a constant index_map: Pallas keeps revisited
    # blocks resident in VMEM across grid steps, so the optimiser state
    # never touches HBM between steps.
    state_specs = [
        pl.BlockSpec(s, functools.partial(lambda r, i: (0,) * r, len(s)),
                     memory_space=pltpu.VMEM)
        for s in shapes
    ]

    out = pl.pallas_call(
        kernel,
        grid=(K // S,),
        in_specs=(
            [pl.BlockSpec((1,), lambda i: (0,), memory_space=pltpu.SMEM)]
            + [pl.BlockSpec((S, B, 2), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)]
            + state_specs * 3
        ),
        out_specs=(
            # Loss history, lane-packed: row per grid cell, lane per step —
            # a (K, 1) column would pad every scalar to a 128-lane row.
            [pl.BlockSpec((K // S, 128), lambda i: (0, 0),
                          memory_space=pltpu.VMEM)]
            + state_specs * 3
        ),
        out_shape=(
            [jax.ShapeDtypeStruct((K // S, 128), jnp.float32)]
            + [jax.ShapeDtypeStruct(s, jnp.float32) for s in shapes] * 3
        ),
        interpret=_interpret(),
    )(jnp.asarray([step0], jnp.int32), uniforms, *params, *m, *v)

    losses = out[0][:, :S].reshape(-1)
    p_new = tuple(out[1:7])
    m_new = tuple(out[7:13])
    v_new = tuple(out[13:19])
    return p_new, m_new, v_new, losses


# ---------------------------------------------------------------------------
# Host-side driver: flat-tuple packing + chunked training loop
# ---------------------------------------------------------------------------


def pack_params(model, params):
    """MLP pytree → flat tuple for the kernel."""
    L, H = model.num_layers, model.hidden_size
    w_hid = params["hidden"]["w"] if L > 0 else jnp.zeros((1, H, H))
    b_hid = params["hidden"].get("b")
    if b_hid is None or L == 0:
        b_hid = jnp.zeros((max(L, 1), H))
    return (params["fc_in"]["w"], params["fc_in"]["b"], w_hid, b_hid,
            params["fc_out"]["w"], params["fc_out"]["b"])


def unpack_params(model, flat):
    w_in, b_in, w_hid, b_hid, w_out, b_out = flat
    return {
        "fc_in": {"w": w_in, "b": b_in},
        "hidden": {"w": w_hid, "b": b_hid},
        "fc_out": {"w": w_out, "b": b_out},
    }


def train_heat_fused(problem, key, iterations, batch_size=64, lrate=1e-4,
                     chunk_size=25_000, model=None, params=None,
                     steps_per_cell: int | None = None):
    """Train the heat equation with the fused kernel. Returns
    (params_pytree, losses np[iterations])."""
    result = train_heat_fused_result(problem, key, iterations,
                                     batch_size=batch_size, lrate=lrate,
                                     chunk_size=chunk_size, model=model,
                                     params=params,
                                     steps_per_cell=steps_per_cell)
    return result.params, result.loss_history


def train_heat_fused_result(problem, key, iterations, batch_size=64,
                            lrate=1e-4, chunk_size=25_000, model=None,
                            params=None, opt_state=None, start_step: int = 0,
                            steps_per_cell: int | None = None,
                            precision="highest", mixed_split: float = 0.65):
    """Like :func:`train_heat_fused` but returns a full
    ``train.trainer.TrainResult`` (compile time measured separately,
    steady-state iters/sec) so the ``solve(engine="fused")`` / CLI
    ``--engine fused`` path reports the same fields as the scan trainer.

    ``opt_state`` holds the Adam moments as ``{"m": pytree, "v": pytree}``
    (model-pytree shaped — checkpointable with the params). Resuming with
    ``params`` + ``opt_state`` + ``start_step`` continues BIT-identically to
    an uninterrupted run: the bias correction uses the absolute step and
    each step's collocation draw is keyed by its absolute index (so the
    chunk layout cannot change the stream).

    ``precision``: ``"highest"`` = exact fp32 MXU (default), ``"default"`` =
    bf16 inputs with fp32 accumulation (~1.6x faster, ~14x MAE), ``"mixed"``
    = a precision SCHEDULE — the first ``mixed_split`` of the budget runs
    bf16, then the final phase re-runs exact fp32, recovering fp32-level MAE
    at near-bf16 throughput. The collocation stream is identical in all
    three modes. Split choice (measured at the reference heat budget,
    interleaved A/B): 0.65 → MAE 0.0003 at 91-95k it/s; 0.8 leaves too few
    fp32 steps to descend out of the bf16 noise floor (MAE 0.007)."""
    import time

    from differential_equations_dnn_tpu.train.trainer import TrainResult

    if precision == "mixed":
        n1 = int(iterations * mixed_split)
        n2 = iterations - n1
        if n1 == 0 or n2 == 0:
            precision = "highest"
        elif iterations > chunk_size:
            # Chunked budgets: run the two phases as separate (internally
            # chunked) calls chained through the bit-exact resume path.
            coarse = train_heat_fused_result(
                problem, key, n1, batch_size=batch_size, lrate=lrate,
                chunk_size=chunk_size, model=model, params=params,
                opt_state=opt_state, start_step=start_step,
                steps_per_cell=steps_per_cell, precision="default")
            fine = train_heat_fused_result(
                problem, key, n2, batch_size=batch_size, lrate=lrate,
                chunk_size=chunk_size, model=model, params=coarse.params,
                opt_state=coarse.opt_state, start_step=start_step + n1,
                steps_per_cell=steps_per_cell, precision="highest")
            wall = coarse.wall_time + fine.wall_time
            return TrainResult(
                params=fine.params,
                opt_state=fine.opt_state,
                loss_history=np.concatenate([coarse.loss_history,
                                             fine.loss_history]),
                wall_time=wall,
                iters_per_sec=iterations / wall if wall else float("inf"),
                compile_time=coarse.compile_time + fine.compile_time,
            )
        else:
            # Whole budget fits one dispatch: chain BOTH kernels inside one
            # jitted program — zero host round-trips between the phases
            # (each extra dispatch over a remote-device tunnel costs tens of
            # ms, which would eat the bf16 phase's gain).
            return _train_mixed_single_dispatch(
                problem, key, iterations, n1, batch_size, lrate, model,
                params, opt_state, start_step, steps_per_cell)
    mxu_precision = _PRECISIONS[precision]

    # steps_per_cell=None → heat_fused_train_chunk picks the VMEM-safe
    # default per batch size. Measured good points: (64, 100) 73.5k it/s;
    # (256, 12) 25.9k; (512, 6, tile 128) 14.7k — while (64, 250), (256, 20)
    # and (512, 12) exhaust the Mosaic scoped stack at compile time.
    model = model or problem.default_model()
    run_key, flat, m, v = fused_prologue(
        model, functools.partial(pack_params, model), key, params, opt_state)

    run = jax.jit(functools.partial(
        heat_fused_train_chunk, model,
        x_max=problem.x_max, t_max=problem.t_max, kappa=problem.kappa,
        lrate=lrate, steps_per_cell=steps_per_cell, precision=mxu_precision,
    ))

    @functools.partial(jax.jit, static_argnames=("n",))
    def draw(rk, start, n):
        # Per-step keyed collocation draws: step i always sees the same
        # uniforms regardless of how the run is chunked or resumed. The
        # key is an ARGUMENT so the cached program is seed-independent.
        return jax.vmap(
            lambda i: jax.random.uniform(jax.random.fold_in(rk, i),
                                         (batch_size, 2))
        )(start + jnp.arange(n))

    chunk = max(1, min(chunk_size, iterations))
    t0 = time.perf_counter()
    u0 = cached_call(draw, run_key, start_step, label="draw", n=chunk)
    compiled = cached_compile(run, flat, m, v, u0, start_step,
                              label="heat")
    compile_time = time.perf_counter() - t0

    losses_out = []
    done = 0
    t0 = time.perf_counter()
    while done < iterations:
        k = min(chunk, iterations - done)
        u = (u0 if done == 0 and k == chunk
             else draw(run_key, start_step + done, k))
        step_fn = compiled if k == chunk else run
        flat, m, v, losses = step_fn(flat, m, v, u, start_step + done)
        losses_out.append(np.asarray(losses))
        done += k
    flat = tuple(np.asarray(t) for t in flat)  # host-copy sync (see above)
    wall = time.perf_counter() - t0
    return TrainResult(
        params=unpack_params(model, flat),
        opt_state={"m": unpack_params(model, m), "v": unpack_params(model, v)},
        loss_history=np.concatenate(losses_out),
        wall_time=wall,
        iters_per_sec=iterations / wall if wall else float("inf"),
        compile_time=compile_time,
    )


def _train_mixed_single_dispatch(problem, key, iterations, n1, batch_size,
                                 lrate, model, params, opt_state, start_step,
                                 steps_per_cell):
    """The ``precision="mixed"`` schedule as ONE XLA program: the bf16-MXU
    kernel runs the first ``n1`` steps and hands params + Adam moments to the
    exact-fp32 kernel in the same dispatch. The collocation stream is keyed
    by absolute step index, so the phase boundary cannot change the draws."""
    import time

    from differential_equations_dnn_tpu.train.trainer import TrainResult

    model = model or problem.default_model()
    run_key, flat, m, v = fused_prologue(
        model, functools.partial(pack_params, model), key, params, opt_state)

    n2 = iterations - n1
    common = dict(x_max=problem.x_max, t_max=problem.t_max,
                  kappa=problem.kappa, lrate=lrate,
                  steps_per_cell=steps_per_cell)

    @jax.jit
    def run(flat, m, v, u1, u2, step0):
        flat, m, v, l1 = heat_fused_train_chunk(
            model, flat, m, v, u1, step0,
            precision=jax.lax.Precision.DEFAULT, **common)
        flat, m, v, l2 = heat_fused_train_chunk(
            model, flat, m, v, u2, step0 + n1,
            precision=jax.lax.Precision.HIGHEST, **common)
        return flat, m, v, jnp.concatenate([l1, l2])

    @functools.partial(jax.jit, static_argnames=("n",))
    def draw(rk, start, n):
        return jax.vmap(
            lambda i: jax.random.uniform(jax.random.fold_in(rk, i),
                                         (batch_size, 2))
        )(start + jnp.arange(n))

    t0 = time.perf_counter()
    u1 = cached_call(draw, run_key, start_step, label="draw", n=n1)
    u2 = cached_call(draw, run_key, start_step + n1, label="draw", n=n2)
    compiled = cached_compile(run, flat, m, v, u1, u2, start_step,
                              label="heatmx")
    compile_time = time.perf_counter() - t0

    t0 = time.perf_counter()
    flat, m, v, losses = compiled(flat, m, v, u1, u2, start_step)
    # Host-copy sync: block_until_ready on a DESERIALIZED executable's
    # outputs can return before execution completes on this backend
    # (observed: 15k-step walls reading ~0); the device->host transfer
    # cannot lie.
    losses = np.asarray(losses)
    jax.block_until_ready(flat)
    wall = time.perf_counter() - t0
    return TrainResult(
        params=unpack_params(model, flat),
        opt_state={"m": unpack_params(model, m), "v": unpack_params(model, v)},
        loss_history=np.asarray(losses),
        wall_time=wall,
        iters_per_sec=iterations / wall if wall else float("inf"),
        compile_time=compile_time,
    )
