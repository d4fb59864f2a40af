"""Shared Mosaic scaffolding for the fused training engines.

Both spec-driven engines (``fused_engine`` — MLP Taylor streams;
``fused_dgm`` — DGM gate streams) run the same on-chip Adam loop; only the
per-step loss/gradient math and the parameter-tensor layout differ. This
module holds the one kernel body and ``pallas_call`` layout they share:

* grid = (K/S,): each cell runs S Adam steps over a pre-sampled uniforms
  block (streamed HBM→VMEM with automatic double-buffering);
* params / Adam moments live in VMEM output buffers with a constant
  index_map — initialised at cell 0, revisited in place, zero HBM traffic
  between steps (in/out aliasing was tried and REVERTED: revisited output
  windows lose cross-cell state on real TPUs — see fused_train);
* batches larger than the VMEM working set run as T gradient-accumulation
  tiles; averaging equal-size tile gradients IS the full-batch gradient;
* lane-packed loss history ([K/S, 128] rows — a [K,1] column would pad
  every scalar to 128 lanes);
* the base lr is a RUNTIME SMEM scalar (lr sweeps reuse one executable);
  cosine/exponential schedules are computed per step in-kernel;
* optional ``const`` operand (constant index_map VMEM block) for
  quadrature nodes/weights and similar per-run constants;
* optional RUNTIME ``batch_size`` / ``n_steps`` SMEM scalars (sweep
  evaluators: the full reference search space through ONE executable —
  rows ≥ batch_size are masked out of the loss exactly like the vmapped
  population path, and steps ≥ n_steps skip their update entirely).

``step_math(params, u_slice, const) -> (loss, grads)`` is the only piece
each engine supplies (with runtime masking it is called as
``step_math(params, u_slice, const, mask01, inv_bs)`` and must return the
mask-weighted partial sums); the specialised heat kernel (fused_train)
predates this core and keeps its own tuned copy.
"""

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from differential_equations_dnn_tpu.kernels.fused_train import (
    _adam_update,
    _interpret,
)


def fused_adam_kernel(step_math, n_tensors, B, S, T, schedule, total, decay,
                      has_const, has_runtime, mask_rows, step0_ref, lr_ref,
                      *rest):
    """Generic kernel body: S Adam steps per grid cell over ``n_tensors``
    parameter tensors, with ``step_math`` supplying loss + grads.

    ``has_runtime`` = the bs/n_steps SMEM scalars are present (steps past
    n_steps freeze); ``mask_rows`` = rows >= bs are additionally masked out
    of the loss/grad (requires the masked ``step_math`` signature). An
    engine can run with step gating alone (``mask_rows=False``) when its
    batch width is compile-time but the trial budget is runtime — the DGM
    sweep evaluator's mode."""
    if has_runtime:
        bs_ref, nsteps_ref, u_ref, *refs = rest
    else:
        bs_ref = nsteps_ref = None
        u_ref, *refs = rest
    idx = 0
    const_ref = None
    if has_const:
        const_ref = refs[0]
        idx = 1
    p_in = refs[idx:idx + n_tensors]
    m_in = refs[idx + n_tensors:idx + 2 * n_tensors]
    v_in = refs[idx + 2 * n_tensors:idx + 3 * n_tensors]
    loss_ref = refs[idx + 3 * n_tensors]
    p_out = refs[idx + 3 * n_tensors + 1:idx + 4 * n_tensors + 1]
    m_out = refs[idx + 4 * n_tensors + 1:idx + 5 * n_tensors + 1]
    v_out = refs[idx + 5 * n_tensors + 1:idx + 6 * n_tensors + 1]

    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        for k in range(n_tensors):
            p_out[k][:] = p_in[k][:]
            m_out[k][:] = m_in[k][:]
            v_out[k][:] = v_in[k][:]
        if has_runtime:
            # Cells past n_steps skip their loss writes; zero the whole
            # history block up front so those rows read as 0, not garbage.
            loss_ref[:] = jnp.zeros(loss_ref.shape, jnp.float32)

    def body(s, _):
        def do_step():
            params = tuple(p_out[k][:] for k in range(n_tensors))
            const = const_ref[:] if has_const else None
            tile = B // T

            def tile_math(t):
                u_slice = u_ref[s, t * tile:(t + 1) * tile]
                if not mask_rows:
                    return step_math(params, u_slice, const)
                rows = (jax.lax.broadcasted_iota(jnp.int32, (tile, 1), 0)
                        + t * tile)
                mask01 = (rows < bs_ref[0]).astype(jnp.float32)
                inv_bs = 1.0 / bs_ref[0].astype(jnp.float32)
                return step_math(params, u_slice, const, mask01, inv_bs)

            loss, grads = tile_math(0)
            for t in range(1, T):
                loss_t, grads_t = tile_math(t)
                loss = loss + loss_t
                grads = tuple(g + gt for g, gt in zip(grads, grads_t))
            if T > 1 and not mask_rows:
                # Equal-size tiles: the mean of tile means is the batch
                # mean. (Runtime masking returns /bs partial sums instead,
                # which accumulate without rescaling.)
                inv = 1.0 / T
                loss = loss * inv
                grads = tuple(g * inv for g in grads)
            lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
            # First step of the cell: seed from zeros, not the uninitialised
            # VMEM output block — lanes >= S would otherwise carry garbage
            # (correct while sliced off by out[0][:, :S], but fragile).
            row = jnp.where(s == 0, jnp.zeros((1, 128), jnp.float32),
                            loss_ref[pl.ds(i, 1), :])
            loss_ref[pl.ds(i, 1), :] = jnp.where(lane == s, loss, row)
            step = i * S + s

            t = (step0_ref[0] + step + 1).astype(jnp.float32)
            lr = lr_ref[0]
            # Per-step learning rate (matches train.trainer's optax
            # schedules: cosine_decay_schedule / exponential_decay with end
            # value lr·decay). In runtime-masked sweep mode the decay
            # horizon is the TRIAL's own n_steps (SMEM scalar), not the
            # compiled max — a short trial sees the same full decay curve
            # a standalone run of its own budget would.
            if has_runtime and schedule != "constant":
                horizon = jnp.maximum(nsteps_ref[0].astype(jnp.float32), 1.0)
            else:
                horizon = total
            if schedule == "cosine":
                frac = jnp.minimum((t - 1.0) / horizon, 1.0)
                lr_t = lr * (decay + (1.0 - decay) * 0.5
                             * (1.0 + jnp.cos(math.pi * frac)))
            elif schedule == "exponential":
                lr_t = lr * jnp.exp(((t - 1.0) / horizon) * math.log(decay))
            else:
                lr_t = lr
            for k in range(n_tensors):
                p_new, m_new, v_new = _adam_update(
                    p_out[k][:], m_out[k][:], v_out[k][:], grads[k], lr_t, t)
                p_out[k][:] = p_new
                m_out[k][:] = m_new
                v_out[k][:] = v_new

        if has_runtime:
            # Steps at or past the trial's own budget are no-ops: the
            # params/moments/history freeze at exactly the n_steps-state.
            pl.when(i * S + s < nsteps_ref[0])(do_step)
        else:
            do_step()
        return 0

    jax.lax.fori_loop(0, S, body, 0)


def run_fused_chunk(step_math, shapes, params, m, v, uniforms, step0, lrate,
                    S, T=1, const=None, schedule="constant", total_steps=1,
                    decay=0.1, runtime_bs=None, runtime_steps=None):
    """Run ``K = uniforms.shape[0]`` Adam steps inside one Pallas kernel
    (``S`` steps per grid cell, must divide K; ``T`` gradient-accumulation
    tiles per batch). Returns (params, m, v, losses [K]).

    ``runtime_bs`` / ``runtime_steps`` (traced int scalars) switch on the
    runtime-masked sweep mode: rows ≥ runtime_bs are excluded from the
    loss/gradient, and steps ≥ runtime_steps do nothing — one compiled
    executable evaluates any (batch_size ≤ B, n_iters ≤ K) trial."""
    K, B, U = uniforms.shape
    n_tensors = len(shapes)
    has_runtime = runtime_bs is not None or runtime_steps is not None
    mask_rows = runtime_bs is not None
    if has_runtime:
        if runtime_bs is None:
            runtime_bs = B
        if runtime_steps is None:
            runtime_steps = K

    kernel = functools.partial(fused_adam_kernel, step_math, n_tensors, B,
                               S, T, schedule, float(total_steps),
                               float(decay), const is not None, has_runtime,
                               mask_rows)

    state_specs = [
        pl.BlockSpec(s, functools.partial(lambda r, i: (0,) * r, len(s)),
                     memory_space=pltpu.VMEM)
        for s in shapes
    ]
    const_spec = ([pl.BlockSpec(const.shape,
                                functools.partial(lambda r, i: (0,) * r,
                                                  len(const.shape)),
                                memory_space=pltpu.VMEM)]
                  if const is not None else [])
    const_arg = (const,) if const is not None else ()
    smem = lambda: pl.BlockSpec((1,), lambda i: (0,),
                                memory_space=pltpu.SMEM)
    runtime_specs = [smem(), smem()] if has_runtime else []
    runtime_args = ((jnp.asarray(runtime_bs, jnp.int32).reshape(1),
                     jnp.asarray(runtime_steps, jnp.int32).reshape(1))
                    if has_runtime else ())

    out = pl.pallas_call(
        kernel,
        grid=(K // S,),
        # Mosaic's default scoped-VMEM stack limit (16 MiB) is sized for
        # small kernels; the wide stream specs legitimately need more. v5e
        # has 128 MiB of VMEM per core — grant the kernel half of it.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        in_specs=(
            [smem(), smem()]
            + runtime_specs
            + [pl.BlockSpec((S, B, U), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)]
            + const_spec
            + state_specs * 3
        ),
        out_specs=(
            [pl.BlockSpec((K // S, 128), lambda i: (0, 0),
                          memory_space=pltpu.VMEM)]
            + state_specs * 3
        ),
        out_shape=(
            [jax.ShapeDtypeStruct((K // S, 128), jnp.float32)]
            + [jax.ShapeDtypeStruct(s, jnp.float32) for s in shapes] * 3
        ),
        interpret=_interpret(),
    )(jnp.asarray([step0], jnp.int32),
      jnp.asarray(lrate, jnp.float32).reshape(1), *runtime_args, uniforms,
      *const_arg, *params, *m, *v)

    losses = out[0][:, :S].reshape(-1)
    n = n_tensors
    return tuple(out[1:1 + n]), tuple(out[1 + n:1 + 2 * n]), \
        tuple(out[1 + 2 * n:1 + 3 * n]), losses
