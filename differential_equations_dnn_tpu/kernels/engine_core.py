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
                      has_const, has_runtime, mask_rows, trial_horizon,
                      step0_ref, lr_ref, *rest):
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
            # value lr·decay). In runtime-masked sweep mode with
            # ``trial_horizon`` the decay horizon is the TRIAL's own
            # n_steps (SMEM scalar) — a short trial sees the same full
            # decay curve a standalone run of its own budget would. With
            # ``trial_horizon=False`` (halving rungs) the horizon is the
            # FIXED compiled total: every rung replays the same lr(t)
            # prefix, so restart == promotion stays exact under decay
            # schedules too (VERDICT r3 #5).
            if has_runtime and trial_horizon and schedule != "constant":
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


def _lead(shape):
    """Replica-stacking fold: tensors stay ≤3-D for Mosaic by folding the
    replica axis into the leading dim — [N, *s] is stored [N·s0, s1, ...]
    (1-D originals become [N, s0]). ``_lead`` is the per-replica extent of
    that folded leading dim."""
    return shape[0] if len(shape) >= 2 else 1


def stack_replicas(flats):
    """Stack per-replica flat tuples into the packed layout: tensor k of
    original shape s becomes [N·_lead(s), *s[1:]] ([N, s0] for 1-D)."""
    return tuple(jnp.concatenate([jnp.reshape(f[k], (_lead(f[k].shape),)
                                              + f[k].shape[1:])
                                  if f[k].ndim >= 2 else f[k][None]
                                  for f in flats], 0)
                 for k in range(len(flats[0])))


def unstack_replicas(packed, shapes, n):
    """Inverse of :func:`stack_replicas`: [N-stacked tensors] -> list of N
    per-replica flat tuples with the ORIGINAL shapes."""
    outs = []
    for r in range(n):
        flat = []
        for k, s in enumerate(shapes):
            lead = _lead(s)
            t = packed[k][r * lead:(r + 1) * lead]
            flat.append(jnp.reshape(t, s))
        outs.append(tuple(flat))
    return outs


def fused_packed_adam_kernel(step_math, n_tensors, leads, B, S, T, R_TILE,
                             schedule, total, decay, has_const, per_rep,
                             mask_rows, trial_horizon,
                             step0_ref, lr_ref, *rest):
    """Packed-replica kernel body: each grid cell advances R_TILE replicas
    by S Adam steps. The replicas' per-step chains are INDEPENDENT — the
    unrolled replica loop hands Mosaic's scheduler R_TILE concurrent
    MXU/VPU dependency chains per step, so one replica's matmul overlaps
    another's activation algebra instead of the units idling in turn
    (VERDICT r3 #3: the tiny reference shapes cannot fill the chip one
    replica at a time).

    A vmapped-step-math "interleave" variant (every stage issuing its
    R_TILE ops as one batched 3-D dot_general) was built, measured 58x
    SLOWER end-to-end on v5e, and retired (VERDICT r4 #7) — the negative
    result lives in benchmarks/probe_mxu_overlap.py + docs/KERNELS.md.

    ``per_rep``: per-replica runtime SMEM vectors (lr, bs, n_steps) are
    present — the packed SWEEP mode, where each slot is a different trial:
    slot r trains at its own lr, masks rows ≥ bs[r] out of its loss
    (``mask_rows``), and freezes at its own n_steps[r] (a pruned slot with
    n_steps=0 does nothing — one executable evaluates every halving rung).

    State layout: tensor k is [R_TILE·leads[k], ...] in VMEM — the replica
    axis folded into the leading dim (``_lead``) keeps every operand ≤3-D.
    Loss rows are ROW-stacked per replica: loss_ref[r·(K/S) + cell, s].
    (Lane-packing them at loss_ref[cell, r·128+s] does not lower — Mosaic
    rejects a dynamic-row load that also takes a 128-lane column window of
    a wider memref: "dynamic load with unaligned indices", observed on
    v5e. Full-width (1, 128) slices at a dynamic row are the pattern the
    single-replica kernel already proves.)"""
    if per_rep:
        lrv_ref, bsv_ref, nsv_ref, u_ref, *refs = rest
    else:
        lrv_ref = bsv_ref = nsv_ref = None
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

    i = pl.program_id(1)  # step-block index (replica-group is dim 0)

    @pl.when(i == 0)
    def _():
        for k in range(n_tensors):
            p_out[k][:] = p_in[k][:]
            m_out[k][:] = m_in[k][:]
            v_out[k][:] = v_in[k][:]
        if per_rep:
            # Gated slots skip their loss writes; zero the whole history
            # block up front so those lanes read as 0, not garbage.
            loss_ref[:] = jnp.zeros(loss_ref.shape, jnp.float32)

    def body(s, _):
        const = const_ref[:] if has_const else None
        tile = B // T
        step = i * S + s
        t_f = (step0_ref[0] + step + 1).astype(jnp.float32)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        for r in range(R_TILE):
            sl = [slice(r * leads[k], (r + 1) * leads[k])
                  for k in range(n_tensors)]

            def do_step(r=r, sl=sl):
                params = tuple(p_out[k][sl[k]] for k in range(n_tensors))
                lr = lrv_ref[r] if per_rep else lr_ref[0]
                if schedule != "constant":
                    if per_rep and trial_horizon:
                        horizon = jnp.maximum(
                            nsv_ref[r].astype(jnp.float32), 1.0)
                    else:
                        horizon = total
                if schedule == "cosine":
                    frac = jnp.minimum((t_f - 1.0) / horizon, 1.0)
                    lr_t = lr * (decay + (1.0 - decay) * 0.5
                                 * (1.0 + jnp.cos(math.pi * frac)))
                elif schedule == "exponential":
                    lr_t = lr * jnp.exp(((t_f - 1.0) / horizon)
                                        * math.log(decay))
                else:
                    lr_t = lr

                def tile_math(t):
                    u_slice = u_ref[s, t * tile:(t + 1) * tile]
                    if not mask_rows:
                        return step_math(params, u_slice, const)
                    rows = (jax.lax.broadcasted_iota(
                        jnp.int32, (tile, 1), 0) + t * tile)
                    mask01 = (rows < bsv_ref[r]).astype(jnp.float32)
                    inv_bs = 1.0 / bsv_ref[r].astype(jnp.float32)
                    return step_math(params, u_slice, const, mask01, inv_bs)

                loss, grads = tile_math(0)
                for t in range(1, T):
                    loss_t, grads_t = tile_math(t)
                    loss = loss + loss_t
                    grads = tuple(g + gt for g, gt in zip(grads, grads_t))
                if T > 1 and not mask_rows:
                    inv = 1.0 / T
                    loss = loss * inv
                    grads = tuple(g * inv for g in grads)
                li = r * pl.num_programs(1) + i
                row = jnp.where(
                    s == 0, jnp.zeros((1, 128), jnp.float32),
                    loss_ref[pl.ds(li, 1), :])
                loss_ref[pl.ds(li, 1), :] = jnp.where(lane == s, loss, row)
                for k in range(n_tensors):
                    p_new, m_new, v_new = _adam_update(
                        p_out[k][sl[k]], m_out[k][sl[k]], v_out[k][sl[k]],
                        grads[k], lr_t, t_f)
                    p_out[k][sl[k]] = p_new
                    m_out[k][sl[k]] = m_new
                    v_out[k][sl[k]] = v_new

            if per_rep:
                # Slot r freezes at its OWN budget (n_steps=0 = pruned).
                pl.when(step < nsv_ref[r])(do_step)
            else:
                do_step()
        return 0

    jax.lax.fori_loop(0, S, body, 0)


def run_fused_packed(step_math, shapes, params, m, v, uniforms, step0,
                     lrate, S, n_replicas, rep_tile=None, T=1, const=None,
                     schedule="constant", total_steps=1, decay=0.1,
                     lr_vec=None, bs_vec=None, steps_vec=None,
                     mask_rows=False, trial_horizon=True):
    """Packed-replica variant of :func:`run_fused_chunk`: ONE dispatch
    advances ``n_replicas`` independent training runs by K steps each.

    ``params``/``m``/``v`` arrive REPLICA-STACKED (:func:`stack_replicas`
    layout: tensor k = [N·_lead(shapes[k]), *shapes[k][1:]]). All replicas
    share the uniforms stream (same contract as the sequential trial
    evaluator) and the lr/schedule. Returns (params, m, v, losses [N, K])
    in the same stacked layout.

    grid = (N/rep_tile, K/S) with the step dim innermost: a replica
    group's state blocks stay resident in VMEM across all its step cells
    (constant index over dim 1), exactly like the single-replica kernel;
    moving to the next group flushes/loads once.

    ``lr_vec``/``bs_vec``/``steps_vec`` ([N] arrays) switch on the packed
    SWEEP mode: each slot trains a DIFFERENT trial — its own lr, rows ≥
    bs[r] masked out of its loss (``mask_rows``, needs the masked
    step_math signature), frozen at its own steps[r] (0 = pruned slot).
    One executable then evaluates a whole halving rung in ONE dispatch."""
    K, B, U = uniforms.shape
    n_tensors = len(shapes)
    if rep_tile is None:
        rep_tile = n_replicas
    if n_replicas % rep_tile:
        raise ValueError(f"n_replicas {n_replicas} not divisible by "
                         f"rep_tile {rep_tile}")
    G = n_replicas // rep_tile
    _check_state_fits(shapes, rep_tile)
    leads = [_lead(s) for s in shapes]
    if S > 128:
        raise ValueError("S > 128 cannot lane-pack the loss history")
    per_rep = lr_vec is not None or bs_vec is not None \
        or steps_vec is not None
    if per_rep:
        if lr_vec is None:
            lr_vec = jnp.full((n_replicas,), lrate, jnp.float32)
        if bs_vec is None:
            bs_vec = jnp.full((n_replicas,), B, jnp.int32)
        if steps_vec is None:
            steps_vec = jnp.full((n_replicas,), K, jnp.int32)

    kernel = functools.partial(fused_packed_adam_kernel, step_math,
                               n_tensors, leads, B, S, T, rep_tile,
                               schedule, float(total_steps), float(decay),
                               const is not None, per_rep, mask_rows,
                               trial_horizon)

    def _block(s, lead):
        """Replica-group-indexed state block: [rep_tile·lead, *s[1:]]."""
        bs = (rep_tile * lead,) + tuple(s[1:]) if len(s) >= 2 \
            else (rep_tile, s[0])
        rank = len(bs)
        return pl.BlockSpec(bs, functools.partial(
            lambda r, g, i: (g,) + (0,) * (r - 1), rank),
            memory_space=pltpu.VMEM)

    state_specs = [_block(s, lead) for s, lead in zip(shapes, leads)]
    # Stacked full shapes (what the caller passes / receives).
    full = [(n_replicas * lead,) + tuple(s[1:]) if len(s) >= 2
            else (n_replicas, s[0]) for s, lead in zip(shapes, leads)]
    const_spec = ([pl.BlockSpec(const.shape, functools.partial(
        lambda r, g, i: (0,) * r, len(const.shape)),
        memory_space=pltpu.VMEM)] if const is not None else [])
    const_arg = (const,) if const is not None else ()
    smem = lambda: pl.BlockSpec((1,), lambda g, i: (0,),
                                memory_space=pltpu.SMEM)
    # Per-replica runtime vectors: the replica-group's slice rides SMEM.
    smem_vec = lambda: pl.BlockSpec((rep_tile,), lambda g, i: (g,),
                                    memory_space=pltpu.SMEM)
    rep_specs = [smem_vec(), smem_vec(), smem_vec()] if per_rep else []
    rep_args = ((jnp.asarray(lr_vec, jnp.float32).reshape(n_replicas),
                 jnp.asarray(bs_vec, jnp.int32).reshape(n_replicas),
                 jnp.asarray(steps_vec, jnp.int32).reshape(n_replicas))
                if per_rep else ())

    out = pl.pallas_call(
        kernel,
        grid=(G, K // S),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        in_specs=(
            [smem(), smem()]
            + rep_specs
            + [pl.BlockSpec((S, B, U), lambda g, i: (i, 0, 0),
                            memory_space=pltpu.VMEM)]
            + const_spec
            + state_specs * 3
        ),
        out_specs=(
            [pl.BlockSpec((rep_tile * (K // S), 128), lambda g, i: (g, 0),
                          memory_space=pltpu.VMEM)]
            + state_specs * 3
        ),
        out_shape=(
            [jax.ShapeDtypeStruct((n_replicas * (K // S), 128),
                                  jnp.float32)]
            + [jax.ShapeDtypeStruct(s, jnp.float32) for s in full] * 3
        ),
        interpret=_interpret(),
    )(jnp.asarray([step0], jnp.int32),
      jnp.asarray(lrate, jnp.float32).reshape(1), *rep_args, uniforms,
      *const_arg, *params, *m, *v)

    # losses: row-unstack [N·(K/S), 128] -> [N, K]
    hist = out[0].reshape(n_replicas, K // S, 128)[:, :, :S]
    losses = hist.reshape(n_replicas, K)
    n = n_tensors
    return tuple(out[1:1 + n]), tuple(out[1 + n:1 + 2 * n]), \
        tuple(out[1 + 2 * n:1 + 3 * n]), losses


def _check_state_fits(shapes, rep_tile=1):
    """Reject models whose VMEM-resident Adam state cannot fit the 64 MiB
    scoped grant. The kernels keep p+m+v as in AND out buffers (6 copies —
    in/out aliasing loses revisited-window state on real TPUs, see module
    docstring), so a tanh MLP at H=1024 (12.6 MiB of weights) wants 75 MiB
    of state alone and Mosaic stack-OOMs at compile (measured 82.7M vs the
    64M limit, 2026-08-18 v5e). Fail fast with the alternative instead."""
    state = sum(math.prod(s) for s in shapes) * 4 * 6 * rep_tile
    if state > (56 << 20):
        raise ValueError(
            f"model state ({state / 2**20:.0f} MiB for p+m+v in/out"
            f"{f' x {rep_tile} replicas' if rep_tile > 1 else ''}) exceeds "
            "the fused engines' 64 MiB VMEM envelope — use engine='scan' "
            "(HBM-resident state), or a smaller hidden size / rep_tile")


def run_fused_chunk(step_math, shapes, params, m, v, uniforms, step0, lrate,
                    S, T=1, const=None, schedule="constant", total_steps=1,
                    decay=0.1, runtime_bs=None, runtime_steps=None,
                    trial_horizon=True):
    """Run ``K = uniforms.shape[0]`` Adam steps inside one Pallas kernel
    (``S`` steps per grid cell, must divide K; ``T`` gradient-accumulation
    tiles per batch). Returns (params, m, v, losses [K]).

    ``runtime_bs`` / ``runtime_steps`` (traced int scalars) switch on the
    runtime-masked sweep mode: rows ≥ runtime_bs are excluded from the
    loss/gradient, and steps ≥ runtime_steps do nothing — one compiled
    executable evaluates any (batch_size ≤ B, n_iters ≤ K) trial."""
    K, B, U = uniforms.shape
    n_tensors = len(shapes)
    _check_state_fits(shapes)
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
                               mask_rows, trial_horizon)

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
