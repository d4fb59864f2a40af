"""Generalized fully-fused Pallas training engine: any stacked-Taylor PDE.

``fused_train`` proved the architecture on the heat equation: the ENTIRE
Adam loop runs inside one Mosaic program, with the forward written as
stacked Taylor streams (one MXU matmul per layer for all derivative taps and
constraint forwards together) and a hand-derived VJP of the stream algebra.

This module generalizes that kernel from heat's hardcoded 7 streams to a
per-equation **stream spec**:

* ``groups`` — the stream layout: each group is one network-input block of B
  rows (an interior batch, an IC face, a boundary edge, ...) carrying a
  value stream plus ``n_second`` (first, second)-derivative Taylor pairs and
  ``n_first`` first-only tangents;
* ``build(u)`` — turns the step's pre-sampled uniforms [B, n_uniform] into
  the stacked input rows [R·B, D] plus whatever columns the loss needs;
* ``loss(outs, ctx)`` — the equation's residual loss over the named stream
  outputs. Its gradient w.r.t. the streams (the cotangent that seeds the
  hand-derived backward) is taken with ``jax.value_and_grad`` — an
  elementwise graph Mosaic lowers fine; it is the big jvp-over-jvp graphs
  that are impractical to compile, and those stay hand-written here.

Specs are registered for simple_ode, heat, burgers, wave, poisson,
heat2d, advection, volterra (Gauss quadrature), uat (the Perceptron via
the L=0 layout) and inverse_heat (solution MLP + learnable log κ̂ as an
``extra_shapes`` state tensor) — every registry equation trains inside
one Mosaic kernel on some fused engine (fredholm / fitzhugh_nagumo on
kernels.fused_dgm). DGM/Fourier/BatchNorm architectures and stochastic
-quadrature modes are scan-path only.

Reference hot loop being replaced: the per-script Python training loops,
e.g. heat.py:124-147, simple_ode.py:91-110.
"""

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from differential_equations_dnn_tpu.kernels.aot_cache import (
    cached_call,
    cached_compile,
    cached_split,
    fused_prologue,
)
from differential_equations_dnn_tpu.kernels.fused_train import (
    _PRECISIONS,
    _dot_nt,
    _dot_tn,
    pack_params,
    unpack_params,
)

_HIGH = jax.lax.Precision.HIGHEST

# In-process executable memo for the sweep evaluators. Their compiled
# programs are PRNG-key-INDEPENDENT (keys ride as runtime arguments — the
# uniforms stream and init folds are data), so evaluators constructed for
# different sweep keys but identical (problem, model, shape/schedule
# statics) can share one executable. The AOT disk cache already avoids the
# remote re-compile, but each construction still paid ~1.4 s of re-lower
# (tracing) + deserialize per program (measured 2026-08-19, v5e); this
# memo removes that too. Keyed on hashable frozen dataclasses + statics.
_EXEC_MEMO: dict = {}


def _memo_compile(memo_key, build):
    if memo_key not in _EXEC_MEMO:
        _EXEC_MEMO[memo_key] = build()
    return _EXEC_MEMO[memo_key]


# ---------------------------------------------------------------------------
# Spec protocol extensions (all optional, with MLP defaults)
#
# A spec may additionally declare:
#   * ``extra_shapes`` — shapes of EXTRA trainable tensors appended after the
#     six MLP tensors (Adam-updated in-kernel like any other state tensor).
#     The loss receives them as ``ctx["extras"]`` and their gradient is taken
#     through the loss vjp — so extras may appear in the LOSS only, not in
#     ``build`` (inverse_heat's learnable log κ is the canonical use).
#   * ``build_with_const`` — ``build(u, const)`` instead of ``build(u)``:
#     the step's input rows need the const operand (inverse_heat selects its
#     observation minibatch out of the const-resident dataset).
#   * ``pack(model, params)`` / ``unpack(model, flat)`` — params-pytree ↔
#     flat-tuple converters for non-MLP parameter layouts (Perceptron,
#     inverse_heat's net+κ wrapper). Default: fused_train.pack_params.
#   * ``supports_model(model)`` — replaces the default plain-tanh-MLP check
#     in :func:`supports`.
# ---------------------------------------------------------------------------


def _engine_dims(model):
    """(D, H, L, O) of the model's engine view. ``num_layers`` defaults to 0
    for single-hidden-layer models without the attribute (Perceptron runs
    with zeroed hidden tensors — zero grads keep them zero under Adam)."""
    return (model.input_dim, model.hidden_size,
            getattr(model, "num_layers", 0), model.output_dim)


def _shapes_for(spec, model):
    """Kernel state-tensor shapes: the six MLP tensors plus the spec's
    ``extra_shapes`` (extra trainable tensors, e.g. inverse_heat's log κ)."""
    D, H, L, O = _engine_dims(model)
    return ([(D, H), (H,), (max(L, 1), H, H), (max(L, 1), H), (H, O), (O,)]
            + [tuple(s) for s in getattr(spec, "extra_shapes", ())])


def _pack_fn(spec, model):
    if hasattr(spec, "pack"):
        return functools.partial(spec.pack, model)
    return functools.partial(pack_params, model)


def _unpack_fn(spec, model):
    if hasattr(spec, "unpack"):
        return functools.partial(spec.unpack, model)
    return functools.partial(unpack_params, model)


# ---------------------------------------------------------------------------
# Stream layout: groups of (value + Taylor pairs + first-only tangents)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class Group:
    """One network-input block of B rows in the stacked operand.

    Row order within the group: value, then (first, second) per Taylor pair,
    then the first-only tangents. Tangent rows' INPUT content is the
    direction vector (first) / zeros (second-order seed), exactly as in
    ops.taylor.mlp_streams."""
    n_second: int = 0
    n_first: int = 0

    @property
    def n_rows(self):
        return 1 + 2 * self.n_second + self.n_first


def _n_rows(groups):
    return sum(g.n_rows for g in groups)


def _bias_mask(groups, B, dtype):
    """Value streams receive the bias; tangent streams do not."""
    parts = []
    for g in groups:
        parts.append(jnp.ones((B, 1), dtype))
        parts.append(jnp.zeros(((g.n_rows - 1) * B, 1), dtype))
    return jnp.concatenate([p for p in parts if p.shape[0]], 0)


def _act_fwd(groups, z, B):
    """tanh on value streams, Taylor rules on tangents (per group state)."""
    if all(g.n_rows == 1 for g in groups):
        # Value-only layout (e.g. volterra's 51 quadrature groups): plain
        # tanh on every row — no per-group slicing.
        return jnp.tanh(z)
    outs = []
    off = 0
    for g in groups:
        z0 = z[off * B:(off + 1) * B]
        a0 = jnp.tanh(z0)
        d = 1.0 - a0 * a0
        outs.append(a0)
        cur = off + 1
        for _ in range(g.n_second):
            z1 = z[cur * B:(cur + 1) * B]
            z2 = z[(cur + 1) * B:(cur + 2) * B]
            outs.append(d * z1)
            outs.append(d * z2 - 2.0 * a0 * d * (z1 * z1))
            cur += 2
        for _ in range(g.n_first):
            outs.append(d * z[cur * B:(cur + 1) * B])
            cur += 1
        off += g.n_rows
    return jnp.concatenate(outs, 0)


def _act_bwd(groups, z, gr, B):
    """VJP of :func:`_act_fwd`. With a0 = tanh(z0), d = 1 − a0²,
    d' = −2·a0·d, the per-group rules are

      dz0 = d·g0 + d'·Σ(z_t·g_t over all tangents)
                 − Σ_pairs 2·z1²·d·(d − 2a0²)·g2
      dz1 = d·g1 − 4·a0·d·z1·g2          (pair firsts)
      dz2 = d·g2                          (pair seconds)
      dzf = d·gf                          (first-only tangents)
    """
    if all(g.n_rows == 1 for g in groups):
        a = jnp.tanh(z)
        return (1.0 - a * a) * gr
    outs = []
    off = 0
    for g in groups:
        z0 = z[off * B:(off + 1) * B]
        g0 = gr[off * B:(off + 1) * B]
        a0 = jnp.tanh(z0)
        d = 1.0 - a0 * a0
        dp = -2.0 * a0 * d
        dz0 = d * g0
        tail = []
        cur = off + 1
        for _ in range(g.n_second):
            z1 = z[cur * B:(cur + 1) * B]
            z2 = z[(cur + 1) * B:(cur + 2) * B]
            g1 = gr[cur * B:(cur + 1) * B]
            g2 = gr[(cur + 1) * B:(cur + 2) * B]
            dz0 = (dz0 + dp * (z1 * g1 + z2 * g2)
                   - 2.0 * (z1 * z1) * d * (d - 2.0 * a0 * a0) * g2)
            tail.append(d * g1 - 4.0 * a0 * d * z1 * g2)
            tail.append(d * g2)
            cur += 2
        for _ in range(g.n_first):
            zf = z[cur * B:(cur + 1) * B]
            gf = gr[cur * B:(cur + 1) * B]
            dz0 = dz0 + dp * (zf * gf)
            tail.append(d * gf)
            cur += 1
        outs.append(dz0)
        outs.extend(tail)
        off += g.n_rows
    return jnp.concatenate(outs, 0)


# ---------------------------------------------------------------------------
# Generic step math (pure jnp — kernel body AND test twin)
# ---------------------------------------------------------------------------


def engine_step_math(spec, params, u, B, L, precision=_HIGH,
                     batch_mask=None, inv_bs=None, const=None):
    """One training step's loss and parameter gradients for any stream spec.

    ``params`` = the flat MLP tuple (w_in, b_in, w_hid, b_hid, w_out, b_out);
    ``u`` = [B, spec.n_uniform] U[0,1) draws. Returns (loss, grads_tuple).
    ``batch_mask`` [B, 1] + ``inv_bs`` switch the spec's loss to the
    runtime-batch-size masked partial sum (sweep evaluators)."""
    groups = spec.groups
    w_in, b_in, w_hid, b_hid, w_out, b_out = params[:6]
    extras = tuple(params[6:])
    if const is None and hasattr(spec, "make_const"):
        # Direct (non-kernel) calls build the const lazily; inside a Pallas
        # body it must arrive via the const operand (no captured ndarrays).
        const = spec.make_const(B)
    if getattr(spec, "build_with_const", False):
        X, ctx = spec.build(u, const)
    else:
        X, ctx = spec.build(u)
    if const is not None:
        ctx = {**ctx, "const": const}
    if batch_mask is not None:
        ctx = {**ctx, "mask": batch_mask, "inv_bs": inv_bs}
    mask = _bias_mask(groups, B, X.dtype)

    # ---- forward, saving pre-activations only ----
    zs = []
    z = jnp.dot(X, w_in, precision=precision) + mask * b_in
    zs.append(z)
    a = _act_fwd(groups, z, B)
    for l in range(L):
        z = jnp.dot(a, w_hid[l], precision=precision) + mask * b_hid[l]
        zs.append(z)
        a = _act_fwd(groups, z, B)
    out = jnp.dot(a, w_out, precision=precision) + mask * b_out

    R = _n_rows(groups)
    outs = tuple(out[k * B:(k + 1) * B] for k in range(R))
    # Cotangent w.r.t. the stream outputs: tiny elementwise graph — safe to
    # autodiff even inside a Mosaic kernel body. vjp (not value_and_grad)
    # because spec losses are [1, 1] keepdims values, never rank-0 (see
    # _ksum — the kernel's loss-row write needs a broadcastable 2-D value).
    # Extra trainable tensors (spec.extra_shapes) ride the same vjp: their
    # only influence is through the loss, so d_loss/d_extras comes for free.
    if extras:
        loss, vjp_fn = jax.vjp(
            lambda o, e: spec.loss(o, {**ctx, "extras": e}), outs, extras)
        gouts, gextras = vjp_fn(jnp.ones_like(loss))
    else:
        loss, vjp_fn = jax.vjp(lambda o: spec.loss(o, ctx), outs)
        gouts, = vjp_fn(jnp.ones_like(loss))
        gextras = ()
    G = jnp.concatenate(gouts, 0)

    # ---- backward (identical algebra to fused_train, generic act rules) ----
    d_w_out = _dot_tn(_act_fwd(groups, zs[L], B), G, precision)
    d_b_out = jnp.sum(mask * G, axis=0)
    g = _dot_nt(G, w_out, precision)

    d_w_hid = []
    d_b_hid = []
    for l in range(L - 1, -1, -1):
        dz = _act_bwd(groups, zs[l + 1], g, B)
        d_w_hid.append(_dot_tn(_act_fwd(groups, zs[l], B), dz, precision))
        d_b_hid.append(jnp.sum(mask * dz, axis=0))
        g = _dot_nt(dz, w_hid[l], precision)
    d_w_hid = jnp.stack(d_w_hid[::-1]) if L > 0 else jnp.zeros_like(w_hid)
    d_b_hid = jnp.stack(d_b_hid[::-1]) if L > 0 else jnp.zeros_like(b_hid)

    dz = _act_bwd(groups, zs[0], g, B)
    d_w_in = _dot_tn(X, dz, precision)
    d_b_in = jnp.sum(mask * dz, axis=0)

    return loss, (d_w_in, d_b_in, d_w_hid, d_b_hid, d_w_out,
                  d_b_out) + tuple(gextras)


# ---------------------------------------------------------------------------
# Equation specs
# ---------------------------------------------------------------------------


def _cat(*cols):
    return jnp.concatenate(cols, axis=1)


def _coprime_stride(n: int) -> int:
    """The odd stride nearest golden-ratio·n that is coprime with n — a
    lattice whose prefixes cover 0..n-1 near-uniformly (trace-time)."""
    import math as _math

    m = max(1, int(round(n * 0.6180339887)))
    while _math.gcd(m, n) != 1:
        m += 1
    return m


def _ksum(q):
    """[B, C] -> [1, 1] sum with keepdims at EVERY reduction. Spec losses
    must never materialise a rank-0 value inside the kernel: the loss-row
    write (jnp.where(lane == s, loss, row)) needs a 2-D broadcastable
    value, and rank-0 scalars have crashed Mosaic's layout pass under
    batching ("Check failed: arr.size() >= layout_rank", observed v5e)."""
    return jnp.sum(jnp.sum(q, axis=0, keepdims=True), axis=1, keepdims=True)


def _kmean(q):
    """[B, C] -> [1, 1] mean (keepdims form — see :func:`_ksum`)."""
    return _ksum(q) * (1.0 / (q.shape[0] * q.shape[1]))


def _smean(q, ctx):
    """Batch mean of a pointwise [B, 1] quantity as a [1, 1] value
    (keepdims — see :func:`_ksum`), honouring the runtime batch-size mask
    when the sweep evaluator installs one in ``ctx`` (rows ≥ batch_size
    are computed but excluded — the same masking the vmapped population
    path applies in equations.base.Problem.loss)."""
    mask = ctx.get("mask") if isinstance(ctx, dict) else None
    if mask is None:
        return _kmean(q)
    return _ksum(q * mask) * ctx["inv_bs"]


@dataclass(frozen=True)
class SimpleODESpec:
    """dy/dt = −y, y(0) = y_ic (equations.simple_ode; ref simple_ode.py:41)."""
    p: object
    n_uniform: int = 1
    groups = (Group(n_first=1), Group())  # interior (v, t'), t=0 face

    def build(self, u):
        t = (self.p.sample_scale * self.p.t_max) * u[:, :1]
        zero = jnp.zeros_like(t)
        one = jnp.ones_like(t)
        X = jnp.concatenate([t, one, zero], 0)
        return X, {}

    def loss(self, outs, ctx):
        y, dydt, y0 = outs
        return _smean(jnp.square(dydt + y)
                      + jnp.square(y0 - self.p.y_ic), ctx)


@dataclass(frozen=True)
class HeatSpec:
    """u_t = κ·u_xx (equations.heat; ref heat.py:50-95)."""
    p: object
    n_uniform: int = 2
    groups = (Group(n_second=1, n_first=1),  # interior: v, (x', x''), t'
              Group(), Group(), Group())     # IC, x=0, x=x_max

    def build(self, u):
        x = self.p.x_max * u[:, :1]
        t = self.p.t_max * u[:, 1:2]
        zero = jnp.zeros_like(x)
        one = jnp.ones_like(x)
        xmax = jnp.full_like(x, self.p.x_max)
        X = jnp.concatenate([
            _cat(x, t), _cat(one, zero), _cat(zero, zero), _cat(zero, one),
            _cat(x, zero), _cat(zero, t), _cat(xmax, t),
        ], 0)
        return X, {"x": x}

    def loss(self, outs, ctx):
        u_, u_x, u_xx, u_t, u0, ub1, ub2 = outs
        r = u_t - self.p.kappa * u_xx
        r0 = u0 - jnp.sin(ctx["x"])
        return _smean(jnp.square(r) + jnp.square(r0)
                      + jnp.square(ub1) + jnp.square(ub2), ctx)


@dataclass(frozen=True)
class AdvectionSpec:
    """u_t + c·u_x = 0 (equations.advection): first-order transport — the
    leanest PDE spec in the registry (no Hessian streams; R = 5 vs heat's
    7). Honours the problem's causal residual weighting in-kernel: when
    ``causal_eps > 0`` (and no runtime batch mask — causal is a
    single-run protocol, matching the scan path's policy) the interior
    residual energies are down-weighted by the accumulated energy at
    earlier times via one [B, B] comparison-mask matmul with
    stop-gradient weights — identical math to equations.advection.loss."""
    p: object
    n_uniform: int = 2
    groups = (Group(n_first=2),    # interior: v, x-tangent, t-tangent
              Group(), Group())    # t=0 face, inflow x=0

    def build(self, u):
        x = self.p.x_max * u[:, :1]
        if getattr(self.p, "causal_eps", 0.0) > 0.0:
            # Stratified t over [0, t_max] from the SAME uniform draw (one
            # point per equal slice — the scan sampler's layout). The
            # strata are assigned to rows by a STRIDE PERMUTATION
            # (i·m mod n, gcd(m, n)=1): the causal comparison-mask cumsum
            # is permutation-invariant, but the sweep evaluators mask
            # trials to a row PREFIX — a time-ascending layout would
            # train masked trials only on the earliest fraction of the
            # domain (the scan sampler shuffles rows for the same
            # reason); the lattice prefix covers [0, t_max] near-
            # uniformly at every prefix length. Integer iota cast to
            # float: Mosaic rejects float-typed tpu.iota.
            n = u.shape[0]
            m = _coprime_stride(n)
            idx = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)
            # i·m mod n in float (Mosaic rejects vector integer rem):
            # products stay < 2^24 so prod and q·n are exact in fp32, and
            # the nearest i·m/n ever gets to a wrong integer is 1/n —
            # orders of magnitude above fp32 rounding at these sizes.
            prod = idx.astype(u.dtype) * float(m)
            q = jnp.floor(prod * (1.0 / n))
            stratum = prod - q * float(n)
            t = (stratum + u[:, 1:2]) * (self.p.t_max / n)
        else:
            t = self.p.t_max * u[:, 1:2]
        zero = jnp.zeros_like(x)
        one = jnp.ones_like(x)
        X = jnp.concatenate([
            _cat(x, t), _cat(one, zero), _cat(zero, one),
            _cat(x, zero), _cat(zero, t),
        ], 0)
        return X, {"x": x, "t": t}

    def loss(self, outs, ctx):
        u_, u_x, u_t, u0, ub = outs
        r = jnp.square(u_t + self.p.c * u_x)
        icbc = (jnp.square(u0 - jnp.sin(ctx["x"]))
                + jnp.square(ub - jnp.sin(-self.p.c * ctx["t"])))
        eps = getattr(self.p, "causal_eps", 0.0)
        if eps > 0.0 and (not isinstance(ctx, dict)
                          or ctx.get("mask") is None):
            # 2-D throughout (Mosaic rejects 1-D vector ops in-kernel):
            # [1,B] < [B,1] broadcast builds the comparison mask, and the
            # cumulative residual is a [B,B]·[B,1] matmul.
            t = ctx["t"]                                       # [B, 1]
            earlier = (t.T < t).astype(r.dtype)                # [B, B]
            dt = self.p.t_max / r.shape[0]
            cum = (earlier @ jax.lax.stop_gradient(r)) * dt    # [B, 1]
            wgt = jax.lax.stop_gradient(jnp.exp(-eps * cum))
            return _kmean(wgt * r) + _kmean(icbc)
        return _smean(r + icbc, ctx)


@dataclass(frozen=True)
class BurgersSpec:
    """u_t + u·u_x = ν·u_xx (equations.burgers; nonlinear residual — the
    value stream itself enters the domain residual)."""
    p: object
    n_uniform: int = 2
    groups = (Group(n_second=1, n_first=1), Group(), Group(), Group())

    def build(self, u):
        x = self.p.x_max * u[:, :1]
        t = self.p.t_max * u[:, 1:2]
        zero = jnp.zeros_like(x)
        one = jnp.ones_like(x)
        xmax = jnp.full_like(x, self.p.x_max)
        X = jnp.concatenate([
            _cat(x, t), _cat(one, zero), _cat(zero, zero), _cat(zero, one),
            _cat(x, zero), _cat(zero, t), _cat(xmax, t),
        ], 0)
        return X, {"x": x, "t": t}

    def loss(self, outs, ctx):
        u_, u_x, u_xx, u_t, u_ic, ub0, ub1 = outs
        x, t = ctx["x"], ctx["t"]
        zero = jnp.zeros_like(x)
        xmax = jnp.full_like(x, self.p.x_max)
        r = u_t + u_ * u_x - self.p.nu * u_xx
        r_ic = u_ic - self.p._exact_fn(x, zero)
        r_b0 = ub0 - self.p._exact_fn(zero, t)
        r_b1 = ub1 - self.p._exact_fn(xmax, t)
        return _smean(jnp.square(r) + jnp.square(r_ic)
                      + jnp.square(r_b0) + jnp.square(r_b1), ctx)


@dataclass(frozen=True)
class WaveSpec:
    """u_tt = c²·u_xx with a velocity IC (equations.wave): the t=0 face
    carries its own first-order time tangent — a tap the shared-state
    mlp_streams layout cannot express, but a per-group spec can."""
    p: object
    n_uniform: int = 2
    groups = (Group(n_second=2),            # interior: v, (x',x''), (t',t'')
              Group(n_first=1),             # t=0 face: v, t' (velocity IC)
              Group(), Group())             # x=0, x=x_max

    def build(self, u):
        x = self.p.x_max * u[:, :1]
        t = self.p.t_max * u[:, 1:2]
        zero = jnp.zeros_like(x)
        one = jnp.ones_like(x)
        xmax = jnp.full_like(x, self.p.x_max)
        X = jnp.concatenate([
            _cat(x, t), _cat(one, zero), _cat(zero, zero),
            _cat(zero, one), _cat(zero, zero),
            _cat(x, zero), _cat(zero, one),
            _cat(zero, t), _cat(xmax, t),
        ], 0)
        return X, {"x": x}

    def loss(self, outs, ctx):
        u_, u_x, u_xx, u_t, u_tt, u0, u0_t, ub1, ub2 = outs
        r = u_tt - (self.p.c ** 2) * u_xx
        r_pos = u0 - jnp.sin(ctx["x"])
        return _smean(jnp.square(r) + jnp.square(r_pos)
                      + self.p.velocity_weight * jnp.square(u0_t)
                      + jnp.square(ub1) + jnp.square(ub2), ctx)


@dataclass(frozen=True)
class PoissonSpec:
    """−Δu = f, elliptic BVP (equations.poisson): no time axis at all."""
    p: object
    n_uniform: int = 3
    groups = (Group(n_second=2),                       # interior Laplacian
              Group(), Group(), Group(), Group())      # 4 boundary faces

    def build(self, u):
        x = self.p.x_max * u[:, :1]
        y = self.p.x_max * u[:, 1:2]
        e = self.p.x_max * u[:, 2:3]
        zero = jnp.zeros_like(x)
        one = jnp.ones_like(x)
        xmax = jnp.full_like(x, self.p.x_max)
        X = jnp.concatenate([
            _cat(x, y), _cat(one, zero), _cat(zero, zero),
            _cat(zero, one), _cat(zero, zero),
            _cat(zero, e), _cat(xmax, e), _cat(e, zero), _cat(e, xmax),
        ], 0)
        return X, {"x": x, "y": y}

    def loss(self, outs, ctx):
        u_, u_x, u_xx, u_y, u_yy, b1, b2, b3, b4 = outs
        src = 2.0 * jnp.sin(ctx["x"]) * jnp.sin(ctx["y"])
        r = -(u_xx + u_yy) - src
        return _smean(jnp.square(r) + jnp.square(b1) + jnp.square(b2)
                      + jnp.square(b3) + jnp.square(b4), ctx)


@dataclass(frozen=True)
class Heat2DSpec:
    """u_t = κ·(u_xx + u_yy) (equations.heat2d): 11 logical streams."""
    p: object
    n_uniform: int = 4
    groups = (Group(n_second=2, n_first=1),            # interior
              Group(),                                 # t=0 face
              Group(), Group(), Group(), Group())      # 4 boundary faces

    def build(self, u):
        x = self.p.x_max * u[:, :1]
        y = self.p.x_max * u[:, 1:2]
        t = self.p.t_max * u[:, 2:3]
        e = self.p.x_max * u[:, 3:4]
        zero = jnp.zeros_like(x)
        one = jnp.ones_like(x)
        xmax = jnp.full_like(x, self.p.x_max)
        X = jnp.concatenate([
            _cat(x, y, t),
            _cat(one, zero, zero), _cat(zero, zero, zero),
            _cat(zero, one, zero), _cat(zero, zero, zero),
            _cat(zero, zero, one),
            _cat(x, y, zero),
            _cat(zero, e, t), _cat(xmax, e, t),
            _cat(e, zero, t), _cat(e, xmax, t),
        ], 0)
        return X, {"x": x, "y": y}

    def loss(self, outs, ctx):
        u_, u_x, u_xx, u_y, u_yy, u_t, u0, b1, b2, b3, b4 = outs
        r = u_t - self.p.kappa * (u_xx + u_yy)
        r0 = u0 - jnp.sin(ctx["x"]) * jnp.sin(ctx["y"])
        return _smean(jnp.square(r) + jnp.square(r0) + jnp.square(b1)
                      + jnp.square(b2) + jnp.square(b3) + jnp.square(b4),
                      ctx)


@dataclass(frozen=True)
class HardHeatSpec:
    """Heat equation with the HARD-constraint trial function
    u = sin(x) + D·N, D = t·x·(x_max−x)/scale (models/hard.py
    heat1d_ansatz). The constraints hold exactly for any params, so the
    spec carries ONLY the interior group — R=5 streams vs the soft spec's
    7; the fused hard path is structurally FASTER than soft. The ansatz
    derivatives are analytic and composed in the loss:

        u_t  = D_t·N + D·N_t
        u_xx = A_xx + D_xx·N + 2·D_x·N_x + D·N_xx
    """
    p: object
    n_uniform: int = 2
    groups = (Group(n_second=1, n_first=1),)   # N, (N_x, N_xx), N_t

    def build(self, u):
        x = self.p.x_max * u[:, :1]
        t = self.p.t_max * u[:, 1:2]
        zero = jnp.zeros_like(x)
        one = jnp.ones_like(x)
        X = jnp.concatenate([
            _cat(x, t), _cat(one, zero), _cat(zero, zero), _cat(zero, one),
        ], 0)
        return X, {"x": x, "t": t}

    def loss(self, outs, ctx):
        n, n_x, n_xx, n_t = outs
        p = self.p
        x, t = ctx["x"], ctx["t"]
        scale = p.t_max * (p.x_max / 2.0) ** 2
        g = x * (p.x_max - x)
        D = t * g / scale
        D_t = g / scale
        D_x = t * (p.x_max - 2.0 * x) / scale
        D_xx = -2.0 * t / scale
        u_t = D_t * n + D * n_t
        u_xx = -jnp.sin(x) + D_xx * n + 2.0 * D_x * n_x + D * n_xx
        return _smean(jnp.square(u_t - p.kappa * u_xx), ctx)


@dataclass(frozen=True)
class HardSimpleODESpec:
    """simple_ode with the hard IC ansatz y = y_ic + (t/t_max)·N
    (models/hard.py time_ic_ansatz): interior-only, R=2 streams vs the
    soft spec's 3. Residual: y' + y with y' = N/t_max + (t/t_max)·N_t."""
    p: object
    n_uniform: int = 1
    groups = (Group(n_first=1),)   # N, N_t

    def build(self, u):
        t = (self.p.sample_scale * self.p.t_max) * u[:, :1]
        one = jnp.ones_like(t)
        X = jnp.concatenate([t, one], 0)
        return X, {"t": t}

    def loss(self, outs, ctx):
        n, n_t = outs
        p = self.p
        t = ctx["t"]
        y = p.y_ic + (t / p.t_max) * n
        dydt = n / p.t_max + (t / p.t_max) * n_t
        return _smean(jnp.square(dydt + y), ctx)


@dataclass(frozen=True)
class HardHeat2DSpec:
    """2-D heat with the hard ansatz u = sin(x)sin(y) + D·N,
    D = t·x(x_max−x)·y(x_max−y)/scale (models/hard.py heat2d_ansatz):
    interior-only — R=6 streams vs the soft spec's 12, and 3 uniforms per
    point vs 4 (no boundary-edge sampling)."""
    p: object
    n_uniform: int = 3
    groups = (Group(n_second=2, n_first=1),)  # N, (N_x,N_xx), (N_y,N_yy), N_t

    def build(self, u):
        x = self.p.x_max * u[:, :1]
        y = self.p.x_max * u[:, 1:2]
        t = self.p.t_max * u[:, 2:3]
        zero = jnp.zeros_like(x)
        one = jnp.ones_like(x)
        X = jnp.concatenate([
            _cat(x, y, t),
            _cat(one, zero, zero), _cat(zero, zero, zero),
            _cat(zero, one, zero), _cat(zero, zero, zero),
            _cat(zero, zero, one),
        ], 0)
        return X, {"x": x, "y": y, "t": t}

    def loss(self, outs, ctx):
        n, n_x, n_xx, n_y, n_yy, n_t = outs
        p = self.p
        x, y, t = ctx["x"], ctx["y"], ctx["t"]
        scale = p.t_max * (p.x_max / 2.0) ** 4
        gx = x * (p.x_max - x)
        gy = y * (p.x_max - y)
        D = t * gx * gy / scale
        D_t = gx * gy / scale
        D_x = t * (p.x_max - 2.0 * x) * gy / scale
        D_xx = -2.0 * t * gy / scale
        D_y = t * gx * (p.x_max - 2.0 * y) / scale
        D_yy = -2.0 * t * gx / scale
        A = jnp.sin(x) * jnp.sin(y)
        u_t = D_t * n + D * n_t
        u_xx = -A + D_xx * n + 2.0 * D_x * n_x + D * n_xx
        u_yy = -A + D_yy * n + 2.0 * D_y * n_y + D * n_yy
        r = u_t - p.kappa * (u_xx + u_yy)
        return _smean(jnp.square(r), ctx)


@dataclass(frozen=True)
class HardWaveSpec:
    """Wave equation, hard constraint u = sin(x) + D·N with
    D = t²·x·(x_max−x)/scale (models/hard.py wave1d_ansatz — the t² factor
    pins position AND velocity ICs exactly). Interior-only: R=5 vs soft's
    9 streams."""
    p: object
    n_uniform: int = 2
    groups = (Group(n_second=2),)   # N, (N_x, N_xx), (N_t, N_tt)

    def build(self, u):
        x = self.p.x_max * u[:, :1]
        t = self.p.t_max * u[:, 1:2]
        zero = jnp.zeros_like(x)
        one = jnp.ones_like(x)
        X = jnp.concatenate([
            _cat(x, t), _cat(one, zero), _cat(zero, zero),
            _cat(zero, one), _cat(zero, zero),
        ], 0)
        return X, {"x": x, "t": t}

    def loss(self, outs, ctx):
        n, n_x, n_xx, n_t, n_tt = outs
        p = self.p
        x, t = ctx["x"], ctx["t"]
        scale = p.t_max ** 2 * (p.x_max / 2.0) ** 2
        g = x * (p.x_max - x)
        D = t * t * g / scale
        D_t = 2.0 * t * g / scale
        D_tt = 2.0 * g / scale
        D_x = t * t * (p.x_max - 2.0 * x) / scale
        D_xx = -2.0 * t * t / scale
        u_tt = D_tt * n + 2.0 * D_t * n_t + D * n_tt
        u_xx = -jnp.sin(x) + D_xx * n + 2.0 * D_x * n_x + D * n_xx
        return _smean(jnp.square(u_tt - (p.c ** 2) * u_xx), ctx)


@dataclass(frozen=True)
class HardPoissonSpec:
    """Poisson BVP, hard constraint u = D·N with
    D = x(x_max−x)·y(x_max−y)/scale (models/hard.py poisson_ansatz).
    Interior-only: R=5 vs soft's 9 streams, and only 2 uniforms per point
    (the soft spec needs a third for its boundary-edge sampling)."""
    p: object
    n_uniform: int = 2
    groups = (Group(n_second=2),)   # N, (N_x, N_xx), (N_y, N_yy)

    def build(self, u):
        x = self.p.x_max * u[:, :1]
        y = self.p.x_max * u[:, 1:2]
        zero = jnp.zeros_like(x)
        one = jnp.ones_like(x)
        X = jnp.concatenate([
            _cat(x, y), _cat(one, zero), _cat(zero, zero),
            _cat(zero, one), _cat(zero, zero),
        ], 0)
        return X, {"x": x, "y": y}

    def loss(self, outs, ctx):
        n, n_x, n_xx, n_y, n_yy = outs
        p = self.p
        x, y = ctx["x"], ctx["y"]
        scale = (p.x_max / 2.0) ** 4
        gx = x * (p.x_max - x)
        gy = y * (p.x_max - y)
        D = gx * gy / scale
        D_x = (p.x_max - 2.0 * x) * gy / scale
        D_xx = -2.0 * gy / scale
        D_y = gx * (p.x_max - 2.0 * y) / scale
        D_yy = -2.0 * gx / scale
        u_xx = D_xx * n + 2.0 * D_x * n_x + D * n_xx
        u_yy = D_yy * n + 2.0 * D_y * n_y + D * n_yy
        src = 2.0 * jnp.sin(x) * jnp.sin(y)
        return _smean(jnp.square(-(u_xx + u_yy) - src), ctx)


@dataclass(frozen=True)
class VolterraSpec:
    """Volterra II integral equation, rescaled Gauss–Legendre quadrature
    (equations.volterra): value-only streams — the collocation batch plus
    one group per quadrature node. The node positions are x·c_j with c_j a
    COMPILE-TIME scalar (Gauss abscissa mapped to (0,1)), so the variable
    integration limit needs no const operand: each group's inputs and the
    loss weights are literal-scaled copies of x."""
    p: object
    n_uniform: int = 1

    @property
    def groups(self):
        return tuple(Group() for _ in range(1 + self.p.k))

    def _nodes(self):
        # Host-side numpy (same leggauss rule as ops.gauss_legendre_nodes):
        # the scalars must be Python floats even when build() is traced.
        u, w = np.polynomial.legendre.leggauss(self.p.k)
        cs = [(float(c) + 1.0) * 0.5 for c in u]
        ws = [float(v) * 0.5 for v in w]
        return cs, ws

    def build(self, u):
        x = self.p.upper * u[:, :1]
        cs, _ = self._nodes()
        X = jnp.concatenate([x] + [x * c for c in cs], 0)
        return X, {"x": x}

    # Precompute the full selection matrix when it fits this element budget
    # (fp32: 4 MiB of VMEM const); bigger tiles (512-row sweep evaluators)
    # fall back to the per-step iota construction.
    P_MAX_ELEMS = 1 << 20

    def make_const(self, B):
        """Quadrature selection constant — rides the kernel's const operand
        (a captured ndarray constant is rejected by pallas_call). Two
        layouts, distinguished by shape[0] in :meth:`loss`:

        * [B, (1+k)·B] — the FULL selection matrix P[b, (1+j)·B+b] =
          (c_j−1)·w_j, host-precomputed. The matrix is constant across
          steps, so building it per step from two [B, (1+k)·B] iotas +
          floor/compare/select (~6 VPU passes over the block, every step)
          was pure waste — VERDICT r5 (r4 weak #4).
        * [1, (1+k)·B] — the per-column coefficient row (the old layout),
          kept for tiles where the full matrix would blow the VMEM budget;
          the loss then rebuilds P from iotas in-kernel as before.
        """
        cs, ws = self._nodes()
        coeff = np.concatenate(
            [np.zeros(B, np.float32)]
            + [np.full(B, (c - 1.0) * w, np.float32)
               for c, w in zip(cs, ws)])
        if (1 + self.p.k) * B * B <= self.P_MAX_ELEMS:
            col = np.arange((1 + self.p.k) * B)
            P = np.where(col[None, :] % B == np.arange(B)[:, None],
                         coeff[None, :], 0.0).astype(np.float32)
            return jnp.asarray(P)
        return jnp.asarray(coeff)[None, :]

    def loss(self, outs, ctx):
        x = ctx["x"]
        yhat = outs[0]
        # ∫₀ˣ (t−x)·y(t) dt ≈ Σ_j (x·c_j − x)·y_j·(x·w_j)  [t_j = x·c_j]
        #                   = x² · Σ_j (c_j−1)·w_j · y_j.
        # The per-sample node sum is ONE matmul with a constant selection
        # matrix: P[b, (1+j)·B + b] = (c_j−1)·w_j, acc = P @ out. A scalar
        # -weighted accumulation loop over the k node groups (the previous
        # layout) is 2k serial [B,1] VPU ops using 1/128 lanes each — the
        # measured reason the volterra kernel only TIED the XLA scan.
        B = yhat.shape[0]
        out_full = jnp.concatenate(outs, 0)              # [(1+k)·B, 1]
        const = ctx["const"]
        if const.shape[0] == B:
            # Host-precomputed selection matrix (see make_const): the
            # quadrature sum is ONE matmul, no per-step matrix build.
            acc = jnp.dot(const, out_full, precision=_HIGH)  # [B, 1]
        else:
            coeff = const                                # [1, (1+k)·B]
            # col mod B in FLOAT, same construction as AdvectionSpec's
            # stride permutation above: Mosaic rejects vector integer rem,
            # and the CPU tests run in interpret mode where an int rem
            # would pass CI yet fail to lower on the chip (ADVICE r3).
            # col < (1+k)·B ≪ 2^24 so the products are exact in fp32.
            # fp32 regardless of the kernel phase dtype: col reaches
            # (1+k)·B (thousands), past bf16's 8-bit mantissa.
            shape = (B, coeff.shape[1])
            row = jax.lax.broadcasted_iota(jnp.int32, shape, 0).astype(
                jnp.float32)
            col = jax.lax.broadcasted_iota(jnp.int32, shape, 1).astype(
                jnp.float32)
            q = jnp.floor(col * (1.0 / B))
            P = jnp.where(col - q * float(B) == row, coeff, 0.0)
            acc = jnp.dot(P, out_full, precision=_HIGH)  # [B, 1]
        r = yhat - x - (x * x) * acc
        return _smean(jnp.square(r), ctx)


@dataclass(frozen=True)
class UATSpec:
    """Universal-approximation demo: full-batch MSE fit of sin(freq·x) on
    the fixed [low, high] grid (equations.uat; ref
    demo_universal_approx_theorem.py:50-73). The simplest possible spec —
    one value-only group, targets computed in-kernel from an iota grid.
    The B kernel rows ARE the grid (B = n_points at the deployment
    default; any other B trains on a B-point linspace of the same span).
    Trains the reference's Perceptron (1→H→1 tanh) via the L=0 engine
    layout: zeroed hidden tensors see zero grads, so Adam leaves them 0."""
    p: object
    n_uniform: int = 1
    groups = (Group(),)

    def build(self, u):
        B = u.shape[0]
        # int32 iota then cast: Mosaic's tpu.iota is integer-only (a float
        # iota verifies in interpret mode but fails to lower on the chip —
        # caught by the round-5 on-chip verify drive).
        i = jax.lax.broadcasted_iota(jnp.int32, (B, 1), 0).astype(jnp.float32)
        x = self.p.low + (self.p.high - self.p.low) * i / max(B - 1, 1)
        return x, {"x": x}

    def loss(self, outs, ctx):
        y = outs[0]
        return _smean(jnp.square(y - jnp.sin(self.p.freq * ctx["x"])), ctx)

    def supports_model(self, model):
        return type(model).__name__ == "Perceptron"

    @staticmethod
    def pack(model, params):
        w1 = params["fc1"]["w"]
        H = model.hidden_size
        lead = w1.shape[:-2]  # () single / (N,) stacked pytrees
        return (w1, params["fc1"]["b"],
                jnp.zeros(lead + (1, H, H), w1.dtype),
                jnp.zeros(lead + (1, H), w1.dtype),
                params["fc2"]["w"], params["fc2"]["b"])

    @staticmethod
    def unpack(model, flat):
        return {"fc1": {"w": flat[0], "b": flat[1]},
                "fc2": {"w": flat[4], "b": flat[5]}}


@dataclass(frozen=True)
class InverseHeatSpec:
    """Inverse heat problem (equations.inverse_heat): jointly train the
    solution MLP and the unknown diffusivity log κ̂ — the κ̂ scalar rides
    the engine's ``extra_shapes`` slot as a [1, 1] tensor, Adam-updated
    in-kernel alongside the six MLP tensors; its gradient flows through
    the loss vjp (the residual term u_t − exp(log κ̂)·u_xx).

    Streams: interior value + (x', x'') Taylor pair + t' tangent, plus one
    value-only group for the observation minibatch. The fixed synthetic
    observation dataset [n_obs, 3] (x, t, u_obs) rides the const operand;
    each step's B observation rows are selected by ONE one-hot [B, n_obs]
    matmul built from a uniform column (floor(u·n_obs) — float-iota
    compare, no gather: Mosaic-safe, same construction as VolterraSpec's
    selection matrix), matching the scan path's per-step randint draw in
    distribution."""
    p: object
    n_uniform: int = 3
    groups = (Group(n_second=1, n_first=1),  # interior: v, (x', x''), t'
              Group())                       # observation minibatch
    extra_shapes = ((1, 1),)                 # log κ̂
    build_with_const = True

    def make_const(self, B):
        obs_xt, obs_u = self.p.observations()
        return jnp.concatenate([obs_xt, obs_u], axis=1)  # [n_obs, 3]

    def build(self, u, const):
        x = self.p.x_max * u[:, :1]
        t = self.p.t_max * u[:, 1:2]
        zero = jnp.zeros_like(x)
        one = jnp.ones_like(x)
        n_obs = const.shape[0]
        # One-hot observation selection: row b picks index floor(u3·n_obs).
        # Float compare (col indices ≤ n_obs ≪ 2^24, exact in fp32); the
        # two [B, n_obs] matmuls stay fp32 regardless of the kernel phase
        # (bf16 would quantise the observation values themselves).
        sel = jnp.floor(u[:, 2:3] * n_obs)
        col = jax.lax.broadcasted_iota(
            jnp.int32, (x.shape[0], n_obs), 1).astype(jnp.float32)
        P = (col == sel).astype(const.dtype)
        obs_xt = jnp.dot(P, const[:, :2], precision=_HIGH)
        obs_u = jnp.dot(P, const[:, 2:3], precision=_HIGH)
        X = jnp.concatenate([
            _cat(x, t), _cat(one, zero), _cat(zero, zero), _cat(zero, one),
            obs_xt,
        ], 0)
        return X, {"obs_u": obs_u}

    def loss(self, outs, ctx):
        u_, u_x, u_xx, u_t, y_obs = outs
        kappa = jnp.exp(ctx["extras"][0])  # [1, 1] broadcasts over [B, 1]
        r = u_t - kappa * u_xx
        d = y_obs - ctx["obs_u"]
        return _smean(jnp.square(r)
                      + self.p.data_weight * jnp.square(d), ctx)

    def supports_model(self, model):
        net = getattr(model, "net", None)
        return (type(model).__name__ == "_InverseModel" and net is not None
                and type(net).__name__ == "MLP" and net.batch_norm is None
                and net.activation == "tanh"
                and not getattr(net, "fourier_features", 0))

    @staticmethod
    def pack(model, params):
        flat = pack_params(model.net, params["net"])
        lk = params["log_kappa"]
        return flat + (jnp.reshape(lk, lk.shape + (1, 1)),)

    @staticmethod
    def unpack(model, flat):
        lk = flat[6]
        return {"net": unpack_params(model.net, flat[:6]),
                "log_kappa": jnp.reshape(lk, lk.shape[:-2])}


SPECS = {
    "simple_ode": SimpleODESpec,
    "heat": HeatSpec,
    "burgers": BurgersSpec,
    "wave": WaveSpec,
    "advection": AdvectionSpec,
    "poisson": PoissonSpec,
    "heat2d": Heat2DSpec,
    "volterra": VolterraSpec,
    "uat": UATSpec,
    "inverse_heat": InverseHeatSpec,
}


HARD_SPECS = {
    "simple_ode": HardSimpleODESpec,
    "heat": HardHeatSpec,
    "heat2d": HardHeat2DSpec,
    "wave": HardWaveSpec,
    "poisson": HardPoissonSpec,
}


def spec_for(problem):
    """The stream spec for ``problem``, or None if it has no fused path."""
    if getattr(problem, "constraint", "soft") == "hard":
        # Hard-constraint trial functions: interior-only specs composing
        # the analytic ansatz derivatives (fewer streams than soft).
        cls = HARD_SPECS.get(problem.name)
        return cls(problem) if cls else None
    cls = SPECS.get(problem.name)
    if cls is None:
        return None
    if getattr(problem, "taps", "jvp") == "pallas":
        return None
    if problem.name == "volterra" and problem.quadrature != "gauss":
        # The stochastic-quadrature mode draws fresh nodes per step; only
        # the deterministic Gauss rule has compile-time node scalars.
        return None
    return cls(problem)


# ---------------------------------------------------------------------------
# The kernel (scaffolding mirrors fused_train; step math is the spec's)
# ---------------------------------------------------------------------------


def _largest_divisor_leq(K, cap):
    best = 1
    i = 1
    while i * i <= K:
        if K % i == 0:
            for d in (i, K // i):
                if cap >= d > best:
                    best = d
        i += 1
    return best


def fused_engine_chunk(spec, model, params, m, v, uniforms, step0, lrate,
                       steps_per_cell: int | None = None,
                       batch_tile: int | None = None, precision=_HIGH,
                       schedule="constant", total_steps=1, decay=0.1,
                       runtime_bs=None, runtime_steps=None,
                       trial_horizon=True):
    """Run ``K = uniforms.shape[0]`` Adam steps of ``spec``'s equation inside
    one Pallas kernel (shared scaffolding: kernels.engine_core). VMEM
    strategy scales with the spec's stream count; batches above the tile
    cap run as gradient-accumulation tiles."""
    from differential_equations_dnn_tpu.kernels.engine_core import (
        run_fused_chunk,
    )

    K, B, U = uniforms.shape
    D, H, L, O = _engine_dims(model)
    R = _n_rows(spec.groups)
    if steps_per_cell is None:
        # Anchor: heat (R=7) runs S=100 at B=64 -> working set ~ R*B*S rows.
        steps_per_cell = max(1, 44_800 // (R * B))
    # Largest divisor of K within the budget (lane-packed loss rows hold
    # <=128 steps per grid cell).
    S = _largest_divisor_leq(K, min(steps_per_cell, 128))
    # Tile cap: keep R*tile*H <= ~3.6k*128 activation ELEMENTS -- sized for
    # the 64 MiB VMEM grant at the H=128 anchor (measured: poisson R=9 and
    # heat2d R=12 run full-batch-256 tiles at +20-25% over split tiles; the
    # old 16 MiB-era cap of 256*7/R rows forced T=2 on both). Wide models
    # scale the row budget down by 128/H (the per-stage working set is
    # rows x H; H=512 at the unscaled cap stack-OOMs the 64 MiB scoped
    # grant — measured 118.8M, 2026-08-18 v5e), and QUADRATICALLY past
    # H=256 (weight-shaped grad temporaries are H² and one set stays live
    # per accumulation tile: H=512 tile=128 still OOMs at 83.7M; tile=64
    # compiles). The fused throughput sweet spot is H <= 256 (41 TFLOP/s
    # at H=256 B=512); H=512 lowers but Mosaic spills to HBM and crawls —
    # prefer engine='scan' there. Halve until it divides B. Narrow models
    # (H < 128) pad to 128 lanes in VMEM, so their working set does NOT
    # shrink — clamp the numerator from below to keep the full cap
    # (ADVICE r4: min(256, H) was halving H=64's row budget for nothing).
    cap = max(64,
              (512 * 7 * 128 * min(256, max(H, 128))) // (R * max(H, 128) ** 2))
    if batch_tile is None:
        batch_tile = B
        while batch_tile > cap and batch_tile % 2 == 0:
            batch_tile //= 2
    if B % batch_tile:
        raise ValueError(f"batch {B} not divisible by batch_tile {batch_tile}")
    T = B // batch_tile

    def step_math(p, u, const, batch_mask=None, inv_bs=None):
        return engine_step_math(spec, p, u, u.shape[0], L, precision,
                                batch_mask=batch_mask, inv_bs=inv_bs,
                                const=const)

    const = (spec.make_const(B // T) if hasattr(spec, "make_const")
             else None)
    shapes = _shapes_for(spec, model)
    return run_fused_chunk(step_math, shapes, params, m, v, uniforms, step0,
                           lrate, S, T=T, const=const, schedule=schedule,
                           total_steps=total_steps, decay=decay,
                           runtime_bs=runtime_bs, runtime_steps=runtime_steps,
                           trial_horizon=trial_horizon)


# ---------------------------------------------------------------------------
# Host-side driver
# ---------------------------------------------------------------------------


def supports(problem, model=None) -> bool:
    """True if (problem, model) can train on the generic fused engine."""
    spec = spec_for(problem)
    if spec is None:
        return False
    model = model or problem.default_model()
    check = getattr(spec, "supports_model", None)
    if check is not None:
        # Spec-specific model contract (UAT's Perceptron, inverse_heat's
        # net+κ wrapper) replaces the default plain-tanh-MLP rule.
        return bool(check(model))
    hard_problem = getattr(problem, "constraint", "soft") == "hard"
    if type(model).__name__ == "HardConstraint":
        if not hard_problem:
            return False   # ansatz model on a soft spec: loss mismatch
        # The HARD_SPECS bake the problem's DEFAULT ansatz algebra into
        # their in-kernel losses. A user-supplied HardConstraint with a
        # custom ansatz (or the default builder at different constants)
        # must train on the scan engine — routing it here would train one
        # objective and evaluate another (ADVICE r3). Builders tag their
        # closures (models/hard._tag); compare against the problem's own.
        expected = getattr(problem.default_model().ansatz, "_deq_tag", None)
        if getattr(model.ansatz, "_deq_tag", None) != expected:
            return False
        model = model.net  # the kernel trains the RAW net; the spec's
        #                    loss re-applies the analytic ansatz
    elif hard_problem:
        return False       # hard spec needs the problem's ansatz wrapper
    return (type(model).__name__ == "MLP" and model.batch_norm is None
            and model.activation == "tanh"
            and not getattr(model, "fourier_features", 0))


def train_fused_result(problem, key, iterations, batch_size=64, lrate=1e-4,
                       chunk_size=25_000, model=None, params=None,
                       opt_state=None, start_step: int = 0,
                       steps_per_cell: int | None = None,
                       precision: str = "highest",
                       schedule: str | None = None, decay: float = 0.1,
                       total_steps: int | None = None,
                       mixed_split: float = 0.65):
    """Train any spec-registered equation with the generic fused kernel.
    Same contract as fused_train.train_heat_fused_result: returns a
    TrainResult; resuming with params + opt_state + start_step continues
    bit-identically (absolute-step-keyed collocation draws).

    ``schedule`` (None = the problem's default) applies the trainer's lr
    schedules inside the kernel. ``total_steps`` is the schedule's decay
    horizon (default ``start_step + iterations``); a run that will later be
    resumed past ``iterations`` must pass its FULL planned budget here so
    both legs sit on the same decay curve.

    ``precision="mixed"`` runs the first ``mixed_split`` of the budget on
    the bf16 MXU path and the final phase at exact fp32, chained through
    the bit-exact resume path (one dispatch when the budget fits a single
    chunk) — same schedule as fused_train's heat kernel."""
    import time

    from differential_equations_dnn_tpu.train.trainer import TrainResult

    spec = spec_for(problem)
    if spec is None:
        raise ValueError(f"no fused-engine spec for equation "
                         f"{problem.name!r} (available: {sorted(SPECS)})")
    model = model or problem.default_model()
    if not supports(problem, model):
        raise ValueError("fused engine supports plain tanh MLPs only")
    if schedule is None:
        schedule = problem.defaults.schedule
    if total_steps is None:
        total_steps = start_step + iterations
    if precision == "mixed":
        n1 = int(iterations * mixed_split)
        n2 = iterations - n1
        if n1 == 0 or n2 == 0:
            precision = "highest"
        else:
            common = dict(batch_size=batch_size, lrate=lrate,
                          chunk_size=chunk_size, model=model,
                          steps_per_cell=steps_per_cell, schedule=schedule,
                          decay=decay, total_steps=total_steps)
            if iterations > chunk_size:
                # Chunked budgets: two internally-chunked phases chained
                # through the bit-exact resume path.
                coarse = train_fused_result(
                    problem, key, n1, params=params, opt_state=opt_state,
                    start_step=start_step, precision="default", **common)
                fine = train_fused_result(
                    problem, key, n2, params=coarse.params,
                    opt_state=coarse.opt_state, start_step=start_step + n1,
                    precision="highest", **common)
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
            return _train_mixed_single_dispatch(
                problem, spec, key, iterations, n1, start_step, params,
                opt_state, **common)
    mxu_precision = _PRECISIONS[precision]

    run_key, flat, m, v = fused_prologue(
        model, _pack_fn(spec, model), key, params, opt_state)

    run = jax.jit(functools.partial(
        fused_engine_chunk, spec, model, lrate=lrate,
        steps_per_cell=steps_per_cell, precision=mxu_precision,
        schedule=schedule, total_steps=total_steps, decay=decay,
    ))

    @functools.partial(jax.jit, static_argnames=("n",))
    def draw(rk, start, n):
        return jax.vmap(
            lambda i: jax.random.uniform(jax.random.fold_in(rk, i),
                                         (batch_size, spec.n_uniform))
        )(start + jnp.arange(n))

    chunk = max(1, min(chunk_size, iterations))
    t0 = time.perf_counter()
    u0 = cached_call(draw, run_key, start_step, label="draw", n=chunk)
    compiled = cached_compile(run, flat, m, v, u0, start_step,
                              label=f"eng-{problem.name}")
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
    unpack = _unpack_fn(spec, model)
    return TrainResult(
        params=unpack(flat),
        opt_state={"m": unpack(m), "v": unpack(v)},
        loss_history=np.concatenate(losses_out),
        wall_time=wall,
        iters_per_sec=iterations / wall if wall else float("inf"),
        compile_time=compile_time,
    )


def fused_engine_packed_chunk(spec, model, params, m, v, uniforms, step0,
                              lrate, n_replicas, rep_tile=None,
                              steps_per_cell: int | None = None,
                              batch_tile: int | None = None,
                              precision=_HIGH, schedule="constant",
                              total_steps=1, decay=0.1,
                              lr_vec=None, bs_vec=None, steps_vec=None,
                              mask_rows=False, trial_horizon=True):
    """Packed-replica twin of :func:`fused_engine_chunk`: one Pallas
    dispatch advances ``n_replicas`` independent runs by K steps each
    (state tensors replica-stacked — kernels.engine_core.stack_replicas).
    Same S/T sizing rules as the single-replica chunk. (A vmapped
    interleave step-math mode was measured 58x slower end-to-end and
    retired — benchmarks/probe_mxu_overlap.py + docs/KERNELS.md.)"""
    from differential_equations_dnn_tpu.kernels.engine_core import (
        run_fused_packed,
    )

    K, B, U = uniforms.shape
    D, H, L, O = _engine_dims(model)
    R = _n_rows(spec.groups)
    if steps_per_cell is None:
        steps_per_cell = max(1, 44_800 // (R * B))
    S = _largest_divisor_leq(K, min(steps_per_cell, 128))
    # H-scaled row budget — see fused_engine_chunk's cap comment.
    cap = max(64,
              (512 * 7 * 128 * min(256, max(H, 128))) // (R * max(H, 128) ** 2))
    if batch_tile is None:
        batch_tile = B
        while batch_tile > cap and batch_tile % 2 == 0:
            batch_tile //= 2
    if B % batch_tile:
        raise ValueError(f"batch {B} not divisible by batch_tile {batch_tile}")
    T = B // batch_tile
    shapes = _shapes_for(spec, model)
    if rep_tile is None:
        # Bound the resident replica-group state (p+m+v, in+out copies) to
        # ~24 MiB of the 100 MiB VMEM grant, leaving room for the step
        # working set and pipeline buffers.
        per_rep = sum(int(np.prod(s)) for s in shapes) * 4 * 6
        rep_tile = _largest_divisor_leq(
            n_replicas, max(1, min(16, (24 << 20) // max(per_rep, 1))))

    def step_math(p, u, const, batch_mask=None, inv_bs=None):
        return engine_step_math(spec, p, u, u.shape[0], L, precision,
                                batch_mask=batch_mask, inv_bs=inv_bs,
                                const=const)

    const = (spec.make_const(B // T) if hasattr(spec, "make_const")
             else None)
    return run_fused_packed(step_math, shapes, params, m, v, uniforms,
                            step0, lrate, S, n_replicas, rep_tile=rep_tile,
                            T=T, const=const, schedule=schedule,
                            total_steps=total_steps, decay=decay,
                            lr_vec=lr_vec, bs_vec=bs_vec,
                            steps_vec=steps_vec, mask_rows=mask_rows,
                            trial_horizon=trial_horizon)


def train_fused_ensemble_packed(problem, key, iterations, n_replicas,
                                batch_size=64, lrate=1e-4, model=None,
                                precision: str = "highest",
                                schedule: str | None = None,
                                decay: float = 0.1, rep_tile=None,
                                chunk_size=25_000,
                                steps_per_cell: int | None = None,
                                mixed_split: float = 0.65, timings=None):
    """Train ``n_replicas`` independently-initialised replicas in PACKED
    Mosaic dispatches: every chunk is ONE kernel advancing all replicas
    (VERDICT r3 #3 — the sequential per-replica dispatch loop left the
    MXU idle between tiny programs; packing gives the scheduler N
    independent per-step chains to overlap, and one dispatch amortises
    the tunnel's per-dispatch latency over the whole ensemble).

    Key semantics MATCH the sequential trial evaluator
    (:func:`make_lr_evaluator`): ``init_key, run_key = cached_split(key)``,
    replica r initialised from ``fold_in(init_key, r)``, one shared
    collocation stream ``fold_in(run_key, step)`` — so replica r here is
    BIT-IDENTICAL to sequential trial r (tested in tests/test_fused_engine).

    Returns ``(stacked_params_pytree [N, ...], losses [N, iterations])``.
    """
    import time

    spec = spec_for(problem)
    if spec is None:
        raise ValueError(f"no fused-engine spec for equation "
                         f"{problem.name!r} (available: {sorted(SPECS)})")
    model = model or problem.default_model()
    if not supports(problem, model):
        raise ValueError("fused engine supports plain tanh MLPs only")
    if schedule is None:
        schedule = problem.defaults.schedule
    from differential_equations_dnn_tpu.kernels.engine_core import (
        stack_replicas,
        unstack_replicas,
    )

    shapes = _shapes_for(spec, model)
    pack = _pack_fn(spec, model)

    init_key, run_key = cached_split(key)

    def init_all(ik):
        flats = [pack(model.init(jax.random.fold_in(ik, r)))
                 for r in range(n_replicas)]
        zeros = tuple(jnp.zeros_like(t) for t in stack_replicas(flats))
        return stack_replicas(flats), zeros

    @functools.partial(jax.jit, static_argnames=("n",))
    def draw(rk, start, n):
        return jax.vmap(
            lambda i: jax.random.uniform(jax.random.fold_in(rk, i),
                                         (batch_size, spec.n_uniform))
        )(start + jnp.arange(n))

    common = dict(n_replicas=n_replicas, rep_tile=rep_tile,
                  steps_per_cell=steps_per_cell, schedule=schedule,
                  total_steps=iterations, decay=decay)
    n1 = int(iterations * mixed_split) if precision == "mixed" else 0
    if precision == "mixed" and (n1 == 0 or n1 == iterations):
        precision, n1 = "highest", 0
    # Mixed runs both phases in ONE program, so the whole budget rides one
    # chunk (the uniforms block streams HBM->VMEM; chunking only bounds the
    # host-side draw buffer, which stays modest at these budgets).
    chunk = (iterations if precision == "mixed"
             else max(1, min(chunk_size, iterations)))

    def run(flat, m, v, u, step0):
        if precision == "mixed" and u.shape[0] == iterations:
            # Whole budget in one dispatch: chain both phases in-program.
            flat, m, v, l1 = fused_engine_packed_chunk(
                spec, model, flat, m, v, u[:n1], 0, lrate,
                precision=jax.lax.Precision.DEFAULT, **common)
            flat, m, v, l2 = fused_engine_packed_chunk(
                spec, model, flat, m, v, u[n1:], n1, lrate,
                precision=jax.lax.Precision.HIGHEST, **common)
            return flat, m, v, jnp.concatenate([l1, l2], axis=1)
        if precision == "mixed":
            raise ValueError(
                "packed mixed precision needs the whole budget in one "
                "chunk (chunk_size >= iterations)")
        return fused_engine_packed_chunk(
            spec, model, flat, m, v, u, step0, lrate,
            precision=_PRECISIONS[precision], **common)

    t0 = time.perf_counter()
    flat, zeros = cached_call(jax.jit(init_all), init_key,
                              label=f"packinit-{n_replicas}")
    m = v = zeros
    u0 = cached_call(draw, run_key, 0, label="draw", n=chunk)
    jrun = jax.jit(run)
    compiled = cached_compile(jrun, flat, m, v, u0, 0,
                              label=f"engpack-{problem.name}-{n_replicas}")
    compile_time = time.perf_counter() - t0

    losses_out = []
    done = 0
    t0 = time.perf_counter()
    while done < iterations:
        k = min(chunk, iterations - done)
        u = u0 if done == 0 and k == chunk else draw(run_key, done, k)
        step_fn = compiled if k == chunk else jrun
        flat, m, v, losses = step_fn(flat, m, v, u, done)
        losses_out.append(losses)
        done += k
    flat = tuple(np.asarray(t) for t in flat)  # host-copy sync (honesty)
    wall = time.perf_counter() - t0
    if timings is not None:
        timings["compile_time"] = compile_time
        timings["run_time"] = wall
    losses = np.concatenate([np.asarray(l) for l in losses_out], axis=1)
    unpack = _unpack_fn(spec, model)
    params_list = [unpack(f)
                   for f in unstack_replicas(flat, shapes, n_replicas)]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *params_list)
    return stacked, losses


def make_lr_evaluator(problem, key, iterations, batch_size=64, model=None,
                      steps_per_cell: int | None = None,
                      precision: str = "highest",
                      schedule: str | None = None, decay: float = 0.1):
    """Compile ONE fused-kernel executable whose base lr is a runtime SMEM
    scalar, and return ``eval_fn(trial_index, lrate) -> (losses [K],
    flat_params)``: every call trains a freshly-initialised net for the
    FULL ``iterations`` budget at that lr through the same executable
    (measured ~0.22 s per 15k-iteration heat trial — init 0.04 + run 0.14
    + pull 0.04). The collocation stream is shared across trials; the
    init is keyed by ``trial_index``."""
    spec = spec_for(problem)
    if spec is None:
        raise ValueError(f"no fused-engine spec for {problem.name!r}")
    model = model or problem.default_model()
    if not supports(problem, model):
        raise ValueError("fused engine supports plain tanh MLPs only")
    if schedule is None:
        schedule = problem.defaults.schedule

    init_key, run_key = cached_split(key)
    _draw_all = jax.jit(lambda k: jax.vmap(
        lambda i: jax.random.uniform(jax.random.fold_in(k, i),
                                     (batch_size, spec.n_uniform))
    )(jnp.arange(iterations)))
    uniforms = cached_call(_draw_all, run_key, label="draw")

    common = dict(steps_per_cell=steps_per_cell, schedule=schedule,
                  total_steps=iterations, decay=decay)
    n1 = int(iterations * 0.65) if precision == "mixed" else 0
    if precision == "mixed" and (n1 == 0 or n1 == iterations):
        precision, n1 = "highest", 0

    def run(flat, m, v, u, lrate):
        if precision == "mixed":
            # Both phases chained in ONE program — same schedule as
            # train_fused_result's single-dispatch mixed path.
            flat, m, v, l1 = fused_engine_chunk(
                spec, model, flat, m, v, u[:n1], 0, lrate=lrate,
                precision=jax.lax.Precision.DEFAULT, **common)
            flat, m, v, l2 = fused_engine_chunk(
                spec, model, flat, m, v, u[n1:], n1, lrate=lrate,
                precision=jax.lax.Precision.HIGHEST, **common)
            return flat, m, v, jnp.concatenate([l1, l2])
        return fused_engine_chunk(
            spec, model, flat, m, v, u, 0, lrate=lrate,
            precision=_PRECISIONS[precision], **common)

    pack = _pack_fn(spec, model)
    memo_key = ("engev", problem, model, batch_size, iterations, precision,
                schedule, decay, steps_per_cell)
    jinit = _memo_compile(memo_key + ("init",), lambda: cached_compile(
        jax.jit(model.init), jax.random.fold_in(init_key, 0), label="init"))
    flat0 = pack(jinit(jax.random.fold_in(init_key, 0)))
    zeros = tuple(jnp.zeros_like(p) for p in flat0)
    compiled = _memo_compile(memo_key + ("kernel",), lambda: cached_compile(
        jax.jit(run), flat0, zeros, zeros, uniforms, np.float32(0.0),
        label=f"engev-{problem.name}"))

    def eval_fn(trial_index: int, lrate: float):
        flat = pack(jinit(jax.random.fold_in(init_key, trial_index)))
        p, _, _, losses = compiled(flat, zeros, zeros, uniforms,
                                   np.float32(lrate))
        return np.asarray(losses), p

    return eval_fn


def _sweep_prologue(problem, key, max_iters, max_batch, model, precision,
                    schedule):
    """Shared validation + key/stream derivation for the runtime-gated
    sweep evaluators. The sequential (:func:`make_sweep_evaluator`) and
    sharded (:func:`make_sharded_rung_evaluator`) evaluators BOTH route
    through this so their documented bit-identical equivalence cannot
    drift: same spec/model checks, same horizon padding (to a multiple
    of 1000 — a prime/odd max_iters would force S=1 steps per grid
    cell), same ``cached_split`` key split, same per-index uniform
    stream. Returns (spec, model, schedule, user_max, padded_max,
    init_key, uniforms)."""
    spec = spec_for(problem)
    if spec is None:
        raise ValueError(f"no fused-engine spec for {problem.name!r}")
    model = model or problem.default_model()
    if not supports(problem, model):
        raise ValueError("fused engine supports plain tanh MLPs only")
    if schedule is None:
        schedule = problem.defaults.schedule
    if precision == "mixed":
        raise ValueError("the sweep evaluator is single-phase (the mixed "
                         "schedule's phase split is compile-time, the "
                         "trial budget is runtime); use 'highest' or "
                         "'default'")
    user_max = max_iters
    max_iters = -(-max_iters // 1000) * 1000
    init_key, run_key = cached_split(key)
    _draw_all = jax.jit(lambda k: jax.vmap(
        lambda i: jax.random.uniform(jax.random.fold_in(k, i),
                                     (max_batch, spec.n_uniform))
    )(jnp.arange(max_iters)))
    uniforms = cached_call(_draw_all, run_key, label="draw")
    return spec, model, schedule, user_max, max_iters, init_key, uniforms


def make_sweep_evaluator(problem, key, max_iters, max_batch=512, model=None,
                         steps_per_cell: int | None = None,
                         precision: str = "highest",
                         schedule: str | None = None, decay: float = 0.1,
                         horizon: str = "trial"):
    """Compile ONE fused executable covering the FULL reference search space
    (optimize_heat_ray.py:173-176: batch_size, n_iters, lrate) and return
    ``eval_fn(trial_index, lrate, batch_size, n_iters) ->
    (losses [n_iters], flat_params)``.

    All three hyperparameters are runtime values: lr is the usual SMEM
    scalar, batch_size masks rows ≥ bs out of the loss (iota mask over a
    max_batch tile — the same masking the vmapped population applies in
    equations.base), and n_iters freezes every step past the trial's own
    budget (``pl.when`` skip), so the returned state IS the n_iters-step
    state and the final loss matches a standalone n_iters run over the
    same collocation stream.

    ``horizon`` picks the decay-schedule semantics ("constant" ignores
    it): "trial" (default) decays over each trial's OWN n_iters (runtime
    SMEM scalar) — every trial matches a standalone run of its budget;
    "fixed" decays over ``max_iters`` for every trial — the halving
    schedulers' continuation semantics, where a promoted trial's restart
    replays the identical lr(t) prefix, keeping restart == promotion
    exact under decay schedules too (VERDICT r3 #5)."""
    if horizon not in ("trial", "fixed"):
        raise ValueError(f"horizon must be 'trial' or 'fixed' ({horizon!r})")
    spec, model, schedule, user_max, max_iters, init_key, uniforms = \
        _sweep_prologue(problem, key, max_iters, max_batch, model,
                        precision, schedule)

    def run(flat, m, v, u, lrate, bs, n_steps):
        return fused_engine_chunk(
            spec, model, flat, m, v, u, 0, lrate=lrate,
            steps_per_cell=steps_per_cell,
            precision=_PRECISIONS[precision], schedule=schedule,
            # Fixed mode decays over the CALLER's max_iters (user_max),
            # not the padded compile horizon — a full-budget trial then
            # matches a standalone run of max_iters exactly.
            total_steps=user_max, decay=decay,
            runtime_bs=bs, runtime_steps=n_steps,
            trial_horizon=horizon == "trial")

    pack = _pack_fn(spec, model)
    memo_key = ("engsw", problem, model, max_batch, max_iters, user_max,
                precision, schedule, decay, horizon, steps_per_cell)
    jinit = _memo_compile(memo_key + ("init",), lambda: cached_compile(
        jax.jit(model.init), jax.random.fold_in(init_key, 0), label="init"))
    flat0 = pack(jinit(jax.random.fold_in(init_key, 0)))
    zeros = tuple(jnp.zeros_like(p) for p in flat0)
    compiled = _memo_compile(memo_key + ("kernel",), lambda: cached_compile(
        jax.jit(run), flat0, zeros, zeros, uniforms, np.float32(0.0),
        np.int32(max_batch), np.int32(max_iters),
        label=f"engsw-{problem.name}"))

    def eval_fn(trial_index: int, lrate: float, batch_size: int,
                n_iters: int):
        batch_size = max(1, min(int(batch_size), max_batch))
        n_iters = max(1, min(int(n_iters), user_max))
        flat = pack(jinit(jax.random.fold_in(init_key, trial_index)))
        p, _, _, losses = compiled(flat, zeros, zeros, uniforms,
                                   np.float32(lrate),
                                   np.int32(batch_size),
                                   np.int32(n_iters))
        return np.asarray(losses)[:n_iters], p

    return eval_fn


def make_sharded_rung_evaluator(problem, key, max_iters, mesh,
                                max_batch=512, model=None,
                                steps_per_cell: int | None = None,
                                precision: str = "highest",
                                schedule: str | None = None,
                                decay: float = 0.1,
                                horizon: str = "trial"):
    """Sharded counterpart of :func:`make_sweep_evaluator`: evaluate a
    VECTOR of runtime-gated trials in ONE dispatch, trials sharded over
    ``mesh``'s 'pop' axis via ``jax.shard_map`` — each chip trains its
    local trials entirely in-kernel, zero collectives (the halving
    schedulers' rung evaluations become embarrassingly parallel).

    Key-compatible with ``make_sweep_evaluator``: trial init folds
    (``fold_in(init_key, t)``) and the collocation stream derive
    identically from ``key``, so a sharded rung reproduces the
    sequential evaluator's trials exactly (CPU-mesh tested).

    Returns ``eval_fn(trial_indices, lrates, batch_sizes, n_iters) ->
    (final_losses [P], flat_stacked)`` where ``final_losses[i]`` is
    trial i's loss at ITS OWN budget. P must be a multiple of the 'pop'
    axis size — pad by repeating trials (a duplicate costs only its own
    gated budget). Distinct P values compile distinct programs (each
    cached). ``horizon`` as in :func:`make_sweep_evaluator` ("fixed" =
    the halving schedulers' exact-promotion continuation semantics)."""
    from jax.sharding import NamedSharding, PartitionSpec

    if horizon not in ("trial", "fixed"):
        raise ValueError(f"horizon must be 'trial' or 'fixed' ({horizon!r})")
    spec, model, schedule, user_max, max_iters, init_key, uniforms = \
        _sweep_prologue(problem, key, max_iters, max_batch, model,
                        precision, schedule)
    pack = _pack_fn(spec, model)
    n_tensors = len(_shapes_for(spec, model))
    pop_axis = "pop"
    if pop_axis not in mesh.shape:
        raise ValueError(
            f"sharded rung evaluation needs a '{pop_axis}' mesh axis; "
            f"the given mesh has axes {tuple(mesh.axis_names)} — build it "
            f"with make_mesh({{'pop': N}})")
    n_shards = mesh.shape[pop_axis]
    # vmapped init over the same per-trial folded keys the sequential
    # evaluator uses — identical values, one batched program. Through the
    # AOT cache per rung width, with the key as an ARGUMENT so the program
    # is seed-independent (a captured key would miss the cache per sweep).
    _init_all_jit = jax.jit(lambda ik, ts: jax.vmap(
        lambda t: model.init(jax.random.fold_in(ik, t)))(ts))
    _init_all = lambda ts: cached_call(
        _init_all_jit, init_key, ts, label=f"engsh-init-{problem.name}")

    def run_local(flat_local, lrs, bss, ns, u):
        outs_p, finals = [], []
        for j in range(flat_local[0].shape[0]):
            p = tuple(t[j] for t in flat_local)
            zeros = tuple(jnp.zeros_like(t) for t in p)
            p, _, _, lo = fused_engine_chunk(
                spec, model, p, zeros, zeros, u, 0, lrate=lrs[j],
                steps_per_cell=steps_per_cell,
                precision=_PRECISIONS[precision], schedule=schedule,
                total_steps=user_max, decay=decay,
                runtime_bs=bss[j], runtime_steps=ns[j],
                trial_horizon=horizon == "trial")
            outs_p.append(p)
            finals.append(jnp.take(lo, ns[j] - 1))
        return (tuple(jnp.stack([o[k] for o in outs_p])
                      for k in range(n_tensors)),
                jnp.stack(finals))

    pspec = PartitionSpec(pop_axis)
    sharded = jax.jit(jax.shard_map(
        run_local, mesh=mesh,
        in_specs=(tuple(pspec for _ in range(n_tensors)),
                  pspec, pspec, pspec, PartitionSpec()),
        out_specs=(tuple(pspec for _ in range(n_tensors)), pspec),
        check_vma=False))

    def eval_fn(trial_indices, lrates, batch_sizes, n_iters):
        P = len(trial_indices)
        if P % n_shards:
            raise ValueError(f"{P} trials not divisible by the "
                             f"'{pop_axis}' axis ({n_shards} shards) — "
                             f"pad by repeating trials")
        stacked = _init_all(jnp.asarray(trial_indices))
        flat = pack(stacked)
        flat = tuple(jax.device_put(t, NamedSharding(mesh, pspec))
                     for t in flat)
        lrs = jnp.asarray(lrates, jnp.float32)
        # Same clamps as the sequential evaluator (max(1, min(bs, max))).
        bss = jnp.clip(jnp.asarray(batch_sizes, jnp.int32), 1, max_batch)
        ns = jnp.clip(jnp.asarray(n_iters, jnp.int32), 1, user_max)
        flat_out, finals = sharded(flat, lrs, bss, ns, uniforms)
        return np.asarray(finals), flat_out

    return eval_fn


def make_packed_rung_evaluator(problem, key, max_iters, n_slots,
                               max_batch=512, model=None,
                               steps_per_cell: int | None = None,
                               precision: str = "highest",
                               schedule: str | None = None,
                               decay: float = 0.1,
                               horizon: str = "fixed",
                               rep_tile: int | None = None):
    """Single-chip counterpart of :func:`make_sharded_rung_evaluator`:
    evaluate a VECTOR of ``n_slots`` runtime-gated trials in ONE PACKED
    Mosaic dispatch — each slot trains at its own lr, masks rows ≥ its
    own batch_size, and freezes at its own n_iters (n_iters=0 = pruned
    slot that costs nothing). A whole halving rung becomes one dispatch
    of one executable instead of |rung| sequential tiny-kernel dispatches
    (VERDICT r3 #3), with the unrolled slot chains overlapping on the
    MXU/VPU.

    Key-compatible with :func:`make_sweep_evaluator`: identical
    ``fold_in(init_key, t)`` init folds and collocation stream, so slot
    results match the sequential evaluator's trials (tight-allclose —
    different executables).

    Returns ``eval_fn(trial_indices, lrates, batch_sizes, n_iters) ->
    (final_losses [n_slots], flat_stacked)`` where ``final_losses[i]`` is
    slot i's loss at ITS OWN budget (+inf for pruned slots) and
    ``flat_stacked`` is a tuple of [n_slots, ...] tensors."""
    from differential_equations_dnn_tpu.kernels.engine_core import (
        stack_replicas,
        unstack_replicas,
    )

    if horizon not in ("trial", "fixed"):
        raise ValueError(f"horizon must be 'trial' or 'fixed' ({horizon!r})")
    spec, model, schedule, user_max, max_iters, init_key, uniforms = \
        _sweep_prologue(problem, key, max_iters, max_batch, model,
                        precision, schedule)
    shapes = _shapes_for(spec, model)
    pack = _pack_fn(spec, model)

    # The key rides as an ARGUMENT (a captured init_key would bake into
    # the lowered HLO, so every new sweep key would hash differently and
    # miss the AOT cache — measured 10-45 s of pure compile per evaluator
    # construction over the remote helper, 2026-08-19).
    def init_all(ik, ts):
        flats = [pack(model.init(jax.random.fold_in(ik, ts[r])))
                 for r in range(n_slots)]
        return stack_replicas(flats)

    memo_key = ("engprk", problem, model, n_slots, max_batch, max_iters,
                user_max, precision, schedule, decay, horizon,
                steps_per_cell, rep_tile)
    _jinit_c = _memo_compile(memo_key + ("init",), lambda: cached_compile(
        jax.jit(init_all), init_key, jnp.arange(n_slots, dtype=jnp.int32),
        label=f"engprk-init-{problem.name}-{n_slots}"))
    jinit_all = lambda ts: _jinit_c(init_key, ts)

    def run(flat, lrs, bss, ns, u):
        zeros = tuple(jnp.zeros_like(t) for t in flat)
        flat, _, _, losses = fused_engine_packed_chunk(
            spec, model, flat, zeros, zeros, u, 0, lrate=0.0,
            n_replicas=n_slots, rep_tile=rep_tile,
            steps_per_cell=steps_per_cell,
            precision=_PRECISIONS[precision], schedule=schedule,
            total_steps=user_max, decay=decay,
            lr_vec=lrs, bs_vec=bss, steps_vec=ns, mask_rows=True,
            trial_horizon=horizon == "trial")
        return flat, losses

    ts0 = jnp.arange(n_slots, dtype=jnp.int32)
    flat0 = jinit_all(ts0)
    lr0 = jnp.full((n_slots,), 1e-4, jnp.float32)
    bs0 = jnp.full((n_slots,), max_batch, jnp.int32)
    ns0 = jnp.full((n_slots,), max_iters, jnp.int32)
    compiled = _memo_compile(memo_key + ("kernel",), lambda: cached_compile(
        jax.jit(run), flat0, lr0, bs0, ns0, uniforms,
        label=f"engprk-{problem.name}-{n_slots}"))

    def eval_fn(trial_indices, lrates, batch_sizes, n_iters):
        if len(trial_indices) != n_slots:
            raise ValueError(f"expected {n_slots} slots "
                             f"(got {len(trial_indices)})")
        flat = jinit_all(jnp.asarray(trial_indices, jnp.int32))
        ns = np.clip(np.asarray(n_iters, np.int64), 0, user_max)
        flat_out, losses = compiled(
            flat,
            jnp.asarray(lrates, jnp.float32),
            jnp.clip(jnp.asarray(batch_sizes, jnp.int32), 1, max_batch),
            jnp.asarray(ns, jnp.int32), uniforms)
        losses = np.asarray(losses)
        finals = np.where(ns > 0,
                          losses[np.arange(n_slots), np.maximum(ns - 1, 0)],
                          np.inf)
        per_slot = unstack_replicas(tuple(np.asarray(t) for t in flat_out),
                                    shapes, n_slots)
        stacked = tuple(jnp.stack([fl[k] for fl in per_slot])
                        for k in range(len(shapes)))
        return finals, stacked

    return eval_fn


def lr_sweep(problem, key, lrates, iterations, batch_size=64, model=None,
             steps_per_cell: int | None = None, precision: str = "highest",
             schedule: str | None = None, decay: float = 0.1):
    """Full-budget learning-rate sweep on ONE compiled fused kernel.

    The base lr is a runtime SMEM scalar in the kernel, so every trial
    reuses the same executable — a sweep of N lrates costs one compile +
    N kernel dispatches at full training speed (vs. the vmapped population
    path, which trains all trials concurrently but at reduced per-trial
    throughput, or a recompile per trial if lr were baked in).

    Each trial gets an independent init (``fold_in`` by trial index); the
    collocation stream is shared. Returns (final_losses [N],
    stacked_params) — rank trials by final loss, or re-evaluate MAE on the
    winner."""
    model = model or problem.default_model()
    eval_fn = make_lr_evaluator(problem, key, iterations,
                                batch_size=batch_size, model=model,
                                steps_per_cell=steps_per_cell,
                                precision=precision, schedule=schedule,
                                decay=decay)
    outs, finals = [], []
    for t, lr in enumerate(np.asarray(lrates)):
        losses, p = eval_fn(t, float(lr))
        outs.append(p)
        finals.append(float(losses[-1]))
    stacked = tuple(jnp.stack([o[k] for o in outs])
                    for k in range(len(outs[0])))
    spec = spec_for(problem)
    return np.asarray(finals), _unpack_fn(spec, model)(stacked)


def train_fused_ensemble(problem, key, iterations, n_replicas, mesh=None,
                         batch_size=64, lrate=1e-4, model=None,
                         steps_per_cell: int | None = None,
                         precision: str = "highest",
                         schedule: str | None = None, decay: float = 0.1,
                         timings: dict | None = None):
    """Train ``n_replicas`` independently-initialised replicas, EACH inside
    its own fused Mosaic kernel, sharded over ``mesh``'s 'pop' axis with
    ``jax.shard_map`` (each chip runs the whole on-chip training loop for
    its local replicas — zero cross-replica communication). The collocation
    stream is shared across replicas: independent inits decorrelate them,
    and sharing keeps the uniforms block replicated instead of × N.

    Returns (stacked_params_pytree, losses [n_replicas, iterations]).
    With ``mesh=None`` the replicas run sequentially on one device."""
    from jax.sharding import NamedSharding, PartitionSpec

    spec = spec_for(problem)
    if spec is None:
        raise ValueError(f"no fused-engine spec for {problem.name!r}")
    model = model or problem.default_model()
    if not supports(problem, model):
        raise ValueError("fused engine supports plain tanh MLPs only")
    if schedule is None:
        schedule = problem.defaults.schedule

    init_key, run_key = jax.random.split(key)
    stacked = jax.vmap(model.init)(jax.random.split(init_key, n_replicas))
    n_tensors = len(_shapes_for(spec, model))
    flat = _pack_fn(spec, model)(stacked)  # tuple of [n_replicas, ...]

    _draw_all = jax.jit(lambda k: jax.vmap(
        lambda i: jax.random.uniform(jax.random.fold_in(k, i),
                                     (batch_size, spec.n_uniform))
    )(jnp.arange(iterations)))
    uniforms = cached_call(_draw_all, run_key, label="draw")

    common = dict(lrate=lrate, steps_per_cell=steps_per_cell,
                  schedule=schedule, total_steps=iterations, decay=decay)
    n1 = int(iterations * 0.65) if precision == "mixed" else 0
    if precision == "mixed" and (n1 == 0 or n1 == iterations):
        precision, n1 = "highest", 0

    def _train_one(p, m, v, u):
        if precision == "mixed":
            p, m, v, l1 = fused_engine_chunk(
                spec, model, p, m, v, u[:n1], 0,
                precision=jax.lax.Precision.DEFAULT, **common)
            p, m, v, l2 = fused_engine_chunk(
                spec, model, p, m, v, u[n1:], n1,
                precision=jax.lax.Precision.HIGHEST, **common)
            return p, jnp.concatenate([l1, l2])
        p, _, _, lo = fused_engine_chunk(
            spec, model, p, m, v, u, 0,
            precision=_PRECISIONS[precision], **common)
        return p, lo

    def run_local(flat_local, u):
        outs_p, losses = [], []
        n_local = flat_local[0].shape[0]
        for j in range(n_local):
            p = tuple(t[j] for t in flat_local)
            m = tuple(jnp.zeros_like(t) for t in p)
            v = tuple(jnp.zeros_like(t) for t in p)
            p, lo = _train_one(p, m, v, u)
            outs_p.append(p)
            losses.append(lo)
        return (tuple(jnp.stack([o[k] for o in outs_p])
                      for k in range(n_tensors)),
                jnp.stack(losses))

    if mesh is None:
        run = jax.jit(run_local)
    else:
        pop_axis = "pop"
        if pop_axis not in mesh.shape:
            raise ValueError(
                f"fused ensembles shard replicas over a '{pop_axis}' mesh "
                f"axis; the given mesh has axes {tuple(mesh.axis_names)} — "
                f"build it with make_mesh({{'pop': N}})")
        n_shards = mesh.shape[pop_axis]
        if n_replicas % n_shards:
            raise ValueError(f"n_replicas {n_replicas} not divisible by "
                             f"'{pop_axis}' mesh axis ({n_shards} shards)")
        pspec = PartitionSpec(pop_axis)
        flat = tuple(jax.device_put(t, NamedSharding(mesh, pspec))
                     for t in flat)
        # check_vma=False: pallas_call's out_shape structs carry no varying
        # -across-mesh annotation, which the vma checker (jax>=0.9) rejects.
        run = jax.jit(jax.shard_map(
            run_local, mesh=mesh,
            in_specs=(tuple(pspec for _ in flat), PartitionSpec()),
            out_specs=(tuple(pspec for _ in flat), pspec),
            check_vma=False))
    flat_out, losses = _timed_ensemble_run(run, flat, uniforms, timings)
    return _unpack_fn(spec, model)(flat_out), np.asarray(losses)


def _timed_ensemble_run(run, flat, uniforms, timings):
    """Compile and execute an ensemble program, recording the compile/run
    wall-clock split in ``timings`` (same contract as
    parallel.population.train_population)."""
    import time

    t0 = time.perf_counter()
    compiled = cached_compile(run, flat, uniforms, label="ens")
    compile_time = time.perf_counter() - t0
    t0 = time.perf_counter()
    out = compiled(flat, uniforms)
    out = (out[0], np.asarray(out[1]))  # host-copy sync (deserialized
    #                                     executables may not block)
    run_time = time.perf_counter() - t0
    if timings is not None:
        timings.update(compile_time=compile_time, run_time=run_time)
    return out


def _train_mixed_single_dispatch(problem, spec, key, iterations, n1,
                                 start_step, params, opt_state, *,
                                 batch_size, lrate, chunk_size, model,
                                 steps_per_cell, schedule, decay,
                                 total_steps):
    """The ``precision="mixed"`` schedule as ONE XLA program: the bf16-MXU
    kernel runs the first ``n1`` steps and hands params + Adam moments to
    the exact-fp32 kernel in the same dispatch (mirrors
    fused_train._train_mixed_single_dispatch — each extra dispatch over a
    remote-device tunnel costs tens of ms). The collocation stream is keyed
    by absolute step index, so the phase boundary cannot change the draws."""
    import time

    from differential_equations_dnn_tpu.train.trainer import TrainResult

    run_key, flat, m, v = fused_prologue(
        model, _pack_fn(spec, model), key, params, opt_state)

    n2 = iterations - n1
    common = dict(lrate=lrate, steps_per_cell=steps_per_cell,
                  schedule=schedule, total_steps=total_steps, decay=decay)

    @jax.jit
    def run(flat, m, v, u1, u2, step0):
        flat, m, v, l1 = fused_engine_chunk(
            spec, model, flat, m, v, u1, step0,
            precision=jax.lax.Precision.DEFAULT, **common)
        flat, m, v, l2 = fused_engine_chunk(
            spec, model, flat, m, v, u2, step0 + n1,
            precision=jax.lax.Precision.HIGHEST, **common)
        return flat, m, v, jnp.concatenate([l1, l2])

    @functools.partial(jax.jit, static_argnames=("n",))
    def draw(rk, start, n):
        return jax.vmap(
            lambda i: jax.random.uniform(jax.random.fold_in(rk, i),
                                         (batch_size, spec.n_uniform))
        )(start + jnp.arange(n))

    t0 = time.perf_counter()
    u1 = cached_call(draw, run_key, start_step, label="draw", n=n1)
    u2 = cached_call(draw, run_key, start_step + n1, label="draw", n=n2)
    compiled = cached_compile(run, flat, m, v, u1, u2, start_step,
                              label=f"engmx-{problem.name}")
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
    unpack = _unpack_fn(spec, model)
    return TrainResult(
        params=unpack(flat),
        opt_state={"m": unpack(m), "v": unpack(v)},
        loss_history=np.asarray(losses),
        wall_time=wall,
        iters_per_sec=iterations / wall if wall else float("inf"),
        compile_time=compile_time,
    )
