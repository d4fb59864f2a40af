"""Fully-fused Pallas training engine for DGM (LSTM-gate) networks.

Counterpart of :mod:`fused_engine` (MLP stream specs) for the DGM
architecture (models/dgm.py; reference dgm_net.py:20-119 /
neural_networks.py:44-177): the ENTIRE Adam loop runs inside one Mosaic
program, with the forward written as stacked value/first-order-tangent
streams through the gate recurrence

    Z,G,R = act(s·Wzgr + x·Uzgr + b)   (fused 3-gate matmul)
    H     = act((s⊙R)·Wh + x·Uh + bh)
    s'    = (1−G)⊙H + Z⊙s

and a HAND-DERIVED VJP of the stream algebra. Autodiff inside a Mosaic
kernel body was measured at ~100x slower than this hand backward (the
transpose graph of the stream concatenates/slices does not lower well) —
the elementwise loss cotangent is the only part left to ``jax.grad``.

Stream rules (per group: one value row-block, ``n_first`` tangent blocks;
second-order taps are not supported — DGM equations here need at most
first derivatives):

    act:  v → σ(v),  t_k → σ'(v)·t_k
    mul:  v → a_v·b_v,  t_k → a_v·b_tk + a_tk·b_v

with σ ∈ {tanh, relu} (relu for the reference's variant-A gates,
neural_networks.py:99-104).

Specs registered: fitzhugh_nagumo (value + time tangent; reference
fitzhugh_nagumo.py:53-97) and fredholm (value-only streams with the
Gauss-Legendre quadrature evaluated INSIDE the kernel; reference
fredholm.py:47-74 runs 50 Python-loop forwards per step).

Reference hot loops replaced: fitzhugh_nagumo.py:100-147, fredholm.py:77-115.
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
from differential_equations_dnn_tpu.kernels.fused_engine import (
    Group,
    _bias_mask,
    _kmean,
    _ksum,
    _largest_divisor_leq,
    _memo_compile,
    _n_rows,
)
from differential_equations_dnn_tpu.kernels.fused_train import (
    _PRECISIONS,
    _dot_nt,
    _dot_tn,
)

_HIGH = jax.lax.Precision.HIGHEST
_N_TENSORS = 10  # w_in, b_in, Wzgr, Uzgr, bzgr, Wh, Uh, bh, w_out, b_out


# ---------------------------------------------------------------------------
# Param packing
# ---------------------------------------------------------------------------


def pack_dgm(params):
    """DGM param pytree (models/dgm.py layout) → flat 10-tuple."""
    return (params["s_in"]["w"], params["s_in"]["b"],
            params["layers"]["Wzgr"], params["layers"]["Uzgr"],
            params["layers"]["bzgr"], params["layers"]["Wh"],
            params["layers"]["Uh"], params["layers"]["bh"],
            params["s_out"]["w"], params["s_out"]["b"])


def unpack_dgm(flat):
    w_in, b_in, Wzgr, Uzgr, bzgr, Wh, Uh, bh, w_out, b_out = flat
    return {"s_in": {"w": w_in, "b": b_in},
            "layers": {"Wzgr": Wzgr, "Uzgr": Uzgr, "bzgr": bzgr,
                       "Wh": Wh, "Uh": Uh, "bh": bh},
            "s_out": {"w": w_out, "b": b_out}}


# ---------------------------------------------------------------------------
# Stream algebra: activation + product, forward and VJP
# ---------------------------------------------------------------------------


def _check_groups(groups):
    if any(g.n_second for g in groups):
        raise ValueError("DGM streams support first-order tangents only")


def _act_fwd(groups, z, B, act):
    outs = []
    off = 0
    for g in groups:
        zv = z[off * B:(off + 1) * B]
        if act == "tanh":
            av = jnp.tanh(zv)
            d = 1.0 - av * av
        else:  # relu
            av = jnp.maximum(zv, 0.0)
            d = jnp.where(zv > 0.0, 1.0, 0.0)
        outs.append(av)
        for k in range(g.n_first):
            zt = z[(off + 1 + k) * B:(off + 2 + k) * B]
            outs.append(d * zt)
        off += g.n_rows
    return jnp.concatenate(outs, 0)


def _act_bwd(groups, z, u, B, act):
    """VJP of :func:`_act_fwd`: with d = σ'(z_v), d' = σ''(z_v),

        dz_v  = d·u_v + d'·Σ_k z_tk·u_tk      (d' = −2σd for tanh, 0 for relu)
        dz_tk = d·u_tk
    """
    outs = []
    off = 0
    for g in groups:
        zv = z[off * B:(off + 1) * B]
        uv = u[off * B:(off + 1) * B]
        if act == "tanh":
            av = jnp.tanh(zv)
            d = 1.0 - av * av
            dp = -2.0 * av * d
        else:
            d = jnp.where(zv > 0.0, 1.0, 0.0)
            dp = None
        dzv = d * uv
        tail = []
        for k in range(g.n_first):
            zt = z[(off + 1 + k) * B:(off + 2 + k) * B]
            ut = u[(off + 1 + k) * B:(off + 2 + k) * B]
            if dp is not None:
                dzv = dzv + dp * (zt * ut)
            tail.append(d * ut)
        outs.append(dzv)
        outs.extend(tail)
        off += g.n_rows
    return jnp.concatenate(outs, 0)


def _mul_fwd(groups, a, b, B):
    """Stream product c = a ⊙ b: c_v = a_v·b_v, c_tk = a_v·b_tk + a_tk·b_v."""
    outs = []
    off = 0
    for g in groups:
        av = a[off * B:(off + 1) * B]
        bv = b[off * B:(off + 1) * B]
        outs.append(av * bv)
        for k in range(g.n_first):
            at = a[(off + 1 + k) * B:(off + 2 + k) * B]
            bt = b[(off + 1 + k) * B:(off + 2 + k) * B]
            outs.append(av * bt + at * bv)
        off += g.n_rows
    return jnp.concatenate(outs, 0)


def _mul_bwd(groups, u, b, B):
    """VJP of :func:`_mul_fwd` w.r.t. its FIRST operand (symmetric — call
    with operands swapped for the second):

        da_v  = u_v·b_v + Σ_k u_tk·b_tk
        da_tk = u_tk·b_v
    """
    outs = []
    off = 0
    for g in groups:
        uv = u[off * B:(off + 1) * B]
        bv = b[off * B:(off + 1) * B]
        dav = uv * bv
        tail = []
        for k in range(g.n_first):
            ut = u[(off + 1 + k) * B:(off + 2 + k) * B]
            bt = b[(off + 1 + k) * B:(off + 2 + k) * B]
            dav = dav + ut * bt
            tail.append(ut * bv)
        outs.append(dav)
        outs.extend(tail)
        off += g.n_rows
    return jnp.concatenate(outs, 0)


# ---------------------------------------------------------------------------
# Generic DGM step math (pure jnp — kernel body AND test twin)
# ---------------------------------------------------------------------------


def dgm_step_math(spec, params, u, B, L, precision=_HIGH,
                  batch_mask=None, inv_bs=None):
    """One training step's loss and parameter gradients for a DGM stream
    spec. ``params`` = the flat 10-tuple; ``u`` = [B, spec.n_uniform]
    U[0,1) draws. Returns (loss, grads_tuple). ``batch_mask`` [B, 1] +
    ``inv_bs`` switch the spec's loss to the runtime-batch-size masked
    partial sum (sweep evaluators — same contract as
    fused_engine.engine_step_math)."""
    groups = spec.groups
    act = spec.act
    w_in, b_in, Wzgr, Uzgr, bzgr, Wh, Uh, bh, w_out, b_out = params
    X, ctx = spec.build(u)
    if batch_mask is not None:
        ctx = {**ctx, "mask": batch_mask, "inv_bs": inv_bs}
    mask = _bias_mask(groups, B, X.dtype)
    H = w_in.shape[1]

    # ---- forward, saving layer-input states + pre-activations ----
    s_in_pre = jnp.dot(X, w_in, precision=precision) + mask * b_in
    s = _act_fwd(groups, s_in_pre, B, act)
    states = [s]
    zgr_pres = []
    h_pres = []
    for l in range(L):
        zgr_pre = (jnp.dot(s, Wzgr[l], precision=precision)
                   + jnp.dot(X, Uzgr[l], precision=precision)
                   + mask * bzgr[l])
        zgr = _act_fwd(groups, zgr_pre, B, act)
        z, g, r = zgr[:, :H], zgr[:, H:2 * H], zgr[:, 2 * H:]
        sr = _mul_fwd(groups, s, r, B)
        h_pre = (jnp.dot(sr, Wh[l], precision=precision)
                 + jnp.dot(X, Uh[l], precision=precision)
                 + mask * bh[l])
        h = _act_fwd(groups, h_pre, B, act)
        om = mask - g  # one-minus-G under stream semantics (linear)
        s = _mul_fwd(groups, om, h, B) + _mul_fwd(groups, z, s, B)
        zgr_pres.append(zgr_pre)
        h_pres.append(h_pre)
        states.append(s)
    out = jnp.dot(s, w_out, precision=precision) + mask * b_out

    R = _n_rows(groups)
    outs = tuple(out[k * B:(k + 1) * B] for k in range(R))
    # Elementwise loss cotangent — the one part left to autodiff (tiny
    # graph). vjp (not value_and_grad) because spec losses are [1, 1]
    # keepdims values, never rank-0 (see fused_engine._ksum).
    loss, vjp_fn = jax.vjp(lambda o: spec.loss(o, ctx), outs)
    gouts, = vjp_fn(jnp.ones_like(loss))
    G = jnp.concatenate(gouts, 0)

    # ---- hand backward through the gate recurrence ----
    d_w_out = _dot_tn(states[L], G, precision)
    d_b_out = jnp.sum(mask * G, axis=0)
    ds = _dot_nt(G, w_out, precision)

    d_Wzgr, d_Uzgr, d_bzgr = [], [], []
    d_Wh, d_Uh, d_bh = [], [], []
    for l in range(L - 1, -1, -1):
        s_prev = states[l]
        zgr_pre = zgr_pres[l]
        h_pre = h_pres[l]
        # recompute the gates (saves VMEM vs. storing activations)
        zgr = _act_fwd(groups, zgr_pre, B, act)
        z, g, r = zgr[:, :H], zgr[:, H:2 * H], zgr[:, 2 * H:]
        h = _act_fwd(groups, h_pre, B, act)
        om = mask - g
        sr = _mul_fwd(groups, s_prev, r, B)

        # s' = om⊙h + z⊙s_prev
        d_om = _mul_bwd(groups, ds, h, B)
        dh = _mul_bwd(groups, ds, om, B)
        dz = _mul_bwd(groups, ds, s_prev, B)
        ds_prev = _mul_bwd(groups, ds, z, B)
        dg = -d_om
        # h = act(h_pre);  h_pre = sr·Wh + X·Uh + bh
        dh_pre = _act_bwd(groups, h_pre, dh, B, act)
        d_Wh.append(_dot_tn(sr, dh_pre, precision))
        d_Uh.append(_dot_tn(X, dh_pre, precision))
        d_bh.append(jnp.sum(mask * dh_pre, axis=0))
        dsr = _dot_nt(dh_pre, Wh[l], precision)
        # sr = s_prev ⊙ r
        ds_prev = ds_prev + _mul_bwd(groups, dsr, r, B)
        dr = _mul_bwd(groups, dsr, s_prev, B)
        # zgr = act(zgr_pre);  zgr_pre = s_prev·Wzgr + X·Uzgr + bzgr
        dzgr = jnp.concatenate([dz, dg, dr], axis=1)
        dzgr_pre = _act_bwd(groups, zgr_pre, dzgr, B, act)
        d_Wzgr.append(_dot_tn(s_prev, dzgr_pre, precision))
        d_Uzgr.append(_dot_tn(X, dzgr_pre, precision))
        d_bzgr.append(jnp.sum(mask * dzgr_pre, axis=0))
        ds = ds_prev + _dot_nt(dzgr_pre, Wzgr[l], precision)

    # s_0 = act(X·w_in + b_in)
    dz0 = _act_bwd(groups, s_in_pre, ds, B, act)
    d_w_in = _dot_tn(X, dz0, precision)
    d_b_in = jnp.sum(mask * dz0, axis=0)

    stack = lambda gs: jnp.stack(gs[::-1])
    return loss, (d_w_in, d_b_in, stack(d_Wzgr), stack(d_Uzgr),
                  stack(d_bzgr), stack(d_Wh), stack(d_Uh), stack(d_bh),
                  d_w_out, d_b_out)


# ---------------------------------------------------------------------------
# Equation specs
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class FNDGMSpec:
    """FitzHugh–Nagumo system, DGM parity arch (equations.fitzhugh_nagumo;
    reference fitzhugh_nagumo.py:53-97). Streams: interior value + time
    tangent, plus the t=0 IC forward.

    With ``p.causal_eps > 0`` (the default) the spec mirrors the
    equation's CAUSAL training protocol exactly: collocation is
    stratified-uniform (slice i of [0, t_max] → time-sorted by
    construction) and the residual at t_i is weighted by
    exp(−ε·Δt·Σ_{j<i} ℓ_j). The exclusive cumulative sum is ONE matmul
    with a strictly-lower-triangular constant — a scan/loop cumsum would
    serialize on the VPU — and the weights are stop_gradient'd, so the
    hand-derived VJP still only sees an elementwise cotangent."""
    p: object
    n_uniform: int = 1
    n_const: int = 0
    act: str = "tanh"
    groups = (Group(n_first=1), Group())

    def build(self, u):
        if self.p.causal_eps > 0.0:
            B = u.shape[0]
            # Integer iota then cast: tpu.iota only produces int vectors.
            i = jax.lax.broadcasted_iota(jnp.int32, (B, 1), 0).astype(u.dtype)
            t = (i + u[:, :1]) * (self.p.t_max / B)
        else:
            t = self.p.t_max * u[:, :1]
        one = jnp.ones_like(t)
        zero = jnp.zeros_like(t)
        X = jnp.concatenate([t, one, zero], 0)
        return X, {}

    def loss(self, outs, ctx):
        sv, dsdt, s0 = outs
        p = self.p
        # No column slicing (its VJP pad does not lower in Mosaic): the
        # sibling component comes from a constant 2x2 swap matmul, and the
        # per-column RHS is selected with an iota mask.
        ri = jax.lax.broadcasted_iota(jnp.int32, (2, 2), 0)
        ci = jax.lax.broadcasted_iota(jnp.int32, (2, 2), 1)
        swap = jnp.where(ri + ci == 1, 1.0, 0.0).astype(sv.dtype)
        rev = jnp.dot(sv, swap, precision=_HIGH)
        col = jax.lax.broadcasted_iota(jnp.int32, sv.shape, 1)
        f_y = sv ** 3 / 3.0 + rev - p.i_ext - sv          # col 0 (y, w=rev)
        f_w = (p.beta * sv - p.alpha - rev) / p.tau       # col 1 (w, y=rev)
        r = dsdt + jnp.where(col == 0, f_y, f_w)
        r2 = jnp.square(r)
        mask = ctx.get("mask") if isinstance(ctx, dict) else None
        if mask is not None:
            # Masked (runtime-batch-size sweep) calls keep the REFERENCE
            # loss, mirroring equations.fitzhugh_nagumo.loss's masked
            # population branch: causal weighting is a single-run training
            # protocol. (The bs-mode sweep evaluator also builds this spec
            # from a causal_eps=0 problem view so the collocation is the
            # reference's iid draw, not the causal stratified-sorted one —
            # a row-prefix mask over time-sorted strata would train short
            # trials on early times only.)
            inv_bs = ctx["inv_bs"]
            return (_ksum(r2 * mask) * inv_bs
                    + _ksum(jnp.square(s0 - p.y_ic) * mask) * inv_bs)
        ic = _kmean(jnp.square(s0 - p.y_ic))
        if p.causal_eps <= 0.0:
            # mean(r_y²)+mean(r_w²)+mean((s0−ic)²) = 2·mean_full(r²) + ...
            return 2.0 * _kmean(r2) + ic
        # Causal weights w_i = exp(−ε·Δt·Σ_{j<i} ℓ_j), ℓ = r_y² + r_w²:
        # rows are time-sorted (stratified build), the exclusive cumsum is
        # a strictly-lower-triangular matmul, and the per-row sum ℓ rides
        # a [2,1] ones matmul (no column slicing). All under stop_gradient.
        B = r2.shape[0]
        ell = jnp.dot(jax.lax.stop_gradient(r2),
                      jnp.ones((2, 1), r2.dtype), precision=_HIGH)
        rb = jax.lax.broadcasted_iota(jnp.int32, (B, B), 0)
        cb = jax.lax.broadcasted_iota(jnp.int32, (B, B), 1)
        tri = jnp.where(rb > cb, 1.0, 0.0).astype(r2.dtype)
        cum = jnp.dot(tri, ell, precision=_HIGH) * (p.t_max / B)
        wgt = jax.lax.stop_gradient(jnp.exp(-p.causal_eps * cum))
        # mean_i(w_i·ℓ_i) = 2·mean over [B,2] of (w ⊙ r²).
        return 2.0 * _kmean(wgt * r2) + ic


@dataclass(frozen=True)
class FredholmDGMSpec:
    """Fredholm II integral equation, DGM variant-A parity arch
    (equations.fredholm; reference fredholm.py:47-74). Value-only streams:
    collocation points + ⌈k/B⌉ groups of Gauss–Legendre nodes, with the
    quadrature sum computed INSIDE the kernel (the reference runs k=50
    sequential net forwards per step inside the loss). Node positions and
    weights arrive via the const operand (zero-padded past k)."""
    p: object
    n_groups: int
    act: str = "relu"
    n_uniform: int = 1

    @property
    def n_const(self):
        # [nodes | weights] for each node group.
        return 2 * (self.n_groups - 1)

    @property
    def groups(self):
        return tuple(Group() for _ in range(self.n_groups))

    def build(self, u, const=None):
        # ``const`` is [2·(n_groups−1), B, 1]: leading-dim indexing keeps
        # every part at lane offset 0 (column-slicing a [B, C] array gives
        # offset-c layouts that tpu.concatenate rejects).
        x = self.p.upper * u[:, :1]
        parts = [x]
        for j in range(self.n_groups - 1):
            parts.append(const[2 * j])
        X = jnp.concatenate(parts, 0)
        return X, {"x": x, "const": const}

    def loss(self, outs, ctx):
        x, const = ctx["x"], ctx["const"]
        y_x = outs[0]
        # integral ≈ Σ_j w_j·cos(t_j)·y(t_j): one [1, 1] value shared by
        # all samples (keepdims — spec losses never materialise rank-0
        # values inside the kernel, see fused_engine._ksum).
        integral = jnp.zeros((1, 1), y_x.dtype)
        for j in range(self.n_groups - 1):
            t_j = const[2 * j]
            w_j = const[2 * j + 1]
            integral = integral + _ksum(w_j * jnp.cos(t_j) * outs[1 + j])
        r = y_x - jnp.sin(x) * (1.0 + integral)
        mask = ctx.get("mask") if isinstance(ctx, dict) else None
        if mask is not None:
            # Runtime batch_size masks COLLOCATION rows only: the
            # quadrature node groups are not batch samples (their k is a
            # problem constant; zero-padded weights already silence the
            # padding), so the integral is untouched.
            return _ksum(jnp.square(r) * mask) * ctx["inv_bs"]
        return _kmean(jnp.square(r))


def spec_for(problem, batch_size=None):
    """The DGM stream spec for ``problem``, or None."""
    if problem.name == "fitzhugh_nagumo" and getattr(problem, "arch",
                                                     "dgm") == "dgm":
        return FNDGMSpec(problem)
    if problem.name == "fredholm" and problem.quadrature == "gauss":
        n_node_groups = -(-problem.k // batch_size) if batch_size else 1
        return FredholmDGMSpec(problem, n_groups=1 + n_node_groups)
    return None


def _fredholm_const(problem, batch_size, n_groups, dtype=jnp.float32):
    """[2·(n_groups−1), B, 1] stacked (nodes, weights), zero-padded."""
    from differential_equations_dnn_tpu.ops import gauss_legendre_nodes

    nodes, weights = gauss_legendre_nodes(problem.k, 0.0, problem.upper)
    cols = []
    for j in range(n_groups - 1):
        n_j = np.zeros((batch_size,), np.float64)
        w_j = np.zeros((batch_size,), np.float64)
        chunk = slice(j * batch_size, min((j + 1) * batch_size, problem.k))
        size = chunk.stop - chunk.start
        n_j[:size] = np.asarray(nodes)[chunk]
        w_j[:size] = np.asarray(weights)[chunk]
        cols.extend([n_j, w_j])
    return jnp.asarray(np.stack(cols, axis=0)[:, :, None], dtype)


def supports(problem, model=None, batch_size=None) -> bool:
    """True if (problem, model) can train on the fused DGM engine."""
    spec = spec_for(problem, batch_size or 32)
    if spec is None:
        return False
    model = model or problem.default_model()
    return (type(model).__name__ == "DGM"
            and model.activation == spec.act)


# ---------------------------------------------------------------------------
# The kernel (scaffolding mirrors fused_engine; 10 state tensors + const)
# ---------------------------------------------------------------------------


def fused_dgm_chunk(spec, model, params, m, v, uniforms, step0, lrate,
                    const=None, steps_per_cell: int | None = None,
                    precision=_HIGH, schedule="constant", total_steps=1,
                    decay=0.1, runtime_steps=None, runtime_bs=None,
                    trial_horizon=True):
    """Run ``K = uniforms.shape[0]`` Adam steps of a DGM equation inside one
    Pallas kernel (shared scaffolding: kernels.engine_core; quadrature
    constants ride the const operand). ``runtime_steps`` (traced int
    scalar) switches on step-gated sweep mode: steps at or past the
    trial's own budget freeze params/moments/history in place.
    ``runtime_bs`` additionally masks collocation rows ≥ bs out of the
    loss (iota row mask, the MLP engine's construction — VERDICT r3 #2):
    with both, one executable covers the FULL reference
    {batch_size, n_iters, lrate} space on the DGM equations too."""
    from differential_equations_dnn_tpu.kernels.engine_core import (
        run_fused_chunk,
    )

    K, B, U = uniforms.shape
    L, H = model.num_layers, model.hidden_size
    D, O = model.input_dim, model.output_dim
    R = _n_rows(spec.groups)
    if steps_per_cell is None:
        steps_per_cell = max(1, 25_600 // (R * B))
    S = _largest_divisor_leq(K, min(steps_per_cell, 128))

    def step_math(p, u, c, batch_mask=None, inv_bs=None):
        frozen = (spec_with_build(spec, functools.partial(spec.build,
                                                          const=c))
                  if c is not None else spec)
        return dgm_step_math(frozen, p, u, B, L, precision,
                             batch_mask=batch_mask, inv_bs=inv_bs)

    shapes = [(D, H), (H,), (L, H, 3 * H), (L, D, 3 * H), (L, 3 * H),
              (L, H, H), (L, D, H), (L, H), (H, O), (O,)]
    return run_fused_chunk(step_math, shapes, params, m, v, uniforms, step0,
                           lrate, S, const=const, schedule=schedule,
                           total_steps=total_steps, decay=decay,
                           runtime_steps=runtime_steps,
                           runtime_bs=runtime_bs,
                           trial_horizon=trial_horizon)


class spec_with_build:
    """A spec view whose ``build(u)`` closes over the kernel's const ref."""

    def __init__(self, spec, build):
        self._spec = spec
        self.build = build

    def __getattr__(self, name):
        return getattr(self._spec, name)


# ---------------------------------------------------------------------------
# Host-side driver
# ---------------------------------------------------------------------------


def make_trial_evaluator(problem, key, iterations, batch_size=100,
                         lrate=1e-4, model=None,
                         steps_per_cell: int | None = None,
                         precision: str = "highest",
                         schedule: str | None = None, decay: float = 0.1):
    """Compile ONE fused DGM executable and return
    ``eval_fn(trial_index) -> (losses [K], flat_params)``: every call
    trains a freshly-initialised net (init keyed by ``trial_index``) for
    the full budget through the same executable — the ensemble/multi-start
    counterpart of fused_engine.make_lr_evaluator. The collocation stream
    is shared across trials."""
    spec = spec_for(problem, batch_size)
    if spec is None:
        raise ValueError(f"no fused DGM spec for {problem.name!r}")
    model = model or problem.default_model()
    if not supports(problem, model, batch_size):
        raise ValueError(
            f"fused DGM engine needs a DGM model with {spec.act!r} gates")
    if schedule is None:
        schedule = problem.defaults.schedule

    const = None
    if isinstance(spec, FredholmDGMSpec):
        const = _fredholm_const(problem, batch_size, spec.n_groups)

    init_key, run_key = cached_split(key)
    _draw_all = jax.jit(lambda k: jax.vmap(
        lambda i: jax.random.uniform(jax.random.fold_in(k, i),
                                     (batch_size, spec.n_uniform))
    )(jnp.arange(iterations)))
    uniforms = cached_call(_draw_all, run_key, label="draw")

    common = dict(const=const, steps_per_cell=steps_per_cell,
                  schedule=schedule, total_steps=iterations, decay=decay)
    n1 = int(iterations * 0.65) if precision == "mixed" else 0
    if precision == "mixed" and (n1 == 0 or n1 == iterations):
        precision, n1 = "highest", 0

    def run(flat, m, v, u, lr):
        if precision == "mixed":
            # bf16 coarse phase + exact-fp32 final phase in ONE program.
            flat, m, v, l1 = fused_dgm_chunk(
                spec, model, flat, m, v, u[:n1], 0, lrate=lr,
                precision=jax.lax.Precision.DEFAULT, **common)
            flat, m, v, l2 = fused_dgm_chunk(
                spec, model, flat, m, v, u[n1:], n1, lrate=lr,
                precision=jax.lax.Precision.HIGHEST, **common)
            return flat, m, v, jnp.concatenate([l1, l2])
        return fused_dgm_chunk(
            spec, model, flat, m, v, u, 0, lrate=lr,
            precision=_PRECISIONS[precision], **common)

    memo_key = ("dgmev", problem, model, batch_size, iterations, precision,
                schedule, decay, steps_per_cell)
    jinit = _memo_compile(memo_key + ("init",), lambda: cached_compile(
        jax.jit(model.init), jax.random.fold_in(init_key, 0), label="init"))
    flat0 = pack_dgm(jinit(jax.random.fold_in(init_key, 0)))
    zeros = tuple(jnp.zeros_like(p) for p in flat0)
    compiled = _memo_compile(memo_key + ("kernel",), lambda: cached_compile(
        jax.jit(run), flat0, zeros, zeros, uniforms, np.float32(0.0),
        label=f"dgmev-{problem.name}"))

    def eval_fn(trial_index: int, lr: float | None = None):
        # The base lr is a runtime SMEM scalar: sweeping it reuses this
        # one executable (None = the construction-time default).
        flat = pack_dgm(jinit(jax.random.fold_in(init_key, trial_index)))
        p, _, _, losses = compiled(flat, zeros, zeros, uniforms,
                                   np.float32(lrate if lr is None else lr))
        return np.asarray(losses), p

    return eval_fn


def fused_dgm_packed_chunk(spec, model, params, m, v, uniforms, step0,
                           lrate, n_replicas, rep_tile=None, const=None,
                           steps_per_cell: int | None = None,
                           precision=_HIGH, schedule="constant",
                           total_steps=1, decay=0.1,
                           lr_vec=None, bs_vec=None, steps_vec=None,
                           mask_rows=False, trial_horizon=True):
    """Packed-replica twin of :func:`fused_dgm_chunk`: one Pallas dispatch
    advances ``n_replicas`` independent DGM runs by K steps each (state
    replica-stacked — kernels.engine_core.stack_replicas). (A vmapped
    interleave step-math mode was measured 58x slower end-to-end on the
    MLP engine and retired — benchmarks/probe_mxu_overlap.py +
    docs/KERNELS.md.)"""
    from differential_equations_dnn_tpu.kernels.engine_core import (
        run_fused_packed,
    )

    K, B, U = uniforms.shape
    L, H = model.num_layers, model.hidden_size
    D, O = model.input_dim, model.output_dim
    R = _n_rows(spec.groups)
    if steps_per_cell is None:
        steps_per_cell = max(1, 25_600 // (R * B))
    S = _largest_divisor_leq(K, min(steps_per_cell, 128))
    shapes = [(D, H), (H,), (L, H, 3 * H), (L, D, 3 * H), (L, 3 * H),
              (L, H, H), (L, D, H), (L, H), (H, O), (O,)]
    if rep_tile is None:
        per_rep = sum(int(np.prod(s)) for s in shapes) * 4 * 6
        rep_tile = _largest_divisor_leq(
            n_replicas, max(1, min(16, (24 << 20) // max(per_rep, 1))))

    def step_math(p, u, c, batch_mask=None, inv_bs=None):
        frozen = (spec_with_build(spec, functools.partial(spec.build,
                                                          const=c))
                  if c is not None else spec)
        return dgm_step_math(frozen, p, u, B, L, precision,
                             batch_mask=batch_mask, inv_bs=inv_bs)

    return run_fused_packed(step_math, shapes, params, m, v, uniforms,
                            step0, lrate, S, n_replicas, rep_tile=rep_tile,
                            const=const, schedule=schedule,
                            total_steps=total_steps, decay=decay,
                            lr_vec=lr_vec, bs_vec=bs_vec,
                            steps_vec=steps_vec, mask_rows=mask_rows,
                            trial_horizon=trial_horizon)


def train_dgm_fused_ensemble_packed(problem, key, iterations, n_replicas,
                                    batch_size=100, lrate=1e-4, model=None,
                                    precision: str = "highest",
                                    schedule: str | None = None,
                                    decay: float = 0.1, rep_tile=None,
                                    chunk_size=25_000,
                                    steps_per_cell: int | None = None,
                                    mixed_split: float = 0.65,
                                    timings=None):
    """Train ``n_replicas`` DGM replicas in PACKED Mosaic dispatches —
    the DGM twin of fused_engine.train_fused_ensemble_packed (VERDICT r3
    #3: one dispatch instead of N, N independent per-step chains for the
    scheduler to overlap). Key semantics match
    :func:`make_trial_evaluator` exactly (cached_split, fold_in(init_key,
    r) inits, shared fold_in(run_key, step) collocation stream), so
    replica r reproduces sequential trial r.

    Returns ``(stacked_params_pytree [N, ...], losses [N, iterations])``.
    """
    import time

    spec = spec_for(problem, batch_size)
    if spec is None:
        raise ValueError(f"no fused DGM spec for {problem.name!r}")
    model = model or problem.default_model()
    if not supports(problem, model, batch_size):
        raise ValueError(
            f"fused DGM engine needs a DGM model with {spec.act!r} gates")
    if schedule is None:
        schedule = problem.defaults.schedule
    from differential_equations_dnn_tpu.kernels.engine_core import (
        stack_replicas,
        unstack_replicas,
    )

    const = None
    if isinstance(spec, FredholmDGMSpec):
        const = _fredholm_const(problem, batch_size, spec.n_groups)
    D, O = model.input_dim, model.output_dim
    L, H = model.num_layers, model.hidden_size
    shapes = [(D, H), (H,), (L, H, 3 * H), (L, D, 3 * H), (L, 3 * H),
              (L, H, H), (L, D, H), (L, H), (H, O), (O,)]

    init_key, run_key = cached_split(key)

    def init_all(ik):
        flats = [pack_dgm(model.init(jax.random.fold_in(ik, r)))
                 for r in range(n_replicas)]
        zeros = tuple(jnp.zeros_like(t) for t in stack_replicas(flats))
        return stack_replicas(flats), zeros

    @functools.partial(jax.jit, static_argnames=("n",))
    def draw(rk, start, n):
        return jax.vmap(
            lambda i: jax.random.uniform(jax.random.fold_in(rk, i),
                                         (batch_size, spec.n_uniform))
        )(start + jnp.arange(n))

    common = dict(n_replicas=n_replicas, rep_tile=rep_tile, const=const,
                  steps_per_cell=steps_per_cell, schedule=schedule,
                  total_steps=iterations, decay=decay)
    n1 = int(iterations * mixed_split) if precision == "mixed" else 0
    if precision == "mixed" and (n1 == 0 or n1 == iterations):
        precision, n1 = "highest", 0
    chunk = (iterations if precision == "mixed"
             else max(1, min(chunk_size, iterations)))

    def run(flat, m, v, u, step0):
        if precision == "mixed":
            flat, m, v, l1 = fused_dgm_packed_chunk(
                spec, model, flat, m, v, u[:n1], 0, lrate,
                precision=jax.lax.Precision.DEFAULT, **common)
            flat, m, v, l2 = fused_dgm_packed_chunk(
                spec, model, flat, m, v, u[n1:], n1, lrate,
                precision=jax.lax.Precision.HIGHEST, **common)
            return flat, m, v, jnp.concatenate([l1, l2], axis=1)
        return fused_dgm_packed_chunk(
            spec, model, flat, m, v, u, step0, lrate,
            precision=_PRECISIONS[precision], **common)

    t0 = time.perf_counter()
    flat, zeros = cached_call(jax.jit(init_all), init_key,
                              label=f"dgmpackinit-{n_replicas}")
    m = v = zeros
    u0 = cached_call(draw, run_key, 0, label="draw", n=chunk)
    jrun = jax.jit(run)
    compiled = cached_compile(jrun, flat, m, v, u0, 0,
                              label=f"dgmpack-{problem.name}-{n_replicas}")
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
    params_list = [unpack_dgm(f)
                   for f in unstack_replicas(flat, shapes, n_replicas)]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *params_list)
    return stacked, losses


def _sweep_prologue(problem, key, max_iters, batch_size, model, precision,
                    schedule):
    """Shared validation + key/stream derivation for the DGM runtime-gated
    sweep evaluators (sequential and sharded BOTH route through this so
    their bit-identical equivalence cannot drift — same checks, same
    horizon padding, same key split, same per-index uniform stream).
    Returns (spec, model, schedule, const, user_max, padded_max,
    init_key, uniforms)."""
    spec = spec_for(problem, batch_size)
    if spec is None:
        raise ValueError(f"no fused DGM spec for {problem.name!r}")
    model = model or problem.default_model()
    if not supports(problem, model, batch_size):
        raise ValueError(
            f"fused DGM engine needs a DGM model with {spec.act!r} gates")
    if schedule is None:
        schedule = problem.defaults.schedule
    if precision == "mixed":
        raise ValueError("the sweep evaluator is single-phase (the mixed "
                         "schedule's phase split is compile-time, the "
                         "trial budget is runtime); use 'highest' or "
                         "'default'")
    # Pad the compiled horizon to a multiple of 1000 (a prime/odd
    # max_iters would force S=1 steps per grid cell); trials clamp to the
    # caller's max_iters and the step gate masks the padding steps.
    user_max = max_iters
    max_iters = -(-max_iters // 1000) * 1000
    const = None
    if isinstance(spec, FredholmDGMSpec):
        const = _fredholm_const(problem, batch_size, spec.n_groups)
    init_key, run_key = cached_split(key)
    _draw_all = jax.jit(lambda k: jax.vmap(
        lambda i: jax.random.uniform(jax.random.fold_in(k, i),
                                     (batch_size, spec.n_uniform))
    )(jnp.arange(max_iters)))
    uniforms = cached_call(_draw_all, run_key, label="draw")
    return spec, model, schedule, const, user_max, max_iters, init_key, \
        uniforms


def make_sweep_evaluator(problem, key, max_iters, batch_size=100,
                         max_batch: int | None = None,
                         model=None, steps_per_cell: int | None = None,
                         precision: str = "highest",
                         schedule: str | None = None, decay: float = 0.1,
                         horizon: str = "trial"):
    """Compile ONE fused DGM executable covering a sweep space and return
    its trial evaluator.

    * ``max_batch=None`` (default): the {lrate, n_iters} space —
      ``eval_fn(trial_index, lrate, n_iters)``. lr is an SMEM scalar;
      n_iters a ``pl.when`` step gate (steps past the trial's own budget
      freeze params/moments/history). Decay schedules follow each trial's
      OWN n_iters horizon, matching a standalone run of that budget.
    * ``max_batch=M``: the FULL reference {batch_size, n_iters, lrate}
      space (optimize_heat_ray.py:173-176; VERDICT r3 #2) —
      ``eval_fn(trial_index, lrate, batch_size, n_iters)``. Collocation
      rows ≥ batch_size are masked out of the loss at runtime (iota row
      mask over the M-row tile, the MLP engine's construction). Fredholm's
      quadrature node groups are packed once at M (k ≤ M required) and are
      NOT masked — k is a problem constant, not a batch hyperparameter.
      FitzHugh–Nagumo bs-sweeps evaluate the REFERENCE protocol (iid
      collocation, plain loss): causal weighting is a single-run training
      protocol (equations.fitzhugh_nagumo.loss masks the same way), and a
      row-prefix mask over the causal build's time-sorted strata would
      train short trials on early times only.

    ``horizon``: "trial" decays schedules over each trial's own n_iters
    (standalone-run semantics); "fixed" decays over ``max_iters`` for
    every trial (the halving schedulers' exact-promotion continuation
    semantics — see fused_engine.make_sweep_evaluator).
    """
    if horizon not in ("trial", "fixed"):
        raise ValueError(f"horizon must be 'trial' or 'fixed' ({horizon!r})")
    if max_batch is not None:
        batch_size = int(max_batch)
        if (problem.name == "fitzhugh_nagumo"
                and getattr(problem, "causal_eps", 0.0) > 0.0):
            import dataclasses

            problem = dataclasses.replace(problem, causal_eps=0.0)
        if problem.name == "fredholm" and problem.k > batch_size:
            raise ValueError(
                f"runtime-batch sweeps need the {problem.k} quadrature "
                f"nodes to fit one max_batch tile (got max_batch="
                f"{batch_size}); raise max_batch or lower k")
    spec, model, schedule, const, user_max, max_iters, init_key, uniforms = \
        _sweep_prologue(problem, key, max_iters, batch_size, model,
                        precision, schedule)

    def run(flat, m, v, u, lr, n_steps, bs=None):
        return fused_dgm_chunk(
            spec, model, flat, m, v, u, 0, lrate=lr, const=const,
            steps_per_cell=steps_per_cell,
            precision=_PRECISIONS[precision], schedule=schedule,
            total_steps=user_max, decay=decay, runtime_steps=n_steps,
            runtime_bs=bs, trial_horizon=horizon == "trial")

    memo_key = ("dgmsw", problem, model, batch_size, max_batch, max_iters,
                user_max, precision, schedule, decay, horizon,
                steps_per_cell)
    jinit = _memo_compile(memo_key + ("init",), lambda: cached_compile(
        jax.jit(model.init), jax.random.fold_in(init_key, 0), label="init"))
    flat0 = pack_dgm(jinit(jax.random.fold_in(init_key, 0)))
    zeros = tuple(jnp.zeros_like(p) for p in flat0)
    if max_batch is None:
        compiled = _memo_compile(
            memo_key + ("kernel",), lambda: cached_compile(
                jax.jit(run), flat0, zeros, zeros, uniforms,
                np.float32(0.0), np.int32(max_iters),
                label=f"dgmsw-{problem.name}"))

        def eval_fn(trial_index: int, lrate: float, n_iters: int):
            n_iters = max(1, min(int(n_iters), user_max))
            flat = pack_dgm(jinit(jax.random.fold_in(init_key, trial_index)))
            p, _, _, losses = compiled(flat, zeros, zeros, uniforms,
                                       np.float32(lrate), np.int32(n_iters))
            return np.asarray(losses)[:n_iters], p

        return eval_fn

    compiled = _memo_compile(memo_key + ("kernel-bs",),
                             lambda: cached_compile(
                                 jax.jit(run), flat0, zeros, zeros, uniforms,
                                 np.float32(0.0), np.int32(max_iters),
                                 np.int32(batch_size),
                                 label=f"dgmswb-{problem.name}"))

    def eval_fn_bs(trial_index: int, lrate: float, bs: int, n_iters: int):
        n_iters = max(1, min(int(n_iters), user_max))
        bs = max(1, min(int(bs), batch_size))
        flat = pack_dgm(jinit(jax.random.fold_in(init_key, trial_index)))
        p, _, _, losses = compiled(flat, zeros, zeros, uniforms,
                                   np.float32(lrate), np.int32(n_iters),
                                   np.int32(bs))
        return np.asarray(losses)[:n_iters], p

    return eval_fn_bs


def make_packed_rung_evaluator(problem, key, max_iters, n_slots,
                               batch_size=100, max_batch: int | None = None,
                               model=None,
                               steps_per_cell: int | None = None,
                               precision: str = "highest",
                               schedule: str | None = None,
                               decay: float = 0.1,
                               horizon: str = "fixed",
                               rep_tile: int | None = None):
    """DGM counterpart of fused_engine.make_packed_rung_evaluator: a
    whole halving rung as ONE packed dispatch, per-slot lr/n_iters
    runtime vectors (n_iters=0 = pruned slot). With ``max_batch`` each
    slot also masks collocation rows ≥ its own batch_size (the bs-sweep
    semantics of :func:`make_sweep_evaluator`: FN slots evaluate the
    reference protocol, Fredholm's quadrature nodes must fit the tile).

    Returns ``eval_fn(trial_indices, lrates, batch_sizes, n_iters) ->
    (final_losses [n_slots], flat_stacked)`` — same contract as the MLP
    packed evaluator (batch_sizes are clamped to the compile width and
    ignored unless ``max_batch`` is given)."""
    from differential_equations_dnn_tpu.kernels.engine_core import (
        stack_replicas,
        unstack_replicas,
    )

    if horizon not in ("trial", "fixed"):
        raise ValueError(f"horizon must be 'trial' or 'fixed' ({horizon!r})")
    mask_rows = max_batch is not None
    if mask_rows:
        batch_size = int(max_batch)
        if (problem.name == "fitzhugh_nagumo"
                and getattr(problem, "causal_eps", 0.0) > 0.0):
            import dataclasses

            problem = dataclasses.replace(problem, causal_eps=0.0)
        if problem.name == "fredholm" and problem.k > batch_size:
            raise ValueError(
                f"runtime-batch sweeps need the {problem.k} quadrature "
                f"nodes to fit one max_batch tile (got max_batch="
                f"{batch_size}); raise max_batch or lower k")
    spec, model, schedule, const, user_max, max_iters, init_key, uniforms = \
        _sweep_prologue(problem, key, max_iters, batch_size, model,
                        precision, schedule)
    D, O = model.input_dim, model.output_dim
    L, H = model.num_layers, model.hidden_size
    shapes = [(D, H), (H,), (L, H, 3 * H), (L, D, 3 * H), (L, 3 * H),
              (L, H, H), (L, D, H), (L, H), (H, O), (O,)]

    # Key as an ARGUMENT so the program is seed-independent and AOT-cache
    # -stable (see fused_engine.make_packed_rung_evaluator).
    def init_all(ik, ts):
        flats = [pack_dgm(model.init(jax.random.fold_in(ik, ts[r])))
                 for r in range(n_slots)]
        return stack_replicas(flats)

    memo_key = ("dgmprk", problem, model, n_slots, batch_size, max_batch,
                max_iters, user_max, precision, schedule, decay, horizon,
                steps_per_cell, rep_tile)
    _jinit_c = _memo_compile(memo_key + ("init",), lambda: cached_compile(
        jax.jit(init_all), init_key, jnp.arange(n_slots, dtype=jnp.int32),
        label=f"dgmprk-init-{problem.name}-{n_slots}"))
    jinit_all = lambda ts: _jinit_c(init_key, ts)

    def run(flat, lrs, bss, ns, u):
        zeros = tuple(jnp.zeros_like(t) for t in flat)
        flat, _, _, losses = fused_dgm_packed_chunk(
            spec, model, flat, zeros, zeros, u, 0, lrate=0.0,
            n_replicas=n_slots, rep_tile=rep_tile, const=const,
            steps_per_cell=steps_per_cell,
            precision=_PRECISIONS[precision], schedule=schedule,
            total_steps=user_max, decay=decay,
            lr_vec=lrs, bs_vec=bss, steps_vec=ns, mask_rows=mask_rows,
            trial_horizon=horizon == "trial")
        return flat, losses

    ts0 = jnp.arange(n_slots, dtype=jnp.int32)
    flat0 = jinit_all(ts0)
    lr0 = jnp.full((n_slots,), 1e-4, jnp.float32)
    bs0 = jnp.full((n_slots,), batch_size, jnp.int32)
    ns0 = jnp.full((n_slots,), max_iters, jnp.int32)
    compiled = _memo_compile(memo_key + ("kernel",), lambda: cached_compile(
        jax.jit(run), flat0, lr0, bs0, ns0, uniforms,
        label=f"dgmprk-{problem.name}-{n_slots}"))

    def eval_fn(trial_indices, lrates, batch_sizes, n_iters):
        if len(trial_indices) != n_slots:
            raise ValueError(f"expected {n_slots} slots "
                             f"(got {len(trial_indices)})")
        flat = jinit_all(jnp.asarray(trial_indices, jnp.int32))
        ns = np.clip(np.asarray(n_iters, np.int64), 0, user_max)
        flat_out, losses = compiled(
            flat,
            jnp.asarray(lrates, jnp.float32),
            jnp.clip(jnp.asarray(batch_sizes, jnp.int32), 1, batch_size),
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


def make_sharded_rung_evaluator(problem, key, max_iters, mesh,
                                batch_size=100, max_batch: int | None = None,
                                model=None,
                                steps_per_cell: int | None = None,
                                precision: str = "highest",
                                schedule: str | None = None,
                                decay: float = 0.1,
                                horizon: str = "trial"):
    """DGM counterpart of fused_engine.make_sharded_rung_evaluator:
    evaluate a VECTOR of step-gated trials (lr + n_iters runtime) in ONE
    dispatch, trials sharded over ``mesh``'s 'pop' axis via
    ``jax.shard_map``. Key-compatible with :func:`make_sweep_evaluator`
    — identical init folds and collocation stream — so a sharded rung
    reproduces the sequential trials exactly.

    ``max_batch=None``: batch width is compile-time —
    ``eval_fn(trial_indices, lrates, n_iters)``. ``max_batch=M``: each
    trial additionally masks collocation rows ≥ its own batch_size
    (:func:`make_sweep_evaluator`'s bs-sweep semantics, same FN/Fredholm
    guards) — ``eval_fn(trial_indices, lrates, batch_sizes, n_iters)``.

    Returns final_losses [P] + flat_stacked; P must be a multiple of the
    'pop' axis size (pad by repeating trials). ``horizon`` as in
    :func:`make_sweep_evaluator` ("fixed" = the halving schedulers'
    exact-promotion continuation semantics)."""
    from jax.sharding import NamedSharding, PartitionSpec

    if horizon not in ("trial", "fixed"):
        raise ValueError(f"horizon must be 'trial' or 'fixed' ({horizon!r})")
    mask_rows = max_batch is not None
    if mask_rows:
        batch_size = int(max_batch)
        if (problem.name == "fitzhugh_nagumo"
                and getattr(problem, "causal_eps", 0.0) > 0.0):
            import dataclasses

            problem = dataclasses.replace(problem, causal_eps=0.0)
        if problem.name == "fredholm" and problem.k > batch_size:
            raise ValueError(
                f"runtime-batch sweeps need the {problem.k} quadrature "
                f"nodes to fit one max_batch tile (got max_batch="
                f"{batch_size}); raise max_batch or lower k")
    spec, model, schedule, const, user_max, max_iters, init_key, uniforms = \
        _sweep_prologue(problem, key, max_iters, batch_size, model,
                        precision, schedule)
    pop_axis = "pop"
    if pop_axis not in mesh.shape:
        raise ValueError(
            f"sharded rung evaluation needs a '{pop_axis}' mesh axis; "
            f"build the mesh with make_mesh({{'pop': N}})")
    n_shards = mesh.shape[pop_axis]
    _init_all_jit = jax.jit(lambda ik, ts: jax.vmap(
        lambda t: model.init(jax.random.fold_in(ik, t)))(ts))
    # AOT-cached per rung width, key as argument (seed-independent program
    # — see fused_engine.make_sharded_rung_evaluator).
    _init_all = lambda ts: cached_call(
        _init_all_jit, init_key, ts, label=f"dgmsh-init-{problem.name}")

    def run_local(flat_local, lrs, bss, ns, u):
        outs_p, finals = [], []
        n_tensors = len(flat_local)
        for j in range(flat_local[0].shape[0]):
            p = tuple(t[j] for t in flat_local)
            zeros = tuple(jnp.zeros_like(t) for t in p)
            p, _, _, lo = fused_dgm_chunk(
                spec, model, p, zeros, zeros, u, 0, lrate=lrs[j],
                const=const, steps_per_cell=steps_per_cell,
                precision=_PRECISIONS[precision], schedule=schedule,
                total_steps=user_max, decay=decay, runtime_steps=ns[j],
                runtime_bs=bss[j] if mask_rows else None,
                trial_horizon=horizon == "trial")
            outs_p.append(p)
            finals.append(jnp.take(lo, ns[j] - 1))
        return (tuple(jnp.stack([o[k] for o in outs_p])
                      for k in range(n_tensors)),
                jnp.stack(finals))

    pspec = PartitionSpec(pop_axis)
    sharded = jax.jit(jax.shard_map(
        run_local, mesh=mesh,
        in_specs=(tuple(pspec for _ in range(_N_TENSORS)),
                  pspec, pspec, pspec, PartitionSpec()),
        out_specs=(tuple(pspec for _ in range(_N_TENSORS)), pspec),
        check_vma=False))

    def _run(trial_indices, lrates, batch_sizes, n_iters):
        P = len(trial_indices)
        if P % n_shards:
            raise ValueError(f"{P} trials not divisible by the "
                             f"'{pop_axis}' axis ({n_shards} shards) — "
                             f"pad by repeating trials")
        flat = pack_dgm(_init_all(jnp.asarray(trial_indices)))
        flat = tuple(jax.device_put(t, NamedSharding(mesh, pspec))
                     for t in flat)
        lrs = jnp.asarray(lrates, jnp.float32)
        bss = jnp.clip(jnp.asarray(batch_sizes, jnp.int32), 1, batch_size)
        ns = jnp.clip(jnp.asarray(n_iters, jnp.int32), 1, user_max)
        flat_out, finals = sharded(flat, lrs, bss, ns, uniforms)
        return np.asarray(finals), flat_out

    if mask_rows:
        return _run

    def eval_fn(trial_indices, lrates, n_iters):
        full = [batch_size] * len(trial_indices)
        return _run(trial_indices, lrates, full, n_iters)

    return eval_fn


def train_dgm_fused_result(problem, key, iterations, batch_size=100,
                           lrate=1e-4, chunk_size=25_000, model=None,
                           params=None, opt_state=None, start_step: int = 0,
                           steps_per_cell: int | None = None,
                           precision: str = "highest",
                           schedule: str | None = None, decay: float = 0.1,
                           total_steps: int | None = None,
                           mixed_split: float = 0.65):
    """Train a DGM-spec'd equation with the fused kernel. Same contract as
    fused_engine.train_fused_result (TrainResult out, bit-identical resume
    via params + opt_state + start_step). ``precision="mixed"`` chains a
    bf16-MXU coarse phase into an exact-fp32 final phase through the
    bit-exact resume path (same schedule as the MLP engines)."""
    import time

    from differential_equations_dnn_tpu.train.trainer import TrainResult

    spec = spec_for(problem, batch_size)
    if spec is None:
        raise ValueError(f"no fused DGM spec for equation {problem.name!r} "
                         f"(fitzhugh_nagumo dgm arch | fredholm gauss)")
    model = model or problem.default_model()
    if not supports(problem, model, batch_size):
        raise ValueError(
            f"fused DGM engine needs a DGM model with {spec.act!r} gates")
    if schedule is None:
        schedule = problem.defaults.schedule
    if total_steps is None:
        total_steps = start_step + iterations
    if precision == "mixed":
        n1 = int(iterations * mixed_split)
        n2 = iterations - n1
        if n1 == 0 or n2 == 0:
            precision = "highest"
        elif iterations > chunk_size:
            # Chunked budgets: two internally-chunked phases chained
            # through the bit-exact resume path.
            common = dict(batch_size=batch_size, lrate=lrate,
                          chunk_size=chunk_size, model=model,
                          steps_per_cell=steps_per_cell, schedule=schedule,
                          decay=decay, total_steps=total_steps)
            coarse = train_dgm_fused_result(
                problem, key, n1, params=params, opt_state=opt_state,
                start_step=start_step, precision="default", **common)
            fine = train_dgm_fused_result(
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
        else:
            # Whole budget fits one chunk: chain BOTH phases inside one
            # XLA dispatch (each extra dispatch over the remote tunnel
            # costs tens of ms and risks a fresh compile transient).
            return _train_dgm_mixed_single_dispatch(
                problem, spec, key, iterations, n1, start_step, params,
                opt_state, batch_size=batch_size, lrate=lrate, model=model,
                steps_per_cell=steps_per_cell, schedule=schedule,
                decay=decay, total_steps=total_steps)
    mxu_precision = _PRECISIONS[precision]

    const = None
    if isinstance(spec, FredholmDGMSpec):
        const = _fredholm_const(problem, batch_size, spec.n_groups)

    run_key, flat, m, v = fused_prologue(model, pack_dgm, key, params,
                                         opt_state)

    run = jax.jit(functools.partial(
        fused_dgm_chunk, spec, model, lrate=lrate, const=const,
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
                              label=f"dgm-{problem.name}")
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
        params=unpack_dgm(flat),
        opt_state={"m": unpack_dgm(m), "v": unpack_dgm(v)},
        loss_history=np.concatenate(losses_out),
        wall_time=wall,
        iters_per_sec=iterations / wall if wall else float("inf"),
        compile_time=compile_time,
    )


def _train_dgm_mixed_single_dispatch(problem, spec, key, iterations, n1,
                                     start_step, params, opt_state, *,
                                     batch_size, lrate, model,
                                     steps_per_cell, schedule, decay,
                                     total_steps):
    """The ``precision="mixed"`` schedule as ONE XLA program for the DGM
    engine (mirrors fused_engine._train_mixed_single_dispatch): the
    bf16-MXU kernel runs the first ``n1`` steps and hands params + Adam
    moments to the exact-fp32 kernel inside the same dispatch."""
    import time

    from differential_equations_dnn_tpu.train.trainer import TrainResult

    const = None
    if isinstance(spec, FredholmDGMSpec):
        const = _fredholm_const(problem, batch_size, spec.n_groups)

    run_key, flat, m, v = fused_prologue(model, pack_dgm, key, params,
                                         opt_state)

    n2 = iterations - n1
    common = dict(lrate=lrate, const=const, steps_per_cell=steps_per_cell,
                  schedule=schedule, total_steps=total_steps, decay=decay)

    @jax.jit
    def run(flat, m, v, u1, u2, step0):
        flat, m, v, l1 = fused_dgm_chunk(
            spec, model, flat, m, v, u1, step0,
            precision=jax.lax.Precision.DEFAULT, **common)
        flat, m, v, l2 = fused_dgm_chunk(
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
                              label=f"dgmmx-{problem.name}")
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
        params=unpack_dgm(flat),
        opt_state={"m": unpack_dgm(m), "v": unpack_dgm(v)},
        loss_history=np.asarray(losses),
        wall_time=wall,
        iters_per_sec=iterations / wall if wall else float("inf"),
        compile_time=compile_time,
    )


def train_dgm_fused_ensemble(problem, key, iterations, n_replicas, mesh=None,
                             batch_size=100, lrate=1e-4, model=None,
                             steps_per_cell: int | None = None,
                             precision: str = "highest",
                             schedule: str | None = None, decay: float = 0.1,
                             timings: dict | None = None):
    """DGM counterpart of fused_engine.train_fused_ensemble: N
    independently-initialised replicas, EACH running its whole training
    loop inside its own Mosaic kernel, sharded over ``mesh``'s 'pop' axis
    with ``jax.shard_map`` (zero cross-replica comms; shared collocation
    stream; quadrature constants replicated). ``mesh=None`` runs the
    replicas sequentially on one device.

    Returns (stacked_params_pytree, losses [n_replicas, iterations])."""
    from jax.sharding import NamedSharding, PartitionSpec

    spec = spec_for(problem, batch_size)
    if spec is None:
        raise ValueError(f"no fused DGM spec for {problem.name!r}")
    model = model or problem.default_model()
    if not supports(problem, model, batch_size):
        raise ValueError(
            f"fused DGM engine needs a DGM model with {spec.act!r} gates")
    if schedule is None:
        schedule = problem.defaults.schedule

    const = None
    if isinstance(spec, FredholmDGMSpec):
        const = _fredholm_const(problem, batch_size, spec.n_groups)

    init_key, run_key = jax.random.split(key)
    stacked = jax.vmap(model.init)(jax.random.split(init_key, n_replicas))
    flat = pack_dgm(stacked)  # tuple of [n_replicas, ...] tensors

    _draw_all = jax.jit(lambda k: jax.vmap(
        lambda i: jax.random.uniform(jax.random.fold_in(k, i),
                                     (batch_size, spec.n_uniform))
    )(jnp.arange(iterations)))
    uniforms = cached_call(_draw_all, run_key, label="draw")

    common = dict(lrate=lrate, const=const, steps_per_cell=steps_per_cell,
                  schedule=schedule, total_steps=iterations, decay=decay)
    n1 = int(iterations * 0.65) if precision == "mixed" else 0
    if precision == "mixed" and (n1 == 0 or n1 == iterations):
        precision, n1 = "highest", 0

    def _train_one(p, m, v, u):
        # Mixed precision runs the same two-phase chain per replica as
        # fused_engine.train_fused_ensemble (bf16 coarse + exact-fp32
        # final, Adam state handed over bit-exactly inside one program).
        if precision == "mixed":
            p, m, v, l1 = fused_dgm_chunk(
                spec, model, p, m, v, u[:n1], 0,
                precision=jax.lax.Precision.DEFAULT, **common)
            p, m, v, l2 = fused_dgm_chunk(
                spec, model, p, m, v, u[n1:], n1,
                precision=jax.lax.Precision.HIGHEST, **common)
            return p, jnp.concatenate([l1, l2])
        p, _, _, lo = fused_dgm_chunk(
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
                      for k in range(_N_TENSORS)),
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
    from differential_equations_dnn_tpu.kernels.fused_engine import (
        _timed_ensemble_run,
    )

    flat_out, losses = _timed_ensemble_run(run, flat, uniforms, timings)
    return unpack_dgm(flat_out), np.asarray(losses)
