"""Stacked Taylor propagation: all derivative streams in ONE matmul per layer.

The jvp-over-jvp tap (ops.diff) gives XLA four separate small matmuls per MLP
layer (value, x-tangent, xx-tangent, t-tangent). For a TPU MXU, four [B, H]
matmuls underutilise the 128×128 systolic array when B is small. This module
propagates the four streams STACKED into a single [4B, H] operand — one large
matmul per layer — with the pointwise nonlinear Taylor rules applied between
layers:

    linear  z_s = a_s @ W        (+ b for the value stream only)
    tanh    a0  = tanh(z0),          d = 1 − a0²      (value)
            a1  = d·z1                                 (∂/∂v)
            a2  = d·z2 − 2·a0·d·z1²                    (∂²/∂v²)
            a3  = d·z3                                 (∂/∂w, second direction)

This is the exact forward-mode algebra (truncated Taylor/jet arithmetic), so
results match ops.diff bit-for-bit up to reassociation. It is fully
differentiable (pure jnp), so reverse-mode AD through it trains the net.

Specialised to the plain MLP pytree layout (models.mlp, no BatchNorm).
Reference hot path replaced: heat.py:73-85's two nested reverse taps.
"""

import jax.numpy as jnp
from jax import lax

from differential_equations_dnn_tpu.core.precision import DOT_PRECISION

_TAYLOR_ACTS = ("tanh", "relu", "sigmoid", "identity")


def _act_state(name, z0):
    """(a, a', a'') of the activation at z0 — computed ONCE per layer; every
    tangent stream's Taylor rule is then pure multiply-add:
    a1 = a'·z1,  a2 = a'·z2 + a''·z1²."""
    if name == "tanh":
        a0 = jnp.tanh(z0)
        d = 1.0 - a0 * a0
        return a0, d, -2.0 * a0 * d
    if name == "sigmoid":
        a0 = 1.0 / (1.0 + jnp.exp(-z0))
        d = a0 * (1.0 - a0)
        return a0, d, d * (1.0 - 2.0 * a0)
    if name == "relu":
        g = (z0 > 0).astype(z0.dtype)
        return jnp.maximum(z0, 0.0), g, jnp.zeros_like(z0)
    if name == "identity":
        one = jnp.ones_like(z0)
        return z0, one, jnp.zeros_like(z0)
    raise ValueError(f"activation {name!r} not supported by stacked Taylor "
                     f"propagation (supported: {_TAYLOR_ACTS})")


def _act_taylor(name, z0, z1, z2, z3):
    """Apply activation to the value stream and its Taylor rules to the
    tangent streams. z2 is the SECOND directional derivative along the same
    direction as z1; z3 an independent first-order direction."""
    if name == "tanh":
        a0 = jnp.tanh(z0)
        d = 1.0 - a0 * a0
        return a0, d * z1, d * z2 - 2.0 * a0 * d * (z1 * z1), d * z3
    if name == "sigmoid":
        a0 = 1.0 / (1.0 + jnp.exp(-z0))
        d = a0 * (1.0 - a0)
        dd = d * (1.0 - 2.0 * a0)
        return a0, d * z1, d * z2 + dd * (z1 * z1), d * z3
    if name == "relu":
        g = (z0 > 0).astype(z0.dtype)
        return jnp.maximum(z0, 0.0), g * z1, g * z2, g * z3
    if name == "identity":
        return z0, z1, z2, z3
    raise ValueError(f"activation {name!r} not supported by stacked Taylor "
                     f"propagation (supported: {_TAYLOR_ACTS})")


def mlp_taps(model, params, x, v, w):
    """Evaluate u, ∂_v u, ∂²_v u, ∂_w u of a plain MLP at a batch of points.

    Args:
      model: models.MLP config (batch_norm must be None).
      params: MLP parameter pytree.
      x: [B, D] evaluation points.
      v: [D] first direction (the second-order one, e.g. e_x).
      w: [D] independent first-order direction (e.g. e_t).

    Returns:
      (u, du_v, d2u_vv, du_w), each [B, out_dim].
    """
    if model.batch_norm is not None:
        raise ValueError("mlp_taps supports plain MLPs only")
    name = model.activation
    B = x.shape[0]

    a0 = x
    a1 = jnp.broadcast_to(v, x.shape)
    a2 = jnp.zeros_like(x)
    a3 = jnp.broadcast_to(w, x.shape)

    def layer(a0, a1, a2, a3, W, b):
        z = jnp.dot(jnp.concatenate([a0, a1, a2, a3], axis=0), W,
                    precision=DOT_PRECISION)
        z0, z1, z2, z3 = jnp.split(z, 4, axis=0)
        if b is not None:
            z0 = z0 + b
        return z0, z1, z2, z3

    a0, a1, a2, a3 = _act_taylor(
        name, *layer(a0, a1, a2, a3, params["fc_in"]["w"],
                     params["fc_in"].get("b"))
    )
    if model.num_layers > 0:
        def body(carry, lp):
            s0, s1, s2, s3 = carry
            outs = _act_taylor(name, *layer(s0, s1, s2, s3, lp["w"],
                                            lp.get("b")))
            return outs, None

        (a0, a1, a2, a3), _ = lax.scan(body, (a0, a1, a2, a3),
                                       params["hidden"])
    u, du_v, d2u_vv, du_w = layer(a0, a1, a2, a3, params["fc_out"]["w"],
                                  params["fc_out"]["b"])
    # Output layer is affine: bias affects the value stream only (already
    # handled inside `layer`).
    return u, du_v, d2u_vv, du_w


def mlp_streams(model, params, x, second_dirs=(), first_dirs=(),
                constraints=()):
    """General stacked-stream evaluation for a plain MLP.

    One matmul chain per layer computes, simultaneously:
      * u(x)                                   — value at ``x`` [B, D]
      * (∂_v u, ∂²_v u) for each v in ``second_dirs``   ([D] each)
      * ∂_w u for each w in ``first_dirs``              ([D] each)
      * u(c) for each constraint input c in ``constraints`` ([B, D] each)

    Row layout: [value | (tan_i, sec_i)·len(second) | tan_j·len(first) |
    constraints]. All tangent streams share the single value stream's
    activation state, so mixed first/second-order PDE operators in any
    dimension (e.g. a 2-D Laplacian + time derivative) cost ONE fused
    matmul per layer instead of one jvp nest per direction.

    Returns (u, seconds, firsts_of_seconds, firsts, constraint_values) where
    ``seconds[i] = ∂²_{v_i} u``, ``firsts_of_seconds[i] = ∂_{v_i} u``,
    ``firsts[j] = ∂_{w_j} u``; each [B, out_dim].
    """
    if model.batch_norm is not None:
        raise ValueError("mlp_streams supports plain MLPs only")
    name = model.activation
    B = x.shape[0]
    ns, nf, nc = len(second_dirs), len(first_dirs), len(constraints)

    rows = [x]
    for v in second_dirs:
        rows.append(jnp.broadcast_to(jnp.asarray(v, x.dtype), x.shape))
        rows.append(jnp.zeros_like(x))
    for w in first_dirs:
        rows.append(jnp.broadcast_to(jnp.asarray(w, x.dtype), x.shape))
    rows.extend(constraints)
    stacked = jnp.concatenate(rows, axis=0)

    def act_all(z):
        a0, d, dd = _act_state(name, z[:B])   # value-stream state, ONCE
        out = [a0]
        for i in range(ns):
            z1 = z[(1 + 2 * i) * B:(2 + 2 * i) * B]
            z2 = z[(2 + 2 * i) * B:(3 + 2 * i) * B]
            out.append(d * z1)
            out.append(d * z2 + dd * (z1 * z1))
        base = 1 + 2 * ns
        for j in range(nf):
            out.append(d * z[(base + j) * B:(base + j + 1) * B])
        if nc:
            out.append(_act_state(name, z[(base + nf) * B:])[0])
        return jnp.concatenate(out, axis=0)

    n_value_tail = nc  # constraint blocks get the bias; tangents do not
    bias_mask = jnp.concatenate(
        [jnp.ones((B, 1), x.dtype)]
        + [jnp.zeros(((2 * ns + nf) * B, 1), x.dtype)]
        + ([jnp.ones((n_value_tail * B, 1), x.dtype)] if nc else []),
        axis=0)

    def layer(a, W, b):
        z = jnp.dot(a, W, precision=DOT_PRECISION)
        if b is not None:
            z = z + bias_mask * b
        return z

    a = act_all(layer(stacked, params["fc_in"]["w"], params["fc_in"].get("b")))
    if model.num_layers > 0:
        def body(a, lp):
            return act_all(layer(a, lp["w"], lp.get("b"))), None

        a, _ = lax.scan(body, a, params["hidden"])
    out = layer(a, params["fc_out"]["w"], params["fc_out"]["b"])

    blocks = [out[k * B:(k + 1) * B] for k in range(1 + 2 * ns + nf + nc)]
    u = blocks[0]
    firsts_of_seconds = [blocks[1 + 2 * i] for i in range(ns)]
    seconds = [blocks[2 + 2 * i] for i in range(ns)]
    firsts = [blocks[1 + 2 * ns + j] for j in range(nf)]
    cons = [blocks[1 + 2 * ns + nf + k] for k in range(nc)]
    return u, seconds, firsts_of_seconds, firsts, cons


def heat_fused_streams(model, params, xt, x0, xb1, xb2):
    """The whole heat-equation step's network evaluations in ONE stacked
    matmul chain: interior value + x-tangent + xx-tangent + t-tangent PLUS
    the three constraint forwards (IC and two boundaries), i.e. 7 logical
    streams in a single [7B, H] operand per layer.

    Returns (u, u_x, u_xx, u_t, u0, ub1, ub2), each [B, 1].

    Replaces: 1 interior forward + 2 nested reverse taps + 3 constraint
    forwards per step in the reference (heat.py:73-93).
    """
    u, (u_xx,), (u_x,), (u_t,), (u0, ub1, ub2) = mlp_streams(
        model, params, xt,
        second_dirs=([1.0, 0.0],),
        first_dirs=([0.0, 1.0],),
        constraints=(x0, xb1, xb2),
    )
    return u, u_x, u_xx, u_t, u0, ub1, ub2
