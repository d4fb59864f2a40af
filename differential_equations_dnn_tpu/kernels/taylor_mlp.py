"""Pallas TPU kernels: fused MLP forward + Taylor derivative streams.

``heat_fused_streams_pallas`` is the kernel form of
``ops.taylor.heat_fused_streams``: the heat step's 7 logical network
evaluations (interior value, x-tangent, xx-tangent, t-tangent, IC forward,
two boundary forwards) advance through the layer stack entirely in VMEM —
weights are loaded once per grid cell and every intermediate stays on-chip.
The grid tiles the collocation batch, so arbitrarily large residual
evaluations stream through fixed VMEM.

Differentiation: the kernel carries a ``jax.custom_vjp`` whose backward pass
re-runs the mathematically-identical pure-JAX implementation under
``jax.vjp`` (one rematerialised forward + reverse sweep, XLA-fused). The
kernel therefore accelerates forward/inference paths (residual monitoring,
grid evaluation) and remains usable inside ``value_and_grad`` training.

On non-TPU backends the kernels run in Pallas interpreter mode so the full
test suite exercises them on CPU.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _act_value(name, z):
    if name == "tanh":
        return jnp.tanh(z)
    if name == "relu":
        return jnp.maximum(z, 0.0)
    if name == "sigmoid":
        return 1.0 / (1.0 + jnp.exp(-z))
    raise ValueError(f"activation {name!r} not supported in Pallas kernels")


def _act_streams(name, z0, z1, z2, z3):
    """Taylor rules (see ops.taylor._act_taylor) applied in-kernel."""
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
    raise ValueError(f"activation {name!r} not supported in Pallas kernels")


# ---------------------------------------------------------------------------
# Fused heat-step streams kernel
# ---------------------------------------------------------------------------


def _heat_kernel(activation, num_layers, tile_b,
                 xs_ref, w_in_ref, b_in_ref, w_hid_ref, b_hid_ref,
                 w_out_ref, b_out_ref, out_ref):
    """One grid cell: [7, TILE_B, 2] input streams → [7, TILE_B, 1] outputs.

    Stream order: value, x-tan, xx-tan, t-tan, ic, bc1, bc2. Value rules for
    streams {0, 4, 5, 6}; Taylor tangent rules for {1, 2, 3} driven by
    stream 0's pre-activations.
    """
    B = tile_b
    xs = xs_ref[:]                      # [7, B, 2]
    x_flat = xs.reshape(7 * B, xs.shape[-1])

    def layer(a_flat, w, b):
        z = jnp.dot(a_flat, w, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
        z = z.reshape(7, B, -1)
        # Bias on value streams only (constant → zero derivative).
        zb = z + b[None, None, :]
        z = jnp.concatenate([zb[:1], z[1:4], zb[4:]], axis=0)
        z0, z1, z2, z3 = z[0], z[1], z[2], z[3]
        a0, a1, a2, a3 = _act_streams(activation, z0, z1, z2, z3)
        ac = _act_value(activation, z[4:])
        a = jnp.concatenate([a0[None], a1[None], a2[None], a3[None], ac],
                            axis=0)
        return a.reshape(7 * B, -1)

    a = layer(x_flat, w_in_ref[:], b_in_ref[:])

    for l in range(num_layers):        # static unroll: weights stay in VMEM
        a = layer(a, w_hid_ref[l], b_hid_ref[l])

    z = jnp.dot(a, w_out_ref[:], preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
    z = z.reshape(7, B, -1)
    zb = z + b_out_ref[:][None, None, :]
    out_ref[:] = jnp.concatenate([zb[:1], z[1:4], zb[4:]], axis=0)


def _heat_streams_fwd_impl(model, params, xt, x0, xb1, xb2, tile_b=256):
    B, D = xt.shape
    H = model.hidden_size
    ex = jnp.asarray([1.0, 0.0], xt.dtype)
    et = jnp.asarray([0.0, 1.0], xt.dtype)
    xs = jnp.stack([
        xt,
        jnp.broadcast_to(ex, xt.shape),
        jnp.zeros_like(xt),
        jnp.broadcast_to(et, xt.shape),
        x0, xb1, xb2,
    ], axis=0)                                        # [7, B, 2]

    tile = min(tile_b, B)
    pad = (-B) % tile
    if pad:
        xs = jnp.pad(xs, ((0, 0), (0, pad), (0, 0)))
    Bp = B + pad
    grid = (Bp // tile,)

    L = model.num_layers
    w_hid = params["hidden"]["w"] if L > 0 else jnp.zeros((0, H, H), xt.dtype)
    b_hid = params["hidden"].get("b")
    if b_hid is None or L == 0:
        b_hid = jnp.zeros((max(L, 1), H), xt.dtype)
    b_in = params["fc_in"].get("b")
    if b_in is None:
        b_in = jnp.zeros((H,), xt.dtype)

    kernel = functools.partial(_heat_kernel, model.activation, L, tile)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((7, tile, D), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D, H), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((max(L, 1), H, H), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((max(L, 1), H), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, model.output_dim), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((model.output_dim,), lambda i: (0,),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((7, tile, model.output_dim),
                               lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((7, Bp, model.output_dim), xt.dtype),
        interpret=_interpret(),
    )(xs, params["fc_in"]["w"], b_in, w_hid, b_hid,
      params["fc_out"]["w"], params["fc_out"]["b"])

    out = out[:, :B]
    return tuple(out[i] for i in range(7))


def heat_fused_streams_pallas(model, params, xt, x0, xb1, xb2):
    """(u, u_x, u_xx, u_t, u0, ub1, ub2) via the fused Pallas kernel, with a
    custom VJP (pure-JAX rematerialised backward) for training use."""
    if model.batch_norm is not None:
        raise ValueError("Pallas heat streams support plain MLPs only")

    from differential_equations_dnn_tpu.ops.taylor import heat_fused_streams

    @jax.custom_vjp
    def fused(params, xt, x0, xb1, xb2):
        return _heat_streams_fwd_impl(model, params, xt, x0, xb1, xb2)

    def fwd(params, xt, x0, xb1, xb2):
        return fused(params, xt, x0, xb1, xb2), (params, xt, x0, xb1, xb2)

    def bwd(res, cts):
        params, xt, x0, xb1, xb2 = res
        _, vjp = jax.vjp(
            lambda p, a, b, c, d: heat_fused_streams(model, p, a, b, c, d),
            params, xt, x0, xb1, xb2,
        )
        return vjp(cts)

    fused.defvjp(fwd, bwd)
    return fused(params, xt, x0, xb1, xb2)


# ---------------------------------------------------------------------------
# Plain fused MLP forward (large-batch inference / grid evaluation)
# ---------------------------------------------------------------------------


def _mlp_kernel(activation, num_layers, x_ref, w_in_ref, b_in_ref,
                w_hid_ref, b_hid_ref, w_out_ref, b_out_ref, out_ref):
    a = _act_value(activation,
                   jnp.dot(x_ref[:], w_in_ref[:],
                           preferred_element_type=jnp.float32,
                           precision=jax.lax.Precision.HIGHEST) + b_in_ref[:])
    for l in range(num_layers):
        a = _act_value(activation,
                       jnp.dot(a, w_hid_ref[l],
                               preferred_element_type=jnp.float32,
                               precision=jax.lax.Precision.HIGHEST)
                       + b_hid_ref[l])
    out_ref[:] = (jnp.dot(a, w_out_ref[:],
                          preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.HIGHEST) + b_out_ref[:])


def mlp_forward_pallas(model, params, x, tile_b: int = 1024):
    """Fused whole-network forward for plain MLPs: weights resident in VMEM,
    batch streamed in tiles — one kernel launch for any grid size (replaces
    the reference's per-point evaluation loop, heat.py:164-171, at kernel
    level)."""
    if model.batch_norm is not None:
        raise ValueError("mlp_forward_pallas supports plain MLPs only")
    B, D = x.shape
    H, L = model.hidden_size, model.num_layers

    tile = min(tile_b, B)
    pad = (-B) % tile
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0)))
    Bp = B + pad

    w_hid = params["hidden"]["w"] if L > 0 else jnp.zeros((0, H, H), x.dtype)
    b_hid = params["hidden"].get("b")
    if b_hid is None or L == 0:
        b_hid = jnp.zeros((max(L, 1), H), x.dtype)
    b_in = params["fc_in"].get("b")
    if b_in is None:
        b_in = jnp.zeros((H,), x.dtype)

    kernel = functools.partial(_mlp_kernel, model.activation, L)
    out = pl.pallas_call(
        kernel,
        grid=(Bp // tile,),
        in_specs=[
            pl.BlockSpec((tile, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((D, H), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((max(L, 1), H, H), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((max(L, 1), H), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, model.output_dim), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((model.output_dim,), lambda i: (0,),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, model.output_dim), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bp, model.output_dim), x.dtype),
        interpret=_interpret(),
    )(x, params["fc_in"]["w"], b_in, w_hid, b_hid,
      params["fc_out"]["w"], params["fc_out"]["b"])
    return out[:B]
