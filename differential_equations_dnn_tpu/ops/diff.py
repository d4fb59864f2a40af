"""Derivative taps for physics residuals — forward-mode, batched, fusable.

The reference extracts derivatives with reverse-mode ``torch.autograd.grad``
inside the loss: one tap for ODEs (simple_ode.py:54-58), two *nested* taps for
the heat equation's u_t / u_xx (heat.py:73-85), and one tap per output
component for systems (fitzhugh_nagumo.py:74-84).

On TPU the inputs are 1-2 dimensional coordinates, so **forward mode is
strictly better**: a single ``jax.jvp`` along a coordinate direction costs ~2
forward passes, needs no transpose program, and composes cleanly for second
order (jvp-over-jvp). Everything here is per-point and meant to be ``vmap``-ed
over the collocation batch; XLA then fuses the whole tap into the surrounding
residual computation.

All functions are shape-polymorphic: ``f`` may be a per-point function
(``R^d -> R^k``, to be vmapped) or an already-batched function
(``[B, d] -> [B, k]``) with a broadcast coordinate direction. The batched form
is REQUIRED for BatchNorm models, whose batch statistics couple samples — a
batched jvp differentiates through that coupling exactly like the reference's
reverse-mode tap over the whole batch does.
"""

import jax
import jax.numpy as jnp


def dirderiv(f, x, v):
    """(f(x), ∂f/∂v) — first directional derivative via one jvp."""
    return jax.jvp(f, (x,), (v,))


def dirderiv2(f, x, v):
    """(f(x), ∂f/∂v, ∂²f/∂v²) — value plus first and second directional
    derivatives in a single jvp-over-jvp (forward-over-forward; replaces the
    reference's nested reverse-mode taps at heat.py:73-85)."""

    def first(z):
        return jax.jvp(f, (z,), (v,))

    (y, dy), (_, d2y) = jax.jvp(first, (x,), (v,))
    return y, dy, d2y


def coord_direction(x, axis):
    """Unit tangent along input coordinate ``axis`` of the *last* dimension,
    broadcast over any leading batch axes: for x of shape [..., d] returns a
    [..., d] array of zeros with ones in component ``axis``.

    Built from an iota comparison rather than ``.at[].set()``: the scatter
    that a one-element update lowers to has no Mosaic (Pallas TPU) lowering,
    and this op must trace inside the generic fused training kernel."""
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    return jnp.where(lane == axis, jnp.ones_like(x), jnp.zeros_like(x))


def value_dt(f, x, t_axis=0):
    """(f(x), ∂f/∂t) for a time-only or space-time input; ``t_axis`` indexes
    the time coordinate within ``x``'s last dimension."""
    return dirderiv(f, x, coord_direction(x, t_axis))


def value_dx_dxx(f, x, x_axis=0):
    """(f(x), ∂f/∂x, ∂²f/∂x²) along spatial coordinate ``x_axis``."""
    return dirderiv2(f, x, coord_direction(x, x_axis))


def time_jacobian(f, t):
    """For systems y: R -> R^k (e.g. FitzHugh–Nagumo): one jvp along t gives
    the time derivative of *every* output component simultaneously, replacing
    the reference's per-component reverse taps (fitzhugh_nagumo.py:74-84).

    Returns (y, dy/dt), both shape [k]."""
    return jax.jvp(f, (t,), (jnp.ones_like(t),))


def hessian_diag(f, x):
    """Diagonal of the Hessian of a scalar-output f at x (shape [d]), via d
    second directional derivatives — general helper for higher-dim PDEs."""
    d = x.shape[-1]
    eye = jnp.eye(d, dtype=x.dtype)

    def one(v):
        return dirderiv2(f, x, v)[2]

    return jax.vmap(one)(eye)
