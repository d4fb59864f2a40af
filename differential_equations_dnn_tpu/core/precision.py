"""Matmul precision policy and the single dense primitive used by all models.

TPU MXUs default to bfloat16 multiplication for float32 operands. The nets in
this domain are tiny (hidden ≤ 128) and the physics residuals take *second*
derivatives through them, so matmul rounding shows up directly in the PDE
residual. We therefore pin HIGHEST precision (fp32 accumulate, 3-pass bf16)
on the compute path by default; it costs nothing at these sizes. Large-batch
population sweeps can opt into lower precision via the ``precision`` argument.
"""

import jax.numpy as jnp
from jax import lax

DOT_PRECISION = lax.Precision.HIGHEST


def dense(x, w, b=None, precision=DOT_PRECISION):
    """y = x @ w (+ b). The one matmul used by every model in the zoo —
    keeping it centralised lets the Pallas kernels and precision policy swap
    in uniformly."""
    y = jnp.dot(x, w, precision=precision)
    if b is not None:
        y = y + b
    return y
