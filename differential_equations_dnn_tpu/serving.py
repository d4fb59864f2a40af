"""Serving: export a trained solution as a portable, AOT-compilable artifact.

The reference's only "deployment" story is saving solution grids to ``.npy``
(heat.py:220-225). Here a trained network itself is exportable:

* ``export_solution`` serialises the jitted ``apply(params, ·)`` closure with
  ``jax.export`` (StableHLO) — a self-contained artifact that any JAX runtime
  (TPU server, CPU edge box) can load WITHOUT this framework installed, with
  the trained weights baked in as constants;
* ``load_solution`` restores it to a callable.

Batch dimension is symbolic, so one artifact serves any query size.
"""

from pathlib import Path

import jax
import jax.numpy as jnp
from jax import export as jax_export


def export_solution(apply_fn, params, input_dim: int,
                    path: str | Path | None = None, dtype=jnp.float32):
    """Serialise ``x -> apply_fn(params, x)`` (params baked in) to bytes.

    Args:
      apply_fn: the model's apply function.
      params: trained parameter pytree (becomes constants in the artifact).
      input_dim: coordinate dimension d; callers pass [n, d] queries where
        n is symbolic (any batch size).
      path: optional file to write the serialised bytes to.

    Returns the serialised ``bytes``.
    """
    def solution(x):
        return apply_fn(params, x)

    n = jax_export.symbolic_shape("n")[0]
    spec = jax.ShapeDtypeStruct((n, input_dim), dtype)
    exported = jax_export.export(jax.jit(solution))(spec)
    blob = exported.serialize()
    if path is not None:
        Path(path).parent.mkdir(parents=True, exist_ok=True)
        Path(path).write_bytes(blob)
    return blob


def load_solution(source: bytes | str | Path):
    """Load an exported solution; returns ``fn(x: [n, d]) -> [n, out]``."""
    if not isinstance(source, bytes):
        source = Path(source).read_bytes()
    exported = jax_export.deserialize(source)
    return exported.call
