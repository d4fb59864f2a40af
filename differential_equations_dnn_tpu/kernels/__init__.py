"""Pallas TPU kernels for the hot compute paths.

Two tiers:

* **Op kernels** (``taylor_mlp``): the fused forward+derivative-stream
  computation as explicit VMEM-resident kernels — same math as
  ``ops.taylor``, weights and all streams on-chip, one MXU matmul per
  layer.
* **Training engines** (``fused_train`` — specialised heat;
  ``fused_engine`` — declarative stream specs for every tanh-MLP equation;
  ``fused_dgm`` — DGM gate recurrence with a hand-derived VJP): the ENTIRE
  Adam loop inside one Mosaic program, reachable via
  ``solve(equation, engine="fused")``.

CPU tests run the same kernels in interpreter mode.
"""

from differential_equations_dnn_tpu.kernels.taylor_mlp import (
    heat_fused_streams_pallas,
    mlp_forward_pallas,
)

__all__ = [
    "heat_fused_streams_pallas",
    "mlp_forward_pallas",
    "fused_train",
    "fused_engine",
    "fused_dgm",
]
