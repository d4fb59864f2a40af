"""Pallas TPU kernels for the hot compute paths.

These implement the same fused computations as ``ops.taylor`` as explicit
VMEM-resident kernels: weights and all derivative streams live on-chip for
the whole layer stack, with one MXU matmul per layer. CPU tests run the same
kernels in interpreter mode.
"""

from differential_equations_dnn_tpu.kernels.taylor_mlp import (
    heat_fused_streams_pallas,
    mlp_forward_pallas,
)

__all__ = ["heat_fused_streams_pallas", "mlp_forward_pallas"]
