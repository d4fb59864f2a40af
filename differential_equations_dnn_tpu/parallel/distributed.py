"""Multi-host (multi-slice / DCN) initialisation.

The reference has no distributed backend at all (SURVEY §2.4); its only
multi-process machinery is Ray Tune's driver↔worker RPC. The TPU-native
equivalent for scaling beyond one host is ``jax.distributed`` + a global
mesh: every host runs the same SPMD program, JAX wires the ICI/DCN
collectives. Population axes should map to DCN (no cross-trial traffic);
data axes to ICI (gradient psum rides the fast interconnect).
"""

import logging

import jax

logger = logging.getLogger(__name__)


def initialize_distributed(coordinator_address: str | None = None,
                           num_processes: int | None = None,
                           process_id: int | None = None):
    """Initialise multi-host JAX. No-op (with a log line) when running
    single-process — safe to call unconditionally at program start.

    On TPU pods the three arguments are auto-detected from the environment;
    pass them explicitly for CPU/GPU clusters."""
    if num_processes in (None, 1) and coordinator_address is None:
        logger.info("single-process run; jax.distributed not initialised")
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    logger.info("jax.distributed initialised: process %d/%d, %d local / %d global devices",
                jax.process_index(), jax.process_count(),
                jax.local_device_count(), jax.device_count())
    return True


def global_mesh(axes: dict[str, int] | None = None, data_axis: str = "data"):
    """A mesh over ALL processes' devices. Default: one data axis spanning
    every chip. For multi-slice topologies pass e.g.
    ``{"pop": n_slices, "data": chips_per_slice}`` so population traffic
    (none) maps to DCN and gradient psum stays on ICI within a slice."""
    from differential_equations_dnn_tpu.parallel.mesh import make_mesh

    axes = axes or {data_axis: jax.device_count()}
    return make_mesh(axes)
