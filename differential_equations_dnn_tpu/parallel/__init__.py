"""Multi-chip parallelism over a jax.sharding.Mesh.

The reference's only parallelism is Ray Tune spawning ≤5 trial processes
(optimize_heat_ray.py:180-198; SURVEY §2.4). TPU-natively this domain has two
clean axes:

* ``data``  — shard the collocation/quadrature batch across chips; params are
  replicated and the gradient reduction is one ``psum`` over ICI.
* ``pop``   — population parallelism: vmapped hyperparameter/ensemble trials
  sharded across chips with ZERO cross-trial communication.

Both compose: a 2-D mesh ('pop', 'data') trains P trials, each data-parallel
over its data sub-axis.
"""

from differential_equations_dnn_tpu.parallel.mesh import (
    make_mesh,
    single_axis_mesh,
)
from differential_equations_dnn_tpu.parallel.sharding import (
    shard_batch,
    replicate,
)
from differential_equations_dnn_tpu.parallel.population import (
    PopulationConfig,
    train_population,
    take_trials,
)
from differential_equations_dnn_tpu.parallel.distributed import (
    initialize_distributed,
    global_mesh,
)

__all__ = [
    "make_mesh",
    "single_axis_mesh",
    "shard_batch",
    "replicate",
    "PopulationConfig",
    "train_population",
    "take_trials",
    "initialize_distributed",
    "global_mesh",
]
