"""Worker process for the multi-process jax.distributed test.

Each of two processes owns 4 virtual CPU devices; together they form one
8-device global mesh. The worker initialises the distributed runtime through
``parallel.initialize_distributed`` (the non-no-op branch), builds the global
mesh, checks a cross-process reduction, and runs one data-parallel training
step of the real trainer over the global mesh.

Run (by tests/test_distributed.py):
    python tests/distributed_worker.py <port> <process_id>
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

# The axon sitecustomize overrides JAX_PLATFORMS/XLA_FLAGS env vars; config
# updates are the only reliable way to force the CPU platform (conftest.py
# does the same for the in-process suite).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 4)


def main(port: str, process_id: int) -> None:
    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from differential_equations_dnn_tpu.parallel import (
        global_mesh,
        initialize_distributed,
    )

    assert initialize_distributed(
        coordinator_address=f"localhost:{port}",
        num_processes=2,
        process_id=process_id,
    ), "distributed init returned the no-op branch"
    assert jax.process_count() == 2
    assert jax.device_count() == 8

    mesh = global_mesh({"data": 8})

    # Cross-process reduction: each process contributes its local quarter of
    # a global [8] array; the jitted sum must see all of it.
    local = np.arange(process_id * 4, process_id * 4 + 4, dtype=np.float32)
    arr = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("data")), local)
    total = jax.jit(jnp.sum, out_shardings=NamedSharding(mesh, P()))(arr)
    assert float(total) == 28.0, float(total)

    # One real data-parallel training step over the global mesh: collocation
    # batch sharded across both processes' devices, params replicated,
    # gradient psum crossing the process boundary.
    from differential_equations_dnn_tpu.equations import Heat1D, SimpleODE
    from differential_equations_dnn_tpu.train import TrainConfig, train

    cfg = TrainConfig(iterations=1, batch_size=16, chunk_size=1,
                      verbose=False, snapshot_every=0)
    result = train(Heat1D(), jax.random.key(0), cfg, mesh=mesh)
    loss = float(result.loss_history[-1])
    assert np.isfinite(loss), loss
    print(f"DIST OK process={process_id} loss={loss:.6f}", flush=True)

    # Topology parity: a 5-step DP run over the 2-process global mesh must
    # match the single-process 8-device run of the SAME program (the test
    # re-runs this in-process and compares) — collocation draws are
    # key-derived, so the only topology-sensitive piece is the psum.
    cfg5 = TrainConfig(iterations=5, batch_size=16, chunk_size=5,
                      verbose=False, snapshot_every=0)
    r5 = train(Heat1D(), jax.random.key(1), cfg5, mesh=mesh)
    print(f"DIST DP5 process={process_id} "
          f"loss={float(r5.loss_history[-1])!r}", flush=True)

    # Cross-process population sweep: 8 trials vmapped + sharded over a
    # global 'pop' mesh spanning both processes — the Ray Tune role
    # (optimize_heat_ray.py:184-198) with zero driver/worker RPC.
    from differential_equations_dnn_tpu.sweep import random_search

    pop_mesh = global_mesh({"pop": 8})
    res = random_search(SimpleODE(), jax.random.key(2), num_samples=8,
                        max_iters=40, mesh=pop_mesh, seed=3, chunk_size=20)
    assert np.isfinite(res.best_score)
    print(f"DIST SWEEP process={process_id} "
          f"best={float(res.best_score)!r}", flush=True)


if __name__ == "__main__":
    main(sys.argv[1], int(sys.argv[2]))
