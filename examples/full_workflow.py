"""Complete worked example: train → validate → checkpoint → export → sweep.

Run:  python examples/full_workflow.py  [--platform cpu]

Walks the full framework surface on the heat equation in a couple of
minutes (CPU) / seconds of device time (TPU).
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

if "--platform" in sys.argv:
    jax.config.update("jax_platforms", sys.argv[sys.argv.index("--platform") + 1])

import jax.numpy as jnp
import numpy as np

from differential_equations_dnn_tpu import solve, export_solution, load_solution
from differential_equations_dnn_tpu.equations import Heat1D
from differential_equations_dnn_tpu.train import (
    TrainConfig, train, save_checkpoint, restore_checkpoint,
)
from differential_equations_dnn_tpu.sweep import random_search, SearchSpace, loguniform, randint


def main():
    out = Path("temp_results/example")
    out.mkdir(parents=True, exist_ok=True)

    # 1. One-call solve at a reduced budget (taylor taps = fast path).
    res = solve(Heat1D(taps="taylor"), iterations=3000, batch_size=64,
                lrate=1e-4, nodes=40)
    print(f"[solve]      MAE vs sin(x)e^-t: {res.mae:.5f} "
          f"({res.iters_per_sec:.0f} iters/s)")

    # 2. Resume-style training with explicit config + checkpoint.
    prob = Heat1D()
    cfg = TrainConfig(iterations=1000, batch_size=64, lrate=1e-3,
                      verbose=False, adaptive_oversample=4)
    tr = train(prob, jax.random.key(0), cfg)
    save_checkpoint(out / "ckpt", {"params": tr.params, "step": jnp.asarray(1000)})
    ck = restore_checkpoint(out / "ckpt")
    print(f"[checkpoint] restored step {int(ck['step'])}")

    # 3. Export the trained solution for serving; reload and query it.
    model = prob.default_model()
    blob_path = out / "heat.stablehlo"
    export_solution(model.apply, res.params, input_dim=2, path=blob_path)
    fn = load_solution(blob_path)
    q = jnp.asarray([[np.pi / 2, 0.0]], jnp.float32)  # u(π/2, 0) ≈ 1
    print(f"[serving]    artifact {blob_path.stat().st_size} bytes, "
          f"u(π/2, 0) = {float(fn(q)[0, 0]):.4f}")

    # 4. A small vmapped hyperparameter sweep (all trials in one program).
    space = SearchSpace({"lrate": loguniform(1e-4, 1e-2),
                         "batch_size": randint(16, 128)})
    sw = random_search(prob, jax.random.key(1), num_samples=8, space=space,
                       max_iters=500, max_batch_size=128)
    print(f"[sweep]      best config {sw.best_config} "
          f"(loss {sw.best_score:.2e})")


if __name__ == "__main__":
    main()
