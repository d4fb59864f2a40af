"""Serving/export tests: trained solutions round-trip through jax.export."""

import numpy as np

import jax
import jax.numpy as jnp

from differential_equations_dnn_tpu.equations import SimpleODE
from differential_equations_dnn_tpu.serving import export_solution, load_solution
from differential_equations_dnn_tpu.train import TrainConfig, train


def test_export_roundtrip(key, tmp_path):
    prob = SimpleODE()
    model = prob.default_model()
    res = train(prob, key, TrainConfig(iterations=300, batch_size=32,
                                       lrate=1e-3, verbose=False))
    path = tmp_path / "simple_ode.stablehlo"
    blob = export_solution(model.apply, res.params, input_dim=1, path=path)
    assert path.read_bytes() == blob

    fn = load_solution(path)
    # Symbolic batch: artifact serves any query size.
    for n in (1, 7, 64):
        t = jnp.linspace(0.0, 1.0, n)[:, None]
        got = np.asarray(fn(t))
        want = np.asarray(model.apply(res.params, t))
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-7)
