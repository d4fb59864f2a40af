"""Model zoo unit tests: shapes, init statistics, and bit-level parity of the
forward math against independently-written torch/numpy references."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from differential_equations_dnn_tpu.models import MLP, DGM, Perceptron, ResNet
from differential_equations_dnn_tpu.models.dgm import dgm_cell
from differential_equations_dnn_tpu.core.init import (
    calculate_gain,
    xavier_uniform,
    kaiming_uniform,
)


# ---------- shapes ----------


@pytest.mark.parametrize("batch", [1, 7, 64])
def test_mlp_shapes(key, batch):
    model = MLP(input_dim=2, output_dim=1, hidden_size=128, num_layers=3,
                activation="tanh")
    params = model.init(key)
    x = jnp.ones((batch, 2))
    y = model.apply(params, x)
    assert y.shape == (batch, 1)


def test_mlp_zero_hidden_layers(key):
    model = MLP(input_dim=1, output_dim=1, hidden_size=32, num_layers=0)
    y = model.apply(model.init(key), jnp.ones((4, 1)))
    assert y.shape == (4, 1)


@pytest.mark.parametrize("bn", ["pre", "post"])
def test_mlp_batchnorm_shapes_and_state(key, bn):
    model = MLP(input_dim=2, output_dim=1, hidden_size=16, num_layers=2,
                batch_norm=bn)
    params = model.init(key)
    state = model.init_state()
    x = jax.random.normal(key, (32, 2))
    y, new_state = model.apply(params, x, state=state, train=True)
    assert y.shape == (32, 1)
    assert new_state["mean"].shape == (3, 16)
    # Running stats must move toward batch stats in train mode.
    assert not np.allclose(np.asarray(new_state["mean"]), 0.0)
    # Eval mode leaves state unchanged and uses the running stats.
    y_eval, state_eval = model.apply(params, x, state=new_state, train=False)
    assert y_eval.shape == (32, 1)
    np.testing.assert_allclose(np.asarray(state_eval["mean"]),
                               np.asarray(new_state["mean"]))


def test_dgm_shapes(key):
    model = DGM(input_dim=1, output_dim=2, hidden_size=128, num_layers=4)
    y = model.apply(model.init(key), jnp.ones((16, 1)))
    assert y.shape == (16, 2)


def test_perceptron_and_resnet_shapes(key):
    p = Perceptron()
    assert p.apply(p.init(key), jnp.ones((5, 1))).shape == (5, 1)
    r = ResNet(input_dim=2, output_dim=1, hidden_size=32)
    assert r.apply(r.init(key), jnp.ones((8, 2))).shape == (8, 1)


# ---------- init statistics ----------


def test_xavier_uniform_bounds(key):
    gain = calculate_gain("tanh")
    w = xavier_uniform(key, (100, 200), gain)
    bound = gain * np.sqrt(6.0 / 300.0)
    assert float(jnp.max(jnp.abs(w))) <= bound
    # Uniform on [-b, b] has std b/sqrt(3).
    assert abs(float(jnp.std(w)) - bound / np.sqrt(3)) < 0.05 * bound


def test_kaiming_uniform_bounds(key):
    w = kaiming_uniform(key, (64, 64), "relu")
    bound = np.sqrt(2.0) * np.sqrt(3.0 / 64.0)
    assert float(jnp.max(jnp.abs(w))) <= bound


def test_unknown_activation_falls_back_to_relu(key):
    model = MLP(input_dim=1, output_dim=1, hidden_size=8, activation="bogus")
    y = model.apply(model.init(key), -jnp.ones((4, 1)))
    assert y.shape == (4, 1)  # fell back rather than raising


# ---------- forward-math parity vs torch ----------


def test_mlp_forward_matches_torch(key):
    """Load OUR params into a freshly-written torch MLP of the reference's
    architecture (Linear stack + activation, neural_networks.py:230-245) and
    check outputs agree to float32 precision."""
    torch = pytest.importorskip("torch")

    model = MLP(input_dim=2, output_dim=1, hidden_size=32, num_layers=2,
                activation="tanh")
    params = model.init(key)
    x = np.random.default_rng(0).standard_normal((16, 2)).astype(np.float32)

    y_jax = np.asarray(model.apply(params, jnp.asarray(x)))

    with torch.no_grad():
        h = torch.tensor(x)
        h = torch.tanh(h @ torch.tensor(np.asarray(params["fc_in"]["w"]))
                       + torch.tensor(np.asarray(params["fc_in"]["b"])))
        for i in range(2):
            h = torch.tanh(h @ torch.tensor(np.asarray(params["hidden"]["w"][i]))
                           + torch.tensor(np.asarray(params["hidden"]["b"][i])))
        y_torch = (h @ torch.tensor(np.asarray(params["fc_out"]["w"]))
                   + torch.tensor(np.asarray(params["fc_out"]["b"]))).numpy()

    # XLA's tanh differs from libm at ~1e-7/call; 3 layers compound to ~1e-5.
    np.testing.assert_allclose(y_jax, y_torch, rtol=2e-4, atol=2e-4)


def test_dgm_cell_matches_reference_algebra(key):
    """Check the fused-gate dgm_cell against a direct numpy transcription of
    the published recurrence (dgm_net.py:63-68)."""
    H, D, B = 8, 2, 5
    rng = np.random.default_rng(1)
    layer = {
        "Wzgr": jnp.asarray(rng.standard_normal((H, 3 * H)).astype(np.float32)),
        "Uzgr": jnp.asarray(rng.standard_normal((D, 3 * H)).astype(np.float32)),
        "bzgr": jnp.asarray(rng.standard_normal(3 * H).astype(np.float32)),
        "Wh": jnp.asarray(rng.standard_normal((H, H)).astype(np.float32)),
        "Uh": jnp.asarray(rng.standard_normal((D, H)).astype(np.float32)),
        "bh": jnp.asarray(rng.standard_normal(H).astype(np.float32)),
    }
    x = rng.standard_normal((B, D)).astype(np.float32)
    s = rng.standard_normal((B, H)).astype(np.float32)

    out = np.asarray(dgm_cell(jnp.asarray(x), jnp.asarray(s), layer, jnp.tanh))

    Wz, Wg, Wr = (np.asarray(layer["Wzgr"])[:, i * H:(i + 1) * H] for i in range(3))
    Uz, Ug, Ur = (np.asarray(layer["Uzgr"])[:, i * H:(i + 1) * H] for i in range(3))
    bz, bg, br = (np.asarray(layer["bzgr"])[i * H:(i + 1) * H] for i in range(3))
    Z = np.tanh(s @ Wz + x @ Uz + bz)
    G = np.tanh(s @ Wg + x @ Ug + bg)
    R = np.tanh(s @ Wr + x @ Ur + br)
    Hh = np.tanh((s * R) @ np.asarray(layer["Wh"]) + x @ np.asarray(layer["Uh"])
                 + np.asarray(layer["bh"]))
    expected = (1 - G) * Hh + Z * s

    np.testing.assert_allclose(out, expected, rtol=2e-4, atol=2e-4)


def test_models_are_vmap_compatible(key):
    """Population sweeps vmap model.init and model.apply over a trial axis."""
    model = MLP(input_dim=2, output_dim=1, hidden_size=16, num_layers=2)
    keys = jax.random.split(key, 4)
    stacked = jax.vmap(model.init)(keys)
    x = jnp.ones((4, 8, 2))
    y = jax.vmap(model.apply)(stacked, x)
    assert y.shape == (4, 8, 1)
    # Distinct inits must give distinct outputs.
    assert not np.allclose(np.asarray(y[0]), np.asarray(y[1]))


def test_fourier_feature_mlp(key):
    """Fourier-embedded MLP: shapes, frozen B, twice-differentiable."""
    model = MLP(input_dim=1, output_dim=2, hidden_size=16, num_layers=2,
                activation="tanh", fourier_features=8, fourier_scale=0.5)
    params = model.init(key)
    assert params["fourier"]["b"].shape == (1, 8)
    assert params["fc_in"]["w"].shape == (16, 16)  # 2*8 embed dim
    x = jnp.linspace(0, 1, 5)[:, None]
    y = model.apply(params, x)
    assert y.shape == (5, 2)
    # The embedding matrix must receive zero gradient (frozen).
    g = jax.grad(lambda p: jnp.sum(model.apply(p, x) ** 2))(params)
    np.testing.assert_allclose(np.asarray(g["fourier"]["b"]), 0.0)
    # Second derivatives flow (needed for PDE residuals).
    from differential_equations_dnn_tpu.ops import value_dx_dxx

    _, _, d2 = value_dx_dxx(lambda z: model.apply(params, z), x, x_axis=0)
    assert np.isfinite(np.asarray(d2)).all()
