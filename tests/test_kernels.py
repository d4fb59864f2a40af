"""Pallas kernel tests (interpreter mode on CPU; same code compiles on TPU,
where the streams kernel measures ~1.9x the XLA-fused version at 4096 pts)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from differential_equations_dnn_tpu.equations import Heat1D
from differential_equations_dnn_tpu.models import MLP
from differential_equations_dnn_tpu.ops.taylor import heat_fused_streams, mlp_taps
from differential_equations_dnn_tpu.kernels import (
    heat_fused_streams_pallas,
    mlp_forward_pallas,
)
from differential_equations_dnn_tpu.ops import value_dx_dxx, value_dt

NAMES = ["u", "u_x", "u_xx", "u_t", "u0", "ub1", "ub2"]


@pytest.fixture
def setup(key):
    prob = Heat1D()
    model = prob.default_model()
    params = model.init(key)
    batch = prob.sample(key, 48)  # deliberately not a tile multiple
    return prob, model, params, batch


def test_taylor_streams_match_jvp_taps(setup):
    """The stacked Taylor propagation equals the generic jvp taps."""
    prob, model, params, batch = setup
    f = lambda z: model.apply(params, z)
    u, u_x, u_xx = value_dx_dxx(f, batch["xt"], x_axis=0)
    _, u_t = value_dt(f, batch["xt"], t_axis=1)
    s = heat_fused_streams(model, params, batch["xt"], batch["x0"],
                           batch["xb1"], batch["xb2"])
    np.testing.assert_allclose(np.asarray(s[0]), np.asarray(u), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(s[1]), np.asarray(u_x), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(s[2]), np.asarray(u_xx), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(s[3]), np.asarray(u_t), rtol=1e-5, atol=1e-6)


def test_pallas_streams_match_pure(setup):
    prob, model, params, batch = setup
    ref = heat_fused_streams(model, params, batch["xt"], batch["x0"],
                             batch["xb1"], batch["xb2"])
    ker = heat_fused_streams_pallas(model, params, batch["xt"], batch["x0"],
                                    batch["xb1"], batch["xb2"])
    for name, r, k in zip(NAMES, ref, ker):
        np.testing.assert_allclose(np.asarray(r), np.asarray(k),
                                   rtol=1e-5, atol=1e-5, err_msg=name)


def test_pallas_gradients_match(setup):
    prob, model, params, batch = setup
    pj = Heat1D(taps="jvp")
    pp = Heat1D(taps="pallas")
    gj = jax.grad(lambda p: pj.loss(model.apply, p, batch))(params)
    gp = jax.grad(lambda p: pp.loss(model.apply, p, batch))(params)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                rtol=1e-3, atol=1e-5),
        gj, gp,
    )


def test_mlp_forward_pallas_matches_apply(key):
    for act in ("tanh", "relu"):
        model = MLP(input_dim=2, output_dim=1, hidden_size=128, num_layers=3,
                    activation=act)
        params = model.init(key)
        x = jax.random.normal(key, (100, 2))  # pads to tile
        ref = model.apply(params, x)
        ker = mlp_forward_pallas(model, params, x, tile_b=64)
        np.testing.assert_allclose(np.asarray(ref), np.asarray(ker),
                                   rtol=1e-5, atol=1e-5, err_msg=act)


def test_mlp_taps_general(key):
    """mlp_taps with arbitrary directions matches jvp math."""
    model = MLP(input_dim=3, output_dim=2, hidden_size=16, num_layers=2,
                activation="sigmoid")
    params = model.init(key)
    x = jax.random.normal(key, (9, 3))
    v = jnp.asarray([1.0, 0.0, 0.0])
    w = jnp.asarray([0.0, 0.0, 1.0])
    u, du_v, d2u, du_w = mlp_taps(model, params, x, v, w)

    from differential_equations_dnn_tpu.ops import dirderiv2, dirderiv

    f = lambda z: model.apply(params, z)
    _, ref_dv, ref_d2 = dirderiv2(f, x, jnp.broadcast_to(v, x.shape))
    _, ref_dw = dirderiv(f, x, jnp.broadcast_to(w, x.shape))
    np.testing.assert_allclose(np.asarray(du_v), np.asarray(ref_dv), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(d2u), np.asarray(ref_d2), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(du_w), np.asarray(ref_dw), rtol=1e-5, atol=1e-6)


def test_training_with_taylor_and_pallas_taps(key):
    """Short heat training runs with all three tap modes land in the same
    place (same PRNG stream, same math)."""
    from differential_equations_dnn_tpu.train import TrainConfig, train

    results = {}
    for taps in ("jvp", "taylor", "pallas"):
        prob = Heat1D(taps=taps)
        cfg = TrainConfig(iterations=30, batch_size=16, verbose=False)
        results[taps] = train(prob, key, cfg).loss_history
    np.testing.assert_allclose(results["jvp"], results["taylor"], rtol=1e-3, atol=1e-6)
    np.testing.assert_allclose(results["jvp"], results["pallas"], rtol=1e-3, atol=1e-6)


def test_pallas_rejects_bn_models(key):
    model = MLP(input_dim=2, output_dim=1, hidden_size=8, batch_norm="pre")
    with pytest.raises(ValueError):
        mlp_forward_pallas(model, model.init(key), jnp.ones((4, 2)))


def test_mlp_streams_general_matches_jvp(key):
    """The generalized stacked streams (heat2d: 2 second-order + 1
    first-order direction + 5 constraints) match the jvp taps and their
    gradients."""
    from differential_equations_dnn_tpu.equations import Heat2D

    pj = Heat2D(taps="jvp")
    pt = Heat2D(taps="taylor")
    model = pj.default_model()
    params = model.init(key)
    batch = pj.sample(key, 24)
    lj = pj.point_loss(model.apply, params, batch)
    lt = pt.point_loss(model.apply, params, batch)
    np.testing.assert_allclose(np.asarray(lj), np.asarray(lt),
                               rtol=1e-4, atol=1e-6)
    gj = jax.grad(lambda p: pj.loss(model.apply, p, batch))(params)
    gt = jax.grad(lambda p: pt.loss(model.apply, p, batch))(params)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                rtol=1e-3, atol=1e-5),
        gj, gt,
    )
