"""Generic fused-engine tests (interpret mode on CPU).

Three-way verification, mirroring test_fused_train: (1) the spec-driven
step math (hand stream algebra + value_and_grad cotangent) must match
jax.grad of the SAME problem.loss at the same points, for every registered
spec; (2) the kernel must match a pure-jnp twin loop exactly; (3) short
end-to-end training must converge."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from differential_equations_dnn_tpu.equations import PROBLEMS
from differential_equations_dnn_tpu.kernels import fused_engine as fe
from differential_equations_dnn_tpu.kernels.fused_train import (
    _adam_update,
    pack_params,
)
from differential_equations_dnn_tpu.models import MLP


def _batch_from_uniforms(prob, u, B):
    """The batch dict that the spec's build() implies, so problem.loss can
    be evaluated at the SAME collocation points."""
    name = prob.name
    z = jnp.zeros((B, 1))
    if name == "simple_ode":
        return {"t": prob.sample_scale * prob.t_max * u[:, :1], "t0": z}
    if name == "uat":
        # The spec's iota grid: a B-point linspace over [low, high].
        x = jnp.linspace(prob.low, prob.high, B)[:, None]
        return {"x": x, "y": jnp.sin(prob.freq * x)}
    if name == "inverse_heat":
        # Same observation minibatch as the spec's one-hot selection
        # (floor(u3·n_obs)), so problem.loss sees identical points.
        obs_x, obs_u = prob.observations()
        idx = jnp.floor(u[:, 2] * prob.n_obs).astype(jnp.int32)
        x = prob.x_max * u[:, :1]
        t = prob.t_max * u[:, 1:2]
        return {"xt": jnp.concatenate([x, t], 1),
                "obs_x": obs_x[idx], "obs_u": obs_u[idx]}
    if name == "volterra":
        from differential_equations_dnn_tpu.ops import gauss_legendre_nodes

        x = prob.upper * u[:, :1]
        gu, gw = gauss_legendre_nodes(prob.k, -1.0, 1.0)
        return {"x": x, "tq": x * (gu[None, :] + 1.0) * 0.5,
                "wq": x * gw[None, :] * 0.5}
    xm = jnp.full((B, 1), prob.x_max)
    if name == "advection":
        x = prob.x_max * u[:, :1]
        t = prob.t_max * u[:, 1:2]
        return {"xt": jnp.concatenate([x, t], 1),
                "x0": jnp.concatenate([x, z], 1),
                "xb": jnp.concatenate([z, t], 1)}
    if name in ("heat", "burgers", "wave"):
        x = prob.x_max * u[:, :1]
        t = prob.t_max * u[:, 1:2]
        xt = jnp.concatenate([x, t], 1)
        x0 = jnp.concatenate([x, z], 1)
        b0 = jnp.concatenate([z, t], 1)
        b1 = jnp.concatenate([xm, t], 1)
        if name == "burgers":
            return {"xt": xt, "x0t": x0, "b0": b0, "b1": b1}
        return {"xt": xt, "x0": x0, "xb1": b0, "xb2": b1}
    if name == "poisson":
        x, y, e = (prob.x_max * u[:, i:i + 1] for i in range(3))
        return {"xy": jnp.concatenate([x, y], 1),
                "b_x0": jnp.concatenate([z, e], 1),
                "b_x1": jnp.concatenate([xm, e], 1),
                "b_y0": jnp.concatenate([e, z], 1),
                "b_y1": jnp.concatenate([e, xm], 1)}
    if name == "heat2d":
        x = prob.x_max * u[:, :1]
        y = prob.x_max * u[:, 1:2]
        t = prob.t_max * u[:, 2:3]
        e = prob.x_max * u[:, 3:4]
        return {"xt": jnp.concatenate([x, y, t], 1),
                "x0": jnp.concatenate([x, y, z], 1),
                "b_x0": jnp.concatenate([z, e, t], 1),
                "b_x1": jnp.concatenate([xm, e, t], 1),
                "b_y0": jnp.concatenate([e, z, t], 1),
                "b_y1": jnp.concatenate([e, xm, t], 1)}
    raise AssertionError(name)


@pytest.mark.parametrize("name", sorted(fe.SPECS))
def test_step_math_matches_problem_loss_grad(name, key):
    B = 12
    prob = PROBLEMS[name](taps="jvp") if name in ("heat", "heat2d") \
        else PROBLEMS[name]()
    spec = fe.spec_for(prob)
    model = prob.default_model()
    params = model.init(key)
    pack = fe._pack_fn(spec, model)  # spec-aware (Perceptron, net+κ wrapper)
    flat = pack(params)
    u = jax.random.uniform(jax.random.fold_in(key, 1), (B, spec.n_uniform))

    loss_e, grads_e = fe.engine_step_math(spec, flat, u, B,
                                          fe._engine_dims(model)[2])

    batch = _batch_from_uniforms(prob, u, B)
    loss_r, grads_r = jax.value_and_grad(
        lambda p: prob.loss(model.apply, p, batch))(params)
    np.testing.assert_allclose(np.squeeze(loss_e), float(loss_r), rtol=1e-5)
    assert len(grads_e) == len(flat)  # extras (log κ̂) get gradients too
    for ge, gr in zip(grads_e, pack(grads_r)):
        np.testing.assert_allclose(np.asarray(ge), np.asarray(gr),
                                   rtol=1e-4, atol=1e-6)


def _pure_twin(spec, model, flat, uniforms, lrate, schedule="constant",
               total=1, decay=0.1):
    """Host-side replica of the kernel's loop."""
    import math as _math

    m = tuple(jnp.zeros_like(p) for p in flat)
    v = tuple(jnp.zeros_like(p) for p in flat)
    losses = []
    for i in range(uniforms.shape[0]):
        loss, grads = fe.engine_step_math(spec, flat, uniforms[i],
                                          uniforms.shape[1], model.num_layers)
        losses.append(float(np.squeeze(loss)))
        t = float(i + 1)
        if schedule == "cosine":
            frac = min((t - 1.0) / total, 1.0)
            lr_t = lrate * (decay + (1 - decay) * 0.5
                            * (1 + _math.cos(_math.pi * frac)))
        else:
            lr_t = lrate
        new = []
        for k in range(6):
            p, mm, vv = _adam_update(flat[k], m[k], v[k], grads[k], lr_t, t)
            new.append((p, mm, vv))
        flat = tuple(n[0] for n in new)
        m = tuple(n[1] for n in new)
        v = tuple(n[2] for n in new)
    return flat, np.array(losses)


@pytest.mark.parametrize("schedule", ["constant", "cosine"])
def test_kernel_matches_pure_loop(key, schedule):
    prob = PROBLEMS["wave"]()
    model = MLP(input_dim=2, output_dim=1, hidden_size=16, num_layers=1,
                activation="tanh")
    spec = fe.spec_for(prob)
    params = model.init(key)
    flat = pack_params(model, params)
    K, B = 6, 8
    uniforms = jax.random.uniform(jax.random.fold_in(key, 2),
                                  (K, B, spec.n_uniform))
    m = tuple(jnp.zeros_like(p) for p in flat)
    v = tuple(jnp.zeros_like(p) for p in flat)
    p_k, _, _, losses_k = fe.fused_engine_chunk(
        spec, model, flat, m, v, uniforms, 0, lrate=1e-3, steps_per_cell=3,
        schedule=schedule, total_steps=K)
    p_t, losses_t = _pure_twin(spec, model, flat, uniforms, 1e-3,
                               schedule=schedule, total=K)
    np.testing.assert_allclose(losses_k, losses_t, rtol=1e-5)
    for a, b in zip(p_k, p_t):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7)


def test_train_fused_engine_converges(key):
    prob = PROBLEMS["simple_ode"]()
    model = prob.default_model()
    r = fe.train_fused_result(prob, key, 300, batch_size=16, lrate=1e-3,
                              chunk_size=300)
    assert r.loss_history.shape == (300,)
    assert r.loss_history[-50:].mean() < r.loss_history[:50].mean()
    assert np.isfinite(prob.mae(model.apply, r.params, nodes=10))


def test_resume_is_bit_identical(key):
    prob = PROBLEMS["poisson"]()
    model = MLP(input_dim=2, output_dim=1, hidden_size=16, num_layers=1,
                activation="tanh")
    full = fe.train_fused_result(prob, key, 8, batch_size=8, model=model,
                                 chunk_size=8, steps_per_cell=2)
    # The interrupted first leg must declare the FULL planned horizon so the
    # cosine decay matches the uninterrupted run.
    first = fe.train_fused_result(prob, key, 4, batch_size=8, model=model,
                                  chunk_size=4, steps_per_cell=2,
                                  total_steps=8)
    second = fe.train_fused_result(prob, key, 4, batch_size=8, model=model,
                                   params=first.params,
                                   opt_state=first.opt_state, start_step=4,
                                   chunk_size=4, steps_per_cell=2)
    for a, b in zip(jax.tree.leaves(full.params),
                    jax.tree.leaves(second.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_volterra_const_layouts_agree(key):
    """VolterraSpec's two const layouts — the host-precomputed selection
    matrix (small tiles) and the coefficient row rebuilt from iotas
    in-kernel (large sweep tiles) — must produce identical loss/grads."""
    prob = PROBLEMS["volterra"]()
    spec = fe.spec_for(prob)
    model = prob.default_model()
    flat = fe._pack_fn(spec, model)(model.init(key))
    B = 12
    u = jax.random.uniform(jax.random.fold_in(key, 1), (B, spec.n_uniform))
    cP = spec.make_const(B)
    assert cP.shape[0] == B  # small tile: full matrix layout
    old = fe.VolterraSpec.P_MAX_ELEMS
    try:
        fe.VolterraSpec.P_MAX_ELEMS = 0
        cC = spec.make_const(B)
    finally:
        fe.VolterraSpec.P_MAX_ELEMS = old
    assert cC.shape[0] == 1  # forced fallback: coefficient row
    lP, gP = fe.engine_step_math(spec, flat, u, B, model.num_layers,
                                 const=cP)
    lC, gC = fe.engine_step_math(spec, flat, u, B, model.num_layers,
                                 const=cC)
    np.testing.assert_allclose(np.squeeze(lP), np.squeeze(lC), rtol=1e-6)
    for a, b in zip(gP, gC):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-8)


def test_uat_fused_solve_converges(key):
    """solve('uat', engine='fused'): the Perceptron trains via the L=0
    engine layout (zeroed hidden tensors stay zero under Adam)."""
    from differential_equations_dnn_tpu import solve

    r = solve("uat", engine="fused", iterations=600, lrate=1e-2,
              ensemble=0, finetune=0)
    assert r.loss_history.shape == (600,)
    assert r.loss_history[-50:].mean() < r.loss_history[:50].mean()
    assert np.isfinite(r.mae)
    # The hidden tensors the Perceptron layout zero-pads must stay exactly
    # zero (their grads are structurally zero).
    prob = PROBLEMS["uat"]()
    spec = fe.spec_for(prob)
    flat = fe._pack_fn(spec, prob.default_model())(r.params)
    np.testing.assert_array_equal(np.asarray(flat[2]), 0.0)


def test_inverse_heat_fused_trains_kappa(key):
    """The learnable log κ̂ extra tensor gets real gradients in-kernel: a
    short fused run moves κ̂ from the wrong init toward the true value."""
    prob = PROBLEMS["inverse_heat"]()
    r = fe.train_fused_result(prob, key, 400, batch_size=32, lrate=1e-2,
                              chunk_size=400)
    assert r.loss_history[-50:].mean() < r.loss_history[:50].mean()
    err0 = abs(prob.kappa_init - prob.kappa_true)
    assert prob.kappa_error(r.params) < 0.7 * err0
    # log_kappa round-trips through pack/unpack as a scalar leaf.
    assert np.shape(np.asarray(r.params["log_kappa"])) == ()


def test_inverse_heat_fused_resume_bit_identical(key):
    """Extras (log κ̂ + its Adam moments) must ride the resume path."""
    prob = PROBLEMS["inverse_heat"]()
    full = fe.train_fused_result(prob, key, 8, batch_size=8, chunk_size=8,
                                 steps_per_cell=2)
    first = fe.train_fused_result(prob, key, 4, batch_size=8, chunk_size=4,
                                  steps_per_cell=2, total_steps=8)
    second = fe.train_fused_result(prob, key, 4, batch_size=8,
                                   params=first.params,
                                   opt_state=first.opt_state, start_step=4,
                                   chunk_size=4, steps_per_cell=2)
    for a, b in zip(jax.tree.leaves(full.params),
                    jax.tree.leaves(second.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("chunk", [20, 8])
def test_mixed_precision_schedule_matches_fp32_on_cpu(key, chunk):
    """In interpret mode fp32 DEFAULT == HIGHEST, so the mixed schedule must
    reproduce the plain run bit-for-bit — this pins the phase chaining
    (single-dispatch at chunk=20, chunked resume path at chunk=8)."""
    prob = PROBLEMS["wave"]()
    model = MLP(input_dim=2, output_dim=1, hidden_size=16, num_layers=1,
                activation="tanh")
    plain = fe.train_fused_result(prob, key, 20, batch_size=8, model=model,
                                  chunk_size=20, steps_per_cell=2)
    mixed = fe.train_fused_result(prob, key, 20, batch_size=8, model=model,
                                  chunk_size=chunk, steps_per_cell=2,
                                  precision="mixed")
    assert mixed.loss_history.shape == (20,)
    np.testing.assert_array_equal(mixed.loss_history, plain.loss_history)
    for a, b in zip(jax.tree.leaves(plain.params),
                    jax.tree.leaves(mixed.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_lr_sweep_one_compile_many_lrates(key):
    """The base lr is a runtime SMEM scalar: an AOT-compiled kernel serves
    every trial (different lrates through the SAME executable must change
    the trajectory)."""
    prob = PROBLEMS["simple_ode"]()
    model = MLP(input_dim=1, output_dim=1, hidden_size=16, num_layers=1,
                activation="tanh")
    finals, stacked = fe.lr_sweep(prob, key, [1e-4, 1e-2], 12,
                                  batch_size=8, model=model,
                                  steps_per_cell=3)
    assert finals.shape == (2,)
    assert finals[0] != finals[1]
    assert jax.tree.leaves(stacked)[0].shape[0] == 2


def test_fused_ensemble_sharded_matches_single_device(key):
    """N replicas × whole-training-loop-in-one-kernel, sharded over a 'pop'
    mesh via shard_map, must produce bit-identical results to the
    sequential single-device path (same inits, shared collocation
    stream)."""
    from differential_equations_dnn_tpu.parallel import make_mesh

    prob = PROBLEMS["wave"]()
    model = MLP(input_dim=2, output_dim=1, hidden_size=16, num_layers=1,
                activation="tanh")
    params_seq, losses_seq = fe.train_fused_ensemble(
        prob, key, 6, 4, mesh=None, batch_size=8, model=model,
        steps_per_cell=3)
    mesh = make_mesh({"pop": 2})
    params_sh, losses_sh = fe.train_fused_ensemble(
        prob, key, 6, 4, mesh=mesh, batch_size=8, model=model,
        steps_per_cell=3)
    assert losses_sh.shape == (4, 6)
    np.testing.assert_array_equal(losses_sh, losses_seq)
    for a, b in zip(jax.tree.leaves(params_sh), jax.tree.leaves(params_seq)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_ensemble_and_evaluator_mixed_match_fp32_on_cpu(key):
    """precision='mixed' on the ensemble/evaluator paths (one program, two
    chained phases) must reproduce fp32 bit-for-bit in interpret mode."""
    prob = PROBLEMS["wave"]()
    model = MLP(input_dim=2, output_dim=1, hidden_size=16, num_layers=1,
                activation="tanh")
    p_hi, l_hi = fe.train_fused_ensemble(prob, key, 8, 2, batch_size=8,
                                         model=model, steps_per_cell=2)
    p_mx, l_mx = fe.train_fused_ensemble(prob, key, 8, 2, batch_size=8,
                                         model=model, steps_per_cell=2,
                                         precision="mixed")
    np.testing.assert_array_equal(l_hi, l_mx)
    for a, b in zip(jax.tree.leaves(p_hi), jax.tree.leaves(p_mx)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    ev = fe.make_lr_evaluator(prob, key, 8, batch_size=8, model=model,
                              steps_per_cell=2, precision="mixed")
    losses, _ = ev(0, 1e-3)
    assert losses.shape == (8,)


def test_unsupported_configurations_rejected(key):
    from differential_equations_dnn_tpu.equations import Fredholm2, Heat1D

    assert fe.spec_for(Fredholm2()) is None
    assert not fe.supports(Fredholm2())
    # DGM model on a spec'd equation: supported flag must be False.
    from differential_equations_dnn_tpu.models import DGM

    assert not fe.supports(Heat1D(), DGM(input_dim=2, output_dim=1,
                                         hidden_size=8, num_layers=1))
    with pytest.raises(ValueError):
        fe.train_fused_result(Fredholm2(), key, 4, batch_size=4)


def test_advection_causal_spec_matches_scan_loss(key):
    """AdvectionSpec's in-kernel causal weighting (stratified t from the
    uniform draw, comparison-mask cumsum with stop-grad weights) must
    reproduce equations.advection.loss's gradient exactly on the same
    collocation points."""
    from differential_equations_dnn_tpu.equations import Advection1D

    B = 16
    prob = Advection1D(causal_eps=10.0)
    spec = fe.spec_for(prob)
    model = prob.default_model()
    params = model.init(key)
    flat = pack_params(model, params)
    u = jax.random.uniform(jax.random.fold_in(key, 1), (B, 2))
    loss_e, grads_e = fe.engine_step_math(spec, flat, u, B, model.num_layers)

    x = prob.x_max * u[:, :1]
    # Mirror the spec's stride-permuted stratified layout (the causal loss
    # is permutation-invariant, so the scan loss sees the same points).
    m = fe._coprime_stride(B)
    idx = (jnp.arange(B)[:, None] * m) % B
    t = (idx.astype(u.dtype) + u[:, 1:2]) * (prob.t_max / B)
    z = jnp.zeros((B, 1))
    batch = {"xt": jnp.concatenate([x, t], 1),
             "x0": jnp.concatenate([x, z], 1),
             "xb": jnp.concatenate([z, t], 1)}
    loss_r, grads_r = jax.value_and_grad(
        lambda p: prob.loss(model.apply, p, batch))(params)
    np.testing.assert_allclose(np.squeeze(loss_e), float(loss_r), rtol=1e-5)
    for ge, gr in zip(grads_e, pack_params(model, grads_r)):
        np.testing.assert_allclose(np.asarray(ge), np.asarray(gr),
                                   rtol=1e-4, atol=1e-6)


def test_advection_causal_stride_prefix_covers_domain():
    """The causal spec's stride-permuted strata must cover [0, t_max]
    near-uniformly at ANY prefix length — the sweep evaluators mask
    trials to a row prefix, and a time-ascending layout would train a
    batch-64-of-512 trial only on the earliest 1/8 of the domain."""
    n, bs = 512, 64
    m = fe._coprime_stride(n)
    strata = (np.arange(bs) * m) % n
    assert strata.max() > 0.9 * n
    assert strata.min() < 0.1 * n
    # Quartile occupancy: every quarter of the domain is represented.
    hist, _ = np.histogram(strata, bins=4, range=(0, n))
    assert (hist > 0).all()


def test_advection_causal_fused_training_interpret(key):
    """The causal advection spec trains end-to-end inside the fused kernel
    (interpret mode): loss decreases and the kernel matches the pure twin
    loop bit-close — exercises the stride-permutation + comparison-mask
    ops through the full Pallas body."""
    from differential_equations_dnn_tpu.equations import Advection1D

    prob = Advection1D(causal_eps=5.0)
    model = MLP(input_dim=2, output_dim=1, hidden_size=16, num_layers=1,
                activation="tanh")
    spec = fe.spec_for(prob)
    params = model.init(key)
    flat = pack_params(model, params)
    K, B = 6, 8
    uniforms = jax.random.uniform(jax.random.fold_in(key, 2),
                                  (K, B, spec.n_uniform))
    m = tuple(jnp.zeros_like(p) for p in flat)
    v = tuple(jnp.zeros_like(p) for p in flat)
    p_k, _, _, losses_k = fe.fused_engine_chunk(
        spec, model, flat, m, v, uniforms, 0, lrate=1e-3, steps_per_cell=3)
    p_t, losses_t = _pure_twin(spec, model, flat, uniforms, 1e-3)
    np.testing.assert_allclose(losses_k, losses_t, rtol=1e-5)
    for a, b in zip(p_k, p_t):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7)
    r = fe.train_fused_result(prob, key, 200, batch_size=16, model=model,
                              chunk_size=200)
    assert r.loss_history[-40:].mean() < r.loss_history[:40].mean()
    assert np.isfinite(prob.mae(model.apply, r.params, nodes=8))


@pytest.mark.parametrize("rep_tile", [None, 2])
def test_packed_ensemble_matches_sequential_evaluator(key, rep_tile):
    """The packed-replica kernel (one dispatch, N replicas — VERDICT r3 #3)
    must reproduce the sequential trial evaluator it replaces: same
    fold_in(init_key, r) inits (verified bit-identical), same shared
    collocation stream, same per-replica math. The comparison is
    tight-allclose, not bitwise: packed and sequential are DIFFERENT
    compiled programs, and XLA's scheduling legitimately drifts the last
    ulp after a few steps (observed ~1e-7 rel at step 8; packed-vs-packed
    paths below stay bit-exact). rep_tile=2 exercises the multi-group
    grid (replica-group dim > 1)."""
    prob = PROBLEMS["wave"]()
    model = MLP(input_dim=2, output_dim=1, hidden_size=16, num_layers=1,
                activation="tanh")
    stacked, losses = fe.train_fused_ensemble_packed(
        prob, key, 12, 4, batch_size=8, model=model, steps_per_cell=3,
        lrate=1e-3, rep_tile=rep_tile)
    assert losses.shape == (4, 12)
    ev = fe.make_lr_evaluator(prob, key, 12, batch_size=8, model=model,
                              steps_per_cell=3)
    for r in range(4):
        l_seq, flat_seq = ev(r, 1e-3)
        np.testing.assert_allclose(losses[r], l_seq, rtol=1e-5, atol=1e-8)
        rep = jax.tree.map(lambda a: a[r], stacked)
        for a, b in zip(jax.tree.leaves(rep),
                        jax.tree.leaves(fe.unpack_params(model, flat_seq))):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-7)


def test_packed_ensemble_mixed_matches_fp32_on_cpu(key):
    """precision='mixed' on the packed path (two chained phases in ONE
    program) reproduces fp32 bit-for-bit in interpret mode."""
    prob = PROBLEMS["wave"]()
    model = MLP(input_dim=2, output_dim=1, hidden_size=16, num_layers=1,
                activation="tanh")
    p_hi, l_hi = fe.train_fused_ensemble_packed(
        prob, key, 8, 2, batch_size=8, model=model, steps_per_cell=2)
    p_mx, l_mx = fe.train_fused_ensemble_packed(
        prob, key, 8, 2, batch_size=8, model=model, steps_per_cell=2,
        precision="mixed")
    np.testing.assert_array_equal(l_hi, l_mx)
    for a, b in zip(jax.tree.leaves(p_hi), jax.tree.leaves(p_mx)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_packed_ensemble_chunked_matches_single_dispatch(key):
    """Chunked packed training (two 6-step dispatches) must equal one
    12-step dispatch: absolute-step-keyed draws + carried state."""
    prob = PROBLEMS["simple_ode"]()
    model = MLP(input_dim=1, output_dim=1, hidden_size=16, num_layers=1,
                activation="tanh")
    one, l_one = fe.train_fused_ensemble_packed(
        prob, key, 12, 2, batch_size=8, model=model, steps_per_cell=3)
    two, l_two = fe.train_fused_ensemble_packed(
        prob, key, 12, 2, batch_size=8, model=model, steps_per_cell=3,
        chunk_size=6)
    np.testing.assert_array_equal(l_one, l_two)
    for a, b in zip(jax.tree.leaves(one), jax.tree.leaves(two)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
