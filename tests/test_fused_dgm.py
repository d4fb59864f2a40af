"""Fused DGM engine tests (interpret mode on CPU).

Mirrors test_fused_engine: (1) the hand-derived stream VJP must match
jax.grad of the SAME problem.loss at the same points; (2) the kernel must
match a pure-jnp twin loop exactly; (3) short end-to-end training must
converge; (4) resume is bit-identical."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from differential_equations_dnn_tpu.equations import PROBLEMS
from differential_equations_dnn_tpu.kernels import fused_dgm as fd
from differential_equations_dnn_tpu.kernels.fused_train import _adam_update
from differential_equations_dnn_tpu.models import DGM


def test_fn_step_math_matches_problem_loss_grad(key):
    B = 12
    prob = PROBLEMS["fitzhugh_nagumo"]()
    spec = fd.spec_for(prob)
    model = prob.default_model()
    params = model.init(key)
    flat = fd.pack_dgm(params)
    u = jax.random.uniform(jax.random.fold_in(key, 1), (B, spec.n_uniform))

    loss_e, grads_e = fd.dgm_step_math(spec, flat, u, B, model.num_layers)

    # Causal mode (the default): the spec builds stratified time-sorted
    # collocation t_i = (i + u_i)·Δt — mirror it so the equation's causal
    # loss sees the identical batch.
    if prob.causal_eps > 0.0:
        t = (jnp.arange(B, dtype=u.dtype)[:, None] + u[:, :1]) * (
            prob.t_max / B)
    else:
        t = prob.t_max * u[:, :1]
    batch = {"t": t, "t0": jnp.zeros((B, 1))}
    loss_r, grads_r = jax.value_and_grad(
        lambda p: prob.loss(model.apply, p, batch))(params)
    np.testing.assert_allclose(np.squeeze(loss_e), float(loss_r), rtol=1e-5)
    for ge, gr in zip(grads_e, fd.pack_dgm(grads_r)):
        np.testing.assert_allclose(np.asarray(ge), np.asarray(gr),
                                   rtol=5e-4, atol=1e-5)


def test_fredholm_step_math_matches_problem_loss_grad(key):
    B = 16
    prob = PROBLEMS["fredholm"](k=20, quadrature="gauss")
    spec = fd.spec_for(prob, batch_size=B)
    assert spec.n_groups == 3  # 16-row groups for 20 nodes -> 2 node groups
    model = prob.default_model()
    params = model.init(key)
    flat = fd.pack_dgm(params)
    u = jax.random.uniform(jax.random.fold_in(key, 1), (B, spec.n_uniform))
    const = fd._fredholm_const(prob, B, spec.n_groups)

    bound = fd.spec_with_build(spec, lambda uu: spec.build(uu, const=const))
    loss_e, grads_e = fd.dgm_step_math(bound, flat, u, B, model.num_layers)

    from differential_equations_dnn_tpu.ops import gauss_legendre_nodes

    nodes, weights = gauss_legendre_nodes(prob.k, 0.0, prob.upper)
    x = prob.upper * u[:, :1]
    batch = {"x": x,
             "tq": jnp.broadcast_to(nodes[None, :], (B, prob.k)),
             "wq": jnp.broadcast_to(weights[None, :], (B, prob.k))}
    loss_r, grads_r = jax.value_and_grad(
        lambda p: prob.loss(model.apply, p, batch))(params)
    np.testing.assert_allclose(np.squeeze(loss_e), float(loss_r), rtol=1e-5)
    for ge, gr in zip(grads_e, fd.pack_dgm(grads_r)):
        np.testing.assert_allclose(np.asarray(ge), np.asarray(gr),
                                   rtol=5e-4, atol=1e-5)


def _pure_twin(spec, model, flat, uniforms, lrate, const=None):
    m = tuple(jnp.zeros_like(p) for p in flat)
    v = tuple(jnp.zeros_like(p) for p in flat)
    losses = []
    if const is not None:
        base = spec
        spec = fd.spec_with_build(base, lambda u: base.build(u, const=const))
    for i in range(uniforms.shape[0]):
        loss, grads = fd.dgm_step_math(spec, flat, uniforms[i],
                                       uniforms.shape[1], model.num_layers)
        losses.append(float(np.squeeze(loss)))
        new = []
        for k in range(fd._N_TENSORS):
            p, mm, vv = _adam_update(flat[k], m[k], v[k], grads[k],
                                     lrate, float(i + 1))
            new.append((p, mm, vv))
        flat = tuple(n[0] for n in new)
        m = tuple(n[1] for n in new)
        v = tuple(n[2] for n in new)
    return flat, np.array(losses)


def test_kernel_matches_pure_loop(key):
    prob = PROBLEMS["fitzhugh_nagumo"]()
    model = DGM(input_dim=1, output_dim=2, hidden_size=16, num_layers=2,
                activation="tanh")
    spec = fd.spec_for(prob)
    flat = fd.pack_dgm(model.init(key))
    K, B = 6, 8
    uniforms = jax.random.uniform(jax.random.fold_in(key, 2),
                                  (K, B, spec.n_uniform))
    m = tuple(jnp.zeros_like(p) for p in flat)
    v = tuple(jnp.zeros_like(p) for p in flat)
    p_k, _, _, losses_k = fd.fused_dgm_chunk(
        spec, model, flat, m, v, uniforms, 0, lrate=1e-3, steps_per_cell=3)
    p_t, losses_t = _pure_twin(spec, model, flat, uniforms, 1e-3)
    np.testing.assert_allclose(losses_k, losses_t, rtol=1e-5)
    for a, b in zip(p_k, p_t):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_fredholm_kernel_matches_pure_loop(key):
    prob = PROBLEMS["fredholm"](k=10, quadrature="gauss")
    model = prob.default_model()
    B = 8
    spec = fd.spec_for(prob, batch_size=B)
    const = fd._fredholm_const(prob, B, spec.n_groups)
    flat = fd.pack_dgm(model.init(key))
    K = 4
    uniforms = jax.random.uniform(jax.random.fold_in(key, 2),
                                  (K, B, spec.n_uniform))
    m = tuple(jnp.zeros_like(p) for p in flat)
    v = tuple(jnp.zeros_like(p) for p in flat)
    p_k, _, _, losses_k = fd.fused_dgm_chunk(
        spec, model, flat, m, v, uniforms, 0, lrate=1e-3, const=const,
        steps_per_cell=2)
    p_t, losses_t = _pure_twin(spec, model, flat, uniforms, 1e-3, const=const)
    np.testing.assert_allclose(losses_k, losses_t, rtol=1e-5)
    for a, b in zip(p_k, p_t):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7)


def test_train_fn_converges(key):
    prob = PROBLEMS["fitzhugh_nagumo"]()
    model = DGM(input_dim=1, output_dim=2, hidden_size=16, num_layers=1,
                activation="tanh")
    r = fd.train_dgm_fused_result(prob, key, 200, batch_size=16, lrate=1e-3,
                                  model=model, chunk_size=200)
    assert r.loss_history.shape == (200,)
    assert r.loss_history[-50:].mean() < r.loss_history[:50].mean()
    assert np.isfinite(prob.mae(model.apply, r.params, nodes=10))


def test_train_fredholm_converges(key):
    prob = PROBLEMS["fredholm"](k=10, quadrature="gauss")
    model = prob.default_model()
    r = fd.train_dgm_fused_result(prob, key, 200, batch_size=16, lrate=1e-3,
                                  chunk_size=200)
    assert r.loss_history[-50:].mean() < r.loss_history[:50].mean()
    assert np.isfinite(prob.mae(model.apply, r.params, nodes=20))


def test_resume_is_bit_identical(key):
    prob = PROBLEMS["fitzhugh_nagumo"]()
    model = DGM(input_dim=1, output_dim=2, hidden_size=16, num_layers=1,
                activation="tanh")
    full = fd.train_dgm_fused_result(prob, key, 8, batch_size=8, model=model,
                                     chunk_size=8, steps_per_cell=2)
    first = fd.train_dgm_fused_result(prob, key, 4, batch_size=8, model=model,
                                      chunk_size=4, steps_per_cell=2,
                                      total_steps=8)
    second = fd.train_dgm_fused_result(prob, key, 4, batch_size=8,
                                       model=model, params=first.params,
                                       opt_state=first.opt_state,
                                       start_step=4, chunk_size=4,
                                       steps_per_cell=2, total_steps=8)
    for a, b in zip(jax.tree.leaves(full.params),
                    jax.tree.leaves(second.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("chunk", [10, 4])
def test_mixed_precision_schedule_matches_fp32_on_cpu(key, chunk):
    """In interpret mode fp32 DEFAULT == HIGHEST, so the mixed schedule's
    phase chaining must reproduce the plain run bit-for-bit — on BOTH the
    single-dispatch (chunk=10) and chunked-resume (chunk=4) paths."""
    prob = PROBLEMS["fitzhugh_nagumo"]()
    model = DGM(input_dim=1, output_dim=2, hidden_size=16, num_layers=1,
                activation="tanh")
    plain = fd.train_dgm_fused_result(prob, key, 10, batch_size=8,
                                      model=model, chunk_size=10,
                                      steps_per_cell=2)
    mixed = fd.train_dgm_fused_result(prob, key, 10, batch_size=8,
                                      model=model, chunk_size=chunk,
                                      steps_per_cell=2, precision="mixed")
    assert mixed.loss_history.shape == (10,)
    np.testing.assert_array_equal(mixed.loss_history, plain.loss_history)
    for a, b in zip(jax.tree.leaves(plain.params),
                    jax.tree.leaves(mixed.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_trial_evaluator_mixed_matches_fp32_on_cpu(key):
    """make_trial_evaluator's mixed path (one program, two chained phases)
    must reproduce the fp32 evaluator bit-for-bit in interpret mode."""
    prob = PROBLEMS["fitzhugh_nagumo"]()
    model = DGM(input_dim=1, output_dim=2, hidden_size=16, num_layers=1,
                activation="tanh")
    ev_hi = fd.make_trial_evaluator(prob, key, 10, batch_size=8,
                                    model=model, steps_per_cell=2)
    ev_mx = fd.make_trial_evaluator(prob, key, 10, batch_size=8,
                                    model=model, steps_per_cell=2,
                                    precision="mixed")
    lo_hi, p_hi = ev_hi(1)
    lo_mx, p_mx = ev_mx(1)
    np.testing.assert_array_equal(lo_hi, lo_mx)
    for a, b in zip(p_hi, p_mx):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_dgm_sweep_evaluator_matches_trial_evaluator(key):
    """The DGM {lrate, n_iters} sweep evaluator's step-gating-only runtime
    mode must reproduce the fixed-shape trial evaluator: a full-budget
    trial matches exactly, and a short trial equals a standalone run of
    its own budget (same stream prefix, same decay horizon)."""
    prob = PROBLEMS["fitzhugh_nagumo"]()
    model = DGM(input_dim=1, output_dim=2, hidden_size=16, num_layers=1,
                activation="tanh")
    ev = fd.make_sweep_evaluator(prob, key, max_iters=30, batch_size=8,
                                 model=model, schedule="cosine")
    losses, flat = ev(0, 1e-3, 30)
    assert losses.shape == (30,)
    ev_t = fd.make_trial_evaluator(prob, key, 30, batch_size=8,
                                   model=model, schedule="cosine")
    losses_ref, flat_ref = ev_t(0, 1e-3)
    np.testing.assert_allclose(losses, losses_ref, rtol=1e-6)
    for a, b in zip(flat, flat_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    # A 12-step trial sees the full cosine curve over ITS horizon (runtime
    # n_steps scalar), i.e. exactly a standalone 12-iteration cosine run.
    losses_s, flat_s = ev(0, 1e-3, 12)
    assert losses_s.shape == (12,)
    ev_12 = fd.make_trial_evaluator(prob, key, 12, batch_size=8,
                                    model=model, schedule="cosine")
    losses_12, flat_12 = ev_12(0, 1e-3)
    np.testing.assert_allclose(losses_s, losses_12, rtol=1e-6)
    for a, b in zip(flat_s, flat_12):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_dgm_ensemble_sharded_matches_single_device(key):
    """DGM replicas sharded over a 'pop' mesh via shard_map must produce
    bit-identical results to the sequential single-device path."""
    from differential_equations_dnn_tpu.parallel import make_mesh

    prob = PROBLEMS["fitzhugh_nagumo"]()
    model = DGM(input_dim=1, output_dim=2, hidden_size=16, num_layers=1,
                activation="tanh")
    p_seq, l_seq = fd.train_dgm_fused_ensemble(
        prob, key, 6, 4, mesh=None, batch_size=8, model=model,
        steps_per_cell=3)
    mesh = make_mesh({"pop": 2})
    p_sh, l_sh = fd.train_dgm_fused_ensemble(
        prob, key, 6, 4, mesh=mesh, batch_size=8, model=model,
        steps_per_cell=3)
    assert l_sh.shape == (4, 6)
    np.testing.assert_array_equal(l_sh, l_seq)
    for a, b in zip(jax.tree.leaves(p_sh), jax.tree.leaves(p_seq)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_unsupported_configurations_rejected(key):
    from differential_equations_dnn_tpu.equations import Fredholm2, Heat1D

    assert fd.spec_for(Heat1D()) is None
    assert fd.spec_for(Fredholm2(quadrature="montecarlo")) is None
    assert not fd.supports(Heat1D())
    with pytest.raises(ValueError):
        fd.train_dgm_fused_result(Heat1D(), key, 4, batch_size=4)


@pytest.mark.parametrize("rep_tile", [None, 2])
def test_dgm_packed_ensemble_matches_trial_evaluator(key, rep_tile):
    """The packed-replica DGM path (one dispatch, N replicas — VERDICT r3
    #3) must reproduce the sequential trial evaluator: same fold_in inits,
    shared collocation stream. Tight-allclose (different executables drift
    the last ulp); rep_tile=2 exercises the multi-group grid. Fredholm
    also exercises the const operand in the packed layout."""
    from differential_equations_dnn_tpu.equations import Fredholm2

    prob = Fredholm2(k=6, quadrature="gauss")
    model = DGM(input_dim=1, output_dim=1, hidden_size=16, num_layers=1,
                activation="relu")
    stacked, losses = fd.train_dgm_fused_ensemble_packed(
        prob, key, 12, 4, batch_size=8, model=model, steps_per_cell=3,
        lrate=1e-3, rep_tile=rep_tile)
    assert losses.shape == (4, 12)
    ev = fd.make_trial_evaluator(prob, key, 12, batch_size=8, model=model,
                                 steps_per_cell=3, lrate=1e-3)
    for r in range(4):
        l_seq, flat_seq = ev(r)
        np.testing.assert_allclose(losses[r], l_seq, rtol=1e-5, atol=1e-8)
        rep = jax.tree.map(lambda a: a[r], stacked)
        for a, b in zip(jax.tree.leaves(rep),
                        jax.tree.leaves(fd.unpack_dgm(flat_seq))):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-7)


def test_dgm_packed_ensemble_fn_causal(key):
    """FN's causal spec (stratified build + in-kernel causal weights) runs
    in the packed layout too; mixed precision matches fp32 bitwise in
    interpret mode (packed-vs-packed: same program structure)."""
    prob = PROBLEMS["fitzhugh_nagumo"](arch="dgm")
    assert prob.causal_eps > 0.0
    model = DGM(input_dim=1, output_dim=2, hidden_size=16, num_layers=1,
                activation="tanh")
    p_hi, l_hi = fd.train_dgm_fused_ensemble_packed(
        prob, key, 8, 2, batch_size=8, model=model, steps_per_cell=2)
    assert np.isfinite(l_hi).all()
    p_mx, l_mx = fd.train_dgm_fused_ensemble_packed(
        prob, key, 8, 2, batch_size=8, model=model, steps_per_cell=2,
        precision="mixed")
    np.testing.assert_array_equal(l_hi, l_mx)
    for a, b in zip(jax.tree.leaves(p_hi), jax.tree.leaves(p_mx)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
