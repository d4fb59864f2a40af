"""AOT executable cache (kernels.aot_cache).

On the CPU test platform the cache is disabled by default (JAX's own
persistent cache covers tests); these tests force-enable it into a tmp
directory to exercise the disk round-trip, stale-artifact fallback, and
the prologue helper.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from differential_equations_dnn_tpu.kernels import aot_cache


@pytest.fixture
def forced_cache(tmp_path, monkeypatch):
    monkeypatch.setenv("DEQ_AOT_CACHE", str(tmp_path))
    monkeypatch.setattr(aot_cache, "enabled", lambda: True)
    return tmp_path


def test_disabled_on_cpu_by_default():
    assert not aot_cache.enabled()


def test_roundtrip_and_hit(forced_cache, key):
    @jax.jit
    def f(x):
        return jnp.tanh(x) * 2.0

    x = jnp.arange(8.0)
    before = dict(aot_cache.stats())
    c1 = aot_cache.cached_compile(f, x, label="t")
    y1 = np.asarray(c1(x))
    files = list(forced_cache.glob("t-*.pkl"))
    if not files:
        # This backend's PJRT client cannot serialize executables — the
        # fallback path must still have produced a working compile.
        assert aot_cache.stats()["fallbacks"] > before.get("fallbacks", 0)
        return
    aot_cache._memo.clear()  # force the DISK path (memo would short-circuit)
    c2 = aot_cache.cached_compile(f, x, label="t")
    y2 = np.asarray(c2(x))
    np.testing.assert_array_equal(y1, y2)
    assert aot_cache.stats()["hits"] > before.get("hits", 0)
    # And the memo: a third identical compile returns the same object.
    c3 = aot_cache.cached_compile(f, x, label="t")
    assert c3 is c2
    assert aot_cache.stats()["memo_hits"] > before.get("memo_hits", 0)


def test_stale_artifact_falls_back(forced_cache):
    @jax.jit
    def f(x):
        return x + 1.0

    x = jnp.ones((4,))
    aot_cache.cached_compile(f, x, label="s")
    for p in forced_cache.glob("s-*.pkl"):
        p.write_bytes(b"corrupt")
    aot_cache._memo.clear()  # force the disk read of the corrupt artifact
    c = aot_cache.cached_compile(f, x, label="s")  # must not raise
    np.testing.assert_array_equal(np.asarray(c(x)), np.full((4,), 2.0))


def test_cached_call_invokes(forced_cache):
    import functools

    @functools.partial(jax.jit, static_argnames=("n",))
    def f(x, n):
        return x * n

    x = jnp.ones((4,))
    y = aot_cache.cached_call(f, x, label="c", n=3)
    np.testing.assert_array_equal(np.asarray(y), np.full((4,), 3.0))


def test_fused_prologue_matches_eager(key):
    """The one-program prologue must reproduce the eager split+init+zeros
    sequence bit-for-bit (resume compatibility)."""
    from differential_equations_dnn_tpu.models import MLP

    model = MLP(input_dim=2, output_dim=1, hidden_size=8, num_layers=1,
                activation="tanh")
    from differential_equations_dnn_tpu.kernels.fused_train import pack_params

    pack = lambda p: pack_params(model, p)
    rk, flat, m, v = aot_cache.fused_prologue(model, pack, key)
    ik_ref, rk_ref = jax.random.split(key)
    flat_ref = pack(model.init(ik_ref))
    np.testing.assert_array_equal(np.asarray(jax.random.key_data(rk)),
                                  np.asarray(jax.random.key_data(rk_ref)))
    for a, b in zip(flat, flat_ref):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for t in m + v:
        assert not np.any(np.asarray(t))
