"""Disk cache of compiled TPU executables (AOT reuse across processes).

The deployment environment compiles through a remote helper that stalls
200-460 s AT RANDOM on any first-time compilation — and the JAX
source-level persistent cache is unusable there (it hangs the device
tunnel). The PJRT executable-serialization route is not: a compiled
``jax.stages.Compiled`` pickles via ``jax.experimental
.serialize_executable`` and reloads in a fresh process in ~0.3 s with
bit-identical numerics (measured round 3: kernel deserialize 0.32 s,
first dispatch 0.00 s, outputs equal bit-for-bit).

``cached_compile(jitted, *args)`` is a drop-in for
``jitted.lower(*args).compile()``:

* key = sha256(jax version + device kind + the lowered StableHLO text) —
  lowering is pure host-side tracing (the remote helper is only involved
  in ``compile()``), so cache lookup never risks a stall;
* hit  → ``deserialize_and_load`` (~0.1-0.3 s, no remote compile at all);
* miss → compile, then serialize + atomically write for the next process;
* any serialize/deserialize failure falls back to a plain compile —
  the cache can only ever add speed, never break a run.

Enabled on single-process TPU backends only (the CPU test sim uses JAX's
own persistent cache; multi-host processes must not share one file key).
Set ``DEQ_AOT_CACHE=0`` to disable, or point ``DEQ_AOT_CACHE`` at a
directory to relocate (default ``~/.cache/deq_tpu_aot``).

SECURITY: artifacts are pickles — loading one executes whatever a writer
of the cache directory planted. The default directory is created 0700;
``DEQ_AOT_CACHE`` must point at a directory only trusted users can write.
"""

import hashlib
import os
import pickle
import tempfile

import jax

_SENTINEL = object()
_loc_stripped = False


def _strip_locations():
    """Mosaic kernel payloads embed Python TRACEBACKS in their MLIR
    locations, so the SAME program lowered from different call sites
    (api.solve vs a direct driver call, bench main vs its warm probe)
    hashes differently and never cross-hits the cache. Locations are
    debug-only — strip the traceback frames, but only once the cache is
    actually in use (no import-time global config mutation; export
    JAX_TRACEBACK_IN_LOCATIONS_LIMIT to override when debugging a kernel
    lowering)."""
    global _loc_stripped
    if not _loc_stripped:
        if "JAX_TRACEBACK_IN_LOCATIONS_LIMIT" not in os.environ:
            jax.config.update("jax_traceback_in_locations_limit", 0)
        _loc_stripped = True


_status = {"hits": 0, "misses": 0, "fallbacks": 0, "memo_hits": 0}
# In-process memo of loaded executables: repeated compiles of the same
# program (e.g. Problem.evaluate building a fresh jit closure per call)
# skip even the disk read + deserialize.
_memo: dict = {}
_MAX_DISK_ENTRIES = 512


def cache_dir() -> str:
    env = os.environ.get("DEQ_AOT_CACHE", "")
    if env and env != "0":
        return env
    return os.path.expanduser("~/.cache/deq_tpu_aot")


def enabled() -> bool:
    if os.environ.get("DEQ_AOT_CACHE", "") == "0":
        return False
    try:
        if jax.process_count() > 1:
            return False
        return jax.default_backend() not in ("cpu",)
    except Exception:
        return False


def stats() -> dict:
    return dict(_status)


def _key(lowered) -> str:
    dev = jax.devices()[0]
    # platform_version pins the PJRT plugin/libtpu build: a runtime update
    # with an unchanged jax version must MISS (and recompile), not
    # deserialize a stale executable that happens to load (ADVICE r3).
    ident = "\x00".join([
        jax.__version__,
        getattr(dev, "device_kind", "unknown"),
        str(getattr(getattr(dev, "client", None), "platform_version", "")),
        lowered.as_text(),
    ])
    return hashlib.sha256(ident.encode()).hexdigest()[:32]


def cached_compile(jitted, *args, label: str = "prog", **kwargs):
    """``jitted.lower(*args, **kwargs).compile()`` with disk executable
    reuse. Works with any ``jax.jit``-wrapped callable (static argnames
    ride ``kwargs``)."""
    if not enabled():
        return jitted.lower(*args, **kwargs).compile()
    _strip_locations()
    lowered = jitted.lower(*args, **kwargs)
    from jax.experimental import serialize_executable as se

    k = _key(lowered)
    if (label, k) in _memo:
        _status["memo_hits"] += 1
        return _memo[(label, k)]
    path = os.path.join(cache_dir(), f"{label}-{k}.pkl")
    if os.path.exists(path):
        try:
            with open(path, "rb") as fh:
                payload, in_tree, out_tree, dev_ids = pickle.load(fh)
            by_id = {d.id: d for d in jax.devices()}
            compiled = se.deserialize_and_load(
                payload, in_tree, out_tree,
                execution_devices=[by_id[i] for i in dev_ids])
            _status["hits"] += 1
            _memo[(label, k)] = compiled
            return compiled
        except Exception:
            # Stale artifact (runtime/driver change, truncated write):
            # recompile and overwrite below.
            _status["fallbacks"] += 1
            try:
                os.unlink(path)
            except OSError:
                pass
    compiled = lowered.compile()
    _status["misses"] += 1
    _memo[(label, k)] = compiled
    _persist(compiled, path)
    return compiled


def cached_call(jitted, *args, label: str = "prog", **kwargs):
    """Compile ``jitted`` through the cache and immediately invoke it with
    the dynamic ``args`` (AOT Compiled objects take only the dynamic
    arguments — the static ``kwargs`` were fixed at lowering time)."""
    return cached_compile(jitted, *args, label=label, **kwargs)(*args)


def cached_split(key):
    """``jax.random.split(key) -> (k0, k1)`` through the executable cache.

    A fresh process's first EAGER op is as exposed to the deployment
    environment's compile lottery as a big kernel — every tiny first-time
    compile can stall minutes. The hot-path drivers therefore route even
    their key splits through cached executables."""
    import jax as _jax

    return cached_call(
        _jax.jit(lambda k: tuple(_jax.random.split(k))), key, label="split")


def fused_prologue(model, pack, key, params=None, opt_state=None,
                   label: str = "prol"):
    """The fused drivers' prologue as ONE cached program: split the key,
    initialise the net, zero the Adam moments. Returns
    ``(run_key, flat, m, v)``. Replaces ~15 eager dispatches (split + init
    + one zeros_like per tensor), each of which would roll the remote
    -compile lottery in a fresh process."""
    import jax as _jax
    import jax.numpy as _jnp

    if params is None and opt_state is None:
        def prol(k):
            ik, rk = _jax.random.split(k)
            flat = pack(model.init(ik))
            return rk, flat, tuple(_jnp.zeros_like(t) for t in flat)

        rk, flat, zeros = cached_call(_jax.jit(prol), key, label=label)
        # m and v may share the zeros buffers: the kernels treat inputs as
        # immutable (no donation) and write fresh output buffers.
        return rk, flat, zeros, zeros
    init_key, run_key = cached_split(key)
    if params is None:
        params = cached_call(_jax.jit(model.init), init_key, label="init")
    flat = pack(params)
    if opt_state is None:
        m = tuple(_jnp.zeros_like(p) for p in flat)
        v = m
    else:
        m = pack(opt_state["m"])
        v = pack(opt_state["v"])
    return run_key, flat, m, v


def _persist(compiled, path):
    from jax.experimental import serialize_executable as se

    try:
        payload, in_tree, out_tree = se.serialize(compiled)
        # Pin the executable's device set: deserialize_and_load defaults to
        # ALL backend devices, which breaks single-device programs on
        # multi-device hosts (execute_sharded shard-count mismatch).
        dev_ids = [d.id for d in
                   compiled._executable.xla_executable.local_devices()]
        # 0700: artifacts are pickles, and pickle.load executes whatever a
        # writer of this directory planted — keep it private to the owner
        # (entry files from mkstemp are already 0600). DEQ_AOT_CACHE must
        # point at a directory the user trusts (see module docstring).
        os.makedirs(cache_dir(), mode=0o700, exist_ok=True)
        try:
            os.chmod(cache_dir(), 0o700)
        except OSError:
            pass
        fd, tmp = tempfile.mkstemp(dir=cache_dir(), suffix=".tmp")
        with os.fdopen(fd, "wb") as fh:
            pickle.dump((payload, in_tree, out_tree, dev_ids), fh)
        os.replace(tmp, path)
        _evict()
    except Exception:
        # Unserializable program (const-closed executables etc.) — the
        # compile itself succeeded, so just return it.
        _status["fallbacks"] += 1


def _evict():
    """Bound the cache directory: programs whose lowered text embeds
    run-specific constants (e.g. eval closures over trained BatchNorm
    state) key differently every run and would grow the directory without
    bound. Keep the newest ``_MAX_DISK_ENTRIES``."""
    try:
        entries = [os.path.join(cache_dir(), f)
                   for f in os.listdir(cache_dir()) if f.endswith(".pkl")]
        if len(entries) <= _MAX_DISK_ENTRIES:
            return
        entries.sort(key=os.path.getmtime)
        for p in entries[:len(entries) - _MAX_DISK_ENTRIES]:
            try:
                os.unlink(p)
            except OSError:
                pass
    except OSError:
        pass
