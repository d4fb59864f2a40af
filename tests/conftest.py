"""Test configuration: force an 8-device CPU platform BEFORE any computation,
so sharding/mesh logic is exercised without TPU hardware (SURVEY §4).

Note: env vars (JAX_PLATFORMS / XLA_FLAGS) are overridden by the axon
sitecustomize in this image — ``jax.config.update`` is authoritative."""

import sys
from pathlib import Path

import jax
import pytest

# Repo root on sys.path: tests import the repo-root ``bench`` module.
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
# Persistent compile cache: test wall-time is compile-dominated.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


@pytest.fixture
def key():
    return jax.random.key(0)
