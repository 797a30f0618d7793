"""Test configuration: run JAX on a virtual 8-device CPU mesh.

The container's sitecustomize registers the axon TPU tunnel and imports jax
at interpreter start, so env vars are too late — but backends initialize
lazily, so overriding jax.config before any computation forces CPU. Without
this, tests silently run through the single tunneled TPU chip (slow remote
compiles, hangs when two test processes share the relay).
"""
import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
).strip()

import jax

jax.config.update("jax_platforms", "cpu")

# Persistent XLA compilation cache: the suite is compile-bound on this
# single-core CPU (tiny shapes, big programs, recompiled every run).
# First run populates ~/.cache/uforecon_tpu_xla; re-runs hit the cache.
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/uforecon_tpu_xla"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
