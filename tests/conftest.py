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

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
