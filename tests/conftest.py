"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

Tests run on CPU so they are hermetic and fast; multi-chip sharding tests use
the 8 virtual devices. Real-TPU execution is exercised by bench.py and the
driver's __graft_entry__ checks.
"""

import os

# The container's sitecustomize pre-imports jax and pins jax_platforms to
# "axon,cpu" (tunneled TPU). Point XLA_FLAGS at 8 virtual CPU devices and then
# force the platform back to cpu via jax.config — env vars alone are too late.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.RandomState(1)
