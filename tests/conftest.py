"""Test harness: force an 8-device virtual CPU platform before jax imports.

Multi-chip sharding (pjit/shard_map over a Mesh) is validated on virtual CPU
devices; real-TPU benchmarking happens via bench.py instead.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["JAX_PLATFORMS"] = "cpu"  # force: outer env pins axon (the TPU tunnel)
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The container's sitecustomize registers the TPU plugin and pins
# jax_platforms at import time; re-pin to CPU before any backend resolves.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
