"""Test harness configuration.

Tests run on CPU with 8 virtual devices so multi-chip sharding paths can be
exercised without TPU hardware (SURVEY.md section 4: shard-count invariance
is the fake-backend analog for this framework).  The env vars must be set
before jax initializes its backends, hence module scope here.
"""

import os

xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# This environment's TPU plugin ("axon") ignores the JAX_PLATFORMS env var;
# the config flag is honored, so force CPU through it before any backend
# initialization.
import jax

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu"
assert jax.local_device_count() == 8

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_meshflow_tests")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
