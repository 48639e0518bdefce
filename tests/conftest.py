"""Test harness: force an 8-device virtual CPU mesh before jax initialises.

Multi-chip sharding is validated on host CPU devices
(xla_force_host_platform_device_count); the real-TPU path is exercised by
bench.py and the driver's dryrun.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = _flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

# The axon TPU plugin ignores the JAX_PLATFORMS env override; the config key
# is authoritative.  Also enable the persistent compilation cache so repeated
# test runs skip the (slow) CPU compiles of the big backbones.
jax.config.update("jax_platforms", "cpu")
os.makedirs("/tmp/tise_tpu_test_jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/tise_tpu_test_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)
