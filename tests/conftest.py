"""Test harness: force an 8-device virtual CPU mesh before jax initialises.

Multi-chip sharding is validated on host CPU devices
(xla_force_host_platform_device_count); the real-TPU path is exercised by
bench.py and the driver's dryrun.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    _flags += " --xla_force_host_platform_device_count=8"
# 8 virtual devices time-share this host's core(s): XLA:CPU's collective
# rendezvous SIGABRTs the process if participants don't all arrive within
# 40 s (the round-1 full-suite abort) — stretch the timeouts.
if "collective_call_terminate_timeout" not in _flags:
    _flags += (
        " --xla_cpu_collective_call_terminate_timeout_seconds=1200"
        " --xla_cpu_collective_timeout_seconds=1200"
    )
os.environ["XLA_FLAGS"] = _flags

import jax  # noqa: E402

# The axon TPU plugin ignores the JAX_PLATFORMS env override; the config key
# is authoritative.  Also enable the persistent compilation cache so repeated
# test runs skip the (slow) CPU compiles of the big backbones.  The cache dir
# is keyed by a machine fingerprint: XLA:CPU AOT executables are specialised
# to the host's CPU features and loading one compiled elsewhere can SIGILL.
jax.config.update("jax_platforms", "cpu")

from tise_tpu.core import compile_cache  # noqa: E402

compile_cache.enable()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)
