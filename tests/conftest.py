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
# test runs skip the (slow) CPU compiles of the big backbones.  The cache dir
# is keyed by a machine fingerprint: XLA:CPU AOT executables are specialised
# to the host's CPU features and loading one compiled elsewhere can SIGILL.
jax.config.update("jax_platforms", "cpu")


def _machine_key() -> str:
    import hashlib
    import platform

    bits = [platform.machine(), platform.processor()]
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("model name", "flags")):
                    bits.append(line.strip())
                    if len(bits) >= 4:
                        break
    except OSError:
        pass
    return hashlib.sha256("|".join(bits).encode()).hexdigest()[:12]


_cache_dir = f"/tmp/tise_tpu_test_jax_cache_{_machine_key()}"
os.makedirs(_cache_dir, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)
