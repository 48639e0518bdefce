"""Machine-keyed persistent JAX compilation cache.

XLA:CPU AOT executables are specialised to the host's CPU features; loading
one compiled on a different machine can SIGILL (the loader warns about
exactly this).  So the cache directory embeds a fingerprint of the CPU.
Shared by tests/conftest.py and __graft_entry__ so a pytest run of the
multichip dryrun warms the cache for the driver's own out-of-process
invocation (the jit_train_step compile alone is ~4 min on a 1-CPU host).
"""

from __future__ import annotations

import hashlib
import os
import platform


def machine_key() -> str:
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


def cache_dir() -> str:
    return f"/tmp/tise_tpu_test_jax_cache_{machine_key()}"


def enable(min_compile_secs: float = 1.0) -> str:
    """Point jax at the machine-keyed persistent cache (honours an explicit
    JAX_COMPILATION_CACHE_DIR env override) and return the directory used."""
    import jax

    path = os.environ.get("JAX_COMPILATION_CACHE_DIR") or cache_dir()
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", min_compile_secs)
    return path
