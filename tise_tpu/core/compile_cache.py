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
    """Fingerprint of everything XLA:CPU specialises AOT executables on.

    The r02 multichip dryrun showed that model-name + one flags line is NOT
    enough: a cache written under a different kernel (same CPU model) loaded
    with mismatched LLVM target features ("could lead to SIGILL").  LLVM
    reads CPUID directly while /proc/cpuinfo filters through the kernel's
    known-flag table, so the kernel release and the full cpu
    family/model/stepping/microcode tuple are part of the key, plus every
    DISTINCT flags/model-name line (heterogeneous cores).  TISE_TPU_CACHE_SALT
    force-busts the cache if a mismatch warning ever still appears."""
    bits = {platform.machine(), platform.processor(), platform.release(),
            os.environ.get("TISE_TPU_CACHE_SALT", "")}
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("model name", "flags", "cpu family", "model\t",
                                    "model ", "stepping", "microcode")):
                    bits.add(line.strip())
    except OSError:
        pass
    return hashlib.sha256("|".join(sorted(bits)).encode()).hexdigest()[:12]


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
