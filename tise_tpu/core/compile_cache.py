"""Machine-keyed persistent JAX compilation cache.

XLA:CPU AOT executables are specialised to the host's CPU features; loading
one compiled on a different machine can SIGILL (the loader warns about
exactly this).  So the cache directory embeds a fingerprint of the CPU.
Shared by tests/conftest.py and __graft_entry__ so a pytest run of the
multichip dryrun warms the cache for the driver's own out-of-process
invocation (the jit_train_step compile alone is ~4 min on a 1-CPU host).
"""

from __future__ import annotations

import atexit
import hashlib
import os
import platform
import re
import threading


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


_AOT_LINE = re.compile(
    rb"Compile machine features: \[([^\]]*)\] vs host machine features: \[([^\]]*)\]"
)
_SPURIOUS_FEATURES = {b"prefer-no-gather", b"prefer-no-scatter"}
_filter_installed = False


def _aot_warning_is_spurious(line: bytes) -> bool:
    """True iff ``line`` is the cpu_aot_loader machine-feature warning AND the
    only compile-side features missing from the host probe are XLA's
    prefer-no-gather/scatter *tuning* pseudo-features.

    Measured on this host (round 3): a two-process run compiling then
    reloading the same persistent-cache entry on the SAME machine emits the
    warning — LLVM appends the prefer-no-* tuning preferences to the compile
    target features, but the loader's host-feature probe never lists them, so
    every same-machine AOT reload "mismatches".  No cache key can fix a
    comparison that is wrong on identical machines; we drop exactly that
    case and pass every other feature diff through untouched (a real
    cross-machine mismatch still warns, which machine_key() should prevent)."""
    if b"Machine type used for XLA:CPU compilation" not in line:
        return False
    m = _AOT_LINE.search(line)
    if not m:
        return False
    compiled = {
        f.strip()[1:]
        for f in m.group(1).split(b",")
        if f.strip().startswith(b"+")
    }
    host = {f.strip() for f in m.group(2).split(b",")}
    return (compiled - host) <= _SPURIOUS_FEATURES


def install_spurious_aot_warning_filter() -> None:
    """Route fd 2 through a line filter dropping the proven-spurious AOT
    reload warning (see ``_aot_warning_is_spurious``).  Driver-facing entry
    points only — pytest manages its own fd-2 capture."""
    global _filter_installed
    if _filter_installed:
        return
    _filter_installed = True
    real = os.dup(2)
    rd, wr = os.pipe()
    os.dup2(wr, 2)
    os.close(wr)

    def pump() -> None:
        buf = b""
        while True:
            try:
                chunk = os.read(rd, 1 << 16)
            except OSError:
                break
            if not chunk:
                break
            buf += chunk
            *lines, buf = buf.split(b"\n")
            for ln in lines:
                if not _aot_warning_is_spurious(ln):
                    os.write(real, ln + b"\n")
        if buf:
            os.write(real, buf)

    t = threading.Thread(target=pump, daemon=True, name="aot-warning-filter")
    t.start()

    def restore() -> None:
        # point fd 2 back at the terminal; dup2 closes the pipe's only write
        # end, so the pump drains the remainder, hits EOF, and exits before
        # the interpreter tears daemon threads down
        os.dup2(real, 2)
        t.join(timeout=5)

    atexit.register(restore)


def enable(min_compile_secs: float = 1.0) -> str:
    """Point jax at the machine-keyed persistent cache (honours an explicit
    JAX_COMPILATION_CACHE_DIR env override) and return the directory used."""
    import jax

    path = os.environ.get("JAX_COMPILATION_CACHE_DIR") or cache_dir()
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", min_compile_secs)
    return path
