"""In-process jax backend recovery after a fatal client error.

Context: the axon TPU tunnel intermittently DROPS mid-run, and with
AXON_JOURNAL_COMPACT=1 (the host-RSS leak fix, tise_tpu/__init__.py) the
dropped journal cannot be replayed — every later dispatch on the dead client
raises ``UNAVAILABLE: TPU backend connection dropped ... call reset() and
retry from the start``.  The ``axon.lib`` module that carries that
``reset()`` is not importable on this image (bare PJRT registration only),
so recovery is two-layered:

1. ``_native_reset`` — ctypes-call the C symbol ``axon_reset`` that the
   PJRT cdylib exports (``nm -D libaxon_pjrt.so``).  This is the designed
   recovery entry the drop message names.  It matters because the plugin's
   registration docstring states its Rust ``GLOBAL_CLIENT`` is a OnceLock
   "fixed for process lifetime": without the native reset, step 2 below
   builds a fresh PJRT client around the SAME dead transport, and every
   re-init probe fails until the process dies (observed: a 30k track run
   burned full 600 s probe budgets on soa AND crop while a fresh process
   connected instantly).
2. jax-registry re-initialisation: drop the cached client + every compiled
   executable, then force the platform factory to run again.

Every live ``jax.Array`` and jitted executable from before the reset is
invalid afterwards — callers must rebuild from host state (the streaming
metric pipelines snapshot theirs periodically for exactly this;
metrics/extractor.py run_resumable).

The reference's equivalent convention is process-level re-running with
per-stage pickles (semantic_object_accuracy/SOA.py:77-79); this module is
the in-process half of that story.
"""

from __future__ import annotations


def is_backend_drop(e: BaseException) -> bool:
    """True if ``e`` looks like a fatal PJRT client/transport failure (vs a
    programming error, which retrying cannot fix)."""
    msg = str(e)
    return any(
        s in msg
        for s in (
            "UNAVAILABLE",
            "backend connection dropped",
            "DATA_LOSS",
            "Socket closed",
            "failed to connect",
        )
    )


def _native_reset() -> str:
    """Best-effort call into the axon plugin's own recovery entry point.

    ``int axon_reset(int)`` (disassembly: the arg is narrowed to a bool and
    forwarded; 0 = the plain reset the drop message asks for).  Returns a
    short status string for the retry log; failures are non-fatal — the
    jax-registry re-init still runs and its probe decides success.
    """
    import ctypes
    import os

    so = os.environ.get("PJRT_LIBRARY_PATH", "/opt/axon/libaxon_pjrt.so")
    if not os.path.exists(so):
        return "no plugin .so"
    try:
        h = ctypes.CDLL(so)  # already mapped: dlopen returns the live handle
        h.axon_reset.restype = ctypes.c_int
        h.axon_reset.argtypes = [ctypes.c_int]
        rc = h.axon_reset(0)
        if rc == 0:
            return "axon_reset ok"
        h.axon_sidechannel_last_error.restype = ctypes.c_char_p
        err = h.axon_sidechannel_last_error()
        return f"axon_reset rc={rc} ({err.decode() if err else 'no error text'})"
    except Exception as e:  # noqa: BLE001 — missing symbol / ABI drift
        return f"axon_reset unavailable ({type(e).__name__})"


def reset_backend(max_wait_s: float | None = None) -> None:
    """In-process backend re-initialisation that WAITS for the platform.

    Clears jax's compiled-executable caches and the backend-client registry,
    then touches ``jax.devices()`` to force the platform factory to run again
    (a fresh tunnel connection for the axon platform) and verifies it with a
    real device round trip.  Observed tunnel outages last minutes (a 30k
    track run lost 4 stages to a ~4-minute drop because the immediate
    re-connect either failed or dropped again, burning every retry in
    seconds), so a failed re-init is retried with backoff until
    ``max_wait_s`` (default: ``TISE_RESET_WAIT_S`` env var or 600 s) elapses;
    only then does the last error propagate — callers fall back to
    process-level resume (their snapshot survives on disk).
    """
    import os
    import time

    import jax
    import numpy as np
    from jax._src import xla_bridge

    if max_wait_s is None:
        max_wait_s = float(os.environ.get("TISE_RESET_WAIT_S", "600"))
    deadline = time.monotonic() + max_wait_s
    delay = 15.0
    while True:
        try:
            status = _native_reset()
            jax.clear_caches()
            xla_bridge._clear_backends()  # noqa: SLF001 — no public API for this
            jax.devices()
            # verify with a real round trip (init can succeed lazily while
            # the transport is still down)
            x = jax.device_put(np.ones((8,), np.float32))
            if float(jax.numpy.sum(x)) != 8.0:
                raise RuntimeError("backend probe returned a wrong value")
            return
        except Exception as e:  # noqa: BLE001 — transport errors vary by layer
            if time.monotonic() >= deadline:
                raise
            print(f"[backend] reset probe failed ({type(e).__name__}: {e}; "
                  f"native: {status}); retrying in {delay:.0f}s", flush=True)
            time.sleep(delay)
            delay = min(delay * 1.5, 60.0)
