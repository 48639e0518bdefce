"""In-process jax backend recovery after a fatal client error.

Context: the axon TPU tunnel intermittently DROPS mid-run, and with
AXON_JOURNAL_COMPACT=1 (the host-RSS leak fix, tise_tpu/__init__.py) the
dropped journal cannot be replayed — every later dispatch on the dead client
raises ``UNAVAILABLE: TPU backend connection dropped ... call reset() and
retry from the start``.  The ``axon.lib`` module that carries that
``reset()`` is not importable on this image (bare PJRT registration only),
so recovery goes through jax's own backend registry instead: drop the cached
client + every compiled executable, then force re-initialisation, which
re-runs the platform factory and opens a fresh tunnel connection.

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
            print(f"[backend] reset probe failed ({type(e).__name__}: {e}); "
                  f"retrying in {delay:.0f}s", flush=True)
            time.sleep(delay)
            delay = min(delay * 1.5, 60.0)
