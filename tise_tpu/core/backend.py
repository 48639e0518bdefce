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


def reset_backend() -> None:
    """Best-effort in-process backend re-initialisation.

    Clears jax's compiled-executable caches and the backend-client registry,
    then touches ``jax.devices()`` to force the platform factory to run again
    (a fresh tunnel connection for the axon platform).  Raises whatever the
    re-initialisation raises if the platform cannot come back — callers fall
    back to process-level resume (their snapshot survives on disk).
    """
    import jax
    from jax._src import xla_bridge

    jax.clear_caches()
    xla_bridge._clear_backends()  # noqa: SLF001 — no public API for this
    jax.devices()
