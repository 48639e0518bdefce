"""Multi-host metric execution (SURVEY.md section 2.3 DCN headroom).

Strategy: metric extraction is embarrassingly parallel over images, so under
``jax.distributed`` each process runs an INDEPENDENT local-device mesh over a
strided shard of the work items (``shard_items``) — the hot loop never
crosses hosts, so ICI/PCIe feed the chips and the DCN carries exactly one
collective: ``allgather_rows`` reassembles per-item outputs in global item
order once extraction finishes.  Every process then computes the identical
final metric (bit-equal to a single-host run over the same item order),
which keeps the "every participating process runs the same CLI" contract of
``--coordinator`` with no primary/replica split.  Ordered-dependent steps
(IS* split binning, RP bins) therefore see the same order as single-host.

Tested with a real 2-process CPU ``jax.distributed`` cluster
(tests/test_multihost.py), not just a 1-process bring-up.

The reference has no multi-host story at all (one CUDA device per metric
script); this module is the TPU-pod scale-out path.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np


def process_count() -> int:
    import jax

    return jax.process_count()


def process_index() -> int:
    import jax

    return jax.process_index()


def is_distributed() -> bool:
    return process_count() > 1


def shard_items(items: Sequence) -> Tuple[List, np.ndarray]:
    """This process's strided shard: (items[p::n], their global indices).

    Strided (not blocked) so shards stay balanced when per-item cost drifts
    with position (e.g. SOA label folders sorted by class).
    """
    p, n = process_index(), process_count()
    idx = np.arange(p, len(items), n, dtype=np.int64)
    return [items[i] for i in idx], idx


def allgather_rows(local: np.ndarray, idx: np.ndarray, total: int) -> np.ndarray:
    """Reassemble per-item rows from every process into global item order.

    ``local``: [k, ...] rows this process produced for global items ``idx``;
    returns [total, ...] with every process's rows scattered into place —
    identical on all processes.  Single-process: scatter only (no
    collective).  Rows are padded to the max per-process count so the
    allgather is static-shape.
    """
    local = np.asarray(local)
    row_shape = local.shape[1:]
    out = np.zeros((total,) + row_shape, local.dtype)
    if not is_distributed() or total == 0:
        out[idx[: len(local)]] = local
        return out
    from jax.experimental import multihost_utils as mhu

    per = -(-total // process_count())
    buf = np.zeros((per,) + row_shape, local.dtype)
    buf[: len(local)] = local
    ibuf = np.full((per,), -1, np.int64)
    ibuf[: len(idx)] = idx
    # gather raw BYTES: process_allgather round-trips through jax arrays,
    # which would silently downcast f64/int64 payloads while x64 is disabled
    # (the default) — a uint8 view is lossless for every dtype
    bytes_v = np.ascontiguousarray(buf).reshape(per, -1).view(np.uint8)
    bytes_i = np.ascontiguousarray(ibuf).reshape(per, 1).view(np.uint8)
    vals = np.asarray(mhu.process_allgather(bytes_v))  # [nproc, per, nbytes]
    idxs = np.asarray(mhu.process_allgather(bytes_i))  # [nproc, per, 8]
    flat_v = vals.reshape(-1, vals.shape[-1]).view(local.dtype).reshape((-1,) + row_shape)
    flat_i = idxs.reshape(-1, 8).view(np.int64).reshape(-1)
    m = flat_i >= 0
    out[flat_i[m]] = flat_v[m]
    return out


def barrier(name: str) -> None:
    """Cross-process sync point (e.g. all detection pickles written before
    any process aggregates them from the shared filesystem)."""
    if not is_distributed():
        return
    from jax.experimental import multihost_utils as mhu

    mhu.sync_global_devices(name)
