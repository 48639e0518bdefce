"""Device mesh and sharding helpers.

TPU-native replacement for the reference's parallelism (SURVEY.md section 2.3):
``torch.nn.DataParallel`` over up to 3 GPUs (AttnGAN++/trainer.py:126-131) and
SynchronizedBatchNorm's thread-queue reduction (sync_batchnorm/comm.py:57-137)
both become a ``jax.sharding.Mesh`` with a ``data`` axis: batches shard over
ICI, and cross-replica statistics (BN moments, FID moment accumulators, IS
prediction gathers) are XLA collectives inserted by pjit from sharding
annotations.  A second ``model`` axis is available for sharding wide weights.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tise_tpu.core.config import MeshConfig


def make_mesh(cfg: Optional[MeshConfig] = None, devices: Optional[Sequence] = None) -> Mesh:
    """Build a (data, model) mesh over the available devices.

    Defaults to this process's LOCAL devices: under ``jax.distributed`` each
    process drives its own chips over its own work-item shard and only the
    final per-item outputs cross hosts (tise_tpu/parallel/multihost.py) —
    single-process runs see every device either way.  Pass ``devices``
    explicitly (e.g. ``jax.devices()``) for a program that must span hosts,
    such as a cross-host TP training mesh.
    """
    cfg = cfg or MeshConfig()
    devices = list(devices if devices is not None else jax.local_devices())
    n = len(devices)
    mp = max(1, cfg.model_parallel)
    dp = cfg.data_parallel if cfg.data_parallel > 0 else n // mp
    if dp * mp > n:
        raise ValueError(f"mesh {dp}x{mp} needs {dp * mp} devices, have {n}")
    grid = np.array(devices[: dp * mp]).reshape(dp, mp)
    return Mesh(grid, (cfg.data_axis, cfg.model_axis))


def batch_sharding(mesh: Mesh, ndim: int = 4) -> NamedSharding:
    """Shard axis 0 (batch) over the data axis; replicate the rest."""
    spec = P(mesh.axis_names[0], *([None] * (ndim - 1)))
    return NamedSharding(mesh, spec)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def pad_to_multiple(batch: np.ndarray, multiple: int) -> tuple[np.ndarray, np.ndarray]:
    """Pad the batch axis up to a multiple; return (padded, valid_mask).

    XLA needs static shapes, and a sharded batch must divide evenly over the
    data axis — the tail batch of a folder dataset is padded and masked rather
    than dropped (the reference *drops* it: fid_score.py:216 drop_last=True;
    ``legacy_compat`` reproduces that at the dataset layer instead).
    """
    n = batch.shape[0]
    target = int(math.ceil(n / multiple) * multiple)
    mask = np.zeros((target,), dtype=bool)
    mask[:n] = True
    if target == n:
        return batch, mask
    pad = [(0, target - n)] + [(0, 0)] * (batch.ndim - 1)
    return np.pad(batch, pad), mask


def shard_batch(mesh: Mesh, batch: np.ndarray) -> jax.Array:
    """Device-put a host batch with its axis 0 sharded over the data axis."""
    return jax.device_put(batch, batch_sharding(mesh, batch.ndim))
