"""Parallelism utilities (re-export of the mesh/sharding layer).

The reference's distributed backend is single-host DataParallel + SyncBN
thread queues (SURVEY.md section 2.3/5.8); here everything is a
``jax.sharding.Mesh`` + pjit.  This package provides the discoverable import
path; the implementation lives in tise_tpu.core.mesh and the psum-able
statistic accumulators in tise_tpu.ops.stats.
"""

from tise_tpu.core.mesh import (  # noqa: F401
    batch_sharding,
    make_mesh,
    pad_to_multiple,
    replicated,
    shard_batch,
)
from tise_tpu.ops.stats import psum_moments  # noqa: F401
from tise_tpu.parallel import multihost  # noqa: F401


def init_distributed(coordinator_address: str | None = None, num_processes: int | None = None, process_id: int | None = None) -> None:
    """Multi-host bring-up (optional DCN headroom, SURVEY.md section 2.3).

    After this, metric CLIs shard work items across processes and allgather
    per-item outputs (tise_tpu/parallel/multihost.py).
    """
    import jax

    kwargs = {}
    if coordinator_address is not None:
        kwargs = dict(
            coordinator_address=coordinator_address, num_processes=num_processes, process_id=process_id
        )
    jax.distributed.initialize(**kwargs)
