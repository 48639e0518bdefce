"""Sharded feature-extraction engine.

Every metric's hot loop is the same shape: stream uint8 batches from an image
folder, run a backbone forward, collect features/logits.  The reference does
this with a per-metric torch DataLoader + ``.cuda()`` copies
(fid_score.py:99-113); here it is one engine: a pjit-compiled forward whose
batch axis is sharded over the ``data`` mesh axis, with the host prefetch
pipeline double-buffering uint8 batches into device memory.  The normalize
recipe is fused into the jitted forward so the device reads uint8 (4x less
PCIe/DMA traffic than float32).
"""

from __future__ import annotations

from typing import Callable, Dict, Iterable, List, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tise_tpu.core.data import Batch
from tise_tpu.core.mesh import make_mesh
from tise_tpu.ops.preprocess import normalize, resize_and_normalize


class BatchedExtractor:
    """jit + shard a (params, uint8 batch) -> {name: features} forward.

    ``device_resize_to``: fuse the resize into the device program (host sends
    native-size uint8; jax.image antialiased resize ~= PIL, documented
    deviation) — the fast path for >=5k img/s extraction.
    """

    def __init__(
        self,
        apply_fn: Callable[..., Dict[str, jax.Array]],
        params,
        *,
        recipe: str,
        mesh: Optional[Mesh] = None,
        donate: bool = False,
        device_resize_to: Optional[int] = None,
    ):
        self.mesh = mesh if mesh is not None else make_mesh()
        self.params = params
        self.recipe = recipe
        self.apply_fn = apply_fn
        data_axis = self.mesh.axis_names[0]

        def fwd(params, images_u8):
            if device_resize_to is not None:
                x = resize_and_normalize(images_u8, recipe, device_resize_to)
            else:
                x = normalize(images_u8, recipe)
            return apply_fn(params, x)

        batch_sharding = NamedSharding(self.mesh, P(data_axis, None, None, None))
        self._batch_sharding = batch_sharding
        self._fwd = jax.jit(
            fwd,
            in_shardings=(NamedSharding(self.mesh, P()), batch_sharding),
            out_shardings=NamedSharding(self.mesh, P(data_axis)),
            donate_argnums=(1,) if donate else (),
        )

    @property
    def data_parallel(self) -> int:
        return self.mesh.shape[self.mesh.axis_names[0]]

    def __call__(self, images_u8: np.ndarray) -> Dict[str, jax.Array]:
        n = images_u8.shape[0]
        pad = (-n) % self.data_parallel  # batch must divide over the data axis
        if pad:
            images_u8 = np.concatenate(
                [images_u8, np.zeros((pad,) + images_u8.shape[1:], images_u8.dtype)]
            )
        x = jax.device_put(images_u8, self._batch_sharding)
        out = self._fwd(self.params, x)
        if pad:
            out = {k: v[:n] for k, v in out.items()}
        return out

    def run(self, loader: Iterable[Batch], keys: Optional[Sequence[str]] = None) -> Dict[str, np.ndarray]:
        """Drain a loader; returns host arrays with padding rows removed.

        Double-buffered: batch k+1 is dispatched before batch k's results are
        pulled, so host transfer/compute overlap device compute.

        Under ``jax.distributed`` (process_count > 1) the loader's file list
        is sharded across processes, each process extracts on its local-device
        mesh, and the rows are allgathered back into global file order — the
        returned dict is identical on every process and bit-equal to a
        single-host run (tests/test_multihost.py).
        """
        from tise_tpu.parallel import multihost

        if multihost.is_distributed() and hasattr(loader, "files"):
            files = list(loader.files)
            if getattr(loader, "drop_last", False):
                # legacy drop_last acts on the GLOBAL list (fid_score.py:216)
                files = files[: len(files) // loader.batch_size * loader.batch_size]
            local_files, idx = multihost.shard_items(files)
            sub = type(loader)(
                local_files,
                loader.batch_size,
                loader.image_size,
                resample=loader.resample,
                center_crop=loader.center_crop,
                drop_last=False,
                num_workers=loader.num_workers,
                prefetch=loader.prefetch,
            )
            local = self._run_local(sub, keys)
            if not local:
                # empty shard (fewer files than processes): this process still
                # has to enter the SAME allgathers as everyone else or the
                # cluster deadlocks — learn the output keys/shapes from a
                # dummy forward and contribute zero rows
                size = loader.image_size
                dummy = self(np.zeros((1, size, size, 3), np.uint8))
                local = {
                    k: np.zeros((0,) + np.asarray(v).shape[1:], np.asarray(v).dtype)
                    for k, v in dummy.items()
                    if keys is None or k in keys
                }
            return {
                k: multihost.allgather_rows(v, idx, len(files)) for k, v in local.items()
            }
        return self._run_local(loader, keys)

    def _run_local(self, loader: Iterable[Batch], keys: Optional[Sequence[str]] = None) -> Dict[str, np.ndarray]:
        pending: List[tuple] = []
        chunks: Dict[str, List[np.ndarray]] = {}

        def collect(out: Dict[str, jax.Array], mask: np.ndarray) -> None:
            for name, val in out.items():
                if keys is not None and name not in keys:
                    continue
                arr = np.asarray(jax.device_get(val))
                chunks.setdefault(name, []).append(arr[mask])

        for batch in loader:
            out = self(batch.images)
            pending.append((out, batch.mask))
            if len(pending) > 1:
                collect(*pending.pop(0))
        while pending:
            collect(*pending.pop(0))
        return {k: np.concatenate(v, axis=0) for k, v in chunks.items()}
