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

from tise_tpu.core.data import Batch, ImageFolderLoader
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


def _snapshot_fingerprint(files: Sequence[str], image_size: int, keys) -> str:
    import hashlib

    h = hashlib.sha256()
    for f in files:
        h.update(f.encode())
        h.update(b"\0")
    h.update(f"|{image_size}|{','.join(sorted(keys or ()))}".encode())
    return h.hexdigest()


def _load_snapshot(path: str, fingerprint: str):
    """-> (chunks dict, images-consumed cursor) or ({}, 0) when absent/stale."""
    import os

    if not os.path.exists(path):
        return {}, 0
    try:
        with np.load(path, allow_pickle=False) as z:
            if str(z["fingerprint"]) != fingerprint:
                return {}, 0
            cursor = int(z["cursor"])
            chunks = {
                k[len("rows_"):]: [z[k]] for k in z.files if k.startswith("rows_")
            }
            return chunks, cursor
    except Exception:  # noqa: BLE001 — torn/corrupt snapshot: start over
        return {}, 0


def _save_snapshot(path: str, fingerprint: str, chunks, cursor: int) -> None:
    import os

    payload = {f"rows_{k}": np.concatenate(v, axis=0) for k, v in chunks.items()}
    tmp = path + ".tmp.npz"  # np.savez appends .npz to bare names
    np.savez(tmp, fingerprint=fingerprint, cursor=cursor, **payload)
    os.replace(tmp, path)  # atomic: a kill mid-write never leaves a torn file


def run_resumable(
    build_extractor: Callable[[], "BatchedExtractor"],
    files: Sequence[str],
    *,
    batch_size: int,
    image_size: int,
    snapshot_path: str,
    keys: Optional[Sequence[str]] = None,
    snapshot_every: int = 4096,
    max_resets: int = 2,
    loader_kwargs: Optional[dict] = None,
) -> Dict[str, np.ndarray]:
    """Drop-tolerant extractor drain (VERDICT r4 #3).

    Same result as ``build_extractor().run(loader, keys)`` — the collected
    rows are a PREFIX of the file order, so the resumable path is bit-equal
    to the straight one (unlike a moments-fold it also preserves the
    reference's exact host-f64 covariance semantics downstream) — but:

      * every ``snapshot_every`` images the rows-so-far + file cursor are
        written atomically to ``snapshot_path`` (npz; ~240 MB for a 30k FID
        run — trivial next to the stage minutes);
      * on a backend drop (core.backend.is_backend_drop: the axon tunnel's
        UNAVAILABLE with journal replay disabled) the run resets the backend
        in-process (core.backend.reset_backend), REBUILDS the extractor —
        params and executables on the dead client are gone — and continues
        from the last snapshot, up to ``max_resets`` times;
      * if in-process reset fails, the exception propagates but the snapshot
        survives: re-running the same command resumes from it (the moral
        equivalent of the reference's SOA per-label pickles, SOA.py:77-79).

    A finished run DELETES the snapshot (a later, different run must not
    resume from it; a stale file list/size is also guarded by a fingerprint).
    Single-process only — the multi-host path shards files itself.
    """
    import os

    from tise_tpu.core.backend import is_backend_drop, reset_backend
    from tise_tpu.parallel import multihost

    if multihost.is_distributed():
        raise NotImplementedError(
            "run_resumable is single-process; multi-host runs shard the file "
            "list across processes instead (extractor.run)"
        )
    files = list(files)
    fingerprint = _snapshot_fingerprint(files, image_size, keys)
    chunks, cursor = _load_snapshot(snapshot_path, fingerprint)

    resets = 0
    extractor = build_extractor()
    while cursor < len(files) or not chunks:
        try:
            loader = ImageFolderLoader(
                files[cursor:], batch_size, image_size, **(loader_kwargs or {})
            )
            pending: List[tuple] = []
            since_snap = 0

            def collect(out, mask, paths) -> None:
                nonlocal cursor, since_snap
                for name, val in out.items():
                    if keys is not None and name not in keys:
                        continue
                    arr = np.asarray(jax.device_get(val))
                    chunks.setdefault(name, []).append(arr[mask])
                cursor += len(paths)
                since_snap += len(paths)

            for batch in loader:
                out = extractor(batch.images)
                pending.append((out, batch.mask, batch.paths))
                if len(pending) > 1:
                    collect(*pending.pop(0))
                if since_snap >= snapshot_every:
                    # flush in-flight work so the snapshot cursor is exact
                    while pending:
                        collect(*pending.pop(0))
                    _save_snapshot(snapshot_path, fingerprint, chunks, cursor)
                    since_snap = 0
            while pending:
                collect(*pending.pop(0))
            break
        except Exception as e:  # noqa: BLE001 — filtered to transport errors below
            if resets >= max_resets or not is_backend_drop(e):
                raise
            resets += 1
            print(
                f"[extractor] backend drop at image {cursor}/{len(files)} "
                f"({e}); reset {resets}/{max_resets}, resuming from snapshot",
                flush=True,
            )
            reset_backend()
            # arrays/executables on the dead client are invalid: reload the
            # last durable state and rebuild the forward from host weights
            chunks, cursor = _load_snapshot(snapshot_path, fingerprint)
            extractor = build_extractor()
    if os.path.exists(snapshot_path):
        os.remove(snapshot_path)
    return {k: np.concatenate(v, axis=0) for k, v in chunks.items()}
