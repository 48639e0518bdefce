"""CA — Counting Alignment (reference: counting_alignment/CA.py).

Per caption item: predict per-class object counts for the generated image
(448x448, ImageNet normalization, CA.py:121-128) with the PRM counter, then
RMSE between predicted and ground-truth counts over the classes named in the
item's ``counting_info`` (predictions for absent classes count as 0,
CA.py:170-186); CA = mean RMSE over items (lower is better).

TPU redesign: images are counted in batched pjit forwards instead of the
reference's one-image DataParallel loop; counting is forward-only (see
tise_tpu/backbones/counter.py on why no input gradients are needed).
"""

from __future__ import annotations

import argparse
import math
import os
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from tise_tpu.backbones import counter as counter_lib
from tise_tpu.backbones.detection.coco_classes import COCO_CLASSES
from tise_tpu.core import io as result_io
from tise_tpu.core.config import (add_distributed_flags, add_precision_flag,
                                  configure_precision, maybe_init_distributed)
from tise_tpu.core.data import load_image
from tise_tpu.core.mesh import make_mesh
from tise_tpu.ops.preprocess import normalize

IMAGE_SIZE = 448  # CA.py:121


class CountingEngine:
    """Batched sharded counter forward -> per-class count dicts."""

    def __init__(self, params, mesh=None, dtype=jnp.float32):
        self.mesh = mesh if mesh is not None else make_mesh()
        self.params = params
        model = counter_lib.FCResNet50PRM(dtype=dtype)
        data = self.mesh.axis_names[0]

        def fwd(p, images_u8):
            x = normalize(images_u8, "imagenet")
            return model.apply(p, x)

        self._fwd = jax.jit(
            fwd,
            in_shardings=(NamedSharding(self.mesh, P()), NamedSharding(self.mesh, P(data))),
            out_shardings=NamedSharding(self.mesh, P(data)),
        )

    @property
    def data_parallel(self) -> int:
        return self.mesh.shape[self.mesh.axis_names[0]]

    def count_batch(self, images_u8: np.ndarray) -> List[Dict[str, float]]:
        b = images_u8.shape[0]
        pad = (-b) % self.data_parallel
        if pad:
            images_u8 = np.concatenate([images_u8, np.zeros((pad,) + images_u8.shape[1:], images_u8.dtype)])
        conf, density = self._fwd(self.params, images_u8)
        counts = counter_lib.predict_counts(np.asarray(conf), np.asarray(density))[:b]
        out = []
        for row in counts:
            out.append({COCO_CLASSES[i]: float(c) for i, c in enumerate(row) if c})
        return out


def rmse_for_item(pred: Dict[str, float], gt: Dict[str, float]) -> float:
    """Reference pairing (CA.py:176-185): iterate GT classes; missing
    predictions count 0."""
    gt_vals, pred_vals = [], []
    for key, val in gt.items():
        gt_vals.append(float(val))
        pred_vals.append(float(pred.get(key, 0.0)))
    sq = np.mean((np.asarray(gt_vals) - np.asarray(pred_vals)) ** 2)
    return math.sqrt(sq)


def compute_ca(
    counting_data: Sequence[Dict],
    image_dir: str,
    engine: CountingEngine,
    *,
    batch_size: int = 32,
    num_workers: int = 8,
    snapshot_path: str = "",
    build_engine=None,
    snapshot_every: int = 0,
) -> float:
    """Per-item RMSEs are a PREFIX of the (sharded) item order, so the loop
    is drop-tolerant exactly like RP's (rp_coco.score_items): periodic
    rmse-rows+cursor snapshots, in-process backend reset + engine rebuild on
    a transport drop, process-level resume from the snapshot file."""
    from tise_tpu.metrics import extractor as ext
    from tise_tpu.parallel import multihost

    if snapshot_path and multihost.is_distributed():
        raise NotImplementedError(
            "CA snapshots are single-process; multi-host runs shard items instead"
        )

    n = len(counting_data)
    sel, gidx = multihost.shard_items(list(range(n)))
    fp = ""
    chunks: Dict[str, list] = {}
    cursor = 0
    snapshot_every = snapshot_every or max(batch_size * 8, 256)
    if snapshot_path:
        fp = ext._snapshot_fingerprint(
            [str(counting_data[i]["caption_id"]) for i in sel], IMAGE_SIZE, ("rmse",)
        )
        chunks, cursor = ext._load_snapshot(snapshot_path, fp)
    resets = 0
    while cursor < len(sel):
        try:
            with ThreadPoolExecutor(max_workers=num_workers) as pool:
                since = 0
                for start in range(cursor, len(sel), batch_size):
                    chunk = sel[start : start + batch_size]
                    imgs = list(
                        pool.map(
                            lambda i: load_image(
                                os.path.join(image_dir, f"{counting_data[i]['caption_id']}.png"),
                                (IMAGE_SIZE, IMAGE_SIZE),
                            ),
                            chunk,
                        )
                    )
                    preds = engine.count_batch(np.stack(imgs))
                    chunks.setdefault("rmse", []).append(
                        np.asarray(
                            [
                                rmse_for_item(preds[j], counting_data[i]["counting_info"])
                                for j, i in enumerate(chunk)
                            ]
                        )
                    )
                    cursor = start + len(chunk)
                    since += len(chunk)
                    if snapshot_path and since >= snapshot_every:
                        ext._save_snapshot(snapshot_path, fp, chunks, cursor)
                        since = 0
            break
        except Exception as e:  # noqa: BLE001 — filtered to transport errors below
            from tise_tpu.core.backend import is_backend_drop, reset_backend

            if not snapshot_path or build_engine is None or resets >= 2 or not is_backend_drop(e):
                raise
            resets += 1
            print(f"[ca] backend drop at item {cursor}/{len(sel)} ({e}); "
                  f"reset {resets}/2, resuming from snapshot", flush=True)
            reset_backend()
            engine = build_engine()
            chunks, cursor = ext._load_snapshot(snapshot_path, fp)
    if snapshot_path and os.path.exists(snapshot_path):
        os.remove(snapshot_path)
    local = np.concatenate(chunks["rmse"]) if chunks.get("rmse") else np.zeros(0)
    rmse = multihost.allgather_rows(local, gidx, n)
    return float(np.mean(rmse))


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description="Calculating Counting metric")
    p.add_argument("--image_dir", default="", type=str)
    p.add_argument("--ct_input_file", default="captions/CA_input_captions.pkl", type=str)
    p.add_argument("--gpu_id", default=0, type=int, help="ignored (TPU build)")
    p.add_argument("--result_file", default="", type=str)
    p.add_argument("--weights", type=str, required=True, help="CountSeg coco14.pt or converted .npz")
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--snapshot_file", type=str, default="",
                   help="make the item loop drop-tolerant: periodic rmse+"
                        "cursor snapshot at this path (bit-equal result)")
    add_precision_flag(p)
    add_distributed_flags(p)
    args = p.parse_args(argv)
    configure_precision(args.precision)
    maybe_init_distributed(args)

    build = lambda: CountingEngine(  # noqa: E731 — rebuilt after a backend reset
        counter_lib.load_counter_params(args.weights)
    )
    engine = build()
    counting_data = result_io.load_pickle(args.ct_input_file)
    ca = compute_ca(counting_data, args.image_dir, engine, batch_size=args.batch_size,
                    snapshot_path=args.snapshot_file, build_engine=build)
    if args.result_file:
        result_io.write_ca_result(args.result_file, ca)
    print(f"CA = {ca}")


if __name__ == "__main__":
    main()
