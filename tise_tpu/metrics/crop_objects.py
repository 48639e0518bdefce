"""Object cropping — stage 1 of the O-metrics (reference: object_fidelity/crop_object.py).

Runs the detector (Mask R-CNN R50-FPN, score threshold 0.5,
crop_object.py:18-22) over a folder of generated images and writes every
detected box as ``<img>_<class>_<count>.png`` crops (:25-46; ``count`` is a
global running index across the whole folder).  The crops feed O-IS and O-FID.

The detector is the pluggable interface from tise_tpu.backbones.detection —
a sharded static-shape TPU Mask R-CNN (or any callable with the same
signature).
"""

from __future__ import annotations

import argparse

from tise_tpu.core.config import (add_distributed_flags, add_precision_flag,
                                  configure_precision, maybe_init_distributed)
import os
from typing import Sequence

import numpy as np
from PIL import Image

from tise_tpu.backbones.detection.coco_classes import COCO_CLASSES


def crop_folder(
    detector,
    src_dir: str,
    dest_dir: str,
    *,
    class_names: Sequence[str] = COCO_CLASSES,
    slab: int = 1024,
    progress: bool = True,
    build_detector=None,
    max_resets: int = 2,
) -> int:
    """Detect + crop every image; returns number of crops written.

    Drop-tolerant (VERDICT r4 #3 — a tunnel drop 53 min into the r4 track's
    30k crop sweep cost the whole stage): files run in ``slab``-sized slabs;
    after each slab the crops are on disk and a progress sentinel
    (.crop_progress_<pid>.json in ``dest_dir``) records the cursor + the
    running crop index.  On a transport drop the backend resets in-process
    and ``build_detector()`` rebuilds the engine; a killed process resumes
    from the sentinel on re-run.  Re-running a partially-written slab
    regenerates the SAME filenames (the crop index is restored to the slab
    start), so interrupted writes overwrite rather than duplicate.  The
    sentinel is removed on completion — the orchestrator's crop.done stays
    the only completion signal.

    Multi-host: source files shard across processes; the running crop index
    strides by process count so names stay unique on the shared FS (the
    index is a uniquifier, not data — O-IS/O-FID walk the folder)."""
    import hashlib
    import json

    from tise_tpu.core.backend import is_backend_drop, reset_backend
    from tise_tpu.parallel import multihost

    files = [os.path.join(src_dir, f) for f in sorted(os.listdir(src_dir))]
    files, _ = multihost.shard_items(files)
    os.makedirs(dest_dir, exist_ok=True)
    count, step = multihost.process_index(), multihost.process_count()
    written = 0
    start = 0

    fp = hashlib.sha256(("\0".join(files) + f"|{step}").encode()).hexdigest()
    prog_path = os.path.join(dest_dir, f".crop_progress_{multihost.process_index()}.json")
    if progress and os.path.exists(prog_path):
        try:
            with open(prog_path) as f:
                st = json.load(f)
            if st.get("fingerprint") == fp:
                start, count, written = st["start"], st["count"], st["written"]
                print(f"[crop_objects] resuming at file {start}/{len(files)}", flush=True)
        except Exception:  # noqa: BLE001 — torn sentinel: start over
            pass

    def do_slab(slab_files) -> None:
        nonlocal count, written
        preds = detector(slab_files)
        for path in slab_files:
            names, ids, boxes = preds[path]
            if len(ids) == 0:
                continue
            with Image.open(path) as im:
                im = im.convert("RGB")
                stem = os.path.basename(path).split(".")[0]
                for cls_id, box in zip(ids, boxes):
                    x1, y1, x2, y2 = (float(v) for v in box)
                    if x2 - x1 < 1.0 or y2 - y1 < 1.0:  # degenerate box; PIL can't save it
                        continue
                    crop = im.crop((x1, y1, x2, y2))
                    cls_name = class_names[int(cls_id)]
                    crop.save(os.path.join(dest_dir, f"{stem}_{cls_name}_{count}.png"))
                    count += step
                    written += 1

    resets = 0
    while start < len(files):
        slab_files = files[start : start + slab]
        state_before = (count, written)
        try:
            do_slab(slab_files)
        except Exception as e:  # noqa: BLE001 — filtered to transport errors below
            if not progress or resets >= max_resets or not is_backend_drop(e):
                raise
            resets += 1
            print(f"[crop_objects] backend drop at file {start}/{len(files)} ({e}); "
                  f"reset {resets}/{max_resets}", flush=True)
            reset_backend()
            if build_detector is not None:
                detector = build_detector()
            count, written = state_before  # replay the slab: identical names
            continue
        start += len(slab_files)
        if progress:
            tmp = prog_path + ".tmp"
            with open(tmp, "w") as f:
                json.dump({"fingerprint": fp, "start": start, "count": count,
                           "written": written}, f)
            os.replace(tmp, prog_path)
    if progress and os.path.exists(prog_path):
        os.remove(prog_path)

    total = multihost.allgather_rows(
        np.asarray([written]), np.asarray([multihost.process_index()]), multihost.process_count()
    )
    multihost.barrier("crop_objects_done")
    return int(total.sum())


def main(argv=None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--source_image_dir", default="", type=str)
    p.add_argument("--saved_cropped_object_dir", default="", type=str)
    p.add_argument("--weights", type=str, default=None, help="Mask R-CNN weights")
    p.add_argument("--aspect-resize", action="store_true",
                   help="detectron2 ResizeShortestEdge(800/1333) with static shape "
                        "buckets for non-square sources (default: square 800 resize, "
                        "exact for TISE's square generated images)")
    p.add_argument("--roi-sampling", type=int, default=2, choices=(1, 2),
                   help="ROIAlign samples per bin per dim; 1 = fast sweep mode "
                        "(~4x less ROIAlign HBM traffic, detection agreement "
                        "quantified in tests/test_detection.py), 2 = default "
                        "detectron2-adaptive-grid approximation")
    p.add_argument("--proposals", type=int, default=1000,
                   help="post-NMS RPN proposals kept (detectron2 "
                        "POST_NMS_TOPK_TEST default 1000); the ROIAlign gather "
                        "scales linearly with it — 256 is the opt-in sweep "
                        "setting (detection agreement quantified in "
                        "tests/test_detection.py)")
    add_precision_flag(p)
    add_distributed_flags(p)
    args = p.parse_args(argv)
    configure_precision(args.precision)
    maybe_init_distributed(args)

    from tise_tpu.backbones.detection import predictor as det

    build = lambda: det.make_folder_detector(  # noqa: E731 — rebuilt after a backend reset
        args.weights, aspect_resize=args.aspect_resize, precision=args.precision,
        roi_sampling=args.roi_sampling, proposals=args.proposals,
    )
    n = crop_folder(build(), args.source_image_dir, args.saved_cropped_object_dir,
                    build_detector=build)
    print(f"wrote {n} crops to {args.saved_cropped_object_dir}")


if __name__ == "__main__":
    main()
