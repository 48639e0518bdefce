"""SOA — Semantic Object Accuracy (reference: semantic_object_accuracy/SOA.py).

Layout: 80 per-label folders ``label_XX_XX/`` of generated images
(README.md:117-135).  Stage 1 runs the detector over each folder and caches
``detected_<label>.pkl`` ({filename: [names, ids, boxes]}, SOA.py:86-107),
skipping folders whose pickle already exists (:77-79, resume).  Stage 2 is
pure host math:
  * per-label recall: fraction of images containing >=1 detection of the
    label (:110-123)
  * SOA-C = unweighted mean of per-label recalls (:126-132)
  * SOA-I = image-count-weighted mean (:135-144)
  * top/bot-40: labels sorted by image count, each half averaged /0.5*n
    (:147-165)
Label ids parse from the folder name ``label_XX[_XX]`` (util.py:16-22:
int(parts[1]) — the first number after "label").

The detector is pluggable: the TPU Mask R-CNN
(tise_tpu/backbones/detection) or any callable producing per-image
(names, ids, boxes); cached pickles from either backend are interchangeable
with the reference's.
"""

from __future__ import annotations

import argparse
import os
from typing import Callable, Dict, List, Sequence, Tuple

import numpy as np

from tise_tpu.core import io as result_io
from tise_tpu.core.config import (add_distributed_flags, add_precision_flag,
                                  configure_precision, maybe_init_distributed)

#: detector output per image: ([class names], [class ids], [xyxy boxes])
Detections = Tuple[List[str], List[int], List[np.ndarray]]
DetectorFn = Callable[[Sequence[str]], Dict[str, Detections]]


def label_from_filename(path: str) -> int:
    """Label id from a ``label_NN...`` path: the two characters after
    ``label_`` parsed as int, falling back to one (util.py:16-22)."""
    idx = path.find("label_")
    try:
        return int(path[idx + 6 : idx + 8])
    except ValueError:
        return int(path[idx + 6 : idx + 7])


def run_detection(
    images_root: str,
    detected_dir: str,
    detector: DetectorFn,
    *,
    expect_folders: int = 80,
    build_detector=None,
    max_resets: int = 2,
) -> None:
    """Stage 1: per-label detection sweeps with resume (SOA.py:45-107).

    Per-label pickles are the reference's own resume convention
    (SOA.py:77-79): a killed process repays at most one label on re-run.
    ``build_detector`` adds the in-process half (r5): on a transport drop
    the backend resets (core/backend.py), the engine rebuilds, and the
    current label retries — one soa invocation rides through drops."""
    dirs = [d for d in sorted(os.listdir(images_root)) if os.path.isdir(os.path.join(images_root, d))]
    if len(dirs) != expect_folders:
        print(
            f"WARNING: expected {expect_folders} label folders, found {len(dirs)} in {images_root}; "
            "results will not be conclusive."
        )
    os.makedirs(detected_dir, exist_ok=True)
    from tise_tpu.core.backend import is_backend_drop, reset_backend
    from tise_tpu.parallel import multihost

    # multi-host: label folders shard across processes (each on its local
    # mesh, pickles land on the shared FS); the barrier below makes stage 2
    # see every pickle regardless of which process wrote it
    dirs, _ = multihost.shard_items(dirs)
    resets = 0
    for d in dirs:
        out_pkl = os.path.join(detected_dir, f"detected_{d}.pkl")
        if os.path.isfile(out_pkl):
            print(f"Detection already run for {d}; skipping.")
            continue
        folder = os.path.join(images_root, d)
        files = [os.path.join(folder, f) for f in sorted(os.listdir(folder))]
        while True:
            try:
                preds = detector(files)
                break
            except Exception as e:  # noqa: BLE001 — filtered to transport errors below
                if build_detector is None or resets >= max_resets or not is_backend_drop(e):
                    raise
                resets += 1
                print(f"[soa] backend drop on {d} ({e}); reset {resets}/{max_resets}",
                      flush=True)
                reset_backend()
                detector = build_detector()
        output: Dict[str, Detections] = {}
        for path, det in preds.items():
            names, ids, boxes = det
            if len(ids) > 0:
                output[os.path.basename(path)] = [list(names), list(ids), list(boxes)]
        result_io.save_pickle(out_pkl, output)
    multihost.barrier("soa_detection_done")


def recall_for_label(detections: Dict[str, Detections], label: int) -> Tuple[float, int, int]:
    """(accuracy, recognized, total): images with >=1 detection of ``label``
    (SOA.py:110-123)."""
    total = len(detections)
    if total == 0:
        return 0.0, 0, 0
    recognized = 0
    for det in detections.values():
        if any(int(c) == label for c in det[1]):
            recognized += 1
    return recognized / total, recognized, total


def soa_scores(results: Dict[int, Dict[str, float]]) -> Tuple[float, float, float, float]:
    """(SOA-C, SOA-I, top40, bot40) from per-label {accuracy, images_total}."""
    labels = list(results.keys())
    n = len(labels)
    soa_c = sum(results[l]["accuracy"] for l in labels) / n
    total_images = sum(results[l]["images_total"] for l in labels)
    soa_i = sum(results[l]["images_total"] * results[l]["accuracy"] for l in labels) / total_images
    by_count = sorted(labels, key=lambda l: results[l]["images_total"])
    bot = sum(results[l]["accuracy"] for l in by_count[:40])
    top = sum(results[l]["accuracy"] for l in by_count[40:])
    return soa_c, soa_i, top / (0.5 * n), bot / (0.5 * n)


def calc_soa(
    detected_dir: str, saved_file: str, *, write: bool = True
) -> Tuple[float, float, float, float]:
    """Stage 2 (SOA.py:168-216): aggregate cached detection pickles.

    ``write=False`` computes/prints without touching the result files —
    under multi-host every process aggregates (identical inputs via the
    shared FS) but only process 0 may write, or the concurrent truncating
    writes race and can tear the pickle."""
    files = [
        os.path.join(detected_dir, f)
        for f in os.listdir(detected_dir)
        if f.startswith("detected_") and f.endswith(".pkl")
    ]
    results: Dict[int, Dict[str, float]] = {}
    for path in files:
        dets = result_io.load_pickle(path)
        label = label_from_filename(path)
        acc, recognized, total = recall_for_label(dets, label)
        results[label] = {"accuracy": acc, "images_recognized": recognized, "images_total": total}
    soa_c, soa_i, top40, bot40 = soa_scores(results)
    print(f"Class average accuracy for all classes (SOA-C) is: {soa_c:6.4f}")
    print(f"Image weighted average accuracy (SOA-I) is: {soa_i:6.4f}")
    print(f"Top40 / Bot40: {top40:6.4f} / {bot40:6.4f}")
    if write:
        result_io.save_pickle(os.path.join(detected_dir, "result_file.pkl"), results)
        if saved_file:
            result_io.write_soa_result(saved_file, soa_c, soa_i, top40, bot40)
    return soa_c, soa_i, top40, bot40


def main(argv=None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--images", type=str, required=True, help="root of 80 per-label folders")
    p.add_argument("--detected_results", type=str, default="output")
    p.add_argument("--saved_file", type=str, default="")
    p.add_argument("--weights", type=str, default=None, help="Mask R-CNN weights (.pkl/.npz)")
    p.add_argument("--aspect-resize", action="store_true",
                   help="detectron2 ResizeShortestEdge(800/1333) with static shape "
                        "buckets for non-square sources (default: square 800 resize, "
                        "exact for TISE's square generated images)")
    p.add_argument("--skip_detection", action="store_true", help="aggregate cached pickles only")
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

    if not args.skip_detection:
        from tise_tpu.backbones.detection import predictor as det

        build = lambda: det.make_folder_detector(  # noqa: E731 — rebuilt after a backend reset
            args.weights, aspect_resize=args.aspect_resize, precision=args.precision,
            roi_sampling=args.roi_sampling, proposals=args.proposals,
        )
        run_detection(args.images, args.detected_results, build(), build_detector=build)
    from tise_tpu.parallel import multihost

    calc_soa(args.detected_results, args.saved_file, write=multihost.process_index() == 0)


if __name__ == "__main__":
    main()
