"""IS* — temperature-calibrated Inception Score (CUB and COCO tracks).

Reference behavior:
  * CUB  (image_realism/IS/bird/inception_score_star_bird.py): TF-slim
    InceptionV3 fine-tuned to 50 bird classes (+1 background class sliced off,
    :181-189), logits / 0.5980541706085205 (:192), softmax; images shuffled
    (:85, unseeded — here: seeded), floor(N/64) full batches (tail dropped,
    :83), 10 contiguous splits -> exp(mean KL) (:99-105).
  * COCO (image_realism/IS/coco/inception_score_star_coco.py): frozen 2015
    ImageNet graph; logits reconstructed as pool3 @ W (no bias, :104-105),
    logits / 0.9091363549232483 (:107), softmax over 1008 classes; NO shuffle,
    every image used (bs=1, :34), same split-KL (:54-58).
  * preprocess: PIL-bilinear resize to 299 on uint8 for both; CUB normalizes
    /127.5-1 in preprocess() (:64-70 bird) while COCO feeds raw float 0..255
    and the 2015 graph normalizes (v-128)/128 in-graph (coco :50,115-121 —
    recipe "is_star_2015"); COCO also needs pool_variant="tf2015" (TF avg-pool
    divisor + the graph's mixed_10 max-pool quirk), CUB pool_variant="tf".

The backbone is the slim-architecture InceptionV3
(tise_tpu/backbones/inception_slim.py) run as a sharded pjit forward.
"""

from __future__ import annotations

import argparse
from typing import Tuple

import numpy as np

from tise_tpu.core import io as result_io
from tise_tpu.core.config import (add_distributed_flags, add_precision_flag,
                                  configure_precision, maybe_init_distributed,
                                  IS_STAR_TEMPERATURE_COCO, IS_STAR_TEMPERATURE_CUB, NUM_SPLITS)
from tise_tpu.core.data import ImageFolderLoader
from tise_tpu.metrics.extractor import BatchedExtractor
from tise_tpu.ops import kl


def compute_is_star(
    image_dir: str,
    extractor: BatchedExtractor,
    *,
    flavor: str,
    batch_size: int = 64,
    splits: int = NUM_SPLITS,
    seed: int = 0,
    logits_key: str = "logits",
    snapshot_path: str = "",
    build_extractor=None,
) -> Tuple[float, float]:
    """Run the IS* pipeline over a folder of generated images.

    ``snapshot_path`` makes the extraction drop-tolerant (periodic
    rows+cursor snapshots + in-process backend reset, bit-equal result;
    extractor.run_resumable — the seeded shuffle makes the file order
    deterministic across resumes)."""
    if flavor not in ("cub", "coco"):
        raise ValueError(flavor)
    temperature = IS_STAR_TEMPERATURE_CUB if flavor == "cub" else IS_STAR_TEMPERATURE_COCO

    files = ImageFolderLoader.from_dir(image_dir, batch_size, 299).files
    if flavor == "cub":
        # reference shuffles the image order before batching and drops the
        # tail batch (inception_score_star_bird.py:83-94)
        rng = np.random.RandomState(seed)
        files = [files[i] for i in rng.permutation(len(files))]
        n_keep = (len(files) // batch_size) * batch_size
        files = files[:n_keep]
        drop_last = True
    else:
        drop_last = False

    if snapshot_path:
        from tise_tpu.metrics.extractor import run_resumable

        logits = run_resumable(
            build_extractor or (lambda: extractor),
            files,
            batch_size=batch_size,
            image_size=299,
            keys=(logits_key,),
            snapshot_path=snapshot_path,
        )[logits_key]
    else:
        loader = ImageFolderLoader(files, batch_size, 299, drop_last=drop_last)
        logits = extractor.run(loader, keys=(logits_key,))[logits_key]
    probs = np.asarray(kl.temperature_softmax(np.asarray(logits), temperature))
    return kl.inception_score(probs, splits)


def _build_extractor(weights: str, flavor: str, mesh=None) -> BatchedExtractor:
    from tise_tpu.backbones import inception_slim

    return inception_slim.make_logits_extractor(weights, flavor=flavor, mesh=mesh)


def main(argv=None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--image_folder", type=str, required=True)
    p.add_argument("--saved_file", type=str, default="")
    p.add_argument("--flavor", type=str, required=True, choices=["cub", "coco"])
    p.add_argument("--num_classes", type=int, default=50, help="(cub) fine-tuned classes")
    p.add_argument("--splits", type=int, default=NUM_SPLITS)
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--gpu", type=int, default=0, help="ignored (TPU build)")
    p.add_argument("--weights", type=str, required=True, help="converted slim checkpoint (.npz)")
    p.add_argument("--snapshot_file", type=str, default="",
                   help="make extraction drop-tolerant: periodic rows+cursor "
                        "snapshot at this path (bit-equal result; "
                        "extractor.run_resumable)")
    add_precision_flag(p)
    add_distributed_flags(p)
    args = p.parse_args(argv)
    configure_precision(args.precision)
    maybe_init_distributed(args)

    build = lambda: _build_extractor(args.weights, args.flavor)  # noqa: E731
    extractor = build()
    mean, std = compute_is_star(
        args.image_folder,
        extractor,
        flavor=args.flavor,
        batch_size=args.batch_size,
        splits=args.splits,
        seed=args.seed,
        snapshot_path=args.snapshot_file,
        build_extractor=build,
    )
    if args.saved_file:
        if args.flavor == "cub":
            result_io.write_is_result(args.saved_file, mean, std)
        else:
            result_io.write_is_coco_result(args.saved_file, mean, std)
    print("[Inception Score] mean: {:.5f} std: {:.5f}".format(mean, std))


if __name__ == "__main__":
    main()
