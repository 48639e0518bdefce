"""O-FID — FID over detector crops with the 80-class fine-tuned backbone.

The reference's O-FID scripts are byte-identical to the FID slice except the
backbone checkpoint (object_fidelity/O-FID/inception.py:58-64 loads the
80-class fine-tune) and the result label (O-FID/fid_score.py:220-222); the
cached real statistics are ``cropped_object_coco.npz``.  Here it is the same
engine as tise_tpu/metrics/fid.py with the fine-tuned weights.
"""

from __future__ import annotations

import argparse

from tise_tpu.core import io as result_io
from tise_tpu.core.config import (add_distributed_flags, add_precision_flag,
                                  configure_precision, maybe_init_distributed)
from tise_tpu.metrics import fid as fid_metric


def main(argv=None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("--dims", type=int, default=2048, choices=[2048])
    p.add_argument("-c", "--gpu", default="", type=str, help="ignored (TPU build)")
    p.add_argument("--path1", type=str, required=True)
    p.add_argument("--path2", type=str, default="")
    p.add_argument("--saved_file", type=str, default="")
    p.add_argument(
        "--save_stats",
        type=str,
        default="",
        help="write mu/sigma of --path1 (a crops folder) to this npz instead of computing a distance",
    )
    p.add_argument("--weights", type=str, default=None, help="80-class fine-tuned inception (.pth/.npz)")
    p.add_argument("--legacy-compat", action="store_true")
    p.add_argument("--sqrtm", type=str, default="scipy", choices=["scipy", "eigh", "ns", "ns-pallas"])
    p.add_argument("--snapshot_dir", type=str, default="",
                   help="drop-tolerant extraction snapshots (see fid --snapshot_dir)")
    add_precision_flag(p)
    add_distributed_flags(p)
    args = p.parse_args(argv)
    configure_precision(args.precision)
    maybe_init_distributed(args)

    def load_80(path):
        from tise_tpu.core import weights as weights_io

        if path is None:
            raise SystemExit("O-FID needs the 80-class fine-tuned inception weights (--weights)")
        return weights_io.load_inception_params(path, num_classes=80)

    if args.save_stats:
        fid_metric.save_statistics(
            args.path1,
            args.save_stats,
            load_80(args.weights),
            args.batch_size,
            legacy_compat=args.legacy_compat,
            fast=args.precision == "fast",
        )
        print(f"stats: {args.save_stats}")
        return
    if not args.path2:
        p.error("--path2 is required (or pass --save_stats to cache statistics of --path1)")
    params = None
    if not (args.path1.endswith(".npz") and args.path2.endswith(".npz")):
        params = load_80(args.weights)

    value = fid_metric.calculate_fid_given_paths(
        args.path1,
        args.path2,
        params,
        args.batch_size,
        legacy_compat=args.legacy_compat,
        sqrtm_method=args.sqrtm,
        fast=args.precision == "fast",
        snapshot_dir=args.snapshot_dir,
    )
    if args.saved_file:
        result_io._write(args.saved_file, f"O-FID: {value}")
    print(f"O-FID: {value}")


if __name__ == "__main__":
    main()
