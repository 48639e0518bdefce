"""Collect a finished whole-track run into a committable artifact directory.

The 30k-scale track runs (tools/track_bench.py) leave their outputs under
/tmp; this copies the durable pieces — per-stage timings, assembled metrics,
the methods JSON, the run summary — into ``artifacts/<name>/`` and renders
the ranking table with the synthetic method ranked among the reference's
published methods (ranking_scores/methods/*.json), proving the full
README.md:178-433 workload runs end to end as one command.

    python tools/collect_track_artifact.py --root /tmp/track30k \
        --summary /tmp/track_coco_r5.json --dest artifacts/track_coco_30k
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF_METHODS = "/root/reference/ranking_scores/methods"


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--root", required=True, help="track root (the --root given to track_bench)")
    p.add_argument("--summary", required=True, help="track_bench JSON summary line file")
    p.add_argument("--dest", required=True, help="artifact directory to create")
    p.add_argument("--method_name", default="synthetic30k")
    args = p.parse_args()

    res = os.path.join(args.root, "results", args.method_name)
    os.makedirs(args.dest, exist_ok=True)

    for name in ("timings.json", "metrics.json", "run_config.json"):
        shutil.copy(os.path.join(res, name), os.path.join(args.dest, name))
    methods_json = os.path.join(args.root, "results", "methods", f"{args.method_name}.json")
    have_methods = os.path.exists(methods_json)
    if have_methods:
        shutil.copy(methods_json, os.path.join(args.dest, f"methods_{args.method_name}.json"))
    shutil.copy(args.summary, os.path.join(args.dest, "summary.json"))

    if have_methods:
        # rank the synthetic method among the reference's published methods
        combined = os.path.join(args.dest, "_methods_combined")
        os.makedirs(combined, exist_ok=True)
        for f in os.listdir(REF_METHODS):
            shutil.copy(os.path.join(REF_METHODS, f), combined)
        shutil.copy(methods_json, combined)
        from tise_tpu.ranking import ranking_score

        table = os.path.join(args.dest, "benchmark_results.txt")
        ranking_score.main(["--methods_dir", combined, "--output", table])
        shutil.rmtree(combined)
        print(f"[collect] ranking table -> {table}")
    print(f"[collect] artifact -> {args.dest}")


if __name__ == "__main__":
    main()
