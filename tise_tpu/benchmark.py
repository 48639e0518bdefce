"""One-command bag-of-metrics benchmark runner (layers L3+L4 glue).

The reference makes users run nine metric CLIs by hand (README.md:178-433),
hand-copy each printed value into ``ranking_scores/methods/<name>.json``
(ranking_score.py:10-23), and then run the ranking script.  This orchestrator
runs every stage of a track over the standard data/weights layout (the layout
``tise_tpu.core.download`` produces — identical to the reference's), parses
the stage result files back (core/io readers), assembles the methods JSON
with the reference's scaling (RP/SOA/PA x100, 2-decimal rounding, matching
ranking_scores/methods/*.json), and renders the ranking table:

    python -m tise_tpu.benchmark --track coco --method_name my_model \
        --images gen/coco --soa_images gen/soa --pa_images gen/pa \
        --data_root data --weights_root weights --output_root results \
        [--precision fast] [--only fid,is_star] [--skip soa]

Stages whose inputs (weights, caption pickles, reference npz stats, image
dirs) are missing are SKIPPED with a note instead of failing the run, so a
partial layout still produces every computable metric; the ranking step runs
only when all nine COCO values exist.  Exact-parity validation of individual
metrics against the reference lives in tools/parity_check.py; this module is
the production driver.
"""

from __future__ import annotations

import argparse
import json
import os
from dataclasses import dataclass, field
from typing import Callable, Dict, List, Optional, Sequence

from tise_tpu.core import io as result_io

#: relative paths under --data_root / --weights_root, mirroring the layout
#: the reference's download scripts create (core/download.py BUNDLES) plus
#: the converted-weight filenames tools/parity_check.py documents.
DATA = {
    "coco_fid_stats": "image_realism/FID/data/coco_val.npz",
    "cub_fid_stats": "image_realism/FID/data/bird_val.npz",
    "o_fid_stats": "object_fidelity/O-FID/data/cropped_object_coco.npz",
    "coco_rp_captions": "text_relevance/captions/COCO_RP_captions.pkl",
    "cub_rp_captions": "text_relevance/captions/CUB_RP_captions.pkl",
    "pa_captions": "positional_alignment/captions/PA_input_captions.pkl",
    "ca_captions": "counting_alignment/captions/CA_input_captions.pkl",
    "cub_captions_pickle": "text_to_images_models/data/birds/captions.pickle",
}
WEIGHTS = {
    # torchvision InceptionV3 (FID backbone) — export via tools/parity_check.py notes
    "inception": "inception_v3_torchvision.pth",
    # frozen 2015 GraphDef weights (IS* COCO) — tools/convert_tf_inception.py
    "inception_2015": "inception_2015.npz",
    # TF-slim 50-class CUB checkpoint (IS* CUB) — tools/convert_tf_inception.py
    "inception_cub": "birds_valid299.npz",
    # 80-class fine-tuned torchvision inception (O-IS / O-FID)
    "inception_80": "object_fidelity/weights/inceptionv3_fine_to_with_80_coco_classes.pth",
    "clip": "clip_vit_b32.pt",
    "clip_bpe": "bpe_simple_vocab_16e6.txt.gz",
    "detector_soa": "semantic_object_accuracy/weights/coco_mask_rcnn_detector.pkl",
    "detector_crop": "object_fidelity/weights/model_final_f10217.pkl",
    "counter": "counting_alignment/weights/coco14.pt",
    "damsm_text": "text_to_images_models/DAMSMencoders/bird/text_encoder200.pth",
    "damsm_image": "text_to_images_models/DAMSMencoders/bird/image_encoder200.pth",
}


def resolve_weight(path: str) -> str:
    """Accept a converted ``.npz`` sibling of the documented checkpoint name
    (weight converters write <stem>.npz next to — or instead of — the
    torch/TF original; every metric CLI loads either format)."""
    if os.path.exists(path):
        return path
    alt = os.path.splitext(path)[0] + ".npz"
    return alt if os.path.exists(alt) else path


@dataclass
class Stage:
    """One metric run: inputs to check, CLI argv to run, result parse."""

    name: str
    inputs: List[str]  # paths that must exist
    run: Callable[[], None]
    parse: Callable[[], Dict[str, float]]
    after: Sequence[str] = ()  # stages that must have completed first
    #: path the stage produces (result txt / crops dir); with ``--resume``,
    #: a stage whose result already exists is parsed without re-running —
    #: a killed multi-hour 30k track must not repay completed stages.
    #: Complements SOA's internal per-label detection resume (soa.py:74,
    #: mirroring the reference convention SOA.py:77-79).
    result: str = ""


@dataclass
class Plan:
    stages: List[Stage] = field(default_factory=list)
    #: per-stage wall-clock of the completed stages, filled by execute()
    timings: Dict[str, float] = field(default_factory=dict)

    def execute(self, resume: bool = False) -> Dict[str, float]:
        import time

        values: Dict[str, float] = {}
        done = set()
        ran = set()  # stages that actually EXECUTED this run (not resumed)
        for st in self.stages:
            missing = [p for p in st.inputs if not p or not os.path.exists(p)]
            failed_deps = [d for d in st.after if d not in done]
            if missing or failed_deps:
                why = "; ".join(
                    (["missing: " + ", ".join(missing)] if missing else [])
                    + (["needs: " + ", ".join(failed_deps)] if failed_deps else [])
                )
                print(f"[benchmark] SKIP {st.name} ({why})")
                continue
            # a resumed result is only trustworthy if every upstream stage it
            # consumed was itself resumed: when a dependency re-ran this run
            # (e.g. crop regenerated the crops dir) a pre-existing o_is/o_fid
            # result was computed over the OLD inputs — re-run it (ADVICE r4)
            stale_deps = [d for d in st.after if d in ran]
            if resume and stale_deps:
                print(f"[benchmark] RESUME {st.name} skipped (upstream re-ran: "
                      f"{', '.join(stale_deps)})")
            if resume and not stale_deps and st.result and os.path.exists(st.result):
                try:
                    values.update(st.parse())
                    done.add(st.name)
                    print(f"[benchmark] RESUME {st.name} (parsed existing {st.result})")
                    continue
                except Exception as e:  # noqa: BLE001 — stale/partial result: re-run it
                    print(f"[benchmark] RESUME {st.name} unparseable ({e}); re-running")
            print(f"[benchmark] RUN  {st.name}")
            t0 = time.perf_counter()
            try:
                st.run()
                values.update(st.parse())
                done.add(st.name)
                ran.add(st.name)
                self.timings[st.name] = round(time.perf_counter() - t0, 2)
                print(f"[benchmark] DONE {st.name} in {self.timings[st.name]:.1f}s")
            except Exception as e:  # noqa: BLE001 — one stage must not kill the run
                print(f"[benchmark] FAIL {st.name}: {type(e).__name__}: {e}")
        return values


def _coco_plan(args, out: str) -> Plan:
    """The nine-metric COCO track (README.md:244-433 order)."""
    from tise_tpu.metrics import ca, crop_objects, fid, is_star, o_fid, o_is, pa, rp_coco, soa

    d = lambda key: os.path.join(args.data_root, DATA[key])  # noqa: E731
    w = lambda key: resolve_weight(os.path.join(args.weights_root, WEIGHTS[key]))  # noqa: E731
    prec = ["--precision", args.precision]
    # CLI flag-spelling parity: the FID slices keep the reference's
    # dashed --batch-size (fid_score.py:53), everything else underscores
    bs = ["--batch-size", str(args.batch_size)] if args.batch_size else []
    bs_u = ["--batch_size", str(args.batch_size)] if args.batch_size else []
    # detection fast-preset knobs (soa.py / crop_objects.py share them);
    # argparse defaults match, so pass only when overridden
    det = (["--roi-sampling", str(args.roi_sampling)] if args.roi_sampling != 2 else []) + (
        ["--proposals", str(args.proposals)] if args.proposals != 1000 else []
    )
    crops_dir = os.path.join(out, "crops")
    plan = Plan()

    def txt(name: str) -> str:
        return os.path.join(out, f"{name}.txt")

    plan.stages.append(
        Stage(
            "fid",
            [args.images, d("coco_fid_stats"), w("inception")],
            lambda: fid.main(
                ["--path1", d("coco_fid_stats"), "--path2", args.images,
                 "--saved_file", txt("fid"), "--weights", w("inception"),
                 "--snapshot_dir", out] + prec + bs
            ),
            lambda: {"FID": result_io.read_fid_result(txt("fid"))},
            result=txt("fid"),
        )
    )
    plan.stages.append(
        Stage(
            "is_star",
            [args.images, w("inception_2015")],
            lambda: is_star.main(
                ["--image_folder", args.images, "--flavor", "coco",
                 "--saved_file", txt("is_star"), "--weights", w("inception_2015"),
                 "--snapshot_file", os.path.join(out, "is_star.snapshot.npz")] + prec + bs_u
            ),
            lambda: {"IS*": result_io.read_is_coco_result(txt("is_star"))[0]},
            result=txt("is_star"),
        )
    )
    plan.stages.append(
        Stage(
            "rp",
            [args.images, d("coco_rp_captions"), w("clip"), w("clip_bpe")],
            lambda: rp_coco.main(
                ["--image_dir", args.images, "--rp_input_file", d("coco_rp_captions"),
                 "--saved_file_path", txt("rp"), "--weights", w("clip"),
                 "--bpe_path", w("clip_bpe"),
                 "--snapshot_file", os.path.join(out, "rp.snapshot.npz")] + prec + bs_u
            ),
            lambda: {"RP": result_io.read_rp_coco_result(txt("rp"))[0] * 100},
            result=txt("rp"),
        )
    )
    plan.stages.append(
        Stage(
            "soa",
            [args.soa_images, w("detector_soa")],
            lambda: soa.main(
                ["--images", args.soa_images, "--detected_results",
                 os.path.join(out, "soa_detections"), "--saved_file", txt("soa"),
                 "--weights", w("detector_soa")] + prec + det
            ),
            lambda: dict(
                zip(("SOA-C", "SOA-I"),
                    [v * 100 for v in result_io.read_soa_result(txt("soa"))[:2]])
            ),
            result=txt("soa"),
        )
    )
    plan.stages.append(
        Stage(
            "pa",
            [args.pa_images, d("pa_captions"), w("clip"), w("clip_bpe")],
            lambda: pa.main(
                ["--image_dir", args.pa_images, "--pa_input_file", d("pa_captions"),
                 "--saved_file_path", txt("pa"), "--weights", w("clip"),
                 "--bpe_path", w("clip_bpe"),
                 "--snapshot_file", os.path.join(out, "pa.snapshot.npz")] + prec + bs_u
            ),
            lambda: {"PA": result_io.read_pa_result(txt("pa")) * 100},
            result=txt("pa"),
        )
    )
    plan.stages.append(
        Stage(
            "ca",
            [args.images, d("ca_captions"), w("counter")],
            lambda: ca.main(
                ["--image_dir", args.images, "--ct_input_file", d("ca_captions"),
                 "--result_file", txt("ca"), "--weights", w("counter"),
                 "--snapshot_file", os.path.join(out, "ca.snapshot.npz")] + prec + bs_u
            ),
            lambda: {"CA": result_io.read_ca_result(txt("ca"))},
            result=txt("ca"),
        )
    )

    def run_crop() -> None:
        crop_objects.main(
            ["--source_image_dir", args.images,
             "--saved_cropped_object_dir", crops_dir,
             "--weights", w("detector_crop")] + prec + det
        )
        # completion sentinel: a killed run leaves a partial crops dir, which
        # --resume must NOT trust (unlike the txt results, the dir carries no
        # done/undone signal of its own)
        with open(crop_done, "w") as f:
            f.write("ok\n")

    crop_done = os.path.join(out, "crop.done")
    plan.stages.append(
        Stage(
            "crop",
            [args.images, w("detector_crop")],
            run_crop,
            lambda: {},
            result=crop_done,
        )
    )
    plan.stages.append(
        Stage(
            "o_is",
            [w("inception_80")],
            lambda: o_is.main(
                ["--image_dir", crops_dir, "--saved_file", txt("o_is"),
                 "--weights", w("inception_80"),
                 "--snapshot_file", os.path.join(out, "o_is.snapshot.npz")] + prec + bs_u
            ),
            lambda: {"O-IS": result_io.read_o_is_result(txt("o_is"))[0]},
            after=("crop",),
            result=txt("o_is"),
        )
    )
    plan.stages.append(
        Stage(
            "o_fid",
            [d("o_fid_stats"), w("inception_80")],
            lambda: o_fid.main(
                ["--path1", d("o_fid_stats"), "--path2", crops_dir,
                 "--saved_file", txt("o_fid"), "--weights", w("inception_80"),
                 "--snapshot_dir", out] + prec + bs
            ),
            lambda: {"O-FID": result_io.read_fid_result(txt("o_fid"))},
            after=("crop",),
            result=txt("o_fid"),
        )
    )
    return plan


def _cub_plan(args, out: str) -> Plan:
    """The CUB track: IS*, FID, RP(DAMSM) (README.md:178-243)."""
    from tise_tpu.metrics import fid, is_star, rp_cub

    d = lambda key: os.path.join(args.data_root, DATA[key])  # noqa: E731
    w = lambda key: resolve_weight(os.path.join(args.weights_root, WEIGHTS[key]))  # noqa: E731
    prec = ["--precision", args.precision]
    bs = ["--batch-size", str(args.batch_size)] if args.batch_size else []
    bs_u = ["--batch_size", str(args.batch_size)] if args.batch_size else []
    plan = Plan()

    def txt(name: str) -> str:
        return os.path.join(out, f"{name}.txt")

    plan.stages.append(
        Stage(
            "fid",
            [args.images, d("cub_fid_stats"), w("inception")],
            lambda: fid.main(
                ["--path1", d("cub_fid_stats"), "--path2", args.images,
                 "--saved_file", txt("fid"), "--weights", w("inception"),
                 "--snapshot_dir", out] + prec + bs
            ),
            lambda: {"FID": result_io.read_fid_result(txt("fid"))},
            result=txt("fid"),
        )
    )
    plan.stages.append(
        Stage(
            "is_star",
            [args.images, w("inception_cub")],
            lambda: is_star.main(
                ["--image_folder", args.images, "--flavor", "cub",
                 "--saved_file", txt("is_star"), "--weights", w("inception_cub"),
                 "--snapshot_file", os.path.join(out, "is_star.snapshot.npz")] + prec + bs_u
            ),
            lambda: {"IS*": result_io.read_is_result(txt("is_star"))[0]},
            result=txt("is_star"),
        )
    )
    plan.stages.append(
        Stage(
            "rp",
            [args.images, d("cub_rp_captions"), d("cub_captions_pickle"),
             w("damsm_text"), w("damsm_image")],
            lambda: rp_cub.main(
                ["--image_dir", args.images, "--rp_input_file", d("cub_rp_captions"),
                 "--saved_file_path", txt("rp"), "--captions_pickle", d("cub_captions_pickle"),
                 "--text_encoder", w("damsm_text"), "--image_encoder", w("damsm_image"),
                 "--snapshot_file", os.path.join(out, "rp.snapshot.npz")] + prec + bs_u
            ),
            lambda: {"RP": result_io.read_rp_cub_result(txt("rp"))[0] * 100},
            result=txt("rp"),
        )
    )
    return plan


def assemble_methods_json(values: Dict[str, float], path: str) -> bool:
    """Write the ranking methods JSON (reference key order and 2-decimal
    rounding, ranking_scores/methods/*.json).  Returns True when all nine
    metrics are present (only then can the method be ranked)."""
    from tise_tpu.ranking.ranking_score import METRICS

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    rounded = {m: round(values[m], 2) for m in METRICS if m in values}
    with open(path, "w") as f:
        json.dump(rounded, f)
    return len(rounded) == len(METRICS)


def main(argv: Optional[Sequence[str]] = None) -> Dict[str, float]:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--track", choices=("coco", "cub"), required=True)
    p.add_argument("--method_name", type=str, required=True, help="row name in the ranking table")
    p.add_argument("--images", type=str, required=True, help="flat <caption_id>.png dir")
    p.add_argument("--soa_images", type=str, default="", help="(coco) label_XX folder root")
    p.add_argument("--pa_images", type=str, default="", help="(coco) positional-word folder root")
    p.add_argument("--data_root", type=str, default="data")
    p.add_argument("--weights_root", type=str, default="weights")
    p.add_argument("--output_root", type=str, default="results")
    p.add_argument("--methods_dir", type=str, default=None,
                   help="existing ranking methods/*.json dir to rank against "
                        "(the new method's JSON is added to it)")
    p.add_argument("--precision", choices=("highest", "fast"), default="highest")
    p.add_argument("--batch_size", type=int, default=0,
                   help="override every stage's batch size (0 = per-CLI defaults); "
                        "the detection stages size their own micro-batches")
    p.add_argument("--roi-sampling", dest="roi_sampling", type=int, default=2, choices=(1, 2),
                   help="(coco) ROIAlign samples/bin for the soa+crop stages; 1 is the "
                        "~2x fast sweep preset (detection agreement tested, "
                        "tests/test_detection.py)")
    p.add_argument("--proposals", type=int, default=1000,
                   help="(coco) post-NMS RPN proposals for the soa+crop stages; 256 is "
                        "the fast sweep preset")
    p.add_argument("--only", type=str, default="", help="comma-separated stage names to run")
    p.add_argument("--skip", type=str, default="", help="comma-separated stage names to skip")
    p.add_argument("--resume", action="store_true",
                   help="parse stages whose result file already exists under "
                        "--output_root instead of re-running them (unparseable "
                        "results re-run; crop uses a crop.done sentinel)")
    args = p.parse_args(argv)

    # persistent compile cache: a whole-track run compiles every backbone
    # once; a relaunched (--resume) run after a tunnel drop should pay
    # 13-15 s per program, not the 1-5 min cold compile (bench.py sections
    # already do this; the orchestrator was the last cold caller)
    from tise_tpu.core import compile_cache

    compile_cache.enable()

    out = os.path.join(args.output_root, args.method_name)
    os.makedirs(out, exist_ok=True)
    # stamp the result-affecting flags so --resume cannot silently mix stage
    # results computed under two configurations into one metrics.json
    # (ADVICE r4); batch_size is excluded — values are batch-invariant by
    # design (padded tails masked, tests/test_metrics_cli.py)
    effective = {"track": args.track, "precision": args.precision,
                 "roi_sampling": args.roi_sampling, "proposals": args.proposals}
    config_path = os.path.join(out, "run_config.json")
    if args.resume and os.path.exists(config_path):
        with open(config_path) as f:
            prior = json.load(f)
        if prior != effective:
            diff = {k: (prior.get(k), effective[k])
                    for k in effective if prior.get(k) != effective[k]}
            raise SystemExit(
                f"[benchmark] --resume refused: existing results under {out} were "
                f"produced with different flags {diff} (prior, requested); use a "
                f"fresh --output_root/--method_name or delete the old results"
            )
    with open(config_path, "w") as f:
        json.dump(effective, f)
    plan = _coco_plan(args, out) if args.track == "coco" else _cub_plan(args, out)
    if args.only:
        keep = {s.strip() for s in args.only.split(",")}
        plan.stages = [s for s in plan.stages if s.name in keep]
    if args.skip:
        drop = {s.strip() for s in args.skip.split(",")}
        plan.stages = [s for s in plan.stages if s.name not in drop]

    values = plan.execute(resume=args.resume)
    print(f"[benchmark] values: {json.dumps(values)}")
    print(f"[benchmark] stage wall-clock (s): {json.dumps(plan.timings)}")
    with open(os.path.join(out, "metrics.json"), "w") as f:
        json.dump(values, f, indent=1)
    timings_path = os.path.join(out, "timings.json")
    if args.resume and os.path.exists(timings_path):
        # keep the prior run's wall-clocks for the stages resumed this run
        with open(timings_path) as f:
            plan.timings = {**json.load(f), **plan.timings}
    with open(timings_path, "w") as f:
        json.dump(plan.timings, f, indent=1)

    if args.track == "coco":
        methods_dir = args.methods_dir or os.path.join(args.output_root, "methods")
        complete = assemble_methods_json(
            values, os.path.join(methods_dir, f"{args.method_name}.json")
        )
        if complete:
            from tise_tpu.ranking import ranking_score

            table_path = os.path.join(args.output_root, "benchmark_results.txt")
            ranking_score.main(["--methods_dir", methods_dir, "--output", table_path])
            print(f"[benchmark] ranking table -> {table_path}")
        else:
            print("[benchmark] not all nine metrics computed; ranking skipped "
                  f"(methods JSON holds the partial set)")
    return values


if __name__ == "__main__":
    main()
