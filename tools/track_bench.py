"""Full synthetic COCO track through the orchestrator at ~30k-image scale
(VERDICT r4 item 3).

The reference makes users grind the nine COCO metrics by hand over 30k-80k
generated images (README.md:178-433).  ``tise_tpu.benchmark`` runs the whole
track in one command; this tool proves it at production scale: it builds a
synthetic 30k-scale layout (images + caption pickles + reference stats +
random-init converted weights under the documented names) and times every
stage via the orchestrator's per-stage wall-clock (results/<m>/timings.json).

Honesty notes for reading the numbers on THIS dev box (see CLAUDE.md):
  * the host has 1 CPU — PIL decode caps ~250 img/s at 256px and ~40 img/s
    at 800px, so decode-bound stages measure the box, not the design;
  * the axon tunnel uploads at ~40 MB/s — the 800px detection stages
    (58 GB of uint8 for 30k images) are upload-bound here; a real TPU host
    feeds PCIe rates.
  The per-stage table still proves the one-command story end to end at
  scale: stage gating (crop -> O-IS/O-FID), SOA sweep + aggregation, result
  parsing, methods-JSON assembly.

Layout generation writes a small pool of unique PNGs and byte-copies them to
the remaining names — decode work during the run is identical per file, and
nothing in the pipeline caches by content.

    python tools/track_bench.py [--root /tmp/track30k] [--flat 30208]
        [--soa-per-label 376] [--pa-per-phrase 500] [--ca 3000] [--smoke]
"""

from __future__ import annotations

import argparse
import gzip
import json
import os
import pickle
import shutil
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
sys.path.insert(0, os.path.join(_ROOT, "tests"))  # random_slim_vars (synthetic slim ckpt)

import numpy as np

_T0 = time.perf_counter()


def _mark(msg: str) -> None:
    print(f"[track_bench +{time.perf_counter() - _T0:7.1f}s] {msg}", file=sys.stderr, flush=True)


def _write_image_pool(pool_dir: str, n: int, size: int, seed: int) -> list:
    """n unique low-entropy PNGs (smooth gradients compress ~20x vs noise)."""
    from PIL import Image

    os.makedirs(pool_dir, exist_ok=True)
    rng = np.random.RandomState(seed)
    paths = []
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32) / size
    for i in range(n):
        a, b, c = rng.uniform(0.3, 3.0, 3)
        img = np.stack(
            [np.sin(a * 6 * xx + i * 0.1), np.cos(b * 6 * yy), np.sin(c * 6 * (xx + yy))], -1
        )
        arr = ((img * 0.5 + 0.5) * 255).astype(np.uint8)
        p = os.path.join(pool_dir, f"pool_{i}.png")
        Image.fromarray(arr).save(p)
        paths.append(p)
    return paths


def _fill_folder(d: str, names, pool: list) -> None:
    """Byte-copy pool images to <d>/<name>.png for every name."""
    os.makedirs(d, exist_ok=True)
    for j, name in enumerate(names):
        shutil.copyfile(pool[j % len(pool)], os.path.join(d, f"{name}.png"))


def build_layout(root: str, *, flat: int, soa_per_label: int, pa_per_phrase: int,
                 ca_items: int, img_size: int = 256, pool_n: int = 512) -> dict:
    """Build (idempotently) the full synthetic COCO track layout."""
    from tise_tpu import benchmark
    from tise_tpu.core import weights as wio

    spec = dict(flat=flat, soa=soa_per_label, pa=pa_per_phrase, ca=ca_items, size=img_size)
    marker = os.path.join(root, "layout.json")
    if os.path.exists(marker):
        with open(marker) as f:
            if json.load(f) == spec:
                _mark("layout: reusing existing")
                return spec
        shutil.rmtree(root)
    os.makedirs(root, exist_ok=True)

    _mark(f"layout: image pool ({pool_n} unique {img_size}px PNGs)")
    pool = _write_image_pool(os.path.join(root, "pool"), pool_n, img_size, seed=0)

    ids = list(range(flat))
    _mark(f"layout: flat dir ({flat} images)")
    _fill_folder(os.path.join(root, "gen"), ids, pool)

    _mark(f"layout: SOA dirs (80 x {soa_per_label})")
    for lbl in range(80):
        _fill_folder(
            os.path.join(root, "soa", f"label_{lbl:02d}"),
            [f"{i}_2" for i in range(soa_per_label)], pool,
        )

    phrases = ["left", "right", "above", "below", "top", "bottom"]
    _mark(f"layout: PA dirs ({len(phrases)} x {pa_per_phrase})")
    for ph in phrases:
        _fill_folder(os.path.join(root, "pa", ph), range(pa_per_phrase), pool)

    # ---- caption pickles ----
    data = os.path.join(root, "data")

    def put(key, obj):
        path = os.path.join(data, benchmark.DATA[key])
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "wb") as f:
            pickle.dump(obj, f)

    _mark("layout: caption pickles")
    rng = np.random.RandomState(0)
    # RP: 30k items whose 99 mismatched captions come from the shared pool —
    # the real COCO_RP_captions.pkl shape (captions repeat across items)
    pool_caps = [f"a photo number {i} of something" for i in range(flat)]
    put("coco_rp_captions", [
        {"caption_id": i, "caption": pool_caps[i],
         "mismatched_captions": [pool_caps[j] for j in rng.randint(0, flat, 99)]}
        for i in ids
    ])
    put("pa_captions", {
        ph: [{"caption_id": i, "caption": f"a dog {ph} of a cat",
              "false_caption": f"a dog {phrases[(k + 1) % len(phrases)]} of a cat"}
             for i in range(pa_per_phrase)]
        for k, ph in enumerate(phrases)
    })
    put("ca_captions", [
        {"caption_id": int(i), "caption": "two dogs",
         "counting_info": {"dog": float(rng.randint(1, 5))}}
        for i in rng.choice(flat, size=ca_items, replace=False)
    ])

    _mark("layout: reference stats npz")
    a = rng.randn(2048, 64)
    sigma = (a @ a.T / 64 + np.eye(2048)).astype(np.float64)
    for key in ("coco_fid_stats", "o_fid_stats"):
        path = os.path.join(data, benchmark.DATA[key])
        os.makedirs(os.path.dirname(path), exist_ok=True)
        np.savez(path, mu=rng.randn(2048), sigma=sigma)

    # ---- weights (random init, converted-npz names; detectors as d2 pkl) ----
    # NOTE: build_layout is run in a --build-only CPU subprocess (main below):
    # jax_platforms=cpu must not leak into the TPU-driven orchestrator run,
    # and eager random_params through the tunnel would take minutes
    _mark("layout: weights (random init)")
    import jax

    from tf_slim_ref import random_slim_vars

    from tise_tpu.backbones import clip_vit, counter as counter_lib, inception_v3

    weights = os.path.join(root, "weights")

    def wpath(key, npz=True):
        rel = benchmark.WEIGHTS[key]
        if npz:
            rel = os.path.splitext(rel)[0] + ".npz"
        path = os.path.join(weights, rel)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        return path

    k = jax.random.PRNGKey(0)
    wio.save_pytree_npz(wpath("inception"), inception_v3.random_params(k))
    wio.save_pytree_npz(wpath("inception_80"), inception_v3.random_params(k, num_classes=80))
    wio.save_pytree_npz(wpath("clip"), clip_vit.random_params(k))
    slim = random_slim_vars(0, 51)
    slim2015 = {kk: v for kk, v in slim.items() if not kk.startswith("logits/")}
    slim2015["softmax/weights"] = (rng.randn(2048, 1008) * 0.05).astype(np.float32)
    np.savez(wpath("inception_2015"), **slim2015)
    wio.save_pytree_npz(
        wpath("counter"),
        counter_lib.FCResNet50PRM().init(k, np.zeros((1, 448, 448, 3), np.float32)),
    )
    d2 = _synth_detectron2_sd(np.random.RandomState(1))
    for key in ("detector_soa", "detector_crop"):
        with open(wpath(key, npz=False), "wb") as f:
            pickle.dump({"model": d2}, f)
    merges = ["#version: 0.2", "t h", "th e</w>", "p h", "ph o", "pho t", "phot o</w>",
              "d o", "do g</w>", "c a", "ca t</w>", "o f</w>", "a</w>"]
    with gzip.open(wpath("clip_bpe", npz=False), "wt", encoding="utf-8") as f:
        f.write("\n".join(merges + [""] * 5))

    with open(marker, "w") as f:
        json.dump(spec, f)
    _mark("layout: done")
    return spec


def _synth_detectron2_sd(rng) -> dict:
    """Random detectron2-named R50-FPN-RCNN state dict (same shape catalogue
    as tests/test_weight_converters.py::TestDetectron2Converter; kept in sync
    by the converter's own strict name mapping — unknown/missing keys raise).

    Detections are made GEOMETRY-DETERMINED rather than weight-random (a
    uniform cls bias cancels in softmax, and random logits give either 0 or
    ~100 detections/image — both unrealistic): the RPN delta bias blows every
    anchor up to ~the full image (dw=dh=4.0, under apply_deltas' ln(1000/16)
    clamp) so RPN NMS collapses the proposal set to ~1-2 near-identical
    boxes, and one foreground class gets cls bias +5 (softmax over 81 ->
    p=e^5/(e^5+80)=0.65 > the 0.5 test threshold, rcnn.py:91).  Result: ~1
    full-image crop per image — the O-IS/O-FID stages then run at the full
    30k-crop scale."""
    sd = {}

    def conv_bn(prefix, cin, cout, k):
        sd[f"{prefix}.weight"] = rng.randn(cout, cin, k, k).astype(np.float32) * 0.01
        sd[f"{prefix}.norm.weight"] = np.ones(cout, np.float32)
        sd[f"{prefix}.norm.bias"] = np.zeros(cout, np.float32)
        sd[f"{prefix}.norm.running_mean"] = np.zeros(cout, np.float32)
        sd[f"{prefix}.norm.running_var"] = np.ones(cout, np.float32)

    def conv(prefix, cin, cout, k):
        sd[f"{prefix}.weight"] = rng.randn(cout, cin, k, k).astype(np.float32) * 0.01
        sd[f"{prefix}.bias"] = np.zeros(cout, np.float32)

    def dense(prefix, cin, cout):
        sd[f"{prefix}.weight"] = rng.randn(cout, cin).astype(np.float32) * 0.01
        sd[f"{prefix}.bias"] = np.zeros(cout, np.float32)

    conv_bn("backbone.bottom_up.stem.conv1", 3, 64, 7)
    stages = {"res2": (64, 64, 256, 3), "res3": (256, 128, 512, 4),
              "res4": (512, 256, 1024, 6), "res5": (1024, 512, 2048, 3)}
    for name, (cin, w, cout, n) in stages.items():
        for i in range(n):
            p = f"backbone.bottom_up.{name}.{i}"
            conv_bn(f"{p}.conv1", cin if i == 0 else cout, w, 1)
            conv_bn(f"{p}.conv2", w, w, 3)
            conv_bn(f"{p}.conv3", w, cout, 1)
            if i == 0:
                conv_bn(f"{p}.shortcut", cin, cout, 1)
    for lvl, cin in zip(range(2, 6), (256, 512, 1024, 2048)):
        conv(f"backbone.fpn_lateral{lvl}", cin, 256, 1)
        conv(f"backbone.fpn_output{lvl}", 256, 256, 3)
    conv("proposal_generator.rpn_head.conv", 256, 256, 3)
    conv("proposal_generator.rpn_head.objectness_logits", 256, 3, 1)
    conv("proposal_generator.rpn_head.anchor_deltas", 256, 12, 1)
    # deterministic-detection biases (see docstring); delta channel layout is
    # anchor-major/delta-fastest (rcnn.py:193 reshape(-1, 4))
    sd["proposal_generator.rpn_head.objectness_logits.bias"] = np.full(3, 2.0, np.float32)
    sd["proposal_generator.rpn_head.anchor_deltas.bias"] = np.tile(
        np.asarray([0.0, 0.0, 4.0, 4.0], np.float32), 3
    )
    dense("roi_heads.box_head.fc1", 256 * 49, 1024)
    dense("roi_heads.box_head.fc2", 1024, 1024)
    dense("roi_heads.box_predictor.cls_score", 1024, 81)
    cls_bias = np.zeros(81, np.float32)
    cls_bias[7] = 5.0
    sd["roi_heads.box_predictor.cls_score.bias"] = cls_bias
    dense("roi_heads.box_predictor.bbox_pred", 1024, 320)
    return sd


def build_cub_layout(root: str, *, flat: int, img_size: int = 256,
                     pool_n: int = 512) -> dict:
    """Build (idempotently) the synthetic CUB track layout (README.md:178-243:
    the CUB track is FID + IS*(slim 50-class) + RP(DAMSM) over ~30k generated
    bird images; the reference's RP_cub legacy binning assumes exactly 30000
    items, RP_cub.py:153-156)."""
    from tise_tpu import benchmark
    from tise_tpu.core import weights as wio

    spec = dict(track="cub", flat=flat, size=img_size)
    marker = os.path.join(root, "layout.json")
    if os.path.exists(marker):
        with open(marker) as f:
            if json.load(f) == spec:
                _mark("layout: reusing existing")
                return spec
        shutil.rmtree(root)
    os.makedirs(root, exist_ok=True)

    _mark(f"layout: image pool ({pool_n} unique {img_size}px PNGs)")
    pool = _write_image_pool(os.path.join(root, "pool"), pool_n, img_size, seed=0)
    ids = list(range(flat))
    _mark(f"layout: flat dir ({flat} images)")
    _fill_folder(os.path.join(root, "gen"), ids, pool)

    data = os.path.join(root, "data")

    def put(key, obj):
        path = os.path.join(data, benchmark.DATA[key])
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "wb") as f:
            pickle.dump(obj, f)

    _mark("layout: caption pickles (DAMSM vocab)")
    rng = np.random.RandomState(0)
    colors = ["red", "blue", "black", "white", "brown", "grey", "yellow", "green"]
    parts = ["wing", "tail", "beak", "breast", "crown", "belly", "throat", "eye"]
    vocab = ["<end>", "this", "bird", "has", "a", "and", "with", "small", "large"] + colors + parts
    ixtoword = dict(enumerate(vocab))
    wordtoix = {w: i for i, w in ixtoword.items()}
    put("cub_captions_pickle", [None, None, ixtoword, wordtoix])

    def cap(r):
        return (f"this bird has a {colors[r % 8]} {parts[(r // 8) % 8]} and a "
                f"{colors[(r // 64) % 8]} {parts[(r // 512) % 8]}")

    # captions repeat across items like the real CUB_RP_captions.pkl (the
    # mismatched set is sampled from other items' captions)
    pool_caps = [cap(r) for r in rng.randint(0, 4096, flat)]
    put("cub_rp_captions", [
        {"caption_id": i, "caption": pool_caps[i],
         "mismatched_captions": [pool_caps[j] for j in rng.randint(0, flat, 99)]}
        for i in ids
    ])

    _mark("layout: reference stats npz")
    a = rng.randn(2048, 64)
    sigma = (a @ a.T / 64 + np.eye(2048)).astype(np.float64)
    path = os.path.join(data, benchmark.DATA["cub_fid_stats"])
    os.makedirs(os.path.dirname(path), exist_ok=True)
    np.savez(path, mu=rng.randn(2048), sigma=sigma)

    _mark("layout: weights (random init)")
    import jax

    from tf_slim_ref import random_slim_vars

    from tise_tpu.backbones import damsm, inception_v3

    weights = os.path.join(root, "weights")

    def wpath(key, npz=True):
        rel = benchmark.WEIGHTS[key]
        if npz:
            rel = os.path.splitext(rel)[0] + ".npz"
        path = os.path.join(weights, rel)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        return path

    k = jax.random.PRNGKey(0)
    wio.save_pytree_npz(wpath("inception"), inception_v3.random_params(k))
    np.savez(wpath("inception_cub"), **random_slim_vars(0, 51))
    caps = np.zeros((2, 8), np.int32)
    wio.save_pytree_npz(
        wpath("damsm_text"),
        damsm.RNNEncoder(ntoken=len(vocab)).init(k, caps, np.full((2,), 8)),
    )
    wio.save_pytree_npz(
        wpath("damsm_image"),
        damsm.CNNEncoder().init(k, np.zeros((1, 64, 64, 3), np.float32)),
    )

    with open(marker, "w") as f:
        json.dump(spec, f)
    _mark("layout: done")
    return spec


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--track", choices=("coco", "cub"), default="coco")
    p.add_argument("--root", type=str, default="/tmp/track30k")
    p.add_argument("--flat", type=int, default=30208)
    p.add_argument("--soa-per-label", type=int, default=376)
    p.add_argument("--pa-per-phrase", type=int, default=500)
    p.add_argument("--ca", type=int, default=3000)
    p.add_argument("--batch_size", type=int, default=256)
    p.add_argument("--only", type=str, default="")
    p.add_argument("--skip", type=str, default="")
    p.add_argument("--resume", action="store_true",
                   help="pass through to the orchestrator: parse existing stage "
                        "results instead of re-running (killed-run recovery)")
    p.add_argument("--smoke", action="store_true", help="tiny CPU-size layout + CPU run")
    p.add_argument("--build-only", action="store_true", help="(internal) build the layout on CPU and exit")
    args = p.parse_args()
    if args.track == "cub":
        if args.flat == 30208:
            args.flat = 30000  # the legacy-binning scale (RP_cub.py:153-156)
        if args.root == "/tmp/track30k":
            args.root = "/tmp/trackcub30k"
    if args.smoke:
        args.flat, args.soa_per_label, args.pa_per_phrase, args.ca = 24, 2, 3, 8
        args.batch_size = 4

    if args.build_only:
        import jax

        jax.config.update("jax_platforms", "cpu")
        if args.track == "cub":
            build_cub_layout(args.root, flat=args.flat)
        else:
            build_layout(args.root, flat=args.flat, soa_per_label=args.soa_per_label,
                         pa_per_phrase=args.pa_per_phrase, ca_items=args.ca)
        return

    import subprocess

    build_args = [sys.executable, os.path.abspath(__file__), "--build-only",
                  "--track", args.track, "--root", args.root, "--flat", str(args.flat),
                  "--soa-per-label", str(args.soa_per_label),
                  "--pa-per-phrase", str(args.pa_per_phrase), "--ca", str(args.ca)]
    subprocess.run(build_args, check=True)
    if args.smoke:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from tise_tpu import benchmark

    out = os.path.join(args.root, "results")
    argv = [
        "--track", args.track, "--method_name", "synthetic30k",
        "--images", os.path.join(args.root, "gen"),
        "--data_root", os.path.join(args.root, "data"),
        "--weights_root", os.path.join(args.root, "weights"),
        "--output_root", out,
        "--precision", "fast",
        "--batch_size", str(args.batch_size),
    ]
    if args.track == "coco":
        argv += [
            "--soa_images", os.path.join(args.root, "soa"),
            "--pa_images", os.path.join(args.root, "pa"),
            "--roi-sampling", "1", "--proposals", "256",
        ]
    if args.only:
        argv += ["--only", args.only]
    if args.skip:
        argv += ["--skip", args.skip]
    if args.resume:
        argv += ["--resume"]
    _mark("track: running orchestrator")
    t0 = time.perf_counter()
    values = benchmark.main(argv)
    total = time.perf_counter() - t0
    with open(os.path.join(out, "synthetic30k", "timings.json")) as f:
        timings = json.load(f)
    n_images = args.flat
    if args.track == "coco":
        n_images += 80 * args.soa_per_label + 6 * args.pa_per_phrase
    print(json.dumps({
        "track_wallclock_sec": round(total, 2),
        "track_images": n_images,
        "stages_sec": timings,
        "values": values,
    }))


if __name__ == "__main__":
    main()
