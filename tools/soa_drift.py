"""Metric-level drift of the detector fast preset (VERDICT r4 #5).

The sweep preset ``--roi-sampling 1 --proposals 256`` (+ bf16, micro-batch
32) is ~2.8x the default path, but until now its drift was bounded only by
coarse detection-agreement thresholds (tests/test_detection.py).  This tool
bounds it AT THE METRIC LEVEL, next to the FID/RP numbers from
tools/drift_bench.py: both arms run the SAME image sequence through the SOA
recall math (reference SOA.py:110-144) and the crop pass's selection rule,
reporting

    dSOA-C / dSOA-I (percentage points), dcrop-count (%), and the per-image
    detection agreement between the default-exact arm (f32, roi_sampling=2,
    1000 proposals — the CLI default) and the fast arm (bf16, roi_sampling=1,
    256 proposals, mb32).

Setup mirrors the bench fault-isolation rules: a pool of structured
synthetic 800px images is staged on device once and salt-xor-cycled to M
virtual images (paired across arms — identical inputs), labels assigned
round-robin (M/80 images per label, the reference's layout shape).  Random
detector weights — same compute and same selection thresholds as the real
sweep; absolute SOA values are meaningless here, but the PAIRED drift
between arms is exactly what a user enabling the preset pays.  Caveat: real
weights produce more confident score margins than random ones, so this
random-weight bound is, if anything, pessimistic near the 0.5 threshold.

    python tools/soa_drift.py [--cpu] [--images 30208] [--pool 64]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

_T0 = time.perf_counter()


def _mark(msg: str) -> None:
    print(f"[soa_drift +{time.perf_counter() - _T0:7.1f}s] {msg}", file=sys.stderr, flush=True)


def _image_pool(n: int, size: int, seed: int = 0) -> np.ndarray:
    """Structured (smooth-gradient) images — the track layout's pool recipe,
    not uint8 noise, so convs see realistic spatial statistics."""
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32) / size
    out = np.empty((n, size, size, 3), np.uint8)
    for i in range(n):
        a, b, c = rng.uniform(0.3, 3.0, 3)
        img = np.stack(
            [np.sin(a * 6 * xx + i * 0.1), np.cos(b * 6 * yy), np.sin(c * 6 * (xx + yy))], -1
        )
        out[i] = ((img * 0.5 + 0.5) * 255).astype(np.uint8)
    return out


def run(*, images: int = 30208, pool: int = 64, size: int = 800) -> dict:
    from tise_tpu.backbones.detection.predictor import (PIXEL_MEAN_BGR, TPUDetector,
                                                        pack_detections)
    from tise_tpu.backbones.detection.rcnn import FasterRCNN
    from tise_tpu.metrics.soa import soa_scores

    on_tpu = jax.default_backend() not in ("cpu",)
    if not on_tpu:
        images, pool, size = min(images, 32), 8, 128
    n_labels = 80
    _mark(f"backend={jax.default_backend()} images={images} pool={pool} size={size}")

    arms = {
        # the CLI default: f32 'highest'-adjacent trunk, detectron2 test-time
        # knobs (roi_sampling=2, 1000 proposals), micro-batch 8
        "exact": dict(dtype=jnp.float32, roi_sampling=2, post_nms_topk=1000, mb=8),
        # the sweep preset the orchestrator plumbs through --roi-sampling 1
        # --proposals 256 --precision fast
        "fast": dict(dtype=jnp.bfloat16, roi_sampling=1, post_nms_topk=256, mb=32),
    }

    init_model = FasterRCNN(dtype=jnp.float32, roi_sampling=2)
    params = jax.jit(
        lambda r: init_model.init(r, jnp.zeros((size, size, 3), jnp.float32))
    )(jax.random.PRNGKey(0))

    host_pool = _image_pool(pool, size)
    pool_dev = jax.device_put(host_pool)
    int(jax.jit(lambda x: jnp.sum(x, dtype=jnp.int32))(pool_dev))

    per_arm = {}
    for arm, knobs in arms.items():
        model = FasterRCNN(dtype=knobs["dtype"], roi_sampling=knobs["roi_sampling"],
                           post_nms_topk=knobs["post_nms_topk"])
        mb = knobs["mb"] if on_tpu else 2
        mb = min(mb, pool)

        def single(p, img_u8, _m=model, _dt=knobs["dtype"]):
            x = (img_u8.astype(jnp.float32) - jnp.asarray(PIXEL_MEAN_BGR)).astype(_dt)
            return _m.apply(p, x)

        @jax.jit
        def fwd(p, imgs_u8, salt, _single=single, _mb=mb):
            x = jnp.bitwise_xor(imgs_u8.reshape((-1, _mb) + imgs_u8.shape[1:]), salt)
            det = jax.lax.map(lambda ch: jax.vmap(_single, in_axes=(None, 0))(p, ch), x)
            return pack_detections(det)

        _mark(f"{arm}: compile+warm (mb={mb})")
        TPUDetector._unpack(fwd(params, pool_dev, jnp.uint8(255)))
        classes_per_image = []  # list of np arrays of detected class ids
        counts = []
        n_rounds = -(-images // pool)
        t0 = time.perf_counter()
        inflight = None

        def collect(det_dev):
            b, s, c, v = TPUDetector._unpack(det_dev)
            for i in range(b.shape[0]):
                valid = v[i].astype(bool)
                classes_per_image.append(np.asarray(c[i][valid], np.int32))
                counts.append(int(valid.sum()))

        for r in range(n_rounds):
            det = fwd(params, pool_dev, jnp.uint8(r % 255))
            if inflight is not None:
                collect(inflight)
            inflight = det
        collect(inflight)
        dt = time.perf_counter() - t0
        classes_per_image = classes_per_image[:images]
        counts = counts[:images]
        _mark(f"{arm}: {images} images in {dt:.1f}s ({images / dt:.1f} img/s)")

        # SOA aggregation: image i belongs to label i % 80 (M/80 per label,
        # the reference layout's shape); recognized iff its label is detected
        results = {}
        for lbl in range(n_labels):
            idxs = range(lbl, images, n_labels)
            total, recognized = 0, 0
            for i in idxs:
                total += 1
                if lbl in classes_per_image[i]:
                    recognized += 1
            results[lbl] = {"accuracy": recognized / max(total, 1), "images_total": total}
        soa_c, soa_i, _, _ = soa_scores(results)
        per_arm[arm] = {
            "soa_c": soa_c,
            "soa_i": soa_i,
            "crop_count": int(np.sum(counts)),
            "images_per_sec": round(images / dt, 1),
            "classes": classes_per_image,
        }

    ex, fa = per_arm["exact"], per_arm["fast"]
    agree = np.mean([
        1.0 if set(a.tolist()) == set(b.tolist()) else 0.0
        for a, b in zip(ex["classes"], fa["classes"])
    ])
    line = {
        "soa_drift_images": images,
        "soa_c_exact": round(ex["soa_c"], 6),
        "soa_c_fast": round(fa["soa_c"], 6),
        "d_soa_c_pp": round((fa["soa_c"] - ex["soa_c"]) * 100, 4),
        "soa_i_exact": round(ex["soa_i"], 6),
        "soa_i_fast": round(fa["soa_i"], 6),
        "d_soa_i_pp": round((fa["soa_i"] - ex["soa_i"]) * 100, 4),
        "crop_count_exact": ex["crop_count"],
        "crop_count_fast": fa["crop_count"],
        "d_crop_count_pct": round(
            100.0 * (fa["crop_count"] - ex["crop_count"]) / max(ex["crop_count"], 1), 3
        ),
        "det_class_set_agreement": round(float(agree), 4),
        "exact_images_per_sec": ex["images_per_sec"],
        "fast_images_per_sec": fa["images_per_sec"],
    }
    return line


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--images", type=int, default=30208)
    p.add_argument("--pool", type=int, default=64)
    args = p.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from tise_tpu.core import compile_cache

    compile_cache.enable()
    print(json.dumps(run(images=args.images, pool=args.pool)))


if __name__ == "__main__":
    main()
