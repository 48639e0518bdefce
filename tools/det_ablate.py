"""Ablation profiler for the Faster R-CNN fast path on the real TPU.

Measures cumulative stage cost by early-exiting the forward after each
stage (whole-model ablation, not isolated op benches — see ROADMAP.md
measurement rules; in-jit rep chains amortize the tunnel's ~10 ms/dispatch
tax).  Stages:

  convs  : trunk + FPN + RPN heads (pure conv/matmul cost)
  props  : + per-level topk + NMS + global topk (sorts + NMS fixpoint)
  roi    : + multilevel ROIAlign + box head
  full   : + per-class decode + NMS + final topk (complete model)

Usage: python tools/det_ablate.py [--size 800] [--mb 8] [--stages convs,props,roi,full]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def build_stage_fn(model, stage: str):
    """A single-image forward that stops after ``stage`` and returns a scalar."""
    from tise_tpu.backbones.detection import ops
    from tise_tpu.backbones.detection.rcnn import (
        ANCHOR_SIZES, POST_NMS_TOPK, PRE_NMS_TOPK, RPN_NMS_THRESH, STRIDES,
        postprocess_detections,
    )

    def fwd(params, image):
        h, w = image.shape[0], image.shape[1]

        # mirror FasterRCNN.__call__ stage by stage via bound submodules
        def inner(mdl):
            bb = mdl.backbone(image[None])
            # backbone sub-stages (VERDICT r4 item 4): consuming only the
            # stem/resN endpoint lets XLA dead-code-eliminate everything
            # after it — whole-model ablation of the conv bucket
            if stage in ("stem", "res2", "res3", "res4", "res5"):
                return jnp.sum(bb[stage].astype(jnp.float32))
            feats = mdl.fpn(bb)
            if stage == "fpn":
                return sum(jnp.sum(f.astype(jnp.float32)) for f in feats)
            logits, deltas = mdl.rpn(feats)
            if stage == "convs":
                return sum(jnp.sum(l.astype(jnp.float32)) for l in logits) + sum(
                    jnp.sum(f.astype(jnp.float32)) for f in feats
                )
            all_boxes, all_scores = [], []
            for lvl, (lg, dl) in enumerate(zip(logits, deltas)):
                fh, fw = lg.shape[1], lg.shape[2]
                anchors = jnp.asarray(ops.generate_anchors(fh, fw, STRIDES[lvl], ANCHOR_SIZES[lvl]))
                scores_l = lg.reshape(-1).astype(jnp.float32)
                deltas_l = dl.reshape(-1, 4).astype(jnp.float32)
                k = min(PRE_NMS_TOPK, scores_l.shape[0])
                top_scores, idx = jax.lax.top_k(scores_l, k)
                boxes_l = ops.apply_deltas(anchors[idx], deltas_l[idx])
                boxes_l = ops.clip_boxes(boxes_l, h, w)
                wh_ok = (boxes_l[:, 2] > boxes_l[:, 0]) & (boxes_l[:, 3] > boxes_l[:, 1])
                top_scores = jnp.where(wh_ok, top_scores, -jnp.inf)
                keep = ops.nms_mask(boxes_l, top_scores, RPN_NMS_THRESH)
                all_boxes.append(boxes_l)
                all_scores.append(jnp.where(keep, top_scores, -jnp.inf))
            boxes = jnp.concatenate(all_boxes)
            scores = jnp.concatenate(all_scores)
            k = min(model.post_nms_topk, scores.shape[0])
            prop_scores, idx = jax.lax.top_k(scores, k)
            proposals = boxes[idx]
            prop_valid = jnp.isfinite(prop_scores)
            if stage == "props":
                return jnp.sum(jnp.where(prop_valid, prop_scores, 0.0))
            levels = ops.assign_fpn_level(proposals)
            roi = ops.roi_align_multilevel(
                [feats[lvl - 2][0] for lvl in range(2, 6)], proposals, levels, STRIDES[:4],
                sampling=model.roi_sampling,
            ).astype(model.dtype)
            if stage == "align":
                return jnp.sum(roi.astype(jnp.float32))
            if stage == "alignsynth":
                # same feats, synthetic boxes: isolates box-content effects
                key = jax.random.PRNGKey(0)
                ctr = jax.random.uniform(key, (proposals.shape[0], 2), minval=50.0, maxval=750.0)
                sz = jax.random.uniform(jax.random.PRNGKey(1), (proposals.shape[0], 2), minval=20.0, maxval=300.0)
                sboxes = jnp.concatenate([ctr - sz / 2, ctr + sz / 2], -1) + jnp.sum(proposals) * 0.0
                slev = ops.assign_fpn_level(sboxes)
                sroi = ops.roi_align_multilevel(
                    [feats[lvl - 2][0] for lvl in range(2, 6)], sboxes, slev, STRIDES[:4]
                )
                return jnp.sum(sroi.astype(jnp.float32))
            cls_logits, box_deltas = mdl.box_head(roi)
            if stage == "roi":
                return jnp.sum(cls_logits.astype(jnp.float32)) + jnp.sum(
                    box_deltas.astype(jnp.float32)
                )
            det = postprocess_detections(
                proposals, prop_valid, cls_logits, box_deltas, h, w,
                score_thresh=model.score_thresh,
            )
            return jnp.sum(det.scores.astype(jnp.float32))

        return model.apply(params, method=inner)

    return fwd


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--size", type=int, default=800)
    p.add_argument("--mb", type=int, default=8)
    p.add_argument("--chain", type=int, default=4)
    p.add_argument("--iters", type=int, default=3)
    p.add_argument("--stages", type=str, default="convs,props,roi,full")
    p.add_argument("--dtype", type=str, default="bfloat16")
    p.add_argument("--roi-sampling", type=int, default=2)
    p.add_argument("--proposals", type=int, default=1000)
    args = p.parse_args()

    from tise_tpu.backbones.detection.predictor import PIXEL_MEAN_BGR
    from tise_tpu.backbones.detection.rcnn import FasterRCNN
    from tise_tpu.core import compile_cache

    compile_cache.enable()
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    size, mb = args.size, args.mb
    model = FasterRCNN(dtype=dtype, roi_sampling=args.roi_sampling, post_nms_topk=args.proposals)
    t0 = time.perf_counter()
    params = jax.jit(lambda r: model.init(r, jnp.zeros((size, size, 3), dtype)))(
        jax.random.PRNGKey(0)
    )
    host = np.random.RandomState(1)
    imgs = jax.device_put(host.randint(0, 256, (mb, size, size, 3)).astype(np.uint8))
    int(jax.jit(lambda x: jnp.sum(x, dtype=jnp.int32))(imgs))
    print(f"[{time.perf_counter() - t0:6.1f}s] init+upload done", file=sys.stderr, flush=True)

    results = {}
    for stage in args.stages.split(","):
        stage_fn = build_stage_fn(model, stage)

        @jax.jit
        def fwd(p, x, seed0, _fn=stage_fn):
            def rep(i, acc):
                xi = jnp.bitwise_xor(x, (seed0 + i).astype(jnp.uint8))
                v = jax.vmap(
                    lambda im: _fn(
                        p,
                        (im.astype(jnp.float32) - jnp.asarray(PIXEL_MEAN_BGR)).astype(dtype),
                    )
                )(xi)
                return acc + jnp.sum(v)

            return jax.lax.fori_loop(0, args.chain, rep, jnp.float32(0))

        t0 = time.perf_counter()
        float(fwd(params, imgs, jnp.uint8(0)))
        print(f"[{time.perf_counter() - t0:6.1f}s] {stage}: compiled+warm", file=sys.stderr, flush=True)
        t0 = time.perf_counter()
        outs = [fwd(params, imgs, jnp.uint8((i + 1) * args.chain)) for i in range(args.iters)]
        float(outs[-1])
        dt = time.perf_counter() - t0
        per_img = dt / (mb * args.chain * args.iters) * 1000
        results[stage] = per_img
        print(f"{stage:6s}: {per_img:8.2f} ms/img  ({mb * args.chain * args.iters / dt:7.1f} img/s)", flush=True)

    prev = 0.0
    for stage, ms in results.items():
        print(f"{stage:6s}: +{ms - prev:8.2f} ms/img incremental", flush=True)
        prev = ms


if __name__ == "__main__":
    main()
