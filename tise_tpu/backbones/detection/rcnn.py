"""Faster R-CNN heads (RPN + box head) with static shapes, detectron2-parity.

Equivalent of the reference's detectron2 mask_rcnn_R_50_FPN_3x predictor used
for cropping (crop_object.py:18-23) and SOA (SOA.py:18-23).  The mask branch
is intentionally omitted: every consumer in the reference uses only
``pred_classes`` and ``pred_boxes`` (crop_object.py:32-33, SOA.py:89-90).

Static-shape design (SURVEY.md "Hard parts"):
  * RPN: per-level top-k (1000) pre-NMS candidates, NMS 0.7 as a fixed-size
    mask, post-NMS top 1000 proposals across levels with validity masks;
  * ROI heads: ROIAlign computed per FPN level and gathered by the box-level
    assignment; class-wise box decode; per-class NMS 0.5 via one batched NMS
    with the class-offset trick; score threshold 0.5
    (cfg.MODEL.ROI_HEADS.SCORE_THRESH_TEST, crop_object.py:20); top 100
    detections with a validity mask.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, List, NamedTuple, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from tise_tpu.backbones.detection import ops
from tise_tpu.backbones.detection.resnet_fpn import FPN, ResNet50

STRIDES = (4, 8, 16, 32, 64)
ANCHOR_SIZES = (32, 64, 128, 256, 512)
NUM_ANCHORS = 3  # aspect ratios 0.5/1/2, one size per level
PRE_NMS_TOPK = 1000  # test-time, per level
POST_NMS_TOPK = 1000
RPN_NMS_THRESH = 0.7
DETECTIONS_PER_IMAGE = 100
NMS_THRESH = 0.5
NUM_CLASSES = 80
#: Box2BoxTransform weights for the box head (detectron2 default 10, 10, 5, 5)
BOX_REG_WEIGHTS = (10.0, 10.0, 5.0, 5.0)


class RPNHead(nn.Module):
    """Shared 3x3 conv -> objectness + anchor deltas, applied per level."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: Sequence[jax.Array]) -> Tuple[List[jax.Array], List[jax.Array]]:
        conv = nn.Conv(256, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype, name="conv")
        obj = nn.Conv(NUM_ANCHORS, (1, 1), dtype=self.dtype, name="objectness")
        deltas = nn.Conv(NUM_ANCHORS * 4, (1, 1), dtype=self.dtype, name="anchor_deltas")
        logits, boxes = [], []
        for f in feats:
            t = nn.relu(conv(f))
            logits.append(obj(t))
            boxes.append(deltas(t))
        return logits, boxes


class BoxHead(nn.Module):
    """2-fc head + predictors (FastRCNNConvFCHead + FastRCNNOutputLayers)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, roi_feats: jax.Array) -> Tuple[jax.Array, jax.Array]:
        x = roi_feats.reshape(roi_feats.shape[0], -1)
        x = nn.relu(nn.Dense(1024, dtype=self.dtype, name="fc1")(x))
        x = nn.relu(nn.Dense(1024, dtype=self.dtype, name="fc2")(x))
        scores = nn.Dense(NUM_CLASSES + 1, dtype=self.dtype, name="cls_score")(x)
        deltas = nn.Dense(NUM_CLASSES * 4, dtype=self.dtype, name="bbox_pred")(x)
        return scores, deltas


class Detections(NamedTuple):
    boxes: jax.Array  # [D, 4] xyxy in input-image coordinates
    scores: jax.Array  # [D]
    classes: jax.Array  # [D] int32 contiguous 0..79
    valid: jax.Array  # [D] bool


def postprocess_detections(
    proposals: jax.Array,
    prop_valid: jax.Array,
    cls_logits: jax.Array,
    box_deltas: jax.Array,
    h: int,
    w: int,
    score_thresh: float = 0.5,
    clip_hw=None,
) -> Detections:
    """detectron2 ``fast_rcnn_inference_single_image`` as static shapes:
    softmax minus background -> per-class box decode/clip -> score threshold
    (cfg.MODEL.ROI_HEADS.SCORE_THRESH_TEST, crop_object.py:20) -> per-class
    NMS 0.5 via one batched NMS with the class-offset trick -> top
    ``DETECTIONS_PER_IMAGE`` with a validity mask.  Parity vs a sequential
    dynamic-shape reference is tested (tests/test_detection.py)."""
    k = proposals.shape[0]
    probs = jax.nn.softmax(cls_logits.astype(jnp.float32), axis=-1)[:, :NUM_CLASSES]  # drop background
    wx, wy, ww, wh = BOX_REG_WEIGHTS
    d = box_deltas.astype(jnp.float32).reshape(k, NUM_CLASSES, 4) / jnp.asarray([wx, wy, ww, wh])
    cls_boxes = ops.apply_deltas(proposals[:, None, :], d)
    ch, cw = (h, w) if clip_hw is None else (clip_hw[0], clip_hw[1])
    cls_boxes = ops.clip_boxes(cls_boxes, ch, cw)  # [K, C, 4]

    # flatten (proposal, class) pairs; batched per-class NMS by offsetting
    # boxes per class so cross-class overlaps never suppress
    flat_scores = jnp.where(prop_valid[:, None], probs, 0.0).reshape(-1)
    flat_boxes = cls_boxes.reshape(-1, 4)
    flat_cls = jnp.broadcast_to(jnp.arange(NUM_CLASSES)[None, :], (k, NUM_CLASSES)).reshape(-1)
    score_ok = flat_scores > score_thresh
    masked_scores = jnp.where(score_ok, flat_scores, -jnp.inf)
    top = min(4 * DETECTIONS_PER_IMAGE, masked_scores.shape[0])
    sel_scores, sel = jax.lax.top_k(masked_scores, top)
    sel_boxes = flat_boxes[sel]
    sel_cls = flat_cls[sel]
    offset = sel_cls.astype(jnp.float32)[:, None] * (jnp.maximum(h, w) + 1.0)
    keep = ops.nms_mask(sel_boxes + offset, sel_scores, NMS_THRESH)
    final_scores = jnp.where(keep, sel_scores, -jnp.inf)
    out_scores, order = jax.lax.top_k(final_scores, DETECTIONS_PER_IMAGE)
    return Detections(
        boxes=sel_boxes[order],
        scores=jnp.where(jnp.isfinite(out_scores), out_scores, 0.0),
        classes=sel_cls[order],
        valid=jnp.isfinite(out_scores),
    )


class FasterRCNN(nn.Module):
    """Backbone + RPN + ROI box head; single-image static-shape inference.

    ``dtype=jnp.bfloat16`` is the fast path: trunk/FPN/RPN/head matmuls run
    bf16 on the MXU with all score/box math (proposal decode, NMS, softmax,
    box regression) in f32 epilogues — detection-equivalence vs f32 is
    tested (tests/test_detection.py).  ``score_thresh`` mirrors detectron2's
    cfg.MODEL.ROI_HEADS.SCORE_THRESH_TEST (0.5 on the reference configs,
    crop_object.py:20).

    ``roi_sampling``: ROIAlign samples per bin per dim.  detectron2's
    ROIAlignV2 with sampling_ratio=0 adapts the grid per box
    (ceil(span/7)); a static-shape program cannot reproduce that exactly —
    the grid count is data-dependent and unbounded for extreme-aspect boxes
    (a 4:1 proposal at P2 needs a 29-point grid).  The default 2 matches
    the adaptive grid for the canonical span range [14, 28) the FPN level
    assignment produces (<1e-3 box-score effect measured at 800 px);
    1 samples each bin once at its center (ROIAlign sampling_ratio=1
    semantics) — ~4x less ROIAlign HBM traffic, detection agreement
    quantified in tests/test_detection.py — the opt-in fast knob for bulk
    sweeps (SOA's 80 labels x ~30k images).

    ``post_nms_topk``: proposals kept after RPN NMS
    (cfg.MODEL.RPN.POST_NMS_TOPK_TEST, detectron2 FPN default 1000).  The
    ROIAlign gather and box head scale linearly with it, and the gather is
    the sweep's measured floor (ROADMAP.md) — lowering it to 256 is the
    second opt-in sweep knob.  Proposals are score-ordered, so a smaller k
    keeps exactly the top-scoring prefix; final detections (score > 0.5
    survivors of per-class NMS) overwhelmingly decode from top-ranked
    proposals — agreement quantified in tests/test_detection.py.
    """

    dtype: Any = jnp.float32
    score_thresh: float = 0.5
    roi_sampling: int = 2
    post_nms_topk: int = POST_NMS_TOPK

    def setup(self):
        self.backbone = ResNet50(dtype=self.dtype)
        self.fpn = FPN(dtype=self.dtype)
        self.rpn = RPNHead(dtype=self.dtype)
        self.box_head = BoxHead(dtype=self.dtype)

    def __call__(self, image: jax.Array, valid_hw: jax.Array = None) -> Detections:
        """image: normalized [H, W, 3] (BGR, mean-subtracted), H/W static.

        ``valid_hw`` [2]: the true (pre-padding) image extent — detectron2
        pads each image to the batch shape but clips proposals/boxes to the
        TRUE size (ImageList.image_sizes); pass it when the image carries
        zero padding from aspect-preserving bucketed resize."""
        h, w = image.shape[0], image.shape[1]
        vh = h if valid_hw is None else valid_hw[0]
        vw = w if valid_hw is None else valid_hw[1]
        feats = self.fpn(self.backbone(image[None]))
        logits, deltas = self.rpn(feats)

        # ---- proposals (per level topk -> NMS -> global topk) ----
        all_boxes, all_scores = [], []
        for lvl, (lg, dl) in enumerate(zip(logits, deltas)):
            fh, fw = lg.shape[1], lg.shape[2]
            anchors = jnp.asarray(ops.generate_anchors(fh, fw, STRIDES[lvl], ANCHOR_SIZES[lvl]))
            scores_l = lg.reshape(-1).astype(jnp.float32)
            deltas_l = dl.reshape(-1, 4).astype(jnp.float32)
            k = min(PRE_NMS_TOPK, scores_l.shape[0])
            top_scores, idx = jax.lax.top_k(scores_l, k)
            boxes_l = ops.apply_deltas(anchors[idx], deltas_l[idx])
            boxes_l = ops.clip_boxes(boxes_l, vh, vw)
            # drop degenerate boxes (detectron2 removes empty proposals)
            wh_ok = (boxes_l[:, 2] > boxes_l[:, 0]) & (boxes_l[:, 3] > boxes_l[:, 1])
            top_scores = jnp.where(wh_ok, top_scores, -jnp.inf)
            keep = ops.nms_mask(boxes_l, top_scores, RPN_NMS_THRESH)
            all_boxes.append(boxes_l)
            all_scores.append(jnp.where(keep, top_scores, -jnp.inf))
        boxes = jnp.concatenate(all_boxes)
        scores = jnp.concatenate(all_scores)
        k = min(self.post_nms_topk, scores.shape[0])
        prop_scores, idx = jax.lax.top_k(scores, k)
        proposals = boxes[idx]  # [K, 4]
        prop_valid = jnp.isfinite(prop_scores)

        # ---- ROI align over FPN levels (one gather on the level-concat buffer) ----
        levels = ops.assign_fpn_level(proposals)
        roi = ops.roi_align_multilevel(
            [feats[lvl - 2][0] for lvl in range(2, 6)], proposals, levels, STRIDES[:4],
            sampling=self.roi_sampling,
        ).astype(self.dtype)

        # ---- box head + per-class decode + NMS (shared postprocess) ----
        cls_logits, box_deltas = self.box_head(roi)
        clip_hw = None if valid_hw is None else (vh, vw)
        return postprocess_detections(
            proposals, prop_valid, cls_logits, box_deltas, h, w,
            score_thresh=self.score_thresh, clip_hw=clip_hw,
        )
