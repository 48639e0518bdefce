"""Hand-built torch Faster R-CNN R50-FPN oracle for converter/forward parity.

Neither detectron2 nor torchvision is installed in this image, so this is an
independent torch transcription of the detectron2 inference semantics the
reference relies on (``DefaultPredictor`` with mask_rcnn_R_50_FPN_3x,
object_fidelity/crop_object.py:18-23): caffe-stem ResNet-50 with
FrozenBatchNorm, FPN with LastLevelMaxPool, RPN with per-level topk + NMS,
ROIAlign (aligned, 2 samples per bin axis — the static-shape choice
tise_tpu/backbones/detection/ops.py documents) and the 2-fc box head.  It
emits/consumes the exact detectron2 ``state_dict`` key layout that
``tise_tpu.backbones.detection.weights.params_from_detectron2`` converts
(backbone.bottom_up.*, backbone.fpn_*, proposal_generator.rpn_head.*,
roi_heads.box_head.*, roi_heads.box_predictor.*), so a full-forward diff
catches any naming/transpose/flatten-order/BN-fold conversion bug.
"""

from __future__ import annotations

import math
from typing import Dict, List, Tuple

import numpy as np
import torch
import torch.nn.functional as F

STRIDES = (4, 8, 16, 32, 64)
ANCHOR_SIZES = (32, 64, 128, 256, 512)
ASPECTS = (0.5, 1.0, 2.0)
BN_EPS = 1e-5


# ---------------------------------------------------------------- state dict


def build_synthetic_state_dict(seed: int = 0, rpn_gain: float = 1.0, cls_gain: float = 1.0):
    """Random detectron2-layout checkpoint (model dict of numpy arrays).

    ``rpn_gain``/``cls_gain`` sharpen the objectness / classifier weights so
    random-init forwards produce confident, well-separated scores (the
    regime real weights live in; see tests/test_detection.py).
    """
    rng = np.random.RandomState(seed)
    sd: Dict[str, np.ndarray] = {}

    def conv(prefix, cout, cin, k, norm=True, bias=False, gain=1.0):
        fan = cin * k * k
        sd[f"{prefix}.weight"] = (rng.randn(cout, cin, k, k) * gain / math.sqrt(fan)).astype(np.float32)
        if bias:
            sd[f"{prefix}.bias"] = (rng.randn(cout) * 0.01).astype(np.float32)
        if norm:
            sd[f"{prefix}.norm.weight"] = rng.uniform(0.5, 1.5, cout).astype(np.float32)
            sd[f"{prefix}.norm.bias"] = (rng.randn(cout) * 0.1).astype(np.float32)
            sd[f"{prefix}.norm.running_mean"] = (rng.randn(cout) * 0.1).astype(np.float32)
            sd[f"{prefix}.norm.running_var"] = rng.uniform(0.5, 1.5, cout).astype(np.float32)

    def dense(prefix, cout, cin, gain=1.0):
        sd[f"{prefix}.weight"] = (rng.randn(cout, cin) * gain / math.sqrt(cin)).astype(np.float32)
        sd[f"{prefix}.bias"] = (rng.randn(cout) * 0.01).astype(np.float32)

    # gains keep activation variance ~stable through 16 residual blocks (a
    # growing trunk amplifies fp accumulation noise past any tolerance)
    conv("backbone.bottom_up.stem.conv1", 64, 3, 7, gain=2.0)
    stages = [("res2", 3, 64, 256, 64), ("res3", 4, 128, 512, 256),
              ("res4", 6, 256, 1024, 512), ("res5", 3, 512, 2048, 1024)]
    for name, blocks, width, cout, cin_first in stages:
        for i in range(blocks):
            cin = cin_first if i == 0 else cout
            p = f"backbone.bottom_up.{name}.{i}"
            if i == 0:
                conv(f"{p}.shortcut", cout, cin, 1, gain=0.7)
            conv(f"{p}.conv1", width, cin, 1, gain=1.4)
            conv(f"{p}.conv2", width, width, 3, gain=1.4)
            conv(f"{p}.conv3", cout, width, 1, gain=0.5)
    for lvl, cin in zip(range(2, 6), (256, 512, 1024, 2048)):
        conv(f"backbone.fpn_lateral{lvl}", 256, cin, 1, norm=False, bias=True, gain=1.5)
        conv(f"backbone.fpn_output{lvl}", 256, 256, 3, norm=False, bias=True, gain=1.5)
    conv("proposal_generator.rpn_head.conv", 256, 256, 3, norm=False, bias=True, gain=1.5)
    conv("proposal_generator.rpn_head.objectness_logits", 3, 256, 1, norm=False, bias=True, gain=rpn_gain)
    conv("proposal_generator.rpn_head.anchor_deltas", 12, 256, 1, norm=False, bias=True, gain=1e-4)
    dense("roi_heads.box_head.fc1", 1024, 256 * 7 * 7, gain=1.5)
    dense("roi_heads.box_head.fc2", 1024, 1024, gain=1.5)
    dense("roi_heads.box_predictor.cls_score", 81, 1024, gain=cls_gain)
    # exactly zero: random-magnitude deltas make degenerate sliver boxes
    # whose IoU/NMS outcome flips on fp noise — with zero deltas the final
    # boxes ARE the proposals, so the end-to-end diff tests the proposal +
    # class pipeline, not tie-breaking chaos
    sd["roi_heads.box_predictor.bbox_pred.weight"] = np.zeros((320, 1024), np.float32)
    sd["roi_heads.box_predictor.bbox_pred.bias"] = np.zeros((320,), np.float32)
    return sd


# ------------------------------------------------------------------- forward


def _conv_fbn(sd, prefix, x, stride=1, pad=0, relu=True):
    w = torch.from_numpy(sd[f"{prefix}.weight"])
    x = F.conv2d(x, w, stride=stride, padding=pad)
    gamma = torch.from_numpy(sd[f"{prefix}.norm.weight"])
    beta = torch.from_numpy(sd[f"{prefix}.norm.bias"])
    mean = torch.from_numpy(sd[f"{prefix}.norm.running_mean"])
    var = torch.from_numpy(sd[f"{prefix}.norm.running_var"])
    scale = gamma / torch.sqrt(var + BN_EPS)
    x = x * scale.view(1, -1, 1, 1) + (beta - mean * scale).view(1, -1, 1, 1)
    return F.relu(x) if relu else x


def _conv_b(sd, prefix, x, pad=0):
    return F.conv2d(x, torch.from_numpy(sd[f"{prefix}.weight"]),
                    torch.from_numpy(sd[f"{prefix}.bias"]), padding=pad)


def _trunk(sd, x) -> Dict[str, torch.Tensor]:
    x = _conv_fbn(sd, "backbone.bottom_up.stem.conv1", x, stride=2, pad=3)
    x = F.max_pool2d(x, 3, stride=2, padding=1)
    out = {}
    for name, blocks, stride in (("res2", 3, 1), ("res3", 4, 2), ("res4", 6, 2), ("res5", 3, 2)):
        for i in range(blocks):
            p = f"backbone.bottom_up.{name}.{i}"
            s = stride if i == 0 else 1
            short = _conv_fbn(sd, f"{p}.shortcut", x, stride=s, relu=False) \
                if f"{p}.shortcut.weight" in sd else x
            y = _conv_fbn(sd, f"{p}.conv1", x)
            y = _conv_fbn(sd, f"{p}.conv2", y, stride=s, pad=1)
            y = _conv_fbn(sd, f"{p}.conv3", y, relu=False)
            x = F.relu(y + short)
        out[name] = x
    return out


def _fpn(sd, feats) -> List[torch.Tensor]:
    lats = [_conv_b(sd, f"backbone.fpn_lateral{lvl}", feats[n])
            for lvl, n in zip(range(2, 6), ("res2", "res3", "res4", "res5"))]
    for i in range(2, -1, -1):
        lats[i] = lats[i] + F.interpolate(lats[i + 1], scale_factor=2, mode="nearest")[
            :, :, : lats[i].shape[2], : lats[i].shape[3]
        ]
    outs = [_conv_b(sd, f"backbone.fpn_output{lvl}", lat, pad=1)
            for lvl, lat in zip(range(2, 6), lats)]
    outs.append(F.max_pool2d(outs[-1], 1, stride=2))
    return outs


def _rpn_head(sd, feats):
    logits, deltas = [], []
    for f in feats:
        t = F.relu(_conv_b(sd, "proposal_generator.rpn_head.conv", f, pad=1))
        logits.append(_conv_b(sd, "proposal_generator.rpn_head.objectness_logits", t))
        deltas.append(_conv_b(sd, "proposal_generator.rpn_head.anchor_deltas", t))
    return logits, deltas


def _anchors(fh, fw, stride, size) -> torch.Tensor:
    base = []
    for ar in ASPECTS:
        w, h = size / math.sqrt(ar), size * math.sqrt(ar)
        base.append([-w / 2, -h / 2, w / 2, h / 2])
    base = torch.tensor(base)
    ys = torch.arange(fh, dtype=torch.float32) * stride
    xs = torch.arange(fw, dtype=torch.float32) * stride
    sy, sx = torch.meshgrid(ys, xs, indexing="ij")
    shifts = torch.stack([sx, sy, sx, sy], dim=-1).reshape(-1, 1, 4)
    return (shifts + base.unsqueeze(0)).reshape(-1, 4)


def _apply_deltas(boxes, deltas, weights=(1.0, 1.0, 1.0, 1.0)):
    clip = math.log(1000.0 / 16)
    w = boxes[..., 2] - boxes[..., 0]
    h = boxes[..., 3] - boxes[..., 1]
    cx = boxes[..., 0] + 0.5 * w
    cy = boxes[..., 1] + 0.5 * h
    dx = deltas[..., 0] / weights[0]
    dy = deltas[..., 1] / weights[1]
    dw = torch.clamp(deltas[..., 2] / weights[2], max=clip)
    dh = torch.clamp(deltas[..., 3] / weights[3], max=clip)
    ncx, ncy = dx * w + cx, dy * h + cy
    nw, nh = torch.exp(dw) * w, torch.exp(dh) * h
    return torch.stack([ncx - nw / 2, ncy - nh / 2, ncx + nw / 2, ncy + nh / 2], dim=-1)


def _nms(boxes: torch.Tensor, scores: torch.Tensor, thresh: float) -> List[int]:
    """Sequential greedy NMS (torchvision.ops.nms semantics)."""
    order = torch.argsort(scores, descending=True)
    keep: List[int] = []
    sup = torch.zeros(len(boxes), dtype=torch.bool)
    area = (boxes[:, 2] - boxes[:, 0]).clamp(min=0) * (boxes[:, 3] - boxes[:, 1]).clamp(min=0)
    for oi in order.tolist():
        if sup[oi]:
            continue
        keep.append(oi)
        lt = torch.maximum(boxes[oi, :2], boxes[:, :2])
        rb = torch.minimum(boxes[oi, 2:], boxes[:, 2:])
        wh = (rb - lt).clamp(min=0)
        inter = wh[:, 0] * wh[:, 1]
        iou = inter / (area[oi] + area - inter).clamp(min=1e-9)
        sup |= iou > thresh
    return keep


def _roi_align(feat: torch.Tensor, boxes: torch.Tensor, stride: int,
               out_size: int = 7, sampling: int = 2) -> torch.Tensor:
    """Aligned ROIAlign, ``sampling`` samples per bin axis, avg-pooled
    ([C, H, W] feature, image-coordinate xyxy boxes -> [N, C, out, out]).

    Clamp-to-edge interpolation — equivalent to torchvision's aligned
    ROIAlign for boxes clipped inside the image (its out-of-range branches
    reduce to edge clamping there)."""
    c, fh, fw = feat.shape
    b = boxes / stride - 0.5
    x1, y1 = b[:, 0], b[:, 1]
    bw = (b[:, 2] - x1).clamp(min=1e-6) / out_size
    bh = (b[:, 3] - y1).clamp(min=1e-6) / out_size
    s = out_size * sampling
    grid = (torch.arange(s, dtype=torch.float32) + 0.5) / sampling
    ys = y1[:, None] + bh[:, None] * grid[None]  # [N, S]
    xs = x1[:, None] + bw[:, None] * grid[None]

    def prep(coords, size):
        c0 = coords.floor().clamp(0, size - 1)
        c1 = (c0 + 1).clamp(max=size - 1)
        f = (coords - c0).clamp(0, 1)
        return c0.long(), c1.long(), f

    y0, y1i, fy = prep(ys, fh)
    x0, x1i, fx = prep(xs, fw)
    fl = feat.reshape(c, -1)  # [C, H*W]

    def gather(yi, xi):  # [N, S], [N, S] -> [N, S, S, C]
        idx = (yi[:, :, None] * fw + xi[:, None, :]).reshape(-1)
        return fl[:, idx].T.reshape(yi.shape[0], s, s, c)

    wy0 = (1 - fy)[:, :, None, None]
    wy1 = fy[:, :, None, None]
    wx0 = (1 - fx)[:, None, :, None]
    wx1 = fx[:, None, :, None]
    vals = (gather(y0, x0) * wy0 * wx0 + gather(y0, x1i) * wy0 * wx1
            + gather(y1i, x0) * wy1 * wx0 + gather(y1i, x1i) * wy1 * wx1)
    n = boxes.shape[0]
    vals = vals.reshape(n, out_size, sampling, out_size, sampling, c)
    return vals.mean(dim=(2, 4)).permute(0, 3, 1, 2)


def torch_forward(sd, image_chw: np.ndarray, pre_nms_topk=1000, post_nms_topk=1000,
                  rpn_nms=0.7, score_thresh=0.5, nms_thresh=0.5, topk_dets=100):
    """Full inference: normalized CHW image -> staged outputs dict."""
    with torch.no_grad():
        x = torch.from_numpy(image_chw).unsqueeze(0)
        trunk = _trunk(sd, x)
        feats = _fpn(sd, trunk)
        logits, deltas = _rpn_head(sd, feats)
        h, w = image_chw.shape[1], image_chw.shape[2]

        # --- find_top_rpn_proposals: per-level topk + NMS, global topk ---
        cand_boxes, cand_scores = [], []
        for lvl, (lg, dl) in enumerate(zip(logits, deltas)):
            fh, fw = lg.shape[2], lg.shape[3]
            anchors = _anchors(fh, fw, STRIDES[lvl], ANCHOR_SIZES[lvl])
            # [1, A, H, W] -> (h, w, a) flatten order
            s = lg[0].permute(1, 2, 0).reshape(-1)
            d = dl[0].reshape(3, 4, fh, fw).permute(2, 3, 0, 1).reshape(-1, 4)
            k = min(pre_nms_topk, s.numel())
            top_s, idx = torch.topk(s, k)
            boxes = _apply_deltas(anchors[idx], d[idx])
            boxes[:, 0::2] = boxes[:, 0::2].clamp(0, w)
            boxes[:, 1::2] = boxes[:, 1::2].clamp(0, h)
            ok = (boxes[:, 2] > boxes[:, 0]) & (boxes[:, 3] > boxes[:, 1])
            boxes, top_s = boxes[ok], top_s[ok]
            keep = _nms(boxes, top_s, rpn_nms)
            cand_boxes.append(boxes[keep])
            cand_scores.append(top_s[keep])
        boxes = torch.cat(cand_boxes)
        scores = torch.cat(cand_scores)
        k = min(post_nms_topk, scores.numel())
        top_s, idx = torch.topk(scores, k)
        proposals = boxes[idx]

        # --- ROI heads ---
        area = (proposals[:, 2] - proposals[:, 0]).clamp(min=0) * (proposals[:, 3] - proposals[:, 1]).clamp(min=0)
        lvl = torch.floor(4 + torch.log2(torch.sqrt(area) / 224.0 + 1e-8)).clamp(2, 5).long()
        roi = torch.zeros(len(proposals), 256, 7, 7)
        for lv in range(2, 6):
            m = lvl == lv
            if m.any():
                roi[m] = _roi_align(feats[lv - 2][0], proposals[m], STRIDES[lv - 2])
        flat = roi.flatten(1)  # CHW flatten order (what fc1 conversion permutes)
        t = F.relu(F.linear(flat, torch.from_numpy(sd["roi_heads.box_head.fc1.weight"]),
                            torch.from_numpy(sd["roi_heads.box_head.fc1.bias"])))
        t = F.relu(F.linear(t, torch.from_numpy(sd["roi_heads.box_head.fc2.weight"]),
                            torch.from_numpy(sd["roi_heads.box_head.fc2.bias"])))
        cls_logits = F.linear(t, torch.from_numpy(sd["roi_heads.box_predictor.cls_score.weight"]),
                              torch.from_numpy(sd["roi_heads.box_predictor.cls_score.bias"]))
        box_deltas = F.linear(t, torch.from_numpy(sd["roi_heads.box_predictor.bbox_pred.weight"]),
                              torch.from_numpy(sd["roi_heads.box_predictor.bbox_pred.bias"]))

        # --- fast_rcnn_inference_single_image ---
        probs = F.softmax(cls_logits, dim=-1)[:, :80]
        d = box_deltas.reshape(-1, 80, 4)
        cls_boxes = _apply_deltas(proposals.unsqueeze(1), d, weights=(10.0, 10.0, 5.0, 5.0))
        cls_boxes[..., 0::2] = cls_boxes[..., 0::2].clamp(0, w)
        cls_boxes[..., 1::2] = cls_boxes[..., 1::2].clamp(0, h)
        fs = probs.reshape(-1)
        fb = cls_boxes.reshape(-1, 4)
        fc = torch.arange(80).repeat(len(proposals))
        m = fs > score_thresh
        fs, fb, fc = fs[m], fb[m], fc[m]
        offset = fc.float().unsqueeze(1) * (max(h, w) + 1.0)
        keep = _nms(fb + offset, fs, nms_thresh)[:topk_dets]
        dets = [(int(fc[i]), fb[i].numpy().copy(), float(fs[i])) for i in keep]

        return {
            "feats": [f[0].permute(1, 2, 0).numpy() for f in feats],  # NHWC like flax
            "rpn_logits": [lg[0].permute(1, 2, 0).numpy() for lg in logits],
            "proposals": proposals.numpy(),
            "prop_scores": top_s.numpy(),
            "roi": roi.permute(0, 2, 3, 1).numpy(),  # NHWC
            "cls_logits": cls_logits.numpy(),
            "box_deltas": box_deltas.numpy(),
            "detections": dets,
        }
