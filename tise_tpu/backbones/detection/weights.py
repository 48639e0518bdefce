"""detectron2 checkpoint -> flax param conversion for the detection stack.

The reference downloads ``model_final_f10217.pkl`` /
``coco_mask_rcnn_detector.pkl`` (crop_object.py:21, SOA.py:22) — detectron2
pickles of {"model": {name: ndarray}}.  FrozenBatchNorm entries
(``norm.{weight,bias,running_mean,running_var}``) are folded into the
per-channel affine our ConvFrozenBN expects; the mask head is skipped.
"""

from __future__ import annotations

import pickle
from typing import Any, Dict, Mapping

import numpy as np

BN_EPS = 1e-5  # detectron2 FrozenBatchNorm2d eps


def _conv_kernel(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))  # OIHW -> HWIO


def _frozen_bn(sd: Mapping[str, np.ndarray], prefix: str):
    gamma = np.asarray(sd[f"{prefix}.norm.weight"])
    beta = np.asarray(sd[f"{prefix}.norm.bias"])
    mean = np.asarray(sd[f"{prefix}.norm.running_mean"])
    var = np.asarray(sd[f"{prefix}.norm.running_var"])
    scale = gamma / np.sqrt(var + BN_EPS)
    return scale.astype(np.float32), (beta - mean * scale).astype(np.float32)


def _conv_bn(sd: Mapping[str, np.ndarray], prefix: str) -> Dict[str, Any]:
    scale, bias = _frozen_bn(sd, prefix)
    return {
        "conv": {"kernel": _conv_kernel(np.asarray(sd[f"{prefix}.weight"]))},
        "bn_scale": scale,
        "bn_bias": bias,
    }


def _conv(sd: Mapping[str, np.ndarray], prefix: str) -> Dict[str, Any]:
    return {
        "kernel": _conv_kernel(np.asarray(sd[f"{prefix}.weight"])),
        "bias": np.asarray(sd[f"{prefix}.bias"]),
    }


def _dense(sd: Mapping[str, np.ndarray], prefix: str) -> Dict[str, Any]:
    return {
        "kernel": np.asarray(sd[f"{prefix}.weight"]).T,
        "bias": np.asarray(sd[f"{prefix}.bias"]),
    }


def _dense_from_roi(sd: Mapping[str, np.ndarray], prefix: str) -> Dict[str, Any]:
    """fc1 consumes flattened 7x7x256 features: torch flattens CHW, we
    flatten HWC -> permute the input dimension accordingly."""
    w = np.asarray(sd[f"{prefix}.weight"])  # [out, 256*7*7] in CHW order
    out_dim = w.shape[0]
    w = w.reshape(out_dim, 256, 7, 7).transpose(0, 2, 3, 1).reshape(out_dim, -1)
    return {"kernel": w.T, "bias": np.asarray(sd[f"{prefix}.bias"])}


_STAGES = {"res2": 3, "res3": 4, "res4": 6, "res5": 3}


def params_from_detectron2(sd: Mapping[str, Any]) -> Dict[str, Any]:
    sd = {k: (v if isinstance(v, np.ndarray) else np.asarray(v)) for k, v in sd.items()}
    backbone: Dict[str, Any] = {"stem": _conv_bn(sd, "backbone.bottom_up.stem.conv1")}
    for stage, blocks in _STAGES.items():
        for i in range(blocks):
            p = f"backbone.bottom_up.{stage}.{i}"
            entry = {
                "conv1": _conv_bn(sd, f"{p}.conv1"),
                "conv2": _conv_bn(sd, f"{p}.conv2"),
                "conv3": _conv_bn(sd, f"{p}.conv3"),
            }
            if f"{p}.shortcut.weight" in sd:
                entry["shortcut"] = _conv_bn(sd, f"{p}.shortcut")
            backbone[f"{stage}_{i}"] = entry

    fpn = {}
    for lvl in range(2, 6):
        fpn[f"lateral{lvl}"] = _conv(sd, f"backbone.fpn_lateral{lvl}")
        fpn[f"output{lvl}"] = _conv(sd, f"backbone.fpn_output{lvl}")

    rpn = {
        "conv": _conv(sd, "proposal_generator.rpn_head.conv"),
        "objectness": _conv(sd, "proposal_generator.rpn_head.objectness_logits"),
        "anchor_deltas": _conv(sd, "proposal_generator.rpn_head.anchor_deltas"),
    }
    box_head = {
        "fc1": _dense_from_roi(sd, "roi_heads.box_head.fc1"),
        "fc2": _dense(sd, "roi_heads.box_head.fc2"),
        "cls_score": _dense(sd, "roi_heads.box_predictor.cls_score"),
        "bbox_pred": _dense(sd, "roi_heads.box_predictor.bbox_pred"),
    }
    return {"params": {"backbone": backbone, "fpn": fpn, "rpn": rpn, "box_head": box_head}}


def load_detectron2_pkl(path: str) -> Dict[str, Any]:
    if path.endswith(".npz"):
        from tise_tpu.core.weights import load_pytree_npz

        return load_pytree_npz(path)
    with open(path, "rb") as f:
        ckpt = pickle.load(f, encoding="latin1")
    return params_from_detectron2(ckpt["model"] if "model" in ckpt else ckpt)
