"""Object counter for CA: FC-ResNet50 + peak-response counting head.

The reference counts objects with CountSeg's peak-response-mapping model
(counting_alignment/CA.py:131-141: ``modules.fc_resnet50(channels=240)``
wrapped in ``peak_response_mapping(..., peak_stimulation="addedmodule5",
sub_pixel_locating_factor=1)``, weights ``coco14.pt``) and derives counts as
``round(gate(confidence) * spatial_mean(density_map))`` per class
(CA.py:151-166).

TPU reconstruction ("Object Counting and Instance Segmentation with
Image-level Supervision", Cholakkal et al. CVPR'19): a torchvision-style
ResNet50 trunk, a 1x1 conv producing 240 = 80 classes x 3 maps (class
response / density / auxiliary), class confidence by peak stimulation (mean
response over 3x3 local maxima of the class response map), density integrated
by spatial mean.  The reference needs input gradients only for PRM's
peak-backprop *visualisation*; counting is forward-only, so the TPU path has
no grad requirement.  The per-class-map split order is configurable
(``head_order``) since it is a checkpoint-layout convention; the converter
maps the coco14.pt trunk tensors 1:1 by shape.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from tise_tpu.backbones.detection.resnet_fpn import ResNet50

NUM_CLASSES = 80
MAPS_PER_CLASS = 3


class FCResNet50PRM(nn.Module):
    """ResNet50 -> 1x1 conv (240) -> (class response, density) heads."""

    dtype: Any = jnp.float32
    head_order: Tuple[int, int] = (0, 1)  # (class-response slot, density slot)

    @nn.compact
    def __call__(self, x: jax.Array) -> Tuple[jax.Array, jax.Array]:
        """x: normalized [B, 448, 448, 3] -> (confidence [B, 80],
        density [B, 80, h, w])."""
        feats = ResNet50(dtype=self.dtype, name="backbone")(x)["res5"]  # [B, 14, 14, 2048]
        maps = nn.Conv(NUM_CLASSES * MAPS_PER_CLASS, (1, 1), dtype=self.dtype, name="classifier")(feats)
        b, h, w, _ = maps.shape
        maps = maps.reshape(b, h, w, NUM_CLASSES, MAPS_PER_CLASS)
        crm = maps[..., self.head_order[0]].transpose(0, 3, 1, 2)  # [B, 80, h, w]
        density = maps[..., self.head_order[1]].transpose(0, 3, 1, 2)

        # peak stimulation: responses at 3x3 local maxima, averaged
        win = jax.lax.reduce_window(
            crm, -jnp.inf, jax.lax.max, (1, 1, 3, 3), (1, 1, 1, 1), "SAME"
        )
        peak_mask = (crm >= win).astype(crm.dtype)
        n_peaks = jnp.maximum(jnp.sum(peak_mask, axis=(2, 3)), 1.0)
        confidence = jnp.sum(crm * peak_mask, axis=(2, 3)) / n_peaks  # [B, 80]
        return confidence, density


def predict_counts(confidence: np.ndarray, density: np.ndarray) -> np.ndarray:
    """Reference count rule (CA.py:155-161): clamp confidence at 0, binarise
    positives to a gate, count = round(gate * spatial mean of density)."""
    count_den = density.mean(axis=(2, 3))  # adaptive_avg_pool2d(density, 1)
    gate = (confidence > 0).astype(np.float64)
    return np.round(gate * count_den)


def params_from_countseg(sd: Mapping[str, Any], head_order: Tuple[int, int] = (0, 1)) -> Dict[str, Any]:
    """coco14.pt state dict -> flax params.

    Expects torchvision resnet50 naming under an optional ``module.`` /
    ``backbone.`` prefix plus the 1x1 ``classifier`` conv; BN folds into the
    frozen affine (eval mode).
    """

    def arr(v):
        return v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)

    sd = {k.replace("module.", ""): arr(v) for k, v in sd.items()}

    def conv_bn(conv_key: str, bn_key: str) -> Dict[str, Any]:
        w = np.transpose(sd[f"{conv_key}.weight"], (2, 3, 1, 0))
        gamma = sd[f"{bn_key}.weight"]
        beta = sd[f"{bn_key}.bias"]
        mean = sd[f"{bn_key}.running_mean"]
        var = sd[f"{bn_key}.running_var"]
        scale = gamma / np.sqrt(var + 1e-5)
        return {"conv": {"kernel": w}, "bn_scale": scale.astype(np.float32), "bn_bias": (beta - mean * scale).astype(np.float32)}

    prefix = "backbone." if any(k.startswith("backbone.") for k in sd) else ""
    backbone: Dict[str, Any] = {"stem": conv_bn(f"{prefix}conv1", f"{prefix}bn1")}
    blocks = {"res2": ("layer1", 3), "res3": ("layer2", 4), "res4": ("layer3", 6), "res5": ("layer4", 3)}
    for ours, (theirs, n) in blocks.items():
        for i in range(n):
            p = f"{prefix}{theirs}.{i}"
            entry = {
                "conv1": conv_bn(f"{p}.conv1", f"{p}.bn1"),
                "conv2": conv_bn(f"{p}.conv2", f"{p}.bn2"),
                "conv3": conv_bn(f"{p}.conv3", f"{p}.bn3"),
            }
            if f"{p}.downsample.0.weight" in sd:
                entry["shortcut"] = conv_bn(f"{p}.downsample.0", f"{p}.downsample.1")
            backbone[f"{ours}_{i}"] = entry

    cls_key = next(k for k in sd if k.endswith("classifier.weight") or k.endswith("classifier.0.weight"))
    cls_prefix = cls_key[: -len(".weight")]
    classifier = {
        "kernel": np.transpose(sd[f"{cls_prefix}.weight"], (2, 3, 1, 0)),
    }
    if f"{cls_prefix}.bias" in sd:
        classifier["bias"] = sd[f"{cls_prefix}.bias"]
    return {"params": {"backbone": backbone, "classifier": classifier}}


def load_counter_params(path: str) -> Dict[str, Any]:
    if path.endswith(".npz"):
        from tise_tpu.core.weights import load_pytree_npz

        return load_pytree_npz(path)
    import torch

    state = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(state, dict) and "model" in state:
        state = state["model"]
    return params_from_countseg(state)
