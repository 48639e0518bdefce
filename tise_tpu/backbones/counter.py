"""Object counter for CA: FC-ResNet50 + peak-response counting head.

The reference counts objects with CountSeg's peak-response-mapping model
(counting_alignment/CA.py:131-141: ``modules.fc_resnet50(channels=240)``
wrapped in ``peak_response_mapping(..., peak_stimulation="addedmodule5",
sub_pixel_locating_factor=1)``, weights ``coco14.pt``) and derives counts as
``round(gate(confidence) * spatial_mean(density_map))`` per class
(CA.py:151-166).

TPU reconstruction ("Object Counting and Instance Segmentation with
Image-level Supervision", Cholakkal et al. CVPR'19, which builds on PRM,
"Weakly Supervised Instance Segmentation using Class Peak Response", Zhou et
al. CVPR'18): a torchvision-style ResNet50 trunk, a 1x1 conv producing
240 = 3 contiguous blocks of 80 per-class maps (torch head code slices
blocks, ``maps[:, :C]`` / ``maps[:, C:2C]``): class response maps, density
maps, and an auxiliary block unused by CA.py's count rule.  Class confidence
uses PRM's published peak stimulation *exactly* (``peak_stimulation`` below,
transcription-oracle-tested against a pure-torch PRM PeakStimulation in
tests/test_metric_logic.py): peaks are 3x3-window local maxima filtered by
the per-class spatial median, confidence is the mean response over peaks.
Density integrates by spatial mean (CA.py:152 adaptive_avg_pool2d).  The
reference needs input gradients only for PRM's peak-backprop
*visualisation*; counting is forward-only, so the TPU path has no grad
requirement.  ``head_order`` selects which 80-wide block is CRM vs density —
a coco14.pt layout convention validated at conversion time against real
weights (tools/parity_check.py); the converter maps the trunk tensors 1:1.
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


def peak_stimulation(
    crm: jax.Array, win_size: int = 3, median_filter: bool = True
) -> Tuple[jax.Array, jax.Array]:
    """PRM peak stimulation (PRM pytorch PeakStimulation.forward, defaults
    win_size=3, peak_filter=median): crm [B, C, H, W] -> (confidence [B, C],
    peak_mask [B, C, H, W]).

    A position is a peak when it is the maximum of the ``win_size`` window
    centred on it (out-of-bounds taps are -inf, matching torch's
    ConstantPad2d(-inf) + max_pool2d) AND its response is >= the per-class
    spatial median (torch.median = the lower middle order statistic, index
    ``(n-1)//2``, NOT numpy's midpoint mean — reproduced exactly).
    Confidence is the mean response over peaks.  The sole departure from the
    torch form: on *exact float ties* inside one window torch's
    return_indices argmax keeps only the first (row-major) tied element,
    while this marks all tied maxima — conv-output maps have no exact ties,
    and the transcription oracle (tests/test_metric_logic.py) checks
    tie-free equality to torch.
    """
    f32 = crm.astype(jnp.float32)
    win = jax.lax.reduce_window(
        f32, -jnp.inf, jax.lax.max, (1, 1, win_size, win_size), (1, 1, 1, 1), "SAME"
    )
    peak_mask = f32 >= win
    if median_filter:
        b, c, h, w = crm.shape
        flat = jnp.sort(f32.reshape(b, c, h * w), axis=-1)
        threshold = flat[..., (h * w - 1) // 2][..., None, None]
        peak_mask = peak_mask & (f32 >= threshold)
    fmask = peak_mask.astype(jnp.float32)
    # the global max is always a peak (it is its window's max and >= median),
    # so the count is >= 1; the maximum guard only shields all--inf inputs
    n_peaks = jnp.maximum(jnp.sum(fmask, axis=(2, 3)), 1.0)
    confidence = jnp.sum(f32 * fmask, axis=(2, 3)) / n_peaks
    return confidence.astype(crm.dtype), peak_mask


class FCResNet50PRM(nn.Module):
    """ResNet50 -> 1x1 conv (240) -> (class response, density) block heads."""

    dtype: Any = jnp.float32
    head_order: Tuple[int, int] = (0, 1)  # (class-response block, density block)

    @nn.compact
    def __call__(self, x: jax.Array) -> Tuple[jax.Array, jax.Array]:
        """x: normalized [B, 448, 448, 3] -> (confidence [B, 80],
        density [B, 80, h, w])."""
        feats = ResNet50(dtype=self.dtype, name="backbone")(x)["res5"]  # [B, 14, 14, 2048]
        maps = nn.Conv(NUM_CLASSES * MAPS_PER_CLASS, (1, 1), dtype=self.dtype, name="classifier")(feats)
        maps = maps.transpose(0, 3, 1, 2)  # [B, 240, h, w]
        c0, c1 = self.head_order
        crm = maps[:, c0 * NUM_CLASSES : (c0 + 1) * NUM_CLASSES]  # [B, 80, h, w]
        density = maps[:, c1 * NUM_CLASSES : (c1 + 1) * NUM_CLASSES]
        confidence, _ = peak_stimulation(crm)
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
