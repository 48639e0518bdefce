"""ResNet-50 + FPN backbone for the detection stack (NHWC, frozen BN).

The reference delegates detection to detectron2's Mask R-CNN R50-FPN-3x
(object_fidelity/crop_object.py:18-23, semantic_object_accuracy/SOA.py:18-23).
This is the TPU-native equivalent of its backbone: detectron2-compatible
ResNet-50 (FrozenBatchNorm == per-channel affine, caffe-style stem) with a
P2..P6 FPN.  Weights convert from the detectron2 checkpoint via
``tise_tpu/backbones/detection/weights.py``.
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class ConvFrozenBN(nn.Module):
    """conv (no bias) + frozen BN affine (+ optional relu)."""

    features: int
    kernel: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    padding: Any = "SAME"
    relu: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = nn.Conv(
            self.features, self.kernel, strides=self.strides, padding=self.padding,
            use_bias=False, dtype=self.dtype, name="conv",
        )(x)
        scale = self.param("bn_scale", nn.initializers.ones, (self.features,))
        bias = self.param("bn_bias", nn.initializers.zeros, (self.features,))
        x = x * scale.astype(self.dtype) + bias.astype(self.dtype)
        return nn.relu(x) if self.relu else x


class Bottleneck(nn.Module):
    """1x1 -> 3x3 -> 1x1 bottleneck with projection shortcut on stride/width
    change (detectron2 BottleneckBlock; stride lives on the 3x3)."""

    features: int  # bottleneck width
    out_features: int
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        d = self.dtype
        shortcut = x
        if x.shape[-1] != self.out_features or self.stride != 1:
            shortcut = ConvFrozenBN(
                self.out_features, (1, 1), (self.stride, self.stride), relu=False, dtype=d, name="shortcut"
            )(x)
        y = ConvFrozenBN(self.features, (1, 1), dtype=d, name="conv1")(x)
        y = ConvFrozenBN(
            self.features, (3, 3), (self.stride, self.stride), padding=((1, 1), (1, 1)), dtype=d, name="conv2"
        )(y)
        y = ConvFrozenBN(self.out_features, (1, 1), relu=False, dtype=d, name="conv3")(y)
        return nn.relu(y + shortcut)


class ResNet50(nn.Module):
    """Caffe-style R50 returning {res2..res5} feature maps."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> Dict[str, jax.Array]:
        d = self.dtype
        x = ConvFrozenBN(64, (7, 7), (2, 2), padding=((3, 3), (3, 3)), dtype=d, name="stem")(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        # the stem endpoint is exposed for stage ablation (tools/det_ablate.py
        # --stages stem,...): consumers that ignore it cost nothing (XLA DCE)
        out: Dict[str, jax.Array] = {"stem": x}
        stage_defs = [("res2", 64, 256, 3, 1), ("res3", 128, 512, 4, 2), ("res4", 256, 1024, 6, 2), ("res5", 512, 2048, 3, 2)]
        for name, width, out_ch, blocks, stride in stage_defs:
            for i in range(blocks):
                x = Bottleneck(
                    width, out_ch, stride=stride if i == 0 else 1, dtype=d, name=f"{name}_{i}"
                )(x)
            out[name] = x
        return out


class FPN(nn.Module):
    """Lateral 1x1 + top-down sum + 3x3 output convs -> P2..P5, plus P6 by
    stride-2 max pool on P5 (detectron2 LastLevelMaxPool)."""

    out_channels: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: Dict[str, jax.Array]) -> List[jax.Array]:
        d = self.dtype
        names = ["res2", "res3", "res4", "res5"]
        laterals = [
            nn.Conv(self.out_channels, (1, 1), dtype=d, name=f"lateral{i+2}")(feats[n])
            for i, n in enumerate(names)
        ]
        # top-down: upsample by 2 (nearest) and add
        for i in range(len(laterals) - 2, -1, -1):
            up = laterals[i + 1]
            b, h, w, c = up.shape
            up = jnp.broadcast_to(up[:, :, None, :, None, :], (b, h, 2, w, 2, c)).reshape(b, 2 * h, 2 * w, c)
            th, tw = laterals[i].shape[1:3]
            laterals[i] = laterals[i] + up[:, :th, :tw]
        outputs = [
            nn.Conv(self.out_channels, (3, 3), padding=((1, 1), (1, 1)), dtype=d, name=f"output{i+2}")(lat)
            for i, lat in enumerate(laterals)
        ]
        p6 = nn.max_pool(outputs[-1], (1, 1), strides=(2, 2))
        outputs.append(p6)
        return outputs  # [P2, P3, P4, P5, P6], strides 4..64
