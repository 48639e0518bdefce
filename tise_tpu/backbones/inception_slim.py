"""IS* backbones: the TF-slim / 2015-frozen-graph InceptionV3 flavors.

The reference's two IS* scripts use TF-1 backbones:
  * CUB: the vendored TF-slim inception_v3 fine-tuned to 50 bird classes + 1
    background (image_realism/IS/bird/inception_score_star_bird.py:181-201,
    EMA-restored checkpoint, logits sliced to drop class 0);
  * COCO: the frozen 2015 ImageNet GraphDef, logits reconstructed as
    pool3 @ W without bias over 1008 classes
    (image_realism/IS/coco/inception_score_star_coco.py:104-108).

Both share the inception-v3 topology this package already implements in Flax
(tise_tpu/backbones/inception_v3.py — torchvision's port of the same slim
graph); the slim flavor differs only in names and in BatchNorm having no
learned scale (gamma == 1).  This module provides the checkpoint-name
mapping from slim variable names / 2015 graph node names onto that trunk and
the extractor constructors the IS* metric uses.

Checkpoints are consumed as .npz (TF var name -> array).  Conversion from a
native TF checkpoint/GraphDef happens offline (TF is not a dependency of this
framework); tools/convert_tf_inception.py documents the export.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import jax.numpy as jnp
import numpy as np

from tise_tpu.backbones.inception_v3 import InceptionV3
from tise_tpu.metrics.extractor import BatchedExtractor

#: slim scope -> flax module for the stem convs
_STEM = {
    "conv0": "Conv2d_1a_3x3",
    "conv1": "Conv2d_2a_3x3",
    "conv2": "Conv2d_2b_3x3",
    "conv3": "Conv2d_3b_1x1",
    "conv4": "Conv2d_4a_3x3",
}

#: slim mixed-block scope -> flax module
_MIXED = {
    "mixed_35x35x256a": "Mixed_5b",
    "mixed_35x35x288a": "Mixed_5c",
    "mixed_35x35x288b": "Mixed_5d",
    "mixed_17x17x768a": "Mixed_6a",
    "mixed_17x17x768b": "Mixed_6b",
    "mixed_17x17x768c": "Mixed_6c",
    "mixed_17x17x768d": "Mixed_6d",
    "mixed_17x17x768e": "Mixed_6e",
    "mixed_8x8x1280a": "Mixed_7a",
    "mixed_8x8x2048a": "Mixed_7b",
    "mixed_8x8x2048b": "Mixed_7c",
}

#: per flax block: slim branch conv scope -> flax BasicConv2d name.
#: slim auto-names sequential ops.conv2d calls Conv, Conv_1, Conv_2, ...
_BRANCHES: Dict[str, Dict[str, str]] = {
    # InceptionA (Mixed_5b/c/d)
    "A": {
        "branch1x1/Conv": "branch1x1",
        "branch5x5/Conv": "branch5x5_1",
        "branch5x5/Conv_1": "branch5x5_2",
        "branch3x3dbl/Conv": "branch3x3dbl_1",
        "branch3x3dbl/Conv_1": "branch3x3dbl_2",
        "branch3x3dbl/Conv_2": "branch3x3dbl_3",
        "branch_pool/Conv": "branch_pool",
    },
    # InceptionB (Mixed_6a)
    "B": {
        "branch3x3/Conv": "branch3x3",
        "branch3x3dbl/Conv": "branch3x3dbl_1",
        "branch3x3dbl/Conv_1": "branch3x3dbl_2",
        "branch3x3dbl/Conv_2": "branch3x3dbl_3",
    },
    # InceptionC (Mixed_6b..e)
    "C": {
        "branch1x1/Conv": "branch1x1",
        "branch7x7/Conv": "branch7x7_1",
        "branch7x7/Conv_1": "branch7x7_2",
        "branch7x7/Conv_2": "branch7x7_3",
        "branch7x7dbl/Conv": "branch7x7dbl_1",
        "branch7x7dbl/Conv_1": "branch7x7dbl_2",
        "branch7x7dbl/Conv_2": "branch7x7dbl_3",
        "branch7x7dbl/Conv_3": "branch7x7dbl_4",
        "branch7x7dbl/Conv_4": "branch7x7dbl_5",
        "branch_pool/Conv": "branch_pool",
    },
    # InceptionD (Mixed_7a)
    "D": {
        "branch3x3/Conv": "branch3x3_1",
        "branch3x3/Conv_1": "branch3x3_2",
        "branch7x7x3/Conv": "branch7x7x3_1",
        "branch7x7x3/Conv_1": "branch7x7x3_2",
        "branch7x7x3/Conv_2": "branch7x7x3_3",
        "branch7x7x3/Conv_3": "branch7x7x3_4",
    },
    # InceptionE (Mixed_7b/c)
    "E": {
        "branch1x1/Conv": "branch1x1",
        "branch3x3/Conv": "branch3x3_1",
        "branch3x3/Conv_1": "branch3x3_2a",
        "branch3x3/Conv_2": "branch3x3_2b",
        "branch3x3dbl/Conv": "branch3x3dbl_1",
        "branch3x3dbl/Conv_1": "branch3x3dbl_2",
        "branch3x3dbl/Conv_2": "branch3x3dbl_3a",
        "branch3x3dbl/Conv_3": "branch3x3dbl_3b",
        "branch_pool/Conv": "branch_pool",
    },
}

_BLOCK_KIND = {
    "Mixed_5b": "A",
    "Mixed_5c": "A",
    "Mixed_5d": "A",
    "Mixed_6a": "B",
    "Mixed_6b": "C",
    "Mixed_6c": "C",
    "Mixed_6d": "C",
    "Mixed_6e": "C",
    "Mixed_7a": "D",
    "Mixed_7b": "E",
    "Mixed_7c": "E",
}


def _conv_entry(flat: Mapping[str, np.ndarray], scope: str) -> Dict[str, Any]:
    """slim '<scope>/{weights,BatchNorm/*}' -> BasicConv2d params.

    slim BatchNorm has beta/moving stats but no gamma (scale=1); kernels are
    already HWIO.
    """
    w = np.asarray(flat[f"{scope}/weights"])
    mean = np.asarray(flat[f"{scope}/BatchNorm/moving_mean"])
    var = np.asarray(flat[f"{scope}/BatchNorm/moving_variance"])
    beta = np.asarray(flat[f"{scope}/BatchNorm/beta"])
    gamma_key = f"{scope}/BatchNorm/gamma"
    gamma = np.asarray(flat[gamma_key]) if gamma_key in flat else np.ones_like(beta)
    return {
        "conv": {"kernel": w},
        "bn_scale": gamma,
        "bn_bias": beta,
        "bn_mean": mean,
        "bn_var": var,
    }


def params_from_slim_vars(flat: Mapping[str, np.ndarray], num_classes: int) -> Dict[str, Any]:
    """slim checkpoint variables (prefix 'inception_v3/' optional, EMA shadow
    suffixes already resolved by the exporter) -> flax param pytree."""
    flat = {k.split("inception_v3/")[-1]: v for k, v in flat.items()}
    params: Dict[str, Any] = {}
    for scope, mod in _STEM.items():
        params[mod] = _conv_entry(flat, scope)
    for scope, mod in _MIXED.items():
        block: Dict[str, Any] = {}
        for sub, name in _BRANCHES[_BLOCK_KIND[mod]].items():
            block[name] = _conv_entry(flat, f"{scope}/{sub}")
        params[mod] = block
    # slim fc: 'logits/logits/{weights,biases}'
    if "logits/logits/weights" in flat:
        params["fc"] = {
            "kernel": np.asarray(flat["logits/logits/weights"]),
            "bias": np.asarray(flat["logits/logits/biases"]),
        }
    elif num_classes:
        raise KeyError("slim checkpoint missing logits/logits/weights")
    return {"params": params}


def load_slim_npz(path: str, num_classes: int) -> Dict[str, Any]:
    with np.load(path, allow_pickle=False) as f:
        flat = {k: f[k] for k in f.files}
    return params_from_slim_vars(flat, num_classes)


def make_logits_extractor(
    weights_path: str, flavor: str, mesh=None, dtype=jnp.float32
) -> BatchedExtractor:
    """Extractor producing the IS* 'logits' (post background-slice for CUB,
    pool3 @ W for COCO); preprocess recipe (b): /127.5 - 1."""
    if flavor == "cub":
        # 51-way fc; background class 0 sliced off (inception_score_star_bird.py:189)
        params = load_slim_npz(weights_path, num_classes=51)
        model = InceptionV3(num_classes=51, dtype=dtype)

        def apply_fn(p, x):
            out = model.apply(p, x, endpoints=("logits",))
            return {"logits": out["logits"][:, 1:]}

    elif flavor == "coco":
        # 2015 frozen graph: logits = pool3 @ W, no bias, 1008 classes
        # (inception_score_star_coco.py:104-105); the exporter stores the
        # trunk under slim-style names plus 'softmax/weights'.
        with np.load(weights_path, allow_pickle=False) as f:
            flat = {k: f[k] for k in f.files}
        softmax_w = np.asarray(flat.pop("softmax/weights"))
        params = params_from_slim_vars(flat, num_classes=0)
        model = InceptionV3(num_classes=1008, dtype=dtype)
        w = jnp.asarray(softmax_w, dtype)

        def apply_fn(p, x):
            out = model.apply(p, x, endpoints=("pool3",))
            return {"logits": out["pool3"] @ w}

    else:
        raise ValueError(flavor)
    return BatchedExtractor(apply_fn, params, recipe="is_star", mesh=mesh)
