"""Checkpoint loading/conversion utilities.

Weights come from three worlds:
  * torch ``state_dict`` files (.pth) — the reference's pretrained backbones
    (torchvision InceptionV3, DAMSM encoders, O-IS fine-tune, CLIP).
    torch-CPU is available for deserialisation only; tensors are converted to
    numpy and never touch torch compute.
  * ``.npz`` pytrees — our portable converted format (flat {'/'-joined path:
    array}).
  * orbax checkpoints — our own training output.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Mapping

import numpy as np


def flatten_pytree(tree: Mapping[str, Any], prefix: str = "") -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    for k, v in tree.items():
        key = f"{prefix}/{k}" if prefix else str(k)
        if isinstance(v, Mapping):
            out.update(flatten_pytree(v, key))
        else:
            out[key] = np.asarray(v)
    return out


def unflatten_pytree(flat: Mapping[str, np.ndarray]) -> Dict[str, Any]:
    tree: Dict[str, Any] = {}
    for key, v in flat.items():
        node = tree
        parts = key.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = np.asarray(v)
    return tree


def save_pytree_npz(path: str, tree: Mapping[str, Any]) -> None:
    d = os.path.dirname(path)
    if d:
        os.makedirs(d, exist_ok=True)
    np.savez(path, **flatten_pytree(tree))


def load_pytree_npz(path: str) -> Dict[str, Any]:
    with np.load(path, allow_pickle=False) as f:
        return unflatten_pytree({k: f[k] for k in f.files})


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Deserialize a torch .pth checkpoint to numpy arrays (CPU, no grad)."""
    import torch

    state = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(state, dict) and "state_dict" in state:
        state = state["state_dict"]
    out = {}
    for k, v in state.items():
        out[k] = v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)
    return out


def load_inception_params(path: str, num_classes: int = 1000) -> Dict[str, Any]:
    """Load InceptionV3 params from .npz (converted) or .pth (torchvision)."""
    from tise_tpu.backbones import inception_v3

    if path.endswith(".npz"):
        return load_pytree_npz(path)
    state = load_torch_state_dict(path)
    return inception_v3.params_from_torch_state_dict(state, num_classes=num_classes)
