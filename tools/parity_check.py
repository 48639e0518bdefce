"""Numerical-parity harness against the reference's torch backbones.

Given the real checkpoints (not shipped in this image), this script converts
them with the framework's loaders and diffs our Flax forward against a torch
forward on the same inputs — the float-tolerance check BASELINE.json asks
for.  torch-CPU is available; torchvision is NOT, so the torch side rebuilds
the minimal modules from the state_dict where needed (DAMSM LSTM is pure
torch and runs directly; full inception torch-side needs torchvision and is
skipped with a message when absent).

    python tools/parity_check.py damsm-text --ckpt text_encoder200.pth
    python tools/parity_check.py clip --ckpt ViT-B-32.pt
    python tools/parity_check.py inception --ckpt inception_v3_google.pth
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse

import numpy as np


def check_damsm_text(ckpt: str) -> None:
    import torch

    import jax
    import jax.numpy as jnp
    from tise_tpu.backbones import damsm
    from tise_tpu.core import weights as wio

    # TPU's default f32 matmul uses bf16 passes (~2e-3 error); parity needs
    # full precision (the metric CLIs default to this via --precision highest)
    jax.config.update("jax_default_matmul_precision", "highest")

    sd_np = wio.load_torch_state_dict(ckpt)
    ntoken, ninput = sd_np["encoder.weight"].shape
    nhidden = sd_np["rnn.weight_hh_l0"].shape[1]

    params = damsm.rnn_params_from_torch(sd_np)
    model = damsm.RNNEncoder(ntoken=ntoken, ninput=ninput, nhidden=nhidden)

    rng = np.random.RandomState(0)
    b, t = 4, 12
    lens = np.sort(rng.randint(3, t + 1, b))[::-1].copy()
    caps = np.zeros((b, t), np.int64)
    for i, l in enumerate(lens):
        caps[i, :l] = rng.randint(1, ntoken, l)

    words, sent = model.apply(params, jnp.asarray(caps.astype(np.int32)), jnp.asarray(lens.astype(np.int32)))

    # torch side: embedding + packed bi-LSTM straight from the state_dict
    emb = torch.nn.Embedding(ntoken, ninput)
    lstm = torch.nn.LSTM(ninput, nhidden, 1, batch_first=True, bidirectional=True)
    with torch.no_grad():
        emb.weight.copy_(torch.from_numpy(sd_np["encoder.weight"]))
        for k in ["weight_ih_l0", "weight_hh_l0", "bias_ih_l0", "bias_hh_l0"]:
            getattr(lstm, k).copy_(torch.from_numpy(sd_np[f"rnn.{k}"]))
            getattr(lstm, k + "_reverse").copy_(torch.from_numpy(sd_np[f"rnn.{k}_reverse"]))
        x = emb(torch.from_numpy(caps))
        packed = torch.nn.utils.rnn.pack_padded_sequence(x, lens.tolist(), batch_first=True)
        out, (h_n, _) = lstm(packed)
        out, _ = torch.nn.utils.rnn.pad_packed_sequence(out, batch_first=True, total_length=t)
        words_ref = out.transpose(1, 2).numpy()
        sent_ref = h_n.transpose(0, 1).contiguous().view(b, -1).numpy()

    w_err = np.abs(np.asarray(words) - words_ref).max()
    s_err = np.abs(np.asarray(sent) - sent_ref).max()
    print(f"DAMSM text encoder: max |words| err {w_err:.2e}, max |sent| err {s_err:.2e}")
    assert w_err < 1e-4 and s_err < 1e-4, "parity failure"


def check_clip(ckpt: str) -> None:
    """Converts the OpenAI checkpoint and diffs both towers against the
    torchvision-free torch replica (tests/torch_clip_ref.py), which loads the
    real state_dict directly — a full numerical parity check."""
    import torch

    import jax
    import jax.numpy as jnp
    from tests.torch_clip_ref import TorchCLIP
    from tise_tpu.backbones import clip_vit
    from tise_tpu.core import weights as wio

    jax.config.update("jax_default_matmul_precision", "highest")
    sd_np = wio.load_torch_state_dict(ckpt)
    params = clip_vit.params_from_openai_state_dict(sd_np)
    model = clip_vit.CLIP()

    tmodel = TorchCLIP().eval()
    missing, unexpected = tmodel.load_state_dict(
        {k: torch.from_numpy(np.asarray(v)) for k, v in sd_np.items()}, strict=False
    )
    if missing:
        print(f"  torch replica missing keys (check layout): {missing[:5]} ...")

    rng = np.random.RandomState(0)
    img = rng.rand(2, 224, 224, 3).astype(np.float32) * 2 - 1
    tok = np.zeros((2, 77), np.int64)
    tok[:, :4] = [49406, 320, 1929, 49407]
    j_img = np.asarray(model.apply(params, jnp.asarray(img), method=model.encode_image))
    j_txt = np.asarray(model.apply(params, jnp.asarray(tok.astype(np.int32)), method=model.encode_text))
    with torch.no_grad():
        t_img = tmodel.encode_image(torch.from_numpy(img).permute(0, 3, 1, 2)).numpy()
        t_txt = tmodel.encode_text(torch.from_numpy(tok)).numpy()
    di = np.abs(j_img - t_img).max() / max(np.abs(t_img).max(), 1e-6)
    dt = np.abs(j_txt - t_txt).max() / max(np.abs(t_txt).max(), 1e-6)
    print(f"CLIP image tower max rel diff {di:.2e}; text tower {dt:.2e}")
    assert di < 1e-4 and dt < 1e-4, "CLIP parity FAILED"
    print("CLIP parity OK (<1e-4)")


def check_inception(ckpt: str) -> None:
    """Converts the torchvision checkpoint and diffs every endpoint against
    the torchvision-free torch replica (tests/torch_inception_ref.py) loaded
    with the same real state_dict."""
    import torch

    import jax
    import jax.numpy as jnp
    from tests.torch_inception_ref import TorchInceptionV3
    from tise_tpu.core import weights as wio
    from tise_tpu.backbones import inception_v3

    jax.config.update("jax_default_matmul_precision", "highest")
    sd_np = wio.load_torch_state_dict(ckpt)
    params = wio.load_inception_params(ckpt)
    num_classes = sd_np["fc.weight"].shape[0]
    model = inception_v3.InceptionV3(num_classes=num_classes)

    tmodel = TorchInceptionV3(num_classes=num_classes).eval()
    tensors = {k: torch.from_numpy(np.asarray(v)) for k, v in sd_np.items()
               if not k.startswith("AuxLogits")}
    missing, unexpected = tmodel.load_state_dict(tensors, strict=False)
    if missing:
        print(f"  torch replica missing keys (check layout): {missing[:5]} ...")

    rng = np.random.RandomState(0)
    x = rng.rand(2, 299, 299, 3).astype(np.float32) * 2 - 1
    ours = model.apply(params, jnp.asarray(x), endpoints=("maxpool1", "maxpool2", "mixed6e", "pool3", "logits"))
    with torch.no_grad():
        theirs = tmodel(torch.from_numpy(x).permute(0, 3, 1, 2))
    worst = 0.0
    for name, val in ours.items():
        t = theirs[name].numpy()
        if t.ndim == 4:
            t = np.transpose(t, (0, 2, 3, 1))  # NCHW -> NHWC
        d = np.abs(np.asarray(val) - t).max() / max(np.abs(t).max(), 1e-6)
        print(f"  {name}: max rel diff {d:.2e}")
        worst = max(worst, d)
    assert worst < 1e-4, "inception parity FAILED"
    print("inception parity OK (<1e-4, all endpoints)")


def check_detection(ckpt: str) -> None:
    """Loads the detectron2 pkl through our converter and runs the full
    static-shape forward.  No independent oracle exists in this image
    (detectron2 absent) — structural + sanity check; the ROI postprocess is
    separately parity-tested against a sequential reference
    (tests/test_detection.py), and real-output box comparison must run in
    the reference env."""
    import jax.numpy as jnp
    from tise_tpu.backbones.detection.predictor import TPUDetector

    det = TPUDetector(ckpt, batch_size=1)
    rng = np.random.RandomState(0)
    img = rng.randint(0, 256, (1, 800, 800, 3)).astype(np.uint8)
    boxes, scores, classes, valid = det.detect_batch(img)
    n = int(valid.sum())
    print(f"detection forward OK; {n} detections, "
          f"top score {scores.max():.3f}" if n else "detection forward OK; no detections >0.5")


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("target", choices=["damsm-text", "clip", "inception", "detection"])
    p.add_argument("--ckpt", required=True)
    args = p.parse_args()
    {"damsm-text": check_damsm_text, "clip": check_clip, "inception": check_inception,
     "detection": check_detection}[args.target](args.ckpt)


if __name__ == "__main__":
    main()
