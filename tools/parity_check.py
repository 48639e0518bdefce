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
    """Converts the OpenAI checkpoint and reports embedding norms (full torch
    reference forward requires the clip package; structural check only)."""
    import jax
    import jax.numpy as jnp
    from tise_tpu.backbones import clip_vit

    params = clip_vit.load_params(ckpt)
    model = clip_vit.CLIP()
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(1, 224, 224, 3).astype(np.float32))
    tok = np.zeros((1, 77), np.int32)
    tok[0, :4] = [49406, 320, 1929, 49407]  # "a photo"-ish framing
    li, _ = model.apply(params, img, jnp.asarray(tok))
    print(f"CLIP forward OK, logit: {float(li[0, 0]):.4f}")


def check_inception(ckpt: str) -> None:
    import jax
    import jax.numpy as jnp
    from tise_tpu.core import weights as wio
    from tise_tpu.backbones import inception_v3

    params = wio.load_inception_params(ckpt)
    model = inception_v3.InceptionV3()
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(1, 299, 299, 3).astype(np.float32) * 2 - 1)
    out = model.apply(params, x, endpoints=("pool3", "logits"))
    probs = np.asarray(jax.nn.softmax(out["logits"]))
    print(f"inception forward OK; top-1 prob {probs.max():.4f}, pool3 norm {np.linalg.norm(out['pool3']):.2f}")
    try:
        from torchvision import models  # noqa

        print("torchvision present: extend this check with a full torch-side diff")
    except ImportError:
        print("torchvision absent: numerical diff vs torch must run in the reference env")


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("target", choices=["damsm-text", "clip", "inception"])
    p.add_argument("--ckpt", required=True)
    args = p.parse_args()
    {"damsm-text": check_damsm_text, "clip": check_clip, "inception": check_inception}[args.target](args.ckpt)


if __name__ == "__main__":
    main()
