"""Numerical-parity runbook against the reference's real checkpoints.

No pretrained weights ship in this image, so in-env parity is proven against
hermetic torch/TF oracles with synthetic weights (tests/).  This script is
the missing half: on the FIRST machine that has the real checkpoints, one
command produces the full backbone-parity table:

    python tools/parity_check.py --all --weights_root /path/to/weights

``--weights_root`` uses the same layout as the orchestrator
(``tise_tpu.benchmark.WEIGHTS`` — the layout the reference's download
scripts create, with converted ``.npz`` siblings accepted).  Checkpoints
that are absent are reported SKIP; every present one runs its check and the
run exits non-zero if any FAILS.

Single-target mode (explicit checkpoint path) is unchanged:

    python tools/parity_check.py damsm-text --ckpt text_encoder200.pth
    python tools/parity_check.py clip --ckpt ViT-B-32.pt
    python tools/parity_check.py inception --ckpt inception_v3_google.pth

Expected tolerances (the PASS thresholds asserted per check):

| target         | oracle (in this env)                      | tolerance |
|----------------|-------------------------------------------|-----------|
| inception      | torch replica, real sd, 5 endpoints       | rel 1e-4  |
| inception-80   | same, 80-class head                       | rel 1e-4  |
| inception-cub  | real-TF slim forward (tests/tf_slim_ref)  | 1e-4      |
| inception-2015 | real-TF 2015 forward (tests/tf2015_ref)   | 1e-4      |
| clip           | torch replica, both towers                | rel 1e-4  |
| damsm-text     | torch packed bi-LSTM, real sd             | abs 1e-4  |
| damsm-image    | torch trunk + emb heads, real sd          | rel 1e-4  |
| detector-soa   | pure-torch R50-FPN forward, real sd       | >=90% detection match (IoU>0.85, score +-0.05), both directions |
| detector-crop  | same                                      | same      |
| counter        | structural (conversion layout is          | finite counts, |
|                | oracle-tested hermetically; the 240-ch    | [B,80] shape   |
|                | head split is a checkpoint convention —   |                |
|                | validate ``head_order`` on real counts)   |                |

Metric-level bit-consistency (the north star): after the backbones pass,
run the orchestrator over the reference's released generated-image sets and
diff the ranking table against the published one:

    python -m tise_tpu.benchmark --track coco --method_name AttnGAN++ \
        --images <released 30k set> --soa_images <soa set> --pa_images <pa set> \
        --data_root data --weights_root weights --output_root results \
        --methods_dir /root/reference/ranking_scores/methods
    diff results/benchmark_results.txt \
        /root/reference/ranking_scores/results/coco_benchmark_results.txt

Expected metric agreement at --precision highest: FID/O-FID to ~1e-3 (fp
reassociation through 2048-dim Frechet), IS*/O-IS to ~1e-3, RP/PA/SOA/CA
exact at the published 2-decimal rounding (integer comparisons over
argmaxes are reassociation-robust; drift quantified in
tests/test_precision_drift.py and the bench drift lines).
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import os
import traceback

import numpy as np


def _hp():
    import jax

    # TPU's default f32 matmul uses bf16 passes (~2e-3 error); parity needs
    # full precision (the metric CLIs default to this via --precision highest)
    jax.config.update("jax_default_matmul_precision", "highest")


def check_damsm_text(ckpt: str) -> None:
    import torch

    import jax.numpy as jnp
    from tise_tpu.backbones import damsm
    from tise_tpu.core import weights as wio

    _hp()
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


def check_damsm_image(ckpt: str) -> None:
    """image_encoder*.pth -> CNNEncoder (inception trunk + nef heads) vs the
    torchvision-free torch replica with the emb heads applied functionally
    (reference encoders.py:133-152)."""
    import torch
    import torch.nn.functional as F

    import jax.numpy as jnp
    from tests.torch_inception_ref import TorchInceptionV3
    from tise_tpu.backbones import damsm
    from tise_tpu.core import weights as wio

    _hp()
    sd_np = wio.load_torch_state_dict(ckpt)
    nef = sd_np["emb_cnn_code.weight"].shape[0]
    params = damsm.cnn_params_from_torch(sd_np)
    model = damsm.CNNEncoder(nef=nef)

    trunk_sd = {k: v for k, v in sd_np.items() if not k.startswith("emb_")}
    num_classes = trunk_sd["fc.weight"].shape[0]
    tmodel = TorchInceptionV3(num_classes=num_classes).eval()
    tensors = {k: torch.from_numpy(np.asarray(v)) for k, v in trunk_sd.items()
               if not k.startswith("AuxLogits")}
    missing, _ = tmodel.load_state_dict(tensors, strict=False)
    if missing:
        print(f"  torch replica missing keys (check layout): {missing[:5]} ...")

    rng = np.random.RandomState(0)
    # feed 299px directly: the encoder's upsample-to-299 becomes the identity
    # on both sides, so resize-flavor differences can't mask weight parity
    x = rng.rand(2, 299, 299, 3).astype(np.float32) * 2 - 1
    j_feat, j_code = model.apply(params, jnp.asarray(x))
    with torch.no_grad():
        ep = tmodel(torch.from_numpy(x).permute(0, 3, 1, 2))
        t_feat = F.conv2d(ep["mixed6e"], torch.from_numpy(sd_np["emb_features.weight"]))
        t_code = F.linear(ep["pool3"], torch.from_numpy(sd_np["emb_cnn_code.weight"]),
                          torch.from_numpy(sd_np["emb_cnn_code.bias"]))
        t_feat = t_feat.permute(0, 2, 3, 1).numpy()
        t_code = t_code.numpy()
    df = np.abs(np.asarray(j_feat) - t_feat).max() / max(np.abs(t_feat).max(), 1e-6)
    dc = np.abs(np.asarray(j_code) - t_code).max() / max(np.abs(t_code).max(), 1e-6)
    print(f"DAMSM image encoder: region features max rel diff {df:.2e}; cnn_code {dc:.2e}")
    assert df < 1e-4 and dc < 1e-4, "DAMSM image parity FAILED"
    print("DAMSM image parity OK (<1e-4)")


def check_clip(ckpt: str) -> None:
    """Converts the OpenAI checkpoint and diffs both towers against the
    torchvision-free torch replica (tests/torch_clip_ref.py), which loads the
    real state_dict directly — a full numerical parity check."""
    import torch

    import jax.numpy as jnp
    from tests.torch_clip_ref import TorchCLIP
    from tise_tpu.backbones import clip_vit
    from tise_tpu.core import weights as wio

    _hp()
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
    with the same real state_dict.  Class count auto-detected (1000-class FID
    backbone and the 80-class O-IS/O-FID fine-tune both land here)."""
    import torch

    import jax.numpy as jnp
    from tests.torch_inception_ref import TorchInceptionV3
    from tise_tpu.core import weights as wio
    from tise_tpu.backbones import inception_v3

    _hp()
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
    print(f"inception parity OK (<1e-4, all endpoints, {num_classes} classes)")


def check_inception_slim(ckpt: str) -> None:
    """IS* CUB slim checkpoint (converted to npz via
    tools/convert_tf_inception.py export_ckpt) vs the REAL-TensorFlow slim
    forward (tests/tf_slim_ref.py) running the same variables."""
    from tests.tf_slim_ref import tf_forward_slim

    import jax
    from tise_tpu.backbones import inception_slim
    from tise_tpu.backbones.inception_v3 import InceptionV3

    _hp()
    variables = dict(np.load(ckpt))
    num_classes = variables[
        next(k for k in variables if k.endswith("logits/logits/weights"))
    ].shape[-1]
    rng = np.random.RandomState(1)
    x = (rng.rand(2, 299, 299, 3).astype(np.float32) - 0.5) * 2  # (v/127.5)-1 upstream

    ref = tf_forward_slim(variables, x)
    params = inception_slim.params_from_slim_vars(variables, num_classes)
    model = InceptionV3(num_classes=num_classes, pool_variant="tf")
    got = jax.jit(lambda p, xx: model.apply(p, xx, endpoints=("mixed6e", "pool3", "logits")))(params, x)
    worst = 0.0
    for ours, theirs in (("mixed6e", "mixed_6e"), ("pool3", "pool3"), ("logits", "logits")):
        d = np.abs(np.asarray(got[ours]) - ref[theirs]).max()
        print(f"  {ours}: max abs diff {d:.2e}")
        worst = max(worst, d)
    assert worst < 1e-4, "slim CUB parity FAILED"
    print(f"slim CUB inception parity OK (<1e-4 vs real TF, {num_classes} classes)")


def check_inception_2015(ckpt: str) -> None:
    """IS* COCO 2015-GraphDef weights (converted to npz via
    tools/convert_tf_inception.py export_pb) vs the REAL-TensorFlow 2015
    forward (tests/tf2015_ref.py) on the same constants."""
    from tests.tf2015_ref import tf_forward_2015

    import jax.numpy as jnp
    from tise_tpu.backbones import inception_slim
    from tise_tpu.backbones.inception_v3 import InceptionV3
    from tise_tpu.ops.preprocess import normalize

    _hp()
    consts = dict(np.load(ckpt))
    missing = inception_slim.missing_2015_names(consts)
    assert not missing, f"2015 npz missing {len(missing)} names, e.g. {missing[:3]}"
    rng = np.random.RandomState(1)
    img_u8 = rng.randint(0, 256, (2, 299, 299, 3)).astype(np.uint8)

    ref = tf_forward_2015(consts, img_u8.astype(np.float32))
    params = inception_slim.params_from_2015_vars(consts)
    model = InceptionV3(num_classes=1008, pool_variant="tf2015")
    x = normalize(jnp.asarray(img_u8), "is_star_2015")
    pool3 = model.apply(params, x, endpoints=("pool3",))["pool3"]
    got = np.asarray(pool3 @ jnp.asarray(consts["softmax/weights"]))
    d = np.abs(got - ref).max()
    print(f"  pre-softmax logits: max abs diff {d:.2e}")
    assert d < 1e-4, "2015 parity FAILED"
    print("2015-GraphDef inception parity OK (<1e-4 vs real TF)")


def check_counter(ckpt: str) -> None:
    """CountSeg coco14.pt through the converter + a 448^2 forward.  No
    independent trunk oracle exists in-env (the conversion layout and the
    PRM peak stimulation are hermetically oracle-tested in
    tests/test_metric_logic.py); with real weights, additionally validate the
    240-channel ``head_order`` convention by eyeballing predicted counts on a
    few known-count images."""
    import jax
    import jax.numpy as jnp
    from tise_tpu.backbones import counter as counter_lib

    _hp()
    params = counter_lib.load_counter_params(ckpt)
    model = counter_lib.FCResNet50PRM()
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(1, 448, 448, 3).astype(np.float32))
    conf, density = jax.jit(model.apply)(params, x)  # peak stimulation inside
    counts = counter_lib.predict_counts(np.asarray(conf), np.asarray(density))
    assert counts.shape == (1, 80) and np.isfinite(counts).all()
    print(f"counter forward OK: confidence {tuple(conf.shape)}, density {tuple(density.shape)}, "
          f"counts finite, max {counts.max():.3f}")
    print("NOTE: validate head_order against known-count images (ROADMAP.md).")


def check_detection(ckpt: str, size: int = 320) -> None:
    """Loads the detectron2 pkl through our converter and compares the full
    static-shape forward against the pure-torch R50-FPN-RCNN replica
    (tests/torch_rcnn_ref.py) running the SAME real state_dict: detections
    must match >=90% in both directions (same class, IoU>0.85, score
    +-0.05) — the criterion detection-stack changes are held to in
    tests/test_detection.py."""
    import pickle

    import jax
    import jax.numpy as jnp
    from tests.torch_rcnn_ref import torch_forward
    from tise_tpu.backbones.detection import ops
    from tise_tpu.backbones.detection.predictor import PIXEL_MEAN_BGR
    from tise_tpu.backbones.detection.rcnn import FasterRCNN
    from tise_tpu.backbones.detection.weights import params_from_detectron2

    _hp()
    with open(ckpt, "rb") as f:  # raw sd: the torch oracle needs it too
        raw = pickle.load(f, encoding="latin1")
    sd = {k: np.asarray(v) for k, v in (raw["model"] if "model" in raw else raw).items()
          if not k.startswith("roi_heads.mask_head")}
    rng = np.random.RandomState(0)
    # structured blobs, not iid noise: real weights produce detections on
    # object-like contrast, and matched boxes are what the check compares
    img = np.full((size, size, 3), 110.0, np.float32)
    for i in range(4):
        y, x0 = rng.randint(20, size - 84, 2)
        img[y : y + 64, x0 : x0 + 64] = rng.randint(0, 256, 3)
    img_norm = img[..., ::-1] - np.asarray(PIXEL_MEAN_BGR, np.float32)  # BGR mean sub

    ref = torch_forward(sd, img_norm.transpose(2, 0, 1))
    det = jax.jit(FasterRCNN().apply)(params_from_detectron2(sd), jnp.asarray(img_norm))
    ours = [
        (int(det.classes[i]), np.asarray(det.boxes[i]), float(det.scores[i]))
        for i in range(det.valid.shape[0])
        if bool(det.valid[i])
    ]
    theirs = ref["detections"]
    print(f"  detections: ours {len(ours)}, torch oracle {len(theirs)}")

    def matched(a, b):
        hits = 0
        for ca, ba, sa in a:
            for cb, bb, sb in b:
                if ca != cb or abs(sa - sb) > 0.05:
                    continue
                iou = float(np.asarray(ops.box_iou(jnp.asarray(ba[None]), jnp.asarray(bb[None])))[0, 0])
                if iou > 0.85:
                    hits += 1
                    break
        return hits / max(len(a), 1)

    if not theirs and not ours:
        print("detection parity: no detections either side on the probe image "
              "(weights load + forward OK; rerun with real photos for a match rate)")
        return
    m_ab, m_ba = matched(ours, theirs), matched(theirs, ours)
    print(f"  match rate ours->torch {m_ab:.2f}, torch->ours {m_ba:.2f}")
    assert m_ab >= 0.9 and m_ba >= 0.9, "detection parity FAILED (<90% match)"
    print("detection parity OK (>=90% both directions)")


#: --all registry: check key -> (fn, weights-layout relpath).  Relpaths match
#: tise_tpu.benchmark.WEIGHTS (the reference download layout); converted .npz
#: siblings are accepted via benchmark.resolve_weight.
def _registry():
    from tise_tpu.benchmark import WEIGHTS

    return [
        ("inception", check_inception, WEIGHTS["inception"]),
        ("inception-80", check_inception, WEIGHTS["inception_80"]),
        ("inception-cub", check_inception_slim, WEIGHTS["inception_cub"]),
        ("inception-2015", check_inception_2015, WEIGHTS["inception_2015"]),
        ("clip", check_clip, WEIGHTS["clip"]),
        ("damsm-text", check_damsm_text, WEIGHTS["damsm_text"]),
        ("damsm-image", check_damsm_image, WEIGHTS["damsm_image"]),
        ("detector-soa", check_detection, WEIGHTS["detector_soa"]),
        ("detector-crop", check_detection, WEIGHTS["detector_crop"]),
        ("counter", check_counter, WEIGHTS["counter"]),
    ]


def run_all(weights_root: str, only=None) -> dict:
    """Run every check whose checkpoint exists under ``weights_root``;
    returns {name: "OK" | "SKIP" | "FAIL"} and prints the summary table."""
    from tise_tpu.benchmark import resolve_weight

    results = {}
    for name, fn, rel in _registry():
        if only and name not in only:
            continue
        path = resolve_weight(os.path.join(weights_root, rel))
        if not os.path.exists(path):
            results[name] = "SKIP"
            print(f"==== {name}: SKIP (no {rel})")
            continue
        print(f"==== {name}: {path}")
        try:
            fn(path)
            results[name] = "OK"
        except Exception:  # noqa: BLE001 — keep the table complete
            traceback.print_exc()
            results[name] = "FAIL"
    width = max(len(n) for n in results) if results else 10
    print("\n==== parity summary ====")
    for n, r in results.items():
        print(f"  {n:<{width}}  {r}")
    n_fail = sum(1 for r in results.values() if r == "FAIL")
    n_ok = sum(1 for r in results.values() if r == "OK")
    print(f"  {n_ok} OK / {n_fail} FAIL / {len(results) - n_ok - n_fail} SKIP")
    if n_ok and not n_fail:
        print("next: run the metric-level bit-consistency check (module docstring).")
    return results


CHECKS = {
    "damsm-text": check_damsm_text,
    "damsm-image": check_damsm_image,
    "clip": check_clip,
    "inception": check_inception,
    "inception-cub": check_inception_slim,
    "inception-2015": check_inception_2015,
    "counter": check_counter,
    "detection": check_detection,
}


def main() -> None:
    p = argparse.ArgumentParser(description="backbone parity runbook (see module docstring)")
    p.add_argument("target", nargs="?", choices=sorted(CHECKS), help="single check to run")
    p.add_argument("--ckpt", help="checkpoint path (single-target mode)")
    p.add_argument("--all", action="store_true", help="run every check over --weights_root")
    p.add_argument("--weights_root", default="weights",
                   help="reference-layout weights dir (tise_tpu.benchmark.WEIGHTS)")
    p.add_argument("--only", default="", help="comma-separated check names for --all")
    args = p.parse_args()
    if args.all:
        only = {s.strip() for s in args.only.split(",")} if args.only else None
        results = run_all(args.weights_root, only=only)
        raise SystemExit(1 if any(r == "FAIL" for r in results.values()) else 0)
    if not args.target or not args.ckpt:
        p.error("single-target mode needs TARGET and --ckpt (or use --all)")
    CHECKS[args.target](args.ckpt)


if __name__ == "__main__":
    main()
