"""Orchestrator end-to-end against the REAL metric CLIs.

tests/test_benchmark.py proves the orchestrator's plumbing with stubbed
metric mains; this module runs the actual CLIs (their argv parsers, weight
loaders, backbones, result writers) over a synthetic data/weights layout
with random-init weights — the only thing that catches argv drift between
the orchestrator and a CLI parser, or a loader rejecting the converted-npz
layout the orchestrator resolves to.  Values are random-weight garbage;
asserted finite + present, not meaningful.

Covered stages: COCO fid / is_star(2015 graph) / rp(CLIP) / pa(CLIP) /
ca(PRM counter), CUB fid / is_star(slim) / rp(DAMSM).  The detection stages
(soa, crop -> o_is/o_fid) compile an 800px R50-FPN — minutes on CPU — and
their CLI paths are exercised by tests/test_detection.py + test_full_bag.py;
here they are gated off via --only.
"""

import gzip
import json
import os
import pickle

import numpy as np
import pytest
from PIL import Image
from tf_slim_ref import random_slim_vars

from tise_tpu import benchmark

N_IMAGES = 24  # >= 10 so every RP/IS split bin is non-empty
BATCH = 4


def _write_images(d, ids, size=64, seed=0):
    os.makedirs(d, exist_ok=True)
    rng = np.random.RandomState(seed)
    for i in ids:
        Image.fromarray(rng.randint(0, 256, (size, size, 3)).astype(np.uint8)).save(
            os.path.join(d, f"{i}.png")
        )


@pytest.fixture(scope="module")
def layout(tmp_path_factory):
    """The standard --data_root/--weights_root layout with synthetic inputs
    and random-init converted (.npz) weights under the documented names."""
    import jax

    from tise_tpu.backbones import clip_vit, counter as counter_lib, damsm, inception_v3
    from tise_tpu.core import weights as wio

    root = tmp_path_factory.mktemp("bagworld")
    data, weights = root / "data", root / "weights"
    ids = list(range(N_IMAGES))

    # ---- images ----
    _write_images(str(root / "gen"), ids)
    for phrase in ("left", "right"):
        _write_images(str(root / "pa" / phrase), ids[:5], seed=hash(phrase) % 1000)

    # ---- data: caption pickles + reference stats npz ----
    def put(key, obj):
        path = data / benchmark.DATA[key]
        os.makedirs(path.parent, exist_ok=True)
        with open(path, "wb") as f:
            pickle.dump(obj, f)

    put("coco_rp_captions", [
        {"caption_id": i, "caption": f"a photo number {i}",
         "mismatched_captions": [f"wrong caption {j}" for j in range(99)]}
        for i in ids[:10]
    ])
    put("pa_captions", {
        phrase: [
            {"caption_id": i, "caption": f"a dog {phrase} of a cat",
             "false_caption": f"a dog {other} of a cat"}
            for i in ids[:5]
        ]
        for phrase, other in (("left", "right"), ("right", "left"))
    })
    put("ca_captions", [
        {"caption_id": i, "caption": "two dogs", "counting_info": {"dog": 2.0}}
        for i in ids[:8]
    ])
    rng = np.random.RandomState(0)
    a = rng.randn(2048, 32)
    sigma = a @ a.T / 32 + np.eye(2048)
    for key in ("coco_fid_stats", "cub_fid_stats"):
        path = data / benchmark.DATA[key]
        os.makedirs(path.parent, exist_ok=True)
        np.savez(path, mu=rng.randn(2048), sigma=sigma)
    # CUB vocab pickle: entries 2/3 are (ixtoword, wordtoix) (RP_cub.py:33-37)
    vocab = ["<end>", "this", "bird", "has", "a", "red", "wing", "and", "tail"]
    ixtoword = dict(enumerate(vocab))
    wordtoix = {w: i for i, w in ixtoword.items()}
    put("cub_captions_pickle", [None, None, ixtoword, wordtoix])
    put("cub_rp_captions", [
        {"caption_id": i, "caption": "this bird has a red wing",
         "mismatched_captions": ["this bird has a red tail"] * 99}
        for i in ids[:10]
    ])

    # ---- weights: random-init, saved under the converted-npz names ----
    def wpath(key, npz=True):
        rel = benchmark.WEIGHTS[key]
        if npz:
            rel = os.path.splitext(rel)[0] + ".npz"
        path = weights / rel
        os.makedirs(path.parent, exist_ok=True)
        return str(path)

    k = jax.random.PRNGKey(0)
    wio.save_pytree_npz(wpath("inception"), inception_v3.random_params(k))
    wio.save_pytree_npz(wpath("clip"), clip_vit.random_params(k))
    # slim-name checkpoints: CUB keeps the 51-way logits; the 2015-graph coco
    # flavor drops the fc and adds the no-bias softmax/weights matrix
    slim = random_slim_vars(0, 51)
    np.savez(wpath("inception_cub"), **slim)
    slim2015 = {kk: v for kk, v in slim.items() if not kk.startswith("logits/")}
    slim2015["softmax/weights"] = (np.random.RandomState(1).randn(2048, 1008) * 0.05).astype(np.float32)
    np.savez(wpath("inception_2015"), **slim2015)
    wio.save_pytree_npz(
        wpath("counter"),
        counter_lib.FCResNet50PRM().init(k, np.zeros((1, 448, 448, 3), np.float32)),
    )
    caps = np.zeros((2, 8), np.int32)
    wio.save_pytree_npz(
        wpath("damsm_text"),
        damsm.RNNEncoder(ntoken=len(vocab)).init(k, caps, np.full((2,), 8)),
    )
    wio.save_pytree_npz(
        wpath("damsm_image"),
        damsm.CNNEncoder().init(k, np.zeros((1, 64, 64, 3), np.float32)),
    )
    # synthetic BPE merge table, gzipped like the shipped vocab
    merges = ["#version: 0.2", "t h", "th e</w>", "d o", "do g</w>", "c a", "ca t</w>"]
    with gzip.open(wpath("clip_bpe", npz=False), "wt", encoding="utf-8") as f:
        f.write("\n".join(merges + [""] * 5))

    return dict(root=str(root), data=str(data), weights=str(weights))


class TestRealCliEndToEnd:
    def test_coco_track(self, layout):
        out = os.path.join(layout["root"], "results_coco")
        values = benchmark.main([
            "--track", "coco", "--method_name", "rand",
            "--images", os.path.join(layout["root"], "gen"),
            "--pa_images", os.path.join(layout["root"], "pa"),
            "--data_root", layout["data"], "--weights_root", layout["weights"],
            "--output_root", out, "--batch_size", str(BATCH),
            "--only", "fid,is_star,rp,pa,ca",
        ])
        assert set(values) == {"FID", "IS*", "RP", "PA", "CA"}
        assert all(np.isfinite(v) for v in values.values()), values
        assert values["FID"] > 0 and values["IS*"] >= 1.0
        assert 0.0 <= values["RP"] <= 100.0 and 0.0 <= values["PA"] <= 100.0
        with open(os.path.join(out, "rand", "metrics.json")) as f:
            assert set(json.load(f)) == set(values)
        # partial set -> methods JSON written, ranking correctly skipped
        with open(os.path.join(out, "methods", "rand.json")) as f:
            assert set(json.load(f)) == set(values)
        assert not os.path.exists(os.path.join(out, "benchmark_results.txt"))

    def test_cub_track(self, layout):
        out = os.path.join(layout["root"], "results_cub")
        values = benchmark.main([
            "--track", "cub", "--method_name", "rand",
            "--images", os.path.join(layout["root"], "gen"),
            "--data_root", layout["data"], "--weights_root", layout["weights"],
            "--output_root", out, "--batch_size", str(BATCH),
        ])
        assert set(values) == {"FID", "IS*", "RP"}
        assert all(np.isfinite(v) for v in values.values()), values
