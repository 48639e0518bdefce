"""Offline TF -> npz exporter for the IS* backbones.

The CUB IS* checkpoint (``inception_finetuned_models/birds_valid299/model.ckpt``,
inception_score_star_bird.py:35-39) and the COCO 2015 frozen graph
(``classify_image_graph_def.pb``, inception_score_star_coco.py:26) are TF-1
artifacts.  This framework consumes them as .npz (TF variable name -> array,
see tise_tpu/backbones/inception_slim.py); this script does the one-time
export and REQUIRES tensorflow 1.x — run it wherever the reference's
environment exists, not on the TPU host.

CUB checkpoint (EMA variables restored, matching the reference's
ExponentialMovingAverage restore at inception_score_star_bird.py:198-201):

    python tools/convert_tf_inception.py ckpt \\
        --checkpoint .../model.ckpt --output cub_is_star.npz

COCO frozen graph (trunk constants + the bias-free softmax weight matrix
'softmax/weights' used as logits = pool3 @ W, :104-105):

    python tools/convert_tf_inception.py pb \\
        --graph .../classify_image_graph_def.pb --output coco_is_star.npz
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse

import numpy as np


def export_ckpt(checkpoint: str, output: str) -> None:
    import tensorflow.compat.v1 as tf  # noqa: gated import — TF not a framework dep

    reader = tf.train.NewCheckpointReader(checkpoint)
    var_map = reader.get_variable_to_shape_map()
    out = {}
    for name in var_map:
        # prefer the EMA shadow variable when present (reference restores EMA)
        if name.endswith("/ExponentialMovingAverage"):
            out[name[: -len("/ExponentialMovingAverage")]] = reader.get_tensor(name)
    for name in var_map:
        if "ExponentialMovingAverage" in name or "Momentum" in name:
            continue
        out.setdefault(name, reader.get_tensor(name))
    np.savez(output, **out)
    print(f"exported {len(out)} tensors -> {output}")


def export_pb(graph: str, output: str) -> None:
    import tensorflow.compat.v1 as tf

    gd = tf.GraphDef()
    with open(graph, "rb") as f:
        gd.ParseFromString(f.read())
    out = {}
    for node in gd.node:
        if node.op != "Const":
            continue
        t = node.attr["value"].tensor
        arr = tf.make_ndarray(t)
        if arr.size > 0:
            out[node.name] = arr
    np.savez(output, **out)
    print(f"exported {len(out)} constants -> {output}")
    # Sanity-check the export against the 2015 name tables so a truncated or
    # renamed graph fails here, not at metric time.
    from tise_tpu.backbones import inception_slim as slim

    if slim.is_2015_layout(out):
        missing = slim.missing_2015_names(out)
        if missing:
            print(f"WARNING: {len(missing)} expected 2015 node(s) absent, e.g. {missing[:5]}")
        else:
            print("2015 layout complete: loads directly via --flavor coco")
    if "softmax/weights" not in out:
        print("WARNING: 'softmax/weights' missing — IS* COCO logits need it")


def main() -> None:
    p = argparse.ArgumentParser()
    sub = p.add_subparsers(dest="cmd", required=True)
    c = sub.add_parser("ckpt")
    c.add_argument("--checkpoint", required=True)
    c.add_argument("--output", required=True)
    g = sub.add_parser("pb")
    g.add_argument("--graph", required=True)
    g.add_argument("--output", required=True)
    args = p.parse_args()
    if args.cmd == "ckpt":
        export_ckpt(args.checkpoint, args.output)
    else:
        export_pb(args.graph, args.output)


if __name__ == "__main__":
    main()
