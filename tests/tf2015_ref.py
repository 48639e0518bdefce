"""Synthetic 2015 classify_image GraphDef: const generator + TF forward oracle.

The IS* COCO reference consumes the frozen 2015 ImageNet graph
(image_realism/IS/coco/inception_score_star_coco.py:84-108).  No checkpoint
artifact exists in this environment, so parity is proven hermetically: this
module generates random weights under the 2015 Const-node names, runs a
faithful TF re-enactment of the graph's forward (in-graph (v-128)/128
normalize, batchnorm eps 1e-3 without scale, TF avg-pool SAME divisor
semantics, the mixed_10 max-pool quirk, pool_3 global average, bias-free
softmax matmul), and tests compare it against the Flax trunk loaded through
tise_tpu.backbones.inception_slim.params_from_2015_vars.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

BN_EPS = 0.001

#: (scope, (kh, kw, cin, cout)) for every conv unit in the 2015 graph.
_A = lambda s, cin, pf: [  # noqa: E731
    (f"{s}/conv", (1, 1, cin, 64)),
    (f"{s}/tower/conv", (1, 1, cin, 48)),
    (f"{s}/tower/conv_1", (5, 5, 48, 64)),
    (f"{s}/tower_1/conv", (1, 1, cin, 64)),
    (f"{s}/tower_1/conv_1", (3, 3, 64, 96)),
    (f"{s}/tower_1/conv_2", (3, 3, 96, 96)),
    (f"{s}/tower_2/conv", (1, 1, cin, pf)),
]
_C = lambda s, c7: [  # noqa: E731
    (f"{s}/conv", (1, 1, 768, 192)),
    (f"{s}/tower/conv", (1, 1, 768, c7)),
    (f"{s}/tower/conv_1", (1, 7, c7, c7)),
    (f"{s}/tower/conv_2", (7, 1, c7, 192)),
    (f"{s}/tower_1/conv", (1, 1, 768, c7)),
    (f"{s}/tower_1/conv_1", (7, 1, c7, c7)),
    (f"{s}/tower_1/conv_2", (1, 7, c7, c7)),
    (f"{s}/tower_1/conv_3", (7, 1, c7, c7)),
    (f"{s}/tower_1/conv_4", (1, 7, c7, 192)),
    (f"{s}/tower_2/conv", (1, 1, 768, 192)),
]
_E = lambda s, cin: [  # noqa: E731
    (f"{s}/conv", (1, 1, cin, 320)),
    (f"{s}/tower/conv", (1, 1, cin, 384)),
    (f"{s}/tower/mixed/conv", (1, 3, 384, 384)),
    (f"{s}/tower/mixed/conv_1", (3, 1, 384, 384)),
    (f"{s}/tower_1/conv", (1, 1, cin, 448)),
    (f"{s}/tower_1/conv_1", (3, 3, 448, 384)),
    (f"{s}/tower_1/mixed/conv", (1, 3, 384, 384)),
    (f"{s}/tower_1/mixed/conv_1", (3, 1, 384, 384)),
    (f"{s}/tower_2/conv", (1, 1, cin, 192)),
]

CONV_UNITS = (
    [
        ("conv", (3, 3, 3, 32)),
        ("conv_1", (3, 3, 32, 32)),
        ("conv_2", (3, 3, 32, 64)),
        ("conv_3", (1, 1, 64, 80)),
        ("conv_4", (3, 3, 80, 192)),
    ]
    + _A("mixed", 192, 32)
    + _A("mixed_1", 256, 64)
    + _A("mixed_2", 288, 64)
    + [
        ("mixed_3/conv", (3, 3, 288, 384)),
        ("mixed_3/tower/conv", (1, 1, 288, 64)),
        ("mixed_3/tower/conv_1", (3, 3, 64, 96)),
        ("mixed_3/tower/conv_2", (3, 3, 96, 96)),
    ]
    + _C("mixed_4", 128)
    + _C("mixed_5", 160)
    + _C("mixed_6", 160)
    + _C("mixed_7", 192)
    + [
        ("mixed_8/tower/conv", (1, 1, 768, 192)),
        ("mixed_8/tower/conv_1", (3, 3, 192, 320)),
        ("mixed_8/tower_1/conv", (1, 1, 768, 192)),
        ("mixed_8/tower_1/conv_1", (1, 7, 192, 192)),
        ("mixed_8/tower_1/conv_2", (7, 1, 192, 192)),
        ("mixed_8/tower_1/conv_3", (3, 3, 192, 192)),
    ]
    + _E("mixed_9", 1280)
    + _E("mixed_10", 2048)
)


def random_2015_consts(seed: int = 0) -> Dict[str, np.ndarray]:
    """Random weights under the 2015 Const node names (gamma omitted — the
    graph ran batch_norm_with_global_normalization without scale)."""
    rng = np.random.RandomState(seed)
    out: Dict[str, np.ndarray] = {}
    for scope, (kh, kw, cin, cout) in CONV_UNITS:
        fan = kh * kw * cin
        out[f"{scope}/conv2d_params"] = rng.randn(kh, kw, cin, cout).astype(np.float32) / np.sqrt(fan)
        out[f"{scope}/batchnorm/beta"] = (0.1 * rng.randn(cout)).astype(np.float32)
        out[f"{scope}/batchnorm/moving_mean"] = (0.1 * rng.randn(cout)).astype(np.float32)
        out[f"{scope}/batchnorm/moving_variance"] = (0.5 + rng.rand(cout)).astype(np.float32)
    out["softmax/weights"] = (rng.randn(2048, 1008).astype(np.float32) / 45.0).astype(np.float32)
    out["softmax/biases"] = np.zeros((1008,), np.float32)  # present in the pb, unused by the metric
    return out


def tf_forward_2015(consts: Dict[str, np.ndarray], images_float: np.ndarray) -> np.ndarray:
    """TF-eager re-enactment of the graph: float 0..255 [B,299,299,3] ->
    logits [B, 1008] (pool_3 @ softmax/weights, no bias, no temperature)."""
    import tensorflow as tf

    def conv(x, scope, stride=1, padding="SAME"):
        x = tf.nn.conv2d(x, consts[f"{scope}/conv2d_params"], [1, stride, stride, 1], padding)
        mean = consts[f"{scope}/batchnorm/moving_mean"]
        var = consts[f"{scope}/batchnorm/moving_variance"]
        beta = consts[f"{scope}/batchnorm/beta"]
        x = (x - mean) * (1.0 / np.sqrt(var + BN_EPS)) + beta
        return tf.nn.relu(x)

    def avgp(x):
        return tf.nn.avg_pool2d(x, 3, 1, "SAME")

    def block_a(x, s):
        return tf.concat(
            [
                conv(x, f"{s}/conv"),
                conv(conv(x, f"{s}/tower/conv"), f"{s}/tower/conv_1"),
                conv(conv(conv(x, f"{s}/tower_1/conv"), f"{s}/tower_1/conv_1"), f"{s}/tower_1/conv_2"),
                conv(avgp(x), f"{s}/tower_2/conv"),
            ],
            3,
        )

    def block_c(x, s):
        t = conv(conv(conv(x, f"{s}/tower/conv"), f"{s}/tower/conv_1"), f"{s}/tower/conv_2")
        d = conv(x, f"{s}/tower_1/conv")
        for i in range(1, 5):
            d = conv(d, f"{s}/tower_1/conv_{i}")
        return tf.concat([conv(x, f"{s}/conv"), t, d, conv(avgp(x), f"{s}/tower_2/conv")], 3)

    def block_e(x, s, pool_max):
        t = conv(x, f"{s}/tower/conv")
        t = tf.concat([conv(t, f"{s}/tower/mixed/conv"), conv(t, f"{s}/tower/mixed/conv_1")], 3)
        d = conv(conv(x, f"{s}/tower_1/conv"), f"{s}/tower_1/conv_1")
        d = tf.concat([conv(d, f"{s}/tower_1/mixed/conv"), conv(d, f"{s}/tower_1/mixed/conv_1")], 3)
        p = tf.nn.max_pool2d(x, 3, 1, "SAME") if pool_max else avgp(x)
        return tf.concat([conv(x, f"{s}/conv"), t, d, conv(p, f"{s}/tower_2/conv")], 3)

    x = tf.constant(images_float, tf.float32)
    x = (x - 128.0) * (1.0 / 128.0)  # the graph's Sub/Mul const nodes
    x = conv(x, "conv", 2, "VALID")
    x = conv(x, "conv_1", 1, "VALID")
    x = conv(x, "conv_2", 1, "SAME")
    x = tf.nn.max_pool2d(x, 3, 2, "VALID")
    x = conv(x, "conv_3", 1, "VALID")
    x = conv(x, "conv_4", 1, "VALID")
    x = tf.nn.max_pool2d(x, 3, 2, "VALID")
    for s in ("mixed", "mixed_1", "mixed_2"):
        x = block_a(x, s)
    x = tf.concat(
        [
            conv(x, "mixed_3/conv", 2, "VALID"),
            conv(
                conv(conv(x, "mixed_3/tower/conv"), "mixed_3/tower/conv_1"),
                "mixed_3/tower/conv_2",
                2,
                "VALID",
            ),
            tf.nn.max_pool2d(x, 3, 2, "VALID"),
        ],
        3,
    )
    for s in ("mixed_4", "mixed_5", "mixed_6", "mixed_7"):
        x = block_c(x, s)
    x = tf.concat(
        [
            conv(conv(x, "mixed_8/tower/conv"), "mixed_8/tower/conv_1", 2, "VALID"),
            conv(
                conv(
                    conv(conv(x, "mixed_8/tower_1/conv"), "mixed_8/tower_1/conv_1"),
                    "mixed_8/tower_1/conv_2",
                ),
                "mixed_8/tower_1/conv_3",
                2,
                "VALID",
            ),
            tf.nn.max_pool2d(x, 3, 2, "VALID"),
        ],
        3,
    )
    x = block_e(x, "mixed_9", pool_max=False)
    x = block_e(x, "mixed_10", pool_max=True)
    pool3 = tf.reduce_mean(x, axis=(1, 2))  # pool_3: 8x8 VALID average
    logits = tf.linalg.matmul(pool3, consts["softmax/weights"])
    return logits.numpy()
