"""Synthetic TF-slim inception_v3 variables + real-TF forward oracle.

The IS* CUB reference restores a TF-slim inception_v3 fine-tuned to 51
classes (image_realism/IS/bird/inception_score_star_bird.py:181-201, model
at inception/slim/inception_model.py).  No checkpoint exists in this image,
so parity is proven hermetically, mirroring tests/tf2015_ref.py: generate
random weights under the slim variable names (``conv0/weights``,
``mixed_35x35x256a/branch5x5/Conv_1/BatchNorm/moving_mean``, ...,
``logits/logits/weights`` — including the deliberately stale
``mixed_17x17x1280a`` scope the slim file keeps for checkpoint compat), run
the forward with REAL TensorFlow ops (BN eps 1e-3 without scale, TF
SAME-avg-pool divisor semantics, VALID reduction blocks), and tests compare
against the Flax trunk loaded through
tise_tpu.backbones.inception_slim.params_from_slim_vars with
pool_variant="tf".
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

BN_EPS = 0.001

#: (scope, (kh, kw, cin, cout), stride, padding) for every slim conv unit,
#: in forward order.  Branch scopes auto-name sequential convs Conv, Conv_1,
#: ... exactly like slim's ops.conv2d.
_A = lambda s, cin, pf: [  # noqa: E731
    (f"{s}/branch1x1/Conv", (1, 1, cin, 64), 1, "SAME"),
    (f"{s}/branch5x5/Conv", (1, 1, cin, 48), 1, "SAME"),
    (f"{s}/branch5x5/Conv_1", (5, 5, 48, 64), 1, "SAME"),
    (f"{s}/branch3x3dbl/Conv", (1, 1, cin, 64), 1, "SAME"),
    (f"{s}/branch3x3dbl/Conv_1", (3, 3, 64, 96), 1, "SAME"),
    (f"{s}/branch3x3dbl/Conv_2", (3, 3, 96, 96), 1, "SAME"),
    (f"{s}/branch_pool/Conv", (1, 1, cin, pf), 1, "SAME"),
]
_C = lambda s, c7: [  # noqa: E731
    (f"{s}/branch1x1/Conv", (1, 1, 768, 192), 1, "SAME"),
    (f"{s}/branch7x7/Conv", (1, 1, 768, c7), 1, "SAME"),
    (f"{s}/branch7x7/Conv_1", (1, 7, c7, c7), 1, "SAME"),
    (f"{s}/branch7x7/Conv_2", (7, 1, c7, 192), 1, "SAME"),
    (f"{s}/branch7x7dbl/Conv", (1, 1, 768, c7), 1, "SAME"),
    (f"{s}/branch7x7dbl/Conv_1", (7, 1, c7, c7), 1, "SAME"),
    (f"{s}/branch7x7dbl/Conv_2", (1, 7, c7, c7), 1, "SAME"),
    (f"{s}/branch7x7dbl/Conv_3", (7, 1, c7, c7), 1, "SAME"),
    (f"{s}/branch7x7dbl/Conv_4", (1, 7, c7, 192), 1, "SAME"),
    (f"{s}/branch_pool/Conv", (1, 1, 768, 192), 1, "SAME"),
]
_E = lambda s, cin: [  # noqa: E731
    (f"{s}/branch1x1/Conv", (1, 1, cin, 320), 1, "SAME"),
    (f"{s}/branch3x3/Conv", (1, 1, cin, 384), 1, "SAME"),
    (f"{s}/branch3x3/Conv_1", (1, 3, 384, 384), 1, "SAME"),
    (f"{s}/branch3x3/Conv_2", (3, 1, 384, 384), 1, "SAME"),
    (f"{s}/branch3x3dbl/Conv", (1, 1, cin, 448), 1, "SAME"),
    (f"{s}/branch3x3dbl/Conv_1", (3, 3, 448, 384), 1, "SAME"),
    (f"{s}/branch3x3dbl/Conv_2", (1, 3, 384, 384), 1, "SAME"),
    (f"{s}/branch3x3dbl/Conv_3", (3, 1, 384, 384), 1, "SAME"),
    (f"{s}/branch_pool/Conv", (1, 1, cin, 192), 1, "SAME"),
]

CONV_UNITS = (
    [
        ("conv0", (3, 3, 3, 32), 2, "VALID"),
        ("conv1", (3, 3, 32, 32), 1, "VALID"),
        ("conv2", (3, 3, 32, 64), 1, "SAME"),
        ("conv3", (1, 1, 64, 80), 1, "VALID"),
        ("conv4", (3, 3, 80, 192), 1, "VALID"),
    ]
    + _A("mixed_35x35x256a", 192, 32)
    + _A("mixed_35x35x288a", 256, 64)
    + _A("mixed_35x35x288b", 288, 64)
    + [
        ("mixed_17x17x768a/branch3x3/Conv", (3, 3, 288, 384), 2, "VALID"),
        ("mixed_17x17x768a/branch3x3dbl/Conv", (1, 1, 288, 64), 1, "SAME"),
        ("mixed_17x17x768a/branch3x3dbl/Conv_1", (3, 3, 64, 96), 1, "SAME"),
        ("mixed_17x17x768a/branch3x3dbl/Conv_2", (3, 3, 96, 96), 2, "VALID"),
    ]
    + _C("mixed_17x17x768b", 128)
    + _C("mixed_17x17x768c", 160)
    + _C("mixed_17x17x768d", 160)
    + _C("mixed_17x17x768e", 192)
    + [
        # the slim file keeps this stale 17x17 scope on purpose
        ("mixed_17x17x1280a/branch3x3/Conv", (1, 1, 768, 192), 1, "SAME"),
        ("mixed_17x17x1280a/branch3x3/Conv_1", (3, 3, 192, 320), 2, "VALID"),
        ("mixed_17x17x1280a/branch7x7x3/Conv", (1, 1, 768, 192), 1, "SAME"),
        ("mixed_17x17x1280a/branch7x7x3/Conv_1", (1, 7, 192, 192), 1, "SAME"),
        ("mixed_17x17x1280a/branch7x7x3/Conv_2", (7, 1, 192, 192), 1, "SAME"),
        ("mixed_17x17x1280a/branch7x7x3/Conv_3", (3, 3, 192, 192), 2, "VALID"),
    ]
    + _E("mixed_8x8x2048a", 1280)
    + _E("mixed_8x8x2048b", 2048)
)


def random_slim_vars(seed: int = 0, num_classes: int = 51) -> Dict[str, np.ndarray]:
    """Random variables under the exact slim names (magnitudes tuned so the
    48-conv forward stays numerically tame)."""
    rng = np.random.RandomState(seed)
    out: Dict[str, np.ndarray] = {}
    for scope, (kh, kw, cin, cout), _s, _p in CONV_UNITS:
        fan = kh * kw * cin
        out[f"{scope}/weights"] = (rng.randn(kh, kw, cin, cout) * 1.3 / np.sqrt(fan)).astype(np.float32)
        out[f"{scope}/BatchNorm/beta"] = (rng.randn(cout) * 0.1).astype(np.float32)
        out[f"{scope}/BatchNorm/moving_mean"] = (rng.randn(cout) * 0.1).astype(np.float32)
        out[f"{scope}/BatchNorm/moving_variance"] = rng.uniform(0.5, 1.5, cout).astype(np.float32)
    out["logits/logits/weights"] = (rng.randn(2048, num_classes) * 0.05).astype(np.float32)
    out["logits/logits/biases"] = (rng.randn(num_classes) * 0.01).astype(np.float32)
    return out


def tf_forward_slim(
    variables: Dict[str, np.ndarray], images_float: np.ndarray
) -> Dict[str, np.ndarray]:
    """Eval-mode slim inception_v3 forward with real TF ops; input already
    normalized (the bird script's (v/127.5)-1 happens upstream).  Returns
    {mixed_35x35x256a, mixed_6e, pool3, logits}."""
    import tensorflow as tf

    v = variables

    def conv(x, scope, stride, padding):
        x = tf.nn.conv2d(x, v[f"{scope}/weights"], [1, stride, stride, 1], padding)
        x = tf.nn.batch_normalization(
            x,
            v[f"{scope}/BatchNorm/moving_mean"],
            v[f"{scope}/BatchNorm/moving_variance"],
            v[f"{scope}/BatchNorm/beta"],
            None,
            BN_EPS,
        )
        return tf.nn.relu(x)

    def avgp(x):
        return tf.nn.avg_pool2d(x, 3, 1, "SAME")

    def block_a(x, s, pf):
        b5 = conv(conv(x, f"{s}/branch5x5/Conv", 1, "SAME"), f"{s}/branch5x5/Conv_1", 1, "SAME")
        d = conv(x, f"{s}/branch3x3dbl/Conv", 1, "SAME")
        d = conv(conv(d, f"{s}/branch3x3dbl/Conv_1", 1, "SAME"), f"{s}/branch3x3dbl/Conv_2", 1, "SAME")
        p = conv(avgp(x), f"{s}/branch_pool/Conv", 1, "SAME")
        return tf.concat([conv(x, f"{s}/branch1x1/Conv", 1, "SAME"), b5, d, p], 3)

    def block_c(x, s):
        t = conv(x, f"{s}/branch7x7/Conv", 1, "SAME")
        t = conv(conv(t, f"{s}/branch7x7/Conv_1", 1, "SAME"), f"{s}/branch7x7/Conv_2", 1, "SAME")
        d = conv(x, f"{s}/branch7x7dbl/Conv", 1, "SAME")
        for i in range(1, 5):
            d = conv(d, f"{s}/branch7x7dbl/Conv_{i}", 1, "SAME")
        p = conv(avgp(x), f"{s}/branch_pool/Conv", 1, "SAME")
        return tf.concat([conv(x, f"{s}/branch1x1/Conv", 1, "SAME"), t, d, p], 3)

    def block_e(x, s):
        t = conv(x, f"{s}/branch3x3/Conv", 1, "SAME")
        t = tf.concat(
            [conv(t, f"{s}/branch3x3/Conv_1", 1, "SAME"), conv(t, f"{s}/branch3x3/Conv_2", 1, "SAME")], 3
        )
        d = conv(conv(x, f"{s}/branch3x3dbl/Conv", 1, "SAME"), f"{s}/branch3x3dbl/Conv_1", 1, "SAME")
        d = tf.concat(
            [conv(d, f"{s}/branch3x3dbl/Conv_2", 1, "SAME"), conv(d, f"{s}/branch3x3dbl/Conv_3", 1, "SAME")], 3
        )
        p = conv(avgp(x), f"{s}/branch_pool/Conv", 1, "SAME")
        return tf.concat([conv(x, f"{s}/branch1x1/Conv", 1, "SAME"), t, d, p], 3)

    ep: Dict[str, np.ndarray] = {}
    x = tf.constant(images_float, tf.float32)
    x = conv(x, "conv0", 2, "VALID")
    x = conv(x, "conv1", 1, "VALID")
    x = conv(x, "conv2", 1, "SAME")
    x = tf.nn.max_pool2d(x, 3, 2, "VALID")
    x = conv(x, "conv3", 1, "VALID")
    x = conv(x, "conv4", 1, "VALID")
    x = tf.nn.max_pool2d(x, 3, 2, "VALID")
    x = block_a(x, "mixed_35x35x256a", 32)
    x = block_a(x, "mixed_35x35x288a", 64)
    x = block_a(x, "mixed_35x35x288b", 64)
    ep["mixed_35x35x288b"] = x.numpy()
    s = "mixed_17x17x768a"
    d = conv(x, f"{s}/branch3x3dbl/Conv", 1, "SAME")
    d = conv(d, f"{s}/branch3x3dbl/Conv_1", 1, "SAME")
    d = conv(d, f"{s}/branch3x3dbl/Conv_2", 2, "VALID")
    x = tf.concat(
        [conv(x, f"{s}/branch3x3/Conv", 2, "VALID"), d, tf.nn.max_pool2d(x, 3, 2, "VALID")], 3
    )
    x = block_c(x, "mixed_17x17x768b")
    x = block_c(x, "mixed_17x17x768c")
    x = block_c(x, "mixed_17x17x768d")
    x = block_c(x, "mixed_17x17x768e")
    ep["mixed_6e"] = x.numpy()
    s = "mixed_17x17x1280a"
    t = conv(conv(x, f"{s}/branch3x3/Conv", 1, "SAME"), f"{s}/branch3x3/Conv_1", 2, "VALID")
    d = conv(x, f"{s}/branch7x7x3/Conv", 1, "SAME")
    d = conv(d, f"{s}/branch7x7x3/Conv_1", 1, "SAME")
    d = conv(d, f"{s}/branch7x7x3/Conv_2", 1, "SAME")
    d = conv(d, f"{s}/branch7x7x3/Conv_3", 2, "VALID")
    x = tf.concat([t, d, tf.nn.max_pool2d(x, 3, 2, "VALID")], 3)
    x = block_e(x, "mixed_8x8x2048a")
    x = block_e(x, "mixed_8x8x2048b")
    pool3 = tf.reduce_mean(x, axis=(1, 2))  # 8x8 VALID global average
    ep["pool3"] = pool3.numpy()
    logits = tf.linalg.matmul(pool3, v["logits/logits/weights"]) + v["logits/logits/biases"]
    ep["logits"] = logits.numpy()
    return ep
