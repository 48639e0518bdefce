"""InceptionV3 (torchvision architecture) in Flax, NHWC, TPU-first.

This is the backbone behind four reference metrics:
  * FID / O-FID pool3 features (image_realism/FID/inception.py:59-95 splits the
    torchvision model into 4 blocks keyed by feature dim {64,192,768,2048})
  * O-IS logits with an 80-class fine-tuned fc
    (object_fidelity/O-IS/object_centric_inception_score.py:41-45)
  * the DAMSM CNN encoder trunk (text_relevance/encoders.py:117-219)

Design: one trunk producing named endpoints; metric wrappers select endpoints
and fuse their normalization recipe.  Everything is inference-mode — BN uses
stored running statistics (a frozen affine), so each BasicConv2d is exactly
conv + scale*x + bias + relu, which XLA fuses into a single MXU conv op.
Weights load from a torchvision ``state_dict`` (torch CPU -> numpy -> HWIO)
via :func:`params_from_torch_state_dict`.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

BN_EPS = 0.001  # torchvision inception BatchNorm2d eps


class BasicConv2d(nn.Module):
    """conv(no bias) + frozen BN(eps=1e-3) + relu — torchvision BasicConv2d."""

    features: int
    kernel: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    padding: Tuple[int, int] = (0, 0)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        pad = ((self.padding[0], self.padding[0]), (self.padding[1], self.padding[1]))
        x = nn.Conv(
            self.features,
            self.kernel,
            strides=self.strides,
            padding=pad,
            use_bias=False,
            dtype=self.dtype,
            name="conv",
        )(x)
        scale = self.param("bn_scale", nn.initializers.ones, (self.features,))
        bias = self.param("bn_bias", nn.initializers.zeros, (self.features,))
        mean = self.param("bn_mean", nn.initializers.zeros, (self.features,))
        var = self.param("bn_var", nn.initializers.ones, (self.features,))
        inv = jax.lax.rsqrt(var.astype(jnp.float32) + BN_EPS) * scale.astype(jnp.float32)
        x = x.astype(jnp.float32) * inv + (bias.astype(jnp.float32) - mean.astype(jnp.float32) * inv)
        return nn.relu(x).astype(self.dtype)


def _max_pool(x, k=3, s=2):
    return nn.max_pool(x, (k, k), strides=(s, s), padding="VALID")


def _avg_pool_3x3_s1_p1(x, count_include_pad=True):
    # torch avg_pool2d(3, stride=1, padding=1) uses count_include_pad=True;
    # TF avg_pool SAME divides by the number of in-bounds taps (exclude-pad) —
    # the slim / 2015-GraphDef flavors need count_include_pad=False.
    # Separable shifted-add formulation: lax.reduce_window measured ~2.2 ms at
    # [256,17,17,768] bf16 on v5e vs ~0.3 ms memory-bound (ops/fast_pool.py).
    from tise_tpu.ops.fast_pool import avg_pool_3x3_s1_p1

    return avg_pool_3x3_s1_p1(x, count_include_pad=count_include_pad)


class InceptionA(nn.Module):
    pool_features: int
    dtype: Any = jnp.float32
    tf_avgpool: bool = False

    @nn.compact
    def __call__(self, x):
        d = self.dtype
        b1 = BasicConv2d(64, (1, 1), dtype=d, name="branch1x1")(x)
        b5 = BasicConv2d(48, (1, 1), dtype=d, name="branch5x5_1")(x)
        b5 = BasicConv2d(64, (5, 5), padding=(2, 2), dtype=d, name="branch5x5_2")(b5)
        b3 = BasicConv2d(64, (1, 1), dtype=d, name="branch3x3dbl_1")(x)
        b3 = BasicConv2d(96, (3, 3), padding=(1, 1), dtype=d, name="branch3x3dbl_2")(b3)
        b3 = BasicConv2d(96, (3, 3), padding=(1, 1), dtype=d, name="branch3x3dbl_3")(b3)
        bp = _avg_pool_3x3_s1_p1(x, not self.tf_avgpool)
        bp = BasicConv2d(self.pool_features, (1, 1), dtype=d, name="branch_pool")(bp)
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        d = self.dtype
        b3 = BasicConv2d(384, (3, 3), strides=(2, 2), dtype=d, name="branch3x3")(x)
        bd = BasicConv2d(64, (1, 1), dtype=d, name="branch3x3dbl_1")(x)
        bd = BasicConv2d(96, (3, 3), padding=(1, 1), dtype=d, name="branch3x3dbl_2")(bd)
        bd = BasicConv2d(96, (3, 3), strides=(2, 2), dtype=d, name="branch3x3dbl_3")(bd)
        bp = _max_pool(x)
        return jnp.concatenate([b3, bd, bp], axis=-1)


class InceptionC(nn.Module):
    channels_7x7: int
    dtype: Any = jnp.float32
    tf_avgpool: bool = False

    @nn.compact
    def __call__(self, x):
        d, c7 = self.dtype, self.channels_7x7
        b1 = BasicConv2d(192, (1, 1), dtype=d, name="branch1x1")(x)
        b7 = BasicConv2d(c7, (1, 1), dtype=d, name="branch7x7_1")(x)
        b7 = BasicConv2d(c7, (1, 7), padding=(0, 3), dtype=d, name="branch7x7_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=(3, 0), dtype=d, name="branch7x7_3")(b7)
        bd = BasicConv2d(c7, (1, 1), dtype=d, name="branch7x7dbl_1")(x)
        bd = BasicConv2d(c7, (7, 1), padding=(3, 0), dtype=d, name="branch7x7dbl_2")(bd)
        bd = BasicConv2d(c7, (1, 7), padding=(0, 3), dtype=d, name="branch7x7dbl_3")(bd)
        bd = BasicConv2d(c7, (7, 1), padding=(3, 0), dtype=d, name="branch7x7dbl_4")(bd)
        bd = BasicConv2d(192, (1, 7), padding=(0, 3), dtype=d, name="branch7x7dbl_5")(bd)
        bp = _avg_pool_3x3_s1_p1(x, not self.tf_avgpool)
        bp = BasicConv2d(192, (1, 1), dtype=d, name="branch_pool")(bp)
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        d = self.dtype
        b3 = BasicConv2d(192, (1, 1), dtype=d, name="branch3x3_1")(x)
        b3 = BasicConv2d(320, (3, 3), strides=(2, 2), dtype=d, name="branch3x3_2")(b3)
        b7 = BasicConv2d(192, (1, 1), dtype=d, name="branch7x7x3_1")(x)
        b7 = BasicConv2d(192, (1, 7), padding=(0, 3), dtype=d, name="branch7x7x3_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=(3, 0), dtype=d, name="branch7x7x3_3")(b7)
        b7 = BasicConv2d(192, (3, 3), strides=(2, 2), dtype=d, name="branch7x7x3_4")(b7)
        bp = _max_pool(x)
        return jnp.concatenate([b3, b7, bp], axis=-1)


class InceptionE(nn.Module):
    dtype: Any = jnp.float32
    tf_avgpool: bool = False
    maxpool_branch: bool = False  # the 2015 GraphDef's mixed_10 quirk

    @nn.compact
    def __call__(self, x):
        d = self.dtype
        b1 = BasicConv2d(320, (1, 1), dtype=d, name="branch1x1")(x)
        b3 = BasicConv2d(384, (1, 1), dtype=d, name="branch3x3_1")(x)
        b3a = BasicConv2d(384, (1, 3), padding=(0, 1), dtype=d, name="branch3x3_2a")(b3)
        b3b = BasicConv2d(384, (3, 1), padding=(1, 0), dtype=d, name="branch3x3_2b")(b3)
        b3 = jnp.concatenate([b3a, b3b], axis=-1)
        bd = BasicConv2d(448, (1, 1), dtype=d, name="branch3x3dbl_1")(x)
        bd = BasicConv2d(384, (3, 3), padding=(1, 1), dtype=d, name="branch3x3dbl_2")(bd)
        bda = BasicConv2d(384, (1, 3), padding=(0, 1), dtype=d, name="branch3x3dbl_3a")(bd)
        bdb = BasicConv2d(384, (3, 1), padding=(1, 0), dtype=d, name="branch3x3dbl_3b")(bd)
        bd = jnp.concatenate([bda, bdb], axis=-1)
        if self.maxpool_branch:
            bp = nn.max_pool(x, (3, 3), strides=(1, 1), padding=((1, 1), (1, 1)))
        else:
            bp = _avg_pool_3x3_s1_p1(x, not self.tf_avgpool)
        bp = BasicConv2d(192, (1, 1), dtype=d, name="branch_pool")(bp)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


#: endpoint names in forward order
ENDPOINTS = ("maxpool1", "maxpool2", "mixed6e", "pool3", "logits")


class InceptionV3(nn.Module):
    """torchvision-compatible InceptionV3 trunk with named endpoints.

    Endpoints map onto the reference FID block outputs
    (FID/inception.py:14-19): maxpool1 = dim 64, maxpool2 = dim 192,
    mixed6e = dim 768 (pre-aux, the DAMSM region-feature tap), pool3 = dim
    2048 (final average pool), logits = fc output (``num_classes`` wide —
    1000 for ImageNet, 80 for the O-IS fine-tune).
    """

    num_classes: int = 1000
    dtype: Any = jnp.float32
    #: "torch"  — torchvision semantics (FID / O-IS / O-FID / DAMSM): avg pool
    #:           branches divide by 9 incl. padding (count_include_pad=True).
    #: "tf"     — TF-slim semantics (IS* CUB): avg pool divides by in-bounds
    #:           tap count (tf.nn.avg_pool SAME).
    #: "tf2015" — the frozen 2015 ImageNet GraphDef (IS* COCO): "tf" plus the
    #:           graph's mixed_10 quirk where the pool branch is a MAX pool
    #:           (the pytorch-fid FIDInceptionE_2 patch documents the same).
    pool_variant: str = "torch"

    @nn.compact
    def __call__(self, x: jax.Array, endpoints: Sequence[str] = ("pool3",)) -> Dict[str, jax.Array]:
        want = set(endpoints)
        for e in want:
            if e not in ENDPOINTS:
                raise ValueError(f"unknown endpoint {e}")
        last = max(ENDPOINTS.index(e) for e in want)
        if self.pool_variant not in ("torch", "tf", "tf2015"):
            raise ValueError(f"unknown pool_variant {self.pool_variant}")
        tf_pool = self.pool_variant in ("tf", "tf2015")
        d = self.dtype
        out: Dict[str, jax.Array] = {}

        x = x.astype(d)
        x = BasicConv2d(32, (3, 3), strides=(2, 2), dtype=d, name="Conv2d_1a_3x3")(x)
        x = BasicConv2d(32, (3, 3), dtype=d, name="Conv2d_2a_3x3")(x)
        x = BasicConv2d(64, (3, 3), padding=(1, 1), dtype=d, name="Conv2d_2b_3x3")(x)
        x = _max_pool(x)
        out["maxpool1"] = x
        if last == 0:
            return out

        x = BasicConv2d(80, (1, 1), dtype=d, name="Conv2d_3b_1x1")(x)
        x = BasicConv2d(192, (3, 3), dtype=d, name="Conv2d_4a_3x3")(x)
        x = _max_pool(x)
        out["maxpool2"] = x
        if last == 1:
            return out

        x = InceptionA(32, dtype=d, tf_avgpool=tf_pool, name="Mixed_5b")(x)
        x = InceptionA(64, dtype=d, tf_avgpool=tf_pool, name="Mixed_5c")(x)
        x = InceptionA(64, dtype=d, tf_avgpool=tf_pool, name="Mixed_5d")(x)
        x = InceptionB(dtype=d, name="Mixed_6a")(x)
        x = InceptionC(128, dtype=d, tf_avgpool=tf_pool, name="Mixed_6b")(x)
        x = InceptionC(160, dtype=d, tf_avgpool=tf_pool, name="Mixed_6c")(x)
        x = InceptionC(160, dtype=d, tf_avgpool=tf_pool, name="Mixed_6d")(x)
        x = InceptionC(192, dtype=d, tf_avgpool=tf_pool, name="Mixed_6e")(x)
        out["mixed6e"] = x
        if last == 2:
            return out

        x = InceptionD(dtype=d, name="Mixed_7a")(x)
        x = InceptionE(dtype=d, tf_avgpool=tf_pool, name="Mixed_7b")(x)
        x = InceptionE(
            dtype=d, tf_avgpool=tf_pool, maxpool_branch=self.pool_variant == "tf2015", name="Mixed_7c"
        )(x)
        x = jnp.mean(x, axis=(1, 2))  # adaptive avg pool to 1x1
        out["pool3"] = x
        if last == 3:
            return out

        x = nn.Dense(self.num_classes, dtype=d, name="fc")(x)
        out["logits"] = x
        return out


# ---------------------------------------------------------------------------
# Weight conversion: torchvision state_dict -> flax params
# ---------------------------------------------------------------------------


def _conv_kernel(w: np.ndarray) -> np.ndarray:
    """torch OIHW -> flax HWIO."""
    return np.transpose(w, (2, 3, 1, 0))


def params_from_torch_state_dict(state: Mapping[str, Any], num_classes: int = 1000) -> Dict:
    """Convert a torchvision ``inception_v3`` state_dict (tensors or ndarrays)
    to this module's param pytree.

    Also accepts the O-IS fine-tuned checkpoint
    (object_fidelity/O-IS weights, 80-class fc) — pass num_classes=80.
    AuxLogits entries are ignored (inference only).
    """

    def arr(key: str) -> np.ndarray:
        v = state[key]
        return v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)

    params: Dict[str, Any] = {}
    mod_names = set()
    for k in state:
        if k.startswith("AuxLogits") or k == "fc.weight" or k == "fc.bias":
            continue
        mod_names.add(k.split(".conv.")[0].split(".bn.")[0])

    for mod in sorted(mod_names):
        tree: Dict[str, Any] = {
            "conv": {"kernel": _conv_kernel(arr(f"{mod}.conv.weight"))},
            "bn_scale": arr(f"{mod}.bn.weight"),
            "bn_bias": arr(f"{mod}.bn.bias"),
            "bn_mean": arr(f"{mod}.bn.running_mean"),
            "bn_var": arr(f"{mod}.bn.running_var"),
        }
        # "Mixed_5b.branch1x1" -> params["Mixed_5b"]["branch1x1"]
        node = params
        parts = mod.split(".")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = tree

    if "fc.weight" in state:
        params["fc"] = {"kernel": arr("fc.weight").T, "bias": arr("fc.bias")}
    return {"params": params}


def random_params(rng: jax.Array, num_classes: int = 1000, dtype=jnp.float32) -> Dict:
    """Random init (tests / benchmarks; real runs load converted weights)."""
    model = InceptionV3(num_classes=num_classes, dtype=dtype)
    x = jnp.zeros((1, 299, 299, 3), dtype)
    return model.init(rng, x, endpoints=("logits",))
