"""Device-side preprocessing: the four normalization recipes, fused.

The reference has four distinct preprocess recipes (SURVEY.md "Hard parts"):
  (a) FID:   PIL resize 299 -> [0,1] -> per-channel affine
             ``x * (0.229/0.5) + (0.485-0.5)/0.5`` etc. (FID/inception.py:120-124)
  (b) IS*:   PIL-bilinear resize on uint8 -> /127.5 - 1
             (inception_score_star_bird.py:64-71)
  (c) O-IS:  resize 299 -> Normalize(0.5, 0.5)
             (object_centric_inception_score.py:87-93)
  (d) CLIP:  bicubic shorter-side resize + center crop 224 -> CLIP mean/std
  (e) DAMSM: resize 256 -> Normalize(0.5, 0.5) (RP_cub.py:135-137)
  (f) CA:    resize 448 -> ImageNet mean/std (CA.py:121-128)

Host workers produce uint8 batches at the target geometry (exact PIL
resampling); the uint8 -> normalized-float conversion runs on device, fused.
On TPU the affine is a Pallas kernel reading uint8 straight from HBM (half
the bandwidth of shipping float32); under jit on CPU (tests) the identical
XLA expression is used.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

# (scale, shift) per channel applied to x in [0, 1]: out = x * scale + shift
_FID_SCALE = (0.229 / 0.5, 0.224 / 0.5, 0.225 / 0.5)
_FID_SHIFT = ((0.485 - 0.5) / 0.5, (0.456 - 0.5) / 0.5, (0.406 - 0.5) / 0.5)

_CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
_CLIP_STD = (0.26862954, 0.26130258, 0.27577711)

_IMAGENET_MEAN = (0.485, 0.456, 0.406)
_IMAGENET_STD = (0.229, 0.224, 0.225)


def _affine_from_mean_std(mean, std) -> Tuple[Tuple[float, ...], Tuple[float, ...]]:
    scale = tuple(1.0 / (255.0 * s) for s in std)
    shift = tuple(-m / s for m, s in zip(mean, std))
    return scale, shift


#: recipe -> (scale, shift) applied to raw uint8 value v: out = v * scale + shift
RECIPES: dict[str, Tuple[Tuple[float, ...], Tuple[float, ...]]] = {
    # (a) [0,1] then FID affine  ->  v/255 * fid_scale + fid_shift
    "fid": (tuple(s / 255.0 for s in _FID_SCALE), _FID_SHIFT),
    # (b) v/127.5 - 1
    "is_star": ((1 / 127.5,) * 3, (-1.0,) * 3),
    # (b') the 2015 classify_image GraphDef normalizes IN-graph: (v - 128)/128
    # (Sub/Mul const nodes ahead of 'conv'); the IS* COCO script feeds raw
    # float 0..255 into ExpandDims:0 (inception_score_star_coco.py:50,115-121)
    "is_star_2015": ((1 / 128.0,) * 3, (-1.0,) * 3),
    # (c)/(e) Normalize(0.5, 0.5) on [0,1]: v/127.5 - 1 (identical affine)
    "half": ((1 / 127.5,) * 3, (-1.0,) * 3),
    # (d) CLIP
    "clip": _affine_from_mean_std(_CLIP_MEAN, _CLIP_STD),
    # (f) ImageNet
    "imagenet": _affine_from_mean_std(_IMAGENET_MEAN, _IMAGENET_STD),
    # raw [0,1]
    "unit": ((1 / 255.0,) * 3, (0.0,) * 3),
}


@functools.partial(jax.jit, static_argnames=("recipe", "dtype"))
def normalize(images_u8: jax.Array, recipe: str, dtype=jnp.float32) -> jax.Array:
    """uint8 NHWC -> normalized float NHWC under the named recipe.

    XLA fuses the cast+affine into the consumer conv; an explicit Pallas
    variant (normalize_pallas) exists for the standalone-throughput path.
    """
    scale, shift = RECIPES[recipe]
    scale = jnp.asarray(scale, dtype)
    shift = jnp.asarray(shift, dtype)
    x = images_u8.astype(dtype)
    return x * scale + shift


def normalize_pallas(images_u8: jax.Array, recipe: str, dtype=jnp.float32) -> jax.Array:
    """Fused uint8->float normalize as a Pallas TPU kernel.

    Reads uint8 from HBM tile-by-tile (4x less DMA than float32) and writes
    the normalized tensor; one grid step per image row-block.  Falls back to
    the XLA path off-TPU.
    """
    if jax.default_backend() != "tpu":
        return normalize(images_u8, recipe, dtype)

    from jax.experimental import pallas as pl
    
    scale, shift = RECIPES[recipe]
    b, h, w, c = images_u8.shape
    flat = images_u8.reshape(b, h * w * c)
    scale_row = jnp.tile(jnp.asarray(scale, dtype), h * w)
    shift_row = jnp.tile(jnp.asarray(shift, dtype), h * w)

    def kernel(x_ref, scale_ref, shift_ref, o_ref):
        o_ref[:] = x_ref[:].astype(dtype) * scale_ref[:] + shift_ref[:]

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(flat.shape, dtype),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h * w * c), lambda i: (i, 0)),
            pl.BlockSpec((h * w * c,), lambda i: (0,)),
            pl.BlockSpec((h * w * c,), lambda i: (0,)),
        ],
        out_specs=pl.BlockSpec((1, h * w * c), lambda i: (i, 0)),
    )(flat, scale_row, shift_row)
    return out.reshape(b, h, w, c)


@functools.partial(jax.jit, static_argnames=("recipe", "out_size", "antialias", "dtype"))
def resize_and_normalize(
    images_u8: jax.Array, recipe: str, out_size: int, antialias: bool = True, dtype=jnp.float32
) -> jax.Array:
    """Device-side resize + normalize fast path.

    Offloads the per-image PIL resize to the TPU (one fused jit: uint8 in,
    normalized activations out).  ``jax.image.resize`` with antialias matches
    PIL's convolution resampling closely but not bit-exactly (documented
    deviation; the default host path keeps exact PIL parity — SURVEY.md
    "Hard parts" preprocessing recipes).
    """
    x = normalize(images_u8, recipe, dtype)
    b, h, w, c = x.shape
    if (h, w) == (out_size, out_size):
        return x
    return jax.image.resize(x, (b, out_size, out_size, c), method="linear", antialias=antialias)


def resize_bilinear_align_corners(x: jax.Array, size: Tuple[int, int]) -> jax.Array:
    """torch ``F.upsample(mode='bilinear', align_corners=True)`` parity.

    Used by the FID wrapper (FID/inception.py:118) and the DAMSM CNN encoder
    (text_relevance/encoders.py:162).  jax.image.resize has no align_corners
    mode, so the gather weights are built explicitly; separable matmuls keep
    it on the MXU.
    """
    n, h, w, c = x.shape
    out_h, out_w = size
    if (h, w) == size:
        return x

    def weights(in_dim: int, out_dim: int, dtype) -> jax.Array:
        if out_dim == 1:
            pos = jnp.zeros((1,), jnp.float32)
        else:
            pos = jnp.arange(out_dim, dtype=jnp.float32) * (in_dim - 1) / (out_dim - 1)
        lo = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, in_dim - 1)
        hi = jnp.clip(lo + 1, 0, in_dim - 1)
        frac = pos - lo.astype(jnp.float32)
        w_mat = jnp.zeros((out_dim, in_dim), jnp.float32)
        w_mat = w_mat.at[jnp.arange(out_dim), lo].add(1.0 - frac)
        w_mat = w_mat.at[jnp.arange(out_dim), hi].add(frac)
        return w_mat.astype(dtype)

    wh = weights(h, out_h, x.dtype)  # [out_h, h]
    ww = weights(w, out_w, x.dtype)  # [out_w, w]
    x = jnp.einsum("oh,nhwc->nowc", wh, x)  # -> [n, out_h, w, c]
    x = jnp.einsum("pw,nowc->nopc", ww, x)  # -> [n, out_h, out_w, c]
    return x
