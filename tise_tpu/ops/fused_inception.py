"""Whole-block fused Pallas kernels for the InceptionV3 trunk (bf16 path).

Why whole blocks: measured on v5e at batch 256 bf16, every per-op lever
failed —
  * a standalone Pallas avg-pool regressed end-to-end (custom-call
    fusion/layout barrier, 3848 -> 2676 img/s),
  * conv-as-matmul XLA reformulations are a wash (single ops are already at
    the HBM roofline in isolation),
while the in-situ Inception sections run ~3x above their roofline because
every branch re-reads the same activation from HBM (4 branch reads + pool
read + concat writes per block).  A fused block kernel reads x ONCE into
VMEM, evaluates all branches there, and writes only the concatenated output.

Mosaic note: in-kernel [rows, C] <-> [nb, H, W, C] reshapes are rejected
("unsupported shape cast": 17/35 are not sublane-aligned), so the kernels
work ENTIRELY in flat row space.  Images are flattened to rows r=(n, h, w)
outside the kernel; a spatial (dy, dx) tap is a row shift by 17*dy + dx (or
35*dy + dx) combined with an iota-derived validity mask that zeroes taps
whose logical neighbour falls outside the image — this reproduces zero
'SAME' padding exactly while every in-kernel value stays 2D.

Branch fusion layout per block:
  * all 1x1-from-x branches      -> ONE [rows, Cin] x [Cin, sum] matmul
  * spatial convs (5x5, 1x7,...) -> masked-shift matmul accumulation
  * pool branch                  -> 9 masked-shift adds (f32) then 1x1

This module consumes the SAME parameter pytree as
``backbones/inception_v3.InceptionV3`` (torchvision converter layout) so all
weight tooling is shared; BN is folded into conv weights/bias at prep time
(inference-only — reference image_realism/FID/inception.py freezes BN).
torch pool semantics (count_include_pad=True); the slim/tf2015 flavors keep
the unfused flax path.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DT = jnp.bfloat16


# ---------------------------------------------------------------------------
# Parameter folding: BasicConv2d {conv.kernel, bn_*} -> (w_folded, bias)
# ---------------------------------------------------------------------------


def _fold(mod: Dict[str, Any], eps: float = 0.001) -> Tuple[jax.Array, jax.Array]:
    """BN-folded conv: w' = w * inv, b' = bias - mean * inv (f32 fold, bf16
    weights, f32 bias row) where inv = scale / sqrt(var + eps).  The kernel
    weight is reshaped [kh*kw, Cin, Cout] for static tap indexing."""
    w = jnp.asarray(mod["conv"]["kernel"], jnp.float32)
    inv = jnp.asarray(mod["bn_scale"], jnp.float32) * jax.lax.rsqrt(
        jnp.asarray(mod["bn_var"], jnp.float32) + eps
    )
    b = jnp.asarray(mod["bn_bias"], jnp.float32) - jnp.asarray(mod["bn_mean"], jnp.float32) * inv
    w = (w * inv).astype(DT)
    kh, kw, cin, cout = w.shape
    return w.reshape(kh * kw, cin, cout), b.reshape(1, -1)


def _cat1x1(mods: Sequence[Dict[str, Any]]) -> Tuple[jax.Array, jax.Array]:
    """Concatenate several 1x1 BasicConv2d along the output axis -> one
    [Cin, sum(Cout)] matmul weight + bias row."""
    ws, bs = zip(*(_fold(m) for m in mods))
    w = jnp.concatenate([w[0] for w in ws], axis=1)
    return w, jnp.concatenate(bs, axis=1)


# ---------------------------------------------------------------------------
# In-kernel helpers (flat [rows, C] values only)
# ---------------------------------------------------------------------------


def _shift_rows(xf, s: int):
    """out[r] = xf[(r+s) mod m] via a sublane rotate (Mosaic rejects the
    zero-concat formulation: unaligned slice offsets).  Wrapped rows read
    garbage from the other end of the block, but every wrapped row is
    provably masked by _tap_masks: a wrap needs |r+s| outside [0, m), which
    for tap s = oy*grid + ox forces either h_r + oy or w_r + ox out of the
    image (the first/last |s| rows of the block have h_r <= |oy| resp.
    >= grid-1-|oy| and small/large w_r)."""
    if s == 0:
        return xf
    return pltpu.roll(xf, (-s) % xf.shape[0], axis=0)


def _tap_masks(m: int, grid: int, rpi: int, kh: int, kw: int):
    """Validity masks per tap: rows are r = n * rpi + (h * grid + w) with
    rpi >= grid*grid (rows 289->296 / 1225->1232 are padded so every block's
    sublane count divides by 8 — a Pallas TPU block requirement).  A tap
    (dy, dx) is valid iff the logical neighbour exists; padded rows produce
    garbage outputs that are sliced off outside, and are never READ by a
    valid output because any tap reaching them has h+dy out of range."""
    idx = jax.lax.broadcasted_iota(jnp.int32, (m, 1), 0)
    pos = idx % rpi
    w_r = pos % grid
    h_r = pos // grid  # grid..rpi//grid for padded rows — masked by h bounds
    masks = {}
    for dy in range(kh):
        for dx in range(kw):
            oy, ox = dy - kh // 2, dx - kw // 2
            ok = jnp.logical_and(h_r + oy >= 0, h_r + oy < grid)
            if kw > 1:
                ok = jnp.logical_and(ok, jnp.logical_and(w_r + ox >= 0, w_r + ox < grid))
            masks[(dy, dx)] = ok
    return masks


def _dot_bias_relu(xf, w, b):
    y = jnp.dot(xf, w, preferred_element_type=jnp.float32)
    return jnp.maximum(y + b, 0.0)


def _sconv(xf, w, b, grid: int, rpi: int, kh: int, kw: int):
    """Spatial conv via matmul-then-masked-rotate accumulation.
    xf [m, C] bf16; w [kh*kw, C, O] bf16; b [1, O] f32 -> f32 [m, O].

    The dot runs on the UNshifted input (Mosaic only rotates 32-bit data, so
    we rotate the f32 matmul output instead — algebraically identical:
    out[r] = sum_tap mask(r) * (x @ w_tap)[r + s_tap])."""
    m = xf.shape[0]
    masks = _tap_masks(m, grid, rpi, kh, kw)
    acc = None
    for dy in range(kh):
        for dx in range(kw):
            s = (dy - kh // 2) * grid + (dx - kw // 2)
            t = jnp.dot(xf, w[dy * kw + dx], preferred_element_type=jnp.float32)
            t = jnp.where(masks[(dy, dx)], _shift_rows(t, s), 0.0)
            acc = t if acc is None else acc + t
    return jnp.maximum(acc + b, 0.0)


def _box9(xf, grid: int, rpi: int):
    """3x3 box SUM (zero padding) in flat row space; f32 [m, C]."""
    m = xf.shape[0]
    masks = _tap_masks(m, grid, rpi, 3, 3)
    x = xf.astype(jnp.float32)
    acc = None
    for dy in range(3):
        for dx in range(3):
            s = (dy - 1) * grid + (dx - 1)
            t = jnp.where(masks[(dy, dx)], _shift_rows(x, s), 0.0)
            acc = t if acc is None else acc + t
    return acc


# ---------------------------------------------------------------------------
# Fused InceptionC (Mixed_6b..6e): 17x17, cin 768, c7 in {128,160,192}
# ---------------------------------------------------------------------------

GRID_C, RPI_C = 17, 296  # 296 = 8 * 37 >= 17*17
GRID_A, RPI_A = 35, 1232  # 1232 = 8 * 154 >= 35*35


def _incc_kernel(c7: int, x_ref, w1_ref, b1_ref, w72_ref, b72_ref, w73_ref, b73_ref,
                 wd2_ref, bd2_ref, wd3_ref, bd3_ref, wd4_ref, bd4_ref, wd5_ref, bd5_ref,
                 wp_ref, bp_ref, o_ref):
    xf = x_ref[:]  # [m, 768]

    # all three 1x1-from-x branches in one matmul: [b1(192) | b7_1(c7) | bd_1(c7)]
    head = _dot_bias_relu(xf, w1_ref[:], b1_ref[:])
    b1 = head[:, :192]
    b7 = head[:, 192 : 192 + c7].astype(DT)
    bd = head[:, 192 + c7 :].astype(DT)

    # branch7x7: 1x7 -> 7x1(192)
    b7 = _sconv(b7, w72_ref[:], b72_ref[:], GRID_C, RPI_C, 1, 7).astype(DT)
    b7 = _sconv(b7, w73_ref[:], b73_ref[:], GRID_C, RPI_C, 7, 1)

    # branch7x7dbl: 7x1 -> 1x7 -> 7x1 -> 1x7(192)
    bd = _sconv(bd, wd2_ref[:], bd2_ref[:], GRID_C, RPI_C, 7, 1).astype(DT)
    bd = _sconv(bd, wd3_ref[:], bd3_ref[:], GRID_C, RPI_C, 1, 7).astype(DT)
    bd = _sconv(bd, wd4_ref[:], bd4_ref[:], GRID_C, RPI_C, 7, 1).astype(DT)
    bd = _sconv(bd, wd5_ref[:], bd5_ref[:], GRID_C, RPI_C, 1, 7)

    # pool branch: 3x3/s1 avg (include_pad: /9) -> 1x1(192)
    pooled = (_box9(xf, GRID_C, RPI_C) * (1.0 / 9.0)).astype(DT)
    bp = _dot_bias_relu(pooled, wp_ref[:], bp_ref[:])

    o_ref[:] = jnp.concatenate(
        [b1.astype(DT), b7.astype(DT), bd.astype(DT), bp.astype(DT)], axis=1
    )


def _incc_weights(p: Dict[str, Any]):
    w1, b1 = _cat1x1([p["branch1x1"], p["branch7x7_1"], p["branch7x7dbl_1"]])
    args = [w1, b1]
    for name in ("branch7x7_2", "branch7x7_3", "branch7x7dbl_2", "branch7x7dbl_3",
                 "branch7x7dbl_4", "branch7x7dbl_5"):
        w, b = _fold(p[name])
        args += [w, b]
    wp, bp = _fold(p["branch_pool"])
    args += [wp[0], bp]
    return args


def _zero_idx(i, n):
    return (0,) * n


def _call_flat(kernel, x: jax.Array, weights, *, grid: int, rpi: int, cout: int, nb: int,
               interpret: bool):
    """Common flat-row pallas_call: x [B, g, g, Cin] -> [B, g, g, cout].
    Rows are padded g*g -> rpi per image so block sublane counts divide by 8."""
    b, g, _, cin = x.shape
    rows = g * g
    xf = jnp.pad(x.reshape(b, rows, cin), ((0, 0), (0, rpi - rows), (0, 0)))
    xf = xf.reshape(b * rpi, cin)
    m = nb * rpi
    wspecs = [
        pl.BlockSpec(wt.shape, functools.partial(_zero_idx, n=wt.ndim), memory_space=pltpu.VMEM)
        for wt in weights
    ]
    out = pl.pallas_call(
        kernel,
        grid=(pl.cdiv(b, nb),),
        in_specs=[pl.BlockSpec((m, cin), lambda i: (i, 0), memory_space=pltpu.VMEM)] + wspecs,
        out_specs=pl.BlockSpec((m, cout), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * rpi, cout), DT),
        interpret=interpret,
    )(xf, *weights)
    return out.reshape(b, rpi, cout)[:, :rows].reshape(b, g, g, cout)


@functools.partial(jax.jit, static_argnames=("c7", "nb", "interpret"))
def fused_inception_c(x: jax.Array, weights, *, c7: int, nb: int = 2, interpret: bool = False):
    """x [B,17,17,768] bf16, weights from :func:`_incc_weights` (same pytree
    as flax ``InceptionC``) -> [B,17,17,768] bf16."""
    return _call_flat(
        functools.partial(_incc_kernel, c7), x, weights,
        grid=GRID_C, rpi=RPI_C, cout=768, nb=nb, interpret=interpret,
    )


# ---------------------------------------------------------------------------
# Fused InceptionA (Mixed_5b..5d): 35x35, cin in {192,256,288}
# ---------------------------------------------------------------------------


def _inca_kernel(pf: int, x_ref, w1_ref, b1_ref, w52_ref, b52_ref,
                 wd2_ref, bd2_ref, wd3_ref, bd3_ref, wp_ref, bp_ref, o_ref):
    xf = x_ref[:]  # [m, cin]

    # [b1(64) | b5_1(48) | bd_1(64)]
    head = _dot_bias_relu(xf, w1_ref[:], b1_ref[:])
    b1 = head[:, :64]
    b5 = head[:, 64:112].astype(DT)
    bd = head[:, 112:].astype(DT)

    b5 = _sconv(b5, w52_ref[:], b52_ref[:], GRID_A, RPI_A, 5, 5)

    bd = _sconv(bd, wd2_ref[:], bd2_ref[:], GRID_A, RPI_A, 3, 3).astype(DT)
    bd = _sconv(bd, wd3_ref[:], bd3_ref[:], GRID_A, RPI_A, 3, 3)

    pooled = (_box9(xf, GRID_A, RPI_A) * (1.0 / 9.0)).astype(DT)
    bp = _dot_bias_relu(pooled, wp_ref[:], bp_ref[:])

    o_ref[:] = jnp.concatenate([b1.astype(DT), b5.astype(DT), bd.astype(DT), bp.astype(DT)], axis=1)


def _inca_weights(p: Dict[str, Any]):
    w1, b1 = _cat1x1([p["branch1x1"], p["branch5x5_1"], p["branch3x3dbl_1"]])
    args = [w1, b1]
    for name in ("branch5x5_2", "branch3x3dbl_2", "branch3x3dbl_3"):
        w, b = _fold(p[name])
        args += [w, b]
    wp, bp = _fold(p["branch_pool"])
    args += [wp[0], bp]
    return args


@functools.partial(jax.jit, static_argnames=("pool_features", "nb", "interpret"))
def fused_inception_a(x: jax.Array, weights, *, pool_features: int, nb: int = 1, interpret: bool = False):
    return _call_flat(
        functools.partial(_inca_kernel, pool_features), x, weights,
        grid=GRID_A, rpi=RPI_A, cout=224 + pool_features, nb=nb, interpret=interpret,
    )


# ---------------------------------------------------------------------------
# Block wrappers: same param tree as the flax trunk
# ---------------------------------------------------------------------------


class FusedBlocks:
    """Pre-folds the flax InceptionV3 param tree for the fused kernels."""

    def __init__(self, params: Dict[str, Any], interpret: bool = False):
        p = params["params"] if "params" in params else params
        self.interpret = interpret
        self.a = [
            (_inca_weights(p[f"Mixed_5{s}"]), pf)
            for s, pf in (("b", 32), ("c", 64), ("d", 64))
        ]
        self.c = [
            (_incc_weights(p[f"Mixed_6{s}"]), c7)
            for s, c7 in (("b", 128), ("c", 160), ("d", 160), ("e", 192))
        ]

    def apply_a(self, i: int, x: jax.Array) -> jax.Array:
        weights, pf = self.a[i]
        return fused_inception_a(x, weights, pool_features=pf, interpret=self.interpret)

    def apply_c(self, i: int, x: jax.Array) -> jax.Array:
        weights, c7 = self.c[i]
        return fused_inception_c(x, weights, c7=c7, interpret=self.interpret)
