"""Fused InceptionV3 stem as a single Pallas TPU kernel.

The stem (normalize -> Conv2d_1a 3x3/2 -> Conv2d_2a 3x3 -> Conv2d_2b 3x3 pad1
-> maxpool 3x3/2) costs ~8.8 ms per 256-batch under XLA on v5e — dominated by
HBM round trips of the large early activations (~2.8 GB per batch of
149^2x32 / 147^2x32 / 147^2x64 intermediates) and the MXU-hostile 3-channel
first conv.  This kernel keeps every intermediate in VMEM: each grid step
DMAs one 44-row input halo strip (uint8), computes the whole chain as shifted
-slice matmuls, and writes only its 8-row strip of pooled output.

Index algebra (VALID convs; input top-padded by 2 zero rows so strip starts
are uniform): pool-out rows [8p, 8p+8) <- conv2b rows [16p, 16p+17) <-
conv2a rows [16p-1, 16p+18) <- conv1a rows [16p-1, 16p+20) <- padded input
rows [32p, 32p+44).  Strided (stride-2) taps use even-length slices reshaped
to [out, 2] with the odd lane discarded — no strided memory ops.

The normalize affine and all eval-mode BNs fold into conv kernels/biases
(exact algebra, fold_stem_params), so the kernel consumes raw uint8.
Numerics validate against the unfused XLA chain (tests, interpret mode).

STATUS (round 1): numerics are exact in interpret mode, but Mosaic on this
jaxlib rejects the lane-splitting reshape ([44, 900] -> [44, 300, 3], u8 or
f32) needed to deinterleave channels after the strip DMA — compiled-TPU
execution is blocked until the kernel is reworked to a channel-planes layout
(host-side [B, 3, H, W] transpose + per-channel 2D taps; see ROADMAP.md).
The production path remains the XLA stem inside
tise_tpu/backbones/inception_v3.py.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tise_tpu.backbones.inception_v3 import BN_EPS
from tise_tpu.ops.preprocess import RECIPES

ROWS_IN = 44  # input rows per strip (padded index space)
ROWS_1A = 21  # conv1a output rows per strip (incl. the row-(-1) halo)
ROWS_2B = 17
ROWS_POOL = 8
N_STRIPS = 10  # ceil(73 / 8); the tail of strip 9 is sliced off
H_PAD = 2 + 299 + 31  # = 332: top halo 2, bottom cover for strip 9
W_PAD = 300  # 299 + 1 col so stride-2 col slices stay in range
W_1A = 149
W_2A = 147


class FoldedStem(NamedTuple):
    k1: jax.Array  # [27, 32]   conv1a (dy, dx, c)-flattened, normalize folded
    b1: jax.Array  # [1, 32]
    k2: jax.Array  # [288, 32]  conv2a
    b2: jax.Array  # [1, 32]
    k3: jax.Array  # [288, 64]  conv2b
    b3: jax.Array  # [1, 64]


def fold_stem_params(params: Dict[str, Any], recipe: str) -> FoldedStem:
    """Fold the uint8 normalize affine and the eval BNs into conv
    kernel/bias pairs (float64 host algebra, exact).

    normalize: x_c = v_c * s_c + t_c; conv(x) = conv_{k * s}(v) + sum(k) @ t.
    BN eval: y = conv * inv + (beta - mean * inv).
    """

    def fold(block, in_scale=None, in_shift=None):
        k = np.asarray(block["conv"]["kernel"], np.float64)  # [3,3,C,O]
        inv = np.asarray(block["bn_scale"], np.float64) / np.sqrt(
            np.asarray(block["bn_var"], np.float64) + BN_EPS
        )
        bias = np.asarray(block["bn_bias"], np.float64) - np.asarray(block["bn_mean"], np.float64) * inv
        if in_scale is not None:
            bias = bias + np.einsum("hwio,i->o", k, np.asarray(in_shift, np.float64)) * inv
            k = k * np.asarray(in_scale, np.float64)[None, None, :, None]
        k = k * inv[None, None, None, :]
        o = k.shape[-1]
        return (
            jnp.asarray(k.reshape(-1, o), jnp.float32),
            jnp.asarray(bias.reshape(1, o), jnp.float32),
        )

    scale, shift = RECIPES[recipe]
    k1, b1 = fold(params["Conv2d_1a_3x3"], scale, shift)
    k2, b2 = fold(params["Conv2d_2a_3x3"])
    k3, b3 = fold(params["Conv2d_2b_3x3"])
    return FoldedStem(k1, b1, k2, b2, k3, b3)


def _stride2_tap(x: jax.Array, dy: int, dx: int, out_rows: int, out_cols: int) -> jax.Array:
    """x[dy + 2r, dx + 2c, :] for r < out_rows, c < out_cols, sliced without
    strided memory ops (even-length slice -> reshape -> even lane)."""
    c = x.shape[-1]
    rows = x[dy : dy + 2 * out_rows].reshape(out_rows, 2, x.shape[1], c)[:, 0]
    cols = rows[:, dx : dx + 2 * out_cols].reshape(out_rows, out_cols, 2, c)[:, :, 0]
    return cols


def _conv_stride2(x: jax.Array, k: jax.Array, bias: jax.Array, out_rows: int, out_cols: int) -> jax.Array:
    """3x3/2 VALID conv: gather the 9 taps, one [M, 9C] x [9C, O] matmul."""
    c = x.shape[-1]
    pat = jnp.concatenate(
        [_stride2_tap(x, dy, dx, out_rows, out_cols) for dy in range(3) for dx in range(3)], axis=-1
    )
    out = jnp.dot(pat.reshape(out_rows * out_cols, 9 * c), k, preferred_element_type=jnp.float32)
    return jax.nn.relu(out.reshape(out_rows, out_cols, -1) + bias[0])


def _conv_stride1(x: jax.Array, k: jax.Array, bias: jax.Array, pad_cols: bool) -> jax.Array:
    """3x3/1 conv (VALID rows; VALID or SAME cols) via shifted slices."""
    r, w, c = x.shape
    if pad_cols:
        x = jnp.pad(x, ((0, 0), (1, 1), (0, 0)))
        w += 2
    out_rows, out_cols = r - 2, w - 2
    pat = jnp.concatenate(
        [x[dy : dy + out_rows, dx : dx + out_cols] for dy in range(3) for dx in range(3)], axis=-1
    )
    out = jnp.dot(pat.reshape(out_rows * out_cols, 9 * c), k, preferred_element_type=jnp.float32)
    return jax.nn.relu(out.reshape(out_rows, out_cols, -1) + bias[0])


def _maxpool_3x3_s2(x: jax.Array, out_rows: int, out_cols: int) -> jax.Array:
    """3x3/2 VALID max pool (input padded so every tap slice is in range;
    pads land only in discarded odd lanes)."""
    x = jnp.pad(x, ((0, 1), (0, 1), (0, 0)))
    acc = None
    for dy in range(3):
        for dx in range(3):
            tap = _stride2_tap(x, dy, dx, out_rows, out_cols)
            acc = tap if acc is None else jnp.maximum(acc, tap)
    return acc


def _stem_kernel(x_hbm, k1, b1, k2, b2, k3, b3, out_ref, x_vmem, sem):
    i = pl.program_id(0)
    p = pl.program_id(1)
    # x_hbm is the whole (unblocked) array in ANY space: index image i manually
    copy = pltpu.make_async_copy(x_hbm.at[i, pl.ds(p * 32, ROWS_IN)], x_vmem, sem)
    copy.start()
    copy.wait()
    # Mosaic: no direct u8->f32 cast (hop via i32) and no i8 lane-splitting
    # reshape (cast BEFORE reshaping)
    x = x_vmem[:].astype(jnp.int32).astype(jnp.float32).reshape(ROWS_IN, W_PAD, 3)
    a1 = _conv_stride2(x, k1[:], b1[:], ROWS_1A, W_1A)  # [21, 149, 32]
    a2 = _conv_stride1(a1, k2[:], b2[:], pad_cols=False)  # [19, 147, 32]
    # conv2b's SAME row padding means conv2a rows outside [0, 146] must be
    # ZERO; the halo rows computed from padded input are fabricated (bias+relu
    # of zeros, nonzero) — mask them.  local row l <-> global 16p - 1 + l.
    g = 16 * p - 1 + jax.lax.broadcasted_iota(jnp.int32, a2.shape, 0)
    a2 = jnp.where((g >= 0) & (g <= 146), a2, 0.0)
    a3 = _conv_stride1(a2, k3[:], b3[:], pad_cols=True)  # [17, 147, 64]
    out_ref[0] = _maxpool_3x3_s2(a3, ROWS_POOL, 73)  # [8, 73, 64]


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_stem(images_u8: jax.Array, folded: FoldedStem, interpret: bool = False) -> jax.Array:
    """[B, 299, 299, 3] uint8 -> maxpool1 activations [B, 73, 73, 64]."""
    b = images_u8.shape[0]
    x = jnp.pad(images_u8, ((0, 0), (2, H_PAD - 301), (0, W_PAD - 299), (0, 0)))
    x = x.reshape(b, H_PAD, W_PAD * 3)

    def wspec(rows, cols):
        return pl.BlockSpec((rows, cols), lambda i, p: (0, 0))

    f = FoldedStem(*folded)
    out = pl.pallas_call(
        _stem_kernel,
        out_shape=jax.ShapeDtypeStruct((b, N_STRIPS * ROWS_POOL, 73, 64), jnp.float32),
        grid=(b, N_STRIPS),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            wspec(27, 32),
            wspec(1, 32),
            wspec(288, 32),
            wspec(1, 32),
            wspec(288, 64),
            wspec(1, 64),
        ],
        out_specs=pl.BlockSpec((1, ROWS_POOL, 73, 64), lambda i, p: (i, p, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((ROWS_IN, W_PAD * 3), jnp.uint8),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(x, f.k1, f.b1, f.k2, f.b2, f.k3, f.b3)
    return out[:, :73]


def stem_reference(images_u8: jax.Array, folded: FoldedStem) -> jax.Array:
    """Unfused XLA chain with the same folded weights (numerics oracle)."""
    x = images_u8.astype(jnp.float32)
    f = FoldedStem(*folded)

    def conv(x, k2d, b, cin, stride, padding):
        k = k2d.reshape(3, 3, cin, -1)
        out = jax.lax.conv_general_dilated(
            x, k, (stride, stride), padding, dimension_numbers=("NHWC", "HWIO", "NHWC")
        )
        return jax.nn.relu(out + b[0])

    x = conv(x, f.k1, f.b1, 3, 2, "VALID")
    x = conv(x, f.k2, f.b2, 32, 1, "VALID")
    x = conv(x, f.k3, f.b3, 32, 1, ((1, 1), (1, 1)))
    return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1), "VALID")
