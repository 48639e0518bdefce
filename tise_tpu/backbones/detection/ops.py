"""Static-shape detection ops: anchors, box transforms, IoU, NMS, ROIAlign.

XLA needs static shapes, so everything that is dynamically sized in
detectron2 (proposal counts, per-class survivors) is fixed-size here with
validity masks — the standard TF-TPU detection formulation (SURVEY.md "Hard
parts": fixed-size top-k proposal/NMS with padding masks).
"""

from __future__ import annotations

from functools import partial
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def generate_anchors(
    feat_h: int, feat_w: int, stride: int, size: float, aspect_ratios: Sequence[float] = (0.5, 1.0, 2.0)
) -> np.ndarray:
    """[H*W*A, 4] xyxy anchors, detectron2 DefaultAnchorGenerator semantics:
    centered at (stride/2 + stride*i), area size^2, aspect h/w."""
    anchors = []
    for ar in aspect_ratios:
        w = size / np.sqrt(ar)
        h = size * np.sqrt(ar)
        anchors.append([-w / 2, -h / 2, w / 2, h / 2])
    base = np.asarray(anchors, np.float32)  # [A, 4]
    ys = (np.arange(feat_h, dtype=np.float32)) * stride
    xs = (np.arange(feat_w, dtype=np.float32)) * stride
    shift_x, shift_y = np.meshgrid(xs, ys)
    shifts = np.stack([shift_x, shift_y, shift_x, shift_y], axis=-1).reshape(-1, 1, 4)
    return (shifts + base[None]).reshape(-1, 4)


def apply_deltas(boxes: jax.Array, deltas: jax.Array, clip: float = np.log(1000.0 / 16)) -> jax.Array:
    """Box regression transform (dx, dy, dw, dh) -> xyxy (detectron2
    Box2BoxTransform, weights (1,1,1,1) for RPN)."""
    w = boxes[..., 2] - boxes[..., 0]
    h = boxes[..., 3] - boxes[..., 1]
    cx = boxes[..., 0] + 0.5 * w
    cy = boxes[..., 1] + 0.5 * h
    dx, dy, dw, dh = deltas[..., 0], deltas[..., 1], deltas[..., 2], deltas[..., 3]
    dw = jnp.clip(dw, max=clip)
    dh = jnp.clip(dh, max=clip)
    ncx = dx * w + cx
    ncy = dy * h + cy
    nw = jnp.exp(dw) * w
    nh = jnp.exp(dh) * h
    return jnp.stack([ncx - 0.5 * nw, ncy - 0.5 * nh, ncx + 0.5 * nw, ncy + 0.5 * nh], axis=-1)


def clip_boxes(boxes: jax.Array, height: float, width: float) -> jax.Array:
    x1 = jnp.clip(boxes[..., 0], 0, width)
    y1 = jnp.clip(boxes[..., 1], 0, height)
    x2 = jnp.clip(boxes[..., 2], 0, width)
    y2 = jnp.clip(boxes[..., 3], 0, height)
    return jnp.stack([x1, y1, x2, y2], axis=-1)


def box_iou(a: jax.Array, b: jax.Array) -> jax.Array:
    """[N,4] x [M,4] -> [N,M] IoU."""
    area_a = jnp.clip(a[:, 2] - a[:, 0], 0) * jnp.clip(a[:, 3] - a[:, 1], 0)
    area_b = jnp.clip(b[:, 2] - b[:, 0], 0) * jnp.clip(b[:, 3] - b[:, 1], 0)
    lt = jnp.maximum(a[:, None, :2], b[None, :, :2])
    rb = jnp.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = jnp.clip(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    union = area_a[:, None] + area_b[None, :] - inter
    return inter / jnp.maximum(union, 1e-9)


def nms_mask(boxes: jax.Array, scores: jax.Array, iou_threshold: float) -> jax.Array:
    """Greedy NMS over score-DESCENDING-sorted inputs -> bool keep mask.

    Exact greedy semantics via fixpoint iteration instead of a K-step
    sequential loop: ``keep`` is the unique solution of the well-founded
    recursion ``keep[j] = not any(i < j and keep[i] and iou[i, j] > t)``.
    Iterating ``keep <- recursion(keep)`` from all-true makes every entry
    whose suppression-chain depth is <= t correct after t rounds (induction
    on depth), so a while_loop to stability yields exactly the sequential
    greedy result in O(chain depth) matrix steps — typically < 10 rounds for
    1000 boxes vs 1000 sequential fori_loop iterations (the former hot-loop
    cost on TPU, where each tiny loop step pays dispatch latency).
    Equivalence vs the sequential algorithm is tested
    (tests/test_detection.py).  Invalid rows must carry scores of -inf (they
    sort last; any suppression they'd do is irrelevant since everything
    earlier outranks them — and -inf rows have zero-area IoU 0 anyway).
    """
    k = boxes.shape[0]
    iou = box_iou(boxes, boxes)
    # strictly-upper-triangular overlap: i suppresses j only if i ranks higher
    over = (iou > iou_threshold) & (jnp.arange(k)[:, None] < jnp.arange(k)[None, :])

    def cond(state):
        keep, prev, it = state
        return jnp.any(keep != prev) & (it < k)

    def body(state):
        keep, _, it = state
        new = ~jnp.any(over & keep[:, None], axis=0)
        return new, keep, it + 1

    init = jnp.ones((k,), bool)
    keep, _, _ = jax.lax.while_loop(cond, body, (init, jnp.zeros((k,), bool), 0))
    return keep


def topk_sorted(scores: jax.Array, k: int) -> Tuple[jax.Array, jax.Array]:
    """(top-k scores desc, indices)."""
    return jax.lax.top_k(scores, k)


def roi_align(
    feat: jax.Array, boxes: jax.Array, stride: int, out_size: int = 7, sampling: int = 2
) -> jax.Array:
    """ROIAlign (aligned=True, fixed sampling grid) on one feature level.

    feat [H, W, C]; boxes [N, 4] xyxy in image coordinates ->
    [N, out, out, C].  detectron2's ROIAlignV2 subtracts half a pixel
    (aligned=True) and, with sampling_ratio=0, adapts the grid per box; a
    fixed ``sampling`` x ``sampling`` grid per bin is used here (the standard
    static-shape TPU choice; <1e-3 box-score effect at 800px).
    """
    h, w, c = feat.shape
    n = boxes.shape[0]
    scale = 1.0 / stride
    x1 = boxes[:, 0] * scale - 0.5
    y1 = boxes[:, 1] * scale - 0.5
    x2 = boxes[:, 2] * scale - 0.5
    y2 = boxes[:, 3] * scale - 0.5
    bw = jnp.maximum(x2 - x1, 1e-6)
    bh = jnp.maximum(y2 - y1, 1e-6)

    # sample positions: out_size bins, `sampling` points per bin
    grid = (jnp.arange(out_size * sampling, dtype=feat.dtype) + 0.5) / sampling  # in bin units
    ys = y1[:, None] + bh[:, None] * grid[None, :] / out_size  # [N, S]
    xs = x1[:, None] + bw[:, None] * grid[None, :] / out_size

    def bilinear(coords, size):
        c0 = jnp.clip(jnp.floor(coords), 0, size - 1)
        c1 = jnp.clip(c0 + 1, 0, size - 1)
        frac = jnp.clip(coords - c0, 0.0, 1.0)
        return c0.astype(jnp.int32), c1.astype(jnp.int32), frac

    y0, y1i, fy = bilinear(ys, h)
    x0, x1i, fx = bilinear(xs, w)

    # direct 4-corner gathers on the flattened map: peak intermediate is
    # [N, S, S, C] (the separable row-then-column form materialized
    # [N, S, W, C] — 2.9 GB/image at stride 4 / 800 px, OOM at batch 8)
    feat_flat = feat.reshape(h * w, c)
    iy0, iy1 = y0[:, :, None], y1i[:, :, None]  # [N, S, 1]
    ix0, ix1 = x0[:, None, :], x1i[:, None, :]  # [N, 1, S]
    wy0, wy1 = (1 - fy)[:, :, None, None], fy[:, :, None, None]
    wx0, wx1 = (1 - fx)[:, None, :, None], fx[:, None, :, None]
    vals = (
        feat_flat[iy0 * w + ix0] * (wy0 * wx0)
        + feat_flat[iy0 * w + ix1] * (wy0 * wx1)
        + feat_flat[iy1 * w + ix0] * (wy1 * wx0)
        + feat_flat[iy1 * w + ix1] * (wy1 * wx1)
    )  # [N, S_y, S_x, C]
    s = sampling
    vals = vals.reshape(n, out_size, s, out_size, s, c)
    return jnp.mean(vals, axis=(2, 4))


def roi_align_multilevel(
    feats: Sequence[jax.Array],
    boxes: jax.Array,
    levels: jax.Array,
    strides: Sequence[int] = (4, 8, 16, 32),
    out_size: int = 7,
    sampling: int = 2,
) -> jax.Array:
    """ROIAlign across FPN levels with ONE gather on a concatenated buffer.

    feats: list of [H_l, W_l, C] maps (P2..P5); boxes [N, 4] xyxy in image
    coordinates; levels [N] int32 in [2, 5] (``assign_fpn_level``).  Output
    [N, out, out, C] numerically identical to running ``roi_align`` per box
    on its assigned level (tested), but the per-level form computes the full
    [N, S, S, C] gather on EVERY level and masks (4x the HBM traffic of the
    useful work — ~3 GB/image at 800 px f32).

    Gather formulation (measured on v5e, tools/gather_probe*.py): XLA:TPU
    gathers cost ~13-18 ns per scattered 512B row touched and ~4.3 ns per
    row inside longer contiguous slices — descriptor/row bound, far below
    HBM bandwidth.  Four per-corner row gathers (784k rows at N=1000,
    14x14 samples, C=256) measured 16 ms/img; so the four bilinear corners
    of every cell are pre-packed channel-wise into ONE ``[rows, 4C]``
    buffer via clamped x/y/xy shifts (clamp == the corner clamping below),
    and exactly one gather of N*S*S contiguous 2 KB rows runs (~4x fewer
    rows, each 4x wider): measured 3.4 ms/img equivalent.  The pack itself
    is fused elementwise traffic (~108 MB at 800 px bf16).  Interpolation
    coordinates/weights are computed in f32 and cast to the feature dtype
    for the multiply, keeping the bf16 fast path's intermediates
    half-width.

    The gather rows are ordered BIN-major — index [n, by, bx, sy, sx] — so
    the 2x2 sample mean of each output bin reduces over the 4
    memory-adjacent rows just gathered ([N, 49, 4, C] -> mean axis 2), which
    XLA fuses with the corner weighted-sum into the gather consumer; the
    sample-major order ([N, S, S, C] with the bin mean striding axes 2 and
    4) materialized the interpolated buffer and re-read it (~2.0 ms/img of
    the roi stage vs ~0.6 ms floor).
    """
    c = feats[0].shape[-1]
    hs = np.asarray([f.shape[0] for f in feats], np.int32)
    ws = np.asarray([f.shape[1] for f in feats], np.int32)
    offs = np.concatenate([[0], np.cumsum(hs.astype(np.int64) * ws)]).astype(np.int32)

    def pack_corners(f: jax.Array) -> jax.Array:
        # [H, W, C] -> [H*W, 4C]: row (y, x) = (f[y,x], f[y,x+1], f[y+1,x],
        # f[y+1,x+1]) with clamped edges
        fx = jnp.concatenate([f[:, 1:], f[:, -1:]], axis=1)
        fy = jnp.concatenate([f[1:], f[-1:]], axis=0)
        fxy = jnp.concatenate([fy[:, 1:], fy[:, -1:]], axis=1)
        return jnp.concatenate([f, fx, fy, fxy], axis=-1).reshape(-1, 4 * c)

    flat = jnp.concatenate([pack_corners(f) for f in feats], axis=0)
    li = jnp.clip(levels - 2, 0, len(feats) - 1)
    inv_stride = jnp.asarray(1.0 / np.asarray(strides, np.float32))[li]  # [N]
    h_n = jnp.asarray(hs)[li]
    w_n = jnp.asarray(ws)[li]
    off_n = jnp.asarray(offs[:-1])[li]

    b32 = boxes.astype(jnp.float32)
    x1 = b32[:, 0] * inv_stride - 0.5
    y1 = b32[:, 1] * inv_stride - 0.5
    x2 = b32[:, 2] * inv_stride - 0.5
    y2 = b32[:, 3] * inv_stride - 0.5
    bw = jnp.maximum(x2 - x1, 1e-6)
    bh = jnp.maximum(y2 - y1, 1e-6)
    s = out_size * sampling
    grid = (jnp.arange(s, dtype=jnp.float32) + 0.5) / sampling  # in bin units
    ys = y1[:, None] + bh[:, None] * grid[None, :] / out_size  # [N, S]
    xs = x1[:, None] + bw[:, None] * grid[None, :] / out_size

    def bilinear(coords, size):
        hi = (size - 1).astype(jnp.float32)[:, None]
        c0 = jnp.clip(jnp.floor(coords), 0.0, hi)
        c1 = jnp.clip(c0 + 1, 0.0, hi)
        frac = jnp.clip(coords - c0, 0.0, 1.0)
        return c0.astype(jnp.int32), c1.astype(jnp.int32), frac

    y0, _y1i, fy = bilinear(ys, h_n)
    x0, _x1i, fx = bilinear(xs, w_n)

    n = boxes.shape[0]
    o, sp = out_size, sampling
    # bin-major index [n, by, bx, sy, sx] (see docstring)
    iy = y0.reshape(n, o, sp)[:, :, None, :, None]  # [N, o, 1, sp, 1]
    ix = x0.reshape(n, o, sp)[:, None, :, None, :]  # [N, 1, o, 1, sp]
    idx = off_n[:, None, None, None, None] + iy * w_n[:, None, None, None, None] + ix
    wd = flat.dtype
    fy = fy.reshape(n, o, sp)[:, :, None, :, None]
    fx = fx.reshape(n, o, sp)[:, None, :, None, :]
    wy0, wy1 = (1 - fy), fy
    wx0, wx1 = (1 - fx), fx
    v = flat[idx.reshape(n, o * o, sp * sp)]  # [N, 49, 4, 4C] — all four corners
    w = jnp.stack([wy0 * wx0, wy0 * wx1, wy1 * wx0, wy1 * wx1], axis=-1)  # [N,o,o,sp,sp,4]
    w = w.reshape(n, o * o, sp * sp, 4).astype(wd)
    vals = (
        v[..., 0 * c : 1 * c] * w[..., 0:1]
        + v[..., 1 * c : 2 * c] * w[..., 1:2]
        + v[..., 2 * c : 3 * c] * w[..., 2:3]
        + v[..., 3 * c : 4 * c] * w[..., 3:4]
    )  # [N, 49, 4, C]
    vals = jnp.mean(vals.astype(jnp.float32), axis=2)  # contiguous-row bin mean
    return vals.reshape(n, o, o, c).astype(wd)


def assign_fpn_level(boxes: jax.Array, k_min: int = 2, k_max: int = 5, canonical: float = 224.0) -> jax.Array:
    """FPN level per box: floor(4 + log2(sqrt(area)/224)), clamped
    (detectron2 assign_boxes_to_levels)."""
    area = jnp.clip(boxes[:, 2] - boxes[:, 0], 0) * jnp.clip(boxes[:, 3] - boxes[:, 1], 0)
    lvl = jnp.floor(4 + jnp.log2(jnp.sqrt(area) / canonical + 1e-8))
    return jnp.clip(lvl, k_min, k_max).astype(jnp.int32)
