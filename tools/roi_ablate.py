"""Sub-ablation of the ROI stage: pack / gather / interp / head.

det_ablate.py puts ROIAlign+head at ~9.7 ms/img after the corner-pack
change; this isolates which part.  Uses the real FPN shapes at 800px,
N=1000 proposals, in-jit rep chains (tunnel rules).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

N, S, C = 1000, 14, 256
SHAPES = [(200, 200), (100, 100), (50, 50), (25, 25)]
STRIDES = (4, 8, 16, 32)
MB = 8
CHAIN = 4
ITERS = 3


def timeit(name, fn, *args):
    f = jax.jit(fn)
    t0 = time.perf_counter()
    float(f(*args))
    c = time.perf_counter() - t0
    t0 = time.perf_counter()
    outs = [f(*args) for _ in range(ITERS)]
    float(outs[-1])
    dt = (time.perf_counter() - t0) / (ITERS * CHAIN * MB) * 1000
    print(f"{name:30s}: {dt:8.3f} ms/img   (compile {c:5.1f}s)", flush=True)


def main():
    from tise_tpu.backbones.detection import ops
    from tise_tpu.core import compile_cache

    compile_cache.enable()
    rng = np.random.RandomState(0)
    feats = [
        jnp.asarray(rng.randn(MB, h, w, C).astype(np.float32)).astype(jnp.bfloat16)
        for h, w in SHAPES
    ]
    centers = rng.uniform(50, 750, (MB, N, 2)).astype(np.float32)
    sizes = rng.uniform(20, 300, (MB, N, 2)).astype(np.float32)
    boxes = jnp.asarray(np.concatenate([centers - sizes / 2, centers + sizes / 2], -1))
    touch = jax.jit(lambda *a: sum(jnp.sum(x[..., 0].astype(jnp.float32)) for x in a))
    float(touch(*feats, boxes))

    def chained(body):
        def run(boxes, *feats):
            def rep(i, acc):
                out = jax.vmap(body)(boxes + i.astype(jnp.float32) * 0.01, *feats)
                return acc + jnp.sum(out.astype(jnp.float32))

            return jax.lax.fori_loop(0, CHAIN, rep, jnp.float32(0))

        return run

    def pack_only(boxes, *feats):
        packed = []
        for f in feats:
            fx = jnp.concatenate([f[:, 1:], f[:, -1:]], axis=1)
            fy = jnp.concatenate([f[1:], f[-1:]], axis=0)
            fxy = jnp.concatenate([fy[:, 1:], fy[:, -1:]], axis=1)
            packed.append(jnp.concatenate([f, fx, fy, fxy], -1).reshape(-1, 4 * C))
        flat = jnp.concatenate(packed, axis=0)
        return flat[:7, :7] * boxes[0, 0]

    def full_roi(boxes, *feats):
        levels = ops.assign_fpn_level(boxes)
        return ops.roi_align_multilevel(list(feats), boxes, levels, STRIDES)

    def gather_only(boxes, *feats):
        # pack + the row gather, but trivial weights (no interp math)
        packed = []
        for f in feats:
            fx = jnp.concatenate([f[:, 1:], f[:, -1:]], axis=1)
            fy = jnp.concatenate([f[1:], f[-1:]], axis=0)
            fxy = jnp.concatenate([fy[:, 1:], fy[:, -1:]], axis=1)
            packed.append(jnp.concatenate([f, fx, fy, fxy], -1).reshape(-1, 4 * C))
        flat = jnp.concatenate(packed, axis=0)
        idx = (
            (boxes[:, 0].astype(jnp.int32) % 100)[:, None, None]
            + jax.lax.broadcasted_iota(jnp.int32, (N, S, S), 1) * 37
            + jax.lax.broadcasted_iota(jnp.int32, (N, S, S), 2)
        ) % flat.shape[0]
        return flat[idx][..., :C]

    from tise_tpu.backbones.detection.rcnn import BoxHead

    head_model = BoxHead(dtype=jnp.bfloat16)
    head_params = jax.jit(
        lambda r: head_model.init(r, jnp.zeros((N, 7, 7, C), jnp.bfloat16))
    )(jax.random.PRNGKey(0))

    def head_only(boxes, *feats):
        roi = (feats[0][None, :7, :7, :] * 0 + boxes[:, :1, None, None] * 0.01).astype(jnp.bfloat16)
        roi = jnp.broadcast_to(roi, (N, 7, 7, C))
        a, b = head_model.apply(head_params, roi)
        return jnp.sum(a.astype(jnp.float32)) + jnp.sum(b.astype(jnp.float32))

    timeit("pack only", chained(pack_only), boxes, *feats)
    timeit("pack + gather (no interp)", chained(gather_only), boxes, *feats)
    timeit("full roi_align_multilevel", chained(full_roi), boxes, *feats)
    timeit("box head only", chained(head_only), boxes, *feats)


if __name__ == "__main__":
    main()
