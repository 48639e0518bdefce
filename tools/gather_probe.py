"""Probe XLA:TPU gather formulations for the ROIAlign hot path.

The det_ablate.py breakdown shows the multilevel ROIAlign gather at ~16 of
19 ms/img (83%) while moving only ~400 MB/img — descriptor/lowering bound,
not HBM bound.  This probes alternative formulations at the real shapes
(N=1000 boxes, 14x14 samples, C=256, ~53k flat rows from an 800px P2..P5
pyramid) with in-jit rep chains (tunnel rules, ROADMAP.md).

Run: python tools/gather_probe.py
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
H2, W2 = 200, 200  # P2 of 800px
ROWS = H2 * W2 + 100 * 100 + 50 * 50 + 25 * 25
MB = 8  # vmap batch like the detector
CHAIN = 8
ITERS = 3


def timeit(name, fn, *args):
    f = jax.jit(fn)
    t0 = time.perf_counter()
    float(f(*args))
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    outs = [f(*args) for _ in range(ITERS)]
    float(outs[-1])
    dt = (time.perf_counter() - t0) / (ITERS * CHAIN * MB) * 1000
    print(f"{name:28s}: {dt:8.3f} ms/img   (compile {compile_s:5.1f}s)", flush=True)
    return dt


def main():
    from tise_tpu.core import compile_cache

    compile_cache.enable()
    rng = np.random.RandomState(0)
    flat = jnp.asarray(rng.randn(MB, ROWS, C).astype(np.float32)).astype(jnp.bfloat16)
    # random row indices + fractional weights, like real boxes
    iy0 = jnp.asarray(rng.randint(0, H2 - 1, (MB, N, S)).astype(np.int32))
    ix0 = jnp.asarray(rng.randint(0, W2 - 1, (MB, N, S)).astype(np.int32))
    fy = jnp.asarray(rng.rand(MB, N, S).astype(np.float32))
    fx = jnp.asarray(rng.rand(MB, N, S).astype(np.float32))
    touch = jax.jit(lambda *xs: sum(jnp.sum(x[..., 0].astype(jnp.float32)) for x in xs))
    float(touch(flat, iy0, ix0))

    def chained(body):
        def run(flat, iy0, ix0, fy, fx):
            def rep(i, acc):
                out = jax.vmap(body)(flat, iy0 + i, ix0, fy, fx)
                return acc + jnp.sum(out.astype(jnp.float32))

            return jax.lax.fori_loop(0, CHAIN, rep, jnp.float32(0))

        return run

    def weights(fy, fx, dt):
        wy0 = (1 - fy).astype(dt)[:, :, None, None]
        wy1 = fy.astype(dt)[:, :, None, None]
        wx0 = (1 - fx).astype(dt)[:, None, :, None]
        wx1 = fx.astype(dt)[:, None, :, None]
        return wy0, wy1, wx0, wx1

    # 1) current: 4 independent row gathers
    def form_4gather(flat, iy0, ix0, fy, fx):
        i00 = iy0[:, :, None] * W2 + ix0[:, None, :]
        i01 = i00 + 1
        i10 = i00 + W2
        i11 = i10 + 1
        wy0, wy1, wx0, wx1 = weights(fy, fx, flat.dtype)
        return (flat[i00] * (wy0 * wx0) + flat[i01] * (wy0 * wx1)
                + flat[i10] * (wy1 * wx0) + flat[i11] * (wy1 * wx1))

    # 2) one stacked gather (4x fewer gather ops, same descriptors)
    def form_stacked(flat, iy0, ix0, fy, fx):
        i00 = iy0[:, :, None] * W2 + ix0[:, None, :]
        idx = jnp.stack([i00, i00 + 1, i00 + W2, i00 + W2 + 1])  # [4, N, S, S]
        v = flat[idx]  # [4, N, S, S, C]
        wy0, wy1, wx0, wx1 = weights(fy, fx, flat.dtype)
        return (v[0] * (wy0 * wx0) + v[1] * (wy0 * wx1)
                + v[2] * (wy1 * wx0) + v[3] * (wy1 * wx1))

    # 3) x-pair gather: slice_sizes (2, C) on the flat buffer
    def form_xpair(flat, iy0, ix0, fy, fx):
        i00 = (iy0[:, :, None] * W2 + ix0[:, None, :]).reshape(-1, 1)  # [N*S*S, 1]
        i10 = i00 + W2
        dnums = jax.lax.GatherDimensionNumbers(
            offset_dims=(1, 2), collapsed_slice_dims=(), start_index_map=(0,)
        )
        g0 = jax.lax.gather(flat, i00, dnums, slice_sizes=(2, C)).reshape(N, S, S, 2, C)
        g1 = jax.lax.gather(flat, i10, dnums, slice_sizes=(2, C)).reshape(N, S, S, 2, C)
        wy0, wy1, wx0, wx1 = weights(fy, fx, flat.dtype)
        wx0 = wx0[..., None]  # align with the pair axis
        wx1 = wx1[..., None]
        top = g0[..., 0, :] * wx0[..., 0, :] + g0[..., 1, :] * wx1[..., 0, :]
        bot = g1[..., 0, :] * wx0[..., 0, :] + g1[..., 1, :] * wx1[..., 0, :]
        return top * wy0 + bot * wy1

    # 4) 2x2 patch gather on the [H, W, C] view: slice_sizes (2, 2, C)
    def form_patch(flat, iy0, ix0, fy, fx):
        feat = flat[: H2 * W2].reshape(H2, W2, C)
        starts = jnp.stack(
            [jnp.broadcast_to(iy0[:, :, None], (N, S, S)).reshape(-1),
             jnp.broadcast_to(ix0[:, None, :], (N, S, S)).reshape(-1)], axis=1
        )  # [N*S*S, 2]
        dnums = jax.lax.GatherDimensionNumbers(
            offset_dims=(1, 2, 3), collapsed_slice_dims=(), start_index_map=(0, 1)
        )
        v = jax.lax.gather(feat, starts, dnums, slice_sizes=(2, 2, C)).reshape(N, S, S, 2, 2, C)
        wy0, wy1, wx0, wx1 = weights(fy, fx, flat.dtype)
        top = v[..., 0, 0, :] * wx0[..., 0, :] + v[..., 0, 1, :] * wx1[..., 0, :]
        bot = v[..., 1, 0, :] * wx0[..., 0, :] + v[..., 1, 1, :] * wx1[..., 0, :]
        return top * wy0 + bot * wy1

    # 5) descriptor floor: same bytes as ONE contiguous slice per box-row
    def form_floor(flat, iy0, ix0, fy, fx):
        idx = (iy0[:, :, None] * W2 + ix0[:, None, :])[:, :, 0]  # [N, S]
        v = flat[idx]  # N*S row gathers of C
        return v * fy[..., None].astype(flat.dtype)

    # 6) sorted indices (locality): does coalescing matter?
    def form_sorted(flat, iy0, ix0, fy, fx):
        i00 = (iy0[:, :, None] * W2 + ix0[:, None, :]).reshape(-1)
        i_sorted = jnp.sort(i00)
        v = flat[i_sorted].reshape(N, S, S, C)
        wy0, wy1, wx0, wx1 = weights(fy, fx, flat.dtype)
        return v * (wy0 * wx0)

    for name, fn in [
        ("4gather (current)", form_4gather),
        ("stacked 1 gather", form_stacked),
        ("x-pair slice (2,C)", form_xpair),
        ("patch slice (2,2,C)", form_patch),
        ("floor: N*S row gathers", form_floor),
        ("sorted single gather", form_sorted),
    ]:
        try:
            timeit(name, chained(fn), flat, iy0, ix0, fy, fx)
        except Exception as e:  # noqa: BLE001
            print(f"{name:28s}: FAILED {type(e).__name__}: {str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
