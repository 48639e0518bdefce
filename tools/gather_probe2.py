"""Probe 2: are XLA:TPU gathers row-touch-bound or descriptor-bound?

Probe 1 (tools/gather_probe.py) measured ~13 ns per 512B row touched across
formulations.  If a long contiguous slice per descriptor pays per-ROW, the
segment-based ROIAlign redesign is dead; if per-DESCRIPTOR (with bandwidth
for the contiguous bytes), it wins 10x.  Measures (1, L, C) slice gathers at
the ROIAlign shapes plus a dynamic-slice-in-scan reference.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

H2, W2, C = 200, 204, 256
MB = 8
CHAIN = 8
ITERS = 3
NROWS = 28_000  # (box, y-corner-row) descriptors for N=1000, S=14


def timeit(name, fn, *args):
    f = jax.jit(fn)
    t0 = time.perf_counter()
    float(f(*args))
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    outs = [f(*args) for _ in range(ITERS)]
    float(outs[-1])
    dt = (time.perf_counter() - t0) / (ITERS * CHAIN * MB) * 1000
    print(f"{name:34s}: {dt:8.3f} ms/img   (compile {compile_s:5.1f}s)", flush=True)
    return dt


def main():
    from tise_tpu.core import compile_cache

    compile_cache.enable()
    rng = np.random.RandomState(0)
    feat = jnp.asarray(rng.randn(MB, H2, W2, C).astype(np.float32)).astype(jnp.bfloat16)
    ys = jnp.asarray(rng.randint(0, H2 - 1, (MB, NROWS)).astype(np.int32))
    xs = jnp.asarray(rng.randint(0, W2 - 66, (MB, NROWS)).astype(np.int32))
    touch = jax.jit(lambda *a: sum(jnp.sum(x[..., 0].astype(jnp.float32)) for x in a))
    float(touch(feat, ys, xs))

    def chained(body):
        def run(feat, ys, xs):
            def rep(i, acc):
                out = jax.vmap(body)(feat, ys + (i % 2), xs)
                return acc + jnp.sum(out.astype(jnp.float32))

            return jax.lax.fori_loop(0, CHAIN, rep, jnp.float32(0))

        return run

    def seg_gather(L):
        def body(feat, ys, xs):
            starts = jnp.stack([ys, xs], axis=1)  # [NROWS, 2]
            dnums = jax.lax.GatherDimensionNumbers(
                offset_dims=(1, 2, 3), collapsed_slice_dims=(), start_index_map=(0, 1)
            )
            v = jax.lax.gather(feat, starts, dnums, slice_sizes=(1, L, C))
            return v[..., ::4, ::8]  # keep output small; gather cost is the object

        return body

    # y-contiguous instead: slice_sizes (L, 1, C) — rows L*W2 apart (strided)
    def seg_gather_y(L):
        def body(feat, ys, xs):
            starts = jnp.stack([ys % (H2 - L), xs], axis=1)
            dnums = jax.lax.GatherDimensionNumbers(
                offset_dims=(1, 2, 3), collapsed_slice_dims=(), start_index_map=(0, 1)
            )
            v = jax.lax.gather(feat, starts, dnums, slice_sizes=(L, 1, C))
            return v[..., ::4, :, ::8]

        return body

    def single_row(feat, ys, xs):
        flat = feat.reshape(-1, C)
        return flat[ys * W2 + xs][..., ::8]

    for name, fn in [
        ("row gather (28k x (1,C))", single_row),
        ("x-seg (1,16,C) 28k", seg_gather(16)),
        ("x-seg (1,32,C) 28k", seg_gather(32)),
        ("x-seg (1,64,C) 28k", seg_gather(64)),
        ("y-seg (32,1,C) 28k strided", seg_gather_y(32)),
    ]:
        try:
            timeit(name, chained(fn), feat, ys, xs)
        except Exception as e:  # noqa: BLE001
            print(f"{name:34s}: FAILED {type(e).__name__}: {str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
