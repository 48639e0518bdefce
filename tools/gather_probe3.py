"""Probe 3: descriptor-vs-row cost split at the ROIAlign shapes.

Fits cost = D*d + R*r by gathering the SAME total bytes (784k x 512B rows)
with descriptor widths 4C / 8C / 16C (bf16 C=256): 196k/98k/49k descriptors.
Decides whether the dual-orientation 8C pack (halves descriptors, same rows)
is worth building.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

C = 256
MB = 8
CHAIN = 8
ITERS = 3
TOTAL_ROWS = 196_000  # 4C-descriptor count at N=1000, S=14


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
    # one flat buffer sized like the corner-packed P2..P5 concat at 800px
    nrows_buf = 53_125  # 200*200 + 100*100 + 50*50 + 25*25

    def chained(body):
        def run(flat, idx):
            def rep(i, acc):
                out = jax.vmap(body)(flat, (idx + i) % (flat.shape[1] - 1))
                return acc + jnp.sum(out.astype(jnp.float32))

            return jax.lax.fori_loop(0, CHAIN, rep, jnp.float32(0))

        return run

    def width(k):  # k = channels multiple of C per descriptor
        def body(flat, idx):
            return flat[idx][..., :: (k * 2)]  # small output; gather is the object

        return body

    for k in (4, 8, 16, 32):
        n_desc = TOTAL_ROWS * 4 // k  # keep rows (bytes) constant
        rows_k = nrows_buf if k <= 8 else nrows_buf // (k // 8)  # cap buffer ~1.7GB
        # device-side generation: uploading GBs through the 40 MB/s tunnel stalls
        flat = jax.jit(
            lambda k=k, rows_k=rows_k: jax.random.normal(
                jax.random.PRNGKey(0), (MB, rows_k, k * C), jnp.bfloat16
            ),
        )()
        nrows_buf_k = rows_k
        idx = jnp.asarray(rng.randint(0, nrows_buf_k - 1, (MB, n_desc)).astype(np.int32))
        touch = jax.jit(lambda *a: sum(jnp.sum(x.reshape(x.shape[0], -1)[:, 0].astype(jnp.float32)) for x in a))
        float(touch(flat, idx))
        timeit(f"{n_desc//1000}k x {k}C descriptors", chained(width(k)), flat, idx)
        del flat, idx


if __name__ == "__main__":
    main()
