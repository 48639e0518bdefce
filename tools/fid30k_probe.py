"""Probe the fid30k pipeline step's pieces: where do 273 ms/batch go?

bench.py fid30k measured 938 img/s (273 ms per 256-batch) while the
inception tower alone sustains ~10k img/s.  Times each piece in-jit x8
(tunnel rules): normalize, resize_and_normalize, fast-forward on
pre-resized input, moments update, and a CHW-resize alternative.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

B, SRC, OUT = 256, 256, 299
CHAIN = 8
ITERS = 3


def timeit(name, fn, *args):
    f = jax.jit(fn)
    t0 = time.perf_counter()
    float(f(*args))
    c = time.perf_counter() - t0
    t0 = time.perf_counter()
    outs = [f(*args) for _ in range(ITERS)]
    float(outs[-1])
    dt = (time.perf_counter() - t0) / (ITERS * CHAIN) * 1000
    print(f"{name:36s}: {dt:8.2f} ms/batch256   (compile {c:5.1f}s)", flush=True)


def chained(body):
    def run(*args):
        def rep(i, acc):
            return acc + body(jnp.bitwise_xor(args[0], i.astype(args[0].dtype)), *args[1:])

        return jax.lax.fori_loop(0, CHAIN, rep, jnp.float32(0))

    return run


def main():
    from tise_tpu.backbones import inception_fast, inception_v3
    from tise_tpu.core import compile_cache
    from tise_tpu.ops import stats
    from tise_tpu.ops.preprocess import normalize, resize_and_normalize

    compile_cache.enable()
    dtype = jnp.bfloat16
    params = jax.jit(
        lambda r: inception_v3.InceptionV3(num_classes=1000, dtype=dtype).init(
            r, jnp.zeros((1, 299, 299, 3), dtype), endpoints=("logits",)
        )
    )(jax.random.PRNGKey(1))
    fast = inception_fast.FastInception(
        dtype=dtype, folded=jax.jit(lambda p: inception_fast.fold_tree(p, dtype))(params)
    )
    fast_fid = inception_fast.FastInception(
        dtype=dtype,
        folded=jax.jit(lambda p: inception_fast.fold_tree(p, dtype, input_recipe="fid"))(params),
    )

    host = np.random.RandomState(7)
    u8_256 = jax.device_put(host.randint(0, 256, (B, SRC, SRC, 3)).astype(np.uint8))
    u8_299 = jax.device_put(host.randint(0, 256, (B, OUT, OUT, 3)).astype(np.uint8))
    touch = jax.jit(lambda x: jnp.sum(x, dtype=jnp.int32))
    int(touch(u8_256))
    int(touch(u8_299))

    def norm_only(x):
        return jnp.sum(normalize(x, "fid", jnp.float32))

    def rn(x):
        return jnp.sum(resize_and_normalize(x, "fid", OUT))

    def resize_chw(x):
        # channels-leading separable resize: minor dims stay >= 256
        xf = x.astype(jnp.float32).transpose(0, 3, 1, 2)  # [B, 3, H, W]
        hw = jnp.linspace(0.0, SRC - SRC / OUT, OUT) + (SRC / OUT - 1) / 2  # linear, half-pixel
        lo = jnp.clip(jnp.floor(hw).astype(jnp.int32), 0, SRC - 1)
        hi = jnp.clip(lo + 1, 0, SRC - 1)
        fr = jnp.clip(hw - lo, 0.0, 1.0)
        wmat = (
            jnp.zeros((OUT, SRC))
            .at[jnp.arange(OUT), lo]
            .add(1 - fr)
            .at[jnp.arange(OUT), hi]
            .add(fr)
        ).astype(jnp.bfloat16)
        y = jnp.einsum("oh,bchw->bcow", wmat, xf.astype(jnp.bfloat16))
        y = jnp.einsum("ow,bchw->bcho", wmat, y)
        return jnp.sum(y.astype(jnp.float32))

    def fwd_only(x):
        return jnp.sum(fast(x, endpoints=("pool3",))["pool3"].astype(jnp.float32))

    def moments(x, state):
        acts = jax.random.normal(jax.random.PRNGKey(0), (B, 2048), jnp.float32) + x[0, 0, 0, 0]
        return stats.update_moments(state, acts).count.astype(jnp.float32)

    def full_step(x):
        z = resize_and_normalize(x, "fid", OUT)
        acts = fast(z.astype(dtype), endpoints=("pool3",))["pool3"].astype(jnp.float32)
        return jnp.sum(acts)

    def full_step_fid(x):
        # CHW resize of raw 0-255, fid fold inside conv1a (linear maps commute)
        xf = x.astype(jnp.float32).transpose(0, 3, 1, 2)
        hw = jnp.linspace(0.0, SRC - SRC / OUT, OUT) + (SRC / OUT - 1) / 2
        lo = jnp.clip(jnp.floor(hw).astype(jnp.int32), 0, SRC - 1)
        hi = jnp.clip(lo + 1, 0, SRC - 1)
        fr = jnp.clip(hw - lo, 0.0, 1.0)
        wmat = (
            jnp.zeros((OUT, SRC))
            .at[jnp.arange(OUT), lo]
            .add(1 - fr)
            .at[jnp.arange(OUT), hi]
            .add(fr)
        ).astype(jnp.bfloat16)
        y = jnp.einsum("oh,bchw->bcow", wmat, xf.astype(jnp.bfloat16))
        y = jnp.einsum("ow,bchw->bcho", wmat, y)
        z = y.transpose(0, 2, 3, 1)  # NHWC 0-255 scale
        acts = fast_fid(z, endpoints=("pool3",))["pool3"].astype(jnp.float32)
        return jnp.sum(acts)

    timeit("normalize only (f32, 256px)", chained(norm_only), u8_256)
    timeit("resize_and_normalize 256->299", chained(rn), u8_256)
    timeit("CHW bf16 matmul resize 256->299", chained(resize_chw), u8_256)
    timeit("fast fwd only (299 u8)", chained(fwd_only), u8_299)
    timeit("full step (current bench path)", chained(full_step), u8_256)
    timeit("full step (CHW resize + fid fold)", chained(full_step_fid), u8_256)


if __name__ == "__main__":
    main()
