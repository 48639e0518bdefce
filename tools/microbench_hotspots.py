"""Microbenchmarks for the Inception/CLIP hotspots on the real TPU.

Timing methodology per CLAUDE.md / bench.py: the axon tunnel result-caches
identical calls, block_until_ready is fake, ~28 ms RTT per blocking call —
so every timed call takes a distinct seed scalar xor'ed into the input on
device, iterations are enqueued as a chain, and we sync once by pulling the
last scalar.

Usage: python tools/microbench_hotspots.py [exp ...]
  exps: sections conv1a incc clip  (default: all)
"""

from __future__ import annotations

import sys
import time
from functools import partial

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

ITERS = 20


def timeit(name, fn, *args, iters=ITERS):
    """fn(seed_u8, *args) -> array; returns ms/call."""
    f = jax.jit(fn)
    seeds = [jnp.uint8(i) for i in range(iters + 1)]
    jax.block_until_ready(f(seeds[0], *args))
    float(jnp.sum(f(seeds[0], *args).astype(jnp.float32)))  # warm + sync
    t0 = time.perf_counter()
    outs = [f(s, *args) for s in seeds[1:]]
    float(jnp.sum(outs[-1].astype(jnp.float32)))
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:55s} {dt:8.3f} ms")
    return dt


B = 256
DT = jnp.bfloat16


def u8(shape, seed=0):
    return jax.device_put(np.random.RandomState(seed).randint(0, 256, shape).astype(np.uint8))


def bf16(shape, seed=0):
    return jax.device_put(np.random.RandomState(seed).randn(*shape).astype(np.float32).astype(DT))


# ---------------------------------------------------------------------------
def exp_sections():
    from tise_tpu.backbones import inception_v3
    from tise_tpu.ops.preprocess import normalize

    model = inception_v3.InceptionV3(num_classes=1000, dtype=DT)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 299, 299, 3), DT), endpoints=("logits",))
    img = u8((B, 299, 299, 3))

    def prefix(endpoint):
        def fn(seed, p, x):
            x = jnp.bitwise_xor(x, seed)
            return model.apply(p, normalize(x, "fid", DT), endpoints=(endpoint,))[endpoint]

        return fn

    last = 0.0
    for ep in inception_v3.ENDPOINTS:
        t = timeit(f"inception prefix -> {ep}", prefix(ep), params, img)
        print(f"{'  delta ' + ep:55s} {t - last:8.3f} ms")
        last = t


# ---------------------------------------------------------------------------
def exp_conv1a():
    from tise_tpu.ops.preprocess import normalize

    img = u8((B, 299, 299, 3))
    k = bf16((3, 3, 3, 32), 1)

    def baseline(seed, x, k):
        x = normalize(jnp.bitwise_xor(x, seed), "fid", DT)
        return jax.lax.conv_general_dilated(x, k, (2, 2), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"))

    timeit("conv1a XLA 3x3/2 VALID [B,299,299,3]->32", baseline, img, k)

    # Toeplitz-packed: kernel (3,9)/ (2,8), 128 out channels = 4 col-positions x 32.
    kq = np.zeros((3, 9, 3, 128), np.float32)
    kn = np.random.RandomState(1).randn(3, 3, 3, 32).astype(np.float32)
    for p in range(4):
        kq[:, 2 * p : 2 * p + 3, :, 32 * p : 32 * (p + 1)] = kn
    kq = jax.device_put(kq.astype(DT))

    def toeplitz4(seed, x, kq):
        x = normalize(jnp.bitwise_xor(x, seed), "fid", DT)
        x = jnp.pad(x, ((0, 0), (0, 0), (0, 13), (0, 0)))  # W 299->312 = 38*8 + 8
        out = jax.lax.conv_general_dilated(x, kq, (2, 8), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"))
        b, h, wq, _ = out.shape  # [B,149,38,128]
        return out.reshape(b, h, wq * 4, 32)[:, :, :149]

    timeit("conv1a toeplitz4 (3,9)/(2,8) -> 128ch", toeplitz4, img, kq)

    # manual im2col quad: slices+reshapes, single [M,81]x[81,128] dot
    kq_mat = jax.device_put(np.asarray(kq, np.float32).reshape(27 * 3, 128).astype(DT))

    def im2col4(seed, x, km):
        x = normalize(jnp.bitwise_xor(x, seed), "fid", DT)
        x = jnp.pad(x, ((0, 0), (0, 1), (0, 13), (0, 0)))  # [B,300,312,3]
        rows = [x[:, dy : dy + 298][:, ::2] for dy in range(3)]  # 3 x [B,149,312,3]
        pats = []
        for r in rows:
            blk = r.reshape(B, 149, 39, 8, 3)
            pats.append(jnp.concatenate([blk[:, :, :38].reshape(B, 149, 38, 24), blk[:, :, 1:, 0, :]], -1))
        pat = jnp.concatenate(pats, -1)  # [B,149,38,81]
        out = jnp.einsum("bhqk,ko->bhqo", pat, km, preferred_element_type=jnp.float32).astype(DT)
        return out.reshape(B, 149, 152, 32)[:, :, :149]

    timeit("conv1a im2col quad dot [M,81]x[81,128]", im2col4, img, kq_mat)

    # lone normalize cost (to subtract)
    timeit("normalize only", lambda s, x: normalize(jnp.bitwise_xor(x, s), "fid", DT), img)


# ---------------------------------------------------------------------------
def exp_incc():
    from tise_tpu.backbones.inception_v3 import InceptionC

    x = bf16((B, 17, 17, 768))
    xor_f = lambda x, s: (x.view(jnp.uint16) ^ s.astype(jnp.uint16)).view(DT)  # noqa: E731

    block = InceptionC(160, dtype=DT)
    p = block.init(jax.random.PRNGKey(0), x)

    def full(seed, p, x):
        return block.apply(p, xor_f(x, seed))

    timeit("InceptionC(160) full block XLA", full, p, x)

    xs = bf16((B, 17, 17, 160), 2)
    k1 = bf16((1, 1, 768, 192), 3)
    k17 = bf16((1, 7, 160, 160), 4)
    k71 = bf16((7, 1, 160, 192), 5)

    def conv(seed, x, k, pad):
        return jax.lax.conv_general_dilated(
            xor_f(x, seed), k, (1, 1), pad, dimension_numbers=("NHWC", "HWIO", "NHWC")
        )

    timeit("1x1 768->192 @17x17", partial(conv, pad="VALID"), x, k1)
    timeit("1x7 160->160 @17x17", partial(conv, pad=((0, 0), (3, 3))), xs, k17)
    timeit("7x1 160->192 @17x17", partial(conv, pad=((3, 3), (0, 0))), xs, k71)

    k17m = bf16((7 * 160, 160), 4)

    def im2col_1x7(seed, x, km):
        x = xor_f(x, seed)
        xp = jnp.pad(x, ((0, 0), (0, 0), (3, 3), (0, 0)))
        pat = jnp.concatenate([xp[:, :, d : d + 17] for d in range(7)], -1)  # [B,17,17,1120]
        return jnp.einsum("bhwk,ko->bhwo", pat, km, preferred_element_type=jnp.float32).astype(DT)

    timeit("1x7 160->160 im2col dot [M,1120]", im2col_1x7, xs, k17m)

    def im2col_7x1(seed, x, km):
        x = xor_f(x, seed)
        xp = jnp.pad(x, ((0, 0), (3, 3), (0, 0), (0, 0)))
        pat = jnp.concatenate([xp[:, d : d + 17] for d in range(7)], -1)
        return jnp.einsum("bhwk,ko->bhwo", pat, km, preferred_element_type=jnp.float32).astype(DT)

    k71m = bf16((7 * 160, 192), 5)
    timeit("7x1 160->192 im2col dot [M,1120]", im2col_7x1, xs, k71m)

    def avgpool(seed, x):
        import flax.linen as nn

        return nn.avg_pool(xor_f(x, seed), (3, 3), (1, 1), ((1, 1), (1, 1)), count_include_pad=True)

    timeit("avgpool 3x3 s1 p1 @17x17x768", avgpool, x)


# ---------------------------------------------------------------------------
def exp_clip():
    from tise_tpu.backbones import clip_vit
    from tise_tpu.ops.preprocess import normalize

    model = clip_vit.CLIP(dtype=DT)
    params = clip_vit.random_params(jax.random.PRNGKey(0), dtype=DT)
    img = u8((B, 224, 224, 3))

    def full(seed, p, x):
        x = normalize(jnp.bitwise_xor(x, seed), "clip", DT)
        return model.apply(p, x, method=model.encode_image)

    timeit("CLIP image tower full", full, params, img)

    # one residual block at [256, 50, 768]
    x = bf16((B, 50, 768))
    blk = clip_vit.ResidualBlock(768, 12, dtype=DT)
    bp = blk.init(jax.random.PRNGKey(0), x)
    xor_f = lambda x, s: (x.view(jnp.uint16) ^ s.astype(jnp.uint16)).view(DT)  # noqa: E731

    timeit("CLIP ResidualBlock t=50", lambda s, p, x: blk.apply(p, xor_f(x, s)), bp, x)

    x64 = bf16((B, 64, 768))
    timeit("CLIP ResidualBlock t=64", lambda s, p, x: blk.apply(p, xor_f(x, s)), bp, x64)

    # isolated pieces
    w = bf16((768, 2304), 1)

    def qkv(seed, x, w):
        return jnp.einsum("btd,do->bto", xor_f(x, seed), w, preferred_element_type=jnp.float32).astype(DT)

    timeit("qkv matmul [12800,768]x[768,2304]", qkv, x, w)

    def ln(seed, x):
        import flax.linen as nn

        return nn.LayerNorm(epsilon=1e-5, dtype=DT).apply(
            {"params": {"scale": jnp.ones(768), "bias": jnp.zeros(768)}}, xor_f(x, seed)
        )

    timeit("LayerNorm [256,50,768]", ln, x)

    def attn_core(seed, x):
        x = xor_f(x, seed)
        q = x.reshape(B, 50, 12, 64).transpose(0, 2, 1, 3)
        a = jnp.einsum("bhqd,bhkd->bhqk", q * 0.125, q, preferred_element_type=jnp.float32)
        a = jax.nn.softmax(a, -1).astype(DT)
        o = jnp.einsum("bhqk,bhkd->bhqd", a, q)
        return o.transpose(0, 2, 1, 3).reshape(B, 50, 768)

    timeit("attention core (qk+softmax+av+transposes)", attn_core, x)


ALL = {"sections": exp_sections, "conv1a": exp_conv1a, "incc": exp_incc, "clip": exp_clip}

if __name__ == "__main__":
    names = sys.argv[1:] or list(ALL)
    print(f"backend={jax.default_backend()} devices={len(jax.devices())}")
    for n in names:
        print(f"--- {n} ---")
        ALL[n]()
