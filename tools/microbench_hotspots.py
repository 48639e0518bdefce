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


REPS = 20


def timeit_injit(name, fn, *args, reps=REPS, iters=4):
    """Device-side repetition: runs ``fn(seed_u8, *args)`` ``reps`` times
    inside ONE jitted fori_loop (seed varies per rep -> no CSE; a scalar
    accumulator consumes every output -> no DCE).  Removes the per-dispatch
    tunnel overhead that floors the plain ``timeit`` at ~2 ms/op."""

    def chain(seed0, *a):
        def body(i, acc):
            y = fn(seed0 + i.astype(jnp.uint8), *a)
            return acc + jnp.sum(y.astype(jnp.float32))

        return jax.lax.fori_loop(0, reps, body, jnp.float32(0))

    f = jax.jit(chain)
    seeds = [jnp.uint8(101 + 7 * i) for i in range(iters + 1)]
    float(f(seeds[0], *args))  # compile + warm
    t0 = time.perf_counter()
    outs = [f(s, *args) for s in seeds[1:]]
    float(outs[-1])
    dt = (time.perf_counter() - t0) / (iters * reps) * 1e3
    print(f"{name:55s} {dt:8.3f} ms   (in-jit x{reps})")
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


# ---------------------------------------------------------------------------
def exp_incc2():
    """InceptionC pieces with in-jit repetition (true per-op cost)."""
    import flax.linen as nn

    from tise_tpu.backbones.inception_v3 import InceptionC

    x = bf16((B, 17, 17, 768))
    xor_f = lambda x, s: (x.view(jnp.uint16) ^ s.astype(jnp.uint16)).view(DT)  # noqa: E731

    block = InceptionC(160, dtype=DT)
    p = block.init(jax.random.PRNGKey(0), x)
    timeit_injit("InceptionC(160) full block XLA", lambda s, p, x: block.apply(p, xor_f(x, s)), p, x, reps=5)

    xs = bf16((B, 17, 17, 160), 2)
    k1 = bf16((1, 1, 768, 192), 3)
    k17 = bf16((1, 7, 160, 160), 4)
    k71 = bf16((7, 1, 160, 192), 5)

    def conv(pad, s, x, k):
        return jax.lax.conv_general_dilated(
            xor_f(x, s), k, (1, 1), pad, dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        ).astype(DT)

    timeit_injit("1x1 768->192 @17x17", partial(conv, "VALID"), x, k1)
    timeit_injit("1x7 160->160 @17x17", partial(conv, ((0, 0), (3, 3))), xs, k17)
    timeit_injit("7x1 160->192 @17x17", partial(conv, ((3, 3), (0, 0))), xs, k71)
    timeit_injit(
        "avgpool 3x3 s1 p1 @17x17x768",
        lambda s, x: nn.avg_pool(xor_f(x, s), (3, 3), (1, 1), ((1, 1), (1, 1)), count_include_pad=True),
        x,
    )

    # flattened-spatial im2col: [B*17, 17, C] rows, shifts on the W axis
    k17m = bf16((7 * 160, 160), 4)

    def im2col_1x7(s, x, km):
        xx = xor_f(x, s)
        xp = jnp.pad(xx, ((0, 0), (0, 0), (3, 3), (0, 0)))
        pat = jnp.concatenate([xp[:, :, d : d + 17] for d in range(7)], -1)
        return jnp.einsum("bhwk,ko->bhwo", pat, km, preferred_element_type=jnp.float32).astype(DT)

    timeit_injit("1x7 im2col dot [M,1120]x[1120,160]", im2col_1x7, xs, k17m)


# ---------------------------------------------------------------------------
def exp_inca():
    """InceptionA pieces (35x35 grid, Mixed_5b..5d)."""
    from tise_tpu.backbones.inception_v3 import InceptionA, InceptionB

    x = bf16((B, 35, 35, 288))
    xor_f = lambda x, s: (x.view(jnp.uint16) ^ s.astype(jnp.uint16)).view(DT)  # noqa: E731
    block = InceptionA(64, dtype=DT)
    p = block.init(jax.random.PRNGKey(0), x)
    timeit_injit("InceptionA(288->) full block XLA", lambda s, p, x: block.apply(p, xor_f(x, s)), p, x, reps=5)

    bb = InceptionB(dtype=DT)
    pb = bb.init(jax.random.PRNGKey(0), x)
    timeit_injit("InceptionB full block XLA", lambda s, p, x: bb.apply(p, xor_f(x, s)), pb, x, reps=5)

    xs = bf16((B, 35, 35, 64), 2)
    k5 = bf16((5, 5, 64, 64), 3)
    k3 = bf16((3, 3, 64, 96), 4)

    def conv(pad, s, x, k):
        return jax.lax.conv_general_dilated(
            xor_f(x, s), k, (1, 1), pad, dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        ).astype(DT)

    timeit_injit("5x5 64->64 @35x35", partial(conv, ((2, 2), (2, 2))), xs, k5)
    timeit_injit("3x3 64->96 @35x35", partial(conv, ((1, 1), (1, 1))), xs, k3)


# ---------------------------------------------------------------------------
def exp_clip2():
    """CLIP pieces with in-jit repetition."""
    import flax.linen as nn

    from tise_tpu.backbones import clip_vit

    x = bf16((B, 50, 768))
    xor_f = lambda x, s: (x.view(jnp.uint16) ^ s.astype(jnp.uint16)).view(DT)  # noqa: E731

    blk = clip_vit.ResidualBlock(768, 12, dtype=DT)
    bp = blk.init(jax.random.PRNGKey(0), x)
    timeit_injit("CLIP ResidualBlock t=50", lambda s, p, x: blk.apply(p, xor_f(x, s)), bp, x, reps=10)

    w = bf16((768, 2304), 1)
    timeit_injit(
        "qkv matmul [12800,768]x[768,2304]",
        lambda s, x, w: jnp.einsum("btd,do->bto", xor_f(x, s), w, preferred_element_type=jnp.float32).astype(DT),
        x, w,
    )

    ln = nn.LayerNorm(epsilon=1e-5, dtype=DT)
    lnp = {"params": {"scale": jnp.ones(768), "bias": jnp.zeros(768)}}
    timeit_injit("LayerNorm [256,50,768]", lambda s, x: ln.apply(lnp, xor_f(x, s)), x)

    def attn_core(s, x):
        xx = xor_f(x, s)
        q = xx.reshape(B, 50, 12, 64).transpose(0, 2, 1, 3)
        a = jnp.einsum("bhqd,bhkd->bhqk", q * 0.125, q, preferred_element_type=jnp.float32)
        a = jax.nn.softmax(a, -1).astype(DT)
        o = jnp.einsum("bhqk,bhkd->bhqd", a, q)
        return o.transpose(0, 2, 1, 3).reshape(B, 50, 768)

    timeit_injit("attention core (qk+softmax+av+transposes)", attn_core, x)

    w1 = bf16((768, 3072), 2)
    w2 = bf16((3072, 768), 3)

    def mlp(s, x, w1, w2):
        y = jnp.einsum("btd,do->bto", xor_f(x, s), w1, preferred_element_type=jnp.float32).astype(DT)
        y = y * jax.nn.sigmoid(1.702 * y)
        return jnp.einsum("bto,od->btd", y, w2, preferred_element_type=jnp.float32).astype(DT)

    timeit_injit("MLP fc+gelu+proj [12800,768]<->3072", mlp, x, w1, w2)


# ---------------------------------------------------------------------------
def exp_stem2():
    """Stem pieces with in-jit repetition."""
    from tise_tpu.ops.preprocess import normalize

    img = u8((B, 299, 299, 3))
    k1 = bf16((3, 3, 3, 32), 1)
    k2 = bf16((3, 3, 32, 32), 2)
    k3 = bf16((3, 3, 32, 64), 3)

    def conv1a(s, x, k):
        xx = normalize(jnp.bitwise_xor(x, s), "fid", DT)
        return jax.lax.conv_general_dilated(
            xx, k, (2, 2), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        ).astype(DT)

    timeit_injit("conv1a 3x3/2 u8->32 @299", conv1a, img, k1, reps=10)

    x149 = bf16((B, 149, 149, 32), 4)
    xor_f = lambda x, s: (x.view(jnp.uint16) ^ s.astype(jnp.uint16)).view(DT)  # noqa: E731

    def conv(pad, stride, s, x, k):
        return jax.lax.conv_general_dilated(
            xor_f(x, s), k, stride, pad, dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        ).astype(DT)

    timeit_injit("conv2a 3x3 32->32 @147", partial(conv, "VALID", (1, 1)), x149, k2, reps=10)
    x147 = bf16((B, 147, 147, 32), 5)
    timeit_injit("conv2b 3x3 32->64 @147 SAME", partial(conv, ((1, 1), (1, 1)), (1, 1)), x147, k3, reps=10)




# ---------------------------------------------------------------------------
def exp_fix1():
    """Hypothesis tests: 2D-flattened matmuls, single-pass LN, shifted-add avgpool."""
    import flax.linen as nn

    xor_f = lambda x, s: (x.view(jnp.uint16) ^ s.astype(jnp.uint16)).view(DT)  # noqa: E731
    x = bf16((B, 50, 768))
    w = bf16((768, 2304), 1)

    def qkv2d(s, x, w):
        xx = xor_f(x, s).reshape(B * 50, 768)
        return jnp.dot(xx, w, preferred_element_type=jnp.float32).astype(DT).reshape(B, 50, 2304)

    timeit_injit("qkv 2D-reshape dot", qkv2d, x, w)

    def ln1pass(s, x):
        xx = xor_f(x, s).astype(jnp.float32)
        m = jnp.mean(xx, -1, keepdims=True)
        v = jnp.mean(xx * xx, -1, keepdims=True) - m * m
        return ((xx - m) * jax.lax.rsqrt(v + 1e-5)).astype(DT)

    timeit_injit("LN single-pass f32", ln1pass, x)

    xc = bf16((B, 17, 17, 768))

    def avg_shift(s, x):
        xx = xor_f(x, s).astype(jnp.float32)
        xp = jnp.pad(xx, ((0, 0), (1, 1), (1, 1), (0, 0)))
        h = xp[:, :, :-2] + xp[:, :, 1:-1] + xp[:, :, 2:]
        v = h[:, :-2] + h[:, 1:-1] + h[:, 2:]
        return (v * (1.0 / 9.0)).astype(DT)

    timeit_injit("avgpool shifted-add @17x17x768", avg_shift, xc)
    timeit_injit(
        "avgpool reduce_window @17x17x768 (ref)",
        lambda s, x: nn.avg_pool(xor_f(x, s), (3, 3), (1, 1), ((1, 1), (1, 1)), count_include_pad=True),
        xc,
    )

    xa = bf16((B, 35, 35, 288), 7)
    timeit_injit("avgpool shifted-add @35x35x288", avg_shift, xa)
    timeit_injit(
        "avgpool reduce_window @35x35x288 (ref)",
        lambda s, x: nn.avg_pool(xor_f(x, s), (3, 3), (1, 1), ((1, 1), (1, 1)), count_include_pad=True),
        xa,
    )

    # attention core without transposes: keep [B, T, H, D], batch dims (b, h)
    def attn_nt(s, x):
        xx = xor_f(x, s)
        q = xx.reshape(B, 50, 12, 64)
        a = jnp.einsum("bqhd,bkhd->bhqk", q * 0.125, q, preferred_element_type=jnp.float32)
        a = jax.nn.softmax(a, -1).astype(DT)
        o = jnp.einsum("bhqk,bkhd->bqhd", a, q)
        return o.reshape(B, 50, 768)

    timeit_injit("attention core no-transpose layout", attn_nt, x)



# ---------------------------------------------------------------------------
def exp_fix2():
    """XLA-level matmul reformulations of the InceptionC convs."""
    xor_f = lambda x, s: (x.view(jnp.uint16) ^ s.astype(jnp.uint16)).view(DT)  # noqa: E731
    x = bf16((B, 17, 17, 768))
    xs = bf16((B, 17, 17, 160), 2)

    w1 = bf16((768, 192), 3)

    def c1x1_dot(s, x, w):
        xx = xor_f(x, s).reshape(B * 17 * 17, 768)
        return jnp.dot(xx, w, preferred_element_type=jnp.float32).astype(DT)

    timeit_injit("1x1 768->192 as 2D dot", c1x1_dot, x, w1)

    w7 = bf16((7, 160, 160), 4)

    def c1x7_shift(s, x, w):
        xx = xor_f(x, s)
        xp = jnp.pad(xx, ((0, 0), (0, 0), (3, 3), (0, 0)))
        acc = jnp.zeros((B, 17, 17, 160), jnp.float32)
        for d in range(7):
            acc = acc + jnp.einsum(
                "bhwc,co->bhwo", xp[:, :, d : d + 17], w[d], preferred_element_type=jnp.float32
            )
        return acc.astype(DT)

    timeit_injit("1x7 as 7 shifted dots", c1x7_shift, xs, w7)

    def c7x1_shift(s, x, w):
        xx = xor_f(x, s)
        xp = jnp.pad(xx, ((0, 0), (3, 3), (0, 0), (0, 0)))
        acc = jnp.zeros((B, 17, 17, 160), jnp.float32)
        for d in range(7):
            acc = acc + jnp.einsum(
                "bhwc,co->bhwo", xp[:, d : d + 17], w[d], preferred_element_type=jnp.float32
            )
        return acc.astype(DT)

    timeit_injit("7x1 as 7 shifted dots", c7x1_shift, xs, w7)

    # 1x7 via one big dot on a rolled-stack: [M, 7*160] x [1120, 160]
    w7m = bf16((1120, 160), 5)

    def c1x7_stack(s, x, w):
        xx = xor_f(x, s)
        xp = jnp.pad(xx, ((0, 0), (0, 0), (3, 3), (0, 0)))
        pat = jnp.concatenate([xp[:, :, d : d + 17] for d in range(7)], axis=-1)
        return jnp.dot(
            pat.reshape(B * 17 * 17, 1120), w, preferred_element_type=jnp.float32
        ).astype(DT)

    timeit_injit("1x7 as concat+1 dot [M,1120]", c1x7_stack, xs, w7m)



# ---------------------------------------------------------------------------
def exp_fast():
    """Per-section timing of the production fast paths (bench.py composition):
    FastInception prefixes by endpoint + FastCLIPVisual, plus the combined
    extract step — fresh hotspot map for the >=5k push."""
    from tise_tpu.backbones import clip_fast, clip_vit, inception_fast, inception_v3
    from tise_tpu.ops.preprocess import normalize

    from tise_tpu.core import compile_cache

    compile_cache.enable()
    inc = inception_v3.InceptionV3(num_classes=1000, dtype=DT)
    inc_params = jax.jit(
        lambda r: inc.init(r, jnp.zeros((1, 299, 299, 3), DT), endpoints=("logits",))
    )(jax.random.PRNGKey(0))
    fast_inc = inception_fast.FastInception(
        dtype=DT, folded=jax.jit(lambda p: inception_fast.fold_tree(p, DT))(inc_params)
    )
    clip_params = jax.jit(lambda r: clip_vit.random_params(r, dtype=DT))(jax.random.PRNGKey(0))
    fast_clip = clip_fast.FastCLIPVisual(
        dtype=DT, folded=jax.jit(lambda p: clip_fast.fold_tree(p, DT))(clip_params)
    )
    img299 = u8((B, 299, 299, 3))
    img224 = u8((B, 224, 224, 3), 1)

    def prefix(endpoint):
        def fn(seed, x):
            x = normalize(jnp.bitwise_xor(x, seed), "fid", DT)
            return fast_inc(x, endpoints=(endpoint,))[endpoint]

        return fn

    last = 0.0
    for ep in inception_v3.ENDPOINTS:
        t = timeit(f"fast inception -> {ep}", prefix(ep), img299)
        print(f"{'  delta ' + ep:55s} {t - last:8.3f} ms")
        last = t

    timeit("fast clip tower", lambda s, x: fast_clip(normalize(jnp.bitwise_xor(x, s), "clip", DT)), img224)

    def extract(seed, a, b):
        f = fast_inc(normalize(jnp.bitwise_xor(a, seed), "fid", DT), endpoints=("pool3", "logits"))
        c = fast_clip(normalize(jnp.bitwise_xor(b, seed), "clip", DT))
        return jnp.sum(f["pool3"].astype(jnp.float32)) + jnp.sum(f["logits"].astype(jnp.float32)) + jnp.sum(
            c.astype(jnp.float32)
        )

    timeit("extract (inception+clip joint)", extract, img299, img224)


ALL = {
    "sections": exp_sections, "conv1a": exp_conv1a, "incc": exp_incc, "clip": exp_clip,
    "incc2": exp_incc2, "inca": exp_inca, "clip2": exp_clip2, "stem2": exp_stem2,
    "fix1": exp_fix1, "fix2": exp_fix2, "fast": exp_fast,
}

if __name__ == "__main__":
    names = sys.argv[1:] or list(ALL)
    print(f"backend={jax.default_backend()} devices={len(jax.devices())}")
    for n in names:
        print(f"--- {n} ---")
        ALL[n]()
