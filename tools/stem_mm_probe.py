"""Mosaic in-VMEM matmul throughput at stem/A-block shapes — go/no-go probe.

tools/mosaic_probe.py (round 3) showed the minor<128 DMA restriction lifted,
unblocking the "conv1a-patch prebuild in XLA + Pallas chain" stem design
(ROADMAP still-open idea). Whether that design can beat XLA's 5.18 ms stem
hinges on ONE number: how fast Mosaic's matmul codegen runs at the stem's
narrow output widths (conv2a N=32, conv2b N=64), where MXU column occupancy
caps at 25%/50%. This probe measures pure in-VMEM dot throughput (weights
perturbed per iteration to defeat loop-invariant hoisting; the [K,N] update
is VPU-negligible next to the dot) and prints achieved GFLOP/s vs the
occupancy-adjusted MXU ceiling.

Decision rule (see ROADMAP): fused-stem total = 9.8 GF @ r(K27,N32) +
102 GF @ r(K288,N32) + 204 GF @ r(K288,N64) + ~0.7 ms HBM. If that lands
under ~4 ms the kernel is worth building; at the occupancy ceiling it is
~4.5-4.7 ms vs XLA's 5.18 — a wash that kills the idea with numbers.

Usage: python tools/stem_mm_probe.py  (runs on the default backend)
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

PEAK_BF16 = 197e12  # v5e MXU peak, FLOP/s


def _mm_kernel(nsteps, x_ref, w_ref, o_ref):
    x = x_ref[...]
    w0 = w_ref[...]

    def body(i, carry):
        w, s = carry
        y = jax.lax.dot_general(
            x, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        s2 = y[0, 0]
        # dependency through the small operand only: [K,N] add is VPU-trivial
        w2 = (w.astype(jnp.float32) + s2 * 1e-30).astype(w0.dtype)
        return (w2, s + s2)

    _, s = jax.lax.fori_loop(0, nsteps, body, (w0, jnp.float32(0)))
    o_ref[...] = jnp.reshape(s, (1, 1))


def time_shape(m, k, n, nsteps=16384, reps=3):
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (m, k), jnp.bfloat16)
    w = jax.random.normal(key, (k, n), jnp.bfloat16)
    # axon result-caches IDENTICAL calls server-side (CLAUDE.md) — every
    # timed call must get a distinct salted input
    xs = [(x + jnp.bfloat16(i * 1e-3)) for i in range(2 * reps)]
    jax.block_until_ready(xs)

    def run(steps):
        f = pl.pallas_call(
            functools.partial(_mm_kernel, steps),
            out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        )
        return jax.jit(f)

    f_long, f_short = run(nsteps), run(nsteps // 8)
    f_long(x, w)[0, 0].item()  # warm-up compiles
    f_short(x, w)[0, 0].item()
    best = np.inf
    for r in range(reps):
        t0 = time.perf_counter()
        f_long(xs[2 * r], w)[0, 0].item()
        t1 = time.perf_counter()
        f_short(xs[2 * r + 1], w)[0, 0].item()
        t2 = time.perf_counter()
        # differencing removes the ~28 ms tunnel RTT + dispatch tax; the
        # 14k-dot step delta keeps the measured window >> tunnel jitter
        per = ((t1 - t0) - (t2 - t1)) / (nsteps - nsteps // 8)
        best = min(best, per)
    flops = 2 * m * k * n
    occ = min(n, 128) / 128 * min(k, 128) / 128 if k < 128 else min(n, 128) / 128
    return best, flops / best / 1e9, occ


def main():
    print(f"jax {jax.__version__} / backend {jax.default_backend()}")
    shapes = [
        ("conv1a  K27 N32 ", 2384, 27, 32),
        ("conv2a  K288 N32", 2352, 288, 32),
        ("conv2b  K288 N64", 2352, 288, 64),
        ("ablock5x5 K1200 N64", 1225, 1200, 64),
        # M halved vs the stem strips: [2352,1152]x f32 accum overflows the
        # 16 MB VMEM scoped limit by 193 KB (measured)
        ("control K1152 N128", 1176, 1152, 128),
    ]
    rates = {}
    for name, m, k, n in shapes:
        per, gfs, occ = time_shape(m, k, n)
        ceil = PEAK_BF16 * occ / 1e9
        rates[name] = gfs
        print(
            f"{name}: {per * 1e6:7.2f} us/dot  {gfs:8.1f} GF/s "
            f"(occupancy ceiling {ceil:8.1f}, {gfs / ceil * 100:5.1f}% of it)"
        )
    est = (
        9.8e9 / (rates["conv1a  K27 N32 "] * 1e9)
        + 102e9 / (rates["conv2a  K288 N32"] * 1e9)
        + 204e9 / (rates["conv2b  K288 N64"] * 1e9)
    ) * 1e3 + 0.7
    print(f"fused-stem estimate at these rates: {est:.2f} ms (+pool) vs XLA 5.18 ms")


if __name__ == "__main__":
    main()
