"""A-block concat-elimination probe (ROADMAP still-open idea #1).

The Mixed_5b/5c/5d section materializes a [B,35,35,C] concat (C=256/288,
~165-180 MB bf16 at B=256) that the next block's fan-out conv immediately
re-reads — 2x the section's HBM floor.  conv1x1(concat(parts), W) ==
sum_i conv1x1(part_i, W[ci_slice]) exactly, so the concat never needs to
exist: keep branch outputs as parts and feed the next fan-out per-part.
Same identity extends through Mixed_6a (stride-2 convs + channelwise
max_pool distribute over the channel concat).

Variants timed whole-model (in-jit x24, tunnel rules — ROADMAP measurement
notes):
  base)  current FastInception (pool3)
  parts) A-section (5b->5c->5d->6a) with parts-flow, concat only at 6a output
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from tise_tpu.backbones import inception_fast as fi

B, CHAIN, ITERS = 256, 24, 3


class PartsInception(fi.FastInception):
    """A-section parts-flow variant; everything else inherited."""

    def _fanout_parts(self, parts, names, pool_name=None):
        """_fanout where x arrives as channel parts: one kernel slice per
        part, partial conv outputs summed (f32) — concat input never built."""
        all_names = tuple(names) + ((pool_name,) if pool_name else ())
        w, b = self._cat(all_names)
        sizes_in = [p.shape[-1] for p in parts]
        offs_in = np.cumsum([0] + sizes_in).tolist()
        y = None
        for p, lo, hi in zip(parts, offs_in[:-1], offs_in[1:]):
            t = jax.lax.conv_general_dilated(
                p, w[:, :, lo:hi, :], (1, 1), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32,
            )
            y = t if y is None else y + t
        sizes = [self.w[n][0].shape[-1] for n in all_names]
        offs = np.cumsum(sizes[:-1]).tolist()
        parts_out = jnp.split(y, offs, axis=-1)
        outs = []
        off = 0
        for i, n in enumerate(names):
            bi = b[..., off : off + sizes[i]]
            outs.append(jnp.maximum(parts_out[i] + bi, 0.0).astype(parts[0].dtype))
            off += sizes[i]
        if pool_name:
            s = jax.lax.reduce_window(
                parts_out[-1], 0.0, jax.lax.add, (1, 3, 3, 1), (1, 1, 1, 1),
                ((0, 0), (1, 1), (1, 1), (0, 0)),
            )
            outs.append(jnp.maximum(s * (1.0 / 9.0) + b[..., off:], 0.0).astype(parts[0].dtype))
        return outs

    def _block_a_parts(self, parts, m):
        b1, b5, b3, bp = self._fanout_parts(
            parts, (f"{m}.branch1x1", f"{m}.branch5x5_1", f"{m}.branch3x3dbl_1"),
            pool_name=f"{m}.branch_pool",
        )
        b5 = fi._conv(b5, *self.w[f"{m}.branch5x5_2"], padding=((2, 2), (2, 2)))
        b3 = fi._conv(b3, *self.w[f"{m}.branch3x3dbl_2"], padding=((1, 1), (1, 1)))
        b3 = fi._conv(b3, *self.w[f"{m}.branch3x3dbl_3"], padding=((1, 1), (1, 1)))
        return [b1, b5, b3, bp]

    def _block_b_parts(self, parts, m):
        heads = self._fanout_parts(parts, (f"{m}.branch3x3dbl_1",))
        bd = heads[0]
        # direct 3x3 stride-2 on parts: sum of per-part partial convs
        w3, b3bias = self.w[f"{m}.branch3x3"]
        sizes_in = [p.shape[-1] for p in parts]
        offs_in = np.cumsum([0] + sizes_in).tolist()
        y = None
        for p, lo, hi in zip(parts, offs_in[:-1], offs_in[1:]):
            t = jax.lax.conv_general_dilated(
                p, w3[:, :, lo:hi, :], (2, 2), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32,
            )
            y = t if y is None else y + t
        b3out = jnp.maximum(y + b3bias, 0.0).astype(parts[0].dtype)
        bd = fi._conv(bd, *self.w[f"{m}.branch3x3dbl_2"], padding=((1, 1), (1, 1)))
        bd = fi._conv(bd, *self.w[f"{m}.branch3x3dbl_3"], strides=(2, 2))
        mp = jnp.concatenate([fi._max_pool(p) for p in parts], axis=-1)
        return jnp.concatenate([b3out, bd, mp], axis=-1)

    def __call__(self, x, endpoints=("pool3",)):
        from tise_tpu.backbones.inception_v3 import ENDPOINTS

        assert tuple(endpoints) == ("pool3",)
        x = x.astype(self.dtype)
        x = fi._conv(x, *self.w["Conv2d_1a_3x3"], strides=(2, 2))
        x = fi._conv(x, *self.w["Conv2d_2a_3x3"])
        x = fi._conv(x, *self.w["Conv2d_2b_3x3"], padding=((1, 1), (1, 1)))
        x = fi._max_pool(x)
        x = fi._conv(x, *self.w["Conv2d_3b_1x1"])
        x = fi._conv(x, *self.w["Conv2d_4a_3x3"])
        x = fi._max_pool(x)
        parts = [x]
        for m in ("Mixed_5b", "Mixed_5c", "Mixed_5d"):
            parts = self._block_a_parts(parts, m)
        x = self._block_b_parts(parts, "Mixed_6a")
        for m in ("Mixed_6b", "Mixed_6c", "Mixed_6d", "Mixed_6e"):
            x = self._block_c(x, m)
        x = self._block_d(x, "Mixed_7a")
        x = self._block_e(x, "Mixed_7b")
        x = self._block_e(x, "Mixed_7c")
        x = jnp.mean(x.astype(jnp.float32), axis=(1, 2)).astype(self.dtype)
        return {"pool3": x}


def main():
    from tise_tpu.backbones import inception_v3
    from tise_tpu.core import compile_cache

    compile_cache.enable()
    dtype = jnp.bfloat16
    params = jax.jit(
        lambda r: inception_v3.InceptionV3(num_classes=1000, dtype=dtype).init(
            r, jnp.zeros((1, 299, 299, 3), dtype), endpoints=("logits",)
        )
    )(jax.random.PRNGKey(1))
    folded = jax.jit(lambda p: fi.fold_tree(p, dtype))(params)
    base = fi.FastInception(dtype=dtype, folded=folded)
    var = PartsInception(dtype=dtype, folded=folded)

    host = np.random.RandomState(7)
    u8 = jax.device_put(host.randint(0, 256, (B, 299, 299, 3)).astype(np.uint8))
    int(jax.jit(lambda x: jnp.sum(x, dtype=jnp.int32))(u8))

    # parity first (cheap single batch, f32-ish tolerance for bf16)
    small = jax.device_put(host.randint(0, 256, (8, 299, 299, 3)).astype(np.uint8))
    a = jax.jit(lambda z: base((z.astype(jnp.float32) / 255.0).astype(dtype))["pool3"])(small)
    b = jax.jit(lambda z: var((z.astype(jnp.float32) / 255.0).astype(dtype))["pool3"])(small)
    a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
    rel = np.max(np.abs(a - b)) / (np.max(np.abs(a)) + 1e-9)
    print(f"parity max-rel diff: {rel:.2e}", flush=True)

    def bench(name, model):
        @jax.jit
        def run(imgs, s0):
            def rep(i, acc):
                z = jnp.bitwise_xor(imgs, (s0 + i).astype(jnp.uint8)).astype(jnp.float32) / 255.0
                return acc + jnp.sum(model(z.astype(dtype))["pool3"].astype(jnp.float32))

            return jax.lax.fori_loop(0, CHAIN, rep, jnp.float32(0))

        t0 = time.perf_counter()
        float(run(u8, jnp.uint8(255)))
        c = time.perf_counter() - t0
        t0 = time.perf_counter()
        outs = [run(u8, jnp.uint8(i * CHAIN)) for i in range(ITERS)]
        float(outs[-1])
        dt = (time.perf_counter() - t0) / (ITERS * CHAIN) * 1000
        print(f"{name:10s}: {dt:7.2f} ms/batch256  (compile {c:5.1f}s)", flush=True)

    bench("base", base)
    bench("parts", var)


if __name__ == "__main__":
    main()
