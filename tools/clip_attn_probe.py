"""Probe: CLIP attention layout variants, whole-tower ablation on real TPU.

ROADMAP still-open idea #2: the residual attention cost (~8 ms of the ~23 ms
tower) is relayouts + small batched matmuls; try qkv layouts XLA might keep.
Measured by whole-tower ablation (swap only `_attention`), per the ROADMAP
measurement rules — isolated op benches undermeasure attention 3x.

Variants:
  base      current: reshape [b', p*t, 3, h, d], einsum bqhd,bkhd->bhqk
  headmajor wqkv columns pre-reordered to (h, 3, d) groups at fold time so
            the reshape slices axis 3 instead of axis 2
  pretrans  one explicit transpose to [b', h, T, d] then dot_general over
            the last axes (gives XLA the batched-matmul layout directly)
  split3    q/k/v as 3 separate dense dots (no 3-way slice of one buffer)

Usage: python tools/clip_attn_probe.py [--variants base,headmajor,pretrans,split3]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--variants", type=str, default="base,headmajor,pretrans,split3")
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--reps", type=int, default=8)
    p.add_argument("--iters", type=int, default=3)
    args = p.parse_args()

    from tise_tpu.backbones import clip_fast, clip_vit
    from tise_tpu.core import compile_cache
    from tise_tpu.ops.preprocess import normalize

    compile_cache.enable()
    dt = jnp.bfloat16
    b = args.batch

    params = jax.jit(lambda r: clip_vit.random_params(r, dtype=dt))(jax.random.PRNGKey(0))
    folded = jax.jit(lambda p_: clip_fast.fold_tree(p_, dt))(params)

    class HeadMajor(clip_fast.FastCLIPVisual):
        """wqkv/bqkv columns reordered (3, h, d) -> (h, 3, d) at init."""

        def __init__(self, **kw):
            super().__init__(**kw)
            h, dm = self.heads, self.width
            hd = dm // h
            perm = np.arange(3 * dm).reshape(3, h, hd).transpose(1, 0, 2).reshape(-1)
            self.blocks = [
                dict(blk, wqkv=blk["wqkv"][:, perm], bqkv=blk["bqkv"][perm])
                for blk in self.blocks
            ]

        def _attention(self, qkv, b, t):
            d = self.dtype
            dm, h = self.width, self.heads
            hd = dm // h
            p = max(g for g in (self.attn_pack, 2, 1) if b % g == 0)
            qkv = qkv.reshape(b // p, p * t, h, 3, hd)
            q, k, v = qkv[:, :, :, 0], qkv[:, :, :, 1], qkv[:, :, :, 2]
            s = jnp.einsum("bqhd,bkhd->bhqk", q * (hd ** -0.5), k)
            if p > 1:
                blk = jnp.arange(p * t) // t
                s = jnp.where(blk[:, None] == blk[None, :], s, jnp.asarray(-jnp.inf, s.dtype))
            a = jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(d)
            o = jnp.einsum("bhqk,bkhd->bqhd", a, v, preferred_element_type=jnp.float32).astype(d)
            return o.reshape(b * t, dm)

    class PreTrans(clip_fast.FastCLIPVisual):
        def _attention(self, qkv, b, t):
            d = self.dtype
            dm, h = self.width, self.heads
            hd = dm // h
            p = max(g for g in (self.attn_pack, 2, 1) if b % g == 0)
            tt = p * t
            qkv = qkv.reshape(b // p, tt, 3, h, hd).transpose(0, 3, 2, 1, 4)  # [b,h,3,T,d]
            q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # [b,h,T,d]
            s = jnp.einsum("bhqd,bhkd->bhqk", q * (hd ** -0.5), k)
            if p > 1:
                blk = jnp.arange(tt) // t
                s = jnp.where(blk[:, None] == blk[None, :], s, jnp.asarray(-jnp.inf, s.dtype))
            a = jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(d)
            o = jnp.einsum("bhqk,bhkd->bqhd", a, v, preferred_element_type=jnp.float32).astype(d)
            return o.reshape(b * t, dm)

    class Split3(clip_fast.FastCLIPVisual):
        def _block(self, xf, blk, b, t):
            d = self.dtype
            dm, h = self.width, self.heads
            hd = dm // h
            y = clip_fast._ln(xf, *blk["ln1"], d)
            wq, wk, wv = (blk["wqkv"][:, i * dm : (i + 1) * dm] for i in range(3))
            bq, bk, bv = (blk["bqkv"][i * dm : (i + 1) * dm] for i in range(3))
            p = max(g for g in (self.attn_pack, 2, 1) if b % g == 0)
            tt = p * t

            def heads_of(w_, b_):
                return ((jnp.dot(y, w_) + b_).astype(d)).reshape(b // p, tt, h, hd)

            q, k, v = heads_of(wq, bq), heads_of(wk, bk), heads_of(wv, bv)
            s = jnp.einsum("bqhd,bkhd->bhqk", q * (hd ** -0.5), k)
            if p > 1:
                blkm = jnp.arange(tt) // t
                s = jnp.where(blkm[:, None] == blkm[None, :], s, jnp.asarray(-jnp.inf, s.dtype))
            a = jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(d)
            o = jnp.einsum("bhqk,bkhd->bqhd", a, v, preferred_element_type=jnp.float32).astype(d)
            o = o.reshape(b * t, dm)
            xf = xf + (jnp.dot(o, blk["wo"]) + blk["bo"]).astype(d)
            y = clip_fast._ln(xf, *blk["ln2"], d)
            y = (jnp.dot(y, blk["w1"]) + blk["b1"]).astype(d)
            y = y * jax.nn.sigmoid(jnp.float32(1.702) * y.astype(jnp.float32)).astype(d)
            xf = xf + (jnp.dot(y, blk["w2"]) + blk["b2"]).astype(d)
            return xf

    def pad_t_variant(pack: int, tpad: int):
        """pack-p with T zero-padded to ``tpad`` INSIDE attention only: the
        score matmuls see (p*tpad)-row tiles (pack=2/tpad=64 -> exactly one
        128 MXU tile, 100% row occupancy) while the score buffer stays the
        smallest of any >=128-row packing ([b/2, h, 128, 128] vs pack-4's
        [b/4, h, 200->256, 200->256]).  Dense ops (qkv/mlp) never see the
        padding.  Padded key columns are masked; padded query rows are
        computed and dropped on the unpad slice."""

        class PadT(clip_fast.FastCLIPVisual):
            def _attention(self, qkv, b, t):
                d = self.dtype
                dm, h = self.width, self.heads
                hd = dm // h
                p = max(g for g in (pack, 1) if b % g == 0)
                qkv = qkv.reshape(b, t, 3, h, hd)
                qkv = jnp.pad(qkv, ((0, 0), (0, tpad - t), (0, 0), (0, 0), (0, 0)))
                qkv = qkv.reshape(b // p, p * tpad, 3, h, hd)
                q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
                s = jnp.einsum("bqhd,bkhd->bhqk", q * (hd ** -0.5), k)
                rows = jnp.arange(p * tpad)
                mask = ((rows[:, None] // tpad) == (rows[None, :] // tpad)) & ((rows % tpad) < t)[None, :]
                s = jnp.where(mask, s, jnp.asarray(-jnp.inf, s.dtype))
                a = jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(d)
                o = jnp.einsum("bhqk,bkhd->bqhd", a, v, preferred_element_type=jnp.float32).astype(d)
                o = o.reshape(b, tpad, dm)[:, :t]
                return o.reshape(b * t, dm)

        return PadT(dtype=dt, folded=folded)

    towers = {
        "base": clip_fast.FastCLIPVisual(dtype=dt, folded=folded),
        "headmajor": HeadMajor(dtype=dt, folded=folded),
        "pretrans": PreTrans(dtype=dt, folded=folded),
        "split3": Split3(dtype=dt, folded=folded),
        "padt2": pad_t_variant(2, 64),
        "padt1": pad_t_variant(1, 64),
        "padt4": pad_t_variant(4, 64),
    }

    img = jax.device_put(
        np.random.RandomState(0).randint(0, 256, (b, 224, 224, 3)).astype(np.uint8)
    )
    int(jax.jit(lambda x: jnp.sum(x, dtype=jnp.int32))(img))

    # parity check on CPU-sized slices is skipped here (random weights, bf16);
    # variants are algebraically identical to base — verify by value anyway
    ref = None
    for name in args.variants.split(","):
        tower = towers[name]

        @jax.jit
        def chain(seed0, _t=tower):
            def body(i, acc):
                x = normalize(jnp.bitwise_xor(img, (seed0 + i).astype(jnp.uint8)), "clip", dt)
                return acc + jnp.sum(_t(x).astype(jnp.float32))

            return jax.lax.fori_loop(0, args.reps, body, jnp.float32(0))

        t0 = time.perf_counter()
        v = float(chain(jnp.uint8(0)))
        print(f"[{time.perf_counter() - t0:6.1f}s] {name}: compiled (chk {v:.1f})", file=sys.stderr, flush=True)
        if ref is None:
            ref = v
        elif abs(v - ref) / max(abs(ref), 1) > 2e-2:
            print(f"  WARNING {name}: value drift vs base: {v} vs {ref}", flush=True)
        seeds = [jnp.uint8(101 + 7 * i) for i in range(args.iters + 1)]
        float(chain(seeds[0]))
        t0 = time.perf_counter()
        outs = [chain(s) for s in seeds[1:]]
        float(outs[-1])
        ms = (time.perf_counter() - t0) / (args.iters * args.reps) * 1e3
        print(f"{name:10s}: {ms:7.2f} ms/tower (B={b})", flush=True)


if __name__ == "__main__":
    main()
