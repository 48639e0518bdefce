"""Decompose the RP rank phase's per-batch cost (VERDICT r4 #7).

The r4 bench measured the rank loop at ~58 ms/batch-256 (~4.4k items/s) vs
the ~11k img/s the bf16 CLIP visual tower sustains alone — a 2.5x gap with
three candidate costs: the [B,100,512] bank gather + [B,100] einsum, the
blocking [B,100] logit pull, and the per-batch dispatch+RTT tax (the rank
loop, unlike the tower bench, blocks on np.asarray(logits) every batch, so
the tunnel's ~28 ms round trip serializes with compute).

Variants (same salted pre-staged inputs as tools/rp_bench.py):
  tower_chained   image tower only, fori-chained: pure compute floor
  gather_chained  bank gather+dot only (precomputed image embeddings),
                  fori-chained: the gather's compute cost
  full_chained    tower+gather+dot, fori-chained (no per-batch pull):
                  the rank program's compute floor
  full_blocking   per-batch dispatch + blocking pull (what score_items did
                  before r5): compute + RTT serialized
  full_pipelined  per-batch dispatch with a 1-deep in-flight window (pull
                  batch k while k+1 runs) — what score_items does now

    python tools/rp_rank_ablate.py [--cpu] [--items N] [--batch B]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

_T0 = time.perf_counter()


def _mark(msg: str) -> None:
    print(f"[rp_rank_ablate +{time.perf_counter() - _T0:7.1f}s] {msg}", file=sys.stderr, flush=True)


def run(*, items: int = 5120, batch: int = 256) -> dict:
    on_tpu = jax.default_backend() not in ("cpu",)

    from tise_tpu.backbones import clip_vit
    from tise_tpu.metrics.clip_scorer import ClipPairScorer
    from tise_tpu.ops.preprocess import normalize

    k = 100
    n_batches = items // batch
    _mark(f"backend={jax.default_backend()} items={items} batch={batch}")

    params = jax.jit(clip_vit.random_params)(jax.random.PRNGKey(0))
    scorer = ClipPairScorer(params, fast=on_tpu)
    scorer._build_bank_fns()

    host = np.random.RandomState(0)
    toks = np.zeros((items, 77), np.int32)
    toks[:, 0] = 49406
    toks[:, 1:5] = host.randint(1, 49000, (items, 4))
    toks[:, 5] = 49407
    idx = np.concatenate(
        [np.arange(items)[:, None], host.randint(0, items, (items, k - 1))], axis=1
    ).astype(np.int32)
    toks_dev = jax.device_put(toks)
    int(jax.jit(lambda x: jnp.sum(x, dtype=jnp.int32))(toks_dev))
    bank = scorer.encode_text_bank(toks_dev)
    float(jnp.sum(bank))
    imgs = jax.device_put(host.randint(0, 256, (batch, 224, 224, 3)).astype(np.uint8))
    idx_dev = jax.device_put(idx)
    int(jax.jit(lambda x: jnp.sum(x, dtype=jnp.int32))(imgs))
    int(jax.jit(lambda x: jnp.sum(x, dtype=jnp.int32))(idx_dev))

    fast_visual = scorer._fast_visual
    dtype = jnp.bfloat16 if fast_visual is not None else jnp.float32

    def encode_img(p, im_u8):
        x = normalize(im_u8, "clip", dtype)
        if fast_visual is not None:
            out = fast_visual(x).astype(jnp.float32)
        else:
            model = clip_vit.CLIP(dtype=jnp.float32)
            out = model.apply(p, x, method=model.encode_image)
        return out / jnp.linalg.norm(out, axis=-1, keepdims=True)

    raw = scorer._from_bank_raw
    results = {}

    def timed(name, fn, *, per_batch_items=batch, reps=n_batches):
        best = None
        for attempt in range(2):
            t0 = time.perf_counter()
            fn(attempt)
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        results[name] = {
            "sec": round(best, 3),
            "items_per_sec": round(per_batch_items * reps / best, 1),
            "ms_per_batch": round(best / reps * 1e3, 2),
        }
        _mark(f"{name}: {results[name]}")

    # ---- chained variants: fori_loop over salted reps, one scalar pulled ----
    def chained(body_one):
        @jax.jit
        def chain(p, seed0):
            def body(i, acc):
                return acc + body_one(p, (seed0 + i).astype(jnp.uint8))

            return jax.lax.fori_loop(0, n_batches, body, jnp.float32(0))

        float(chain(params, jnp.uint8(255)))  # compile+warm
        return lambda attempt: float(chain(params, jnp.uint8(attempt * 31)))

    tower_fn = chained(
        lambda p, s: jnp.sum(encode_img(p, jnp.bitwise_xor(imgs, s)).astype(jnp.float32))
    )
    timed("tower_chained", tower_fn)

    img_emb = jax.jit(encode_img)(params, imgs)
    float(jnp.sum(img_emb))
    scale = jnp.exp(params["params"]["logit_scale"].astype(jnp.float32))

    def gather_one(p, s):
        ix = jnp.bitwise_xor(idx_dev[:batch], s.astype(jnp.int32))  # defeat result cache
        ix = jnp.clip(ix, 0, items - 1)
        txt = jnp.take(bank, ix, axis=0)
        return jnp.sum(scale * jnp.einsum("bd,bkd->bk", img_emb, txt))

    timed("gather_chained", chained(gather_one))

    def full_one(p, s):
        return jnp.sum(raw(p, jnp.bitwise_xor(imgs, s), bank, idx_dev[:batch]))

    timed("full_chained", chained(full_one))

    # ---- per-batch dispatch variants (the production shapes) ----
    @jax.jit
    def fwd(p, im, bk, ix, salt):
        return raw(p, jnp.bitwise_xor(im, salt), bk, ix)

    np.asarray(fwd(params, imgs, bank, idx_dev[:batch], jnp.uint8(255)))  # warm

    def blocking(attempt):
        for bi in range(n_batches):
            lo = fwd(params, imgs, bank, idx_dev[bi * batch : (bi + 1) * batch],
                     jnp.uint8(1 + attempt * n_batches + bi))
            np.asarray(lo)

    timed("full_blocking", blocking)

    def pipelined(attempt):
        inflight = None
        for bi in range(n_batches):
            lo = fwd(params, imgs, bank, idx_dev[bi * batch : (bi + 1) * batch],
                     jnp.uint8(101 + attempt * n_batches + bi))
            if inflight is not None:
                np.asarray(inflight)
            inflight = lo
        np.asarray(inflight)

    timed("full_pipelined", pipelined)
    return results


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--items", type=int, default=5120)
    p.add_argument("--batch", type=int, default=256)
    args = p.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
        args.items, args.batch = 16, 4
    from tise_tpu.core import compile_cache

    compile_cache.enable()
    print(json.dumps(run(items=args.items, batch=args.batch)))


if __name__ == "__main__":
    main()
