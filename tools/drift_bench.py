"""Production-scale --precision fast vs highest drift (VERDICT r4 item 5).

tests/test_precision_drift.py bounds the metric-level drift of the bf16 fast
towers in a proxy regime (128 images at 64px).  This tool re-measures the
same two bounds at the scale users actually run (reference workload:
fid_score.py:223-238 at 30k images / 299px, RP_coco.py:56-80 at K=100):

  * FID: two synthetic 30k-image folders with shifted pixel statistics,
    extracted at 299px through BOTH paths — the f32 flax InceptionV3 under
    ``--precision highest`` (configure_precision sets
    jax_default_matmul_precision, core/config.py:109) and the BN-folded bf16
    FastInception under ``--precision fast`` — on IDENTICAL device-staged
    uint8 inputs, device streaming moments (the --streaming path), f64
    finalize, eigh Frechet.  Reported: relative |FID_fast - FID_highest| and
    the fast path's self-FID (same folder twice; bounds the sqrtm noise
    floor).
  * RP: 100-way argmax success rate over n items through the production
    dedup-bank scorer (``ClipPairScorer.logits_from_bank``), fast vs highest,
    identical images/tokens.  Reported: |rate_fast - rate_highest| in
    percentage points.

Same honesty rules as bench.py: random-init weights with conv kernels
rescaled x1.5 keep pool3 at O(1) std (random-init trunks otherwise collapse
deep activations — see tests/test_precision_drift.py); inputs are staged on
device once and salt-xor-cycled so the tunnel uploads don't dominate;
identical salts feed both precision paths so the comparison is exact.

    python tools/drift_bench.py [--cpu] [--batches 118] [--rp-items 1024]
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
    print(f"[drift_bench +{time.perf_counter() - _T0:7.1f}s] {msg}", file=sys.stderr, flush=True)


def _scale_conv_kernels(params, c):
    def f(path, x):
        name = "/".join(str(k) for k in path)
        if x.ndim == 4 and "kernel" in name:
            return x * c
        return x

    return jax.tree_util.tree_map_with_path(f, params)


def fid_drift(*, n_batches: int, batch: int, src: int) -> dict:
    from tise_tpu.backbones import inception_fast, inception_v3
    from tise_tpu.core.config import configure_precision
    from tise_tpu.ops import sqrtm as sqrtm_lib
    from tise_tpu.ops import stats
    from tise_tpu.ops.preprocess import resize_and_normalize

    pool_n = 4
    _mark(f"fid: init ({2 * n_batches * batch} images total, {src}->299px)")
    params = jax.jit(
        lambda r: _scale_conv_kernels(inception_v3.random_params(r), 1.5)
    )(jax.random.PRNGKey(1))

    # device image pools: folder A low range, folder B shifted range (keeps
    # cross-FID well away from zero, like the proxy test)
    host = np.random.RandomState(7)
    pools = {}
    touch = jax.jit(lambda x: jnp.sum(x, dtype=jnp.int32))
    for name, lo, hi in (("a", 0, 200), ("b", 55, 255)):
        pools[name] = [
            jax.device_put(host.randint(lo, hi, (batch, src, src, 3)).astype(np.uint8))
            for _ in range(pool_n)
        ]
        for p in pools[name]:
            int(touch(p))
    _mark("fid: pools staged")

    def run_path(precision: str) -> dict:
        """mu/sigma per folder under one --precision mode (CLI-exact plumbing:
        configure_precision flips jax_default_matmul_precision, which
        participates in the jit trace; the fast path additionally swaps in the
        bf16 folded tower exactly like make_pool3_extractor fast=True)."""
        configure_precision(precision)
        if precision == "fast":
            fast_model = inception_fast.FastInception(
                dtype=jnp.bfloat16,
                folded=jax.jit(lambda p: inception_fast.fold_tree(p, jnp.bfloat16))(params),
            )

            def pool3(x):
                return fast_model(x.astype(jnp.bfloat16), endpoints=("pool3",))[
                    "pool3"
                ].astype(jnp.float32)

        else:
            model = inception_v3.InceptionV3(dtype=jnp.float32)

            def pool3(x):
                return model.apply(params, x, endpoints=("pool3",))["pool3"]

        @jax.jit
        def step(state, imgs_u8, salt):
            x = resize_and_normalize(jnp.bitwise_xor(imgs_u8, salt), "fid", 299)
            return stats.update_moments(state, pool3(x))

        out = {}
        # folder a twice under fast (self-FID noise floor), identical salts
        folders = [("a", 0), ("b", 1)] + ([("a2", 0)] if precision == "fast" else [])
        for fname, salt_base in folders:
            pool = pools[fname.rstrip("2")]
            s = stats.init_moments(2048)
            for i in range(n_batches):
                s = step(s, pool[i % pool_n], jnp.uint8((salt_base * 119 + i) % 255))
            out[fname] = stats.finalize_moments(s)  # f64 host finalize
            _mark(f"fid: {precision}/{fname} moments done")
        return out

    fids = {}
    for precision in ("highest", "fast"):
        t0 = time.perf_counter()
        m = run_path(precision)
        fids[precision] = sqrtm_lib.frechet_distance(*m["a"], *m["b"], method="eigh")
        if "a2" in m:
            fids["self_fast"] = sqrtm_lib.frechet_distance(*m["a"], *m["a2"], method="eigh")
        _mark(
            f"fid: {precision} cross-FID={fids[precision]:.4f} "
            f"({time.perf_counter() - t0:.1f}s)"
        )
    configure_precision("highest")
    rel = abs(fids["fast"] - fids["highest"]) / fids["highest"]
    return {
        "drift_fid_images": 2 * n_batches * batch,
        "drift_fid_highest": round(float(fids["highest"]), 4),
        "drift_fid_fast": round(float(fids["fast"]), 4),
        "drift_fid_rel": round(float(rel), 5),
        "drift_fid_self_fast": round(float(fids["self_fast"]), 6),
    }


def rp_drift(*, n_items: int, k: int, batch: int) -> dict:
    from tise_tpu.backbones import clip_vit
    from tise_tpu.core.config import configure_precision
    from tise_tpu.metrics.clip_scorer import ClipPairScorer

    _mark(f"rp: init ({n_items} items x {k} captions, bank path)")
    params = jax.jit(lambda r: clip_vit.random_params(r, dtype=jnp.float32))(
        jax.random.PRNGKey(2)
    )
    rng = np.random.RandomState(3)
    imgs = rng.randint(0, 256, (n_items, 224, 224, 3)).astype(np.uint8)
    # unique caption pool with repeats across items — the real
    # COCO_RP_captions.pkl shape the dedup bank exploits
    n_unique = max(2 * k, n_items)
    bank_toks = rng.randint(1, 40000, (n_unique, 77)).astype(np.int32)
    cap_idx = np.stack(
        [rng.choice(n_unique, size=k, replace=False) for _ in range(n_items)]
    ).astype(np.int32)

    rates = {}
    for precision in ("highest", "fast"):
        configure_precision(precision)
        scorer = ClipPairScorer(params, fast=precision == "fast")
        t0 = time.perf_counter()
        bank = scorer.encode_text_bank(bank_toks, batch_size=4096)
        hits = 0
        for s in range(0, n_items, batch):
            logits = scorer.logits_from_bank(imgs[s : s + batch], bank, cap_idx[s : s + batch])
            hits += int(np.sum(np.argmax(logits, axis=1) == 0))
        rates[precision] = hits / n_items
        _mark(
            f"rp: {precision} rate={rates[precision]:.4f} "
            f"({time.perf_counter() - t0:.1f}s)"
        )
    configure_precision("highest")
    return {
        "drift_rp_items": n_items,
        "drift_rp_highest": round(rates["highest"], 4),
        "drift_rp_fast": round(rates["fast"], 4),
        "drift_rp_pp": round(abs(rates["fast"] - rates["highest"]) * 100, 3),
    }


def run(*, batches: int = 118, batch: int = 256, rp_items: int = 1024) -> dict:
    on_tpu = jax.default_backend() not in ("cpu",)
    if not on_tpu:
        batches, batch, rp_items = 2, 8, 8
    src = 256 if on_tpu else 64
    line = fid_drift(n_batches=batches, batch=batch, src=src)
    line.update(rp_drift(n_items=rp_items, k=100 if on_tpu else 5, batch=64 if on_tpu else 4))
    return line


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--batches", type=int, default=118, help="256-image batches per folder")
    p.add_argument("--rp-items", type=int, default=1024)
    args = p.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    print(json.dumps(run(batches=args.batches, rp_items=args.rp_items)))


if __name__ == "__main__":
    main()
