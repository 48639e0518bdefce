"""Real-TPU smoke of the backbones bench.py does NOT exercise.

bench.py covers inception/CLIP/detector and the FID pipeline on the real
chip; the DAMSM bi-LSTM scorer (masked lax.scan) and the PRM counter had
only ever run on the CPU test mesh.  This drives both metric engines
(`metrics/rp_cub.DamsmScorer`, `metrics/ca.CountingEngine`) end-to-end on
the default backend with jit-init'd random weights and asserts finite,
correctly-shaped outputs — a compile-or-crash canary for the TPU path of
every remaining metric backbone.

Usage: python tools/tpu_smoke.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def log(msg: str) -> None:
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def smoke_damsm() -> None:
    from tise_tpu.backbones import damsm
    from tise_tpu.metrics.rp_cub import DamsmScorer

    ntoken, b, k, t = 100, 8, 4, 24
    key = jax.random.PRNGKey(0)
    rnn = damsm.RNNEncoder(ntoken=ntoken)
    cnn = damsm.CNNEncoder()
    # jit the inits: eager per-op dispatch through the axon tunnel turns a
    # seconds-long init into minutes (CLAUDE.md)
    rnn_p = jax.jit(rnn.init)(key, jnp.zeros((k, t), jnp.int32), jnp.ones((k,), jnp.int32))
    cnn_p = jax.jit(cnn.init)(key, jnp.zeros((2, 256, 256, 3), jnp.float32))
    log("damsm: params initialised")

    scorer = DamsmScorer(rnn_p, cnn_p, ntoken=ntoken)
    rng = np.random.RandomState(0)
    imgs = rng.randint(0, 256, (b, 256, 256, 3), dtype=np.uint8)
    caps = rng.randint(1, ntoken, (b, k, t)).astype(np.int32)
    lens = rng.randint(3, t + 1, (b, k)).astype(np.int32)
    t0 = time.perf_counter()
    s = scorer.scores(imgs, caps, lens)
    dt = time.perf_counter() - t0
    assert s.shape == (b, k), s.shape
    assert np.all(np.isfinite(s)) and np.all(np.abs(s) <= 1.0 + 1e-5), s
    log(f"damsm: PASS  scores {s.shape} in {dt:.1f}s (incl. compile)")


def smoke_counter() -> None:
    from tise_tpu.backbones import counter as counter_lib
    from tise_tpu.metrics.ca import CountingEngine, IMAGE_SIZE

    b = 8
    key = jax.random.PRNGKey(1)
    model = counter_lib.FCResNet50PRM()
    params = jax.jit(model.init)(key, jnp.zeros((1, IMAGE_SIZE, IMAGE_SIZE, 3), jnp.float32))
    log("counter: params initialised")

    engine = CountingEngine(params)
    rng = np.random.RandomState(1)
    imgs = rng.randint(0, 256, (b, IMAGE_SIZE, IMAGE_SIZE, 3), dtype=np.uint8)
    t0 = time.perf_counter()
    counts = engine.count_batch(imgs)
    dt = time.perf_counter() - t0
    assert len(counts) == b
    for row in counts:
        # negative counts are reference parity: CA.py:158-161 gates on
        # confidence>0 but never clamps the density mean, so random (or
        # pathological real) weights can emit round(negative) counts
        assert all(np.isfinite(v) and v == round(v) for v in row.values()), row
    log(f"counter: PASS  {sum(len(r) for r in counts)} class counts over {b} images in {dt:.1f}s (incl. compile)")


def main() -> None:
    log(f"backend: {jax.default_backend()}  devices: {jax.devices()}")
    smoke_damsm()
    smoke_counter()
    log("ALL PASS")


if __name__ == "__main__":
    main()
