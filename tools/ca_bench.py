"""CA counter throughput on the real TPU (VERDICT r4 item 6).

The reference's CA hot loop (counting_alignment/CA.py:151-166) runs the
CountSeg FC-ResNet50 PRM counter one image at a time at 448x448 with input
gradients enabled.  The TPU path (backbones/counter.py + metrics/ca.py) is a
pure batched forward: ResNet50 trunk -> 240-channel 1x1 head -> PRM-exact
peak stimulation (reduce_window maxima + lower-middle median gate) + density
maps — the last backbone without a bench line.

Pattern identical to the other tower benches (bench.py): jitted init,
pre-staged device uint8 salted per rep, fori_loop chain per dispatch to
amortize the tunnel's ~10 ms dispatch tax, best of two passes.  Reports both
the f32 production default (--precision highest, what the CA CLI runs) and
the bf16 fast path.

    python tools/ca_bench.py [--cpu] [--batch B]
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
    print(f"[ca_bench +{time.perf_counter() - _T0:7.1f}s] {msg}", file=sys.stderr, flush=True)


def run(*, batch: int = 32, dtypes: tuple = ("float32", "bfloat16")) -> dict:
    """Time the counter forward on the current backend.  Importable by
    bench.py (CA section) — keep the single copy here."""
    on_tpu = jax.default_backend() not in ("cpu",)

    from tise_tpu.backbones import counter as counter_lib
    from tise_tpu.ops.preprocess import normalize

    batch = batch if on_tpu else 2
    size = 448 if on_tpu else 64
    chain = 8 if on_tpu else 1
    iters = 4 if on_tpu else 1
    _mark(f"backend={jax.default_backend()} batch={batch} size={size}")

    host = np.random.RandomState(0)
    imgs = jax.device_put(host.randint(0, 256, (batch, size, size, 3)).astype(np.uint8))
    int(jax.jit(lambda x: jnp.sum(x, dtype=jnp.int32))(imgs))

    line = {}
    names = {"float32": ("ca_images_per_sec", jnp.float32), "bfloat16": ("ca_fast_images_per_sec", jnp.bfloat16)}
    for key, dtype in (names[d] for d in dtypes):
        model = counter_lib.FCResNet50PRM(dtype=dtype)
        params = jax.jit(
            lambda r, _m=model, _d=dtype: _m.init(r, jnp.zeros((1, size, size, 3), _d))
        )(jax.random.PRNGKey(0))

        @jax.jit
        def fwd(p, im, seed0, _m=model, _d=dtype):
            def rep(i, acc):
                x = normalize(jnp.bitwise_xor(im, (seed0 + i).astype(jnp.uint8)), "imagenet", _d)
                conf, density = _m.apply(p, x)
                return acc + jnp.sum(conf.astype(jnp.float32)) + jnp.sum(density.astype(jnp.float32))

            return jax.lax.fori_loop(0, chain, rep, jnp.float32(0))

        _mark(f"{key}: compile+warm")
        float(fwd(params, imgs, jnp.uint8(255)))
        best = None
        for attempt in range(2):
            _mark(f"{key}: timing pass {attempt + 1}")
            t0 = time.perf_counter()
            outs = [fwd(params, imgs, jnp.uint8(1 + attempt * 101 + i * chain)) for i in range(iters)]
            float(outs[-1])
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        line[key] = round(batch * chain * iters / best, 2)
        _mark(f"{key}: {line[key]} img/s")
        del params

    return line


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--batch", type=int, default=32)
    args = p.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    print(json.dumps(run(batch=args.batch)))


if __name__ == "__main__":
    main()
