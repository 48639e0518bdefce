"""GAN image-generation throughput (layer L1) on the real TPU.

The reference's evaluation protocol generates 30k-80k images per metric run
(coco_gen_image_from_caption.py:177-203, gen_evaluation_images_coco.sh) with
batch size 10 on one GPU; this tool measures the TPU-native equivalent — the
full caption->image sampling pipeline (bi-LSTM text encoder + CA_NET + 3-stage
G forward at the production eval dims GF_DIM=64/R_NUM=3, cfg/eval_coco.yml) —
in images/sec/chip at the finest 256px scale, in both f32 and bf16 (bf16 is
the TPU eval-time fast path; training stays f32).

Model setup + the salted dispatch chain live in tise_tpu.models.gen_bench
(shared with bench.py's generation_throughput section so the copies cannot
drift); the tunnel timing rules are documented there and in bench.py.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from tise_tpu.models import gen_bench

_T0 = time.perf_counter()


def _mark(msg: str) -> None:
    print(f"[gen_bench +{time.perf_counter() - _T0:6.1f}s] {msg}", file=sys.stderr, flush=True)


def main() -> None:
    if "--cpu" in sys.argv:  # smoke mode (JAX_PLATFORMS env is ignored here)
        jax.config.update("jax_platforms", "cpu")
    on_tpu = jax.default_backend() not in ("cpu",)
    iters = 4 if on_tpu else 1
    _mark(f"backend={jax.default_backend()}")

    line = {}
    for name, dtype in [("f32", jnp.float32), ("bf16", jnp.bfloat16)]:
        _mark(f"{name}: init (jitted)")
        bench = gen_bench.build(on_tpu=on_tpu, dtype=dtype)
        _mark(f"{name}: compile+warm")
        float(bench.chain_fn(jnp.int32(10_000)))
        best = None
        for attempt in range(2):
            _mark(f"{name}: timing pass {attempt + 1}")
            t0 = time.perf_counter()
            outs = [bench.chain_fn(jnp.int32(attempt * 1000 + k * bench.chain)) for k in range(iters)]
            float(outs[-1])
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        ips = bench.batch * bench.chain * iters / best
        _mark(f"{name}: {ips:.1f} img/s")
        line[f"gen256_images_per_sec_{name}"] = round(ips, 2)

    print(json.dumps(line))


if __name__ == "__main__":
    main()
