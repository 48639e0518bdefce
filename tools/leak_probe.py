"""Host-RSS leak probe for the detection sweep path.

The 30k-track SOA sweep was OOM-killed twice at ~128 GB host RSS after
~11k-17k 800px images (~11 MB leaked per image — roughly one pinned upload
buffer per dispatch).  This isolates where: loop TPUDetector.detect_batch on
synthetic batches and print RSS deltas per iteration, optionally with
gc.collect() between calls, optionally bypassing the detector with a bare
device_put+pull of the same bytes (separates the axon client's upload path
from the model/dispatch path).

    python tools/leak_probe.py [--iters 30] [--mode detector|upload|exec] [--gc]
"""

from __future__ import annotations

import argparse
import gc
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def rss_mb() -> float:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS"):
                return int(line.split()[1]) / 1024.0
    return -1.0


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=30)
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--size", type=int, default=800)
    p.add_argument("--mode", choices=("detector", "upload", "staging", "delete", "exec"), default="detector")
    p.add_argument("--gc", action="store_true")
    args = p.parse_args()

    host = np.random.RandomState(0)
    base = host.randint(0, 256, (args.batch, args.size, args.size, 3)).astype(np.uint8)

    if args.mode == "detector":
        from tise_tpu.backbones.detection.predictor import TPUDetector

        det = TPUDetector(None, batch_size=args.batch, input_size=args.size,
                          dtype=jnp.bfloat16, roi_sampling=1, proposals=256)

        def step(i):
            imgs = base.copy()
            imgs[0, 0, 0, 0] = i % 251  # defeat the tunnel result cache
            det.detect_batch(imgs)

    elif args.mode == "upload":
        touch = jax.jit(lambda x: jnp.sum(x, dtype=jnp.int32))

        def step(i):
            imgs = base.copy()
            imgs[0, 0, 0, 0] = i % 251
            int(touch(jax.device_put(imgs)))

    elif args.mode == "staging":
        # ONE reused host buffer, mutated in place per batch: does the
        # client key its retention on the source object, or copy per call?
        touch = jax.jit(lambda x: jnp.sum(x, dtype=jnp.int32))
        staging = base.copy()

        def step(i):
            staging[0, 0, 0, 0] = i % 251
            int(touch(jax.device_put(staging)))

    elif args.mode == "delete":
        touch = jax.jit(lambda x: jnp.sum(x, dtype=jnp.int32))

        def step(i):
            imgs = base.copy()
            imgs[0, 0, 0, 0] = i % 251
            buf = jax.device_put(imgs)
            int(touch(buf))
            buf.delete()

    else:  # exec: fixed resident input, fresh executions only
        buf = jax.device_put(base)
        salted = jax.jit(lambda x, s: jnp.sum(jnp.bitwise_xor(x, s), dtype=jnp.int32))

        def step(i):
            int(salted(buf, jnp.uint8(i % 251)))

    step(0)  # compile + warm
    if args.gc:
        gc.collect()
    r0 = rss_mb()
    print(f"[leak_probe] mode={args.mode} warm RSS {r0:.0f} MB", flush=True)
    t0 = time.perf_counter()
    for i in range(1, args.iters + 1):
        step(i)
        if args.gc:
            gc.collect()
        if i % 5 == 0 or i == args.iters:
            r = rss_mb()
            print(f"iter {i:3d}: RSS {r:8.0f} MB  (+{r - r0:7.1f} total, "
                  f"{(r - r0) / i:6.1f} MB/iter)", flush=True)
    dt = time.perf_counter() - t0
    print(f"[leak_probe] {dt / args.iters * 1e3:.0f} ms/iter", flush=True)


if __name__ == "__main__":
    main()
