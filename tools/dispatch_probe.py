"""Probe per-dispatch overhead of the fid30k step under the axon tunnel.

fid30k_probe showed the step is 28.2 ms/batch in-jit, but bench.py's
per-batch dispatch loop measured 273 ms/batch.  Suspect: the fresh
``jnp.uint8(b)`` salt scalar per call forces a host->device literal upload
through the lazy tunnel each dispatch.  Variants timed over 16 sequential
dispatches:
  a) fresh host scalar salt per call (current bench path)
  b) salt derived on-device from the moments state count (no per-call upload)
  c) pre-uploaded salt vector + traced dynamic index from state count
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

B, SRC, OUT = 256, 256, 299
N_DISPATCH = 118


def main():
    from tise_tpu.backbones import inception_fast, inception_v3
    from tise_tpu.core import compile_cache
    from tise_tpu.ops import stats
    from tise_tpu.ops.preprocess import resize_and_normalize

    compile_cache.enable()
    dtype = jnp.bfloat16
    params = jax.jit(
        lambda r: inception_v3.InceptionV3(num_classes=1000, dtype=dtype).init(
            r, jnp.zeros((1, 299, 299, 3), dtype), endpoints=("logits",)
        )
    )(jax.random.PRNGKey(1))
    fast = inception_fast.FastInception(
        dtype=dtype, folded=jax.jit(lambda p: inception_fast.fold_tree(p, dtype))(params)
    )

    host = np.random.RandomState(7)
    pool = [
        jax.device_put(host.randint(0, 256, (B, SRC, SRC, 3)).astype(np.uint8))
        for _ in range(4)
    ]
    touch = jax.jit(lambda x: jnp.sum(x, dtype=jnp.int32))
    for p in pool:
        int(touch(p))

    @jax.jit
    def step_a(state, imgs_u8, salt):
        x = resize_and_normalize(jnp.bitwise_xor(imgs_u8, salt), "fid", OUT)
        acts = fast(x.astype(dtype), endpoints=("pool3",))["pool3"].astype(jnp.float32)
        return stats.update_moments(state, acts)

    @jax.jit
    def step_b(state, imgs_u8):
        salt = (state.count % 255.0).astype(jnp.uint8) + 1
        x = resize_and_normalize(jnp.bitwise_xor(imgs_u8, salt), "fid", OUT)
        acts = fast(x.astype(dtype), endpoints=("pool3",))["pool3"].astype(jnp.float32)
        return stats.update_moments(state, acts)

    def run(name, fn, *extra_per_call):
        s = stats.init_moments(2048)
        # warm/compile
        w = fn(stats.init_moments(2048), pool[0], *(e(0) for e in extra_per_call))
        float(w.count)
        t0 = time.perf_counter()
        for i in range(N_DISPATCH):
            s = fn(s, pool[i % 4], *(e(i + 1) for e in extra_per_call))
        float(s.count)
        dt = (time.perf_counter() - t0) / N_DISPATCH * 1000
        print(f"{name:44s}: {dt:8.2f} ms/dispatch", flush=True)

    run("a) fresh host uint8 salt per call", step_a, lambda i: jnp.uint8(i))
    run("b) on-device salt from state.count", step_b)
    # a2: same as (a) but the salts pre-created and touched once up front
    salts = [jax.device_put(np.uint8(i)) for i in range(N_DISPATCH + 1)]
    for sv in salts:
        int(touch(sv))
    run("a2) pre-uploaded salt scalars", step_a, lambda i: salts[i])


if __name__ == "__main__":
    main()
