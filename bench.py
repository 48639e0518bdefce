"""Throughput benchmark: Inception+CLIP feature extraction, images/sec/chip.

BASELINE.json north-star: >= 5000 images/sec/chip for joint InceptionV3
(pool3 + logits) + CLIP ViT-B/32 image-feature extraction on v5e.  Each image
counts once and passes through BOTH backbones (the bag-of-metrics pipeline
reuses one decode for FID/IS*/RP).

Measurement notes (the axon tunnel is hostile to naive timing):
  * identical (executable, args) calls are served from a result cache -> a
    device-side xor with a distinct seed scalar makes every call unique while
    uploading the input batch only once;
  * ``block_until_ready`` does not block through the tunnel -> sync by
    pulling a scalar result;
  * there is ~28 ms fixed round-trip latency per blocking call -> enqueue a
    chain of executions and sync only on the last (device executes in-order),
    which is also how the real extraction pipeline runs (host never blocks
    per batch).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_IMAGES_PER_SEC = 5000.0


def main() -> None:
    from tise_tpu.backbones import clip_vit, inception_v3
    from tise_tpu.ops.preprocess import normalize

    on_tpu = jax.default_backend() not in ("cpu",)
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    batch = 256 if on_tpu else 8
    iters = 30 if on_tpu else 2

    inception = inception_v3.InceptionV3(num_classes=1000, dtype=dtype)
    clip = clip_vit.CLIP(dtype=dtype)

    rng = jax.random.PRNGKey(0)
    inc_params = inception.init(rng, jnp.zeros((1, 299, 299, 3), dtype), endpoints=("logits",))
    clip_params = clip_vit.random_params(rng, dtype=dtype)

    @jax.jit
    def extract(inc_p, clip_p, img299_u8, img224_u8, seed):
        x299 = jnp.bitwise_xor(img299_u8, seed)
        x224 = jnp.bitwise_xor(img224_u8, seed)
        feats = inception.apply(inc_p, normalize(x299, "fid", dtype), endpoints=("pool3", "logits"))
        clip_feat = clip.apply(clip_p, normalize(x224, "clip", dtype), method=clip.encode_image)
        return (
            jnp.sum(feats["pool3"].astype(jnp.float32))
            + jnp.sum(feats["logits"].astype(jnp.float32))
            + jnp.sum(clip_feat.astype(jnp.float32))
        )

    host = np.random.RandomState(0)
    touch = jax.jit(lambda x: jnp.sum(x, dtype=jnp.int32))
    d299 = jax.device_put(host.randint(0, 256, (batch, 299, 299, 3)).astype(np.uint8))
    d224 = jax.device_put(host.randint(0, 256, (batch, 224, 224, 3)).astype(np.uint8))
    int(touch(d299))  # force-materialize uploads before timing
    int(touch(d224))

    seeds = [jnp.uint8(i) for i in range(iters + 1)]
    float(extract(inc_params, clip_params, d299, d224, seeds[0]))  # compile + warm

    t0 = time.perf_counter()
    outs = [extract(inc_params, clip_params, d299, d224, s) for s in seeds[1:]]
    float(outs[-1])  # in-order execution: last done => all done
    dt = time.perf_counter() - t0

    images_per_sec = batch * iters / dt
    print(
        json.dumps(
            {
                "metric": "inception+clip_extraction_throughput",
                "value": round(images_per_sec, 2),
                "unit": "images/sec/chip",
                "vs_baseline": round(images_per_sec / BASELINE_IMAGES_PER_SEC, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
