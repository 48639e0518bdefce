"""GAN image-generation throughput (layer L1) on the real TPU.

The reference's evaluation protocol generates 30k-80k images per metric run
(coco_gen_image_from_caption.py:177-203, gen_evaluation_images_coco.sh) with
batch size 10 on one GPU; this tool measures the TPU-native equivalent — the
full caption->image sampling pipeline (bi-LSTM text encoder + CA_NET + 3-stage
G forward at the production eval dims GF_DIM=64/R_NUM=3, cfg/eval_coco.yml) —
in images/sec/chip at the finest 256px scale.

Measurement follows bench.py's tunnel rules: jitted init, salt-varied chained
reps inside one dispatch (fori_loop) to amortize the ~10 ms/dispatch tax,
sync by pulling one scalar, best of two passes.  f32 and bf16 G forwards are
both timed (bf16 is the TPU eval-time fast path; training stays f32).
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])  # repo root

import jax
import jax.numpy as jnp
import numpy as np

from tise_tpu.backbones import damsm
from tise_tpu.models.attngan_pp.generator import GanConfig, GNet

_T0 = time.perf_counter()


def _mark(msg: str) -> None:
    print(f"[gen_bench +{time.perf_counter() - _T0:6.1f}s] {msg}", file=sys.stderr, flush=True)


def main() -> None:
    if "--cpu" in sys.argv:  # smoke mode (JAX_PLATFORMS env is ignored here)
        jax.config.update("jax_platforms", "cpu")
    on_tpu = jax.default_backend() not in ("cpu",)
    batch = 64 if on_tpu else 2
    chain = 8 if on_tpu else 1
    iters = 4 if on_tpu else 1
    ntoken = 27297 if on_tpu else 64  # coco captions.pickle vocab size
    gan = GanConfig(gf_dim=64 if on_tpu else 8, df_dim=32, r_num=3 if on_tpu else 1,
                    words_num=20, embedding_dim=256 if on_tpu else 32)
    _mark(f"backend={jax.default_backend()} batch={batch} gf_dim={gan.gf_dim}")

    text_encoder = damsm.RNNEncoder(ntoken=ntoken, nhidden=gan.embedding_dim // 2)
    host = np.random.RandomState(0)
    caps = jnp.asarray(host.randint(1, ntoken, (batch, gan.words_num)).astype(np.int32))
    lens = jnp.asarray(host.randint(5, gan.words_num + 1, (batch,)).astype(np.int32))

    line = {}
    for name, dtype in [("f32", jnp.float32), ("bf16", jnp.bfloat16)]:
        gnet = GNet(cfg=gan, dtype=dtype)

        @jax.jit
        def init(r):
            r1, r2, r3 = jax.random.split(r, 3)
            tp = text_encoder.init(r1, caps, lens)
            words, sent = text_encoder.apply(tp, caps, lens)
            gv = gnet.init(
                r2, jnp.zeros((batch, gan.z_dim)), sent, words, caps == 0, r3, train=False
            )
            return tp, gv

        _mark(f"{name}: init (jitted)")
        tp, gv = init(jax.random.PRNGKey(0))

        @jax.jit
        def gen_chain(tp, gv, caps, lens, seed):
            # full production sampling path: text encode once per batch, then
            # per-rep fresh z/CA noise; caption salt defeats the tunnel's
            # result cache across calls without re-uploading anything
            def rep(i, acc):
                key = jax.random.fold_in(jax.random.PRNGKey(0), seed + i)
                r_z, r_ca = jax.random.split(key)
                words, sent = text_encoder.apply(tp, caps + (seed + i) % 2, lens)
                z = jax.random.normal(r_z, (batch, gan.z_dim))
                imgs, _, _, _ = gnet.apply(gv, z, sent, words, caps == 0, r_ca, train=False)
                return acc + jnp.sum(imgs[-1].astype(jnp.float32))

            return jax.lax.fori_loop(0, chain, rep, jnp.float32(0))

        _mark(f"{name}: compile+warm")
        float(gen_chain(tp, gv, caps, lens, jnp.int32(10_000)))
        best = None
        for attempt in range(2):
            _mark(f"{name}: timing pass {attempt + 1}")
            t0 = time.perf_counter()
            outs = [
                gen_chain(tp, gv, caps, lens, jnp.int32(attempt * 1000 + k * chain))
                for k in range(iters)
            ]
            float(outs[-1])
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        ips = batch * chain * iters / best
        _mark(f"{name}: {ips:.1f} img/s")
        line[f"gen256_images_per_sec_{name}"] = round(ips, 2)

    print(json.dumps(line))


if __name__ == "__main__":
    main()
