"""Shared setup for the generation-throughput benches (layer L1).

The reference generates its 30k-80k evaluation images at batch 10 per GPU
(coco_gen_image_from_caption.py:177-203, gen_evaluation_images_coco.sh); the
TPU-native hot path is the full caption->image sampling pipeline — bi-LSTM
text encoder + CA_NET + 3-stage AttnGAN++ G forward at the production eval
dims (GF_DIM=64, R_NUM=3 — cfg/eval_coco.yml), 256px finest scale, eval mode.

Both ``bench.py`` (generation_throughput section) and ``tools/gen_bench.py``
(standalone f32-vs-bf16 comparison) time this exact pipeline; this module
holds the single copy of the model setup and the salted dispatch chain so the
two benches cannot drift.

Tunnel measurement rules baked in (see bench.py header): jitted init, chained
salted reps inside one dispatch (fori_loop) to amortize the ~10 ms/dispatch
tax, sync by pulling one scalar.  The caption salt ``(seed + i) % 2`` must
keep ids in-vocab: captions are sampled from [1, ntoken-1) so the +1 salt
lands at most on ntoken-2 + 1 = ntoken-1, the last real embedding row.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from tise_tpu.backbones import damsm
from tise_tpu.models.attngan_pp.generator import GanConfig, GNet

COCO_NTOKEN = 27297  # coco captions.pickle vocab size


class GenBench(NamedTuple):
    """A ready-to-time generation chain: ``chain_fn(seed)`` runs ``chain``
    salted batch-``batch`` sampling reps in one dispatch and returns a scalar
    to pull for synchronization."""

    chain_fn: Callable[[jnp.ndarray], jnp.ndarray]
    batch: int
    chain: int


def build(*, on_tpu: bool, dtype, batch: int | None = None, chain: int | None = None) -> GenBench:
    """Construct the production sampling chain with jit-initialized params."""
    batch = (64 if on_tpu else 2) if batch is None else batch
    chain = (8 if on_tpu else 1) if chain is None else chain
    ntoken = COCO_NTOKEN if on_tpu else 64
    gan = GanConfig(
        gf_dim=64 if on_tpu else 8,
        df_dim=32,
        r_num=3 if on_tpu else 1,
        words_num=20,
        embedding_dim=256 if on_tpu else 32,
    )
    text_encoder = damsm.RNNEncoder(ntoken=ntoken, nhidden=gan.embedding_dim // 2)
    gnet = GNet(cfg=gan, dtype=dtype)
    host = np.random.RandomState(0)
    # upper bound ntoken-1: the +1 caption salt below must stay in-vocab
    caps = jnp.asarray(host.randint(1, ntoken - 1, (batch, gan.words_num)).astype(np.int32))
    lens = jnp.asarray(host.randint(5, gan.words_num + 1, (batch,)).astype(np.int32))

    @jax.jit
    def init(r):
        r1, r2, r3 = jax.random.split(r, 3)
        tp = text_encoder.init(r1, caps, lens)
        words, sent = text_encoder.apply(tp, caps, lens)
        gv = gnet.init(r2, jnp.zeros((batch, gan.z_dim)), sent, words, caps == 0, r3, train=False)
        return tp, gv

    tp, gv = init(jax.random.PRNGKey(0))

    @jax.jit
    def gen_chain(tp, gv, caps, lens, seed):
        # full production sampling path: text encode once per batch, then
        # per-rep fresh z/CA noise; caption salt defeats the tunnel's result
        # cache across calls without re-uploading anything
        def rep(i, acc):
            key = jax.random.fold_in(jax.random.PRNGKey(0), seed + i)
            r_z, r_ca = jax.random.split(key)
            words, sent = text_encoder.apply(tp, caps + (seed + i) % 2, lens)
            z = jax.random.normal(r_z, (batch, gan.z_dim))
            imgs, _, _, _ = gnet.apply(gv, z, sent, words, caps == 0, r_ca, train=False)
            return acc + jnp.sum(imgs[-1].astype(jnp.float32))

        return jax.lax.fori_loop(0, chain, rep, jnp.float32(0))

    return GenBench(chain_fn=lambda seed: gen_chain(tp, gv, caps, lens, seed), batch=batch, chain=chain)
