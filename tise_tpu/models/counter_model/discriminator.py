"""CounterModel discriminator: multi-scale MSG-GAN D with MinibatchStdDev
(reference: CounterModel/discriminators.py).

One discriminator consumes ALL generator scales (MSG_D_NET(depth=6),
:120-158): fRGB conv on the finest image, then six DisGeneralConvBlocks —
MinibatchStdDev concat (+1 channel, :38-101) -> two spectral-norm 3x3 convs
-> 2x avg pool — with the next-smaller image concatenated (3 channels)
before each later block.  Heads are the shared cond/uncond D_GET_LOGITS.

MinibatchStdDev 'all' mode (:68-73): per-feature std over the batch
(biased, +1e-8 inside the sqrt), averaged to one scalar, broadcast as one
constant channel.  NOTE: under data-parallel pjit this std is computed over
the *global* batch (XLA reduces across shards) — the reference computes it
per-GPU shard under DataParallel; document as the (better) TPU semantics.
"""

from __future__ import annotations

from typing import Any, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from tise_tpu.models.attngan_pp.discriminator import DLogitsHead
from tise_tpu.models.attngan_pp.layers import Block3x3LeakyD


def minibatch_stddev(x: jax.Array) -> jax.Array:
    """Append the batch-std summary channel ('all' averaging,
    discriminators.py:54-73)."""
    std = jnp.sqrt(jnp.mean(jnp.square(x - jnp.mean(x, axis=0, keepdims=True)), axis=0, keepdims=True) + 1e-8)
    scalar = jnp.mean(std)
    chan = jnp.full(x.shape[:-1] + (1,), scalar, x.dtype)
    return jnp.concatenate([x, chan], axis=-1)


class DisGeneralConvBlock(nn.Module):
    """stddev concat -> Block3x3LeakyD(in) -> Block3x3LeakyD(out) -> avgpool2
    (discriminators.py:104-117)."""

    mid_features: int
    out_features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, update_stats: bool) -> jax.Array:
        x = minibatch_stddev(x)
        x = Block3x3LeakyD(self.mid_features, dtype=self.dtype, name="conv1")(x, update_stats)
        x = Block3x3LeakyD(self.out_features, dtype=self.dtype, name="conv2")(x, update_stats)
        return nn.avg_pool(x, (2, 2), strides=(2, 2))


class MSGDNet(nn.Module):
    """depth-6 multi-scale discriminator (expects 7 images, 4..256 px,
    finest last — the generator's output order)."""

    ndf: int
    nef: int
    depth: int = 6
    b_jcu: bool = True
    dtype: Any = jnp.float32

    def setup(self):
        ndf, d = self.ndf, self.dtype
        self.fRGB_0 = nn.Conv(ndf, (1, 1), dtype=d, name="fRGB_0")
        blocks = []
        for i in range(self.depth):
            if i < 3:
                blocks.append(
                    DisGeneralConvBlock(ndf * (2**i), ndf * (2 ** (i + 1)), dtype=d, name=f"block{i}")
                )
            else:
                blocks.append(DisGeneralConvBlock(ndf * 8, ndf * 8, dtype=d, name=f"block{i}"))
        self.blocks = blocks
        self.cond_head = DLogitsHead(ndf, conditioned=True, dtype=d, name="cond_head")
        if self.b_jcu:
            self.uncond_head = DLogitsHead(ndf, conditioned=False, dtype=d, name="uncond_head")

    def features(self, images: Sequence[jax.Array], update_stats: bool = True) -> jax.Array:
        """images: [img4, img8, ..., img256] -> [B, 4, 4, 8*ndf]."""
        out = self.fRGB_0(images[-1])
        out = self.blocks[0](out, update_stats)
        for x, block in zip(reversed(images[:-1]), self.blocks[1:]):
            out = block(jnp.concatenate([x, out], axis=-1), update_stats)
        return out

    def cond_logits(self, h: jax.Array, c: jax.Array, update_stats: bool = True) -> jax.Array:
        return self.cond_head(h, c, update_stats)

    def uncond_logits(self, h: jax.Array, update_stats: bool = True) -> Optional[jax.Array]:
        if not self.b_jcu:
            return None
        return self.uncond_head(h, None, update_stats)

    def __call__(
        self, images: Sequence[jax.Array], c: Optional[jax.Array] = None, update_stats: bool = True
    ) -> Tuple[jax.Array, Optional[jax.Array]]:
        h = self.features(images, update_stats)
        cond = self.cond_head(h, c, update_stats)
        uncond = self.uncond_logits(h, update_stats)
        return cond, uncond
