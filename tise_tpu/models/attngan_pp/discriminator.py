"""AttnGAN++ discriminators (reference: AttnGAN++/discriminators.py).

Three per-scale spectral-norm conv stacks (D_NET64/128/256, :35-98) sharing
the D_GET_LOGITS heads (:7-31): an unconditional head and a conditional head
that tiles the sentence embedding over the 4x4 feature map.  The trunk is
exposed separately (``features``) so the loss can reuse one trunk pass for
the cond / uncond / wrong-pair heads, as the reference does
(miscc/losses.py:136-148).

Deviation (documented): the reference's heads end in Sigmoid + BCELoss
(discriminators.py:16, miscc/losses.py:142); here the heads return raw logits
and the losses use sigmoid-BCE-with-logits — identical loss values,
numerically stabler.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from tise_tpu.models.attngan_pp.layers import Block3x3LeakyD, DownBlockD, EncodeBy16


class DLogitsHead(nn.Module):
    """Conditional/unconditional logits head (discriminators.py:7-31)."""

    ndf: int
    conditioned: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, h: jax.Array, c: Optional[jax.Array], update_stats: bool) -> jax.Array:
        if self.conditioned and c is not None:
            b = h.shape[0]
            c_map = jnp.broadcast_to(c[:, None, None, :], (b, 4, 4, c.shape[-1]))
            h = jnp.concatenate([h, c_map], axis=-1)
            h = Block3x3LeakyD(self.ndf * 8, dtype=self.dtype, name="joint")(h, update_stats)
        # conv4x4 stride4 -> 1x1 logit (raw; reference applies Sigmoid here)
        out = nn.Conv(1, (4, 4), strides=(4, 4), padding="VALID", dtype=self.dtype, name="out")(h)
        return out.reshape(-1)


class DNet(nn.Module):
    """Per-scale discriminator; ``scale`` in {64, 128, 256}
    (discriminators.py:35-98)."""

    ndf: int
    nef: int
    scale: int
    b_jcu: bool = True
    dtype: Any = jnp.float32

    def setup(self):
        ndf, d = self.ndf, self.dtype
        self.s16 = EncodeBy16(ndf, dtype=d, name="s16")
        if self.scale >= 128:
            self.s32 = DownBlockD(ndf * 16, dtype=d, name="s32")
            if self.scale == 128:
                self.s32_1 = Block3x3LeakyD(ndf * 8, dtype=d, name="s32_1")
        if self.scale >= 256:
            self.s64 = DownBlockD(ndf * 32, dtype=d, name="s64")
            self.s64_1 = Block3x3LeakyD(ndf * 16, dtype=d, name="s64_1")
            self.s64_2 = Block3x3LeakyD(ndf * 8, dtype=d, name="s64_2")
        self.cond_head = DLogitsHead(ndf, conditioned=True, dtype=d, name="cond_head")
        if self.b_jcu:
            self.uncond_head = DLogitsHead(ndf, conditioned=False, dtype=d, name="uncond_head")

    def features(self, x: jax.Array, update_stats: bool = True) -> jax.Array:
        """Trunk: image -> [B, 4, 4, 8*ndf]."""
        h = self.s16(x, update_stats)
        if self.scale >= 128:
            h = self.s32(h, update_stats)
            if self.scale == 128:
                h = self.s32_1(h, update_stats)
        if self.scale >= 256:
            h = self.s64(h, update_stats)
            h = self.s64_1(h, update_stats)
            h = self.s64_2(h, update_stats)
        return h

    def cond_logits(self, h: jax.Array, c: jax.Array, update_stats: bool = True) -> jax.Array:
        return self.cond_head(h, c, update_stats)

    def uncond_logits(self, h: jax.Array, update_stats: bool = True) -> Optional[jax.Array]:
        if not self.b_jcu:
            return None
        return self.uncond_head(h, None, update_stats)

    def __call__(
        self, x: jax.Array, c: Optional[jax.Array] = None, update_stats: bool = True
    ) -> Tuple[jax.Array, Optional[jax.Array]]:
        """Init/path-coverage entry: -> (cond logits, uncond logits or None)."""
        h = self.features(x, update_stats)
        cond = self.cond_logits(h, c, update_stats) if c is not None else self.cond_head(h, None, update_stats)
        uncond = self.uncond_logits(h, update_stats)
        return cond, uncond
