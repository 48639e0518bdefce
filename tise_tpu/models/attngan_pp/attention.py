"""Attention for AttnGAN++ (reference: AttnGAN++/attention.py).

``func_attention`` (:16-54) — DAMSM word<->region attention used by the
words loss: softmax over words, then gamma1-scaled softmax over regions.
``SpatialAttention`` (:57-109) — word->pixel attention inside the generator:
pixel-query / projected-word-key softmax over words with padding masked.

TPU design: everything is batched einsum on the MXU; the reference's
per-sample loop in words_loss is vectorised in losses.py using these
primitives with explicit length masks instead of python slicing.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

NEG_INF = -1e9  # softmax mask value (torch uses -inf; -1e9 avoids NaN rows)


def func_attention(
    query: jax.Array, context: jax.Array, gamma1: float, query_mask: Optional[jax.Array] = None
) -> Tuple[jax.Array, jax.Array]:
    """DAMSM double-softmax attention (attention.py:16-54).

    query   [B, D, Tq]   (word features)
    context [B, D, S]    (flattened region features, S = ih*iw)
    query_mask [B, Tq]   True for valid words (replaces the reference's
                         python-level slicing to words_num)
    -> (weighted context [B, D, Tq], attn over regions [B, Tq, S])
    """
    # attn[b, s, t] = <context[b,:,s], query[b,:,t]>
    attn = jnp.einsum("bds,bdt->bst", context, query, preferred_element_type=jnp.float32)
    if query_mask is not None:
        attn = jnp.where(query_mask[:, None, :], attn, NEG_INF)
    attn = jax.nn.softmax(attn, axis=-1)  # over words (Eq. 8)
    attn = jax.nn.softmax(attn * gamma1, axis=1)  # over regions (Eq. 9)
    weighted = jnp.einsum("bds,bst->bdt", context, attn, preferred_element_type=jnp.float32)
    return weighted, attn.transpose(0, 2, 1)


class SpatialAttention(nn.Module):
    """Word -> pixel attention (attention.py:57-109): project words to idf via
    1x1 conv, softmax over words per pixel with padded words masked out."""

    idf: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self, h: jax.Array, word_embs: jax.Array, mask: Optional[jax.Array] = None
    ) -> Tuple[jax.Array, jax.Array]:
        """h [B, ih, iw, idf]; word_embs [B, cdf, T]; mask [B, T] True = PAD
        (reference masks where mask==1, i.e. padding)."""
        b, ih, iw, idf = h.shape
        t = word_embs.shape[2]
        # conv1x1 on the word axis == dense over cdf
        words = word_embs.transpose(0, 2, 1)  # [B, T, cdf]
        keys = nn.Dense(self.idf, use_bias=False, dtype=self.dtype, name="conv_context")(words)  # [B, T, idf]
        q = h.reshape(b, ih * iw, idf)
        attn = jnp.einsum("bqd,btd->bqt", q, keys, preferred_element_type=jnp.float32)
        if mask is not None:
            attn = jnp.where(mask[:, None, :], NEG_INF, attn)
        attn = jax.nn.softmax(attn, axis=-1)  # over words
        out = jnp.einsum("bqt,btd->bqd", attn, keys, preferred_element_type=jnp.float32)
        out = out.reshape(b, ih, iw, self.idf)
        return out, attn.reshape(b, ih, iw, t)
