"""DAMSM + GAN losses (reference: AttnGAN++/miscc/losses.py).

The reference computes words_loss with a python loop over the batch
(losses.py:69-109, one func_attention per caption).  Here the whole
(image x caption) grid is a single batched einsum chain with length masks —
one MXU-friendly computation instead of B sequential attention calls.

All BCE terms use logits (sigmoid folded into the loss); values match the
reference's Sigmoid+BCELoss exactly.
"""

from __future__ import annotations

from typing import List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

NEG_INF = -1e9


def _safe_norm(x: jax.Array, axis: int, eps: float = 1e-12) -> jax.Array:
    """L2 norm with a finite gradient at 0 (jnp.linalg.norm's grad is NaN
    there; random-init encoders can emit exactly-zero features)."""
    return jnp.sqrt(jnp.sum(jnp.square(x), axis=axis) + eps)


class DamsmWeights(NamedTuple):
    """Smoothing constants (miscc/config.py:41-47)."""

    gamma1: float = 5.0
    gamma2: float = 5.0
    gamma3: float = 10.0
    lam: float = 1.0  # TRAIN.SMOOTH.LAMBDA


def _class_mask(class_ids: Optional[jax.Array], batch: int) -> Optional[jax.Array]:
    """mask[i, j] True when j is a same-class distractor of i (losses.py:22-32)."""
    if class_ids is None:
        return None
    same = class_ids[:, None] == class_ids[None, :]
    return same & ~jnp.eye(batch, dtype=bool)


def _sym_ce(scores: jax.Array, mask: Optional[jax.Array]) -> Tuple[jax.Array, jax.Array]:
    """Cross-entropy with diagonal labels, both directions, same-class pairs
    masked out (losses.py:49-57)."""
    if mask is not None:
        scores = jnp.where(mask, NEG_INF, scores)
    labels = jnp.arange(scores.shape[0])
    loss0 = optax.softmax_cross_entropy_with_integer_labels(scores, labels).mean()
    loss1 = optax.softmax_cross_entropy_with_integer_labels(scores.T, labels).mean()
    return loss0, loss1


def sent_loss(
    cnn_code: jax.Array,
    rnn_code: jax.Array,
    class_ids: Optional[jax.Array],
    w: DamsmWeights = DamsmWeights(),
    eps: float = 1e-8,
) -> Tuple[jax.Array, jax.Array]:
    """Sentence-level DAMSM loss (losses.py:19-57): gamma3-scaled cosine
    matrix, CE in both directions."""
    b = cnn_code.shape[0]
    num = cnn_code @ rnn_code.T
    denom = _safe_norm(cnn_code, 1)[:, None] * _safe_norm(rnn_code, 1)
    scores = num / jnp.clip(denom, eps) * w.gamma3
    return _sym_ce(scores, _class_mask(class_ids, b))


def words_loss(
    img_features: jax.Array,
    words_emb: jax.Array,
    cap_lens: jax.Array,
    class_ids: Optional[jax.Array],
    w: DamsmWeights = DamsmWeights(),
    eps: float = 1e-8,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Word-level DAMSM loss, fully batched (losses.py:60-129).

    img_features [B, 17, 17, nef] (NHWC region features)
    words_emb    [B, nef, T]
    cap_lens     [B]
    -> (loss0, loss1, attn maps [B, T, 17, 17] — the i==j diagonal, matching
       the reference's att_maps collection)
    """
    b, ih, iw, nef = img_features.shape
    t = words_emb.shape[2]
    context = img_features.reshape(b, ih * iw, nef)  # [B, S, nef]
    valid = jnp.arange(t)[None, :] < cap_lens[:, None]  # [B, T]

    # attn0[i, j, s, t] = <context[i, s], words[j, :, t]>
    attn0 = jnp.einsum("isn,jnt->ijst", context, words_emb, preferred_element_type=jnp.float32)
    attn0 = jnp.where(valid[None, :, None, :], attn0, NEG_INF)
    a = jax.nn.softmax(attn0, axis=3)  # over words (func_attention Eq. 8)
    a = jax.nn.softmax(a * w.gamma1, axis=2)  # over regions (Eq. 9)
    # weiContext[i, j, n, t] = sum_s context[i, s, n] * a[i, j, s, t]
    wei = jnp.einsum("isn,ijst->ijnt", context, a, preferred_element_type=jnp.float32)

    # cosine per word between words[j] and wei[i, j]
    num = jnp.einsum("jnt,ijnt->ijt", words_emb, wei)
    denom = _safe_norm(words_emb, 1)[None, :, :] * _safe_norm(wei, 2)
    row_sim = num / jnp.clip(denom, eps)  # [B_img, B_cap, T]

    # Eq. 10: log sum over valid words of exp(gamma2 * sim)
    expd = jnp.where(valid[None, :, :], jnp.exp(row_sim * w.gamma2), 0.0)
    similarities = jnp.log(jnp.clip(jnp.sum(expd, axis=2), eps)) * w.gamma3  # [B_img, B_cap]

    loss0, loss1 = _sym_ce(similarities, _class_mask(class_ids, b))
    # diagonal attention maps: a[i, i] reshaped [B, S, T] -> [B, T, ih, iw]
    diag = jnp.einsum("iist->ist", a).transpose(0, 2, 1).reshape(b, t, ih, iw)
    return loss0, loss1, diag


def kl_loss(mu: jax.Array, logvar: jax.Array) -> jax.Array:
    """-0.5 mean(1 + logvar - mu^2 - exp(logvar)) (losses.py:242-246)."""
    return -0.5 * jnp.mean(1 + logvar - jnp.square(mu) - jnp.exp(logvar))


def _bce(logits: jax.Array, target: float) -> jax.Array:
    labels = jnp.full_like(logits, target)
    return optax.sigmoid_binary_cross_entropy(logits, labels).mean()


class DLossParts(NamedTuple):
    cond_real: jax.Array
    cond_fake: jax.Array
    cond_wrong: jax.Array
    uncond_real: jax.Array
    uncond_fake: jax.Array
    total: jax.Array


def discriminator_loss(
    real_cond: jax.Array,
    real_uncond: Optional[jax.Array],
    fake_cond: jax.Array,
    fake_uncond: Optional[jax.Array],
    wrong_cond: jax.Array,
) -> DLossParts:
    """Reference weighting (losses.py:133-157):
      with uncond head: (real + cond_real)/2 + (fake + cond_fake + cond_wrong)/3
      without:          cond_real + (cond_fake + cond_wrong)/2
    ``wrong_cond`` are the shifted real-feature/condition mismatch logits
    (real_features[:B-1] vs conditions[1:], losses.py:146-148).
    """
    cond_real = _bce(real_cond, 1.0)
    cond_fake = _bce(fake_cond, 0.0)
    cond_wrong = _bce(wrong_cond, 0.0)
    if real_uncond is not None:
        uncond_real = _bce(real_uncond, 1.0)
        uncond_fake = _bce(fake_uncond, 0.0)
        total = (uncond_real + cond_real) / 2.0 + (uncond_fake + cond_fake + cond_wrong) / 3.0
    else:
        uncond_real = jnp.zeros(())
        uncond_fake = jnp.zeros(())
        total = cond_real + (cond_fake + cond_wrong) / 2.0
    return DLossParts(cond_real, cond_fake, cond_wrong, uncond_real, uncond_fake, total)


def generator_adv_loss(cond: jax.Array, uncond: Optional[jax.Array]) -> jax.Array:
    """Per-scale G adversarial term (losses.py:197-206)."""
    g = _bce(cond, 1.0)
    if uncond is not None:
        g = g + _bce(uncond, 1.0)
    return g


def generator_damsm_loss(
    region_features: jax.Array,
    cnn_code: jax.Array,
    words_embs: jax.Array,
    sent_emb: jax.Array,
    cap_lens: jax.Array,
    class_ids: Optional[jax.Array],
    w: DamsmWeights = DamsmWeights(),
) -> Tuple[jax.Array, jax.Array]:
    """DAMSM terms at the finest scale (losses.py:218-230): (w_loss, s_loss),
    each already scaled by lambda."""
    w0, w1, _ = words_loss(region_features, words_embs, cap_lens, class_ids, w)
    s0, s1 = sent_loss(cnn_code, sent_emb, class_ids, w)
    return (w0 + w1) * w.lam, (s0 + s1) * w.lam
