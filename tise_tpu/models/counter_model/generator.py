"""CounterModel generator (reference: CounterModel/generators.py).

The DM-GAN-style memory generator used for the RP-overfitting counter-example
(SURVEY.md component 30): fc -> 4x4 x 16gf, a tanh image head at EVERY scale
(4..256, seven outputs — MSG-GAN out-skips, generators.py:207-295), plain
upBlocks to 64px, then two memory stages:

Memory writing (:160-176): word features gated against the pooled
(detached) image state — gate = sigmoid(A(words) + B(avg(h))); memory =
M_w(words) * gate + M_r(avg(h)) * (1 - gate).  Key addressing / value
reading (:179-182): pixel queries attend over memory keys (softmax over
words, padding masked), weighted values are read back.  Key response
(:185-187): a sigmoid response gate blends h with the memory readout, then
the blended state is duplicated channel-wise into the residual/upsample tail.
"""

from __future__ import annotations

from typing import Any, List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from tise_tpu.models.attngan_pp.generator import CANet, GanConfig, GetImage
from tise_tpu.models.attngan_pp.layers import ResBlockG, SyncBatchNorm, UpBlock, glu

NEG_INF = -1e9


class MemoryStage(nn.Module):
    """NEXT_STAGE_G with the memory mechanism (generators.py:127-193)."""

    ngf: int
    nef: int
    r_num: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self, h: jax.Array, word_embs: jax.Array, mask: Optional[jax.Array], train: bool
    ) -> Tuple[jax.Array, jax.Array]:
        d = self.dtype
        b, ih, iw, ngf = h.shape
        t = word_embs.shape[2]
        words = word_embs.transpose(0, 2, 1)  # [B, T, nef]

        # -- memory writing --
        h_avg = jax.lax.stop_gradient(jnp.mean(h, axis=(1, 2)))  # [B, ngf] (detached, :169)
        gate1 = nn.Dense(1, use_bias=False, dtype=d, name="A")(words)[..., 0]  # [B, T]
        gate2 = nn.Dense(1, use_bias=False, dtype=d, name="B")(h_avg)  # [B, 1]
        writing_gate = jax.nn.sigmoid(gate1 + gate2)[..., None]  # [B, T, 1]
        m_w = nn.relu(nn.Dense(ngf * 2, dtype=d, name="M_w")(words))  # conv1d k1 == dense
        m_r = nn.relu(nn.Dense(ngf * 2, dtype=d, name="M_r")(h_avg))[:, None, :]  # [B, 1, 2ngf]
        memory = m_w * writing_gate + m_r * (1.0 - writing_gate)  # [B, T, 2ngf]

        # -- key addressing / value reading --
        key = nn.relu(nn.Dense(ngf, dtype=d, name="key")(memory))  # [B, T, ngf]
        value = nn.relu(nn.Dense(ngf, dtype=d, name="value")(memory))
        q = h.reshape(b, ih * iw, ngf)
        attn = jnp.einsum("bqd,btd->bqt", q, key, preferred_element_type=jnp.float32)
        if mask is not None:
            attn = jnp.where(mask[:, None, :], NEG_INF, attn)
        attn = jax.nn.softmax(attn, axis=-1)
        mem_out = jnp.einsum("bqt,btd->bqd", attn.astype(d), value).reshape(b, ih, iw, ngf)

        # -- key response --
        gate = jax.nn.sigmoid(
            nn.Conv(1, (1, 1), dtype=d, name="response_gate")(jnp.concatenate([h, mem_out], -1))
        )
        h_new = h * (1.0 - gate) + gate * mem_out
        x = jnp.concatenate([h_new, h_new], axis=-1)
        for i in range(self.r_num):
            x = ResBlockG(ngf * 2, dtype=d, name=f"res{i}")(x, train)
        x = UpBlock(ngf, dtype=d, name="up")(x, train)
        return x, attn.reshape(b, ih, iw, t)


class CounterGNet(nn.Module):
    """Seven-scale out-skip generator (generators.py:207-295)."""

    cfg: GanConfig = GanConfig()
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        z: jax.Array,
        sent_emb: jax.Array,
        word_embs: jax.Array,
        mask: Optional[jax.Array],
        rng: jax.Array,
        train: bool = True,
    ):
        cfg = self.cfg
        ngf = cfg.gf_dim
        d = self.dtype
        c_code, mu, logvar = CANet(cfg.condition_dim, dtype=d, name="ca_net")(sent_emb, rng)
        x = jnp.concatenate([c_code, z], axis=1)
        x = nn.Dense(ngf * 16 * 4 * 4 * 2, use_bias=False, dtype=d, name="fc")(x)
        x = SyncBatchNorm(dtype=d, name="fc_bn")(x, train)
        x = glu(x)
        out = x.reshape(x.shape[0], 4, 4, ngf * 16)

        fake_imgs: List[jax.Array] = [GetImage(dtype=d, name="img_4")(out)]
        attn_maps: List[jax.Array] = []
        mults = (8, 4, 2, 1)
        for i, m in enumerate(mults):  # 4->8->16->32->64
            out = UpBlock(ngf * m, dtype=d, name=f"up_{4 * 2**i}_to_{4 * 2**(i+1)}")(out, train)
            fake_imgs.append(GetImage(dtype=d, name=f"img_{4 * 2**(i+1)}")(out))
        out, a1 = MemoryStage(ngf, cfg.embedding_dim, cfg.r_num, dtype=d, name="mem_64_to_128")(
            out, word_embs, mask, train
        )
        fake_imgs.append(GetImage(dtype=d, name="img_128")(out))
        attn_maps.append(a1)
        out, a2 = MemoryStage(ngf, cfg.embedding_dim, cfg.r_num, dtype=d, name="mem_128_to_256")(
            out, word_embs, mask, train
        )
        fake_imgs.append(GetImage(dtype=d, name="img_256")(out))
        attn_maps.append(a2)
        return fake_imgs, attn_maps, mu, logvar
