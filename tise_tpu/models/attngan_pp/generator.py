"""AttnGAN++ generator (reference: AttnGAN++/generators.py).

G_NET (:132-179): CA_NET conditioning augmentation -> INIT_STAGE (fc to 4x4,
four upsamples to 64px) -> two NEXT_STAGEs (spatial word attention + residual
+ upsample) emitting 64/128/256 px images through tanh conv heads.

Config defaults follow miscc/config.py: GF_DIM=128 (low default; eval configs
use the published sizes), Z_DIM=100, CONDITION_DIM=100, EMBEDDING_DIM=256,
R_NUM=2, BRANCH_NUM=3.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from tise_tpu.models.attngan_pp.attention import SpatialAttention
from tise_tpu.models.attngan_pp.layers import (
    Block3x3Relu,
    ResBlockG,
    SyncBatchNorm,
    UpBlock,
    glu,
)


@dataclass(frozen=True)
class GanConfig:
    """Model dims (reference miscc/config.py:50-64 defaults)."""

    gf_dim: int = 128  # GAN.GF_DIM
    df_dim: int = 64  # GAN.DF_DIM
    z_dim: int = 100  # GAN.Z_DIM
    condition_dim: int = 100  # GAN.CONDITION_DIM
    embedding_dim: int = 256  # TEXT.EMBEDDING_DIM
    r_num: int = 2  # GAN.R_NUM
    branch_num: int = 3  # TREE.BRANCH_NUM
    words_num: int = 18  # TEXT.WORDS_NUM
    #: rematerialize the G stages in the backward pass (jax.checkpoint);
    #: trades ~1.3x FLOPs for the 64-256px stage activations — enables
    #: gf_dim>=256 at batch 64 on one chip.  TPU-native option, no
    #: reference equivalent (torch keeps all activations).
    remat: bool = False


class CANet(nn.Module):
    """Conditioning augmentation: fc->GLU->(mu, logvar)->reparametrise
    (generators.py:11-39)."""

    condition_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, sent_emb: jax.Array, rng: jax.Array) -> Tuple[jax.Array, jax.Array, jax.Array]:
        x = nn.Dense(self.condition_dim * 4, dtype=self.dtype, name="fc")(sent_emb)
        x = glu(x)
        mu, logvar = x[:, : self.condition_dim], x[:, self.condition_dim :]
        std = jnp.exp(0.5 * logvar)
        eps = jax.random.normal(rng, std.shape, dtype=std.dtype)
        return mu + eps * std, mu, logvar


class InitStage(nn.Module):
    """fc -> 4x4 x 16gf -> four upsamples -> 64x64 x gf (generators.py:42-78)."""

    ngf: int  # = 16 * gf_dim
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, z: jax.Array, c: jax.Array, train: bool) -> jax.Array:
        x = jnp.concatenate([c, z], axis=1)
        x = nn.Dense(self.ngf * 4 * 4 * 2, use_bias=False, dtype=self.dtype, name="fc")(x)
        x = SyncBatchNorm(dtype=self.dtype, name="fc_bn")(x, train)
        x = glu(x)
        x = x.reshape(x.shape[0], 4, 4, self.ngf)
        x = UpBlock(self.ngf // 2, dtype=self.dtype, name="up1")(x, train)
        x = UpBlock(self.ngf // 4, dtype=self.dtype, name="up2")(x, train)
        x = UpBlock(self.ngf // 8, dtype=self.dtype, name="up3")(x, train)
        x = UpBlock(self.ngf // 16, dtype=self.dtype, name="up4")(x, train)
        return x  # [B, 64, 64, ngf/16]


class NextStage(nn.Module):
    """Spatial attention + residual blocks + upsample (generators.py:81-118)."""

    ngf: int
    r_num: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self, h: jax.Array, word_embs: jax.Array, mask: Optional[jax.Array], train: bool
    ) -> Tuple[jax.Array, jax.Array]:
        attn_out, attn = SpatialAttention(self.ngf, dtype=self.dtype, name="attn")(h, word_embs, mask)
        x = jnp.concatenate([attn_out, h], axis=-1)  # [B, ih, iw, 2*ngf]
        for i in range(self.r_num):
            x = ResBlockG(self.ngf * 2, dtype=self.dtype, name=f"res{i}")(x, train)
        x = UpBlock(self.ngf, dtype=self.dtype, name="up")(x, train)
        return x, attn


class GetImage(nn.Module):
    """conv3x3 -> tanh image head (generators.py:121-129)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, h: jax.Array) -> jax.Array:
        x = nn.Conv(3, (3, 3), padding=((1, 1), (1, 1)), use_bias=False, dtype=self.dtype, name="img")(h)
        return jnp.tanh(x)


class GNet(nn.Module):
    """Multi-scale generator; returns ([imgs 64/128/256 NHWC], [attn maps],
    mu, logvar)."""

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
        Init, Next = InitStage, NextStage
        if cfg.remat:  # checkpoint stage boundaries (train arg is static;
            # nn.remat counts self as argument 0)
            Init = nn.remat(InitStage, static_argnums=(3,))
            Next = nn.remat(NextStage, static_argnums=(4,))
        c_code, mu, logvar = CANet(cfg.condition_dim, dtype=self.dtype, name="ca_net")(sent_emb, rng)
        fake_imgs: List[jax.Array] = []
        attn_maps: List[jax.Array] = []

        h = Init(ngf * 16, dtype=self.dtype, name="h_net1")(z, c_code, train)
        fake_imgs.append(GetImage(dtype=self.dtype, name="img_net1")(h))
        if cfg.branch_num > 1:
            h, a1 = Next(ngf, cfg.r_num, dtype=self.dtype, name="h_net2")(h, word_embs, mask, train)
            fake_imgs.append(GetImage(dtype=self.dtype, name="img_net2")(h))
            attn_maps.append(a1)
        if cfg.branch_num > 2:
            h, a2 = Next(ngf, cfg.r_num, dtype=self.dtype, name="h_net3")(h, word_embs, mask, train)
            fake_imgs.append(GetImage(dtype=self.dtype, name="img_net3")(h))
            attn_maps.append(a2)
        return fake_imgs, attn_maps, mu, logvar
