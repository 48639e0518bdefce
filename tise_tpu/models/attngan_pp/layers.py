"""Building blocks for the AttnGAN++/CounterModel GANs (Flax, NHWC).

Reference blocks (AttnGAN++/layers.py, spectral.py):
  * GLU halves channels: a * sigmoid(b) (:7-15)
  * upBlock: nearest 2x upsample -> conv3x3 -> SyncBN -> GLU (:29-36)
  * ResBlock: conv/SyncBN/GLU/conv/SyncBN + skip (:45-60)
  * D blocks: spectral-normalised convs + LeakyReLU(0.2) (:64-90)
  * SpectralNorm: 1-step power iteration on W viewed as (out, -1)
    (spectral.py:19-31) — THE AttnGAN++ novelty (spectral norm on D).

TPU translation of SyncBatchNorm: the reference synchronises BN moments
across GPU replicas with a master/slave thread queue
(sync_batchnorm/comm.py:57-137).  Under pjit with the batch sharded over the
``data`` mesh axis, ``flax.linen.BatchNorm(axis_name="data")`` computes the
same cross-replica moments with a single psum — SyncBN degenerates to a
collective the compiler schedules on ICI.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

#: mesh axis BatchNorm statistics are averaged over (SyncBN replacement).
BN_AXIS = "data"


def glu(x: jax.Array) -> jax.Array:
    a, b = jnp.split(x, 2, axis=-1)
    return a * jax.nn.sigmoid(b)


class SyncBatchNorm(nn.Module):
    """Cross-replica BatchNorm.

    Under pjit/GSPMD with the batch axis sharded over the mesh, the moment
    reductions inside ``nn.BatchNorm`` are *global* — XLA inserts the psum
    over ICI automatically, which is exactly the semantics the reference
    builds by hand with thread queues (sync_batchnorm/batchnorm.py:49-117).
    No axis_name plumbing is needed; the name records the intent.
    """

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        return nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.dtype,
            name="bn",
        )(x)


def nearest_upsample(x: jax.Array, factor: int = 2) -> jax.Array:
    b, h, w, c = x.shape
    x = x[:, :, None, :, None, :]
    x = jnp.broadcast_to(x, (b, h, factor, w, factor, c))
    return x.reshape(b, h * factor, w * factor, c)


class UpBlock(nn.Module):
    """nearest 2x -> conv3x3(out*2) -> BN -> GLU (layers.py:29-36)."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        x = nearest_upsample(x)
        x = nn.Conv(self.features * 2, (3, 3), padding=((1, 1), (1, 1)), use_bias=False, dtype=self.dtype)(x)
        x = SyncBatchNorm(dtype=self.dtype)(x, train)
        return glu(x)


class Block3x3Relu(nn.Module):
    """conv3x3(out*2) -> BN -> GLU, keeps spatial size (layers.py:40-42)."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        x = nn.Conv(self.features * 2, (3, 3), padding=((1, 1), (1, 1)), use_bias=False, dtype=self.dtype)(x)
        x = SyncBatchNorm(dtype=self.dtype)(x, train)
        return glu(x)


class ResBlockG(nn.Module):
    """Generator residual block (layers.py:45-60)."""

    channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        y = nn.Conv(self.channels * 2, (3, 3), padding=((1, 1), (1, 1)), use_bias=False, dtype=self.dtype)(x)
        y = SyncBatchNorm(dtype=self.dtype, name="bn1")(y, train)
        y = glu(y)
        y = nn.Conv(self.channels, (3, 3), padding=((1, 1), (1, 1)), use_bias=False, dtype=self.dtype)(y)
        y = SyncBatchNorm(dtype=self.dtype, name="bn2")(y, train)
        return x + y


class SpectralConv(nn.Module):
    """Conv whose kernel is divided by its leading singular value, estimated
    by one power-iteration step per call (spectral.py:19-31 semantics: u/v are
    non-trainable state, gradient flows through W / sigma only)."""

    features: int
    kernel: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    padding: Any = ((1, 1), (1, 1))
    use_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, update_stats: bool) -> jax.Array:
        kh, kw = self.kernel
        in_ch = x.shape[-1]
        w = self.param(
            "kernel", nn.initializers.lecun_normal(), (kh, kw, in_ch, self.features)
        )
        # torch views OIHW weight as (out, -1); HWIO -> (out, kh*kw*in)
        w_mat = w.transpose(3, 0, 1, 2).reshape(self.features, -1)
        u_var = self.variable(
            "spectral", "u", lambda: jax.random.normal(jax.random.PRNGKey(0), (self.features,))
        )
        u = u_var.value
        u = u / (jnp.linalg.norm(u) + 1e-12)

        def l2n(v):
            return v / (jnp.linalg.norm(v) + 1e-12)

        v = l2n(jax.lax.stop_gradient(w_mat).T @ u)
        u_new = l2n(jax.lax.stop_gradient(w_mat) @ v)
        if update_stats and not self.is_initializing():
            u_var.value = u_new
        sigma = u_new @ (w_mat @ v)  # grad flows through w_mat only
        w_norm = (w / sigma).astype(self.dtype)

        out = jax.lax.conv_general_dilated(
            x.astype(self.dtype),
            w_norm,
            window_strides=self.strides,
            padding=self.padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.features,))
            out = out + b.astype(self.dtype)
        return out


class DownBlockD(nn.Module):
    """Spectral conv4x4 stride2 + LeakyReLU(0.2) (layers.py:70-74)."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, update_stats: bool) -> jax.Array:
        x = SpectralConv(self.features, (4, 4), (2, 2), ((1, 1), (1, 1)), dtype=self.dtype)(x, update_stats)
        return nn.leaky_relu(x, 0.2)


class Block3x3LeakyD(nn.Module):
    """Spectral conv3x3 + LeakyReLU(0.2), keeps size (layers.py:64-67)."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, update_stats: bool) -> jax.Array:
        x = SpectralConv(self.features, (3, 3), (1, 1), ((1, 1), (1, 1)), dtype=self.dtype)(x, update_stats)
        return nn.leaky_relu(x, 0.2)


class EncodeBy16(nn.Module):
    """Four stride-2 spectral convs: image -> x/16 spatial, 8*ndf channels
    (layers.py:78-90)."""

    ndf: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, update_stats: bool) -> jax.Array:
        for i, mult in enumerate((1, 2, 4, 8)):
            x = DownBlockD(self.ndf * mult, dtype=self.dtype, name=f"down{i}")(x, update_stats)
        return x
