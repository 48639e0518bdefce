"""3x3 stride-1 average pooling, TPU-tuned.

Every Inception A/C/E block runs a 3x3/s1/p1 average pool on its widest
tensor (torchvision pool branch semantics; slim ops.avg_pool for the IS*
flavors).  Measured on v5e at batch 256 bf16:

  * ``lax.reduce_window`` (flax ``nn.avg_pool``): 2.17 ms @17x17x768,
    3.43 ms @35x35x288 — ~8x off the memory-bound ideal.
  * XLA shifted-add formulation: WORSE (4.99 / 14.7 ms) — XLA materialises
    every padded/shifted intermediate in HBM.
  * The Pallas kernel here keeps the 9-tap stencil in VMEM: one uint/bf16
    read + one write of HBM per element.

Semantics are exact for both reference flavors:
  * ``count_include_pad=True``  (torch avg_pool2d): divide by 9 everywhere.
  * ``count_include_pad=False`` (TF avg_pool SAME): divide by the in-bounds
    tap count cnt_h(i) * cnt_w(j) (slim ops.py:368 semantics).

Dispatch is per-lowering-platform (``jax.lax.platform_dependent``): TPU takes
the Pallas kernel, every other backend (CPU tests, interpret) takes
``lax.reduce_window``.  NOTE the Pallas path assumes per-device shapes — run
it under ``shard_map`` (metrics/extractor.py) rather than relying on pjit
sharding propagation through a custom call.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _edge_inv(n: int, include_pad: bool) -> np.ndarray:
    """1 / (in-bounds taps) per position (1/3 inside, 1/2 at edges) — or the
    constant 1/3 when padding counts toward the divisor."""
    c = np.full((n,), 1.0 / 3.0, np.float32)
    if not include_pad and n >= 1:
        c[0] = 0.5
        c[-1] = 0.5
        if n == 1:  # single in-bounds tap: both "edges" are the same element
            c[0] = 1.0
    return c


def _pool_kernel(x_ref, invh_ref, invw_ref, o_ref):
    """One batch-block: 9-tap box sum via two separable 3-tap passes, all in
    VMEM.  x_ref [nb, H, W, C]; invh [H, 1]; invw [W, 1] (f32).  The block is
    sized to amortise per-grid-step overhead; images are processed one at a
    time in an inner loop so only single-image f32 temporaries live on the
    stack."""
    nb, h, w, c = x_ref.shape

    def one(i, _):
        x = x_ref[i].astype(jnp.float32)  # [H, W, C]
        zrow = jnp.zeros((1, w, c), jnp.float32)
        xh = jnp.concatenate([zrow, x, zrow], axis=0)
        sh = xh[:-2] + xh[1:-1] + xh[2:]  # [H, W, C]
        sh = sh * invh_ref[:].reshape(h, 1, 1)
        zcol = jnp.zeros((h, 1, c), jnp.float32)
        sw = jnp.concatenate([zcol, sh, zcol], axis=1)
        out = sw[:, :-2] + sw[:, 1:-1] + sw[:, 2:]
        out = out * invw_ref[:].reshape(1, w, 1)
        o_ref[i] = out.astype(o_ref.dtype)
        return _

    jax.lax.fori_loop(0, nb, one, 0)


@functools.partial(jax.jit, static_argnames=("count_include_pad",))
def _pallas_pool(x: jax.Array, count_include_pad: bool) -> jax.Array:
    b, h, w, c = x.shape
    # block size: double-buffered bf16 in+out blocks (4 copies) plus ~5
    # single-image f32 stage tensors must fit the 16 MB scoped-vmem limit
    per_img = h * w * c * x.dtype.itemsize
    budget = (12 << 20) - 5 * h * w * c * 4
    nb = max(1, min(b, budget // max(4 * per_img, 1)))
    invh = jnp.asarray(_edge_inv(h, count_include_pad)[:, None])
    invw = jnp.asarray(_edge_inv(w, count_include_pad)[:, None])
    return pl.pallas_call(
        _pool_kernel,
        grid=(pl.cdiv(b, nb),),
        in_specs=[
            pl.BlockSpec((nb, h, w, c), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((h, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((w, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((nb, h, w, c), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
    )(x, invh, invw)


def _xla_pool(x: jax.Array, count_include_pad: bool) -> jax.Array:
    """reduce_window reference path (flax nn.avg_pool semantics)."""
    import flax.linen as nn

    return nn.avg_pool(
        x, (3, 3), strides=(1, 1), padding=((1, 1), (1, 1)), count_include_pad=count_include_pad
    )


def avg_pool_3x3_s1_p1(x: jax.Array, count_include_pad: bool = True) -> jax.Array:
    """NHWC 3x3 stride-1 pad-1 average pool.

    Defaults to ``lax.reduce_window``: although the standalone Pallas kernel
    is 1.35x faster in isolation (1.60 vs 2.17 ms @[256,17,17,768]), swapping
    it into the InceptionV3 trunk REGRESSED end-to-end throughput 3848 ->
    2676 img/s — the tpu_custom_call is a fusion/layout barrier that forces
    relayout copies of every neighbouring activation.  Lesson recorded here:
    Pallas pays off for whole fused sections, not single mid-graph ops.
    ``use_pallas=True`` keeps the measured kernel available for fused-section
    work.
    """
    if use_pallas_pool():
        return jax.lax.platform_dependent(
            x,
            tpu=functools.partial(_pallas_pool, count_include_pad=count_include_pad),
            default=functools.partial(_xla_pool, count_include_pad=count_include_pad),
        )
    return _xla_pool(x, count_include_pad)


_USE_PALLAS_POOL = False


def use_pallas_pool(enable: bool | None = None) -> bool:
    """Get/set the experiment toggle for the standalone Pallas pool."""
    global _USE_PALLAS_POOL
    if enable is not None:
        _USE_PALLAS_POOL = enable
    return _USE_PALLAS_POOL
