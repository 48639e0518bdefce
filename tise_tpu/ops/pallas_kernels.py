"""Pallas TPU kernels for the FID matrix-sqrt path.

The north-star design (BASELINE.json) lowers the FID matrix square root to a
Newton–Schulz Pallas kernel.  The iteration's inner step is
``T = 0.5 * (3I - Z @ Y)`` followed by two plain matmuls; this module
provides the fused ``alpha*I + beta*(A @ B)`` kernel (epilogue folded into
the output tile) plus the NS driver built on it.  Off-TPU the kernels run
through the Pallas interpreter so the numerics are testable on CPU.

Measured honesty note (v5e, 2048x2048, 30 iters): this hand-written kernel
converges to the same trace as the XLA formulation but is ~35x slower
(single-buffered 256-tiles vs XLA's pipelined matmuls) — XLA already emits
near-optimal code for dense matmul chains, so ``ops.sqrtm`` keeps the XLA
Newton–Schulz ("ns") as the device-native production path, "eigh"/"scipy" as
the float64 parity oracles, and exposes this kernel as "ns-pallas".
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 256  # f32 tile: multiples of (8, 128)


def _epilogue_matmul_kernel(a_ref, b_ref, o_ref, acc_ref, *, k_steps, alpha, beta):
    """o = alpha * I + beta * (a @ b), accumulated over the k grid axis."""
    @pl.when(pl.program_id(2) == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jnp.dot(a_ref[:], b_ref[:], preferred_element_type=jnp.float32)

    @pl.when(pl.program_id(2) == k_steps - 1)
    def _finish():
        i = pl.program_id(0)
        j = pl.program_id(1)
        acc = acc_ref[:] * beta
        # add alpha on the global diagonal (only diagonal tiles have any)
        rows = jax.lax.broadcasted_iota(jnp.int32, acc.shape, 0) + i * acc.shape[0]
        cols = jax.lax.broadcasted_iota(jnp.int32, acc.shape, 1) + j * acc.shape[1]
        o_ref[:] = jnp.where(rows == cols, acc + alpha, acc)


def epilogue_matmul(a: jax.Array, b: jax.Array, alpha: float = 3.0, beta: float = -1.0, interpret: bool = False):
    """alpha * I + beta * (a @ b) as one Pallas kernel (square f32 inputs,
    dims padded to the 256 tile).  Off-TPU callers must wrap in
    ``pltpu.force_tpu_interpret_mode()`` (the plain interpret=True path lacks
    a CPU program_id lowering in this jax version)."""
    n = a.shape[0]
    n_pad = -(-n // TILE) * TILE
    if n_pad != n:
        a = jnp.pad(a, ((0, n_pad - n), (0, n_pad - n)))
        b = jnp.pad(b, ((0, n_pad - n), (0, n_pad - n)))
    grid = (n_pad // TILE, n_pad // TILE, n_pad // TILE)
    out = pl.pallas_call(
        functools.partial(_epilogue_matmul_kernel, k_steps=grid[2], alpha=alpha, beta=beta),
        out_shape=jax.ShapeDtypeStruct((n_pad, n_pad), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE, TILE), lambda i, j, k: (i, k)),
            pl.BlockSpec((TILE, TILE), lambda i, j, k: (k, j)),
        ],
        out_specs=pl.BlockSpec((TILE, TILE), lambda i, j, k: (i, j)),
        scratch_shapes=[pltpu.VMEM((TILE, TILE), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")
        ),
        interpret=interpret,
    )(a.astype(jnp.float32), b.astype(jnp.float32))
    return out[:n, :n]


def newton_schulz_sqrtm_pallas(a: jax.Array, iters: int = 30, interpret: Optional[bool] = None) -> jax.Array:
    """Newton–Schulz sqrt with the fused 3I - Z@Y Pallas step.

    Y_{k+1} = Y_k (0.5 T);  Z_{k+1} = (0.5 T) Z_k;  T = 3I - Z_k Y_k.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"

    @jax.jit
    def run(a):
        n = a.shape[0]
        norm = jnp.sqrt(jnp.sum(a * a))
        safe = jnp.maximum(norm, 1e-12)  # sqrtm(~0) = ~0, not NaN
        y = a / safe
        z = jnp.eye(n, dtype=jnp.float32)

        def body(carry, _):
            y, z = carry
            t = epilogue_matmul(z, y, alpha=1.5, beta=-0.5)  # 0.5*(3I - Z@Y)
            y = jnp.dot(y, t, preferred_element_type=jnp.float32)
            z = jnp.dot(t, z, preferred_element_type=jnp.float32)
            return (y, z), None

        (y, _z), _ = jax.lax.scan(body, (y, z), None, length=iters)
        return jnp.where(norm > 1e-12, y * jnp.sqrt(norm), jnp.zeros_like(y))

    a = a.astype(jnp.float32)
    if interpret:
        with pltpu.force_tpu_interpret_mode():
            return run(a)
    return run(a)
