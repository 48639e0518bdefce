"""Mosaic/Pallas capability probe — rerun once per jaxlib upgrade.

ROADMAP.md's Pallas dead ends (fused stem kernel, minor-dim DMA alignment)
were established with throwaway /tmp scripts; this committed probe re-tests
each restriction so a jaxlib/Mosaic upgrade that lifts one is noticed
immediately (ROADMAP "still-open ideas" #3).

Each probe compiles (NOT interpret mode) and runs a minimal kernel on the
default backend, printing PASS/FAIL per capability:

  lane_split      in-kernel reshape [44, 900] -> [44, 300, 3] (splits the
                  128-lane minor dim) — blocks the fused-stem patch layout
  dma_minor27     BlockSpec minor dim 27 (< 128) — blocks unpadded im2col
                  patch DMA (padding to 128 costs 968 MB/batch)
  strided_slice   in-kernel x[:, ::2] strided slice
  lane_concat     concat along lanes of two differently-produced tiles
  scratch_stage   staging via VMEM scratch stores at 32-lane offsets
                  (the known-working fallback — should PASS)

Usage: python tools/mosaic_probe.py
"""

from __future__ import annotations

import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _run(name, fn):
    try:
        fn()
        print(f"{name:14s} PASS")
        return True
    except Exception as e:  # noqa: BLE001 — probe reports, never raises
        msg = str(e).split("\n")[0][:110]
        print(f"{name:14s} FAIL  {type(e).__name__}: {msg}")
        if os.environ.get("MOSAIC_PROBE_VERBOSE"):
            traceback.print_exc()
        return False


def lane_split():
    def kernel(x_ref, o_ref):
        x = x_ref[...]  # [44, 900]
        o_ref[...] = x.reshape(44, 300, 3).sum(axis=-1)

    x = jnp.ones((44, 900), jnp.float32)
    out = pl.pallas_call(
        kernel, out_shape=jax.ShapeDtypeStruct((44, 300), jnp.float32)
    )(x)
    np.testing.assert_allclose(np.asarray(out), 3.0)


def dma_minor27():
    def kernel(x_ref, o_ref):
        o_ref[...] = x_ref[...] * 2.0

    x = jnp.ones((8, 128, 27), jnp.float32)
    out = pl.pallas_call(
        kernel,
        grid=(4,),
        in_specs=[pl.BlockSpec((2, 128, 27), lambda i: (i, 0, 0))],
        out_specs=pl.BlockSpec((2, 128, 27), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((8, 128, 27), jnp.float32),
    )(x)
    np.testing.assert_allclose(np.asarray(out), 2.0)


def strided_slice():
    def kernel(x_ref, o_ref):
        o_ref[...] = x_ref[...][:, ::2]

    x = jnp.arange(8 * 256, dtype=jnp.float32).reshape(8, 256)
    out = pl.pallas_call(
        kernel, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32)
    )(x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x)[:, ::2])


def lane_concat():
    def kernel(x_ref, o_ref):
        x = x_ref[...]
        a = x * 2.0  # plain tile
        b = x.T  # transposed tile: different produced layout
        o_ref[...] = jnp.concatenate([a, b], axis=1)

    x = jnp.ones((128, 128), jnp.float32)
    out = pl.pallas_call(
        kernel, out_shape=jax.ShapeDtypeStruct((128, 256), jnp.float32)
    )(x)
    np.testing.assert_allclose(np.asarray(out)[:, :128], 2.0)
    np.testing.assert_allclose(np.asarray(out)[:, 128:], 1.0)


def scratch_stage():
    def kernel(x_ref, o_ref, scratch):
        x = x_ref[...]
        scratch[:, 0:32] = x[:, 0:32] * 2.0
        scratch[:, 32:64] = x[:, 32:64] * 3.0
        o_ref[...] = scratch[...]

    x = jnp.ones((8, 64), jnp.float32)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, 64), jnp.float32),
        scratch_shapes=[pltpu.VMEM((8, 64), jnp.float32)],
    )(x)
    np.testing.assert_allclose(np.asarray(out)[:, :32], 2.0)
    np.testing.assert_allclose(np.asarray(out)[:, 32:], 3.0)


def main():
    import jaxlib

    print(f"jax {jax.__version__} / jaxlib {jaxlib.__version__} / backend {jax.default_backend()}")
    results = {
        name: _run(name, fn)
        for name, fn in [
            ("lane_split", lane_split),
            ("dma_minor27", dma_minor27),
            ("strided_slice", strided_slice),
            ("lane_concat", lane_concat),
            ("scratch_stage", scratch_stage),
        ]
    }
    lifted = [n for n, ok in results.items() if ok and n != "scratch_stage"]
    if lifted:
        print(f"restrictions LIFTED since last probe: {lifted} — revisit ROADMAP dead ends")


if __name__ == "__main__":
    main()
