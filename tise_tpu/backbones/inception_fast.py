"""Throughput-path InceptionV3 forward: pure JAX over the flax param tree.

The flax module (backbones/inception_v3.py) stays the reference
implementation (used by the f32 --precision highest metric path); this is
the bf16 extraction fast path with two XLA-level restructurings that the
module form can't express cleanly:

  * **BN folding at prep time** — BasicConv2d is conv + frozen-BN + relu
    (reference image_realism/FID/inception.py freezes BN); folding the BN
    scale into the conv kernel removes a per-op f32 rescale pass.
  * **Combined 1x1 branch fan-out** — every Inception block feeds the same
    activation into 2-3 parallel 1x1 convs; measured on v5e these are at the
    HBM roofline, so each extra branch costs a full re-read of x from HBM
    (~0.28 ms at [256,17,17,768] bf16).  Concatenating the folded kernels
    turns them into ONE conv (x read once) + a channel split.

Numerics: identical op sequence otherwise (same conv/pool primitives, f32
bias+relu epilogue); parity vs the flax module is tested to bf16 tolerance
(tests/test_inception.py).  torch pool semantics only (the slim/tf2015
flavors keep the flax path).

Measured dead ends this replaces (so they aren't retried): a standalone
Pallas avg-pool (fusion/layout barrier, -30% end-to-end), whole-block Pallas
InceptionA/C kernels in flat row space with masked-rotate taps
(ops/fused_inception.py — compiles, exact, but 4.2 ms vs XLA's 3.9 for
InceptionC: per-tap dot granularity loses to XLA's native conv lowering),
XLA conv-as-matmul rewrites (a wash).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

BN_EPS = 0.001


def _fold(mod: Dict[str, Any], dtype, in_scale=None, in_shift=None) -> Tuple[jax.Array, jax.Array]:
    """BasicConv2d params -> (BN-folded kernel [kh,kw,cin,cout] dtype,
    bias row [1,cout] f32).

    ``in_scale``/``in_shift`` fold an input affine x = u*s + t (the uint8
    normalize recipe) into the kernel/bias — exact algebra:
    conv(u*s + t) = conv_{k*s}(u) + (sum_hw,i k*t)  (before the BN affine).
    """
    w = jnp.asarray(mod["conv"]["kernel"], jnp.float32)
    inv = jnp.asarray(mod["bn_scale"], jnp.float32) * jax.lax.rsqrt(
        jnp.asarray(mod["bn_var"], jnp.float32) + BN_EPS
    )
    b = jnp.asarray(mod["bn_bias"], jnp.float32) - jnp.asarray(mod["bn_mean"], jnp.float32) * inv
    if in_scale is not None:
        b = b + jnp.einsum("hwio,i->o", w, jnp.asarray(in_shift, jnp.float32)) * inv
        w = w * jnp.asarray(in_scale, jnp.float32)[None, None, :, None]
    return (w * inv).astype(dtype), b.reshape(1, 1, 1, -1)


def _conv(x, w, b, strides=(1, 1), padding="VALID"):
    y = jax.lax.conv_general_dilated(
        x, w, strides, padding, dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    return jnp.maximum(y.astype(jnp.float32) + b, 0.0).astype(x.dtype)


def _max_pool(x, k=3, s=2, pad="VALID"):
    return jax.lax.reduce_window(
        x, -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min,
        jax.lax.max, (1, k, k, 1), (1, s, s, 1), pad,
    )


def fold_tree(params: Dict[str, Any], dtype=jnp.bfloat16, input_recipe: str = None) -> Dict[str, Any]:
    """Pure params -> {"w": {name: (kernel, bias)}, "fc": (w, b)} folding.

    Jittable: ``jax.jit(partial(fold_tree, dtype=d))(params)`` turns the
    ~200 small folding ops into one compiled program — this matters through
    the axon tunnel, where eager per-op dispatch costs minutes of RTT.

    ``input_recipe``: fold that uint8 normalize recipe (ops/preprocess
    RECIPES) into Conv2d_1a — the forward then consumes RAW uint8 images,
    skipping the normalized-tensor materialization (conv operands don't
    take fused producers on TPU; measured ~0.3 ms/256-batch).
    """
    from tise_tpu.ops.preprocess import RECIPES

    p = params["params"] if "params" in params else params
    f = functools.partial(_fold, dtype=dtype)
    w: Dict[str, Tuple[jax.Array, jax.Array]] = {}
    fc = None
    for name, mod in p.items():
        if name == "fc":
            fc = (jnp.asarray(mod["kernel"], jnp.float32).astype(dtype), jnp.asarray(mod["bias"], jnp.float32))
            continue
        if "conv" in mod:  # stem convs
            if name == "Conv2d_1a_3x3" and input_recipe is not None:
                scale, shift = RECIPES[input_recipe]
                w[name] = f(mod, in_scale=scale, in_shift=shift)
            else:
                w[name] = f(mod)
        else:  # Mixed_* blocks: one entry per branch conv
            for bname, bmod in mod.items():
                w[f"{name}.{bname}"] = f(bmod)
    return {"w": w, "fc": fc}


class FastInception:
    """Pre-folded bf16 forward. ``params`` is the flax InceptionV3 tree (or
    pass ``folded=`` a pre-computed/jitted ``fold_tree`` result)."""

    def __init__(self, params: Dict[str, Any] = None, dtype=jnp.bfloat16, folded: Dict[str, Any] = None,
                 input_recipe: str = None):
        self.dtype = dtype
        if folded is None:
            folded = fold_tree(params, dtype, input_recipe)
        self.w = folded["w"]
        self.fc = folded["fc"]
        #: informational: when the fold consumed a recipe, __call__ expects
        #: RAW uint8 (the affine lives in the conv1a weights; strings cannot
        #: ride a jitted fold_tree output)
        self.input_recipe = input_recipe

    def _cat(self, names: Sequence[str]):
        """Concatenate folded 1x1 kernels/biases of several branches."""
        ws = [self.w[n][0] for n in names]
        bs = [self.w[n][1] for n in names]
        return jnp.concatenate(ws, axis=-1), jnp.concatenate(bs, axis=-1)

    # -- blocks -------------------------------------------------------------

    def _fanout(self, x, names: Sequence[str], pool_name: str = None):
        """One combined 1x1 conv for all branch heads (x read once).

        ``pool_name``: the avg-pool branch's 1x1.  A stride-1 avg pool and a
        1x1 conv commute exactly (both linear over independent axes), so the
        pool branch's conv joins the fan-out and the 768-channel input is
        never re-read for pooling — the pool runs on the branch's thin output
        instead.  The bias must be added AFTER the pool (zero edge padding
        would otherwise average the bias with count < 9), and relu after
        that; same algebra as conv(pool(x)) to f32 exactness.
        """
        all_names = tuple(names) + ((pool_name,) if pool_name else ())
        w, b = self._cat(all_names)
        # conv output stays in the compute dtype — an explicit f32 cast on the
        # whole fan-out tensor invites XLA to materialize the f32 buffer
        # (same measured anti-pattern as clip_fast's dense dots); the f32
        # bias+relu epilogue below fuses per slice
        y = jax.lax.conv_general_dilated(
            x, w, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC")
        )
        sizes = [self.w[n][0].shape[-1] for n in all_names]
        offs = np.cumsum(sizes[:-1]).tolist()
        parts = jnp.split(y, offs, axis=-1)
        outs = []
        off = 0
        for i, n in enumerate(names):
            bi = b[..., off : off + sizes[i]]
            outs.append(jnp.maximum(parts[i].astype(jnp.float32) + bi, 0.0).astype(x.dtype))
            off += sizes[i]
        if pool_name:
            s = jax.lax.reduce_window(
                parts[-1].astype(jnp.float32), 0.0, jax.lax.add, (1, 3, 3, 1), (1, 1, 1, 1),
                ((0, 0), (1, 1), (1, 1), (0, 0)),
            )
            bp = jnp.maximum(s * (1.0 / 9.0) + b[..., off:], 0.0).astype(x.dtype)
            outs.append(bp)
        return outs

    def _block_a(self, x, m: str):
        b1, b5, b3, bp = self._fanout(
            x, (f"{m}.branch1x1", f"{m}.branch5x5_1", f"{m}.branch3x3dbl_1"),
            pool_name=f"{m}.branch_pool",
        )
        b5 = _conv(b5, *self.w[f"{m}.branch5x5_2"], padding=((2, 2), (2, 2)))
        b3 = _conv(b3, *self.w[f"{m}.branch3x3dbl_2"], padding=((1, 1), (1, 1)))
        b3 = _conv(b3, *self.w[f"{m}.branch3x3dbl_3"], padding=((1, 1), (1, 1)))
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)

    def _block_b(self, x, m: str):
        b3 = _conv(x, *self.w[f"{m}.branch3x3"], strides=(2, 2))
        bd = _conv(x, *self.w[f"{m}.branch3x3dbl_1"])
        bd = _conv(bd, *self.w[f"{m}.branch3x3dbl_2"], padding=((1, 1), (1, 1)))
        bd = _conv(bd, *self.w[f"{m}.branch3x3dbl_3"], strides=(2, 2))
        return jnp.concatenate([b3, bd, _max_pool(x)], axis=-1)

    def _block_c(self, x, m: str):
        b1, b7, bd, bp = self._fanout(
            x, (f"{m}.branch1x1", f"{m}.branch7x7_1", f"{m}.branch7x7dbl_1"),
            pool_name=f"{m}.branch_pool",
        )
        b7 = _conv(b7, *self.w[f"{m}.branch7x7_2"], padding=((0, 0), (3, 3)))
        b7 = _conv(b7, *self.w[f"{m}.branch7x7_3"], padding=((3, 3), (0, 0)))
        bd = _conv(bd, *self.w[f"{m}.branch7x7dbl_2"], padding=((3, 3), (0, 0)))
        bd = _conv(bd, *self.w[f"{m}.branch7x7dbl_3"], padding=((0, 0), (3, 3)))
        bd = _conv(bd, *self.w[f"{m}.branch7x7dbl_4"], padding=((3, 3), (0, 0)))
        bd = _conv(bd, *self.w[f"{m}.branch7x7dbl_5"], padding=((0, 0), (3, 3)))
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)

    def _block_d(self, x, m: str):
        b3, b7 = self._fanout(x, (f"{m}.branch3x3_1", f"{m}.branch7x7x3_1"))
        b3 = _conv(b3, *self.w[f"{m}.branch3x3_2"], strides=(2, 2))
        b7 = _conv(b7, *self.w[f"{m}.branch7x7x3_2"], padding=((0, 0), (3, 3)))
        b7 = _conv(b7, *self.w[f"{m}.branch7x7x3_3"], padding=((3, 3), (0, 0)))
        b7 = _conv(b7, *self.w[f"{m}.branch7x7x3_4"], strides=(2, 2))
        return jnp.concatenate([b3, b7, _max_pool(x)], axis=-1)

    def _block_e(self, x, m: str):
        b1, b3, bd, bp = self._fanout(
            x, (f"{m}.branch1x1", f"{m}.branch3x3_1", f"{m}.branch3x3dbl_1"),
            pool_name=f"{m}.branch_pool",
        )
        b3 = jnp.concatenate(
            [
                _conv(b3, *self.w[f"{m}.branch3x3_2a"], padding=((0, 0), (1, 1))),
                _conv(b3, *self.w[f"{m}.branch3x3_2b"], padding=((1, 1), (0, 0))),
            ],
            axis=-1,
        )
        bd = _conv(bd, *self.w[f"{m}.branch3x3dbl_2"], padding=((1, 1), (1, 1)))
        bd = jnp.concatenate(
            [
                _conv(bd, *self.w[f"{m}.branch3x3dbl_3a"], padding=((0, 0), (1, 1))),
                _conv(bd, *self.w[f"{m}.branch3x3dbl_3b"], padding=((1, 1), (0, 0))),
            ],
            axis=-1,
        )
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)

    # -- trunk --------------------------------------------------------------

    def __call__(self, x: jax.Array, endpoints: Sequence[str] = ("pool3",)) -> Dict[str, jax.Array]:
        from tise_tpu.backbones.inception_v3 import ENDPOINTS

        want = set(endpoints)
        last = max(ENDPOINTS.index(e) for e in want)
        out: Dict[str, jax.Array] = {}

        x = x.astype(self.dtype)
        x = _conv(x, *self.w["Conv2d_1a_3x3"], strides=(2, 2))
        x = _conv(x, *self.w["Conv2d_2a_3x3"])
        x = _conv(x, *self.w["Conv2d_2b_3x3"], padding=((1, 1), (1, 1)))
        x = _max_pool(x)
        out["maxpool1"] = x
        if last == 0:
            return out

        x = _conv(x, *self.w["Conv2d_3b_1x1"])
        x = _conv(x, *self.w["Conv2d_4a_3x3"])
        x = _max_pool(x)
        out["maxpool2"] = x
        if last == 1:
            return out

        for m in ("Mixed_5b", "Mixed_5c", "Mixed_5d"):
            x = self._block_a(x, m)
        x = self._block_b(x, "Mixed_6a")
        for m in ("Mixed_6b", "Mixed_6c", "Mixed_6d", "Mixed_6e"):
            x = self._block_c(x, m)
        out["mixed6e"] = x
        if last == 2:
            return out

        x = self._block_d(x, "Mixed_7a")
        x = self._block_e(x, "Mixed_7b")
        x = self._block_e(x, "Mixed_7c")
        x = jnp.mean(x.astype(jnp.float32), axis=(1, 2)).astype(self.dtype)
        out["pool3"] = x
        if last == 3:
            return out

        w, b = self.fc
        out["logits"] = (x @ w + b).astype(self.dtype)
        return out
