"""Throughput-path CLIP ViT-B/32 image tower: pure JAX over the flax tree.

The flax module (backbones/clip_vit.py) stays the reference implementation;
this is the bf16 extraction fast path with the XLA-level restructurings that
measured faster on v5e (batch 256, in-jit microbenchmarks):

  * dense ops on an explicitly flattened [B*T, D] — XLA tiles the 3-D
    [B, 50, D] form as separate free dims and pads T=50 per tile
    (qkv 0.73 -> 0.61 ms),
  * single-pass LayerNorm (mean / E[x^2] in one sweep, 0.50 -> 0.41 ms),
  * attention in [B, T, H, d] layout without explicit head transposes,
  * patchify as reshape + one matmul instead of a stride-32 conv.

Parity vs the flax module is tested to bf16 tolerance
(tests/test_text_backbones.py); the flax tower itself is torch-parity
tested against torch.nn.MultiheadAttention (tests/torch_clip_ref.py).
Reference: text_relevance/RP_coco.py:31 / positional_alignment/PA.py:30
(clip.load("ViT-B/32")).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

LN_EPS = 1e-5


def _ln(xf: jax.Array, scale, bias, dtype):
    """Single-pass LayerNorm over the last axis of [M, D] (f32 math)."""
    x = xf.astype(jnp.float32)
    m = jnp.mean(x, axis=-1, keepdims=True)
    v = jnp.mean(x * x, axis=-1, keepdims=True) - m * m
    y = (x - m) * jax.lax.rsqrt(v + LN_EPS)
    return (y * scale + bias).astype(dtype)


def fold_tree(params: Dict[str, Any], dtype=jnp.bfloat16, layers: int = 12,
              input_recipe: str = None) -> Dict[str, Any]:
    """Pure params -> pre-cast tensor tree.  Jittable (see
    inception_fast.fold_tree for why that matters through the axon tunnel).

    ``input_recipe``: fold that uint8 normalize recipe into the patchify
    matmul (x = u*s_c + t_c  =>  rows @ (s-scaled W) + (t-row @ W)) so the
    forward consumes RAW uint8 and the normalized tensor never materializes.
    """
    p = params["params"]["visual"] if "params" in params else params["visual"]
    d = dtype
    k = jnp.asarray(p["conv1"]["kernel"], jnp.float32)  # [32,32,3,768]
    width = k.shape[-1]
    wpatch = k.reshape(-1, width)
    bpatch = None
    if input_recipe is not None:
        from tise_tpu.ops.preprocess import RECIPES

        scale, shift = RECIPES[input_recipe]
        reps = wpatch.shape[0] // 3
        srow = jnp.tile(jnp.asarray(scale, jnp.float32), reps)  # channel = i % 3
        trow = jnp.tile(jnp.asarray(shift, jnp.float32), reps)
        bpatch = trow @ wpatch
        wpatch = wpatch * srow[:, None]
    out = dict(
        bpatch=bpatch,
        # patchify-as-matmul: rows are the conv's im2col patches [p*p*3]
        wpatch=wpatch.astype(d),
        cls=jnp.asarray(p["class_embedding"], jnp.float32),
        pos=jnp.asarray(p["positional_embedding"], jnp.float32),
        ln_pre=(jnp.asarray(p["ln_pre"]["scale"], jnp.float32),
                jnp.asarray(p["ln_pre"]["bias"], jnp.float32)),
        ln_post=(jnp.asarray(p["ln_post"]["scale"], jnp.float32),
                 jnp.asarray(p["ln_post"]["bias"], jnp.float32)),
        proj=jnp.asarray(p["proj"], jnp.float32).astype(d),
        blocks=[],
    )
    for i in range(layers):
        b = p["transformer"][f"resblocks_{i}"]
        out["blocks"].append(dict(
            ln1=(jnp.asarray(b["ln_1"]["scale"], jnp.float32),
                 jnp.asarray(b["ln_1"]["bias"], jnp.float32)),
            ln2=(jnp.asarray(b["ln_2"]["scale"], jnp.float32),
                 jnp.asarray(b["ln_2"]["bias"], jnp.float32)),
            wqkv=jnp.asarray(b["attn"]["in_proj"]["kernel"], jnp.float32).astype(d),
            bqkv=jnp.asarray(b["attn"]["in_proj"]["bias"], jnp.float32),
            wo=jnp.asarray(b["attn"]["out_proj"]["kernel"], jnp.float32).astype(d),
            bo=jnp.asarray(b["attn"]["out_proj"]["bias"], jnp.float32),
            w1=jnp.asarray(b["mlp_c_fc"]["kernel"], jnp.float32).astype(d),
            b1=jnp.asarray(b["mlp_c_fc"]["bias"], jnp.float32),
            w2=jnp.asarray(b["mlp_c_proj"]["kernel"], jnp.float32).astype(d),
            b2=jnp.asarray(b["mlp_c_proj"]["bias"], jnp.float32),
        ))
    return out


class FastCLIPVisual:
    """Pre-cast bf16 image-tower forward. ``params`` is the flax CLIP tree
    (clip_vit.CLIP / params_from_openai_state_dict layout); or pass
    ``folded=`` a pre-computed/jitted ``fold_tree`` result."""

    def __init__(self, params: Dict[str, Any] = None, dtype=jnp.bfloat16, layers: int = 12,
                 heads: int = 12, patch: int = 32, folded: Dict[str, Any] = None,
                 input_recipe: str = None):
        d = dtype
        self.dtype = d
        self.heads = heads
        self.patch = patch
        if folded is None:
            folded = fold_tree(params, dtype, layers, input_recipe)
        self.wpatch = folded["wpatch"]
        self.width = self.wpatch.shape[-1]
        self.cls = folded["cls"]
        self.pos = folded["pos"]
        self.ln_pre = folded["ln_pre"]
        self.ln_post = folded["ln_post"]
        self.proj = folded["proj"]
        self.blocks = folded["blocks"]
        #: when bpatch is set the fold consumed a recipe and __call__
        #: expects RAW uint8
        self.input_recipe = input_recipe
        self.bpatch = folded.get("bpatch")

    #: images stacked per attention matmul (block-diagonal -inf mask keeps
    #: per-image attention EXACT: exp(-inf)=0).  T=50 leaves the MXU's
    #: 128-row tiles 39% full and the (b,h)-batched [50,64]x[64,50] matmuls
    #: latency-bound — measured on v5e (B=256 tower): pack 1: 30.5 ms,
    #: 2: 25.6, **4: 25.0**, 8: 29.9 (FLOP waste overtakes).  The win is
    #: ~5.5 ms of the tower's 30; identity-ablation puts total attention
    #: cost at 16 ms, so further gains need a layout XLA can't undo.
    attn_pack: int = 4

    def _attention(self, qkv: jax.Array, b: int, t: int) -> jax.Array:
        """qkv rows [B*T, 3*D] -> attention output rows [B*T, D]."""
        d = self.dtype
        dm = self.width
        h = self.heads
        hd = dm // h
        p = max(g for g in (self.attn_pack, 2, 1) if b % g == 0)
        qkv = qkv.reshape(b // p, p * t, 3, h, hd)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        # scores materialize in the compute dtype (halves the softmax's HBM
        # traffic: tower 24.7 -> 21.7 ms at bf16); the softmax itself still
        # reduces in f32.  In f32 mode this is exact.
        s = jnp.einsum("bqhd,bkhd->bhqk", q * (hd ** -0.5), k)
        if p > 1:  # kill cross-image attention inside the packed rows
            blk = jnp.arange(p * t) // t
            s = jnp.where(blk[:, None] == blk[None, :], s, jnp.asarray(-jnp.inf, s.dtype))
        a = jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(d)
        o = jnp.einsum("bhqk,bkhd->bqhd", a, v, preferred_element_type=jnp.float32).astype(d)
        return o.reshape(b * t, dm)

    def _block(self, xf: jax.Array, blk, b: int, t: int) -> jax.Array:
        d = self.dtype
        y = _ln(xf, *blk["ln1"], d)
        # dense ops keep the dot output in the compute dtype: with a forced
        # f32 dot output XLA materializes the f32 buffer before the bias/cast
        # epilogue (measured 2x slower at [12800,768]x[768,2304] on v5e);
        # the MXU still accumulates in f32 either way
        qkv = (jnp.dot(y, blk["wqkv"]) + blk["bqkv"]).astype(d)
        o = self._attention(qkv, b, t)
        xf = xf + (jnp.dot(o, blk["wo"]) + blk["bo"]).astype(d)
        y = _ln(xf, *blk["ln2"], d)
        y = (jnp.dot(y, blk["w1"]) + blk["b1"]).astype(d)
        y = y * jax.nn.sigmoid(jnp.float32(1.702) * y.astype(jnp.float32)).astype(d)
        xf = xf + (jnp.dot(y, blk["w2"]) + blk["b2"]).astype(d)
        return xf

    def __call__(self, x: jax.Array) -> jax.Array:
        """normalized image NHWC [B, 224, 224, 3] -> [B, 512] (bf16)."""
        d = self.dtype
        b, hh, ww, c = x.shape
        p = self.patch
        g = hh // p
        # patchify: [B, g, p, g, p, 3] -> [B, g, g, p, p, 3] -> rows
        patches = x.astype(d).reshape(b, g, p, g, p, c).transpose(0, 1, 3, 2, 4, 5)
        patches = patches.reshape(b * g * g, p * p * c)
        tok = jnp.dot(patches, self.wpatch, preferred_element_type=jnp.float32)
        if self.bpatch is not None:
            tok = tok + self.bpatch
        tok = tok.reshape(b, g * g, self.width)
        cls = jnp.broadcast_to(self.cls, (b, 1, self.width))
        xt = jnp.concatenate([cls, tok.astype(jnp.float32)], axis=1) + self.pos
        t = g * g + 1
        xf = _ln(xt.reshape(b * t, self.width), *self.ln_pre, d)
        for blk in self.blocks:
            xf = self._block(xf, blk, b, t)
        cls_tok = xf.reshape(b, t, self.width)[:, 0]
        out = _ln(cls_tok, *self.ln_post, d)
        return jnp.dot(out, self.proj, preferred_element_type=jnp.float32).astype(d)
