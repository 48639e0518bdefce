"""CLIP ViT-B/32 (image + text towers) in Flax, NHWC/TPU-first.

Backbone for RP (text_relevance/RP_coco.py:31,73 — rank 1 GT caption vs 99
mismatched by image-text logits) and PA (positional_alignment/PA.py:30-43 —
2-way caption vs false_caption, success iff P(gt) > 0.6).

Architecture parity with openai/CLIP "ViT-B/32":
  image tower: 32x32 conv patchify (no bias) -> +class token -> +pos embed ->
    ln_pre -> 12 pre-LN transformer blocks (d=768, 12 heads, QuickGELU MLP) ->
    ln_post on the class token -> linear proj to 512
  text tower: 49408-token embedding, 77 positions, 12 pre-LN blocks (d=512,
    8 heads, causal mask) -> ln_final -> take the EOT position -> text_projection
  similarity: logit_scale.exp() * normalize(img) @ normalize(txt).T

The two towers run batched under one pjit: RP scores a [B_img, 100-caption]
block per step instead of the reference's one-image-one-forward loop
(RP_coco.py:60-76), which is where the TPU throughput comes from.
Weights convert from the OpenAI CLIP state_dict via
:func:`params_from_openai_state_dict`.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

LN_EPS = 1e-5


def quick_gelu(x: jax.Array) -> jax.Array:
    return x * jax.nn.sigmoid(1.702 * x)


class MultiHeadAttention(nn.Module):
    """torch.nn.MultiheadAttention parity (packed qkv in_proj + out_proj)."""

    width: int
    heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, mask: Optional[jax.Array] = None) -> jax.Array:
        b, t, d = x.shape
        h = self.heads
        hd = d // h
        qkv = nn.Dense(3 * d, dtype=self.dtype, name="in_proj")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def split_heads(a):
            return a.reshape(b, t, h, hd).transpose(0, 2, 1, 3)

        q, k, v = split_heads(q), split_heads(k), split_heads(v)
        scale = 1.0 / np.sqrt(hd)
        attn = jnp.einsum("bhqd,bhkd->bhqk", q * scale, k, preferred_element_type=jnp.float32)
        if mask is not None:
            attn = attn + mask
        attn = jax.nn.softmax(attn, axis=-1).astype(self.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, t, d)
        return nn.Dense(d, dtype=self.dtype, name="out_proj")(out)


class ResidualBlock(nn.Module):
    width: int
    heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, mask: Optional[jax.Array] = None) -> jax.Array:
        y = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, name="ln_1")(x)
        x = x + MultiHeadAttention(self.width, self.heads, dtype=self.dtype, name="attn")(y, mask)
        y = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, name="ln_2")(x)
        y = nn.Dense(4 * self.width, dtype=self.dtype, name="mlp_c_fc")(y)
        y = quick_gelu(y)
        x = x + nn.Dense(self.width, dtype=self.dtype, name="mlp_c_proj")(y)
        return x


class Transformer(nn.Module):
    width: int
    layers: int
    heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, mask: Optional[jax.Array] = None) -> jax.Array:
        for i in range(self.layers):
            x = ResidualBlock(self.width, self.heads, dtype=self.dtype, name=f"resblocks_{i}")(x, mask)
        return x


class VisionTransformer(nn.Module):
    patch_size: int = 32
    width: int = 768
    layers: int = 12
    heads: int = 12
    output_dim: int = 512
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        """x: normalized image NHWC [B, 224, 224, 3] -> [B, output_dim]."""
        d = self.dtype
        x = nn.Conv(
            self.width,
            (self.patch_size, self.patch_size),
            strides=(self.patch_size, self.patch_size),
            use_bias=False,
            dtype=d,
            name="conv1",
        )(x)
        b, gh, gw, _ = x.shape
        x = x.reshape(b, gh * gw, self.width)
        cls = self.param("class_embedding", nn.initializers.normal(0.02), (self.width,))
        x = jnp.concatenate([jnp.broadcast_to(cls.astype(d), (b, 1, self.width)), x], axis=1)
        pos = self.param("positional_embedding", nn.initializers.normal(0.01), (gh * gw + 1, self.width))
        x = x + pos.astype(d)
        x = nn.LayerNorm(epsilon=LN_EPS, dtype=d, name="ln_pre")(x)
        x = Transformer(self.width, self.layers, self.heads, dtype=d, name="transformer")(x)
        x = nn.LayerNorm(epsilon=LN_EPS, dtype=d, name="ln_post")(x[:, 0])
        proj = self.param("proj", nn.initializers.normal(0.02), (self.width, self.output_dim))
        return x @ proj.astype(d)


class TextTransformer(nn.Module):
    vocab_size: int = 49408
    context_length: int = 77
    width: int = 512
    layers: int = 12
    heads: int = 8
    output_dim: int = 512
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, tokens: jax.Array) -> jax.Array:
        """tokens: int32 [B, 77] -> [B, output_dim] (EOT-pooled, projected)."""
        d = self.dtype
        emb = self.param("token_embedding", nn.initializers.normal(0.02), (self.vocab_size, self.width))
        x = emb[tokens].astype(d)
        pos = self.param("positional_embedding", nn.initializers.normal(0.01), (self.context_length, self.width))
        x = x + pos.astype(d)
        t = tokens.shape[1]
        causal = jnp.triu(jnp.full((t, t), -jnp.inf, jnp.float32), k=1)
        x = Transformer(self.width, self.layers, self.heads, dtype=d, name="transformer")(x, causal)
        x = nn.LayerNorm(epsilon=LN_EPS, dtype=d, name="ln_final")(x)
        # EOT token has the highest id in the CLIP vocab -> argmax pooling
        eot = jnp.argmax(tokens, axis=-1)
        x = x[jnp.arange(x.shape[0]), eot]
        proj = self.param("text_projection", nn.initializers.normal(0.02), (self.width, self.output_dim))
        return x @ proj.astype(d)


class CLIP(nn.Module):
    """Joint model: encode images/texts and produce the similarity logits."""

    embed_dim: int = 512
    dtype: Any = jnp.float32

    def setup(self):
        self.visual = VisionTransformer(output_dim=self.embed_dim, dtype=self.dtype)
        self.text = TextTransformer(output_dim=self.embed_dim, dtype=self.dtype)
        self.logit_scale = self.param("logit_scale", nn.initializers.constant(np.log(1 / 0.07)), ())

    def encode_image(self, images: jax.Array) -> jax.Array:
        return self.visual(images)

    def encode_text(self, tokens: jax.Array) -> jax.Array:
        return self.text(tokens)

    def __call__(self, images: jax.Array, tokens: jax.Array) -> Tuple[jax.Array, jax.Array]:
        """-> (logits_per_image [B_img, B_txt], logits_per_text)."""
        img = self.encode_image(images)
        txt = self.encode_text(tokens)
        img = img / jnp.linalg.norm(img, axis=-1, keepdims=True)
        txt = txt / jnp.linalg.norm(txt, axis=-1, keepdims=True)
        scale = jnp.exp(self.logit_scale.astype(jnp.float32))
        logits_per_image = scale * img.astype(jnp.float32) @ txt.astype(jnp.float32).T
        return logits_per_image, logits_per_image.T


# ---------------------------------------------------------------------------
# Weight conversion from the OpenAI CLIP state_dict
# ---------------------------------------------------------------------------


def _dense(w: np.ndarray, b: Optional[np.ndarray] = None) -> Dict[str, np.ndarray]:
    out = {"kernel": np.asarray(w).T}
    if b is not None:
        out["bias"] = np.asarray(b)
    return out


def _block_params(sd: Mapping[str, np.ndarray], prefix: str) -> Dict[str, Any]:
    return {
        "ln_1": {"scale": sd[f"{prefix}.ln_1.weight"], "bias": sd[f"{prefix}.ln_1.bias"]},
        "ln_2": {"scale": sd[f"{prefix}.ln_2.weight"], "bias": sd[f"{prefix}.ln_2.bias"]},
        "attn": {
            "in_proj": _dense(sd[f"{prefix}.attn.in_proj_weight"], sd[f"{prefix}.attn.in_proj_bias"]),
            "out_proj": _dense(sd[f"{prefix}.attn.out_proj.weight"], sd[f"{prefix}.attn.out_proj.bias"]),
        },
        "mlp_c_fc": _dense(sd[f"{prefix}.mlp.c_fc.weight"], sd[f"{prefix}.mlp.c_fc.bias"]),
        "mlp_c_proj": _dense(sd[f"{prefix}.mlp.c_proj.weight"], sd[f"{prefix}.mlp.c_proj.bias"]),
    }


def params_from_openai_state_dict(sd: Mapping[str, Any]) -> Dict[str, Any]:
    """OpenAI CLIP (ViT-B/32) state_dict -> flax param pytree."""
    sd = {k: (v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)) for k, v in sd.items()}
    n_vis = 1 + max(int(k.split(".")[3]) for k in sd if k.startswith("visual.transformer.resblocks."))
    n_txt = 1 + max(int(k.split(".")[2]) for k in sd if k.startswith("transformer.resblocks."))

    visual: Dict[str, Any] = {
        "conv1": {"kernel": np.transpose(sd["visual.conv1.weight"], (2, 3, 1, 0))},
        "class_embedding": sd["visual.class_embedding"],
        "positional_embedding": sd["visual.positional_embedding"],
        "ln_pre": {"scale": sd["visual.ln_pre.weight"], "bias": sd["visual.ln_pre.bias"]},
        "ln_post": {"scale": sd["visual.ln_post.weight"], "bias": sd["visual.ln_post.bias"]},
        "proj": sd["visual.proj"],
        "transformer": {
            f"resblocks_{i}": _block_params(sd, f"visual.transformer.resblocks.{i}") for i in range(n_vis)
        },
    }
    text: Dict[str, Any] = {
        "token_embedding": sd["token_embedding.weight"],
        "positional_embedding": sd["positional_embedding"],
        "ln_final": {"scale": sd["ln_final.weight"], "bias": sd["ln_final.bias"]},
        "text_projection": sd["text_projection"],
        "transformer": {f"resblocks_{i}": _block_params(sd, f"transformer.resblocks.{i}") for i in range(n_txt)},
    }
    return {"params": {"visual": visual, "text": text, "logit_scale": sd["logit_scale"]}}


def load_params(path: str) -> Dict[str, Any]:
    """Load CLIP params from a converted .npz or an OpenAI .pt state_dict."""
    from tise_tpu.core import weights as weights_io

    if path.endswith(".npz"):
        return weights_io.load_pytree_npz(path)
    sd = weights_io.load_torch_state_dict(path)
    return params_from_openai_state_dict(sd)


def random_params(rng: jax.Array, dtype=jnp.float32) -> Dict[str, Any]:
    model = CLIP(dtype=dtype)
    imgs = jnp.zeros((1, 224, 224, 3), dtype)
    toks = jnp.zeros((1, 77), jnp.int32)
    return model.init(rng, imgs, toks)
