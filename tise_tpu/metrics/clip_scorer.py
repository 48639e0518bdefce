"""Batched CLIP image-vs-caption-set scorer shared by RP (COCO) and PA.

The reference scores one image against its caption set per forward
(RP_coco.py:60-76 — 1 image x 100 texts, batch size 1; PA.py:33-43 — 1 image
x 2 texts).  Here a whole block of items runs per pjit step: images
[B, 224, 224, 3] and per-item token sets [B, K, 77] produce the [B, K] logit
matrix in one sharded forward — the per-item diagonal of the image/text
similarity, exactly what ``model(image, text)`` yields item-wise.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tise_tpu.backbones import clip_vit
from tise_tpu.core.mesh import make_mesh
from tise_tpu.ops.preprocess import normalize


class ClipPairScorer:
    """jit-compiled (images, token sets) -> per-item caption logits."""

    def __init__(self, params, mesh: Optional[Mesh] = None, dtype=jnp.float32, fast: bool = False):
        """``fast=True`` routes the image tower through the bf16
        FastCLIPVisual (backbones/clip_fast.py, pack-4 attention — the
        throughput path; bf16-tolerance parity vs the flax tower); the text
        tower (77-token, cheap) always stays the flax module."""
        self.mesh = mesh if mesh is not None else make_mesh()
        self.params = params
        model = clip_vit.CLIP(dtype=dtype)
        data = self.mesh.axis_names[0]
        fast_visual = None
        if fast:
            from tise_tpu.backbones import clip_fast

            fast_visual = clip_fast.FastCLIPVisual(
                dtype=jnp.bfloat16,
                folded=jax.jit(lambda p: clip_fast.fold_tree(p, jnp.bfloat16))(params),
            )

        def fwd(p, images_u8, tokens):
            # images_u8: [B, 224, 224, 3]; tokens: [B, K, 77]
            b, k, t = tokens.shape
            x = normalize(images_u8, "clip", jnp.bfloat16 if fast_visual else jnp.float32)
            if fast_visual is not None:
                img = fast_visual(x).astype(jnp.float32)
            else:
                img = model.apply(p, x, method=model.encode_image)
            txt = model.apply(p, tokens.reshape(b * k, t), method=model.encode_text)
            txt = txt.reshape(b, k, -1)
            img = img / jnp.linalg.norm(img, axis=-1, keepdims=True)
            txt = txt / jnp.linalg.norm(txt, axis=-1, keepdims=True)
            scale = jnp.exp(p["params"]["logit_scale"].astype(jnp.float32))
            return scale * jnp.einsum("bd,bkd->bk", img.astype(jnp.float32), txt.astype(jnp.float32))

        self._fwd_raw = fwd  # unjitted (tools/rp_bench.py wraps it with a salt)
        self._fwd = jax.jit(
            fwd,
            in_shardings=(
                NamedSharding(self.mesh, P()),
                NamedSharding(self.mesh, P(data)),
                NamedSharding(self.mesh, P(data)),
            ),
            out_shardings=NamedSharding(self.mesh, P(data)),
        )
        self._fast_visual = fast_visual
        self._encode_fn = None  # text-bank programs jitted on first use
        self._from_bank_fn = None

    @property
    def data_parallel(self) -> int:
        return self.mesh.shape[self.mesh.axis_names[0]]

    def _build_bank_fns(self):
        """Lazily jit the text-bank programs (encode + rank-from-bank)."""
        if getattr(self, "_encode_fn", None) is not None:
            return
        model = clip_vit.CLIP(dtype=jnp.float32)
        data = self.mesh.axis_names[0]
        repl = NamedSharding(self.mesh, P())
        shard = NamedSharding(self.mesh, P(data))

        def encode(p, tokens):
            txt = model.apply(p, tokens, method=model.encode_text)
            return txt / jnp.linalg.norm(txt, axis=-1, keepdims=True)

        self._encode_fn = jax.jit(
            encode, in_shardings=(repl, shard), out_shardings=shard
        )

        fast_visual = self._fast_visual

        def from_bank(p, images_u8, bank, idx):
            # images_u8: [B, 224, 224, 3]; bank: [N, D] unit rows; idx: [B, K]
            x = normalize(images_u8, "clip", jnp.bfloat16 if fast_visual else jnp.float32)
            if fast_visual is not None:
                img = fast_visual(x).astype(jnp.float32)
            else:
                img = model.apply(p, x, method=model.encode_image)
            img = img / jnp.linalg.norm(img, axis=-1, keepdims=True)
            txt = jnp.take(bank, idx, axis=0)  # [B, K, D]
            scale = jnp.exp(p["params"]["logit_scale"].astype(jnp.float32))
            return scale * jnp.einsum("bd,bkd->bk", img.astype(jnp.float32), txt)

        self._from_bank_raw = from_bank  # unjitted (tools/rp_bench.py wraps it with a salt)
        self._from_bank_fn = jax.jit(
            from_bank,
            in_shardings=(repl, shard, repl, shard),
            out_shardings=shard,
        )

    def encode_text_bank(self, tokens: np.ndarray, *, batch_size: int = 1024) -> jax.Array:
        """[N, 77] int32 -> [N, D] unit-norm float32 embeddings ON DEVICE.

        The text-bank half of the dedup rank path (see ``logits_from_bank``):
        each UNIQUE caption is encoded once instead of once per (item,
        caption-slot) pair.  The reference re-runs the text tower on the same
        100 captions for every item (RP_coco.py:70-73); with mismatched
        captions drawn from the shared caption pool (datasets.py:300-319) a
        30k-item run repeats each caption ~100x — this path removes exactly
        that repetition and nothing else (same tokens -> bitwise-same
        embedding rows)."""
        self._build_bank_fns()
        n = len(tokens)
        if n == 0:
            # empty shard (processes > items in a multi-host run): the
            # non-dedup path handles this, the bank path must too (ADVICE r4)
            d = self.params["params"]["text"]["text_projection"].shape[-1]
            return jnp.zeros((0, d), jnp.float32)
        dp = self.data_parallel
        outs = []
        for start in range(0, n, batch_size):
            chunk = tokens[start : start + batch_size]
            pad = (-len(chunk)) % dp
            if pad:
                chunk = np.concatenate([chunk, np.zeros((pad,) + chunk.shape[1:], chunk.dtype)])
            outs.append(self._encode_fn(self.params, chunk)[: len(tokens[start : start + batch_size])])
        return jnp.concatenate(outs, axis=0) if len(outs) > 1 else outs[0]

    def dispatch_from_bank(self, images_u8: np.ndarray, bank: jax.Array, idx: np.ndarray):
        """Non-blocking half of ``logits_from_bank``: pad + dispatch, return
        the in-flight device array and the valid row count.  Lets the rank
        loop keep ONE batch in flight so the device computes batch k+1 while
        the host pulls batch k (the per-batch blocking pull otherwise
        serializes the ~28 ms tunnel RTT with compute — measured as most of
        the r4 rank-phase gap, tools/rp_rank_ablate.py)."""
        self._build_bank_fns()
        b = images_u8.shape[0]
        dp = self.data_parallel
        pad = (-b) % dp
        if pad:
            images_u8 = np.concatenate([images_u8, np.zeros((pad,) + images_u8.shape[1:], images_u8.dtype)])
            idx = np.concatenate([idx, np.zeros((pad,) + idx.shape[1:], idx.dtype)])
        return self._from_bank_fn(self.params, images_u8, bank, idx), b

    @staticmethod
    def pull_logits(inflight) -> np.ndarray:
        """Blocking half: (device array, valid count) -> [b, K] numpy."""
        dev, b = inflight
        return np.asarray(jax.device_get(dev))[:b]

    def logits_from_bank(self, images_u8: np.ndarray, bank: jax.Array, idx: np.ndarray) -> np.ndarray:
        """[B,224,224,3] uint8 + [N,D] bank + [B,K] int32 rows -> [B,K] logits.

        Equivalent to ``logits(images, tokens[idx])`` with the text tower
        hoisted out (exact: the per-item logit is scale * <img, txt> either
        way); the per-step cost drops from B*(1 image + K text) forwards to
        B image forwards + a [B,K,D] gather."""
        return self.pull_logits(self.dispatch_from_bank(images_u8, bank, idx))

    def logits(self, images_u8: np.ndarray, tokens: np.ndarray) -> np.ndarray:
        """[B, 224, 224, 3] uint8 + [B, K, 77] int32 -> [B, K] float32.

        Text activations scale with B*K rows — at K=100 keep B <= ~64 on a
        16 GB chip (B=256 allocates a 15 GB f32 MLP temp, measured HBM OOM);
        ``logits_from_bank`` removes the K axis entirely."""
        b = images_u8.shape[0]
        dp = self.data_parallel
        pad = (-b) % dp
        if pad:
            images_u8 = np.concatenate([images_u8, np.zeros((pad,) + images_u8.shape[1:], images_u8.dtype)])
            tokens = np.concatenate([tokens, np.zeros((pad,) + tokens.shape[1:], tokens.dtype)])
        out = np.asarray(jax.device_get(self._fwd(self.params, images_u8, tokens)))
        return out[:b]
