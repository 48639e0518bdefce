"""DAMSM text/image encoders (reference: text_relevance/encoders.py).

RNN_ENCODER (:24-114): embedding(300) -> [dropout, identity at eval] ->
1-layer bidirectional LSTM (128 hidden per direction, packed sequences) ->
  words_emb  [B, 256, T]  (per-timestep fwd||bwd outputs, zero past length —
                           pad_packed_sequence semantics)
  sent_emb   [B, 256]     (final hidden states h_n of both directions)

CNN_ENCODER (:117-219): bilinear align-corners upsample to 299 (:162) ->
torchvision InceptionV3 trunk -> region features = Mixed_6e (17x17x768)
through a 1x1 conv to nef=256 (:218), global features = final 8x8 avg pool
(2048) through a linear to nef=256 (:215).

TPU design: the packed-sequence bi-LSTM is two masked ``lax.scan``s (forward
and time-reversed) — state updates are gated on ``t < length`` which
reproduces pack_padded/pad_packed exactly without any host-side sorting; the
trunk reuses tise_tpu.backbones.inception_v3.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from tise_tpu.backbones.inception_v3 import InceptionV3
from tise_tpu.ops.preprocess import resize_bilinear_align_corners


def _lstm_cell(x, h, c, w_ih, w_hh, b):
    """torch LSTM cell, gate order (i, f, g, o); b = b_ih + b_hh."""
    gates = x @ w_ih.T + h @ w_hh.T + b
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    c_new = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
    h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
    return h_new, c_new


class BiLSTM(nn.Module):
    """Single-layer bidirectional LSTM with length masking (packed parity)."""

    hidden: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, emb: jax.Array, lengths: jax.Array) -> Tuple[jax.Array, jax.Array]:
        """emb [B, T, E], lengths [B] -> (outputs [B, T, 2H], h_n [B, 2H])."""
        b, t, e = emb.shape
        h = self.hidden
        init = nn.initializers.uniform(scale=2.0 / np.sqrt(h))  # torch default U(-1/sqrt(h), 1/sqrt(h))

        def direction(name):
            w_ih = self.param(f"w_ih_{name}", init, (4 * h, e))
            w_hh = self.param(f"w_hh_{name}", init, (4 * h, h))
            b_ih = self.param(f"b_ih_{name}", init, (4 * h,))
            b_hh = self.param(f"b_hh_{name}", init, (4 * h,))
            return w_ih, w_hh, b_ih + b_hh

        fwd_w = direction("fwd")
        bwd_w = direction("bwd")
        emb_t = emb.transpose(1, 0, 2)  # [T, B, E]
        len_col = lengths[:, None].astype(jnp.int32)

        def make_step(weights, reverse: bool):
            w_ih, w_hh, bias = weights

            def step(carry, inp):
                h_prev, c_prev = carry
                x_t, t_idx = inp
                h_new, c_new = _lstm_cell(x_t, h_prev, c_prev, w_ih, w_hh, bias)
                valid = (t_idx[:, None] < len_col[:, 0:1]).astype(h_new.dtype)
                h_out = valid * h_new + (1 - valid) * h_prev
                c_out = valid * c_new + (1 - valid) * c_prev
                # pad_packed zeros outputs past the length
                return (h_out, c_out), valid * h_new

            return step

        zeros = (jnp.zeros((b, h), self.dtype), jnp.zeros((b, h), self.dtype))
        t_ids = jnp.arange(t, dtype=jnp.int32)[:, None] * jnp.ones((1, b), jnp.int32)

        (h_fwd, _), out_fwd = jax.lax.scan(make_step(fwd_w, False), zeros, (emb_t, t_ids))
        (h_bwd, _), out_bwd = jax.lax.scan(make_step(bwd_w, True), zeros, (emb_t, t_ids), reverse=True)

        outputs = jnp.concatenate([out_fwd, out_bwd], axis=-1).transpose(1, 0, 2)  # [B, T, 2H]
        h_n = jnp.concatenate([h_fwd, h_bwd], axis=-1)  # [B, 2H]
        return outputs, h_n


class RNNEncoder(nn.Module):
    """DAMSM text encoder (eval mode: dropout = identity)."""

    ntoken: int
    ninput: int = 300
    nhidden: int = 128  # per direction (encoders.py:39: nhidden//2 with nhidden=256)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, captions: jax.Array, lengths: jax.Array) -> Tuple[jax.Array, jax.Array]:
        """captions int [B, T], lengths [B] -> (words_emb [B, 256, T], sent_emb [B, 256])."""
        emb_table = self.param("embedding", nn.initializers.uniform(scale=0.2), (self.ntoken, self.ninput))
        emb = emb_table[captions].astype(self.dtype)
        outputs, h_n = BiLSTM(self.nhidden, dtype=self.dtype, name="bilstm")(emb, lengths)
        words_emb = outputs.transpose(0, 2, 1)  # [B, 2H, T]
        return words_emb, h_n


class CNNEncoder(nn.Module):
    """DAMSM image encoder: inception trunk + nef-dim projection heads."""

    nef: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> Tuple[jax.Array, jax.Array]:
        """x: normalized NHWC image -> (region features [B, 17, 17, nef],
        cnn_code [B, nef])."""
        x = resize_bilinear_align_corners(x, (299, 299))
        out = InceptionV3(dtype=self.dtype, name="trunk")(x, endpoints=("mixed6e", "pool3"))
        features = nn.Conv(self.nef, (1, 1), use_bias=False, dtype=self.dtype, name="emb_features")(out["mixed6e"])
        cnn_code = nn.Dense(self.nef, dtype=self.dtype, name="emb_cnn_code")(out["pool3"])
        return features, cnn_code


# ---------------------------------------------------------------------------
# Weight conversion from the reference DAMSM checkpoints
# ---------------------------------------------------------------------------


def rnn_params_from_torch(sd: Mapping[str, np.ndarray]) -> Dict[str, Any]:
    """text_encoder*.pth -> RNNEncoder params (torch LSTM naming)."""

    def a(k):
        v = sd[k]
        return v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)

    return {
        "params": {
            "embedding": a("encoder.weight"),
            "bilstm": {
                "w_ih_fwd": a("rnn.weight_ih_l0"),
                "w_hh_fwd": a("rnn.weight_hh_l0"),
                "b_ih_fwd": a("rnn.bias_ih_l0"),
                "b_hh_fwd": a("rnn.bias_hh_l0"),
                "w_ih_bwd": a("rnn.weight_ih_l0_reverse"),
                "w_hh_bwd": a("rnn.weight_hh_l0_reverse"),
                "b_ih_bwd": a("rnn.bias_ih_l0_reverse"),
                "b_hh_bwd": a("rnn.bias_hh_l0_reverse"),
            },
        }
    }


def cnn_params_from_torch(sd: Mapping[str, np.ndarray]) -> Dict[str, Any]:
    """image_encoder*.pth -> CNNEncoder params.

    The checkpoint uses torchvision module names at the top level
    (encoders.py:133-152) plus emb_features/emb_cnn_code heads.
    """
    from tise_tpu.backbones.inception_v3 import params_from_torch_state_dict

    def a(k):
        v = sd[k]
        return v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)

    trunk_sd = {k: v for k, v in sd.items() if not k.startswith("emb_")}
    trunk = params_from_torch_state_dict(trunk_sd)["params"]
    return {
        "params": {
            "trunk": trunk,
            "emb_features": {"kernel": np.transpose(a("emb_features.weight"), (2, 3, 1, 0))},
            "emb_cnn_code": {"kernel": a("emb_cnn_code.weight").T, "bias": a("emb_cnn_code.bias")},
        }
    }
