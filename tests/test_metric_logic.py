"""Host-logic tests for RP/PA/CA orchestration with stub scorers (the
backbone-independent semantics: binning, thresholds, RMSE pairing, result
formats)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from tise_tpu.calibration import temperature as calib
from tise_tpu.metrics import ca as ca_metric
from tise_tpu.metrics import pa as pa_metric
from tise_tpu.metrics import rp_coco, rp_cub


class TestRpBinning:
    def test_even_split(self):
        bins = rp_coco.make_bins(100, 10, seed=0)
        assert [len(b) for b in bins] == [10] * 10
        assert sorted(sum(bins, [])) == list(range(100))

    def test_remainder_goes_to_last_bin(self):
        bins = rp_coco.make_bins(103, 10, seed=0)
        assert [len(b) for b in bins][:9] == [10] * 9
        assert len(bins[-1]) == 13

    def test_seed_determinism(self):
        assert rp_coco.make_bins(50, 10, seed=7) == rp_coco.make_bins(50, 10, seed=7)
        assert rp_coco.make_bins(50, 10, seed=7) != rp_coco.make_bins(50, 10, seed=8)


class TestRpCubBinning:
    def test_legacy_off_by_one(self):
        """Reference slices [i*3000:(i+1)*3000-1] — 2999 items per bin
        (RP_cub.py:156)."""
        scores = np.ones(30000)
        scores[2999] = 0  # the dropped element of bin 0 after shuffle... use unshuffled check
        # direct check of slice semantics: average of 2999 ones == 1
        bins = rp_cub.legacy_bins(np.ones(30000), seed=0)
        np.testing.assert_allclose(bins, 1.0)

    def test_equal_bins(self):
        scores = np.concatenate([np.ones(50), np.zeros(50)])
        bins = rp_cub.equal_bins(scores, 10, seed=0)
        assert len(bins) == 10
        np.testing.assert_allclose(np.mean(bins), 0.5, atol=0.02)

    def test_tokenize_caption(self):
        vocab = {"a": 1, "bird": 2, "red": 3}
        ids = rp_cub.tokenize_caption("A red, red bird!!", vocab)
        assert ids == [1, 3, 3, 2]
        assert rp_cub.tokenize_caption("unknown words only", vocab) == []

    def test_pack_caption_sets(self):
        caps, lens = rp_cub.pack_caption_sets([[[1, 2, 3], [4]], [[5, 6], []]], max_len=5)
        assert caps.shape == (2, 2, 5)
        np.testing.assert_array_equal(lens, [[3, 1], [2, 1]])
        np.testing.assert_array_equal(caps[0, 0], [1, 2, 3, 0, 0])


class _StubScorer:
    """Deterministic CLIP stand-in: logits favor caption 0 iff the item index
    (decoded from the image's first pixel) is even."""

    data_parallel = 1

    def logits(self, images, tokens):
        b, k = tokens.shape[0], tokens.shape[1]
        out = np.zeros((b, k), np.float32)
        for i in range(b):
            idx = int(images[i, 0, 0, 0])
            if idx % 2 == 0:
                out[i, 0] = 10.0
            else:
                out[i, 1] = 10.0
        return out

    # bank-path stand-ins (the dedup default routes through these)
    def encode_text_bank(self, tokens, *, batch_size=1024):
        return np.zeros((len(tokens), 4), np.float32)

    def logits_from_bank(self, images, bank, idx):
        return self.logits(images, np.zeros((images.shape[0], idx.shape[1], 77), np.int32))


def _write_indexed_images(d, ids, size=224):
    os.makedirs(d, exist_ok=True)
    for i in ids:
        arr = np.full((size, size, 3), i % 256, np.uint8)
        Image.fromarray(arr).save(os.path.join(d, f"{i}.png"))


class _StubTokenizer:
    def tokenize(self, texts):
        return np.ones((len(texts), 77), np.int32)


class TestRpCocoLogic:
    def test_success_rule(self, tmp_path):
        items = [{"caption_id": i, "caption": "c", "mismatched_captions": ["m"] * 99} for i in range(20)]
        _write_indexed_images(str(tmp_path), range(20))
        mean, std, bins = rp_coco.compute_rp(
            items, str(tmp_path), _StubScorer(), _StubTokenizer(), seed=0, batch_size=7
        )
        np.testing.assert_allclose(mean, 0.5, atol=1e-9)  # even ids succeed


class TestPaLogic:
    def test_threshold_and_phrase_mean(self, tmp_path):
        data = {
            "left": [{"caption_id": i, "caption": "c", "false_caption": "f"} for i in range(4)],
            "right": [{"caption_id": i, "caption": "c", "false_caption": "f"} for i in range(4, 6)],
        }
        for phrase in data:
            _write_indexed_images(str(tmp_path / phrase), [it["caption_id"] for it in data[phrase]])
        pa, res = pa_metric.compute_pa(data, str(tmp_path), _StubScorer(), _StubTokenizer(), batch_size=3)
        # stub gives P(gt) ~= 1 for even ids, ~= 0 for odd; threshold 0.6
        assert res["left"]["score"] == 0.5
        assert res["right"]["score"] == 0.5
        assert pa == 0.5

    def test_softmax2(self):
        logits = np.array([[2.0, 0.0], [0.0, 2.0]])
        p = pa_metric._softmax2_first(logits)
        np.testing.assert_allclose(p, [1 / (1 + np.exp(-2)), 1 - 1 / (1 + np.exp(-2))], rtol=1e-6)


class TestCaLogic:
    def test_rmse_pairing(self):
        gt = {"dog": 2.0, "cat": 1.0}
        pred = {"dog": 3.0, "bird": 5.0}  # bird ignored, cat missing -> 0
        rmse = ca_metric.rmse_for_item(pred, gt)
        np.testing.assert_allclose(rmse, np.sqrt((1 + 1) / 2))

    def test_predict_counts_rule(self):
        from tise_tpu.backbones.counter import predict_counts

        conf = np.array([[1.0, -0.5, 0.2]])
        density = np.zeros((1, 3, 4, 4))
        density[0, 0] = 2.4  # mean 2.4 -> round 2
        density[0, 1] = 9.0  # gated off by negative confidence
        density[0, 2] = 0.4  # rounds to 0
        counts = predict_counts(conf, density)
        np.testing.assert_array_equal(counts[0], [2, 0, 0])

    def test_peak_stimulation_matches_torch_prm(self):
        """Transcription oracle for PRM's PeakStimulation.forward (the
        published algorithm CountSeg's peak stimulation builds on): -inf
        padded 3x3 max_pool argmax == self, median peak filter with torch's
        lower-middle order statistic, mean aggregation over peaks.  Random
        float maps are tie-free, where the jax form is exactly torch's."""
        import torch
        import torch.nn.functional as F

        from tise_tpu.backbones.counter import peak_stimulation

        rng = np.random.RandomState(7)
        crm = rng.randn(2, 5, 14, 14).astype(np.float32) * 3

        # --- pure-torch PRM transcription ---
        t = torch.from_numpy(crm)
        win_size, offset = 3, 1
        padded = torch.nn.ConstantPad2d(offset, float("-inf"))(t)
        b, c, h, w = padded.size()
        element_map = torch.arange(0, h * w).long().view(1, 1, h, w)[
            :, :, offset:-offset, offset:-offset
        ]
        _, indices = F.max_pool2d(padded, kernel_size=win_size, stride=1, return_indices=True)
        peak_map = indices == element_map
        threshold = torch.median(t.view(2, 5, -1), dim=2).values.view(2, 5, 1, 1)
        peak_map = peak_map & (t >= threshold)
        pm = peak_map.float()
        want_conf = (t * pm).view(2, 5, -1).sum(2) / pm.view(2, 5, -1).sum(2)

        got_conf, got_mask = jax.jit(peak_stimulation)(jnp.asarray(crm))
        np.testing.assert_array_equal(np.asarray(got_mask), peak_map.numpy())
        np.testing.assert_allclose(np.asarray(got_conf), want_conf.numpy(), rtol=1e-5)


class TestCalibration:
    def test_recovers_planted_temperature(self, rng):
        """Synthetic logits sampled so that logits/T are calibrated: the
        fitted temperature must be ~T."""
        n, c, t_true = 4000, 10, 2.5
        raw = rng.randn(n, c) * 3
        probs = np.exp(raw / t_true)
        probs /= probs.sum(1, keepdims=True)
        labels = np.array([rng.choice(c, p=p) for p in probs])
        t_fit = calib.fit_temperature(raw, labels)
        assert abs(t_fit - t_true) / t_true < 0.1

    def test_ece_perfect_and_broken(self, rng):
        n, c = 2000, 5
        labels = rng.randint(0, c, n)
        # near-one-hot correct logits -> tiny ECE
        logits = np.full((n, c), -10.0)
        logits[np.arange(n), labels] = 10.0
        assert calib.ece(logits, labels) < 0.01
        # confident but wrong -> ECE near 1
        wrong = (labels + 1) % c
        logits_bad = np.full((n, c), -10.0)
        logits_bad[np.arange(n), wrong] = 10.0
        assert calib.ece(logits_bad, labels) > 0.9

    def test_report_improves_nll(self, rng):
        n, c = 1000, 8
        raw = rng.randn(n, c) * 4
        probs = np.exp(raw / 3.0)
        probs /= probs.sum(1, keepdims=True)
        labels = np.array([rng.choice(c, p=p) for p in probs])
        t, nll_b, ece_b, nll_a, ece_a = calib.calibration_report(raw, labels)
        assert nll_a <= nll_b + 1e-6


class TestReliabilityDiagram:
    def test_bins_sum_and_calibrated_diagonal(self, rng):
        n, c = 3000, 6
        raw = rng.randn(n, c) * 2
        probs = np.exp(raw) / np.exp(raw).sum(1, keepdims=True)
        labels = np.array([rng.choice(c, p=p) for p in probs])
        conf, acc, frac = calib.reliability_diagram(raw, labels)
        np.testing.assert_allclose(frac.sum(), 1.0, atol=1e-9)
        # calibrated logits: accuracy tracks confidence in populated bins
        mask = frac > 0.03
        assert np.abs(conf[mask] - acc[mask]).mean() < 0.1

    def test_render_outputs(self, rng, tmp_path):
        """ASCII table has one row per bin; PNG render writes a real file
        (notebook cells 13-19 equivalents)."""
        from tise_tpu.calibration import plots

        n, c = 500, 4
        raw = rng.randn(n, c) * 2
        labels = rng.randint(0, c, n)
        conf, acc, frac = calib.reliability_diagram(raw, labels, n_bins=15)
        table = plots.ascii_reliability(conf, acc, frac)
        assert len(table.splitlines()) == 16  # header + 15 bins
        out = tmp_path / "rel.png"
        plots.render_reliability_png(str(out), conf, acc, ece=0.1234, title="before calibration")
        assert out.stat().st_size > 1000

    def test_cli_plot_flag(self, rng, tmp_path):
        from tise_tpu.calibration import cli

        n, c = 300, 5
        raw = rng.randn(n, c)
        labels = rng.randint(0, c, n)
        npz = tmp_path / "val.npz"
        np.savez(npz, logits=raw, labels=labels)
        cli.main(["--validation_npz", str(npz), "--plot_prefix", str(tmp_path / "rd")])
        assert (tmp_path / "rd_before.png").exists()
        assert (tmp_path / "rd_after.png").exists()


class TestFastScorerPaths:
    """--precision fast routes: FID through FastInception, RP/PA image tower
    through FastCLIPVisual — logits must agree with the f32 flax path to
    bf16 tolerance (the metric defaults stay f32/highest)."""

    def test_clip_scorer_fast_matches_flax(self):
        import jax
        import jax.numpy as jnp

        from tise_tpu.backbones import clip_vit
        from tise_tpu.metrics.clip_scorer import ClipPairScorer

        params = clip_vit.random_params(jax.random.PRNGKey(0))
        rng = np.random.RandomState(0)
        imgs = rng.randint(0, 256, (2, 224, 224, 3)).astype(np.uint8)
        toks = np.zeros((2, 3, 77), np.int32)
        toks[:, :, 0] = 49406
        toks[:, :, 1] = rng.randint(1, 400, (2, 3))
        toks[:, :, 2] = 49407
        ref = ClipPairScorer(params).logits(imgs, toks)
        fast = ClipPairScorer(params, fast=True).logits(imgs, toks)
        assert ref.shape == fast.shape == (2, 3)
        scale = max(np.abs(ref).max(), 1e-6)
        np.testing.assert_allclose(fast, ref, rtol=5e-2, atol=5e-2 * scale)

    def test_text_bank_matches_direct(self):
        """The dedup rank path (unique-caption bank + gather + dot) must equal
        the per-item path — the bank hoists the text tower out of the item
        loop, it does not change the math (clip_scorer.logits_from_bank)."""
        import jax

        from tise_tpu.backbones import clip_vit
        from tise_tpu.metrics.clip_scorer import ClipPairScorer

        params = clip_vit.random_params(jax.random.PRNGKey(0))
        rng = np.random.RandomState(1)
        b, k, n_uniq = 3, 5, 7
        imgs = rng.randint(0, 256, (b, 224, 224, 3)).astype(np.uint8)
        uniq = np.zeros((n_uniq, 77), np.int32)
        uniq[:, 0] = 49406
        uniq[:, 1] = rng.randint(1, 400, n_uniq)
        uniq[:, 2] = 49407
        idx = rng.randint(0, n_uniq, (b, k)).astype(np.int32)  # repeats captions
        scorer = ClipPairScorer(params)
        direct = scorer.logits(imgs, uniq[idx])
        bank = scorer.encode_text_bank(uniq, batch_size=4)  # exercises batching
        via_bank = scorer.logits_from_bank(imgs, bank, idx)
        np.testing.assert_allclose(via_bank, direct, rtol=1e-4, atol=1e-4)

    def test_fid_fast_extractor_matches_flax(self, tmp_path):
        import jax
        import jax.numpy as jnp

        from tise_tpu.backbones import inception_v3
        from tise_tpu.metrics import fid

        params = inception_v3.random_params(jax.random.PRNGKey(0), num_classes=10)
        rng = np.random.RandomState(0)
        imgs = rng.randint(0, 256, (4, 299, 299, 3)).astype(np.uint8)
        ref = fid.make_pool3_extractor(params)(imgs)["pool3"]
        fast = fid.make_pool3_extractor(params, fast=True)(imgs)["pool3"]
        ref, fast = np.asarray(ref, np.float32), np.asarray(fast, np.float32)
        scale = max(np.abs(ref).max(), 1e-6)
        np.testing.assert_allclose(fast, ref, rtol=5e-2, atol=5e-2 * scale)
