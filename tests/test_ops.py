"""Unit tests for the math kernels: streaming moments, sqrtm, split-KL,
normalization recipes, align-corners resize."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.linalg

from tise_tpu.ops import kl, preprocess, sqrtm, stats


class TestMoments:
    def test_matches_numpy_cov(self, rng):
        acts = rng.randn(500, 32).astype(np.float32)
        state = stats.init_moments(32)
        for i in range(0, 500, 64):
            state = stats.update_moments(state, jnp.asarray(acts[i : i + 64]))
        mu, sigma = stats.finalize_moments(state)
        mu_ref, sigma_ref = stats.exact_stats(acts.astype(np.float64))
        np.testing.assert_allclose(mu, mu_ref, rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(sigma, sigma_ref, rtol=1e-3, atol=1e-4)

    def test_mask_excludes_padding(self, rng):
        acts = rng.randn(10, 8).astype(np.float32)
        mask = np.zeros(10, bool)
        mask[:7] = True
        state = stats.update_moments(stats.init_moments(8), jnp.asarray(acts), jnp.asarray(mask))
        mu, sigma = stats.finalize_moments(state)
        mu_ref, sigma_ref = stats.exact_stats(acts[:7].astype(np.float64))
        np.testing.assert_allclose(mu, mu_ref, rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(sigma, sigma_ref, rtol=1e-4, atol=1e-5)

    def test_merge(self, rng):
        a = rng.randn(64, 8).astype(np.float32)
        b = rng.randn(32, 8).astype(np.float32)
        s1 = stats.update_moments(stats.init_moments(8), jnp.asarray(a))
        s2 = stats.update_moments(stats.init_moments(8), jnp.asarray(b))
        merged = stats.merge_moments(s1, s2)
        mu, sigma = stats.finalize_moments(merged)
        mu_ref, sigma_ref = stats.exact_stats(np.concatenate([a, b]).astype(np.float64))
        np.testing.assert_allclose(mu, mu_ref, rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(sigma, sigma_ref, rtol=1e-4, atol=1e-5)


def _random_psd(rng, d, scale=1.0):
    a = rng.randn(d, d)
    return scale * (a @ a.T / d + 0.1 * np.eye(d))


class TestSqrtm:
    def test_newton_schulz_vs_scipy(self, rng):
        s1 = _random_psd(rng, 64)
        s2 = _random_psd(rng, 64)
        prod = s1 @ s2
        ref = np.trace(scipy.linalg.sqrtm(prod).real)
        got = sqrtm.trace_sqrtm_product(s1, s2, method="ns")
        assert abs(got - ref) / abs(ref) < 1e-3

    def test_eigh_vs_scipy(self, rng):
        s1 = _random_psd(rng, 96)
        s2 = _random_psd(rng, 96)
        ref = np.trace(scipy.linalg.sqrtm(s1 @ s2).real)
        got = sqrtm.trace_sqrtm_product(s1, s2, method="eigh")
        assert abs(got - ref) / abs(ref) < 1e-8

    @pytest.mark.parametrize("method", ["scipy", "eigh", "ns"])
    def test_frechet_identical_dists_is_zero(self, rng, method):
        mu = rng.randn(32)
        sigma = _random_psd(rng, 32)
        d = sqrtm.frechet_distance(mu, sigma, mu, sigma, method=method)
        assert abs(d) < (1e-2 if method == "ns" else 1e-6)

    def test_frechet_device_one_dispatch_path(self, rng):
        """finalize_moments_f32 + frechet_distance_device (the fused
        streaming fast path: one dispatch, one scalar pulled) must agree
        with the host f64 finalize + scipy frechet to ns-class tolerance."""
        import jax.numpy as jnp

        acts1 = rng.randn(400, 48).astype(np.float32) * 0.5 + 0.2
        acts2 = rng.randn(400, 48).astype(np.float32) * 0.7 - 0.1
        sa = stats.update_moments(stats.init_moments(48), jnp.asarray(acts1))
        sb = stats.update_moments(stats.init_moments(48), jnp.asarray(acts2))
        got = float(
            sqrtm.frechet_distance_device(
                *stats.finalize_moments_f32(sa), *stats.finalize_moments_f32(sb)
            )
        )
        ref = sqrtm.frechet_distance(
            *stats.finalize_moments(sa), *stats.finalize_moments(sb), method="scipy"
        )
        assert abs(got - ref) / abs(ref) < 1e-3

    def test_frechet_device_bf16_sigmas_cast_first(self, rng):
        """bf16 sigmas must be upcast ONCE at the top — the trace terms would
        otherwise accumulate the diagonal in bf16 (regression: un-cast
        jnp.trace on the raw inputs)."""
        import jax.numpy as jnp

        mu = jnp.asarray(rng.randn(64), jnp.bfloat16)
        s1 = jnp.asarray(_random_psd(rng, 64), jnp.bfloat16)
        s2 = jnp.asarray(_random_psd(rng, 64), jnp.bfloat16)
        got = float(sqrtm.frechet_distance_device(mu, s1, mu, s2))
        # oracle: identical values pre-upcast to f32 (same rounding of the
        # inputs, so any difference is accumulation dtype)
        ref = float(
            sqrtm.frechet_distance_device(
                mu.astype(jnp.float32), s1.astype(jnp.float32),
                mu.astype(jnp.float32), s2.astype(jnp.float32),
            )
        )
        assert abs(got - ref) <= 1e-4 * max(1.0, abs(ref))

    def test_frechet_reference_formula(self, rng):
        """Cross-check the full distance vs an independent direct computation."""
        mu1, mu2 = rng.randn(16), rng.randn(16)
        s1, s2 = _random_psd(rng, 16), _random_psd(rng, 16)
        covmean = scipy.linalg.sqrtm(s1 @ s2).real
        expected = (mu1 - mu2) @ (mu1 - mu2) + np.trace(s1) + np.trace(s2) - 2 * np.trace(covmean)
        got = sqrtm.frechet_distance(mu1, s1, mu2, s2, method="scipy")
        np.testing.assert_allclose(got, expected, rtol=1e-10)


class TestSplitKL:
    def test_uniform_predictions_score_one(self):
        preds = np.full((100, 10), 0.1)
        mean, std = kl.inception_score(preds, splits=10)
        np.testing.assert_allclose(mean, 1.0, rtol=1e-12)
        np.testing.assert_allclose(std, 0.0, atol=1e-12)

    def test_one_hot_predictions_score_num_classes(self):
        # each split containing all C distinct one-hot rows: exp(mean KL) = C
        c = 5
        eye = np.eye(c) * (1 - 1e-9) + 1e-9 / c
        preds = np.tile(eye, (20, 1))
        mean, _ = kl.inception_score(preds, splits=10)
        np.testing.assert_allclose(mean, c, rtol=1e-5)

    def test_matches_scipy_entropy(self, rng):
        from scipy.stats import entropy

        logits = rng.randn(64, 12)
        probs = np.exp(logits) / np.exp(logits).sum(1, keepdims=True)
        # reference O-IS formulation: exp(mean_i entropy(p_i, marginal))
        scores_ref = []
        for k in range(4):
            part = probs[k * 16 : (k + 1) * 16]
            py = part.mean(0)
            scores_ref.append(np.exp(np.mean([entropy(p, py) for p in part])))
        got = kl.split_kl_scores(probs, splits=4)
        np.testing.assert_allclose(got, scores_ref, rtol=1e-10)

    def test_temperature_softmax(self, rng):
        logits = rng.randn(8, 10).astype(np.float32)
        t = 0.598
        got = np.asarray(kl.temperature_softmax(jnp.asarray(logits), t))
        e = np.exp(logits / t - (logits / t).max(1, keepdims=True))
        ref = e / e.sum(1, keepdims=True)
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


class TestPreprocess:
    def test_fid_recipe_matches_reference_affine(self, rng):
        """FID normalize: x in [0,1] -> x*(0.229/0.5)+(0.485-0.5)/0.5 etc.
        (reference FID/inception.py:120-124)."""
        u8 = rng.randint(0, 256, (2, 4, 4, 3)).astype(np.uint8)
        got = np.asarray(preprocess.normalize(jnp.asarray(u8), "fid"))
        x01 = u8.astype(np.float64) / 255.0
        scales = [0.229 / 0.5, 0.224 / 0.5, 0.225 / 0.5]
        shifts = [(0.485 - 0.5) / 0.5, (0.456 - 0.5) / 0.5, (0.406 - 0.5) / 0.5]
        ref = np.stack([x01[..., c] * scales[c] + shifts[c] for c in range(3)], axis=-1)
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)

    def test_is_star_recipe(self, rng):
        u8 = rng.randint(0, 256, (1, 3, 3, 3)).astype(np.uint8)
        got = np.asarray(preprocess.normalize(jnp.asarray(u8), "is_star"))
        np.testing.assert_allclose(got, u8 / 127.5 - 1.0, rtol=1e-6)

    def test_imagenet_recipe(self, rng):
        u8 = rng.randint(0, 256, (1, 2, 2, 3)).astype(np.uint8)
        got = np.asarray(preprocess.normalize(jnp.asarray(u8), "imagenet"))
        mean = np.array([0.485, 0.456, 0.406])
        std = np.array([0.229, 0.224, 0.225])
        ref = (u8 / 255.0 - mean) / std
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)

    def test_align_corners_resize_identity(self, rng):
        x = jnp.asarray(rng.randn(1, 7, 7, 2).astype(np.float32))
        out = preprocess.resize_bilinear_align_corners(x, (7, 7))
        np.testing.assert_allclose(out, x)

    def test_align_corners_resize_vs_torch(self, rng):
        torch = pytest.importorskip("torch")
        x = rng.randn(2, 5, 6, 3).astype(np.float32)
        out = np.asarray(preprocess.resize_bilinear_align_corners(jnp.asarray(x), (11, 9)))
        xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
        ref = torch.nn.functional.interpolate(xt, size=(11, 9), mode="bilinear", align_corners=True)
        ref = ref.numpy().transpose(0, 2, 3, 1)
        np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


class TestFastPool:
    @pytest.mark.parametrize("include_pad", [True, False])
    @pytest.mark.parametrize("shape", [(2, 17, 17, 8), (3, 35, 35, 5), (1, 8, 8, 4)])
    def test_matches_reduce_window(self, rng, shape, include_pad):
        """Shifted-add formulation == flax.linen.avg_pool for both the torch
        (divide-by-9) and TF-SAME (in-bounds divisor) flavors."""
        import flax.linen as nn

        from tise_tpu.ops.fast_pool import avg_pool_3x3_s1_p1

        x = jnp.asarray(rng.randn(*shape), jnp.float32)
        ref = nn.avg_pool(x, (3, 3), (1, 1), ((1, 1), (1, 1)), count_include_pad=include_pad)
        got = avg_pool_3x3_s1_p1(x, count_include_pad=include_pad)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-6, atol=1e-6)

    @pytest.mark.parametrize("include_pad", [True, False])
    def test_pallas_kernel_interpret(self, rng, include_pad):
        """The (experiment-gated) Pallas stencil matches reduce_window."""
        from jax.experimental.pallas import tpu as pltpu

        from tise_tpu.ops import fast_pool

        import flax.linen as nn

        x = jnp.asarray(rng.randn(3, 9, 9, 16), jnp.float32)
        ref = nn.avg_pool(x, (3, 3), (1, 1), ((1, 1), (1, 1)), count_include_pad=include_pad)
        with pltpu.force_tpu_interpret_mode():
            got = fast_pool._pallas_pool(x, include_pad)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-6, atol=1e-6)


class TestPallasKernels:
    def test_epilogue_matmul_vs_reference(self, rng):
        from jax.experimental.pallas import tpu as pltpu

        from tise_tpu.ops.pallas_kernels import epilogue_matmul

        a = rng.randn(100, 100).astype(np.float32)
        b = rng.randn(100, 100).astype(np.float32)
        with pltpu.force_tpu_interpret_mode():
            got = np.asarray(epilogue_matmul(jnp.asarray(a), jnp.asarray(b), alpha=3.0, beta=-1.0))
        ref = 3 * np.eye(100) - a @ b
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)

    def test_ns_pallas_matches_scipy_trace(self, rng):
        from tise_tpu.ops.pallas_kernels import newton_schulz_sqrtm_pallas

        s1 = _random_psd(rng, 96)
        s2 = _random_psd(rng, 96)
        prod = s1 @ s2
        y = np.asarray(newton_schulz_sqrtm_pallas(jnp.asarray(prod), iters=30))
        ref = np.trace(scipy.linalg.sqrtm(prod).real)
        assert abs(np.trace(y) - ref) / abs(ref) < 1e-3

    def test_frechet_ns_pallas_method(self, rng):
        mu = rng.randn(64)
        sigma = _random_psd(rng, 64)
        d = sqrtm.frechet_distance(mu, sigma, mu, sigma, method="ns-pallas")
        assert abs(d) < 1e-2
