"""End-to-end FID pipeline on tiny synthetic folders (random-init backbone):
self-FID is ~0, npz caching round-trips, streaming stats agree with the exact
reference semantics, and result files match the reference format."""

import os

import jax
import numpy as np
import pytest
from PIL import Image

from tise_tpu.backbones import inception_v3
from tise_tpu.core import io as result_io
from tise_tpu.core.data import ImageFolderLoader, list_images
from tise_tpu.metrics import fid as fid_metric


@pytest.fixture(scope="module")
def params():
    return inception_v3.random_params(jax.random.PRNGKey(0), num_classes=10)


def _write_images(root, n, seed, size=64):
    rng = np.random.RandomState(seed)
    os.makedirs(root, exist_ok=True)
    for i in range(n):
        arr = rng.randint(0, 256, (size, size, 3)).astype(np.uint8)
        Image.fromarray(arr).save(os.path.join(root, f"{i}.png"))


class TestFolderDataset:
    def test_list_and_batch(self, tmp_path):
        _write_images(tmp_path / "imgs", 5, 0)
        files = list_images(str(tmp_path / "imgs"))
        assert len(files) == 5
        loader = ImageFolderLoader(files, batch_size=4, image_size=32)
        batches = list(loader)
        assert len(batches) == 2
        assert batches[0].images.shape == (4, 32, 32, 3)
        assert batches[0].mask.all()
        assert batches[1].mask.sum() == 1

    def test_drop_last(self, tmp_path):
        _write_images(tmp_path / "imgs", 5, 0)
        loader = ImageFolderLoader.from_dir(str(tmp_path / "imgs"), 4, 32, drop_last=True)
        batches = list(loader)
        assert len(batches) == 1
        assert loader.num_images() == 4


class TestFidPipeline:
    def test_self_fid_near_zero(self, tmp_path, params):
        _write_images(tmp_path / "a", 24, seed=1)
        v = fid_metric.calculate_fid_given_paths(
            str(tmp_path / "a"), str(tmp_path / "a"), params, batch_size=8, sqrtm_method="eigh"
        )
        assert abs(v) < 1e-2

    def test_npz_round_trip(self, tmp_path, params):
        _write_images(tmp_path / "a", 16, seed=1)
        _write_images(tmp_path / "b", 16, seed=2)
        ex = fid_metric.make_pool3_extractor(params)
        m, s = fid_metric.compute_statistics_of_path(str(tmp_path / "a"), ex, batch_size=8)
        result_io.save_stats_npz(str(tmp_path / "a_stats.npz"), m, s)
        direct = fid_metric.calculate_fid_given_paths(
            str(tmp_path / "a"), str(tmp_path / "b"), params, batch_size=8, sqrtm_method="eigh"
        )
        cached = fid_metric.calculate_fid_given_paths(
            str(tmp_path / "a_stats.npz"), str(tmp_path / "b"), params, batch_size=8, sqrtm_method="eigh"
        )
        np.testing.assert_allclose(direct, cached, rtol=1e-6)

    def test_streaming_matches_exact(self, tmp_path, params):
        _write_images(tmp_path / "a", 20, seed=3)
        ex = fid_metric.make_pool3_extractor(params)
        m1, s1 = fid_metric.compute_statistics_of_path(str(tmp_path / "a"), ex, batch_size=8)
        m2, s2 = fid_metric.compute_statistics_of_path(str(tmp_path / "a"), ex, batch_size=8, streaming=True)
        np.testing.assert_allclose(m1, m2, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(s1, s2, rtol=1e-2, atol=1e-4)

    def test_legacy_compat_drops_tail(self, tmp_path, params):
        _write_images(tmp_path / "a", 10, seed=4)
        ex = fid_metric.make_pool3_extractor(params)
        loader_all = ImageFolderLoader.from_dir(str(tmp_path / "a"), 8, 299)
        loader_drop = ImageFolderLoader.from_dir(str(tmp_path / "a"), 8, 299, drop_last=True)
        acts_all = ex.run(loader_all, keys=("pool3",))["pool3"]
        acts_drop = ex.run(loader_drop, keys=("pool3",))["pool3"]
        assert acts_all.shape[0] == 10
        assert acts_drop.shape[0] == 8


class TestResultFormats:
    def test_fid_format(self, tmp_path):
        path = str(tmp_path / "fid.txt")
        result_io.write_fid_result(path, 26.581254719518654)
        assert open(path).read() == "FID: 26.581254719518654"

    def test_is_format(self, tmp_path):
        path = str(tmp_path / "is.txt")
        result_io.write_is_result(path, 15.13, 0.2)
        assert open(path).read() == "IS = 15.13  +-  0.2"

    def test_soa_format(self, tmp_path):
        path = str(tmp_path / "soa.txt")
        result_io.write_soa_result(path, 0.6783, 0.6997, 0.7530, 0.6036)
        text = open(path).read()
        assert "(SOA-C) is: 0.6783" in text
        assert "(SOA-I) is: 0.6997" in text
        assert "0.7530 and 0.6036" in text


class TestDeviceResize:
    def test_device_resize_close_to_host_path(self, tmp_path, params):
        """The --device-resize fast path must track the host-PIL path closely
        (antialiased bilinear vs PIL convolution resampling)."""
        _write_images(tmp_path / "a", 12, seed=7, size=64)
        ex_host = fid_metric.make_pool3_extractor(params)
        ex_dev = fid_metric.make_pool3_extractor(params, device_resize_from=64)
        m1, s1 = fid_metric.compute_statistics_of_path(str(tmp_path / "a"), ex_host, batch_size=6)
        m2, s2 = fid_metric.compute_statistics_of_path(
            str(tmp_path / "a"), ex_dev, batch_size=6, host_image_size=64
        )
        # random-init pool3 features are tiny; compare in relative scale
        denom = np.abs(m1).mean() + 1e-12
        assert np.abs(m1 - m2).mean() / denom < 0.15

    def test_resize_and_normalize_shape(self, rng):
        import jax.numpy as jnp

        from tise_tpu.ops.preprocess import resize_and_normalize

        u8 = rng.randint(0, 256, (2, 64, 64, 3)).astype(np.uint8)
        out = resize_and_normalize(jnp.asarray(u8), "fid", 299)
        assert out.shape == (2, 299, 299, 3)
