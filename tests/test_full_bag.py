"""Full bag-of-metrics integration: a tiny synthetic world flows through
crop -> O-IS, SOA sweep -> scores, FID, IS-style scoring and the ranking
aggregation — exercising the file-format seams between stages
(BASELINE.json config #5)."""

import json
import os

import jax
import numpy as np
import pytest
from PIL import Image

from tise_tpu.backbones import inception_v3
from tise_tpu.backbones.detection.predictor import TPUDetector
from tise_tpu.core import io as result_io
from tise_tpu.metrics import crop_objects, fid as fid_metric, o_is, soa
from tise_tpu.ops import kl
from tise_tpu.ranking import ranking_score


@pytest.fixture(scope="module")
def world(tmp_path_factory):
    root = tmp_path_factory.mktemp("world")
    rng = np.random.RandomState(0)
    gen = root / "generated"
    os.makedirs(gen)
    for i in range(8):
        Image.fromarray(rng.randint(0, 256, (64, 64, 3)).astype(np.uint8)).save(gen / f"{i}.png")
    return root


@pytest.fixture(scope="module")
def inception_params():
    return inception_v3.random_params(jax.random.PRNGKey(0), num_classes=80)


class TestFullBag:
    def test_crop_then_o_is(self, world, inception_params):
        """detector crops -> crop folder -> O-IS over crops."""

        def stub_detector(files):
            return {
                f: (["dog"], [16], [np.array([4, 4, 40, 40], np.float32)]) for f in files
            }

        crops = str(world / "crops")
        n = crop_objects.crop_folder(stub_detector, str(world / "generated"), crops)
        assert n == 8
        ex = o_is.make_logits_extractor(inception_params)
        mean, std = o_is.compute_o_is(crops, ex, batch_size=4, splits=2)
        assert np.isfinite(mean) and mean >= 1.0  # exp(KL) >= 1

    def test_soa_sweep_to_scores(self, world):
        images = world / "soa"
        for label in ("label_00", "label_01"):
            d = images / label
            os.makedirs(d)
            rng = np.random.RandomState(1)
            for i in range(2):
                Image.fromarray(rng.randint(0, 256, (32, 32, 3)).astype(np.uint8)).save(d / f"{i}_0.png")

        def stub_detector(files):
            # detect class 0 in every image -> label_00 recall 1, label_01 recall 0
            return {f: (["person"], [0], [np.zeros(4, np.float32)]) for f in files}

        det_dir = str(world / "detections")
        soa.run_detection(str(images), det_dir, stub_detector, expect_folders=80)
        # write=False (the non-primary multi-host role) computes identical
        # scores but must not touch the result files
        dry = soa.calc_soa(det_dir, str(world / "soa.txt"), write=False)
        assert not os.path.exists(world / "soa.txt")
        assert not os.path.exists(os.path.join(det_dir, "result_file.pkl"))
        soa_c, soa_i, _t, _b = soa.calc_soa(det_dir, str(world / "soa.txt"))
        assert (soa_c, soa_i) == dry[:2]
        assert os.path.exists(world / "soa.txt")
        assert soa_c == 0.5 and soa_i == 0.5

    def test_fid_and_is_on_same_folder(self, world, inception_params):
        fid_ex = fid_metric.make_pool3_extractor(inception_params)
        mu, sigma = fid_metric.compute_statistics_of_path(str(world / "generated"), fid_ex, batch_size=4)
        assert mu.shape == (2048,)
        v = fid_metric.calculate_fid_given_paths(
            str(world / "generated"), str(world / "generated"), inception_params, batch_size=4, sqrtm_method="eigh"
        )
        assert abs(v) < 1e-2

    def test_save_stats_roundtrip(self, world, inception_params, tmp_path):
        """save_statistics caches mu/sigma identical to the in-memory stats,
        and the npz is a drop-in --path argument afterwards."""
        npz = str(tmp_path / "ref_stats.npz")
        fid_metric.save_statistics(str(world / "generated"), npz, inception_params, batch_size=4)
        fid_ex = fid_metric.make_pool3_extractor(inception_params)
        mu, sigma = fid_metric.compute_statistics_of_path(
            str(world / "generated"), fid_ex, batch_size=4
        )
        smu, ssigma = result_io.load_stats_npz(npz)
        np.testing.assert_allclose(smu, mu)
        np.testing.assert_allclose(ssigma, sigma)
        v = fid_metric.calculate_fid_given_paths(
            npz, str(world / "generated"), inception_params, batch_size=4, sqrtm_method="eigh"
        )
        assert abs(v) < 1e-2

    def test_save_stats_cli(self, world, tmp_path):
        """The --save_stats argv path: build the npz, then run a distance
        against it without --weights (npz-vs-npz needs no backbone)."""
        from tise_tpu.core import weights as wio

        w = str(tmp_path / "w.npz")
        wio.save_pytree_npz(w, inception_v3.random_params(jax.random.PRNGKey(1)))
        npz = str(tmp_path / "s.npz")
        fid_metric.main(
            ["--path1", str(world / "generated"), "--save_stats", npz,
             "--weights", w, "--batch-size", "4"]
        )
        out = str(tmp_path / "fid.txt")
        fid_metric.main(["--path1", npz, "--path2", npz, "--saved_file", out, "--sqrtm", "eigh"])
        assert abs(result_io.read_fid_result(out)) < 1e-2

    def test_ranking_from_metric_outputs(self, world):
        """Synthesized per-method metric values -> methods/*.json -> the
        ranking CLI output file."""
        methods = world / "methods"
        os.makedirs(methods, exist_ok=True)
        rng = np.random.RandomState(2)
        for name in ("ModelA", "ModelB", "ModelC"):
            vals = {m: float(abs(rng.randn()) * 10 + 1) for m in ranking_score.METRICS}
            with open(methods / f"{name}.json", "w") as f:
                json.dump(vals, f)
        out = str(world / "rank.txt")
        ranking_score.main(["--methods_dir", str(methods), "--output", out])
        table = open(out).read()
        assert "ModelA" in table and "RS" in table

    def test_detection_real_model_one_batch(self, world):
        """One real static-shape Faster R-CNN pass wired through the SOA
        sweep (random weights, small input)."""
        det = TPUDetector(None, batch_size=2, input_size=128)
        images = world / "soa_real"
        d = images / "label_02"
        os.makedirs(d)
        rng = np.random.RandomState(3)
        for i in range(2):
            Image.fromarray(rng.randint(0, 256, (32, 32, 3)).astype(np.uint8)).save(d / f"{i}_0.png")
        det_dir = str(world / "detections_real")
        soa.run_detection(str(images), det_dir, det.detect_files, expect_folders=80)
        assert os.path.isfile(os.path.join(det_dir, "detected_label_02.pkl"))
