"""Golden-file regression: our ranking layer must reproduce the reference's
checked-in COCO benchmark table byte-for-byte from its methods/*.json inputs
(ranking_scores/results/coco_benchmark_results.txt)."""

import os

import numpy as np
import pytest

from tise_tpu.ranking import ranking_score

REF = "/root/reference/ranking_scores"

#: row order of the golden table (the reference uses filesystem order)
GOLDEN_ORDER = [
    "GAN-CLS",
    "StackGAN",
    "AttnGAN",
    "DM-GAN",
    "CPGAN",
    "DF-GAN",
    "AttnGAN + CL",
    "DM-GAN + CL",
    "DALLE-Mini",
    "AttnGAN++",
    "Real-Images",
]


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted")
class TestRankingGolden:
    def test_table_byte_identical(self):
        scores = ranking_score.load_method_scores(os.path.join(REF, "methods"), order=GOLDEN_ORDER)
        table = ranking_score.render_table(scores)
        with open(os.path.join(REF, "results", "coco_benchmark_results.txt")) as f:
            golden = f.read()
        assert table == golden

    def test_published_rs_values(self):
        scores = ranking_score.load_method_scores(os.path.join(REF, "methods"), order=GOLDEN_ORDER)
        mat = np.array(list(scores.values()))
        rs = ranking_score.ranking_scores(mat)
        expected = {"AttnGAN++": 56.0, "Real-Images": 65.0, "GAN-CLS": 7.0, "DM-GAN + CL": 51.5}
        for name, val in expected.items():
            assert rs[GOLDEN_ORDER.index(name)] == val


class TestRankingSemantics:
    def test_sign_flip_lower_is_better(self):
        # two methods, identical except FID (lower better): method B must win FID
        a = [10.0, 50.0, 1, 1, 1, 1, 10.0, 1.0, 1]
        b = [10.0, 20.0, 1, 1, 1, 1, 10.0, 1.0, 1]
        ranks = ranking_score.metric_ranks(np.array([a, b]))
        assert ranks[1, 1] == 2 and ranks[0, 1] == 1

    def test_rank_range(self, rng):
        mat = rng.rand(7, 9)
        ranks = ranking_score.metric_ranks(mat)
        for m in range(9):
            assert sorted(ranks[:, m]) == list(range(1, 8))
