"""Auxiliary subsystem tests: generation layouts, visualisation grids,
profiling meter, download skip-existing, main.py parser defaults."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from tise_tpu.core import download
from tise_tpu.core.profiling import ThroughputMeter
from tise_tpu.models import generate, visualize
from tise_tpu.models.attngan_pp.generator import GanConfig, GNet


@pytest.fixture(scope="module")
def tiny_generator():
    gan = GanConfig(gf_dim=8, df_dim=8, z_dim=8, condition_dim=8, embedding_dim=16, words_num=6)
    g = GNet(cfg=gan)
    v = g.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 8)),
        jnp.zeros((1, 16)),
        jnp.zeros((1, 16, 6)),
        jnp.zeros((1, 6), bool),
        jax.random.PRNGKey(1),
        train=True,
    )
    from tise_tpu.backbones import damsm

    t = damsm.RNNEncoder(ntoken=12, nhidden=8)
    tp = t.init(jax.random.PRNGKey(2), jnp.zeros((1, 6), jnp.int32), jnp.ones((1,), jnp.int32))
    gen = generate.CaptionGenerator(v["params"], v["batch_stats"], tp, gan=gan, ntoken=12, seed=7)
    wordtoix = {"a": 1, "bird": 2, "red": 3}
    return gen, wordtoix


class TestGeneration:
    def test_flat_layout(self, tmp_path, tiny_generator):
        gen, vocab = tiny_generator
        items = [{"caption_id": 10 + i, "caption": "a red bird"} for i in range(3)]
        n = generate.generate_flat(items, str(tmp_path), gen, vocab, batch_size=2, words_num=6)
        assert n == 3
        assert sorted(os.listdir(tmp_path)) == ["10.png", "11.png", "12.png"]
        with Image.open(tmp_path / "10.png") as im:
            assert im.size == (256, 256)

    def test_soa_layout_indexed(self, tmp_path, tiny_generator):
        gen, vocab = tiny_generator
        data = {"label_00": [{"caption_id": 5, "caption": "a bird"}]}
        n = generate.generate_grouped(
            data, str(tmp_path), gen, vocab, batch_size=2, words_num=6, images_per_caption=3, indexed_names=True
        )
        assert n == 3
        assert sorted(os.listdir(tmp_path / "label_00")) == ["5_0.png", "5_1.png", "5_2.png"]

    def test_deterministic_given_seed(self, tmp_path, tiny_generator):
        gen, vocab = tiny_generator
        items = [{"caption_id": 1, "caption": "a bird"}]
        generate.generate_flat(items, str(tmp_path / "a"), gen, vocab, batch_size=1, words_num=6)
        generate.generate_flat(items, str(tmp_path / "b"), gen, vocab, batch_size=1, words_num=6)
        a = np.asarray(Image.open(tmp_path / "a" / "1.png"))
        b = np.asarray(Image.open(tmp_path / "b" / "1.png"))
        np.testing.assert_array_equal(a, b)


class TestGenExample:
    def test_read_example_captions_sorting(self, tmp_path):
        """main.py:59-67 parity: captions sorted by desc token length, array
        padded to the file's max length, original indices preserved."""
        from tise_tpu.models import gen_example

        (tmp_path / "example_filenames.txt").write_text("captions/demo\n\n")
        (tmp_path / "captions").mkdir()
        (tmp_path / "captions" / "demo.txt").write_text("a bird\na red red red bird\n\nred\n")
        wordtoix = {"a": 1, "bird": 2, "red": 3}
        data = gen_example.read_example_captions(str(tmp_path), wordtoix)
        assert list(data) == ["demo"]
        caps, lens, order = data["demo"]
        np.testing.assert_array_equal(lens, [5, 2, 1])
        np.testing.assert_array_equal(order, [1, 0, 2])
        np.testing.assert_array_equal(caps[0], [1, 3, 3, 3, 2])
        np.testing.assert_array_equal(caps[2], [3, 0, 0, 0, 0])

    def test_cli_end_to_end(self, tmp_path, tiny_generator):
        """gen_example.main writes the reference's 0_s_<idx>_g<k>.png layout
        (trainer.py:694-706) plus attention super-images."""
        import pickle

        from tise_tpu.backbones import damsm
        from tise_tpu.core import weights as weights_io
        from tise_tpu.models import gen_example

        gan = GanConfig(gf_dim=8, df_dim=8, z_dim=8, condition_dim=8, embedding_dim=16, words_num=6)
        g = GNet(cfg=gan)
        v = g.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 8)), jnp.zeros((1, 16)),
            jnp.zeros((1, 16, 6)), jnp.zeros((1, 6), bool), jax.random.PRNGKey(1), train=True,
        )
        t = damsm.RNNEncoder(ntoken=5, nhidden=8)
        tp = t.init(jax.random.PRNGKey(2), jnp.zeros((1, 6), jnp.int32), jnp.ones((1,), jnp.int32))
        weights_io.save_pytree_npz(str(tmp_path / "g.npz"), {"g_ema": v["params"], "g_batch_stats": v["batch_stats"]})
        weights_io.save_pytree_npz(str(tmp_path / "t.npz"), tp)
        ixtoword = {0: "<pad>", 1: "a", 2: "bird", 3: "red", 4: "blue"}
        wordtoix = {w: i for i, w in ixtoword.items()}
        with open(tmp_path / "captions.pickle", "wb") as f:
            pickle.dump([None, None, ixtoword, wordtoix], f)
        (tmp_path / "example_filenames.txt").write_text("demo\n")
        (tmp_path / "demo.txt").write_text("a red bird\na blue bird\n")

        gen_example.main([
            "--data_dir", str(tmp_path), "--output_dir", str(tmp_path / "out"),
            "--checkpoint", str(tmp_path / "g.npz"), "--text_encoder", str(tmp_path / "t.npz"),
            "--captions_pickle", str(tmp_path / "captions.pickle"),
            "--words_num", "6", "--gf_dim", "8", "--z_dim", "8",
            "--condition_dim", "8", "--embedding_dim", "16",
        ])
        files = sorted(os.listdir(tmp_path / "out" / "demo"))
        # 2 captions x (3 scales + 1 attention grid)
        assert files == [
            "0_s_0_attn.png", "0_s_0_g0.png", "0_s_0_g1.png", "0_s_0_g2.png",
            "0_s_1_attn.png", "0_s_1_g0.png", "0_s_1_g1.png", "0_s_1_g2.png",
        ]
        with Image.open(tmp_path / "out" / "demo" / "0_s_0_g2.png") as im:
            assert im.size == (256, 256)
        with Image.open(tmp_path / "out" / "demo" / "0_s_0_g0.png") as im:
            assert im.size == (64, 64)


class TestVisualize:
    def test_super_image_grid(self, tmp_path):
        b, h, t, ah = 2, 32, 4, 8
        rng = np.random.RandomState(0)
        images = rng.rand(b, h, h, 3).astype(np.float32) * 2 - 1
        attn = rng.rand(b, t, ah, ah).astype(np.float32)
        caps = np.array([[1, 2, 3, 0], [2, 1, 0, 0]])
        lens = np.array([3, 2])
        path = str(tmp_path / "grid.png")
        visualize.save_img_results(path, images, attn, caps, lens, {1: "a", 2: "bird", 3: "red"})
        with Image.open(path) as im:
            assert im.size[0] == (1 + 8) * h  # 1 image + max_words columns


class TestProfiling:
    def test_meter(self, capsys):
        m = ThroughputMeter(name="x", log_every=2)
        m.update(10)
        m.update(10)
        out = capsys.readouterr().out
        assert "[x]" in out and "images/sec" in out
        summary = json.loads(m.summary())
        assert summary["images"] == 20


class TestDownload:
    def test_skip_existing(self, tmp_path, capsys):
        dest = tmp_path / "file.zip"
        dest.write_bytes(b"x")
        out = download.fetch_and_unzip("fake_id", str(dest))
        assert out == str(dest)
        assert "skipping" in capsys.readouterr().out

    def test_file_id_with_directory_dest(self, tmp_path, monkeypatch):
        """--file_id with --dest pointing at an existing directory (notably
        the '.' default) must download into the directory, not skip because
        the directory 'exists' (regression)."""

        def fake_fetch(file_id, dest):
            with open(dest, "wb") as f:
                f.write(b"payload")
            return dest

        monkeypatch.setattr(download, "download_from_google_drive", fake_fetch)
        download.main(["--file_id", "some_id", "--dest", str(tmp_path)])
        assert (tmp_path / "some_id").read_bytes() == b"payload"


class TestMainParser:
    def test_reference_defaults(self):
        from tise_tpu.models.main import get_parameters

        args = get_parameters().parse_args(
            ["--data_dir", "d", "--net_e", "t.npz", "--image_encoder", "i.npz"]
        )
        assert args.batch_size == 64 and args.max_epoch == 600
        assert args.d_lr == 2e-4 and args.g_lr == 2e-4
        assert args.gf_dim == 128 and args.z_dim == 100 and args.words_num == 18
