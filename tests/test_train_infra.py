"""Training-infrastructure tests: checkpoint save/resume round-trip, logging
artifacts, dataset caption machinery, DAMSM pretraining step, and the
CounterModel stack."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tise_tpu.models import damsm_pretrain
from tise_tpu.models import datasets as ds
from tise_tpu.models.attngan_pp import trainer as T
from tise_tpu.models.attngan_pp.generator import GanConfig
from tise_tpu.models.attngan_pp.train_loop import CheckpointManager, ScalarWriter, make_logger
from tise_tpu.models.counter_model import trainer as CT


@pytest.fixture(scope="module")
def tiny_cfg():
    gan = GanConfig(gf_dim=8, df_dim=8, z_dim=8, condition_dim=8, embedding_dim=16, words_num=6)
    return T.TrainConfig(gan=gan, batch_size=2, ntoken=40)


class TestCheckpointing:
    def test_save_restore_roundtrip(self, tmp_path, tiny_cfg):
        models = T.build_models(tiny_cfg)
        state, _enc = T.init_state(tiny_cfg, models, jax.random.PRNGKey(0))
        mgr = CheckpointManager(str(tmp_path / "ckpt"), keep=2)
        mgr.save(jax.device_get(state), epoch=5)
        restored, epoch = mgr.restore(jax.device_get(state))
        assert epoch == 5
        a = jax.tree_util.tree_leaves(state.g_params)[0]
        b = jax.tree_util.tree_leaves(restored.g_params)[0]
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))

    def test_keep_policy_deletes_old(self, tmp_path, tiny_cfg):
        models = T.build_models(tiny_cfg)
        state, _ = T.init_state(tiny_cfg, models, jax.random.PRNGKey(0))
        mgr = CheckpointManager(str(tmp_path / "ckpt"), keep=1)
        host_state = jax.device_get(state)
        for e in (1, 2, 3):
            mgr.save(host_state, epoch=e)
        assert mgr.epochs() == [3]

    def test_logger_and_scalars(self, tmp_path):
        logger = make_logger(str(tmp_path))
        logger.info("hello")
        assert os.path.isfile(tmp_path / "train_history.log")
        w = ScalarWriter(str(tmp_path))
        w.write(3, {"g_loss": 1.5})
        line = open(tmp_path / "scalars.jsonl").read()
        assert '"g_loss": 1.5' in line and '"step": 3' in line


class TestDatasetMachinery:
    def test_tokenize_and_dictionary(self):
        train = [ds.tokenize("A small bird."), ds.tokenize("the bird sat")]
        test = [ds.tokenize("a red bird")]
        tr, te, ixtoword, wordtoix = ds.build_dictionary(train, test)
        assert ixtoword[0] == "<end>"
        assert wordtoix["bird"] > 0
        # encoded captions round-trip through the vocab
        assert [ixtoword[i] for i in tr[0]] == ["a", "small", "bird"]

    def test_pad_caption(self, tmp_path):
        d = ds.TextImageDataset.__new__(ds.TextImageDataset)
        d.words_num = 5
        d.rng = np.random.RandomState(0)
        x, l = d.pad_caption([3, 4, 5])
        np.testing.assert_array_equal(x, [3, 4, 5, 0, 0])
        assert l == 3
        x, l = d.pad_caption(list(range(1, 10)))
        assert l == 5 and (x > 0).all()
        assert list(x) == sorted(x, key=lambda v: list(range(1, 10)).index(v))  # order preserved

    def test_cub_bbox_crop(self):
        from PIL import Image

        im = Image.new("RGB", (100, 80))
        out = ds.cub_bbox_crop(im, [10, 10, 40, 20])  # r = 30, center (30, 20)
        assert out.size == (60, 50)  # x 0..60, y 0..50 clamped


class TestDamsmPretrain:
    def test_smoke_finite_and_trunk_frozen(self):
        cfg = damsm_pretrain.DamsmPretrainConfig(ntoken=60, embedding_dim=16, words_num=6)
        state, (rnn, cnn, tx) = damsm_pretrain.init_state(cfg, jax.random.PRNGKey(0))
        step = jax.jit(damsm_pretrain.make_train_step(cfg, rnn, cnn, tx))
        r = np.random.RandomState(0)
        images = jnp.asarray(r.rand(3, 96, 96, 3).astype(np.float32))
        caps = jnp.asarray(r.randint(1, 60, (3, 6)).astype(np.int32))
        lens = jnp.asarray([6, 4, 2], dtype=jnp.int32)
        cls = jnp.arange(3, dtype=jnp.int32)
        new_state, metrics = step(state, images, caps, lens, cls)
        assert np.isfinite(float(metrics["loss"]))
        # frozen trunk: inception weights unchanged; trainable heads moved
        old_trunk = state.cnn_params["trunk"]["Conv2d_1a_3x3"]["conv"]["kernel"]
        new_trunk = new_state.cnn_params["trunk"]["Conv2d_1a_3x3"]["conv"]["kernel"]
        np.testing.assert_allclose(np.asarray(old_trunk), np.asarray(new_trunk))
        old_head = state.cnn_params["emb_cnn_code"]["kernel"]
        new_head = new_state.cnn_params["emb_cnn_code"]["kernel"]
        assert not np.allclose(np.asarray(old_head), np.asarray(new_head))


class _DamsmStubDataset:
    """Minimal ``(len, batches)`` dataset for full-loop tests."""

    def __init__(self, n=4, words_num=6, size=96, ntoken=60, seed=1):
        self.n, self.words_num, self.size, self.ntoken, self.seed = n, words_num, size, ntoken, seed

    def __len__(self):
        return self.n

    def batches(self, batch_size, shuffle=True, **kw):
        r = np.random.RandomState(self.seed)
        for _ in range(self.n // batch_size):
            yield T.Batch(
                images=(r.rand(batch_size, self.size, self.size, 3).astype(np.float32) * 2 - 1,),
                captions=r.randint(1, self.ntoken, (batch_size, self.words_num)).astype(np.int32),
                cap_lens=r.randint(2, self.words_num + 1, (batch_size,)).astype(np.int32),
                class_ids=np.arange(batch_size, dtype=np.int32),
            )


class TestDamsmFullTraining:
    def test_lr_schedule_decay_and_floor(self):
        sched = damsm_pretrain.make_lr_schedule(2e-4, steps_per_epoch=10)
        assert float(sched(0)) == pytest.approx(2e-4)
        assert float(sched(9)) == pytest.approx(2e-4)  # constant within an epoch
        assert float(sched(10)) == pytest.approx(2e-4 * 0.98)
        # frozen once the decayed lr reaches lr0/10 (pretrain_DAMSM.py:365-366)
        lo = float(sched(10 * 1000))
        assert lo == pytest.approx(float(sched(10 * 2000)))
        assert 2e-4 / 10 * 0.9 < lo <= 2e-4 / 10

    def test_full_train_loop_artifacts(self, tmp_path):
        """Two epochs over a stub dataset: per-epoch validation, best-encoder
        npz export (loadable), snapshot checkpoints with keep-last."""
        from tise_tpu.core import weights as weights_io

        cfg = damsm_pretrain.DamsmPretrainConfig(
            ntoken=60, embedding_dim=16, words_num=6, batch_size=2, max_epoch=2, snapshot_interval=1
        )
        out = str(tmp_path / "damsm")
        state = damsm_pretrain.train(
            cfg, _DamsmStubDataset(n=4), out, val_dataset=_DamsmStubDataset(n=2, seed=2), log_every=1
        )
        assert int(state.step) == 2 * (4 // 2)
        assert os.path.isfile(os.path.join(out, "best_text_encoder.npz"))
        assert os.path.isfile(os.path.join(out, "train_history.log"))
        assert os.path.isfile(os.path.join(out, "scalars.jsonl"))
        enc = weights_io.load_pytree_npz(os.path.join(out, "best_image_encoder.npz"))
        assert "emb_cnn_code" in enc["params"]
        # keep-last checkpointing
        epochs = sorted(
            int(n.split("_")[1]) for n in os.listdir(os.path.join(out, "checkpoints"))
            if n.startswith("epoch_")
        )
        assert epochs == [2]


class TestCounterModel:
    def test_generator_emits_seven_scales(self):
        gan = GanConfig(gf_dim=8, df_dim=8, z_dim=8, condition_dim=8, embedding_dim=16, words_num=6)
        from tise_tpu.models.counter_model.generator import CounterGNet

        model = CounterGNet(cfg=gan)
        b = 2
        z = jnp.zeros((b, 8))
        sent = jnp.zeros((b, 16))
        words = jnp.zeros((b, 16, 6))
        mask = jnp.zeros((b, 6), bool)
        variables = model.init(jax.random.PRNGKey(0), z, sent, words, mask, jax.random.PRNGKey(1), train=True)
        (fakes, attn, mu, lv), _ = model.apply(
            variables, z, sent, words, mask, jax.random.PRNGKey(2), train=True, mutable=["batch_stats"]
        )
        assert [f.shape[1] for f in fakes] == [4, 8, 16, 32, 64, 128, 256]
        assert len(attn) == 2

    def test_multiscale_reals(self):
        img = jnp.ones((2, 256, 256, 3))
        scales = CT.multiscale_reals(img)
        assert [s.shape[1] for s in scales] == [4, 8, 16, 32, 64, 128, 256]

    def test_minibatch_stddev(self):
        from tise_tpu.models.counter_model.discriminator import minibatch_stddev

        x = jnp.asarray(np.random.RandomState(0).randn(4, 8, 8, 3).astype(np.float32))
        y = minibatch_stddev(x)
        assert y.shape == (4, 8, 8, 4)
        # constant channel, equal across batch and space
        chan = np.asarray(y[..., -1])
        assert np.allclose(chan, chan.flat[0])

    def test_smoke_train(self):
        metrics = CT.smoke_train(n_steps=1, batch_size=2)
        for k, v in metrics.items():
            assert np.isfinite(v), k

    def test_single_forward_vjp_matches_double_forward(self):
        """The counter step's vjp restructure (ONE G forward whose residuals
        serve both the D update's detached fakes and the post-D-update G
        backward) must match a naive transcription of the reference ordering
        (CounterModel/trainer.py:230-330) — a second identical G forward
        inside the G loss closure — to float tolerance.  Mirror of
        tests/test_attngan.py::test_single_forward_vjp_matches_double_forward
        for the MSG-D trainer."""
        import optax

        from dataclasses import replace

        from tise_tpu.models.attngan_pp import losses as L

        gan = GanConfig(gf_dim=8, df_dim=8, z_dim=8, condition_dim=8, embedding_dim=16, words_num=6)
        cfg = replace(CT.default_config(), gan=gan, batch_size=2, ntoken=40)
        models = CT.build_models(cfg)
        state, enc = CT.init_state(cfg, models, jax.random.PRNGKey(0))
        batch = T.synthetic_batch(cfg, np.random.RandomState(0), cfg.batch_size)
        rng = jax.random.PRNGKey(1)

        new_state, metrics = jax.jit(CT.make_train_step(cfg, models))(state, batch, enc, rng)

        def reference_step(state, batch, encoder_params, rng):
            dnet = models.dnet
            g_tx = optax.adam(cfg.g_lr, b1=cfg.beta1, b2=cfg.beta2)
            d_tx = optax.adam(cfg.d_lr, b1=cfg.beta1, b2=cfg.beta2)
            rng_ca, rng_z = jax.random.split(jax.random.fold_in(rng, state.step))
            words_embs, sent_emb = models.text_encoder.apply(
                encoder_params["text"], batch.captions, batch.cap_lens
            )
            words_embs = jax.lax.stop_gradient(words_embs)
            sent_emb = jax.lax.stop_gradient(sent_emb)
            mask = batch.captions == 0
            b = batch.captions.shape[0]
            z = jax.random.normal(rng_z, (b, cfg.gan.z_dim))
            reals = CT.multiscale_reals(batch.images[-1])

            def g_apply(g_params):
                return models.gnet.apply(
                    {"params": g_params, "batch_stats": state.g_batch_stats},
                    z, sent_emb, words_embs, mask, rng_ca, train=True, mutable=["batch_stats"],
                )

            (fakes, _a, _mu, _lv), _ = g_apply(state.g_params)
            fakes_sg = [jax.lax.stop_gradient(f) for f in fakes]

            def d_loss_fn(params):
                var = {"params": params, "spectral": state.d_spectral}
                real_h, mut = dnet.apply(var, reals, method=dnet.features, mutable=["spectral"])
                fake_h, _ = dnet.apply(var, fakes_sg, method=dnet.features, mutable=["spectral"])
                rc = dnet.apply(var, real_h, sent_emb, method=dnet.cond_logits, mutable=["spectral"])[0]
                fc = dnet.apply(var, fake_h, sent_emb, method=dnet.cond_logits, mutable=["spectral"])[0]
                wc = dnet.apply(var, real_h[: b - 1], sent_emb[1:], method=dnet.cond_logits, mutable=["spectral"])[0]
                ru = dnet.apply(var, real_h, method=dnet.uncond_logits, mutable=["spectral"])[0]
                fu = dnet.apply(var, fake_h, method=dnet.uncond_logits, mutable=["spectral"])[0]
                parts = L.discriminator_loss(rc, ru, fc, fu, wc)
                return parts.total, mut["spectral"]

            (_, new_spec), d_grads = jax.value_and_grad(d_loss_fn, has_aux=True)(state.d_params)
            d_updates, _ = d_tx.update(d_grads, state.d_opt, state.d_params)
            new_d_params = optax.apply_updates(state.d_params, d_updates)

            def g_loss_fn(g_params):
                (fakes_g, _aa, mu_g, logvar_g), _ = g_apply(g_params)  # SECOND forward
                var = {"params": new_d_params, "spectral": new_spec}
                h, _ = dnet.apply(var, fakes_g, method=dnet.features, mutable=["spectral"])
                cond = dnet.apply(var, h, sent_emb, method=dnet.cond_logits, mutable=["spectral"])[0]
                uncond = dnet.apply(var, h, method=dnet.uncond_logits, mutable=["spectral"])[0]
                total = L.generator_adv_loss(cond, uncond)
                region, cnn_code = models.image_encoder.apply(encoder_params["image"], fakes_g[-1])
                w_loss, s_loss = L.generator_damsm_loss(
                    region, cnn_code, words_embs, sent_emb, batch.cap_lens, batch.class_ids, cfg.damsm
                )
                return total + w_loss + s_loss + L.kl_loss(mu_g, logvar_g)

            g_loss, g_grads = jax.value_and_grad(g_loss_fn)(state.g_params)
            g_updates, _ = g_tx.update(g_grads, state.g_opt, state.g_params)
            return g_loss, optax.apply_updates(state.g_params, g_updates), new_d_params

        ref_g_loss, ref_g_params, ref_d_params = jax.jit(reference_step)(state, batch, enc, rng)
        np.testing.assert_allclose(float(metrics["g_loss"]), float(ref_g_loss), rtol=2e-5)
        jax.tree.map(
            lambda a, b_: np.testing.assert_allclose(a, b_, rtol=1e-4, atol=2e-6),
            new_state.g_params, ref_g_params,
        )
        jax.tree.map(
            lambda a, b_: np.testing.assert_allclose(a, b_, rtol=1e-4, atol=2e-6),
            new_state.d_params, ref_d_params,
        )

    def test_full_loop_via_shared_train(self, tmp_path):
        """train_loop.train(module=CT): the CounterModel plugs into the shared
        epoch/ckpt/log loop (the reference duplicates the whole trainer
        instead, CounterModel/trainer.py)."""
        from dataclasses import replace

        from tise_tpu.models.attngan_pp.train_loop import train

        gan = GanConfig(gf_dim=8, df_dim=8, z_dim=8, condition_dim=8, embedding_dim=16, words_num=6)
        cfg = replace(CT.default_config(), gan=gan, batch_size=2, ntoken=40, max_epoch=1, snapshot_interval=1)

        class _Stub:
            def __len__(self):
                return 2

            def batches(self, batch_size, **kw):
                r = np.random.RandomState(0)
                yield T.synthetic_batch(cfg, r, batch_size)

        out = str(tmp_path / "counter")
        state = train(cfg, _Stub(), out, module=CT, log_every=1)
        assert int(state.step) == 1
        assert os.path.isdir(os.path.join(out, "checkpoints", "epoch_1"))
        assert os.path.isfile(os.path.join(out, "train_history.log"))


class TestAugmentation:
    def test_augment_geometry(self):
        """Scale(76/64·crop on the shorter side) + RandomCrop + flip
        (pretrain_DAMSM.py:296-301) — output is always the crop square."""
        from PIL import Image

        d = ds.TextImageDataset.__new__(ds.TextImageDataset)
        d.imsizes = [64]
        d.rng = np.random.RandomState(0)
        for size in [(100, 80), (80, 100), (64, 64), (500, 90)]:
            out = d._augment(Image.new("RGB", size))
            assert out.size == (64, 64), size

    def test_augment_flip_and_crop_sampled(self):
        from PIL import Image

        d = ds.TextImageDataset.__new__(ds.TextImageDataset)
        d.imsizes = [32]
        d.rng = np.random.RandomState(0)
        base = np.zeros((64, 64, 3), np.uint8)
        base[:, :32, 0] = 255  # left half red
        outs = [np.asarray(d._augment(Image.fromarray(base))) for _ in range(8)]
        # crops/flips vary across draws
        assert len({o.tobytes() for o in outs}) > 1


class TestSampling:
    def _stub_dataset(self, tmp_path, n=4, words_num=5):
        from tise_tpu.models.datasets import TextImageDataset

        d = TextImageDataset.__new__(TextImageDataset)
        d.words_num = words_num
        d.embeddings_num = 1
        d.rng = np.random.RandomState(0)
        d.filenames = [f"f{i}" for i in range(n)]
        d.captions = [[1 + (i % 3), 2] for i in range(n)]
        d.ixtoword = {0: "<end>", 1: "a", 2: "bird", 3: "red"}
        d.wordtoix = {v: k for k, v in d.ixtoword.items()}
        d.n_words = 4
        d.class_id = np.arange(n)
        return d

    def test_train_time_r_precision_with_stub_scorer(self, tmp_path):
        from PIL import Image

        from tise_tpu.models import sampling

        ds = self._stub_dataset(tmp_path)
        for i in range(4):
            arr = np.full((256, 256, 3), i, np.uint8)
            Image.fromarray(arr).save(tmp_path / f"{i}.png")

        class StubScorer:
            max_len = 8

            def scores(self, images, caps, lens):
                b, k = caps.shape[0], caps.shape[1]
                out = np.zeros((b, k), np.float32)
                out[:, 0] = 1.0  # GT always wins
                return out

        rp = sampling.train_time_r_precision(ds, str(tmp_path), StubScorer(), batch_size=2)
        assert rp == 1.0


class TestDistributedInit:
    def test_single_process_distributed_bringup(self):
        """init_distributed with an explicit localhost coordinator brings up
        a 1-process jax.distributed cluster and the mesh builds over it
        (multi-host DCN path, SURVEY.md section 2.3; run in a subprocess
        because distributed init must precede first backend use)."""
        import os
        import socket
        import subprocess
        import sys

        with socket.socket() as s:
            s.bind(("127.0.0.1", 0))
            port = s.getsockname()[1]
        code = (
            "import jax; jax.config.update('jax_platforms', 'cpu'); "
            "from tise_tpu.parallel import init_distributed; "
            f"init_distributed('127.0.0.1:{port}', 1, 0); "
            "from tise_tpu.core.mesh import make_mesh; "
            "m = make_mesh(); "
            "print('DIST_OK', jax.process_count(), m.shape)"
        )
        env = {k: v for k, v in os.environ.items() if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
        proc = subprocess.run(
            [sys.executable, "-c", code],
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            env=env, capture_output=True, text=True, timeout=300,
        )
        assert proc.returncode == 0, proc.stderr[-2000:]
        assert "DIST_OK 1" in proc.stdout


class TestCompileCache:
    """The AOT-reload warning filter must drop exactly the proven-spurious
    prefer-no-* pseudo-feature mismatch (core/compile_cache.py) and nothing
    else."""

    _TMPL = (
        b"E0818 06:52:34.278201 4685 cpu_aot_loader.cc:210] Loading XLA:CPU "
        b"AOT result. Target machine feature +prefer-no-gather is not  "
        b"supported on the host machine. Machine type used for XLA:CPU "
        b"compilation doesn't match the machine type for execution. "
        b"Compile machine features: [%b] vs host machine features: [%b]. "
        b"This could lead to execution errors such as SIGILL."
    )

    def test_spurious_pseudo_feature_diff_dropped(self):
        from tise_tpu.core.compile_cache import _aot_warning_is_spurious

        line = self._TMPL % (
            b"+64bit,+avx,+avx2,+prefer-no-scatter,+prefer-no-gather,-fma4",
            b"64bit,avx,avx2",
        )
        assert _aot_warning_is_spurious(line)

    def test_real_feature_mismatch_kept(self):
        from tise_tpu.core.compile_cache import _aot_warning_is_spurious

        line = self._TMPL % (
            b"+64bit,+avx,+avx2,+avx512f,+prefer-no-gather",
            b"64bit,avx,avx2",  # host really lacks avx512f -> genuine risk
        )
        assert not _aot_warning_is_spurious(line)

    def test_unrelated_stderr_kept(self):
        from tise_tpu.core.compile_cache import _aot_warning_is_spurious

        assert not _aot_warning_is_spurious(b"Traceback (most recent call last):")
        assert not _aot_warning_is_spurious(b"Compile machine features: [+avx]")
