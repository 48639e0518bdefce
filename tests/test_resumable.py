"""Drop-tolerant streaming pipelines (VERDICT r4 #3).

The axon tunnel drops mid-run, and with AXON_JOURNAL_COMPACT=1 (the host-RSS
leak fix) the in-process backend cannot replay — so the streaming metric
pipelines snapshot their prefix state (rows/successes + file cursor)
periodically and resume, either in-process after a backend reset
(core/backend.py) or across a process re-run (the reference's SOA pickle
convention, SOA.py:77-79, generalized to FID/IS*/O-IS/O-FID/RP).

The tests kill the pipeline mid-run (an injected transport error) and assert
the resumed result is BIT-EQUAL to a straight run.
"""

import os

import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from tise_tpu.core import backend as backend_lib
from tise_tpu.core.data import ImageFolderLoader
from tise_tpu.metrics import extractor as ext
from tise_tpu.metrics.extractor import BatchedExtractor, run_resumable


def _apply_fn(params, x):
    return {"feat": jnp.concatenate([x.mean(axis=(1, 2)), x.max(axis=(1, 2))], axis=-1)}


def _make_images(folder, n, size=16, seed=0):
    rng = np.random.RandomState(seed)
    os.makedirs(folder, exist_ok=True)
    for i in range(n):
        Image.fromarray(rng.randint(0, 256, (size, size, 3)).astype(np.uint8)).save(
            os.path.join(folder, f"{i:03d}.png")
        )
    return sorted(os.path.join(folder, f) for f in os.listdir(folder))


class _Flaky:
    """Extractor wrapper that raises a transport-looking error on one call."""

    def __init__(self, inner: BatchedExtractor, fail_on_call: int, fuse: dict):
        self.inner = inner
        self.fail_on_call = fail_on_call
        self.fuse = fuse  # shared across rebuilds: blows exactly once
        self.calls = 0

    def __call__(self, images):
        self.calls += 1
        if self.calls == self.fail_on_call and not self.fuse.get("blown"):
            self.fuse["blown"] = True
            raise RuntimeError("UNAVAILABLE: TPU backend connection dropped (injected)")
        return self.inner(images)


@pytest.fixture
def world(tmp_path):
    files = _make_images(str(tmp_path / "imgs"), 11)  # 3 batches of 4,4,3
    oracle = BatchedExtractor(_apply_fn, {}, recipe="fid").run(
        ImageFolderLoader(files, 4, 16)
    )["feat"]
    return dict(files=files, oracle=oracle, snap=str(tmp_path / "snap.npz"))


class TestRunResumable:
    def test_parity_and_snapshot_cleanup(self, world):
        out = run_resumable(
            lambda: BatchedExtractor(_apply_fn, {}, recipe="fid"),
            world["files"], batch_size=4, image_size=16,
            snapshot_path=world["snap"], snapshot_every=4,
        )["feat"]
        np.testing.assert_array_equal(out, world["oracle"])
        assert not os.path.exists(world["snap"])  # completed run cleans up

    def test_inprocess_drop_resumes_from_snapshot(self, world, monkeypatch):
        resets = []
        monkeypatch.setattr(backend_lib, "reset_backend", lambda: resets.append(1))
        fuse: dict = {}
        builds = []

        def build():
            e = _Flaky(BatchedExtractor(_apply_fn, {}, recipe="fid"), fail_on_call=3, fuse=fuse)
            builds.append(e)
            return e

        out = run_resumable(
            build, world["files"], batch_size=4, image_size=16,
            snapshot_path=world["snap"], snapshot_every=4,
        )["feat"]
        np.testing.assert_array_equal(out, world["oracle"])
        assert resets == [1] and len(builds) == 2  # reset + extractor rebuild
        # the drop hit after the first snapshot (8 images flushed): the second
        # extractor only re-ran the remaining 3 files, not the whole list
        assert builds[1].calls == 1
        assert not os.path.exists(world["snap"])

    def test_drop_before_first_snapshot_restarts_clean(self, world, monkeypatch):
        monkeypatch.setattr(backend_lib, "reset_backend", lambda: None)
        fuse: dict = {}
        out = run_resumable(
            lambda: _Flaky(BatchedExtractor(_apply_fn, {}, recipe="fid"), 1, fuse),
            world["files"], batch_size=4, image_size=16,
            snapshot_path=world["snap"], snapshot_every=1000,
        )["feat"]
        np.testing.assert_array_equal(out, world["oracle"])

    def test_process_level_resume(self, world):
        """max_resets=0: the drop propagates (in-process recovery exhausted /
        unavailable) but the snapshot survives; a fresh invocation — the
        re-run of the same CLI command — resumes from it bit-equal."""
        fuse: dict = {}
        with pytest.raises(RuntimeError, match="UNAVAILABLE"):
            run_resumable(
                lambda: _Flaky(BatchedExtractor(_apply_fn, {}, recipe="fid"), 3, fuse),
                world["files"], batch_size=4, image_size=16,
                snapshot_path=world["snap"], snapshot_every=4, max_resets=0,
            )
        assert os.path.exists(world["snap"])  # durable state left behind
        second = _Flaky(BatchedExtractor(_apply_fn, {}, recipe="fid"), 10 ** 9, {})
        out = run_resumable(
            lambda: second, world["files"], batch_size=4, image_size=16,
            snapshot_path=world["snap"], snapshot_every=4,
        )["feat"]
        np.testing.assert_array_equal(out, world["oracle"])
        assert second.calls == 1  # resumed at the snapshot (3 files left), not from scratch
        assert not os.path.exists(world["snap"])

    def test_programming_errors_propagate(self, world, monkeypatch):
        calls = []
        monkeypatch.setattr(backend_lib, "reset_backend", lambda: calls.append(1))

        class Broken:
            def __call__(self, images):
                raise ValueError("not a transport error")

        with pytest.raises(ValueError):
            run_resumable(
                lambda: Broken(), world["files"], batch_size=4, image_size=16,
                snapshot_path=world["snap"], snapshot_every=4,
            )
        assert calls == []  # no retry on non-transport errors

    def test_stale_fingerprint_ignored(self, world):
        # snapshot from a DIFFERENT file list must not poison this run
        ext._save_snapshot(
            world["snap"], "deadbeef", {"feat": [np.zeros((4, 6), np.float32)]}, 4
        )
        out = run_resumable(
            lambda: BatchedExtractor(_apply_fn, {}, recipe="fid"),
            world["files"], batch_size=4, image_size=16,
            snapshot_path=world["snap"], snapshot_every=4,
        )["feat"]
        np.testing.assert_array_equal(out, world["oracle"])


class TestCropResume:
    def _world(self, tmp_path, n=9):
        src = str(tmp_path / "src")
        rng = np.random.RandomState(0)
        os.makedirs(src)
        for i in range(n):
            Image.fromarray(rng.randint(0, 256, (64, 64, 3)).astype(np.uint8)).save(
                os.path.join(src, f"{i}.png")
            )
        return src

    @staticmethod
    def _stub(files):
        return {f: (["dog"], [16], [np.array([4, 4, 40, 40], np.float32)]) for f in files}

    def test_crop_slab_drop_resumes(self, tmp_path, monkeypatch):
        """A transport drop mid-sweep costs one slab, not the run (the r4
        track lost a 53-minute 30k crop sweep to exactly this); filenames of
        the replayed slab are identical (overwrite, no duplicates)."""
        from tise_tpu.metrics import crop_objects

        src = self._world(tmp_path)
        oracle_dir = str(tmp_path / "oracle")
        crop_objects.crop_folder(self._stub, src, oracle_dir, slab=4)
        oracle = sorted(os.listdir(oracle_dir))

        monkeypatch.setattr(backend_lib, "reset_backend", lambda: None)
        calls = {"n": 0}

        def flaky(files):
            calls["n"] += 1
            if calls["n"] == 2:
                raise RuntimeError("UNAVAILABLE: injected drop")
            return self._stub(files)

        dest = str(tmp_path / "crops")
        n = crop_objects.crop_folder(flaky, src, dest, slab=4, build_detector=lambda: self._stub)
        assert n == 9
        assert sorted(os.listdir(dest)) == oracle
        assert not any(f.startswith(".crop_progress") for f in os.listdir(dest))

    def test_crop_process_level_resume(self, tmp_path):
        """A killed process resumes from the sentinel: only the unfinished
        slabs re-run, and the final folder matches a straight run."""
        from tise_tpu.metrics import crop_objects

        src = self._world(tmp_path)
        oracle_dir = str(tmp_path / "oracle")
        crop_objects.crop_folder(self._stub, src, oracle_dir, slab=4)
        oracle = sorted(os.listdir(oracle_dir))

        def dies(files):
            if any(f.endswith("8.png") for f in files):  # last slab
                raise RuntimeError("UNAVAILABLE: injected kill")
            return self._stub(files)

        dest = str(tmp_path / "crops")
        with pytest.raises(RuntimeError, match="UNAVAILABLE"):
            crop_objects.crop_folder(dies, src, dest, slab=4, max_resets=0)
        assert any(f.startswith(".crop_progress") for f in os.listdir(dest))

        seen = []

        def second(files):
            seen.extend(files)
            return self._stub(files)

        n = crop_objects.crop_folder(second, src, dest, slab=4)
        assert n == 9
        assert len(seen) == 1  # only the last slab re-ran
        assert sorted(f for f in os.listdir(dest)) == oracle


class TestSoaSweepReset:
    def test_soa_drop_resets_and_continues(self, tmp_path, monkeypatch):
        """One soa invocation rides through a transport drop: the current
        label retries after a backend reset + detector rebuild; already-
        written per-label pickles are untouched."""
        from tise_tpu.metrics import soa

        root = tmp_path / "images"
        rng = np.random.RandomState(0)
        for lbl in ("label_00", "label_01", "label_02"):
            d = root / lbl
            os.makedirs(d)
            for i in range(2):
                Image.fromarray(rng.randint(0, 256, (32, 32, 3)).astype(np.uint8)).save(
                    d / f"{i}_2.png"
                )
        monkeypatch.setattr(backend_lib, "reset_backend", lambda: None)

        def stub(files):
            return {f: (["dog"], [16], [np.array([1, 1, 9, 9], np.float32)]) for f in files}

        calls = {"n": 0}

        def flaky(files):
            calls["n"] += 1
            if calls["n"] == 2:
                raise RuntimeError("UNAVAILABLE: injected drop")
            return stub(files)

        out = str(tmp_path / "det")
        soa.run_detection(str(root), out, flaky, expect_folders=3, build_detector=lambda: stub)
        assert sorted(f for f in os.listdir(out) if f.startswith("detected_")) == [
            "detected_label_00.pkl", "detected_label_01.pkl", "detected_label_02.pkl"
        ]
        sc, si, _, _ = soa.calc_soa(out, "", write=False)
        assert sc == 0.0 and si == 0.0  # stub detects class 16 != labels 0-2


class TestRpSnapshot:
    def _world(self, tmp_path, n=20):
        import sys

        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from test_metric_logic import _StubScorer, _StubTokenizer, _write_indexed_images

        items = [
            {"caption_id": i, "caption": f"c{i}", "mismatched_captions": [f"m{j}" for j in range(9)]}
            for i in range(n)
        ]
        img_dir = str(tmp_path / "imgs")
        _write_indexed_images(img_dir, range(n))
        paths = [os.path.join(img_dir, f"{i}.png") for i in range(n)]
        return items, paths, _StubScorer, _StubTokenizer

    def test_rp_snapshot_parity_after_drop(self, tmp_path, monkeypatch):
        from tise_tpu.metrics import rp_coco

        items, paths, Scorer, Tok = self._world(tmp_path)
        oracle = rp_coco.score_items(items, paths, Scorer(), Tok(), batch_size=4)

        monkeypatch.setattr(backend_lib, "reset_backend", lambda: None)
        snap = str(tmp_path / "rp.snapshot.npz")

        class FlakyScorer(Scorer):
            calls = 0
            blown = False

            def logits_from_bank(self, images, bank, idx):
                FlakyScorer.calls += 1
                if FlakyScorer.calls == 3 and not FlakyScorer.blown:
                    FlakyScorer.blown = True
                    raise RuntimeError("UNAVAILABLE: injected drop")
                return super().logits_from_bank(images, bank, idx)

        got = rp_coco.score_items(
            items, paths, FlakyScorer(), Tok(), batch_size=4,
            snapshot_path=snap, build_scorer=FlakyScorer, snapshot_every=4,
        )
        np.testing.assert_array_equal(got, oracle)
        assert not os.path.exists(snap)

    def test_rp_pipelined_path_parity_and_drop(self, tmp_path, monkeypatch):
        """The 1-deep in-flight window (dispatch_from_bank/pull_logits) must
        produce the same successes as the blocking path, including when a
        drop surfaces at PULL time with a batch in flight."""
        from tise_tpu.metrics import rp_coco

        items, paths, Scorer, Tok = self._world(tmp_path)
        oracle = rp_coco.score_items(items, paths, Scorer(), Tok(), batch_size=4)
        monkeypatch.setattr(backend_lib, "reset_backend", lambda: None)
        snap = str(tmp_path / "rp2.snapshot.npz")

        class PipelinedScorer(Scorer):
            pulls = 0
            blown = False

            def dispatch_from_bank(self, images, bank, idx):
                return (self.logits_from_bank(images, bank, idx), len(images))

            @staticmethod
            def pull_logits(inflight):
                PipelinedScorer.pulls += 1
                if PipelinedScorer.pulls == 2 and not PipelinedScorer.blown:
                    PipelinedScorer.blown = True
                    raise RuntimeError("UNAVAILABLE: injected drop at pull")
                dev, b = inflight
                return np.asarray(dev)[:b]

        got = rp_coco.score_items(
            items, paths, PipelinedScorer(), Tok(), batch_size=4,
            snapshot_path=snap, build_scorer=PipelinedScorer, snapshot_every=4,
        )
        np.testing.assert_array_equal(got, oracle)
        assert PipelinedScorer.pulls > 2  # the pipelined branch actually ran
        assert not os.path.exists(snap)


class TestPaSnapshot:
    def _world(self, tmp_path):
        import sys

        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from test_metric_logic import _StubScorer, _StubTokenizer, _write_indexed_images

        data = {
            "left": [{"caption_id": i, "caption": "c", "false_caption": "f"} for i in range(4)],
            "right": [{"caption_id": i, "caption": "c", "false_caption": "f"} for i in range(4, 6)],
            "above": [{"caption_id": i, "caption": "c", "false_caption": "f"} for i in range(6, 9)],
        }
        img_dir = tmp_path / "imgs"
        for phrase in data:
            _write_indexed_images(str(img_dir / phrase), [it["caption_id"] for it in data[phrase]])
        return data, str(img_dir), _StubScorer, _StubTokenizer

    def test_pa_drop_resets_and_reruns_phrase(self, tmp_path, monkeypatch):
        from tise_tpu.metrics import pa as pa_metric

        data, img_dir, Scorer, Tok = self._world(tmp_path)
        oracle, oracle_res = pa_metric.compute_pa(data, img_dir, Scorer(), Tok(), batch_size=3)

        monkeypatch.setattr(backend_lib, "reset_backend", lambda: None)
        snap = str(tmp_path / "pa.snapshot.npz")

        class FlakyScorer(Scorer):
            calls = 0
            blown = False

            def logits(self, images, tokens):
                FlakyScorer.calls += 1
                if FlakyScorer.calls == 3 and not FlakyScorer.blown:
                    FlakyScorer.blown = True  # mid-'right' (after left's 2 batches)
                    raise RuntimeError("UNAVAILABLE: injected drop")
                return super().logits(images, tokens)

        got, got_res = pa_metric.compute_pa(
            data, img_dir, FlakyScorer(), Tok(), batch_size=3,
            snapshot_path=snap, build_scorer=FlakyScorer,
        )
        assert got == oracle and got_res == oracle_res
        assert not os.path.exists(snap)

    def test_pa_process_level_resume_skips_done_phrases(self, tmp_path):
        from tise_tpu.metrics import pa as pa_metric

        data, img_dir, Scorer, Tok = self._world(tmp_path)
        oracle, oracle_res = pa_metric.compute_pa(data, img_dir, Scorer(), Tok(), batch_size=3)
        snap = str(tmp_path / "pa.snapshot.npz")

        class DiesInAbove(Scorer):
            def logits(self, images, tokens):
                if int(images[0, 0, 0, 0]) >= 6:  # first 'above' item
                    raise RuntimeError("UNAVAILABLE: injected kill")
                return super().logits(images, tokens)

        # build_scorer=None: in-process recovery unavailable -> propagates,
        # but the completed phrases survive in the snapshot
        with pytest.raises(RuntimeError, match="UNAVAILABLE"):
            pa_metric.compute_pa(
                data, img_dir, DiesInAbove(), Tok(), batch_size=3, snapshot_path=snap,
            )
        assert os.path.exists(snap)

        class Counting(Scorer):
            phrases_seen = set()

            def logits(self, images, tokens):
                Counting.phrases_seen.add(int(images[0, 0, 0, 0]))
                return super().logits(images, tokens)

        got, got_res = pa_metric.compute_pa(
            data, img_dir, Counting(), Tok(), batch_size=3, snapshot_path=snap,
        )
        assert got == oracle and got_res == oracle_res
        assert Counting.phrases_seen == {6}  # only 'above' re-ran
        assert not os.path.exists(snap)


class TestCaSnapshot:
    class _StubEngine:
        """Deterministic counter stand-in: predicts {dog: idx%3} from the
        image's first pixel (constant images survive the 448px resize)."""

        calls = 0

        def count_batch(self, images):
            TestCaSnapshot._StubEngine.calls += 1
            return [{"dog": float(int(images[i, 0, 0, 0]) % 3)} for i in range(images.shape[0])]

    def _world(self, tmp_path, n=12):
        import sys

        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from test_metric_logic import _write_indexed_images

        data = [
            {"caption_id": i, "counting_info": {"dog": 2.0, "cat": 1.0}} for i in range(n)
        ]
        img_dir = str(tmp_path / "imgs")
        _write_indexed_images(img_dir, range(n), size=32)
        return data, img_dir

    def test_ca_snapshot_parity_after_drop(self, tmp_path, monkeypatch):
        from tise_tpu.metrics import ca as ca_metric

        data, img_dir = self._world(tmp_path)
        oracle = ca_metric.compute_ca(data, img_dir, self._StubEngine(), batch_size=4)

        monkeypatch.setattr(backend_lib, "reset_backend", lambda: None)
        snap = str(tmp_path / "ca.snapshot.npz")
        fuse = {}

        class Flaky(self._StubEngine):
            def count_batch(self, images):
                if not fuse.get("blown") and int(images[0, 0, 0, 0]) == 8:
                    fuse["blown"] = True  # 3rd batch: after one snapshot (every 8)
                    raise RuntimeError("UNAVAILABLE: injected drop")
                return super().count_batch(images)

        got = ca_metric.compute_ca(
            data, img_dir, Flaky(), batch_size=4,
            snapshot_path=snap, build_engine=Flaky, snapshot_every=8,
        )
        assert got == oracle
        assert not os.path.exists(snap)

    def test_ca_process_level_resume(self, tmp_path):
        from tise_tpu.metrics import ca as ca_metric

        data, img_dir = self._world(tmp_path)
        oracle = ca_metric.compute_ca(data, img_dir, self._StubEngine(), batch_size=4)
        snap = str(tmp_path / "ca.snapshot.npz")

        class Dies(self._StubEngine):
            def count_batch(self, images):
                if int(images[0, 0, 0, 0]) == 8:
                    raise RuntimeError("UNAVAILABLE: injected kill")
                return super().count_batch(images)

        with pytest.raises(RuntimeError, match="UNAVAILABLE"):
            ca_metric.compute_ca(
                data, img_dir, Dies(), batch_size=4, snapshot_path=snap, snapshot_every=8,
            )
        assert os.path.exists(snap)

        calls_before = self._StubEngine.calls
        got = ca_metric.compute_ca(
            data, img_dir, self._StubEngine(), batch_size=4, snapshot_path=snap, snapshot_every=8,
        )
        assert got == oracle
        assert self._StubEngine.calls - calls_before == 1  # resumed at the cursor
        assert not os.path.exists(snap)


class TestResetBackend:
    def test_real_reset_roundtrip_on_cpu(self):
        """Drives the REAL reset path (native hook + registry re-init +
        probe) on the CPU backend — the monkeypatched drop tests above never
        execute it."""
        status = backend_lib._native_reset()
        assert isinstance(status, str) and status  # never raises
        backend_lib.reset_backend(max_wait_s=30)
        import jax
        import numpy as np

        x = jax.device_put(np.ones((4,), np.float32))
        assert float(jax.numpy.sum(x)) == 4.0


class TestRpCubSnapshot:
    def _world(self, tmp_path, n=12):
        import sys

        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from test_metric_logic import _write_indexed_images

        data = [
            {"caption_id": i, "caption": "this bird has a red wing",
             "mismatched_captions": ["this bird has a red tail"] * 3}
            for i in range(n)
        ]
        wordtoix = {w: j for j, w in enumerate(
            ["<end>", "this", "bird", "has", "a", "red", "wing", "tail"])}
        img_dir = str(tmp_path / "imgs")
        _write_indexed_images(img_dir, range(n), size=32)
        return data, img_dir, wordtoix

    class _StubScorer:
        """Deterministic DAMSM stand-in: item idx%2 ranks the true caption
        first (images are constant-valued, surviving the 256px resize)."""

        max_len = 16

        def scores(self, images, caps, lens):
            b, k = caps.shape[0], caps.shape[1]
            out = np.zeros((b, k))
            for i in range(b):
                out[i, 0] = 1.0 if int(images[i, 0, 0, 0]) % 2 == 0 else -1.0
            return out

    def test_rp_cub_snapshot_parity_after_drop(self, tmp_path, monkeypatch):
        from tise_tpu.metrics import rp_cub

        data, img_dir, wordtoix = self._world(tmp_path)
        oracle = rp_cub.compute_rp_cub(data, img_dir, self._StubScorer(), wordtoix, batch_size=4)

        monkeypatch.setattr(backend_lib, "reset_backend", lambda: None)
        snap = str(tmp_path / "rp_cub.snapshot.npz")
        fuse = {}

        class Flaky(self._StubScorer):
            def scores(self, images, caps, lens):
                if not fuse.get("blown") and int(images[0, 0, 0, 0]) == 8:
                    fuse["blown"] = True  # 3rd batch: after one snapshot (every 8)
                    raise RuntimeError("UNAVAILABLE: injected drop")
                return super().scores(images, caps, lens)

        got = rp_cub.compute_rp_cub(
            data, img_dir, Flaky(), wordtoix, batch_size=4,
            snapshot_path=snap, build_scorer=Flaky, snapshot_every=8,
        )
        assert got == oracle
        assert not os.path.exists(snap)

    def test_rp_cub_process_level_resume(self, tmp_path):
        from tise_tpu.metrics import rp_cub

        data, img_dir, wordtoix = self._world(tmp_path)
        oracle = rp_cub.compute_rp_cub(data, img_dir, self._StubScorer(), wordtoix, batch_size=4)
        snap = str(tmp_path / "rp_cub.snapshot.npz")

        class Dies(self._StubScorer):
            def scores(self, images, caps, lens):
                if int(images[0, 0, 0, 0]) == 8:
                    raise RuntimeError("UNAVAILABLE: injected kill")
                return super().scores(images, caps, lens)

        with pytest.raises(RuntimeError, match="UNAVAILABLE"):
            rp_cub.compute_rp_cub(
                data, img_dir, Dies(), wordtoix, batch_size=4,
                snapshot_path=snap, snapshot_every=8,
            )
        assert os.path.exists(snap)

        seen = []

        class Counting(self._StubScorer):
            def scores(self, images, caps, lens):
                seen.append(int(images[0, 0, 0, 0]))
                return super().scores(images, caps, lens)

        got = rp_cub.compute_rp_cub(
            data, img_dir, Counting(), wordtoix, batch_size=4,
            snapshot_path=snap, snapshot_every=8,
        )
        assert got == oracle
        assert seen == [8]  # resumed at the cursor, one batch left
        assert not os.path.exists(snap)
