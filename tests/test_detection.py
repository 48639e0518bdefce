"""Detection stack tests: box ops vs naive math, static NMS vs the greedy
sequential algorithm, ROIAlign exactness on linear feature maps, and the
full static-shape Faster R-CNN + folder predictor smoke (random weights).
SOA/crop orchestration math is covered with synthetic detection pickles."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from tise_tpu.backbones.detection import ops
from tise_tpu.core import io as result_io
from tise_tpu.metrics import soa


class TestBoxOps:
    def test_iou_known_values(self):
        a = jnp.asarray([[0, 0, 10, 10]], jnp.float32)
        b = jnp.asarray([[0, 0, 10, 10], [5, 5, 15, 15], [20, 20, 30, 30]], jnp.float32)
        iou = np.asarray(ops.box_iou(a, b))[0]
        np.testing.assert_allclose(iou, [1.0, 25 / 175, 0.0], rtol=1e-6)

    def test_apply_deltas_identity_and_shift(self):
        boxes = jnp.asarray([[10, 10, 30, 50]], jnp.float32)
        out = np.asarray(ops.apply_deltas(boxes, jnp.zeros((1, 4))))
        np.testing.assert_allclose(out, [[10, 10, 30, 50]], atol=1e-5)
        # dx=1 moves the center by one box width (20)
        out = np.asarray(ops.apply_deltas(boxes, jnp.asarray([[1.0, 0, 0, 0]])))
        np.testing.assert_allclose(out, [[30, 10, 50, 50]], atol=1e-4)

    def test_anchor_grid(self):
        anchors = ops.generate_anchors(4, 5, stride=16, size=32)
        assert anchors.shape == (4 * 5 * 3, 4)
        # aspect 1.0 anchor at cell (0, 0): centered at origin, 32x32
        sq = anchors[1]
        np.testing.assert_allclose(sq, [-16, -16, 16, 16], rtol=1e-6)
        # areas are ~size^2 for every aspect ratio
        areas = (anchors[:3, 2] - anchors[:3, 0]) * (anchors[:3, 3] - anchors[:3, 1])
        np.testing.assert_allclose(areas, 32 * 32, rtol=1e-5)

    def test_level_assignment(self):
        boxes = jnp.asarray(
            [[0, 0, 56, 56], [0, 0, 224, 224], [0, 0, 448, 448], [0, 0, 1000, 1000]], jnp.float32
        )
        np.testing.assert_array_equal(np.asarray(ops.assign_fpn_level(boxes)), [2, 4, 5, 5])


def _naive_nms(boxes, scores, thresh):
    """Sequential greedy NMS (the torchvision/detectron2 semantics)."""
    order = np.argsort(-scores)
    keep = np.zeros(len(boxes), bool)
    suppressed = np.zeros(len(boxes), bool)
    for i in order:
        if suppressed[i] or not np.isfinite(scores[i]):
            continue
        keep[i] = True
        for j in order:
            if j == i or suppressed[j]:
                continue
            iou = np.asarray(ops.box_iou(jnp.asarray(boxes[i : i + 1]), jnp.asarray(boxes[j : j + 1])))[0, 0]
            if scores[j] <= scores[i] and iou > thresh:
                suppressed[j] = True
    return keep


class TestNMS:
    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_matches_sequential_greedy(self, seed):
        rng = np.random.RandomState(seed)
        n = 40
        centers = rng.rand(n, 2) * 50
        wh = rng.rand(n, 2) * 20 + 2
        boxes = np.concatenate([centers - wh / 2, centers + wh / 2], 1).astype(np.float32)
        scores = rng.rand(n).astype(np.float32)
        order = np.argsort(-scores)
        boxes_s, scores_s = boxes[order], scores[order]
        keep = np.asarray(ops.nms_mask(jnp.asarray(boxes_s), jnp.asarray(scores_s), 0.5))
        ref = _naive_nms(boxes_s, scores_s, 0.5)
        np.testing.assert_array_equal(keep, ref)


class TestRoiAlign:
    def test_exact_on_linear_field(self):
        """Bilinear sampling + averaging of a linear function f(x, y) = x + 2y
        must return f at the bin centers exactly."""
        h = w = 32
        ys, xs = np.meshgrid(np.arange(h, dtype=np.float32), np.arange(w, dtype=np.float32), indexing="ij")
        feat = (xs + 2 * ys)[..., None]  # [H, W, 1]
        stride = 4
        box = jnp.asarray([[8.0, 8.0, 72.0, 72.0]])  # in image coords, maps to feat 2..18
        out = np.asarray(ops.roi_align(jnp.asarray(feat), box, stride, out_size=4, sampling=2))
        # expected value at bin center (in feature coords, aligned=True: -0.5 shift)
        x1 = 8 / stride - 0.5
        size = (72 - 8) / stride
        centers = x1 + size * (np.arange(4) + 0.5) / 4
        expected = centers[None, :] + 2 * centers[:, None]
        np.testing.assert_allclose(out[0, :, :, 0], expected, rtol=1e-5)


class TestRoiAlignMultilevel:
    def test_matches_per_level_roi_align(self):
        """The single-gather multilevel form must equal running roi_align on
        each box's assigned level (the old 4x-traffic masked-select path)."""
        rng = np.random.RandomState(0)
        strides = (4, 8, 16, 32)
        size = 128
        feats = [
            jnp.asarray(rng.randn(size // s, size // s, 16).astype(np.float32)) for s in strides
        ]
        n = 24
        centers = rng.uniform(10, size - 10, (n, 2))
        sizes = rng.uniform(4, 100, (n, 2))
        boxes = jnp.asarray(
            np.concatenate([centers - sizes / 2, centers + sizes / 2], 1).astype(np.float32)
        )
        levels = ops.assign_fpn_level(boxes)
        got = np.asarray(ops.roi_align_multilevel(feats, boxes, levels, strides))
        want = np.zeros_like(got)
        lv = np.asarray(levels)
        for lvl in range(2, 6):
            r = np.asarray(ops.roi_align(feats[lvl - 2], boxes, strides[lvl - 2]))
            want[lv == lvl] = r[lv == lvl]
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


class TestBf16Equivalence:
    """bf16 fast forward vs f32: same detections (class match, IoU, score
    tolerance).  Random init gives a flat ~1/81 softmax, so the classifier /
    RPN weights are sharpened to produce confident, well-separated scores —
    the regime real converted weights live in."""

    def _sharpen(self, params):
        import flax

        p = flax.core.unfreeze(params) if hasattr(params, "unfreeze") else params
        t = p["params"]
        # confident classes, near-zero box deltas: detections are anchor-shaped
        # well-formed boxes (random-magnitude deltas make degenerate slivers
        # whose IoU is hypersensitive to rounding)
        t["box_head"]["cls_score"]["kernel"] = t["box_head"]["cls_score"]["kernel"] * 12.0
        t["box_head"]["bbox_pred"]["kernel"] = t["box_head"]["bbox_pred"]["kernel"] * 1e-3
        t["rpn"]["objectness"]["kernel"] = t["rpn"]["objectness"]["kernel"] * 10.0
        t["rpn"]["anchor_deltas"]["kernel"] = t["rpn"]["anchor_deltas"]["kernel"] * 1e-3
        return p

    def test_fast_path_matches_f32(self):
        from tise_tpu.backbones.detection.rcnn import FasterRCNN

        size = 128
        rng = np.random.RandomState(3)
        ys, xs = np.mgrid[0:size, 0:size].astype(np.float32)
        img = np.zeros((size, size, 3), np.float32)
        for _ in range(6):  # smooth blobs: structured activations, not noise
            cy, cx = rng.uniform(0, size, 2)
            s = rng.uniform(8, 30)
            blob = np.exp(-((ys - cy) ** 2 + (xs - cx) ** 2) / (2 * s * s))
            img += blob[..., None] * rng.uniform(50, 150, 3).astype(np.float32)
        img -= img.mean()

        m32 = FasterRCNN(dtype=jnp.float32)
        m16 = FasterRCNN(dtype=jnp.bfloat16)
        params = self._sharpen(m32.init(jax.random.PRNGKey(0), jnp.zeros((size, size, 3))))
        det32 = jax.jit(m32.apply)(params, jnp.asarray(img))
        det16 = jax.jit(m16.apply)(params, jnp.asarray(img))

        def rows(det):
            return [
                (int(det.classes[i]), np.asarray(det.boxes[i]), float(det.scores[i]))
                for i in range(det.valid.shape[0])
                if bool(det.valid[i])
            ]

        r32, r16 = rows(det32), rows(det16)
        assert len(r32) > 0, "sharpened random weights produced no detections"

        def matched(a, b):
            hits = 0
            for ca, ba, sa in a:
                for cb, bb, sb in b:
                    if ca != cb or abs(sa - sb) > 0.05:
                        continue
                    iou = float(np.asarray(ops.box_iou(jnp.asarray(ba[None]), jnp.asarray(bb[None])))[0, 0])
                    if iou > 0.85:
                        hits += 1
                        break
            return hits / max(len(a), 1)

        assert matched(r32, r16) >= 0.9
        assert matched(r16, r32) >= 0.9

    def test_roi_sampling_1_agreement(self):
        """The --roi-sampling 1 sweep accelerator (bin-center sampling, ~4x
        less ROIAlign HBM traffic) must agree with the default 2x2 grid on
        detections: same classes, overlapping boxes, close scores.  The
        tolerance is looser than bf16-vs-f32 — sampling genuinely changes
        the box-head inputs — and the measured agreement is what the CLI
        flag's help text cites."""
        from tise_tpu.backbones.detection.rcnn import FasterRCNN

        size = 128
        img = _blob_image(size)
        m2 = FasterRCNN(dtype=jnp.float32, roi_sampling=2)
        m1 = FasterRCNN(dtype=jnp.float32, roi_sampling=1)
        params = self._sharpen(m2.init(jax.random.PRNGKey(0), jnp.zeros((size, size, 3))))
        det2 = jax.jit(m2.apply)(params, jnp.asarray(img))
        det1 = jax.jit(m1.apply)(params, jnp.asarray(img))

        def rows(det):
            return [
                (int(det.classes[i]), np.asarray(det.boxes[i]), float(det.scores[i]))
                for i in range(det.valid.shape[0])
                if bool(det.valid[i])
            ]

        r2, r1 = rows(det2), rows(det1)
        assert len(r2) > 0, "sharpened random weights produced no detections"

        def matched(a, b):
            hits = 0
            for ca, ba, sa in a:
                for cb, bb, sb in b:
                    if ca != cb or abs(sa - sb) > 0.1:
                        continue
                    iou = float(np.asarray(ops.box_iou(jnp.asarray(ba[None]), jnp.asarray(bb[None])))[0, 0])
                    if iou > 0.8:
                        hits += 1
                        break
            return hits / max(len(a), 1)

        assert matched(r2, r1) >= 0.85
        assert matched(r1, r2) >= 0.85

    def test_proposals_256_agreement(self):
        """The --proposals 256 sweep accelerator (post-NMS top-k cut from
        detectron2's 1000) must agree with the default on detections.
        Proposals are score-ordered, so k=256 keeps exactly the top-scoring
        prefix of the default's proposal set; final detections should
        overwhelmingly decode from that prefix.  The measured agreement here
        is what the CLI flag's help text cites."""
        from tise_tpu.backbones.detection.rcnn import FasterRCNN

        size = 128
        img = _blob_image(size)
        m1000 = FasterRCNN(dtype=jnp.float32)
        m256 = FasterRCNN(dtype=jnp.float32, post_nms_topk=256)
        params = self._sharpen(m1000.init(jax.random.PRNGKey(0), jnp.zeros((size, size, 3))))
        d1000 = jax.jit(m1000.apply)(params, jnp.asarray(img))
        d256 = jax.jit(m256.apply)(params, jnp.asarray(img))

        def rows(det):
            return [
                (int(det.classes[i]), np.asarray(det.boxes[i]), float(det.scores[i]))
                for i in range(det.valid.shape[0])
                if bool(det.valid[i])
            ]

        r1000, r256 = rows(d1000), rows(d256)
        assert len(r1000) > 0, "sharpened random weights produced no detections"

        def matched(a, b):
            hits = 0
            for ca, ba, sa in a:
                for cb, bb, sb in b:
                    if ca != cb or abs(sa - sb) > 0.05:
                        continue
                    iou = float(np.asarray(ops.box_iou(jnp.asarray(ba[None]), jnp.asarray(bb[None])))[0, 0])
                    if iou > 0.85:
                        hits += 1
                        break
            return hits / max(len(a), 1)

        # every detection of the truncated run must exist in the default run;
        # the default may keep a small tail the truncation loses
        assert matched(r256, r1000) >= 0.9
        assert matched(r1000, r256) >= 0.85


def _blob_image(size: int, seed: int = 3) -> np.ndarray:
    """Smooth multi-blob image: structured activations, not noise."""
    rng = np.random.RandomState(seed)
    ys, xs = np.mgrid[0:size, 0:size].astype(np.float32)
    img = np.zeros((size, size, 3), np.float32)
    for _ in range(6):
        cy, cx = rng.uniform(0, size, 2)
        s = rng.uniform(8, 30)
        blob = np.exp(-((ys - cy) ** 2 + (xs - cx) ** 2) / (2 * s * s))
        img += blob[..., None] * rng.uniform(50, 150, 3).astype(np.float32)
    return img - img.mean()


class TestTorchRcnnOracle:
    """Full-forward parity vs the pure-torch detectron2-semantics oracle
    (tests/torch_rcnn_ref.py) from a synthetic detectron2-layout state_dict:
    catches conversion bugs (BN fold, OIHW->HWIO, fc1 CHW->HWC flatten
    order) and forward-composition bugs that shape/smoke tests cannot."""

    SIZE = 128

    @pytest.fixture(scope="class")
    def oracle(self):
        from tests.torch_rcnn_ref import build_synthetic_state_dict, torch_forward

        # cls_gain keeps logits O(1-10): saturated softmax scores tie at 1.0
        # and NMS picks arbitrary representatives among tied overlaps
        sd = build_synthetic_state_dict(seed=0, rpn_gain=5.0, cls_gain=0.01)
        img = _blob_image(self.SIZE)
        ref = torch_forward(sd, img.transpose(2, 0, 1))
        return sd, img, ref

    def test_trunk_fpn_rpn_forward(self, oracle):
        from tise_tpu.backbones.detection.rcnn import RPNHead
        from tise_tpu.backbones.detection.resnet_fpn import FPN, ResNet50
        from tise_tpu.backbones.detection.weights import params_from_detectron2

        sd, img, ref = oracle
        params = params_from_detectron2(sd)["params"]
        trunk = jax.jit(lambda p, x: ResNet50().apply({"params": p}, x))(
            params["backbone"], jnp.asarray(img)[None]
        )
        feats = jax.jit(lambda p, t: FPN().apply({"params": p}, t))(params["fpn"], trunk)

        def close(got, want):
            # scale-normalized: fp accumulation noise through ~50 conv layers
            # is absolute in units of the feature scale, not per-element
            scale = max(np.abs(want).max(), 1e-6)
            np.testing.assert_allclose(got / scale, want / scale, rtol=0, atol=2e-3)

        for got, want in zip(feats, ref["feats"]):
            close(np.asarray(got[0]), want)
        logits, _ = jax.jit(lambda p, f: RPNHead().apply({"params": p}, list(f)))(
            params["rpn"], tuple(feats)
        )
        for got, want in zip(logits, ref["rpn_logits"]):
            close(np.asarray(got[0]), want)

    def test_box_head_flatten_order(self, oracle):
        from tise_tpu.backbones.detection.rcnn import BoxHead
        from tise_tpu.backbones.detection.weights import params_from_detectron2

        sd, img, ref = oracle
        params = params_from_detectron2(sd)["params"]
        cls_logits, box_deltas = jax.jit(
            lambda p, r: BoxHead().apply({"params": p}, r)
        )(params["box_head"], jnp.asarray(ref["roi"]))
        for got, want in ((cls_logits, ref["cls_logits"]), (box_deltas, ref["box_deltas"])):
            scale = max(np.abs(want).max(), 1e-6)
            np.testing.assert_allclose(np.asarray(got) / scale, want / scale, rtol=0, atol=2e-3)

    def test_end_to_end_detections(self, oracle):
        from tise_tpu.backbones.detection.rcnn import FasterRCNN
        from tise_tpu.backbones.detection.weights import params_from_detectron2

        sd, img, ref = oracle
        det = jax.jit(FasterRCNN().apply)(params_from_detectron2(sd), jnp.asarray(img))
        ours = [
            (int(det.classes[i]), np.asarray(det.boxes[i]), float(det.scores[i]))
            for i in range(det.valid.shape[0])
            if bool(det.valid[i])
        ]
        theirs = ref["detections"]
        assert len(theirs) > 0, "oracle produced no detections; sharpen gains"

        def matched(a, b):
            hits = 0
            for ca, ba, sa in a:
                for cb, bb, sb in b:
                    if ca != cb or abs(sa - sb) > 0.05:
                        continue
                    iou = float(
                        np.asarray(ops.box_iou(jnp.asarray(ba[None]), jnp.asarray(bb[None])))[0, 0]
                    )
                    if iou > 0.85:
                        hits += 1
                        break
            return hits / max(len(a), 1)

        assert matched(ours, theirs) >= 0.9
        assert matched(theirs, ours) >= 0.9


class TestEndToEnd:
    def test_folder_predictor_smoke(self, tmp_path):
        """Random-weight Faster R-CNN over a 2-image folder at a small static
        size: runs, returns the DefaultPredictor-shaped dict."""
        from tise_tpu.backbones.detection.predictor import TPUDetector

        rng = np.random.RandomState(0)
        files = []
        for i in range(2):
            p = str(tmp_path / f"img{i}.png")
            Image.fromarray(rng.randint(0, 256, (64, 64, 3)).astype(np.uint8)).save(p)
            files.append(p)
        det = TPUDetector(None, batch_size=2, input_size=256)
        out = det.detect_files(files)
        assert set(out) == set(files)
        for names, ids, boxes in out.values():
            assert len(names) == len(ids) == len(boxes)
            for b in boxes:  # boxes rescaled to the 64x64 original frame
                assert (np.asarray(b) <= 64.0 + 1e-3).all()


class TestSoaMath:
    def _fake_detections(self, label, hits, total):
        d = {}
        for i in range(total):
            ids = [label] if i < hits else [label + 1]
            d[f"img{i}.png"] = [["x"], ids, [np.zeros(4)]]
        return d

    def test_recall(self):
        det = self._fake_detections(3, hits=7, total=10)
        acc, rec, tot = soa.recall_for_label(det, 3)
        assert (acc, rec, tot) == (0.7, 7, 10)

    def test_soa_scores_and_files(self, tmp_path):
        ddir = str(tmp_path / "det")
        os.makedirs(ddir)
        # 80 labels with varying accuracy/image counts
        for label in range(80):
            hits = label % 10
            total = 10 + (label % 5)
            result_io.save_pickle(
                os.path.join(ddir, f"detected_label_{label:02d}.pkl"), self._fake_detections(label, hits, total)
            )
        saved = str(tmp_path / "soa.txt")
        soa_c, soa_i, top40, bot40 = soa.calc_soa(ddir, saved)
        assert 0 <= soa_c <= 1 and 0 <= soa_i <= 1
        text = open(saved).read()
        assert "(SOA-C) is:" in text and "(SOA-I) is:" in text
        # independently recompute SOA-C
        accs = [(l % 10) / (10 + (l % 5)) for l in range(80)]
        np.testing.assert_allclose(soa_c, np.mean(accs), rtol=1e-9)

    def test_label_parsing(self):
        assert soa.label_from_filename("out/detected_label_04_11.pkl") == 4
        assert soa.label_from_filename("detected_label_7.pkl") == 7
        assert soa.label_from_filename("images/label_79/x.png") == 79


class TestShardedDetector:
    def test_batch_shards_over_data_axis(self):
        """The detector forward runs with its batch sharded over the full
        8-device data axis (VERDICT r1 item 7); a batch size that does not
        divide the mesh falls back to a sub-mesh instead of inflating."""
        from tise_tpu.backbones.detection.predictor import TPUDetector

        det = TPUDetector(None, batch_size=8, input_size=128)
        assert det.mesh.shape[det.mesh.axis_names[0]] == len(jax.devices())
        imgs = np.random.RandomState(0).randint(0, 256, (8, 128, 128, 3)).astype(np.uint8)
        boxes, scores, classes, valid = det.detect_batch(imgs)
        assert boxes.shape[0] == 8 and valid.dtype == np.bool_

    def test_submesh_for_indivisible_batch(self):
        from tise_tpu.backbones.detection.predictor import TPUDetector

        det = TPUDetector(None, batch_size=3, input_size=64)
        assert det.batch_size == 3
        assert det.mesh.shape[det.mesh.axis_names[0]] == 1

    def test_fast_preset_micro_batch_default(self):
        """The s1/p256 sweep preset defaults to micro_batch 32 (the measured
        per-call conv amortization optimum, ROADMAP r4); the exact path keeps
        8 (mb32 is an HBM OOM at 800px and gather-floored anyway)."""
        import jax.numpy as jnp

        from tise_tpu.backbones.detection.predictor import TPUDetector

        fast = TPUDetector(None, batch_size=64, input_size=64, dtype=jnp.bfloat16,
                           roi_sampling=1, proposals=256)
        assert fast.micro_batch == 32 and fast._n_chunks == 2
        exact = TPUDetector(None, batch_size=64, input_size=64)
        assert exact.micro_batch == 8 and exact._n_chunks == 8
        # explicit override still wins
        manual = TPUDetector(None, batch_size=64, input_size=64,
                             roi_sampling=1, proposals=256, micro_batch=16)
        assert manual.micro_batch == 16


class TestPostprocessParity:
    """Static-shape ROI postprocess vs a sequential dynamic-shape reference
    implementing detectron2's fast_rcnn_inference_single_image semantics
    (softmax-minus-bg, per-class decode/clip, score>0.5, per-class greedy
    NMS 0.5, top-100 by score)."""

    def _reference(self, proposals, cls_logits, box_deltas, h, w, thresh=0.5):
        from scipy.special import softmax

        k = proposals.shape[0]
        probs = softmax(cls_logits, axis=-1)[:, :80]
        weights = np.array([10.0, 10.0, 5.0, 5.0])
        cand = []  # (score, cls, box)
        for i in range(k):
            for c in range(80):
                s = probs[i, c]
                if s <= thresh:
                    continue
                dx, dy, dw, dh = box_deltas[i, 4 * c : 4 * c + 4] / weights
                x1, y1, x2, y2 = proposals[i]
                bw, bh = x2 - x1, y2 - y1
                cx, cy = x1 + 0.5 * bw, y1 + 0.5 * bh
                ncx, ncy = cx + dx * bw, cy + dy * bh
                nw, nh = np.exp(dw) * bw, np.exp(dh) * bh
                box = np.array([ncx - 0.5 * nw, ncy - 0.5 * nh, ncx + 0.5 * nw, ncy + 0.5 * nh])
                box = np.clip(box, [0, 0, 0, 0], [w, h, w, h])
                cand.append((float(s), c, box))
        cand.sort(key=lambda t: -t[0])
        kept = []
        for s, c, b in cand:  # greedy per-class NMS
            ok = True
            for s2, c2, b2 in kept:
                if c2 != c:
                    continue
                ix1, iy1 = max(b[0], b2[0]), max(b[1], b2[1])
                ix2, iy2 = min(b[2], b2[2]), min(b[3], b2[3])
                inter = max(ix2 - ix1, 0) * max(iy2 - iy1, 0)
                union = (b[2] - b[0]) * (b[3] - b[1]) + (b2[2] - b2[0]) * (b2[3] - b2[1]) - inter
                if union > 0 and inter / union > 0.5:
                    ok = False
                    break
            if ok:
                kept.append((s, c, b))
        return kept[:100]

    def test_matches_sequential_reference(self):
        from tise_tpu.backbones.detection.rcnn import postprocess_detections

        rng = np.random.RandomState(7)
        k, h, w = 40, 256, 256
        # proposals: random boxes with some clusters so NMS has real work
        centers = rng.uniform(40, 216, (k, 2))
        centers[20:] = centers[:20] + rng.uniform(-6, 6, (20, 2))  # near-duplicates
        sizes = rng.uniform(20, 80, (k, 2))
        proposals = np.concatenate([centers - sizes / 2, centers + sizes / 2], 1).astype(np.float32)
        # logits: most background, some confident classes (few > 0.5 post-softmax)
        cls_logits = rng.randn(k, 81).astype(np.float32)
        cls_logits[:, 80] += 2.0
        hot = rng.randint(0, 80, k)
        cls_logits[np.arange(k), hot] += rng.uniform(0, 7, k).astype(np.float32)
        box_deltas = (rng.randn(k, 320) * 0.5).astype(np.float32)

        det = jax.jit(postprocess_detections, static_argnums=(4, 5))(
            jnp.asarray(proposals), jnp.ones((k,), bool), jnp.asarray(cls_logits),
            jnp.asarray(box_deltas), h, w,
        )
        got = [
            (float(det.scores[i]), int(det.classes[i]), np.asarray(det.boxes[i]))
            for i in range(det.valid.shape[0]) if bool(det.valid[i])
        ]
        ref = self._reference(proposals, cls_logits, box_deltas, h, w)
        assert len(got) == len(ref) > 0
        got.sort(key=lambda t: -t[0])
        for (gs, gc, gb), (rs, rc, rb) in zip(got, ref):
            assert gc == rc
            np.testing.assert_allclose(gs, rs, rtol=1e-5)
            np.testing.assert_allclose(gb, rb, rtol=1e-4, atol=1e-3)


class TestAspectBuckets:
    """detectron2 ResizeShortestEdge parity mode: aspect-preserving resize,
    static shape buckets, true-extent clipping (VERDICT r1 weak #4)."""

    def test_resize_geometry_and_bucket_choice(self, tmp_path):
        from tise_tpu.backbones.detection.predictor import load_bgr_image_bucketed, pick_bucket

        buckets = ((64, 64), (64, 104), (104, 64))
        # landscape 50x100: scale = 64/50 = 1.28 -> long side 128 > max 104
        # -> scale = 104/100 -> resized (52, 104) -> landscape bucket
        p = str(tmp_path / "land.png")
        Image.fromarray(np.zeros((50, 100, 3), np.uint8)).save(p)
        img, orig, (rh, rw), bi = load_bgr_image_bucketed(p, buckets, short=64, max_size=104)
        assert orig == (50, 100) and (rh, rw) == (52, 104) and buckets[bi] == (64, 104)
        assert img.shape == (64, 104, 3)
        assert img[rh:].sum() == 0  # zero padding below the valid extent

        # square source -> square bucket, no padding
        p2 = str(tmp_path / "sq.png")
        Image.fromarray(np.full((40, 40, 3), 7, np.uint8)).save(p2)
        img2, _, (rh2, rw2), bi2 = load_bgr_image_bucketed(p2, buckets, short=64, max_size=104)
        assert (rh2, rw2) == (64, 64) and buckets[bi2] == (64, 64)
        assert img2.min() > 0  # fully covered

        assert pick_bucket(104, 64, buckets) == 2  # portrait
        assert pick_bucket(200, 30, buckets) == 2  # extreme aspect -> least-shrink bucket

    def test_bucketed_detect_files_smoke(self, tmp_path):
        """Mixed-shape folder through the bucketed sharded path: per-bucket
        compiled forwards, boxes back in original coordinates."""
        from tise_tpu.backbones.detection.predictor import TPUDetector

        rng = np.random.RandomState(0)
        files = []
        for name, (h, w) in [("a", (40, 80)), ("b", (80, 40)), ("c", (60, 60))]:
            p = str(tmp_path / f"{name}.png")
            Image.fromarray(rng.randint(0, 256, (h, w, 3)).astype(np.uint8)).save(p)
            files.append(p)
        det = TPUDetector(
            None, batch_size=2, input_size=128,
            aspect_buckets=((128, 128), (128, 192), (192, 128)),
            aspect_short=128, aspect_max=192,
        )
        out = det.detect_files(files)
        assert set(out) == set(files)
        for path, (names, ids, boxes) in out.items():
            with Image.open(path) as im:
                oh, ow = im.height, im.width
            for b in boxes:
                assert b[0] >= -1e-3 and b[1] >= -1e-3
                assert b[2] <= ow + 1e-2 and b[3] <= oh + 1e-2
