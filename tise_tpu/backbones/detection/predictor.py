"""Folder-level detection driver (the reference's DefaultPredictor surface).

Preprocessing parity with detectron2's DefaultPredictor on the reference
configs: BGR input (cv2.imread, SOA.py:86 / crop_object.py:30), shortest edge
resized to 800, pixel mean [103.53, 116.28, 123.675] subtracted (std 1 for
the caffe-style R50).  Static shapes, two modes:

  * default: every image resized to exactly 800 x 800 — TISE's generated
    images are square (256/299 px), so the aspect ratio is preserved and one
    program is compiled;
  * ``aspect_buckets``: detectron2-parity ResizeShortestEdge(800, max 1333)
    with zero-padding into one of a few static (h, w) buckets and the true
    (pre-padding) extent passed to the model for box clipping, exactly like
    detectron2's ImageList.image_sizes — for non-square sources.

Boxes are rescaled back to original coordinates like detectron2's
postprocessing.

The per-image forward is vmapped and jitted once with its batch axis sharded
over the mesh's ``data`` axis (the SOA sweep — 80 labels x ~30k images — is
the reference's longest pipeline and scales linearly over chips).  The sweep
loop is fully pipelined: a host thread pool decodes the NEXT chunk while the
device runs the current one (``_double_buffer``), dispatches run 1-deep ahead
of the blocking result pull, and the 4 per-image output arrays are packed
into ONE device buffer so each batch costs a single host round-trip
(bench.py's ``soa_sweep_images_per_sec`` measures this loop end to end).
"""

from __future__ import annotations

import math
import warnings
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from PIL import Image

from tise_tpu.backbones.detection.coco_classes import COCO_CLASSES
from tise_tpu.backbones.detection.rcnn import FasterRCNN
from tise_tpu.backbones.detection.weights import load_detectron2_pkl
from tise_tpu.core.mesh import make_mesh

INPUT_SIZE = 800
PIXEL_MEAN_BGR = np.array([103.530, 116.280, 123.675], np.float32)
#: detectron2 ResizeShortestEdge defaults on the reference configs
SHORT_EDGE = 800
MAX_SIZE = 1333
#: static shape buckets for aspect-preserving inference (square, landscape,
#: portrait); 1344 = 1333 rounded up for even FPN striding
DEFAULT_BUCKETS = ((800, 800), (800, 1344), (1344, 800))


def load_bgr_image(path: str, size: int = INPUT_SIZE) -> Tuple[np.ndarray, Tuple[int, int]]:
    """-> (uint8 BGR [size, size, 3], original (h, w))."""
    with Image.open(path) as im:
        im = im.convert("RGB")
        orig = (im.height, im.width)
        im = im.resize((size, size), Image.BILINEAR)
        rgb = np.asarray(im, np.uint8)
    return rgb[:, :, ::-1].copy(), orig


def pick_bucket(rh: int, rw: int, buckets: Sequence[Tuple[int, int]]) -> int:
    """Smallest-area bucket that fits (rh, rw); if none fits (extreme aspect
    ratio), the bucket needing the least extra downscale."""
    fitting = [i for i, (bh, bw) in enumerate(buckets) if bh >= rh and bw >= rw]
    if fitting:
        return min(fitting, key=lambda i: buckets[i][0] * buckets[i][1])
    return max(range(len(buckets)), key=lambda i: min(buckets[i][0] / rh, buckets[i][1] / rw))


def load_bgr_image_bucketed(
    path: str, buckets: Sequence[Tuple[int, int]], short: int = SHORT_EDGE, max_size: int = MAX_SIZE
) -> Tuple[np.ndarray, Tuple[int, int], Tuple[int, int], int]:
    """detectron2 ResizeShortestEdge + zero-pad to a static bucket.

    -> (uint8 BGR [bh, bw, 3], original (h, w), resized valid (rh, rw),
    bucket index).  Scale = short/min side, capped so the long side stays
    <= max_size (d2 ResizeShortestEdge semantics), then further capped to the
    chosen bucket.
    """
    with Image.open(path) as im:
        im = im.convert("RGB")
        oh, ow = im.height, im.width
        scale = short / min(oh, ow)
        if scale * max(oh, ow) > max_size:
            scale = max_size / max(oh, ow)
        rh, rw = int(round(oh * scale)), int(round(ow * scale))
        bi = pick_bucket(rh, rw, buckets)
        bh, bw = buckets[bi]
        if rh > bh or rw > bw:  # extreme aspect ratio: shrink into the bucket
            fit = min(bh / rh, bw / rw)
            # round like every other resize here (truncation would bias the
            # oh/rh box rescale factor) and clamp into the bucket
            rh, rw = min(int(round(rh * fit)), bh), min(int(round(rw * fit)), bw)
        rgb = np.asarray(im.resize((rw, rh), Image.BILINEAR), np.uint8)
    canvas = np.zeros((bh, bw, 3), np.uint8)
    canvas[:rh, :rw] = rgb[:, :, ::-1]
    return canvas, (oh, ow), (rh, rw), bi


def pack_detections(det) -> jnp.ndarray:
    """Chained Detections pytree (leading [n_chunks, mb] axes) -> ONE
    [n_chunks*mb, D, 7] f32 buffer (boxes | score | class | valid) so the
    host needs a single blocking transfer per batch (4 separate pulls pay 4
    round-trips on any remote-dispatch transport; classes 0..79 are exact in
    f32).  Inverse: ``TPUDetector._unpack``."""
    packed = jnp.concatenate(
        [
            det.boxes.astype(jnp.float32),
            det.scores.astype(jnp.float32)[..., None],
            det.classes.astype(jnp.float32)[..., None],
            det.valid.astype(jnp.float32)[..., None],
        ],
        axis=-1,
    )
    return packed.reshape((-1,) + packed.shape[2:])


def _double_buffer(chunks, decode):
    """Yield ``(chunk, decode(chunk))`` with the NEXT chunk's decode already
    running while the caller dispatches/blocks on the device for the current
    one (the extraction pipeline's BatchedExtractor does the same; without it
    the sweep alternates host decode and device compute serially).  A
    dedicated 1-thread runner drives the prefetch so the shared decode pool
    is never saturated by orchestration tasks."""
    if not chunks:
        return
    with ThreadPoolExecutor(max_workers=1) as runner:
        pending = runner.submit(decode, chunks[0])
        for i, chunk in enumerate(chunks):
            decoded = pending.result()
            if i + 1 < len(chunks):
                pending = runner.submit(decode, chunks[i + 1])
            yield chunk, decoded


class TPUDetector:
    """Batched static-shape Mask R-CNN inference engine."""

    def __init__(
        self,
        weights_path: Optional[str],
        batch_size: int = 4,
        dtype=jnp.float32,
        input_size: int = INPUT_SIZE,
        mesh: Optional[Mesh] = None,
        aspect_buckets: Optional[Sequence[Tuple[int, int]]] = None,
        aspect_short: int = SHORT_EDGE,
        aspect_max: int = MAX_SIZE,
        micro_batch: Optional[int] = None,
        score_thresh: float = 0.5,
        roi_sampling: int = 2,
        proposals: int = 1000,
    ):
        """``aspect_buckets``: enable detectron2-parity aspect-preserving
        resize (ResizeShortestEdge 800/1333) with zero-padding to one of the
        given static (h, w) buckets and true-extent box clipping.  Default
        ``None`` keeps the square resize — exact for TISE's square generated
        images and one compiled program instead of len(buckets).

        ``micro_batch``: images per device step.  One dispatch processes the
        whole ``batch_size`` as a lax.map chain of batch_size/micro_batch
        vmapped steps — amortizing per-dispatch overhead (the axon tunnel
        taxes every execution ~10 ms) while the micro-batch bounds the ROI
        gather's peak memory.  ``dtype=jnp.bfloat16`` selects the fast
        forward (f32 score/box epilogues; see FasterRCNN)."""
        base = mesh if mesh is not None else make_mesh()
        data_axis = base.axis_names[0]
        dp = base.shape[data_axis]
        if micro_batch is not None:
            mb = micro_batch
        else:
            # measured on v5e at 800px (tools/det_stem_probe.py + det_ablate,
            # ROADMAP r4): the stem conv carries a ~7 ms per-CALL cost that
            # only micro-batch amortizes (1.03 -> 0.40 ms/img at mb32), so the
            # fast preset defaults to 32 (full path 191.5 -> 241.9 img/s).
            # The exact path keeps 8: its p1000 ROIAlign gather floor absorbs
            # the conv win (mb16 measured 87.2 vs 86.5 img/s) and mb32
            # compiles to 24.4 GB — an HBM OOM on a 16 GB chip.
            fast_preset = roi_sampling == 1 and proposals <= 256
            mb = min(batch_size, 32 if fast_preset else 8)
        mb = math.gcd(batch_size, mb)  # chain length must be integral
        if mb % dp:
            # the jitted micro-batch must divide evenly over the data axis:
            # shrink to a sub-mesh rather than silently inflating the batch
            new_dp = math.gcd(mb, dp)
            warnings.warn(
                f"TPUDetector: micro_batch {mb} does not divide over the {dp}-device "
                f"'{data_axis}' axis; falling back to a {new_dp}-device sub-mesh "
                "(pass a batch_size/micro_batch divisible by the device count to "
                "use every device)",
                stacklevel=2,
            )
            shape = [new_dp] + [1] * (len(base.axis_names) - 1)
            base = Mesh(np.asarray(base.devices).reshape(-1)[:new_dp].reshape(shape), base.axis_names)
        self.mesh = base
        self.batch_size = batch_size
        self.micro_batch = mb
        self._n_chunks = batch_size // mb
        self.input_size = input_size
        model = FasterRCNN(
            dtype=dtype, score_thresh=score_thresh, roi_sampling=roi_sampling,
            post_nms_topk=proposals,
        )
        if weights_path:
            params = load_detectron2_pkl(weights_path)
        else:  # random init (tests / smoke)
            params = model.init(jax.random.PRNGKey(0), jnp.zeros((input_size, input_size, 3), dtype))

        def single(p, img_u8_bgr, valid_hw=None):
            # mean-subtract in f32 BEFORE the compute-dtype cast: bf16 can
            # represent uint8 exactly but not 103.53-shifted values well
            x = (img_u8_bgr.astype(jnp.float32) - jnp.asarray(PIXEL_MEAN_BGR)).astype(dtype)
            return model.apply(p, x) if valid_hw is None else model.apply(p, x, valid_hw)

        def chained(fn):
            def fwd(p, *chunked):  # leading [n_chunks, mb, ...] axes
                det = jax.lax.map(lambda args: fn(p, *args), chunked)
                return pack_detections(det)

            return fwd

        self._batch_sharding = NamedSharding(self.mesh, P(None, data_axis, None, None, None))
        self._hw_sharding = NamedSharding(self.mesh, P(None, data_axis, None))
        rep = NamedSharding(self.mesh, P())
        out = NamedSharding(self.mesh, P(data_axis))
        self._fwd = jax.jit(
            chained(jax.vmap(single, in_axes=(None, 0))),
            in_shardings=(rep, self._batch_sharding),
            out_shardings=out,
        )
        self.params = params
        self.aspect_buckets = tuple(aspect_buckets) if aspect_buckets else None
        self.aspect_short = aspect_short
        self.aspect_max = aspect_max

        # one compiled program per bucket shape, shared weights
        self._fwd_hw = jax.jit(
            chained(jax.vmap(single, in_axes=(None, 0, 0))),
            in_shardings=(rep, self._batch_sharding, self._hw_sharding),
            out_shardings=out,
        )

    def _chunked(self, arr: np.ndarray) -> np.ndarray:
        return arr.reshape((self._n_chunks, self.micro_batch) + arr.shape[1:])

    def detect_batch(self, images_u8_bgr: np.ndarray) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
        """[B, 800, 800, 3] BGR uint8 -> (boxes, scores, classes, valid).

        B must equal ``self.batch_size`` (a multiple of the mesh's data axis);
        ``detect_files`` pads the tail chunk up to it.
        """
        det = self._fwd(self.params, jax.device_put(self._chunked(images_u8_bgr), self._batch_sharding))
        return self._unpack(det)

    @staticmethod
    def _unpack(packed) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
        """[B, D, 7] device buffer -> (boxes, scores, classes, valid) host
        arrays with ONE blocking transfer."""
        p = np.asarray(packed)
        return p[..., :4], p[..., 4], p[..., 5].astype(np.int64), p[..., 6] > 0.5

    def _pad_rows(self, arr: np.ndarray, value=0) -> np.ndarray:
        """Pad the leading axis up to the static ``batch_size``."""
        n = self.batch_size - arr.shape[0]
        if n <= 0:
            return arr
        return np.concatenate([arr, np.full((n,) + arr.shape[1:], value, arr.dtype)])

    def _run_pipeline(self, chunks, decode, dispatch, drain) -> None:
        """The 1-deep pipelined sweep loop shared by detect_files and
        detect_files_bucketed: the next chunk's host decode overlaps device
        compute (``_double_buffer``) and each dispatch runs one batch ahead
        of the blocking result pull."""
        inflight = None
        for chunk, decoded in _double_buffer(chunks, decode):
            det = dispatch(chunk, decoded)
            if inflight is not None:
                drain(*inflight)
            inflight = (chunk, decoded, det)
        if inflight is not None:
            drain(*inflight)

    def _collect(self, out, path, det_row, scale_xy):
        boxes, scores, classes, valid = det_row
        sy, sx = scale_xy
        names: List[str] = []
        ids: List[int] = []
        bxs: List[np.ndarray] = []
        for j in range(boxes.shape[0]):
            if not valid[j]:
                continue
            cls = int(classes[j])
            names.append(COCO_CLASSES[cls])
            ids.append(cls)
            bxs.append(boxes[j] * np.array([sx, sy, sx, sy], np.float32))
        out[path] = (names, ids, bxs)

    def detect_files_bucketed(
        self, files: Sequence[str], num_workers: int = 8
    ) -> Dict[str, Tuple[List[str], List[int], List[np.ndarray]]]:
        """Aspect-preserving path: group files by shape bucket (header-only
        size pass — a 30k-image sweep must not hold 30k decoded canvases),
        then decode per chunk and run the per-bucket compiled forward with
        true-extent clipping; boxes rescale by the uniform resize factor."""
        out: Dict[str, Tuple[List[str], List[int], List[np.ndarray]]] = {}

        def probe(path):
            with Image.open(path) as im:  # header read only, no decode
                oh, ow = im.height, im.width
            scale = self.aspect_short / min(oh, ow)
            if scale * max(oh, ow) > self.aspect_max:
                scale = self.aspect_max / max(oh, ow)
            rh, rw = int(round(oh * scale)), int(round(ow * scale))
            return pick_bucket(rh, rw, self.aspect_buckets)

        with ThreadPoolExecutor(max_workers=num_workers) as pool:
            buckets_of = list(pool.map(probe, files))
            groups: Dict[int, List[int]] = {}
            for i, bi in enumerate(buckets_of):
                groups.setdefault(bi, []).append(i)
            chunks = [
                idxs[start : start + self.batch_size]
                for idxs in groups.values()
                for start in range(0, len(idxs), self.batch_size)
            ]

            def decode(chunk):
                return list(
                    pool.map(
                        lambda i: load_bgr_image_bucketed(
                            files[i], self.aspect_buckets, self.aspect_short, self.aspect_max
                        ),
                        chunk,
                    )
                )

            def dispatch(chunk, decoded):
                imgs = self._pad_rows(np.stack([d[0] for d in decoded]))
                hw = self._pad_rows(np.asarray([d[2] for d in decoded], np.float32), value=1)
                return self._fwd_hw(
                    self.params,
                    jax.device_put(self._chunked(imgs), self._batch_sharding),
                    jax.device_put(self._chunked(hw), self._hw_sharding),
                )

            def drain(chunk, decoded, det):
                b, s, c, v = self._unpack(det)  # blocking pull
                for row, i in enumerate(chunk):
                    (oh, ow), (rh, rw) = decoded[row][1], decoded[row][2]
                    self._collect(out, files[i], (b[row], s[row], c[row], v[row]), (oh / rh, ow / rw))

            self._run_pipeline(chunks, decode, dispatch, drain)
        return out

    def detect_files(
        self, files: Sequence[str], num_workers: int = 8
    ) -> Dict[str, Tuple[List[str], List[int], List[np.ndarray]]]:
        """DefaultPredictor-shaped output: path -> (names, ids, boxes in
        original image coordinates)."""
        if self.aspect_buckets:
            return self.detect_files_bucketed(files, num_workers)
        out: Dict[str, Tuple[List[str], List[int], List[np.ndarray]]] = {}
        chunks = [list(files[s : s + self.batch_size]) for s in range(0, len(files), self.batch_size)]
        with ThreadPoolExecutor(max_workers=num_workers) as pool:

            def decode(chunk):
                return list(pool.map(lambda f: load_bgr_image(f, self.input_size), chunk))

            def dispatch(chunk, decoded):
                imgs = self._pad_rows(np.stack([d[0] for d in decoded]))
                return self._fwd(self.params, jax.device_put(self._chunked(imgs), self._batch_sharding))

            def drain(chunk, decoded, det):
                boxes, scores, classes, valid = self._unpack(det)  # blocking pull
                for i, path in enumerate(chunk):
                    oh, ow = decoded[i][1]
                    sy, sx = oh / self.input_size, ow / self.input_size
                    self._collect(out, path, (boxes[i], scores[i], classes[i], valid[i]), (sy, sx))

            self._run_pipeline(chunks, decode, dispatch, drain)
        return out


def make_folder_detector(
    weights_path: Optional[str],
    batch_size: Optional[int] = None,
    aspect_resize: bool = False,
    precision: str = "highest",
    roi_sampling: int = 2,
    proposals: int = 1000,
) -> Callable:
    """``precision='fast'`` selects the bf16 forward (f32 epilogues,
    detection-equivalent within score tolerance — tests/test_detection.py)
    and a larger default batch; 'highest' keeps full f32.  ``roi_sampling=1``
    and ``proposals`` (post-NMS top-k, default detectron2's 1000) are the
    opt-in sweep accelerators (see FasterRCNN)."""
    fast = precision == "fast"
    if batch_size is None:
        batch_size = 32 if fast else 4
    det = TPUDetector(
        weights_path,
        batch_size=batch_size,
        dtype=jnp.bfloat16 if fast else jnp.float32,
        aspect_buckets=DEFAULT_BUCKETS if aspect_resize else None,
        roi_sampling=roi_sampling,
        proposals=proposals,
    )
    return det.detect_files
