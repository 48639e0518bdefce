"""Folder-level detection driver (the reference's DefaultPredictor surface).

Preprocessing parity with detectron2's DefaultPredictor on the reference
configs: BGR input (cv2.imread, SOA.py:86 / crop_object.py:30), shortest edge
resized to 800, pixel mean [103.53, 116.28, 123.675] subtracted (std 1 for
the caffe-style R50).  Static shapes: every image is resized to exactly
800 x 800 — TISE's generated images are square (256/299 px), so the aspect
ratio is preserved; boxes are rescaled back to original coordinates like
detectron2's postprocessing.

The per-image forward is vmapped and jitted once with its batch axis sharded
over the mesh's ``data`` axis (the SOA sweep — 80 labels x ~30k images — is
the reference's longest pipeline and scales linearly over chips); a host
thread pool decodes and resizes ahead of the device.
"""

from __future__ import annotations

import math
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


def load_bgr_image(path: str, size: int = INPUT_SIZE) -> Tuple[np.ndarray, Tuple[int, int]]:
    """-> (uint8 BGR [size, size, 3], original (h, w))."""
    with Image.open(path) as im:
        im = im.convert("RGB")
        orig = (im.height, im.width)
        im = im.resize((size, size), Image.BILINEAR)
        rgb = np.asarray(im, np.uint8)
    return rgb[:, :, ::-1].copy(), orig


class TPUDetector:
    """Batched static-shape Mask R-CNN inference engine."""

    def __init__(
        self,
        weights_path: Optional[str],
        batch_size: int = 4,
        dtype=jnp.float32,
        input_size: int = INPUT_SIZE,
        mesh: Optional[Mesh] = None,
    ):
        base = mesh if mesh is not None else make_mesh()
        data_axis = base.axis_names[0]
        dp = base.shape[data_axis]
        if batch_size % dp:
            # the jitted batch must divide evenly over the data axis: shrink to
            # a sub-mesh rather than silently inflating the caller's batch
            dp = math.gcd(batch_size, dp)
            base = Mesh(np.asarray(base.devices).reshape(-1)[:dp].reshape(dp, 1), base.axis_names)
        self.mesh = base
        self.batch_size = batch_size
        self.input_size = input_size
        model = FasterRCNN(dtype=dtype)
        if weights_path:
            params = load_detectron2_pkl(weights_path)
        else:  # random init (tests / smoke)
            params = model.init(jax.random.PRNGKey(0), jnp.zeros((input_size, input_size, 3), dtype))

        def single(p, img_u8_bgr):
            x = img_u8_bgr.astype(dtype) - jnp.asarray(PIXEL_MEAN_BGR, dtype)
            return model.apply(p, x)

        self._batch_sharding = NamedSharding(self.mesh, P(data_axis, None, None, None))
        self._fwd = jax.jit(
            jax.vmap(single, in_axes=(None, 0)),
            in_shardings=(NamedSharding(self.mesh, P()), self._batch_sharding),
            out_shardings=NamedSharding(self.mesh, P(data_axis)),
        )
        self.params = params

    def detect_batch(self, images_u8_bgr: np.ndarray) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
        """[B, 800, 800, 3] BGR uint8 -> (boxes, scores, classes, valid).

        B must equal ``self.batch_size`` (a multiple of the mesh's data axis);
        ``detect_files`` pads the tail chunk up to it.
        """
        det = self._fwd(self.params, jax.device_put(images_u8_bgr, self._batch_sharding))
        return (
            np.asarray(det.boxes),
            np.asarray(det.scores),
            np.asarray(det.classes),
            np.asarray(det.valid),
        )

    def detect_files(
        self, files: Sequence[str], num_workers: int = 8
    ) -> Dict[str, Tuple[List[str], List[int], List[np.ndarray]]]:
        """DefaultPredictor-shaped output: path -> (names, ids, boxes in
        original image coordinates)."""
        out: Dict[str, Tuple[List[str], List[int], List[np.ndarray]]] = {}
        with ThreadPoolExecutor(max_workers=num_workers) as pool:
            for start in range(0, len(files), self.batch_size):
                chunk = list(files[start : start + self.batch_size])
                decoded = list(pool.map(lambda f: load_bgr_image(f, self.input_size), chunk))
                imgs = np.stack([d[0] for d in decoded])
                if len(chunk) < self.batch_size:  # pad to static batch
                    pad = np.zeros((self.batch_size - len(chunk),) + imgs.shape[1:], imgs.dtype)
                    imgs = np.concatenate([imgs, pad])
                boxes, scores, classes, valid = self.detect_batch(imgs)
                for i, path in enumerate(chunk):
                    oh, ow = decoded[i][1]
                    sy, sx = oh / self.input_size, ow / self.input_size
                    names: List[str] = []
                    ids: List[int] = []
                    bxs: List[np.ndarray] = []
                    for j in range(boxes.shape[1]):
                        if not valid[i, j]:
                            continue
                        cls = int(classes[i, j])
                        b = boxes[i, j] * np.array([sx, sy, sx, sy], np.float32)
                        names.append(COCO_CLASSES[cls])
                        ids.append(cls)
                        bxs.append(b)
                    out[path] = (names, ids, bxs)
        return out


def make_folder_detector(weights_path: Optional[str], batch_size: int = 4) -> Callable:
    det = TPUDetector(weights_path, batch_size=batch_size)
    return det.detect_files
