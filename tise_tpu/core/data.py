"""Host-side image-folder dataset with threaded decode and prefetch.

Folder conventions match the reference:
  * recursive walk collecting ``*.jpg``/``*.png``
    (image_realism/FID/img_data.py:27-35, inception_score_star_coco.py:124-135)
  * flat ``<dir>/<caption_id>.png`` layout for generated images;
    SOA's ``label_XX_XX/`` and PA's ``<positional_word>/`` subfolder layouts
    are handled by the metric orchestrators on top of this module.

Decoding and the *exact* PIL resize happen on host worker threads (PIL's
convolution resampling is the reference-parity resize — see
tise_tpu/ops/preprocess.py for the device-side approximation); normalization is
fused into the device-side forward.  Batches are produced at static shapes
(pad + mask) so every step hits the same XLA executable.
"""

from __future__ import annotations

import os
import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass
from typing import Iterator, List, Optional, Sequence, Tuple

import numpy as np
from PIL import Image

IMG_EXTENSIONS = (".jpg", ".jpeg", ".png")

#: PIL resample filters by recipe.
BILINEAR = Image.BILINEAR
BICUBIC = Image.BICUBIC


def list_images(root: str) -> List[str]:
    """Recursive, sorted walk collecting jpg/png files.

    The reference uses ``os.walk`` (unsorted, filesystem order); we sort for
    determinism — FID/IS statistics are order-invariant up to the dropped tail
    batch, and the legacy shuffles are reproduced with a seeded RNG upstream.
    """
    out: List[str] = []
    for path, _dirs, files in sorted(os.walk(root)):
        for name in sorted(files):
            if name.lower().endswith(IMG_EXTENSIONS):
                out.append(os.path.join(path, name))
    return out


def load_image(path: str, size: Tuple[int, int], resample=BILINEAR) -> np.ndarray:
    """Decode one image -> uint8 HWC RGB resized with PIL (reference parity).

    ``transforms.Resize((H, W))`` on a PIL image resizes both edges with the
    given filter (fid_score.py:208-213 uses bilinear); scipy.misc.imresize in
    the IS* path (inception_score_star_bird.py:67) is also PIL bilinear on
    uint8.
    """
    with Image.open(path) as im:
        im = im.convert("RGB")
        if im.size != (size[1], size[0]):
            im = im.resize((size[1], size[0]), resample)
        return np.asarray(im, dtype=np.uint8)


def center_crop_resize(path: str, size: int, resample=BICUBIC) -> np.ndarray:
    """CLIP preprocessing geometry: resize shorter side to ``size`` (bicubic),
    then center crop ``size`` x ``size`` (openai/CLIP _transform; used by
    RP_coco.py:64 and PA.py:34)."""
    with Image.open(path) as im:
        im = im.convert("RGB")
        w, h = im.size
        scale = size / min(w, h)
        nw, nh = round(w * scale), round(h * scale)
        im = im.resize((nw, nh), resample)
        left = (nw - size) // 2
        top = (nh - size) // 2
        im = im.crop((left, top, left + size, top + size))
        return np.asarray(im, dtype=np.uint8)


@dataclass
class Batch:
    """A fixed-shape host batch."""

    images: np.ndarray  # uint8 [B, H, W, 3]
    mask: np.ndarray  # bool [B]; False rows are padding
    paths: Sequence[str]


class ImageFolderLoader:
    """Threaded decode + prefetch over an image folder.

    Equivalent surface to the reference's ``img_data.Dataset`` + DataLoader
    (num_workers=8, fid_score.py:215-217) without torch: a thread pool decodes
    and PIL-resizes images while the device consumes the previous batch.
    """

    def __init__(
        self,
        files: Sequence[str],
        batch_size: int,
        image_size: int,
        *,
        resample=BILINEAR,
        center_crop: bool = False,
        drop_last: bool = False,
        num_workers: int = 8,
        prefetch: int = 2,
    ):
        self.files = list(files)
        self.batch_size = batch_size
        self.image_size = image_size
        self.resample = resample
        self.center_crop = center_crop
        self.drop_last = drop_last
        self.num_workers = num_workers
        self.prefetch = prefetch

    @classmethod
    def from_dir(cls, root: str, batch_size: int, image_size: int, **kw) -> "ImageFolderLoader":
        return cls(list_images(root), batch_size, image_size, **kw)

    def __len__(self) -> int:
        n = len(self.files)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def num_images(self) -> int:
        n = len(self.files)
        return (n // self.batch_size) * self.batch_size if self.drop_last else n

    def _decode(self, path: str) -> np.ndarray:
        if self.center_crop:
            return center_crop_resize(path, self.image_size, self.resample)
        return load_image(path, (self.image_size, self.image_size), self.resample)

    def _make_batch(self, pool: ThreadPoolExecutor, chunk: Sequence[str]) -> Batch:
        imgs = list(pool.map(self._decode, chunk))
        b = len(imgs)
        out = np.zeros((self.batch_size, self.image_size, self.image_size, 3), dtype=np.uint8)
        out[:b] = np.stack(imgs)
        mask = np.zeros((self.batch_size,), dtype=bool)
        mask[:b] = True
        return Batch(images=out, mask=mask, paths=chunk)

    def __iter__(self) -> Iterator[Batch]:
        files = self.files
        n_full = len(files) // self.batch_size
        chunks = [files[i * self.batch_size : (i + 1) * self.batch_size] for i in range(n_full)]
        tail = files[n_full * self.batch_size :]
        if tail and not self.drop_last:
            chunks.append(tail)
        if not chunks:
            return

        q: "queue.Queue" = queue.Queue(maxsize=max(1, self.prefetch))
        stop = threading.Event()

        def producer() -> None:
            with ThreadPoolExecutor(max_workers=self.num_workers) as pool:
                for chunk in chunks:
                    if stop.is_set():
                        return
                    q.put(self._make_batch(pool, chunk))
            q.put(None)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    return
                yield item
        finally:
            stop.set()
