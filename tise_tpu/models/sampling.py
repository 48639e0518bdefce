"""Trainer-side evaluation sampling (reference: AttnGAN++/trainer.py
``sampling()``, :514-641).

Two jobs the reference folds into one method:
  * generate images for every test-split caption with the EMA generator
    (30k for COCO) — covered by tise_tpu.models.generate for arbitrary
    caption pickles; this module drives it from a TextImageDataset split;
  * train-time R-precision (:608-641): for each generated image, rank the
    its caption against 99 dataset-sampled mismatched captions
    (datasets.py:300-319) with the frozen DAMSM encoders — the model
    selection signal during training.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

from tise_tpu.metrics.rp_cub import DamsmScorer, pack_caption_sets
from tise_tpu.models import generate as gen_lib
from tise_tpu.models.datasets import TextImageDataset


def sample_test_split(
    dataset: TextImageDataset,
    gen: gen_lib.CaptionGenerator,
    out_dir: str,
    *,
    batch_size: int = 32,
) -> int:
    """Generate one image per test item, named by item index (the reference
    names by caption id; dataset items carry filenames, so the index is the
    stable id here)."""
    items = []
    for idx in range(len(dataset)):
        caps, length = dataset.sample_caption(idx)
        toks = [dataset.ixtoword.get(int(t), "") for t in caps[:length]]
        items.append({"caption_id": idx, "caption": " ".join(toks)})
    return gen_lib.generate_flat(
        items, out_dir, gen, dataset.wordtoix, batch_size=batch_size, words_num=dataset.words_num
    )


def train_time_r_precision(
    dataset: TextImageDataset,
    image_dir: str,
    scorer: DamsmScorer,
    *,
    batch_size: int = 16,
    max_items: Optional[int] = None,
) -> float:
    """R-precision over generated test images with dataset-sampled
    mismatched captions (trainer.py:608-641 + datasets.py:300-319)."""
    n = len(dataset) if max_items is None else min(max_items, len(dataset))
    successes = np.zeros(n, dtype=np.float64)
    max_len = scorer.max_len
    for start in range(0, n, batch_size):
        idxs = list(range(start, min(start + batch_size, n)))
        imgs, cap_sets = [], []
        for idx in idxs:
            from tise_tpu.core.data import load_image

            imgs.append(load_image(os.path.join(image_dir, f"{idx}.png"), (256, 256)))
            gt_caps, gt_len = dataset.sample_caption(idx)
            mis_caps, mis_lens = dataset.get_mis_captions(int(dataset.class_id[idx]))
            ids = [list(gt_caps[:gt_len])] + [list(mis_caps[j, : mis_lens[j]]) for j in range(len(mis_caps))]
            cap_sets.append(ids)
        caps, lens = pack_caption_sets(cap_sets, max_len)
        scores = scorer.scores(np.stack(imgs), caps, lens)
        successes[idxs] = (np.argmax(scores, axis=1) == 0).astype(np.float64)
    return float(np.mean(successes))
