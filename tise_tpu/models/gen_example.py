"""Free-text example generation (reference: AttnGAN++/main.py:28-75
``gen_example`` driver + trainer.py:643-706 ``Trainer.gen_example``).

Reads ``<data_dir>/example_filenames.txt`` (one caption-file name per line),
tokenizes each non-empty sentence of every ``<data_dir>/<name>.txt`` with the
\\w+ regex / lowercase / ascii-filter pipeline (main.py:40-56), sorts a file's
captions by descending length (main.py:59-67), and for each file key writes

    <output_dir>/<key>/0_s_<original_caption_index>_g<k>.png

for every generator scale k (trainer.py:694-706: ``(im + 1) * 127.5`` uint8).
The reference derives <output_dir> from the G checkpoint path minus ".pth"
(trainer.py:658,666); here it defaults to ``<checkpoint>_examples`` and is
overridable with --output_dir.

Extension beyond the reference (off by --no_attn): an attention super-image
``0_s_<idx>_attn.png`` per caption via models/visualize.build_super_image —
the stripped TISE gen_example dropped upstream AttnGAN's attention dumps, but
the generator returns the maps anyway and they are the point of the demo.
"""

from __future__ import annotations

import argparse
import os
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from tise_tpu.backbones import damsm
from tise_tpu.metrics.rp_cub import load_vocab, tokenize_caption
from tise_tpu.models import visualize
from tise_tpu.models.attngan_pp.generator import GanConfig, GNet
from tise_tpu.models.generate import load_generator_from_checkpoint


def read_example_captions(
    data_dir: str, wordtoix: Dict[str, int]
) -> Dict[str, Tuple[np.ndarray, np.ndarray, np.ndarray]]:
    """-> {key: (captions [N, max_len] int32 desc-length-sorted, cap_lens,
    sorted_indices)} — main.py:28-73 semantics (key = basename of the listed
    caption file)."""
    listing = os.path.join(data_dir, "example_filenames.txt")
    with open(listing) as f:
        names = [n for n in f.read().split("\n") if n]
    data: Dict[str, Tuple[np.ndarray, np.ndarray, np.ndarray]] = {}
    for name in names:
        with open(os.path.join(data_dir, f"{name}.txt")) as f:
            sentences = [s for s in f.read().split("\n") if s]
        tokenized: List[List[int]] = []
        for sent in sentences:
            ids = tokenize_caption(sent, wordtoix)
            if ids:
                tokenized.append(ids)
        if not tokenized:
            continue
        cap_lens = np.asarray([len(t) for t in tokenized])
        sorted_indices = np.argsort(cap_lens)[::-1]
        cap_lens = cap_lens[sorted_indices]
        max_len = int(cap_lens[0])
        cap_array = np.zeros((len(tokenized), max_len), dtype=np.int32)
        for i, src in enumerate(sorted_indices):
            cap_array[i, : len(tokenized[src])] = tokenized[src]
        key = name[name.rfind("/") + 1 :]
        data[key] = (cap_array, cap_lens.astype(np.int32), sorted_indices)
    return data


class ExampleSampler:
    """jit-compiled caption batch -> (all scales uint8, word attention maps)."""

    def __init__(self, g_params, g_batch_stats, text_params, *, gan: GanConfig, ntoken: int, seed: int):
        gnet = GNet(cfg=gan)
        text_encoder = damsm.RNNEncoder(ntoken=ntoken, nhidden=gan.embedding_dim // 2)
        self._key = jax.random.PRNGKey(seed)
        self._params = (g_params, g_batch_stats, text_params)

        def sample(gp, gs, tp, captions, cap_lens, rng):
            words, sent = text_encoder.apply(tp, captions, cap_lens)
            mask = captions == 0
            r_z, r_ca = jax.random.split(rng)
            z = jax.random.normal(r_z, (captions.shape[0], gan.z_dim))
            fakes, attn, _mu, _lv = gnet.apply(
                {"params": gp, "batch_stats": gs}, z, sent, words, mask, r_ca, train=False
            )
            imgs = tuple(jnp.clip((f + 1.0) * 127.5, 0, 255).astype(jnp.uint8) for f in fakes)
            # finest-stage attention [B, ih, iw, T] -> word-major [B, T, ih, iw]
            a = attn[-1].transpose(0, 3, 1, 2) if attn else None
            return imgs, a

        self._sample = jax.jit(sample)

    def __call__(self, captions: np.ndarray, cap_lens: np.ndarray, step: int):
        rng = jax.random.fold_in(self._key, step)
        imgs, attn = self._sample(*self._params, captions, cap_lens, rng)
        return [np.asarray(i) for i in imgs], (None if attn is None else np.asarray(attn))


def generate_examples(
    data: Dict[str, Tuple[np.ndarray, np.ndarray, np.ndarray]],
    output_dir: str,
    sampler: ExampleSampler,
    *,
    words_num: int,
    ixtoword=None,
    save_attn: bool = True,
) -> int:
    written = 0
    for step, (key, (captions, cap_lens, sorted_indices)) in enumerate(sorted(data.items())):
        save_dir = os.path.join(output_dir, key)
        os.makedirs(save_dir, exist_ok=True)
        # static-shape pad to words_num so every file hits the same executable
        caps = np.zeros((captions.shape[0], words_num), np.int32)
        caps[:, : min(words_num, captions.shape[1])] = captions[:, :words_num]
        lens = np.minimum(cap_lens, words_num).astype(np.int32)
        imgs, attn = sampler(caps, lens, step)
        for j in range(captions.shape[0]):
            orig = int(sorted_indices[j])
            for k, scale_imgs in enumerate(imgs):
                Image.fromarray(scale_imgs[j]).save(os.path.join(save_dir, f"0_s_{orig}_g{k}.png"))
                written += 1
            if save_attn and attn is not None and ixtoword is not None:
                grid = visualize.build_super_image(
                    imgs[-1][j : j + 1].astype(np.float32) / 127.5 - 1.0,
                    attn[j : j + 1],
                    caps[j : j + 1],
                    lens[j : j + 1],
                    ixtoword,
                )
                grid.save(os.path.join(save_dir, f"0_s_{orig}_attn.png"))
    return written


def main(argv=None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--data_dir", type=str, required=True,
                   help="dir holding example_filenames.txt + the caption .txt files")
    p.add_argument("--output_dir", type=str, default=None,
                   help="default: <checkpoint>_examples (reference strips .pth)")
    p.add_argument("--checkpoint", type=str, required=True)
    p.add_argument("--text_encoder", type=str, required=True)
    p.add_argument("--captions_pickle", type=str, required=True, help="vocab source")
    p.add_argument("--words_num", type=int, default=18)
    p.add_argument("--seed", type=int, default=100)
    p.add_argument("--no_attn", action="store_true", help="skip attention super-images")
    p.add_argument("--gf_dim", type=int, default=128)
    p.add_argument("--z_dim", type=int, default=100)
    p.add_argument("--condition_dim", type=int, default=100)
    p.add_argument("--embedding_dim", type=int, default=256)
    args = p.parse_args(argv)

    ixtoword, wordtoix = load_vocab(args.captions_pickle)
    gan = GanConfig(
        gf_dim=args.gf_dim, z_dim=args.z_dim, condition_dim=args.condition_dim,
        embedding_dim=args.embedding_dim, words_num=args.words_num,
    )
    g_params, g_stats, text_params = load_generator_from_checkpoint(
        args.checkpoint, args.text_encoder, gan, len(ixtoword), "attngan_pp"
    )
    sampler = ExampleSampler(g_params, g_stats, text_params, gan=gan, ntoken=len(ixtoword), seed=args.seed)
    out = args.output_dir or (os.path.splitext(args.checkpoint)[0] + "_examples")
    data = read_example_captions(args.data_dir, wordtoix)
    n = generate_examples(
        data, out, sampler, words_num=args.words_num, ixtoword=ixtoword, save_attn=not args.no_attn
    )
    print(f"wrote {n} images to {out}")


if __name__ == "__main__":
    main()
