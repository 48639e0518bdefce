"""Evaluation-image generation (reference: AttnGAN++/coco_gen_image_from_caption.py,
coco_gen_soa_input_images.py, coco_gen_PA_input_images.py,
cub_gen_image_from_caption.py and the gen_evaluation_images_{coco,cub}.sh
orchestration).

Three layouts, selected by --mode:
  flat  caption pickle (list of {caption_id, caption}) ->
        ``<out>/<caption_id>.png``            (coco_gen_image_from_caption.py:198-203)
  soa   {label_dir: [items]} -> ``<out>/<label_dir>/<caption_id>_<k>.png``
        with --images_per_caption (3)         (coco_gen_soa_input_images.py:163-213)
  pa    {positional_word: [items]} -> ``<out>/<word>/<caption_id>.png``
        (coco_gen_PA_input_images.py:160-212)

Generates with the EMA generator checkpoint, the frozen DAMSM text encoder
and the captions.pickle vocab; the finest scale is written.  Reference seeds
generation with 100 (coco_gen_image_from_caption.py:40); --seed defaults to
that.  Batches are static-shape and the G forward is jitted once.
"""

from __future__ import annotations

import argparse
import os
from typing import Dict, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from tise_tpu.backbones import damsm
from tise_tpu.core import io as result_io
from tise_tpu.metrics.rp_cub import load_vocab, tokenize_caption
from tise_tpu.models.attngan_pp.generator import GanConfig, GNet
from tise_tpu.models.counter_model.generator import CounterGNet


class CaptionGenerator:
    """jit-compiled caption -> image sampler."""

    def __init__(
        self,
        g_params,
        g_batch_stats,
        text_params,
        *,
        gan: GanConfig,
        ntoken: int,
        model: str = "attngan_pp",
        seed: int = 100,
    ):
        gnet = GNet(cfg=gan) if model == "attngan_pp" else CounterGNet(cfg=gan)
        text_encoder = damsm.RNNEncoder(ntoken=ntoken, nhidden=gan.embedding_dim // 2)
        self.gan = gan
        self._key = jax.random.PRNGKey(seed)

        def sample(gp, gs, tp, captions, cap_lens, rng):
            words, sent = text_encoder.apply(tp, captions, cap_lens)
            mask = captions == 0
            r_z, r_ca = jax.random.split(rng)
            z = jax.random.normal(r_z, (captions.shape[0], gan.z_dim))
            fakes, _attn, _mu, _lv = gnet.apply(
                {"params": gp, "batch_stats": gs}, z, sent, words, mask, r_ca, train=False
            )
            img = fakes[-1]  # finest scale
            # [-1, 1] -> uint8 (coco_gen_image_from_caption.py:149-153)
            return jnp.clip((img + 1.0) * 127.5, 0, 255).astype(jnp.uint8)

        self._params = (g_params, g_batch_stats, text_params)
        self._sample = jax.jit(sample)

    def __call__(self, captions: np.ndarray, cap_lens: np.ndarray, step: int) -> np.ndarray:
        rng = jax.random.fold_in(self._key, step)
        return np.asarray(self._sample(*self._params, captions, cap_lens, rng))


def _tokenize_items(items: Sequence[Dict], wordtoix: Dict[str, int], words_num: int):
    caps = np.zeros((len(items), words_num), np.int32)
    lens = np.ones((len(items),), np.int32)
    for i, item in enumerate(items):
        ids = tokenize_caption(item["caption"], wordtoix)[:words_num]
        if ids:
            caps[i, : len(ids)] = ids
            lens[i] = len(ids)
    return caps, lens


def generate_flat(
    items: Sequence[Dict],
    out_dir: str,
    gen: CaptionGenerator,
    wordtoix: Dict[str, int],
    *,
    batch_size: int = 32,
    words_num: int = 18,
    name_fn=None,
    step_offset: int = 0,
) -> int:
    os.makedirs(out_dir, exist_ok=True)
    name_fn = name_fn or (lambda item, k: f"{item['caption_id']}.png")
    written = 0
    for start in range(0, len(items), batch_size):
        chunk = list(items[start : start + batch_size])
        caps, lens = _tokenize_items(chunk, wordtoix, words_num)
        pad = batch_size - len(chunk)
        if pad:
            caps = np.concatenate([caps, np.zeros((pad, words_num), np.int32)])
            lens = np.concatenate([lens, np.ones((pad,), np.int32)])
        imgs = gen(caps, lens, step_offset + start)
        for i, item in enumerate(chunk):
            Image.fromarray(imgs[i]).save(os.path.join(out_dir, name_fn(item, 0)))
            written += 1
    return written


def generate_grouped(
    data: Dict[str, Sequence[Dict]],
    out_dir: str,
    gen: CaptionGenerator,
    wordtoix: Dict[str, int],
    *,
    batch_size: int = 32,
    words_num: int = 18,
    images_per_caption: int = 1,
    indexed_names: bool = False,
) -> int:
    """soa/pa layouts: one subfolder per group key."""
    written = 0
    for g_idx, (group, items) in enumerate(sorted(data.items())):
        gdir = os.path.join(out_dir, group)
        for k in range(images_per_caption):
            name_fn = (
                (lambda item, _k, k=k: f"{item['caption_id']}_{k}.png")
                if indexed_names
                else (lambda item, _k: f"{item['caption_id']}.png")
            )
            written += generate_flat(
                items,
                gdir,
                gen,
                wordtoix,
                batch_size=batch_size,
                words_num=words_num,
                name_fn=name_fn,
                step_offset=(g_idx * images_per_caption + k) * 1_000_000,
            )
    return written


def load_generator_from_checkpoint(ckpt_path: str, text_encoder_path: str, gan: GanConfig, ntoken: int, model: str):
    """Load (EMA) generator params + DAMSM text encoder for sampling."""
    from tise_tpu.core import weights as weights_io

    tree = weights_io.load_pytree_npz(ckpt_path) if ckpt_path.endswith(".npz") else None
    if tree is None:
        import orbax.checkpoint as ocp

        tree = ocp.StandardCheckpointer().restore(os.path.abspath(ckpt_path))
    g_params = tree.get("g_ema", tree.get("g_params"))
    g_stats = tree.get("g_batch_stats", {})
    if text_encoder_path.endswith(".npz"):
        text_params = weights_io.load_pytree_npz(text_encoder_path)
    else:
        text_params = damsm.rnn_params_from_torch(weights_io.load_torch_state_dict(text_encoder_path))
    return g_params, g_stats, text_params


def main(argv=None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--caption_file", type=str, required=True, help="caption pickle (schema per mode)")
    p.add_argument("--output_dir", type=str, required=True)
    p.add_argument("--mode", choices=["flat", "soa", "pa"], default="flat")
    p.add_argument("--model", choices=["attngan_pp", "counter_model"], default="attngan_pp")
    p.add_argument("--checkpoint", type=str, required=True, help="trainer checkpoint (.npz/orbax dir)")
    p.add_argument("--text_encoder", type=str, required=True)
    p.add_argument("--captions_pickle", type=str, required=True, help="vocab source")
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--words_num", type=int, default=18)
    p.add_argument("--images_per_caption", type=int, default=3, help="(soa mode)")
    p.add_argument("--seed", type=int, default=100)
    p.add_argument("--gf_dim", type=int, default=128)
    p.add_argument("--z_dim", type=int, default=100)
    p.add_argument("--condition_dim", type=int, default=100)
    p.add_argument("--embedding_dim", type=int, default=256)
    args = p.parse_args(argv)

    _ixtoword, wordtoix = load_vocab(args.captions_pickle)
    ntoken = len(_ixtoword)
    gan = GanConfig(
        gf_dim=args.gf_dim,
        z_dim=args.z_dim,
        condition_dim=args.condition_dim,
        embedding_dim=args.embedding_dim,
        words_num=args.words_num,
    )
    g_params, g_stats, text_params = load_generator_from_checkpoint(
        args.checkpoint, args.text_encoder, gan, ntoken, args.model
    )
    gen = CaptionGenerator(
        g_params, g_stats, text_params, gan=gan, ntoken=ntoken, model=args.model, seed=args.seed
    )
    data = result_io.load_pickle(args.caption_file)
    if args.mode == "flat":
        n = generate_flat(data, args.output_dir, gen, wordtoix, batch_size=args.batch_size, words_num=args.words_num)
    elif args.mode == "soa":
        n = generate_grouped(
            data, args.output_dir, gen, wordtoix,
            batch_size=args.batch_size, words_num=args.words_num,
            images_per_caption=args.images_per_caption, indexed_names=True,
        )
    else:
        n = generate_grouped(
            data, args.output_dir, gen, wordtoix, batch_size=args.batch_size, words_num=args.words_num
        )
    print(f"wrote {n} images to {args.output_dir}")


if __name__ == "__main__":
    main()
