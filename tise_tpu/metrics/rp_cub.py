"""RP (CUB) — R-precision via the DAMSM encoders (reference: text_relevance/RP_cub.py).

Per item: cosine similarity between the image's ``cnn_code`` and the
``rnn_code`` of the GT caption + 99 mismatched captions; success iff the GT
scores highest (RP_cub.py:99-132).  Captions tokenize with a ``\\w+`` regex,
lowercase, ascii-filtered, mapped through the captions.pickle vocab (:58-96).
Images: PIL resize (256, 256) + Normalize(0.5, 0.5) (:135-137).

Scoring quirks reproduced under ``legacy_compat`` (SURVEY.md section 7):
the reference shuffles the per-item successes and averages slices
``[i*3000 : (i+1)*3000 - 1]`` — an off-by-one that silently drops the last
item of each bin (:153-156).  The default mode uses 10 equal bins.

TPU design: no pack_padded sorting — the masked-scan bi-LSTM handles ragged
lengths directly, and items are scored in [B, 100-caption] blocks per pjit
step (the reference runs 1 image + 2 text forwards per item).
"""

from __future__ import annotations

import argparse
import os
import re
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from tise_tpu.backbones import damsm
from tise_tpu.core import io as result_io
from tise_tpu.core.config import (add_distributed_flags, add_precision_flag,
                                  configure_precision, maybe_init_distributed,
                                  NUM_SPLITS)
from tise_tpu.core.data import load_image
from tise_tpu.core.mesh import make_mesh
from tise_tpu.ops.preprocess import normalize

_WORD_RE = re.compile(r"\w+")


def tokenize_caption(sent: str, wordtoix: Dict[str, int]) -> List[int]:
    """Reference tokenization: \\w+ regex, lower, ascii filter, vocab lookup
    (RP_cub.py:58-75)."""
    sent = sent.replace("��", " ")
    ids = []
    for tok in _WORD_RE.findall(sent.lower()):
        tok = tok.encode("ascii", "ignore").decode("ascii")
        if tok and tok in wordtoix:
            ids.append(wordtoix[tok])
    return ids


def load_vocab(captions_pickle: str) -> Tuple[Dict[int, str], Dict[str, int]]:
    """captions.pickle entries 2/3 are (ixtoword, wordtoix) (RP_cub.py:33-37)."""
    import pickle

    with open(captions_pickle, "rb") as f:
        x = pickle.load(f, encoding="latin1")
    return x[2], x[3]


class DamsmScorer:
    """jit-compiled (image batch, caption-set batch) -> cosine scores."""

    def __init__(self, rnn_params, cnn_params, ntoken: int, *, max_len: int = 32, mesh=None):
        self.mesh = mesh if mesh is not None else make_mesh()
        self.max_len = max_len
        rnn = damsm.RNNEncoder(ntoken=ntoken)
        cnn = damsm.CNNEncoder()
        data = self.mesh.axis_names[0]

        def fwd(rnn_p, cnn_p, images_u8, captions, lengths):
            # images_u8 [B,256,256,3]; captions [B,K,T]; lengths [B,K]
            b, k, t = captions.shape
            x = normalize(images_u8, "half")
            _, cnn_code = cnn.apply(cnn_p, x)  # [B, nef]
            _, rnn_code = rnn.apply(rnn_p, captions.reshape(b * k, t), lengths.reshape(b * k))
            rnn_code = rnn_code.reshape(b, k, -1)
            # cosine with the reference's 1e-8 norm clamp (RP_cub.py:123-127)
            num = jnp.einsum("bd,bkd->bk", cnn_code, rnn_code)
            denom = jnp.linalg.norm(cnn_code, axis=-1, keepdims=True) * jnp.linalg.norm(rnn_code, axis=-1)
            return num / jnp.clip(denom, 1e-8)

        self._params = (rnn_params, cnn_params)
        self._fwd = jax.jit(
            fwd,
            in_shardings=(
                NamedSharding(self.mesh, P()),
                NamedSharding(self.mesh, P()),
                NamedSharding(self.mesh, P(data)),
                NamedSharding(self.mesh, P(data)),
                NamedSharding(self.mesh, P(data)),
            ),
            out_shardings=NamedSharding(self.mesh, P(data)),
        )

    @property
    def data_parallel(self) -> int:
        return self.mesh.shape[self.mesh.axis_names[0]]

    def scores(self, images_u8: np.ndarray, captions: np.ndarray, lengths: np.ndarray) -> np.ndarray:
        b = images_u8.shape[0]
        pad = (-b) % self.data_parallel
        if pad:
            images_u8 = np.concatenate([images_u8, np.zeros((pad,) + images_u8.shape[1:], images_u8.dtype)])
            captions = np.concatenate([captions, np.zeros((pad,) + captions.shape[1:], captions.dtype)])
            lengths = np.concatenate([lengths, np.ones((pad,) + lengths.shape[1:], lengths.dtype)])
        out = np.asarray(jax.device_get(self._fwd(*self._params, images_u8, captions, lengths)))
        return out[:b]


def pack_caption_sets(
    caption_sets: Sequence[Sequence[List[int]]], max_len: int
) -> Tuple[np.ndarray, np.ndarray]:
    """[[ids...] x K] x B -> (captions [B,K,max_len], lengths [B,K])."""
    b = len(caption_sets)
    k = len(caption_sets[0])
    caps = np.zeros((b, k, max_len), dtype=np.int32)
    lens = np.ones((b, k), dtype=np.int32)
    for i, cap_set in enumerate(caption_sets):
        for j, ids in enumerate(cap_set):
            ids = ids[:max_len]
            if ids:
                caps[i, j, : len(ids)] = ids
                lens[i, j] = len(ids)
    return caps, lens


def legacy_bins(successes: np.ndarray, seed: int = 0) -> np.ndarray:
    """Reference binning incl. the off-by-one slice (RP_cub.py:153-156)."""
    scores = np.array(successes, dtype=np.float64)
    rng = np.random.RandomState(seed)
    rng.shuffle(scores)
    bins = np.zeros(10)
    for i in range(10):
        bins[i] = np.average(scores[i * 3000 : (i + 1) * 3000 - 1])
    return bins


def equal_bins(successes: np.ndarray, num_bins: int = NUM_SPLITS, seed: int = 0) -> np.ndarray:
    scores = np.array(successes, dtype=np.float64)
    rng = np.random.RandomState(seed)
    rng.shuffle(scores)
    return np.array([np.mean(part) for part in np.array_split(scores, num_bins)])


def compute_rp_cub(
    rp_input: Sequence[Dict],
    image_dir: str,
    scorer: DamsmScorer,
    wordtoix: Dict[str, int],
    *,
    batch_size: int = 32,
    legacy_compat: bool = False,
    seed: int = 0,
    num_workers: int = 8,
    snapshot_path: str = "",
    build_scorer=None,
    snapshot_every: int = 0,
) -> Tuple[float, float]:
    """Per-item successes are a PREFIX of the (sharded) item order, so the
    loop is drop-tolerant the same way CA's is (metrics/ca.py compute_ca):
    periodic success-rows+cursor snapshots, in-process backend reset +
    scorer rebuild on a transport drop, process-level resume from the
    snapshot file."""
    from tise_tpu.metrics import extractor as ext
    from tise_tpu.parallel import multihost

    if snapshot_path and multihost.is_distributed():
        raise NotImplementedError(
            "RP-CUB snapshots are single-process; multi-host runs shard items instead"
        )

    n = len(rp_input)
    sel, gidx = multihost.shard_items(list(range(n)))
    max_len = scorer.max_len
    fp = ""
    chunks: Dict[str, list] = {}
    cursor = 0
    snapshot_every = snapshot_every or max(batch_size * 8, 256)
    if snapshot_path:
        fp = ext._snapshot_fingerprint(
            [str(rp_input[i]["caption_id"]) for i in sel], 256, ("rp_cub",)
        )
        chunks, cursor = ext._load_snapshot(snapshot_path, fp)
    resets = 0
    while cursor < len(sel):
        try:
            with ThreadPoolExecutor(max_workers=num_workers) as pool:
                since = 0
                for start in range(cursor, len(sel), batch_size):
                    chunk = sel[start : start + batch_size]
                    imgs = list(
                        pool.map(
                            lambda i: load_image(
                                os.path.join(image_dir, f"{rp_input[i]['caption_id']}.png"), (256, 256)
                            ),
                            chunk,
                        )
                    )
                    cap_sets = []
                    for i in chunk:
                        item = rp_input[i]
                        ids = [tokenize_caption(item["caption"], wordtoix)] + [
                            tokenize_caption(c, wordtoix) for c in item["mismatched_captions"]
                        ]
                        cap_sets.append(ids)
                    caps, lens = pack_caption_sets(cap_sets, max_len)
                    scores = scorer.scores(np.stack(imgs), caps, lens)
                    chunks.setdefault("success", []).append(
                        (np.argmax(scores, axis=1) == 0).astype(np.float64)
                    )
                    cursor = start + len(chunk)
                    since += len(chunk)
                    if snapshot_path and since >= snapshot_every:
                        ext._save_snapshot(snapshot_path, fp, chunks, cursor)
                        since = 0
            break
        except Exception as e:  # noqa: BLE001 — filtered to transport errors below
            from tise_tpu.core.backend import is_backend_drop, reset_backend

            if not snapshot_path or build_scorer is None or resets >= 2 or not is_backend_drop(e):
                raise
            resets += 1
            print(f"[rp_cub] backend drop at item {cursor}/{len(sel)} ({e}); "
                  f"reset {resets}/2, resuming from snapshot", flush=True)
            reset_backend()
            scorer = build_scorer()
            chunks, cursor = ext._load_snapshot(snapshot_path, fp)
    if snapshot_path and os.path.exists(snapshot_path):
        os.remove(snapshot_path)
    local = (
        np.concatenate(chunks["success"]) if chunks.get("success") else np.zeros(0, np.float64)
    )
    successes = multihost.allgather_rows(local, gidx, n)

    bins = legacy_bins(successes, seed) if legacy_compat else equal_bins(successes, seed=seed)
    return float(np.average(bins)), float(np.std(bins))


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description="Calculating R-precision")
    p.add_argument("--image_dir", default="", type=str)
    p.add_argument("--rp_input_file", default="captions/CUB_RP_captions.pkl", type=str)
    p.add_argument("--saved_file_path", default=None, type=str)
    p.add_argument("--gpu_id", default="0", type=str, help="ignored (TPU build)")
    p.add_argument("--captions_pickle", type=str, required=True, help="vocab source (captions.pickle)")
    p.add_argument("--text_encoder", type=str, required=True, help="text_encoder200.pth or .npz")
    p.add_argument("--image_encoder", type=str, required=True, help="image_encoder200.pth or .npz")
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--legacy-compat", action="store_true")
    p.add_argument("--snapshot_file", type=str, default="",
                   help="make the item loop drop-tolerant: periodic success+"
                        "cursor snapshot at this path (bit-equal result)")
    add_precision_flag(p)
    add_distributed_flags(p)
    args = p.parse_args(argv)
    configure_precision(args.precision)
    maybe_init_distributed(args)

    from tise_tpu.core import weights as weights_io

    _ixtoword, wordtoix = load_vocab(args.captions_pickle)
    n_words = len(_ixtoword)

    def load(path, converter):
        if path.endswith(".npz"):
            return weights_io.load_pytree_npz(path)
        return converter(weights_io.load_torch_state_dict(path))

    rnn_params = load(args.text_encoder, damsm.rnn_params_from_torch)
    cnn_params = load(args.image_encoder, damsm.cnn_params_from_torch)
    build = lambda: DamsmScorer(  # noqa: E731 — rebuilt after a backend reset
        rnn_params, cnn_params, ntoken=n_words
    )
    scorer = build()
    rp_input = result_io.load_pickle(args.rp_input_file)
    mean, std = compute_rp_cub(
        rp_input,
        args.image_dir,
        scorer,
        wordtoix,
        batch_size=args.batch_size,
        legacy_compat=args.legacy_compat,
        seed=args.seed,
        snapshot_path=args.snapshot_file,
        build_scorer=build,
    )
    if args.saved_file_path is not None:
        result_io.write_rp_cub_result(args.saved_file_path, mean, std)
    print("R mean:{:.6f} std:{:.6f}".format(mean, std))


if __name__ == "__main__":
    main()
