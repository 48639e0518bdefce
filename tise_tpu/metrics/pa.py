"""PA — Positional Alignment (reference: positional_alignment/PA.py).

Input pickle: {positional_word: [ {caption, false_caption, caption_id}, ... ]}
(README.md:140-154).  Per item, CLIP scores the caption against the
``false_caption`` (the same sentence with the positional word swapped); the
item succeeds iff P(gt) > 0.6 after a 2-way softmax (PA.py:33-43).  The final
PA is the unweighted mean of per-phrase success rates (:67).

Images live at ``<image_dir>/<phrase>/<caption_id>.png`` (:56-60).
TPU redesign: items are scored in [B, 2]-caption blocks per pjit step.
"""

from __future__ import annotations

import argparse
import os
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, Sequence, Tuple

import numpy as np

from tise_tpu.backbones.clip_tokenizer import SimpleTokenizer
from tise_tpu.core import io as result_io
from tise_tpu.core.config import (add_distributed_flags, add_precision_flag,
                                  configure_precision, maybe_init_distributed,
                                  PA_SUCCESS_THRESHOLD)
from tise_tpu.core.data import center_crop_resize
from tise_tpu.metrics.clip_scorer import ClipPairScorer


def _softmax2_first(logits: np.ndarray) -> np.ndarray:
    """P(gt) of the 2-way softmax: [B, 2] -> [B]."""
    m = logits.max(axis=1, keepdims=True)
    e = np.exp(logits - m)
    return e[:, 0] / e.sum(axis=1)


def score_phrase(
    items: Sequence[Dict],
    phrase_dir: str,
    scorer: ClipPairScorer,
    tokenizer: SimpleTokenizer,
    *,
    batch_size: int = 64,
    threshold: float = PA_SUCCESS_THRESHOLD,
    num_workers: int = 8,
) -> Tuple[float, int]:
    """-> (success rate, total) for one positional-word folder.

    Multi-host: the phrase's items shard across processes, per-item success
    bits allgather back (tise_tpu/parallel/multihost.py)."""
    from tise_tpu.parallel import multihost

    n = len(items)
    sel, gidx = multihost.shard_items(list(items))
    local = np.zeros(len(sel), dtype=bool)
    with ThreadPoolExecutor(max_workers=num_workers) as pool:
        for start in range(0, len(sel), batch_size):
            chunk = sel[start : start + batch_size]
            imgs = list(
                pool.map(
                    lambda it: center_crop_resize(os.path.join(phrase_dir, f"{it['caption_id']}.png"), 224), chunk
                )
            )
            toks = [tokenizer.tokenize([it["caption"], it["false_caption"]]) for it in chunk]
            logits = scorer.logits(np.stack(imgs), np.stack(toks))
            local[start : start + len(chunk)] = _softmax2_first(logits) > threshold
    success = multihost.allgather_rows(local, gidx, n)
    return float(np.sum(success)) / n if n else 0.0, n


def _load_phrase_snapshot(path: str, fingerprint: str) -> Dict[str, Dict]:
    """-> completed {phrase: {success, total, score}} or {} when absent/stale."""
    if not os.path.exists(path):
        return {}
    try:
        with np.load(path, allow_pickle=False) as z:
            if str(z["fingerprint"]) != fingerprint:
                return {}
            return {
                str(nm): {
                    "success": float(z["success"][i]),
                    "total": float(z["total"][i]),
                    "score": float(z["score"][i]),
                }
                for i, nm in enumerate(z["phrases"])
            }
    except Exception:  # noqa: BLE001 — torn/corrupt snapshot: start over
        return {}


def _save_phrase_snapshot(path: str, fingerprint: str, phrase_res: Dict[str, Dict]) -> None:
    names = list(phrase_res)
    tmp = path + ".tmp.npz"  # np.savez appends .npz to bare names
    np.savez(
        tmp,
        fingerprint=fingerprint,
        phrases=np.asarray(names),
        success=np.asarray([phrase_res[n]["success"] for n in names]),
        total=np.asarray([phrase_res[n]["total"] for n in names]),
        score=np.asarray([phrase_res[n]["score"] for n in names]),
    )
    os.replace(tmp, path)  # atomic: a kill mid-write never leaves a torn file


def compute_pa(
    data: Dict[str, Sequence[Dict]],
    image_dir: str,
    scorer: ClipPairScorer,
    tokenizer: SimpleTokenizer,
    *,
    batch_size: int = 64,
    threshold: float = PA_SUCCESS_THRESHOLD,
    snapshot_path: str = "",
    build_scorer=None,
) -> Tuple[float, Dict[str, Dict]]:
    """Drop tolerance at phrase granularity (the moral equivalent of SOA's
    per-label pickles, SOA.py:77-79): completed phrase results snapshot to
    ``snapshot_path``; a transport drop resets the backend in-process,
    rebuilds the scorer, and re-runs only the interrupted phrase; a killed
    process resumes past the completed phrases on re-run."""
    from tise_tpu.metrics import extractor as ext
    from tise_tpu.parallel import multihost

    if snapshot_path and multihost.is_distributed():
        raise NotImplementedError(
            "PA snapshots are single-process; multi-host runs shard items instead"
        )

    phrase_res: Dict[str, Dict] = {}
    fp = ""
    if snapshot_path:
        fp = ext._snapshot_fingerprint(
            [f"{p}:{len(items)}" for p, items in data.items()], 224, ("pa",)
        )
        phrase_res = _load_phrase_snapshot(snapshot_path, fp)
        if phrase_res:
            print(f"[pa] resuming: {len(phrase_res)}/{len(data)} phrases from snapshot", flush=True)
    resets = 0
    for phrase, items in data.items():
        if phrase in phrase_res:
            continue
        while True:
            try:
                score, total = score_phrase(
                    items, os.path.join(image_dir, phrase), scorer, tokenizer,
                    batch_size=batch_size, threshold=threshold,
                )
                break
            except Exception as e:  # noqa: BLE001 — filtered to transport errors below
                from tise_tpu.core.backend import is_backend_drop, reset_backend

                if not snapshot_path or build_scorer is None or resets >= 2 or not is_backend_drop(e):
                    raise
                resets += 1
                print(f"[pa] backend drop in phrase '{phrase}' ({e}); "
                      f"reset {resets}/2, re-running the phrase", flush=True)
                reset_backend()
                scorer = build_scorer()
        phrase_res[phrase] = {"success": score * total, "total": float(total), "score": score}
        print(phrase, phrase_res[phrase])
        if snapshot_path:
            _save_phrase_snapshot(snapshot_path, fp, phrase_res)
    if snapshot_path and os.path.exists(snapshot_path):
        os.remove(snapshot_path)
    pa = float(np.mean([phrase_res[p]["score"] for p in phrase_res]))
    return pa, phrase_res


def main(argv=None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--image_dir", default="", type=str)
    p.add_argument("--pa_input_file", default="captions/PA_input_captions.pkl", type=str)
    p.add_argument("--saved_file_path", default=None, type=str)
    p.add_argument("--gpu_id", default="0", type=str, help="ignored (TPU build)")
    p.add_argument("--weights", type=str, required=True, help="CLIP ViT-B/32 weights (.pt/.npz)")
    p.add_argument("--bpe_path", type=str, required=True)
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--snapshot_file", type=str, default="",
                   help="make the phrase loop drop-tolerant: completed-phrase "
                        "snapshot at this path (bit-equal result)")
    add_precision_flag(p)
    add_distributed_flags(p)
    args = p.parse_args(argv)
    configure_precision(args.precision)
    maybe_init_distributed(args)

    from tise_tpu.backbones import clip_vit

    data = result_io.load_pickle(args.pa_input_file)
    build = lambda: ClipPairScorer(  # noqa: E731 — rebuilt after a backend reset
        clip_vit.load_params(args.weights), fast=args.precision == "fast"
    )
    scorer = build()
    tokenizer = SimpleTokenizer(args.bpe_path)
    pa, _ = compute_pa(data, args.image_dir, scorer, tokenizer, batch_size=args.batch_size,
                       snapshot_path=args.snapshot_file, build_scorer=build)
    if args.saved_file_path is not None:
        result_io.write_pa_result(args.saved_file_path, pa)
    print(f"PA = {pa}")


if __name__ == "__main__":
    main()
