"""RP (COCO) — R-precision via CLIP ViT-B/32 (reference: text_relevance/RP_coco.py).

Per caption item: rank the ground-truth caption against its 99
``mismatched_captions`` by image-text logits; success iff the GT ranks first
(RP_coco.py:67-76).  Items are shuffled into 10 bins (the last absorbs the
remainder, :41-52); the final score is mean +- std over per-bin success rates
(:83-85).  The reference's shuffle is unseeded (:43); here it is seeded
(--seed) for reproducibility.

TPU redesign: instead of one 1-image x 100-text forward per item, whole
blocks of items run per pjit step via ClipPairScorer (images [B,224,224,3],
tokens [B,100,77]), sharded over the data mesh axis.
"""

from __future__ import annotations

import argparse
import random
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, List, Sequence, Tuple

import numpy as np

from tise_tpu.backbones.clip_tokenizer import SimpleTokenizer
from tise_tpu.core import io as result_io
from tise_tpu.core.config import (add_distributed_flags, add_precision_flag,
                                  configure_precision, maybe_init_distributed,
                                  NUM_SPLITS)
from tise_tpu.core.data import center_crop_resize
from tise_tpu.metrics.clip_scorer import ClipPairScorer


def make_bins(num_items: int, num_bins: int = NUM_SPLITS, seed: int = 0) -> List[List[int]]:
    """Shuffled ids split into bins; last bin takes the remainder
    (RP_coco.py:41-52)."""
    ids = list(range(num_items))
    random.Random(seed).shuffle(ids)
    per_bin = num_items // num_bins
    bins = []
    for i in range(num_bins):
        if i == num_bins - 1 and num_items % num_bins != 0:
            bins.append(ids[i * per_bin :])
        else:
            bins.append(ids[i * per_bin : (i + 1) * per_bin])
    return bins


def score_items(
    items: Sequence[Dict],
    image_paths: Sequence[str],
    scorer: ClipPairScorer,
    tokenizer: SimpleTokenizer,
    *,
    batch_size: int = 64,
    num_workers: int = 8,
    dedup_text: bool = True,
    snapshot_path: str = "",
    build_scorer=None,
    snapshot_every: int = 0,
) -> np.ndarray:
    """-> bool success per item (GT caption ranked first among 100).

    ``dedup_text`` (default): every UNIQUE caption string is tokenized and
    text-tower-encoded exactly once into a device-resident embedding bank;
    per-item ranking gathers its 100 rows and dots them against the image
    embedding.  Exact — same tokens produce bitwise-same embeddings, and the
    logit is scale*<img,txt> either way — but removes the ~100x caption
    repetition the reference re-encodes per item (RP_coco.py:70-73;
    mismatched captions come from the shared caption pool,
    datasets.py:300-319).  Bank memory is unique_captions x 512 f32 on
    device; pass ``dedup_text=False`` to re-encode per item like the
    reference if the caption set is adversarially all-unique AND too large
    to hold (3M unique rows = 6 GB).

    Multi-host: items shard across processes (local mesh each; the bank is
    built replicated per process), successes allgather into global item
    order (tise_tpu/parallel/multihost.py)."""
    from tise_tpu.metrics import extractor as ext
    from tise_tpu.parallel import multihost

    if snapshot_path and multihost.is_distributed():
        raise NotImplementedError(
            "RP snapshots are single-process; multi-host runs shard items instead"
        )

    n = len(items)
    sel, gidx = multihost.shard_items(list(range(n)))

    bank = None
    toks = rows = None
    if dedup_text:
        cap_id: Dict[str, int] = {}
        item_rows = []
        for i in sel:
            caps = [items[i]["caption"]] + list(items[i]["mismatched_captions"])
            item_rows.append([cap_id.setdefault(c, len(cap_id)) for c in caps])
        uniq = list(cap_id)
        toks = np.concatenate(
            [tokenizer.tokenize(uniq[s : s + 2048]) for s in range(0, len(uniq), 2048)]
        ) if uniq else np.zeros((0, 77), np.int32)
        bank = scorer.encode_text_bank(toks)
        rows = np.asarray(item_rows, dtype=np.int32) if item_rows else np.zeros((0, 1), np.int32)

    # drop-tolerant item loop (VERDICT r4 #3): successes are a PREFIX of the
    # item order — snapshot them + the cursor like the extraction pipelines,
    # re-encode the bank after an in-process backend reset (device arrays on
    # the dead client are gone), or resume from disk on a process re-run
    fp = ""
    chunks: Dict[str, list] = {}
    cursor = 0
    snapshot_every = snapshot_every or max(batch_size * 16, 1024)
    if snapshot_path:
        fp = ext._snapshot_fingerprint([image_paths[i] for i in sel], 224, ("success",))
        chunks, cursor = ext._load_snapshot(snapshot_path, fp)
    # dispatch_from_bank/pull_logits (when the scorer provides them) keep ONE
    # batch in flight: the device ranks batch k+1 while the host pulls batch
    # k's [B,K] logits — without this the ~28 ms tunnel RTT of the blocking
    # pull serializes with compute every batch (tools/rp_rank_ablate.py)
    can_pipeline = dedup_text and hasattr(scorer, "dispatch_from_bank")
    resets = 0
    while cursor < len(sel):
        try:
            with ThreadPoolExecutor(max_workers=num_workers) as pool:
                since = 0
                inflight = None  # (device logits, valid count, n items)

                def consume(flight) -> None:
                    nonlocal cursor, since
                    dev, n_items = flight
                    logits = scorer.pull_logits(dev)
                    chunks.setdefault("success", []).append(np.argmax(logits, axis=1) == 0)
                    cursor += n_items
                    since += n_items

                for start in range(cursor, len(sel), batch_size):
                    chunk = sel[start : start + batch_size]
                    imgs = list(pool.map(lambda i: center_crop_resize(image_paths[i], 224), chunk))
                    if can_pipeline:
                        dev = scorer.dispatch_from_bank(
                            np.stack(imgs), bank, rows[start : start + len(chunk)]
                        )
                        if inflight is not None:
                            consume(inflight)
                        inflight = (dev, len(chunk))
                    else:
                        if dedup_text:
                            logits = scorer.logits_from_bank(
                                np.stack(imgs), bank, rows[start : start + len(chunk)]
                            )
                        else:
                            batch_toks = []
                            for i in chunk:
                                caps = [items[i]["caption"]] + list(items[i]["mismatched_captions"])
                                batch_toks.append(tokenizer.tokenize(caps))
                            logits = scorer.logits(np.stack(imgs), np.stack(batch_toks))
                        chunks.setdefault("success", []).append(np.argmax(logits, axis=1) == 0)
                        cursor = start + len(chunk)
                        since += len(chunk)
                    if snapshot_path and since >= snapshot_every:
                        if inflight is not None:  # flush: the cursor must be exact
                            consume(inflight)
                            inflight = None
                        ext._save_snapshot(snapshot_path, fp, chunks, cursor)
                        since = 0
                if inflight is not None:
                    consume(inflight)
            break
        except Exception as e:  # noqa: BLE001 — filtered to transport errors below
            from tise_tpu.core.backend import is_backend_drop, reset_backend

            if not snapshot_path or build_scorer is None or resets >= 2 or not is_backend_drop(e):
                raise
            resets += 1
            print(f"[rp] backend drop at item {cursor}/{len(sel)} ({e}); "
                  f"reset {resets}/2, resuming from snapshot", flush=True)
            reset_backend()
            scorer = build_scorer()
            if dedup_text:
                bank = scorer.encode_text_bank(toks)
            chunks, cursor = ext._load_snapshot(snapshot_path, fp)
    if snapshot_path:
        import os

        if os.path.exists(snapshot_path):
            os.remove(snapshot_path)
    local = (
        np.concatenate(chunks["success"]).astype(bool)
        if chunks.get("success")
        else np.zeros(0, dtype=bool)
    )
    return multihost.allgather_rows(local, gidx, n)


def compute_rp(
    rp_input: Sequence[Dict],
    image_dir: str,
    scorer: ClipPairScorer,
    tokenizer: SimpleTokenizer,
    *,
    num_bins: int = NUM_SPLITS,
    seed: int = 0,
    batch_size: int = 64,
    dedup_text: bool = True,
    snapshot_path: str = "",
    build_scorer=None,
) -> Tuple[float, float, List[float]]:
    import os

    paths = [os.path.join(image_dir, f"{item['caption_id']}.png") for item in rp_input]
    success = score_items(
        rp_input, paths, scorer, tokenizer, batch_size=batch_size, dedup_text=dedup_text,
        snapshot_path=snapshot_path, build_scorer=build_scorer,
    )
    bins = make_bins(len(rp_input), num_bins, seed)
    bin_scores = [float(np.mean(success[b])) for b in bins]
    return float(np.mean(bin_scores)), float(np.std(bin_scores)), bin_scores


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description="Calculating R-precision")
    p.add_argument("--image_dir", default="", type=str)
    p.add_argument("--rp_input_file", default="captions/COCO_RP_captions.pkl", type=str)
    p.add_argument("--saved_file_path", default=None, type=str)
    p.add_argument("--gpu_id", default="0", type=str, help="ignored (TPU build)")
    p.add_argument("--weights", type=str, required=True, help="CLIP ViT-B/32 weights (.pt/.npz)")
    p.add_argument("--bpe_path", type=str, required=True, help="CLIP BPE vocab (bpe_simple_vocab_16e6.txt.gz)")
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument(
        "--no-dedup-text",
        action="store_true",
        help="re-encode the 100 captions per item like the reference instead "
        "of the unique-caption embedding bank (exact either way; see score_items)",
    )
    p.add_argument("--snapshot_file", type=str, default="",
                   help="make the item loop drop-tolerant: periodic successes+"
                        "cursor snapshot at this path (bit-equal result)")
    add_precision_flag(p)
    add_distributed_flags(p)
    args = p.parse_args(argv)
    configure_precision(args.precision)
    maybe_init_distributed(args)

    from tise_tpu.backbones import clip_vit

    rp_input = result_io.load_pickle(args.rp_input_file)
    build = lambda: ClipPairScorer(  # noqa: E731 — rebuilt after a backend reset
        clip_vit.load_params(args.weights), fast=args.precision == "fast"
    )
    scorer = build()
    tokenizer = SimpleTokenizer(args.bpe_path)
    mean, std, bin_scores = compute_rp(
        rp_input,
        args.image_dir,
        scorer,
        tokenizer,
        seed=args.seed,
        batch_size=args.batch_size,
        dedup_text=not args.no_dedup_text,
        snapshot_path=args.snapshot_file,
        build_scorer=build,
    )
    for i, s in enumerate(bin_scores):
        print(f"Bin: {i}, RP: {s}")
    if args.saved_file_path is not None:
        result_io.write_rp_coco_result(args.saved_file_path, mean, std)
    print(f"R-precision: {mean} +- {std}")


if __name__ == "__main__":
    main()
