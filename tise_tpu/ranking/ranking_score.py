"""Aggregate Ranking Score (RS) — parity port of ranking_scores/ranking_score.py.

Semantics (reference :10-61):
  * nine metrics per method, read from ``methods/<name>.json``;
  * FID, O-FID and CA are lower-is-better -> sign-flipped before ranking (:33-35);
  * per metric, methods are ranked ascending (best method receives rank
    ``num_methods``): rank = 1 + position of the method in the ascending
    argsort of the (sign-corrected) scores (:36-45);
  * ranks are grouped into six aspects — image realism mean(IS*, FID) ranks,
    RP, SOA mean(SOA-C, SOA-I), object fidelity mean(O-IS, O-FID), CA, PA —
    and summed into RS (:50-61);
  * the output table is ``tabulate(df, tablefmt="psql")`` written to
    ``results/coco_benchmark_results.txt`` (:70-77) — reproduced here
    byte-for-byte (tests/test_ranking.py locks it against the golden file).
"""

from __future__ import annotations

import argparse
import json
import os
from collections import OrderedDict
from typing import Dict, List, Sequence, Tuple

import numpy as np

METRICS: Tuple[str, ...] = ("IS*", "FID", "RP", "SOA-C", "SOA-I", "O-IS", "O-FID", "CA", "PA")

#: indices of lower-is-better metrics (FID, O-FID, CA)
LOWER_IS_BETTER = (1, 6, 7)

#: aspect grouping over metric-rank indices: each entry is averaged, then summed
ASPECT_GROUPS: Tuple[Tuple[int, ...], ...] = ((0, 1), (2,), (3, 4), (5, 6), (7,), (8,))


def load_method_scores(methods_dir: str, order: Sequence[str] | None = None) -> "OrderedDict[str, List[float]]":
    """Read ``<methods_dir>/<name>.json`` score files.

    ``order`` pins the method ordering (the reference uses filesystem order,
    which the golden results file reflects); default is sorted names.
    """
    names = [f[: f.rindex(".")] for f in os.listdir(methods_dir) if f.endswith(".json")]
    if order is not None:
        missing = set(order) - set(names)
        if missing:
            raise ValueError(f"methods not found: {missing}")
        names = list(order)
    else:
        names = sorted(names)
    scores: "OrderedDict[str, List[float]]" = OrderedDict()
    for name in names:
        with open(os.path.join(methods_dir, f"{name}.json")) as f:
            vals = json.load(f)
        scores[name] = [float(vals[m]) for m in METRICS]
    return scores


def metric_ranks(scores: np.ndarray) -> np.ndarray:
    """Per-metric ranks (1 = worst ... n = best), reference tie semantics."""
    signed = scores.astype(np.float64).copy()
    for idx in LOWER_IS_BETTER:
        signed[:, idx] = -signed[:, idx]
    order = np.argsort(signed, axis=0, kind="quicksort")  # np.argsort default, as reference
    n_methods, n_metrics = signed.shape
    ranks = np.zeros_like(signed)
    for m in range(n_metrics):
        for pos in range(n_methods):
            ranks[order[pos, m], m] = pos + 1
    return ranks


def ranking_scores(scores: np.ndarray) -> np.ndarray:
    """RS per method: sum of aspect-averaged metric ranks."""
    ranks = metric_ranks(scores)
    rs = np.zeros(scores.shape[0])
    for group in ASPECT_GROUPS:
        rs += np.mean(ranks[:, list(group)], axis=1)
    return rs


def render_table(scores: "OrderedDict[str, List[float]]") -> str:
    """Reference-identical psql table (method rows incl. the RS column)."""
    import pandas as pd
    from tabulate import tabulate

    mat = np.array(list(scores.values()), dtype=np.float64)
    rs = ranking_scores(mat)
    full = np.concatenate([mat, rs[:, None]], axis=1)
    df = pd.DataFrame(full, columns=list(METRICS) + ["RS"])
    df.insert(loc=0, column="Method", value=list(scores.keys()))
    return tabulate(df, headers="keys", tablefmt="psql", showindex=False)


def main(argv=None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--methods_dir", type=str, default="methods")
    p.add_argument("--output", type=str, default="results/coco_benchmark_results.txt")
    p.add_argument("--order", type=str, default=None, help="comma-separated method order")
    args = p.parse_args(argv)

    order = args.order.split(",") if args.order else None
    scores = load_method_scores(args.methods_dir, order=order)
    table = render_table(scores)
    if args.output:
        d = os.path.dirname(args.output)
        if d:
            os.makedirs(d, exist_ok=True)
        with open(args.output, "w") as f:
            f.write(table)
    print(table)


if __name__ == "__main__":
    main()
