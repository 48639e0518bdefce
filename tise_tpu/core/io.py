"""Result-file and statistics IO, format-compatible with the reference.

Result file formats (reference, SURVEY.md section 6):
  FID      -> ``FID: <float>``                     (fid_score.py:252)
  IS*      -> ``IS = <mean>  +-  <std>``           (inception_score_star_bird.py:209)
  IS* coco -> ``[Inception Score] mean: {:.5f} std: {:.5f}``
                                                   (inception_score_star_coco.py:154)
  O-IS     -> ``O-IS: <mean> +-  <std>``           (object_centric_inception_score.py:127)
  RP coco  -> ``R-precision: <mean> +- <std>``     (RP_coco.py:90)
  RP cub   -> ``R mean:{:.6f} std:{:.6f}``         (RP_cub.py:162)
  PA       -> ``PA = <float>``                     (PA.py:71)
  CA       -> ``CA = <float>``                     (CA.py:191)
  SOA      -> three lines                          (SOA.py:209-216)

Reference statistics are npz archives with ``mu``/``sigma`` arrays
(fid_score.py:200-203).
"""

from __future__ import annotations

import os
import pickle
from typing import Any, Dict, Tuple

import numpy as np


def _write(path: str, text: str) -> None:
    d = os.path.dirname(path)
    if d:
        os.makedirs(d, exist_ok=True)
    with open(path, "w") as f:
        f.write(text)


def write_fid_result(path: str, fid: float) -> None:
    _write(path, f"FID: {fid}")


def write_is_result(path: str, mean: float, std: float) -> None:
    _write(path, f"IS = {mean}  +-  {std}")


def write_is_coco_result(path: str, mean: float, std: float) -> None:
    _write(path, "[Inception Score] mean: {:.5f} std: {:.5f}".format(mean, std))


def write_o_is_result(path: str, mean: float, std: float) -> None:
    _write(path, f"O-IS: {mean} +-  {std}")


def write_rp_coco_result(path: str, mean: float, std: float) -> None:
    _write(path, f"R-precision: {mean} +- {std}")


def write_rp_cub_result(path: str, mean: float, std: float) -> None:
    _write(path, "R mean:{:.6f} std:{:.6f}".format(mean, std))


def write_pa_result(path: str, pa: float) -> None:
    _write(path, f"PA = {pa}")


def write_ca_result(path: str, ca: float) -> None:
    _write(path, f"CA = {ca}")


def write_soa_result(path: str, soa_c: float, soa_i: float, top40: float, bot40: float) -> None:
    text = (
        "Class average accuracy for all classes (SOA-C) is: {:6.4f} \n".format(soa_c)
        + "Image weighted average accuracy (SOA-I) is: {:6.4f} \n".format(soa_i)
        + "Top (SOA-C-Top40) and Bottom (SOA-C-Bot40) 40 class average accuracy is: "
        "{:6.4f} and {:6.4f}".format(top40, bot40)
    )
    _write(path, text)


# ---------------------------------------------------------------------------
# Result-file readers (inverse of the writers above; used by the benchmark
# orchestrator to assemble ranking methods/<name>.json from completed runs)
# ---------------------------------------------------------------------------


def _floats(path: str) -> list:
    """All float literals in the file, in order."""
    import re

    with open(path) as f:
        text = f.read()
    return [float(v) for v in re.findall(r"[-+]?\d*\.?\d+(?:[eE][-+]?\d+)?", text)]


def read_fid_result(path: str) -> float:
    return _floats(path)[0]


def read_is_result(path: str) -> Tuple[float, float]:
    mean, std = _floats(path)[:2]
    return mean, std


read_is_coco_result = read_is_result
read_o_is_result = read_is_result
read_rp_coco_result = read_is_result
read_rp_cub_result = read_is_result


def read_pa_result(path: str) -> float:
    return _floats(path)[0]


read_ca_result = read_pa_result


def read_soa_result(path: str) -> Tuple[float, float, float, float]:
    """(SOA-C, SOA-I, top40, bot40) — the lines carry exactly these four
    values plus the literal '40's in the last label, which are filtered by
    position: values follow their colon."""
    import re

    with open(path) as f:
        lines = [l for l in f.read().splitlines() if ":" in l]
    vals = [float(re.findall(r"[-+]?\d*\.?\d+", l.split(":")[-1])[0]) for l in lines[:2]]
    top_bot = re.findall(r"[-+]?\d*\.?\d+", lines[2].split(":")[-1])
    return vals[0], vals[1], float(top_bot[0]), float(top_bot[1])


# ---------------------------------------------------------------------------
# Reference statistics (mu/sigma npz) and detection pickles
# ---------------------------------------------------------------------------


def load_stats_npz(path: str) -> Tuple[np.ndarray, np.ndarray]:
    """Load cached activation statistics (reference fid_score.py:200-203)."""
    with np.load(path, allow_pickle=True) as f:
        return np.array(f["mu"]), np.array(f["sigma"])


def save_stats_npz(path: str, mu: np.ndarray, sigma: np.ndarray) -> None:
    d = os.path.dirname(path)
    if d:
        os.makedirs(d, exist_ok=True)
    np.savez(path, mu=mu, sigma=sigma)


def load_pickle(path: str) -> Any:
    with open(path, "rb") as f:
        return pickle.load(f)


def save_pickle(path: str, obj: Any) -> None:
    d = os.path.dirname(path)
    if d:
        os.makedirs(d, exist_ok=True)
    with open(path, "wb") as f:
        pickle.dump(obj, f)
