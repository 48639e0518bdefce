"""Calibration CLI (reference: classifier_calibration/ notebook + temperature_scaling.py).

Fits a temperature on cached validation logits npz (the notebook's
``data/*_validation_feature_data.npz`` flow, cells 3-7) and prints the
before/after NLL/ECE report (temperature_scaling.py:56-75).  The fitted
constant is what gets baked into the IS*/O-IS metrics
(tise_tpu/core/config.py).
"""

from __future__ import annotations

import argparse

from tise_tpu.calibration import temperature as calib


def main(argv=None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--validation_npz", type=str, required=True, help="npz with logits + labels arrays")
    p.add_argument("--n_bins", type=int, default=15)
    p.add_argument("--max_iter", type=int, default=50)
    args = p.parse_args(argv)

    logits, labels = calib.load_validation_npz(args.validation_npz)
    t, nll_b, ece_b, nll_a, ece_a = calib.calibration_report(logits, labels, args.n_bins)
    print(f"Before temperature - NLL: {nll_b:.5f}, ECE: {ece_b:.5f}")
    print(f"Optimal temperature: {t!r}")
    print(f"After temperature - NLL: {nll_a:.5f}, ECE: {ece_a:.5f}")


if __name__ == "__main__":
    main()
