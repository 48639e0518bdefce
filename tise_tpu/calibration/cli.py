"""Calibration CLI (reference: classifier_calibration/ notebook + temperature_scaling.py).

Fits a temperature on cached validation logits npz (the notebook's
``data/*_validation_feature_data.npz`` flow, cells 3-7) and prints the
before/after NLL/ECE report (temperature_scaling.py:56-75).  The fitted
constant is what gets baked into the IS*/O-IS metrics
(tise_tpu/core/config.py).

``--plot_prefix P`` additionally renders ``P_before.png`` / ``P_after.png``
reliability diagrams (notebook cells 13-19); the same per-bin data is always
printed as an ASCII table.
"""

from __future__ import annotations

import argparse

from tise_tpu.calibration import temperature as calib
from tise_tpu.calibration import plots


def main(argv=None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--validation_npz", type=str, required=True, help="npz with logits + labels arrays")
    p.add_argument("--n_bins", type=int, default=15)
    p.add_argument("--max_iter", type=int, default=50)
    p.add_argument(
        "--plot_prefix", type=str, default=None,
        help="write <prefix>_before.png / <prefix>_after.png reliability diagrams",
    )
    args = p.parse_args(argv)

    logits, labels = calib.load_validation_npz(args.validation_npz)
    t, nll_b, ece_b, nll_a, ece_a = calib.calibration_report(logits, labels, args.n_bins)
    print(f"Before temperature - NLL: {nll_b:.5f}, ECE: {ece_b:.5f}")
    print(f"Optimal temperature: {t!r}")
    print(f"After temperature - NLL: {nll_a:.5f}, ECE: {ece_a:.5f}")

    for tag, temp, ece_val in (("before", 1.0, ece_b), ("after", t, ece_a)):
        conf, acc, frac = calib.reliability_diagram(logits, labels, args.n_bins, temperature=temp)
        print(f"\nReliability ({tag} calibration, T={temp:.6g}):")
        print(plots.ascii_reliability(conf, acc, frac))
        if args.plot_prefix:
            out = f"{args.plot_prefix}_{tag}.png"
            plots.render_reliability_png(out, conf, acc, ece_val, title=f"{tag} calibration")
            print(f"wrote {out}")


if __name__ == "__main__":
    main()
