"""FLOP/MFU accounting for the fused AttnGAN++ train step (VERDICT r4 #6).

Where tools/train_ablate.py splits the step's WALL-CLOCK by whole-program
ablation, this tool splits its FLOPs the same way: each ablation variant is
AOT-compiled (never executed) and XLA's own cost analysis reports the
optimized-HLO flop count; per-section flops are the deltas between variants
— the exact flop-side mirror of the timing buckets, so dividing them gives a
per-section hardware utilization, not a hand-derived estimate.

MFU = flops / time / peak.  Peak for a v5e chip is 197 TFLOP/s (bf16 MXU);
the step's matmuls/convs run f32-in with jax's DEFAULT matmul passes (bf16
inputs on the MXU — CLAUDE.md), so the bf16 peak is the honest denominator.

Reference hot loop this accounts for: AttnGAN++/trainer.py:332-379.

    python tools/train_flops.py [--cpu] [--batch 64] [--cache]
        [--step-ms 396.8]   # measured full-step ms (tools/train_bench.py);
                            # when omitted the tool times the step itself
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

_T0 = time.perf_counter()

#: v5e: 394 TOPS int8 / 197 TFLOP/s bf16 per chip (public spec)
V5E_BF16_PEAK = 197e12


def _mark(msg: str) -> None:
    print(f"[train_flops +{time.perf_counter() - _T0:7.1f}s] {msg}", file=sys.stderr, flush=True)


def _flops(compiled) -> float:
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):  # some backends return [dict]
        ca = ca[0]
    return float(ca["flops"])


def run(*, batch: int = 64, step_ms: float = 0.0, time_steps: int = 8) -> dict:
    from train_ablate import VARIANTS
    from train_bench import setup  # shared harness (tools/train_bench.py)

    T, cfg, models, state0, enc, batch_dev = setup(batch=batch)

    flops = {}
    for name, ablate in VARIANTS:
        step_fn = jax.jit(T.make_train_step(cfg, models, ablate=ablate), donate_argnums=(0,))
        _mark(f"AOT compile {name} (ablate={sorted(ablate)})")
        compiled = step_fn.lower(state0, batch_dev, enc, jax.random.PRNGKey(1)).compile()
        flops[name] = _flops(compiled)
        _mark(f"  {name}: {flops[name] / 1e9:.1f} GFLOP")
        del step_fn, compiled

    buckets = {
        "fwd": flops["fwd_only"],
        "d_updates": flops["d_only"] - flops["fwd_only"],
        "g_update": flops["full"] - flops["no_g"],
        "damsm": flops["full"] - flops["no_damsm"],
        "ema": flops["full"] - flops["no_ema"],
        "g_backward_plus_opt": flops["full"] - flops["no_g_backward"],
        "g_opt": flops["full"] - flops["no_g_opt"],
        "g_backward": flops["no_g_opt"] - flops["no_g_backward"],
        "g_head_fwd_bwd": flops["no_g_backward"] - flops["no_g"],
        "full": flops["full"],
    }

    if not step_ms:
        from train_bench import run as bench_run

        _mark("timing the full step (no --step-ms given)")
        step_ms = bench_run(steps=time_steps, batch=batch)["train_step_ms"]

    mfu = flops["full"] / (step_ms / 1e3) / V5E_BF16_PEAK
    out = {
        "train_step_gflop": round(flops["full"] / 1e9, 1),
        "train_step_ms": step_ms,
        "train_step_mfu_bf16peak": round(mfu, 4),
        "flops_gflop": {k: round(v / 1e9, 2) for k, v in buckets.items()},
        "batch": batch,
    }
    return out


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--step-ms", type=float, default=0.0,
                   help="measured full-step latency; 0 = time it here")
    p.add_argument("--cache", action="store_true", help="enable the persistent compile cache")
    args = p.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    if args.cache:
        from tise_tpu.core import compile_cache

        compile_cache.enable()
    print(json.dumps(run(batch=args.batch, step_ms=args.step_ms)))


if __name__ == "__main__":
    main()
