"""Decompose the fused AttnGAN++ train step's wall-clock by section.

Whole-program ablation (the only timing methodology that survives XLA fusion
— see ROADMAP measurement rules): `make_train_step(..., ablate=...)` skips a
section at TRACE time, XLA dead-code-eliminates its compute, and the bucket
cost is the timing delta vs the full step.  Sections mirror the reference
loop's phases (AttnGAN++/trainer.py:332-388): the 3 D updates, the G update
(adv + DAMSM + KL), the DAMSM term inside it (a frozen InceptionV3 encoder
forward + grid losses — suspected dominant), and the EMA.

Variants compiled (each is a separate XLA program; ~13-15 s each with the
persistent compile cache):

    full       ablate={}                               everything
    no_ema     {"ema"}                                 -> ema = full - no_ema
    no_damsm   {"damsm"}                               -> damsm = full - no_damsm
    no_g       {"g_update"}                            -> g_total = full - no_g
    d_only     {"g_update", "ema"}                     -> d = d_only - fwd_only
    fwd_only   {"d_updates", "g_update", "ema"}        text enc + G fwd + BN stats

Timing follows tools/train_bench.py: state threads through the chain so
dispatches overlap device compute; sync = one pulled metric scalar; best of
two passes.

    python tools/train_ablate.py [--cpu] [--steps N] [--batch B] [--cache]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

_T0 = time.perf_counter()


def _mark(msg: str) -> None:
    print(f"[train_ablate +{time.perf_counter() - _T0:7.1f}s] {msg}", file=sys.stderr, flush=True)


VARIANTS = (
    ("full", frozenset()),
    ("no_ema", frozenset({"ema"})),
    ("no_damsm", frozenset({"damsm"})),
    ("no_g", frozenset({"g_update"})),
    ("d_only", frozenset({"g_update", "ema"})),
    ("fwd_only", frozenset({"d_updates", "g_update", "ema"})),
    # G-update interior split (VERDICT r4 weak #3): stop after the head
    # gradients / after the full G gradient (grads kept alive by a metrics
    # probe in make_train_step so XLA can't DCE the work being timed)
    ("no_g_backward", frozenset({"g_backward"})),
    ("no_g_opt", frozenset({"g_opt"})),
)


def run(*, steps: int = 8, batch: int = 64) -> dict:
    import numpy as np

    from train_bench import setup  # shared harness (tools/train_bench.py)

    T, cfg, models, state0, enc, batch_dev = setup(batch=batch)
    # donated steps (matching production + tools/train_bench.py: without
    # donation the program double-buffers the whole state and OOMs a 16 GB
    # chip when anything else is resident); each variant re-uploads a fresh
    # copy from this host snapshot since donation consumes its input
    host_state = jax.tree.map(np.asarray, state0)
    del state0

    times = {}
    for name, ablate in VARIANTS:
        step_fn = jax.jit(T.make_train_step(cfg, models, ablate=ablate), donate_argnums=(0,))
        state = jax.tree.map(jnp.asarray, host_state)
        _mark(f"compile {name} (ablate={sorted(ablate)})")
        t0 = time.perf_counter()
        state, metrics = step_fn(state, batch_dev, enc, jax.random.PRNGKey(1))
        float(metrics["g_loss"])
        _mark(f"  first call {time.perf_counter() - t0:.1f}s")
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            for _ in range(steps):
                state, metrics = step_fn(state, batch_dev, enc, jax.random.PRNGKey(1))
            float(metrics["g_loss"])  # in-order => all done
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        times[name] = best / steps * 1e3
        _mark(f"  {name}: {times[name]:.1f} ms/step")
        del state, step_fn

    buckets = {
        "fwd_ms": times["fwd_only"],
        "d_updates_ms": times["d_only"] - times["fwd_only"],
        "g_update_ms": times["full"] - times["no_g"],
        "damsm_ms": times["full"] - times["no_damsm"],
        "ema_ms": times["full"] - times["no_ema"],
        "full_ms": times["full"],
        # interior of the G update: head fwd+bwd (3-scale D features + DAMSM
        # + KL, differentiated w.r.t. G outputs), the vjp pullback through G,
        # and the Adam update
        "g_backward_plus_opt_ms": times["full"] - times["no_g_backward"],
        "g_opt_ms": times["full"] - times["no_g_opt"],
        "g_backward_ms": times["no_g_opt"] - times["no_g_backward"],
        "g_head_fwd_bwd_ms": times["no_g_backward"] - times["no_g"],
    }
    return {"times_ms": {k: round(v, 1) for k, v in times.items()},
            "buckets_ms": {k: round(v, 1) for k, v in buckets.items()}}


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--steps", type=int, default=8)
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--cache", action="store_true", help="enable the persistent compile cache")
    args = p.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    if args.cache:
        from tise_tpu.core import compile_cache

        compile_cache.enable()
    print(json.dumps(run(steps=args.steps, batch=args.batch)))


if __name__ == "__main__":
    main()
