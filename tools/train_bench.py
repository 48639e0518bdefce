"""AttnGAN++ fused train-step throughput on the real TPU (VERDICT r4 item 1).

The reference's training loop (AttnGAN++/trainer.py:276-495) is half its
product surface; this tool times the TPU-native equivalent — the ONE jitted
SPMD program holding 3 spectral-norm D updates, the G update (adv + DAMSM +
KL through the frozen encoders), and the EMA — at the published model dims
(GF_DIM 64, DF_DIM 32, R_NUM 3, 256px finest scale — cfg/eval_coco.yml; the
reference trains the released model at these dims) and TRAIN.BATCH_SIZE 64.

Also quantifies the compile stall CLAUDE.md warns about: wall-clock of the
first step (compile+execute) is printed separately, and with
TISE_COMPILE_CACHE=1 the persistent compile cache is enabled first so a
second run of this tool measures whether the cache covers the TPU path.

Timing notes (tunnel rules, see bench.py): the step is dispatched per batch
exactly like the production loop — but each dispatch DEPENDS on the previous
(state threads through), so the host never blocks in between and the ~10 ms
dispatch tax overlaps device compute for any step >=10 ms.  Sync = pulling
one metric scalar of the last step.  Two passes, best reported.

    python tools/train_bench.py [--cpu] [--steps N] [--batch B] [--cache]
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
import numpy as np

_T0 = time.perf_counter()


def _mark(msg: str) -> None:
    print(f"[train_bench +{time.perf_counter() - _T0:7.1f}s] {msg}", file=sys.stderr, flush=True)


def setup(*, batch: int = 64, encoder_precision: str = "highest"):
    """Eval-dims config + jitted init + one uploaded synthetic batch — the
    shared harness for this tool and tools/train_ablate.py (single copy)."""
    on_tpu = jax.default_backend() not in ("cpu",)

    from tise_tpu.models.attngan_pp import trainer as T
    from tise_tpu.models.attngan_pp.generator import GanConfig

    if on_tpu:
        gan = GanConfig(gf_dim=64, df_dim=32, r_num=3, embedding_dim=256, words_num=20)
        cfg = T.TrainConfig(gan=gan, batch_size=batch, ntoken=27297,
                            encoder_precision=encoder_precision)
    else:
        gan = GanConfig(gf_dim=8, df_dim=8, z_dim=16, condition_dim=16, embedding_dim=32, words_num=8)
        cfg = T.TrainConfig(gan=gan, batch_size=4, ntoken=64,
                            encoder_precision=encoder_precision)
    _mark(f"backend={jax.default_backend()} batch={cfg.batch_size} gf_dim={gan.gf_dim}")

    models = T.build_models(cfg)

    # jit the whole init (eager per-op dispatch through the tunnel turns the
    # ~200-module init into minutes; see bench.py)
    @jax.jit
    def init(r):
        return T.init_state(cfg, models, r)

    _mark("init_state (jitted)")
    t0 = time.perf_counter()
    state, enc = init(jax.random.PRNGKey(0))
    jax.block_until_ready(state.step)
    _mark(f"init done in {time.perf_counter() - t0:.1f}s")

    batch_np = T.synthetic_batch(cfg, np.random.RandomState(0), cfg.batch_size)
    batch_dev = jax.tree.map(jax.device_put, batch_np)
    int(jax.jit(lambda b: jnp.sum(b.captions))(batch_dev))  # materialize upload
    _mark("batch uploaded")
    return T, cfg, models, state, enc, batch_dev


def run(*, steps: int = 8, batch: int = 64, encoder_precision: str = "highest",
        key_prefix: str = "train_step") -> dict:
    """Build, compile, and time the fused train step on the current backend.
    Importable by bench.py (train-step section) — keep the single copy here.
    ``encoder_precision='fast'`` benches the bf16-frozen-encoder knob
    (TrainConfig.encoder_precision); ``key_prefix`` names the result keys."""
    T, cfg, models, state, enc, batch = setup(batch=batch, encoder_precision=encoder_precision)

    step_fn = jax.jit(T.make_train_step(cfg, models), donate_argnums=(0,))
    _mark("compiling train step (first call)")
    t0 = time.perf_counter()
    state, metrics = step_fn(state, batch, enc, jax.random.PRNGKey(1))
    g0 = float(metrics["g_loss"])  # sync
    compile_sec = time.perf_counter() - t0
    _mark(f"first step (compile+run) {compile_sec:.1f}s, g_loss={g0:.3f}")

    best = None
    for attempt in range(2):
        _mark(f"timing pass {attempt + 1} ({steps} steps)")
        t0 = time.perf_counter()
        for _ in range(steps):
            state, metrics = step_fn(state, batch, enc, jax.random.PRNGKey(1))
        gl = float(metrics["g_loss"])  # pull one scalar: in-order => all done
        dt = time.perf_counter() - t0
        _mark(f"pass {attempt + 1}: {dt:.2f}s ({dt / steps * 1e3:.0f} ms/step, g_loss={gl:.3f})")
        best = dt if best is None else min(best, dt)

    step_ms = best / steps * 1e3
    return {
        f"{key_prefix}_images_per_sec": round(cfg.batch_size * steps / best, 2),
        f"{key_prefix}_ms": round(step_ms, 1),
        f"{key_prefix}_compile_sec": round(compile_sec, 1),
    }


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--steps", type=int, default=8, help="steps per timing pass")
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--encoder_precision", choices=("highest", "fast"), default="highest")
    p.add_argument("--cache", action="store_true", help="enable the persistent compile cache")
    args = p.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    if args.cache:
        from tise_tpu.core import compile_cache

        compile_cache.enable()
    print(json.dumps(run(steps=args.steps, batch=args.batch,
                         encoder_precision=args.encoder_precision)))


if __name__ == "__main__":
    main()
