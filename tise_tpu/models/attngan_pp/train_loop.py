"""Host-side training loop: checkpoints, resume, logging, snapshots.

Reference surface (AttnGAN++/trainer.py):
  * epoch loop with per-100-iteration console+file logging (:390-418) and
    TensorBoard scalars for every loss term (:381-385) — here a
    ``train_history.log`` file (main.py:114-123 parity) plus optional
    tensorboardX-free scalar JSONL (tracing-friendly; jax.profiler hooks);
  * SNAPSHOT_INTERVAL checkpointing with EMA-swapped generator weights and
    optimizer state, deleting the previous snapshot (:174-208);
  * resume from a snapshot including optimizer state (:113-115, :143-148).

Checkpoints are orbax (a directory per epoch) holding the full TrainState —
EMA swap happens at *load* time for sampling (the EMA copy is part of the
state, so nothing is lost by saving it directly, unlike the reference's
swap-save-swap dance).
"""

from __future__ import annotations

import json
import logging
import os
import time
from typing import Any, Dict, Iterable, Optional

import jax
import numpy as np

from tise_tpu.models.attngan_pp import trainer as T


class CheckpointManager:
    """orbax-backed snapshot/resume with the reference's keep-last policy."""

    def __init__(self, model_dir: str, keep: int = 1):
        import orbax.checkpoint as ocp

        self.model_dir = os.path.abspath(model_dir)
        os.makedirs(self.model_dir, exist_ok=True)
        self._ckpt = ocp.StandardCheckpointer()
        self.keep = keep

    def _path(self, epoch: int) -> str:
        return os.path.join(self.model_dir, f"epoch_{epoch}")

    def save(self, state, epoch: int) -> None:
        self._ckpt.save(self._path(epoch), state)
        self._ckpt.wait_until_finished()
        # delete older snapshots (trainer.py:203-207 removes the previous one)
        kept = sorted(self.epochs())[: -self.keep] if self.keep else []
        for e in kept:
            import shutil

            shutil.rmtree(self._path(e), ignore_errors=True)

    def epochs(self):
        out = []
        if not os.path.isdir(self.model_dir):
            return out
        for name in os.listdir(self.model_dir):
            if name.startswith("epoch_"):
                try:
                    out.append(int(name.split("_")[1]))
                except ValueError:
                    pass
        return out

    def restore(self, state_like, epoch: Optional[int] = None):
        epochs = self.epochs()
        if not epochs:
            return None, 0
        epoch = epoch if epoch is not None else max(epochs)
        restored = self._ckpt.restore(self._path(epoch), state_like)
        return restored, epoch


def make_logger(output_dir: str) -> logging.Logger:
    """train_history.log file logger (main.py:114-123)."""
    os.makedirs(output_dir, exist_ok=True)
    logger = logging.getLogger(f"tise_tpu.train.{output_dir}")
    logger.setLevel(logging.INFO)
    if not logger.handlers:
        fh = logging.FileHandler(os.path.join(output_dir, "train_history.log"))
        fh.setFormatter(logging.Formatter("%(asctime)s %(message)s"))
        logger.addHandler(fh)
    return logger


class ScalarWriter:
    """JSONL scalar log (stand-in for the reference's TensorBoard writer,
    trainer.py:381-385; readable by any dashboard)."""

    def __init__(self, output_dir: str):
        os.makedirs(output_dir, exist_ok=True)
        self._f = open(os.path.join(output_dir, "scalars.jsonl"), "a")

    def write(self, step: int, scalars: Dict[str, float]) -> None:
        self._f.write(json.dumps({"step": step, **{k: float(v) for k, v in scalars.items()}}) + "\n")
        self._f.flush()


def train(
    cfg: T.TrainConfig,
    dataset,
    output_dir: str,
    *,
    mesh=None,
    encoder_params=None,
    log_every: int = 100,
    resume: bool = True,
    module=None,
) -> T.TrainState:
    """Full training: epochs over ``dataset.batches(...)`` with snapshot /
    resume / logging; returns the final state.

    ``module`` selects the trainer implementation — any module exposing the
    (build_models, init_state, make_train_step) triple over the shared Batch
    (default: the AttnGAN++ trainer; tise_tpu.models.counter_model.trainer
    plugs in unchanged — the reference's CounterModel/trainer.py duplicates
    the whole loop instead)."""
    M = module if module is not None else T
    models = M.build_models(cfg)
    state, encoder_params = M.init_state(cfg, models, jax.random.PRNGKey(0), encoder_params)
    step_fn = jax.jit(M.make_train_step(cfg, models), donate_argnums=(0,))

    ckpt = CheckpointManager(os.path.join(output_dir, "checkpoints"))
    logger = make_logger(output_dir)
    scalars = ScalarWriter(output_dir)

    start_epoch = 1
    if resume:
        restored, epoch = ckpt.restore(state)
        if restored is not None:
            state = restored
            start_epoch = epoch + 1
            logger.info(f"resumed from epoch {epoch}")

    rng = jax.random.PRNGKey(1)
    for epoch in range(start_epoch, cfg.max_epoch + 1):
        t0 = time.time()
        metrics: Dict[str, Any] = {}
        for i, batch in enumerate(dataset.batches(cfg.batch_size)):
            state, metrics = step_fn(state, batch, encoder_params, rng)
            if (i + 1) % log_every == 0:
                m = {k: float(v) for k, v in metrics.items()}
                logger.info(
                    "epoch %d iter %d D_loss: %.4f G_loss: %.4f w: %.4f s: %.4f kl: %.4f"
                    % (epoch, i + 1, m["d_loss"], m["g_loss"], m["w_loss"], m["s_loss"], m["kl_loss"])
                )
                scalars.write(int(jax.device_get(state.step)), m)
        logger.info(f"epoch {epoch} done in {time.time() - t0:.1f}s")
        if epoch % cfg.snapshot_interval == 0 or epoch == cfg.max_epoch:
            ckpt.save(jax.device_get(state), epoch)
            logger.info(f"saved snapshot at epoch {epoch}")
    return state
