"""DAMSM encoder pretraining (reference: AttnGAN++/pretrain_DAMSM.py, 424 LoC;
byte-identical copy in CounterModel — SURVEY.md component 28).

Trains the bi-LSTM text encoder and the projection heads of the CNN image
encoder (the inception trunk is frozen: text_relevance/encoders.py:125-126
sets requires_grad=False; only emb_features/emb_cnn_code train) with the
symmetric word- and sentence-level DAMSM losses, Adam (ENCODER_LR 2e-4), and
the RNN gradient clipped to 0.25 (cfg.TRAIN.RNN_GRAD_CLIP,
pretrain_DAMSM.py train loop).

Note on the reference's shipped-code bug (SURVEY.md section 2 #28): its
pretrain script unpacks ``words_loss`` as a 4-tuple including a
"competition loss" weighted by ALPHA_1, but the shipped losses.py returns 3
values — the file pair is out of sync and crashes as shipped.  This port
implements the functional 3-value variant.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Tuple

import flax
import jax
import jax.numpy as jnp
import numpy as np
import optax

from tise_tpu.backbones import damsm
from tise_tpu.models.attngan_pp import losses


@dataclass(frozen=True)
class DamsmPretrainConfig:
    ntoken: int
    embedding_dim: int = 256  # TEXT.EMBEDDING_DIM
    lr: float = 2e-4  # TRAIN.ENCODER_LR
    rnn_grad_clip: float = 0.25  # TRAIN.RNN_GRAD_CLIP
    batch_size: int = 64  # TRAIN.BATCH_SIZE (miscc/config.py:29)
    words_num: int = 18
    max_epoch: int = 600  # TRAIN.MAX_EPOCH (miscc/config.py:30)
    snapshot_interval: int = 5  # TRAIN.SNAPSHOT_INTERVAL (miscc/config.py:31)
    weights: losses.DamsmWeights = losses.DamsmWeights()


def make_lr_schedule(lr0: float, steps_per_epoch: int):
    """The reference's per-epoch decay (pretrain_DAMSM.py:365-366): lr *= 0.98
    at each epoch end *while* lr > lr0/10, then frozen.  Expressed as an optax
    step schedule: lr(step) = lr0 * 0.98^min(epoch, E) with E the first epoch
    count at which the decayed lr falls to lr0/10."""
    e_floor, lr = 0, lr0
    while lr > lr0 / 10.0:
        lr *= 0.98
        e_floor += 1

    def schedule(step):
        e = jnp.minimum(step // steps_per_epoch, e_floor).astype(jnp.float32)
        return lr0 * jnp.power(0.98, e)

    return schedule


class DamsmTrainState(flax.struct.PyTreeNode):
    step: jax.Array
    rnn_params: Any
    cnn_params: Any
    opt_state: Any


def _cnn_trainable_mask(cnn_params) -> Any:
    """True only for the projection heads (frozen inception trunk)."""

    def mask(path, _leaf):
        keys = {getattr(p, "key", None) for p in path}
        return "emb_features" in keys or "emb_cnn_code" in keys

    return jax.tree_util.tree_map_with_path(mask, cnn_params)


def make_optimizer(cfg: DamsmPretrainConfig, learning_rate=None):
    """Adam with RNN grad clip + frozen-trunk masking.  ``learning_rate`` may
    be an optax schedule (the per-epoch 0.98 decay); defaults to the fixed
    cfg.lr."""
    lr = cfg.lr if learning_rate is None else learning_rate
    rnn_tx = optax.chain(optax.clip_by_global_norm(cfg.rnn_grad_clip), optax.adam(lr, b1=0.5, b2=0.999))
    cnn_tx = optax.adam(lr, b1=0.5, b2=0.999)
    frozen = optax.set_to_zero()

    def label_fn(params):
        rnn_labels = jax.tree.map(lambda _: "rnn", params["rnn"])
        cnn_mask = _cnn_trainable_mask(params["cnn"])
        cnn_labels = jax.tree.map(lambda m: "cnn" if m else "frozen", cnn_mask)
        return {"rnn": rnn_labels, "cnn": cnn_labels}

    return optax.multi_transform({"rnn": rnn_tx, "cnn": cnn_tx, "frozen": frozen}, label_fn)


def init_state(
    cfg: DamsmPretrainConfig, rng: jax.Array, *, learning_rate=None
) -> Tuple[DamsmTrainState, Tuple]:
    rnn = damsm.RNNEncoder(ntoken=cfg.ntoken, nhidden=cfg.embedding_dim // 2)
    cnn = damsm.CNNEncoder(nef=cfg.embedding_dim)
    r1, r2 = jax.random.split(rng)
    caps = jnp.zeros((2, cfg.words_num), jnp.int32)
    lens = jnp.ones((2,), jnp.int32)
    rnn_params = rnn.init(r1, caps, lens)
    cnn_params = cnn.init(r2, jnp.zeros((2, 256, 256, 3)))
    tx = make_optimizer(cfg, learning_rate)
    params = {"rnn": rnn_params["params"], "cnn": cnn_params["params"]}
    state = DamsmTrainState(
        step=jnp.zeros((), jnp.int32),
        rnn_params=rnn_params["params"],
        cnn_params=cnn_params["params"],
        opt_state=tx.init(params),
    )
    return state, (rnn, cnn, tx)


def make_train_step(cfg: DamsmPretrainConfig, rnn: damsm.RNNEncoder, cnn: damsm.CNNEncoder, tx):
    def train_step(state: DamsmTrainState, images, captions, cap_lens, class_ids):
        def loss_fn(params):
            words_emb, sent_emb = rnn.apply({"params": params["rnn"]}, captions, cap_lens)
            region_feat, cnn_code = cnn.apply({"params": params["cnn"]}, images)
            w0, w1, _ = losses.words_loss(region_feat, words_emb, cap_lens, class_ids, cfg.weights)
            s0, s1 = losses.sent_loss(cnn_code, sent_emb, class_ids, cfg.weights)
            total = w0 + w1 + s0 + s1
            return total, {"w_loss": w0 + w1, "s_loss": s0 + s1}

        params = {"rnn": state.rnn_params, "cnn": state.cnn_params}
        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, new_opt = tx.update(grads, state.opt_state, params)
        new_params = optax.apply_updates(params, updates)
        metrics["loss"] = loss
        return (
            state.replace(
                step=state.step + 1,
                rnn_params=new_params["rnn"],
                cnn_params=new_params["cnn"],
                opt_state=new_opt,
            ),
            metrics,
        )

    return train_step


def make_eval_step(cfg: DamsmPretrainConfig, rnn: damsm.RNNEncoder, cnn: damsm.CNNEncoder):
    """Validation losses (pretrain_DAMSM.py evaluate(), :151-184): mean word
    and sentence DAMSM loss over the test split, no grads."""

    def eval_step(state: DamsmTrainState, images, captions, cap_lens, class_ids):
        words_emb, sent_emb = rnn.apply({"params": state.rnn_params}, captions, cap_lens)
        region_feat, cnn_code = cnn.apply({"params": state.cnn_params}, images)
        w0, w1, _ = losses.words_loss(region_feat, words_emb, cap_lens, class_ids, cfg.weights)
        s0, s1 = losses.sent_loss(cnn_code, sent_emb, class_ids, cfg.weights)
        return w0 + w1, s0 + s1

    return eval_step


def train(
    cfg: DamsmPretrainConfig,
    dataset,
    output_dir: str,
    *,
    val_dataset=None,
    log_every: int = 50,  # UPDATE_INTERVAL (pretrain_DAMSM.py:31)
    resume: bool = True,
) -> DamsmTrainState:
    """Full pretraining (pretrain_DAMSM.py:316-421): epoch loop with the
    0.98/floor lr decay, per-50-iteration logging, per-epoch validation on
    the test split, best-encoder export (best by validation DAMSM loss — the
    reference ranks by acm_loss = damsm + ALPHA_1*comp, but its shipped
    losses.py has no competition term, see module docstring), and
    SNAPSHOT_INTERVAL checkpoints with optimizer state + keep-last deletion.

    Best encoders are written as ``best_text_encoder.npz`` /
    ``best_image_encoder.npz`` pytrees — the format every consumer CLI
    (rp_cub, models.main --net_e/--image_encoder) loads directly.
    """
    import os
    import time

    from tise_tpu.core import weights as weights_io
    from tise_tpu.models.attngan_pp.train_loop import CheckpointManager, ScalarWriter, make_logger

    steps_per_epoch = max(1, len(dataset) // cfg.batch_size)
    schedule = make_lr_schedule(cfg.lr, steps_per_epoch)
    state, (rnn, cnn, tx) = init_state(cfg, jax.random.PRNGKey(0), learning_rate=schedule)
    step_fn = jax.jit(make_train_step(cfg, rnn, cnn, tx), donate_argnums=(0,))
    eval_fn = jax.jit(make_eval_step(cfg, rnn, cnn))

    ckpt = CheckpointManager(os.path.join(output_dir, "checkpoints"))
    logger = make_logger(output_dir)
    scalars = ScalarWriter(output_dir)

    start_epoch, best = 1, float("inf")
    if resume:
        restored, epoch = ckpt.restore(state)
        if restored is not None:
            state = restored
            start_epoch = epoch + 1
            logger.info(f"resumed from epoch {epoch}")

    for epoch in range(start_epoch, cfg.max_epoch + 1):
        t0 = time.time()
        for i, batch in enumerate(dataset.batches(cfg.batch_size)):
            state, metrics = step_fn(
                state, batch.images[-1], batch.captions, batch.cap_lens, batch.class_ids
            )
            if (i + 1) % log_every == 0:
                m = {k: float(v) for k, v in metrics.items()}
                logger.info(
                    "| epoch %3d | %5d/%5d batches | s_loss %7.4f | w_loss %7.4f | damsm_loss %7.4f |"
                    % (epoch, i + 1, steps_per_epoch, m["s_loss"], m["w_loss"], m["loss"])
                )
                scalars.write(int(jax.device_get(state.step)), m)
        logger.info(f"epoch {epoch} done in {time.time() - t0:.1f}s")

        if val_dataset is not None and len(val_dataset) >= cfg.batch_size:
            w_tot = s_tot = n = 0.0
            for batch in val_dataset.batches(cfg.batch_size, shuffle=False):
                w, s = eval_fn(state, batch.images[-1], batch.captions, batch.cap_lens, batch.class_ids)
                w_tot += float(w)
                s_tot += float(s)
                n += 1
            damsm_loss = (w_tot + s_tot) / n
            logger.info(
                "| end epoch %3d | valid_s_loss %7.4f | valid_w_loss %7.4f | DAMSM_loss %7.4f |"
                % (epoch, s_tot / n, w_tot / n, damsm_loss)
            )
            if damsm_loss < best:
                best = damsm_loss
                host = jax.device_get(state)
                weights_io.save_pytree_npz(
                    os.path.join(output_dir, "best_text_encoder.npz"), {"params": host.rnn_params}
                )
                weights_io.save_pytree_npz(
                    os.path.join(output_dir, "best_image_encoder.npz"), {"params": host.cnn_params}
                )
                logger.info("Save best image encoder and text encoder!")

        if epoch % cfg.snapshot_interval == 0 or epoch == cfg.max_epoch:
            ckpt.save(jax.device_get(state), epoch)
            logger.info(f"saved snapshot at epoch {epoch}")
    return state


def smoke_train(n_steps: int = 2, batch_size: int = 3) -> Dict[str, float]:
    cfg = DamsmPretrainConfig(ntoken=60, embedding_dim=16, words_num=6)
    state, (rnn, cnn, tx) = init_state(cfg, jax.random.PRNGKey(0))
    step = jax.jit(make_train_step(cfg, rnn, cnn, tx), donate_argnums=(0,))
    r = np.random.RandomState(0)
    metrics = {}
    for _ in range(n_steps):
        images = jnp.asarray(r.rand(batch_size, 96, 96, 3).astype(np.float32) * 2 - 1)
        caps = jnp.asarray(r.randint(1, 60, (batch_size, cfg.words_num)).astype(np.int32))
        lens = jnp.asarray(r.randint(2, cfg.words_num + 1, (batch_size,)).astype(np.int32))
        cls = jnp.asarray(np.arange(batch_size, dtype=np.int32))
        state, metrics = step(state, images, caps, lens, cls)
    return {k: float(v) for k, v in metrics.items()}


def main(argv=None) -> None:
    """CLI mirroring pretrain_DAMSM.py's parser (:35-47) with explicit config
    flags in place of the --cfg yml (the referenced cfg/DAMSM/*.yml files are
    not shipped in the reference — defaults below are its miscc/config.py
    values)."""
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--smoke", action="store_true", help="2-step synthetic correctness check")
    p.add_argument("--device", choices=["cpu", "tpu"], default="cpu")
    p.add_argument("--data_dir", type=str, default="", help="dataset root (data/birds or data/coco)")
    p.add_argument("--output_dir", type=str, default="output/DAMSM")
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--max_epoch", type=int, default=600)
    p.add_argument("--snapshot_interval", type=int, default=5)
    p.add_argument("--encoder_lr", type=float, default=2e-4)
    p.add_argument("--base_size", type=int, default=64)
    p.add_argument("--num_branch", type=int, default=3, help="finest scale = base_size * 2^(num_branch-1)")
    p.add_argument("--words_num", type=int, default=18)
    p.add_argument("--embedding_dim", type=int, default=256)
    p.add_argument("--caps_per_img", type=int, default=10)
    p.add_argument("--manual_seed", type=int, default=100)
    args = p.parse_args(argv)
    if args.smoke:
        if args.device == "cpu":
            jax.config.update("jax_platforms", "cpu")
        print({k: round(v, 4) for k, v in smoke_train().items()})
        return
    if not args.data_dir:
        p.error("--data_dir is required for full pretraining (or use --smoke)")
    from tise_tpu.models import datasets as ds

    np.random.seed(args.manual_seed)
    mk = lambda split, augment: ds.TextImageDataset(
        args.data_dir,
        split,
        base_size=args.base_size,
        branch_num=args.num_branch,
        words_num=args.words_num,
        captions_per_image=args.caps_per_img,
        seed=args.manual_seed,
        augment=augment,
    )
    dataset = mk("train", True)
    val = mk("test", False)
    cfg = DamsmPretrainConfig(
        ntoken=dataset.n_words,
        embedding_dim=args.embedding_dim,
        lr=args.encoder_lr,
        batch_size=args.batch_size,
        words_num=args.words_num,
        max_epoch=args.max_epoch,
        snapshot_interval=args.snapshot_interval,
    )
    train(cfg, dataset, args.output_dir, val_dataset=val)


if __name__ == "__main__":
    main()
