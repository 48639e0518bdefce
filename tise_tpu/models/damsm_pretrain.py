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
    batch_size: int = 48
    words_num: int = 18
    weights: losses.DamsmWeights = losses.DamsmWeights()


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


def make_optimizer(cfg: DamsmPretrainConfig):
    """Adam with RNN grad clip + frozen-trunk masking."""
    rnn_tx = optax.chain(optax.clip_by_global_norm(cfg.rnn_grad_clip), optax.adam(cfg.lr, b1=0.5, b2=0.999))
    cnn_tx = optax.adam(cfg.lr, b1=0.5, b2=0.999)
    frozen = optax.set_to_zero()

    def label_fn(params):
        rnn_labels = jax.tree.map(lambda _: "rnn", params["rnn"])
        cnn_mask = _cnn_trainable_mask(params["cnn"])
        cnn_labels = jax.tree.map(lambda m: "cnn" if m else "frozen", cnn_mask)
        return {"rnn": rnn_labels, "cnn": cnn_labels}

    return optax.multi_transform({"rnn": rnn_tx, "cnn": cnn_tx, "frozen": frozen}, label_fn)


def init_state(cfg: DamsmPretrainConfig, rng: jax.Array) -> Tuple[DamsmTrainState, Tuple]:
    rnn = damsm.RNNEncoder(ntoken=cfg.ntoken, nhidden=cfg.embedding_dim // 2)
    cnn = damsm.CNNEncoder(nef=cfg.embedding_dim)
    r1, r2 = jax.random.split(rng)
    caps = jnp.zeros((2, cfg.words_num), jnp.int32)
    lens = jnp.ones((2,), jnp.int32)
    rnn_params = rnn.init(r1, caps, lens)
    cnn_params = cnn.init(r2, jnp.zeros((2, 256, 256, 3)))
    tx = make_optimizer(cfg)
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
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--smoke", action="store_true")
    p.add_argument("--device", choices=["cpu", "tpu"], default="cpu")
    args = p.parse_args(argv)
    if args.smoke:
        if args.device == "cpu":
            jax.config.update("jax_platforms", "cpu")
        print({k: round(v, 4) for k, v in smoke_train().items()})
    else:
        p.error("full pretraining requires the CUB/COCO dataset (tise_tpu/models/datasets.py); use --smoke")


if __name__ == "__main__":
    main()
