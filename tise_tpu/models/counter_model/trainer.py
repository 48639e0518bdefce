"""CounterModel training step (reference: CounterModel/trainer.py:230-330).

Same skeleton as the AttnGAN++ trainer but with a single multi-scale MSG
discriminator: D update on (7-scale reals, 7-scale detached fakes, wrong
pairs), then the G update (adversarial + DAMSM at the finest scale + KL),
then EMA.  The DAMSM weight lambda defaults to 5 — the setting that pushes
CUB R-precision above real images (SURVEY.md component 30;
CounterModel/miscc/utils.py:38).

Multi-scale reals are produced by a 2x average-pool chain from the 256px
image (MSG-GAN convention; the reference loads them from the dataset with
BRANCH_NUM=7).
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace
from typing import Any, Dict, NamedTuple, Optional, Tuple

import flax
import jax
import jax.numpy as jnp
import numpy as np
import optax

from tise_tpu.backbones import damsm
from tise_tpu.models.attngan_pp import losses
from tise_tpu.models.attngan_pp.generator import GanConfig
from tise_tpu.models.attngan_pp.trainer import Batch, TrainConfig
from tise_tpu.models.counter_model.discriminator import MSGDNet
from tise_tpu.models.counter_model.generator import CounterGNet

SCALES = (4, 8, 16, 32, 64, 128, 256)


def default_config() -> TrainConfig:
    return TrainConfig(damsm=losses.DamsmWeights(lam=5.0))


class CounterModels(NamedTuple):
    gnet: CounterGNet
    dnet: MSGDNet
    text_encoder: damsm.RNNEncoder
    image_encoder: damsm.CNNEncoder


class CounterTrainState(flax.struct.PyTreeNode):
    step: jax.Array
    g_params: Any
    g_batch_stats: Any
    g_opt: Any
    g_ema: Any
    d_params: Any
    d_spectral: Any
    d_opt: Any


def multiscale_reals(img256: jax.Array) -> Tuple[jax.Array, ...]:
    """256px [-1,1] NHWC -> 7 scales (4..256), coarsest first."""
    import flax.linen as nn

    outs = [img256]
    x = img256
    while x.shape[1] > 4:
        x = nn.avg_pool(x, (2, 2), strides=(2, 2))
        outs.append(x)
    return tuple(reversed(outs))


def build_models(cfg: TrainConfig, dtype=jnp.float32) -> CounterModels:
    gan = cfg.gan
    return CounterModels(
        gnet=CounterGNet(cfg=gan, dtype=dtype),
        dnet=MSGDNet(ndf=gan.df_dim, nef=gan.embedding_dim, dtype=dtype),
        text_encoder=damsm.RNNEncoder(ntoken=cfg.ntoken, nhidden=gan.embedding_dim // 2, dtype=dtype),
        # frozen-encoder precision knob shared with the AttnGAN++ trainer
        # (TrainConfig.encoder_precision docstring)
        image_encoder=damsm.CNNEncoder(
            nef=gan.embedding_dim,
            dtype=jnp.bfloat16 if cfg.encoder_precision == "fast" else dtype,
        ),
    )


def init_state(
    cfg: TrainConfig, models: CounterModels, rng: jax.Array, encoder_params: Optional[Dict[str, Any]] = None
) -> Tuple[CounterTrainState, Dict[str, Any]]:
    gan = cfg.gan
    b = 2
    r_g, r_d, r_t, r_i, r_n = jax.random.split(rng, 5)
    z = jnp.zeros((b, gan.z_dim))
    sent = jnp.zeros((b, gan.embedding_dim))
    words = jnp.zeros((b, gan.embedding_dim, gan.words_num))
    mask = jnp.zeros((b, gan.words_num), bool)
    g_vars = models.gnet.init(r_g, z, sent, words, mask, r_n, train=True)
    imgs = [jnp.zeros((b, s, s, 3)) for s in SCALES]
    d_vars = models.dnet.init(r_d, imgs, sent)
    if encoder_params is None:
        caps = jnp.zeros((b, gan.words_num), jnp.int32)
        lens = jnp.ones((b,), jnp.int32)
        encoder_params = {
            "text": models.text_encoder.init(r_t, caps, lens),
            "image": models.image_encoder.init(r_i, jnp.zeros((b, 256, 256, 3))),
        }
    g_tx = optax.adam(cfg.g_lr, b1=cfg.beta1, b2=cfg.beta2)
    d_tx = optax.adam(cfg.d_lr, b1=cfg.beta1, b2=cfg.beta2)
    state = CounterTrainState(
        step=jnp.zeros((), jnp.int32),
        g_params=g_vars["params"],
        g_batch_stats=g_vars.get("batch_stats", {}),
        g_opt=g_tx.init(g_vars["params"]),
        g_ema=jax.tree.map(jnp.copy, g_vars["params"]),
        d_params=d_vars["params"],
        d_spectral=d_vars.get("spectral", {}),
        d_opt=d_tx.init(d_vars["params"]),
    )
    return state, encoder_params


def make_train_step(cfg: TrainConfig, models: CounterModels):
    g_tx = optax.adam(cfg.g_lr, b1=cfg.beta1, b2=cfg.beta2)
    d_tx = optax.adam(cfg.d_lr, b1=cfg.beta1, b2=cfg.beta2)
    dnet = models.dnet

    def train_step(state: CounterTrainState, batch: Batch, encoder_params, rng: jax.Array):
        rng_ca, rng_z = jax.random.split(jax.random.fold_in(rng, state.step))
        words_embs, sent_emb = models.text_encoder.apply(
            encoder_params["text"], batch.captions, batch.cap_lens
        )
        words_embs = jax.lax.stop_gradient(words_embs)
        sent_emb = jax.lax.stop_gradient(sent_emb)
        mask = batch.captions == 0
        b = batch.captions.shape[0]
        z = jax.random.normal(rng_z, (b, cfg.gan.z_dim))
        reals = multiscale_reals(batch.images[-1])

        # single G forward via vjp — residuals serve both the D update's
        # detached fakes and the post-D-update G backward (same restructure
        # as the AttnGAN++ step; see attngan_pp/trainer.py train_step)
        def g_fwd(g_params):
            (fakes_f, _a, mu_f, logvar_f), mut = models.gnet.apply(
                {"params": g_params, "batch_stats": state.g_batch_stats},
                z, sent_emb, words_embs, mask, rng_ca, train=True, mutable=["batch_stats"],
            )
            return (tuple(fakes_f), mu_f, logvar_f), mut["batch_stats"]

        (fakes, mu, logvar), g_vjp, new_g_stats = jax.vjp(g_fwd, state.g_params, has_aux=True)
        fakes_sg = [jax.lax.stop_gradient(f) for f in fakes]

        def d_loss_fn(params):
            var = {"params": params, "spectral": state.d_spectral}
            real_h, mut = dnet.apply(var, reals, method=dnet.features, mutable=["spectral"])
            fake_h, _ = dnet.apply(var, fakes_sg, method=dnet.features, mutable=["spectral"])
            rc = dnet.apply(var, real_h, sent_emb, method=dnet.cond_logits, mutable=["spectral"])[0]
            fc = dnet.apply(var, fake_h, sent_emb, method=dnet.cond_logits, mutable=["spectral"])[0]
            wc = dnet.apply(var, real_h[: b - 1], sent_emb[1:], method=dnet.cond_logits, mutable=["spectral"])[0]
            ru = dnet.apply(var, real_h, method=dnet.uncond_logits, mutable=["spectral"])[0]
            fu = dnet.apply(var, fake_h, method=dnet.uncond_logits, mutable=["spectral"])[0]
            parts = losses.discriminator_loss(rc, ru, fc, fu, wc)
            return parts.total, mut["spectral"]

        (d_loss, new_spec), d_grads = jax.value_and_grad(d_loss_fn, has_aux=True)(state.d_params)
        d_updates, new_d_opt = d_tx.update(d_grads, state.d_opt, state.d_params)
        new_d_params = optax.apply_updates(state.d_params, d_updates)

        def head_loss(fakes_h, mu_h, logvar_h):
            var = {"params": new_d_params, "spectral": new_spec}
            h, _ = dnet.apply(var, list(fakes_h), method=dnet.features, mutable=["spectral"])
            cond = dnet.apply(var, h, sent_emb, method=dnet.cond_logits, mutable=["spectral"])[0]
            uncond = dnet.apply(var, h, method=dnet.uncond_logits, mutable=["spectral"])[0]
            total = losses.generator_adv_loss(cond, uncond)
            region, cnn_code = models.image_encoder.apply(encoder_params["image"], fakes_h[-1])
            w_loss, s_loss = losses.generator_damsm_loss(
                region.astype(jnp.float32), cnn_code.astype(jnp.float32),
                words_embs, sent_emb, batch.cap_lens, batch.class_ids, cfg.damsm
            )
            kl = losses.kl_loss(mu_h, logvar_h)
            return total + w_loss + s_loss + kl, (w_loss, s_loss, kl)

        (g_loss, (w_loss, s_loss, kl)), head_grads = jax.value_and_grad(
            head_loss, argnums=(0, 1, 2), has_aux=True
        )(fakes, mu, logvar)
        (g_grads,) = g_vjp(head_grads)
        g_updates, new_g_opt = g_tx.update(g_grads, state.g_opt, state.g_params)
        new_g_params = optax.apply_updates(state.g_params, g_updates)
        decay = cfg.ema_decay
        new_ema = jax.tree.map(lambda e, p: decay * e + (1 - decay) * p, state.g_ema, new_g_params)

        metrics = {"d_loss": d_loss, "g_loss": g_loss, "w_loss": w_loss, "s_loss": s_loss, "kl_loss": kl}
        return (
            state.replace(
                step=state.step + 1,
                g_params=new_g_params,
                g_batch_stats=new_g_stats,
                g_opt=new_g_opt,
                g_ema=new_ema,
                d_params=new_d_params,
                d_spectral=new_spec,
                d_opt=new_d_opt,
            ),
            metrics,
        )

    return train_step


def smoke_train(n_steps: int = 2, batch_size: int = 4) -> Dict[str, float]:
    from tise_tpu.models.attngan_pp.trainer import synthetic_batch

    gan = GanConfig(gf_dim=16, df_dim=16, z_dim=16, condition_dim=16, embedding_dim=32, words_num=8)
    cfg = replace(default_config(), gan=gan, batch_size=batch_size, ntoken=100)
    models = build_models(cfg)
    state, enc = init_state(cfg, models, jax.random.PRNGKey(0))
    step = jax.jit(make_train_step(cfg, models), donate_argnums=(0,))
    rng = np.random.RandomState(0)
    metrics = {}
    for _ in range(n_steps):
        batch = synthetic_batch(cfg, rng, batch_size)
        state, metrics = step(state, batch, enc, jax.random.PRNGKey(1))
    return {k: float(v) for k, v in metrics.items()}


def main(argv=None) -> None:
    """``--smoke`` runs the 2-step synthetic check; any other flags are the
    full training surface, forwarded to ``tise_tpu.models.main`` with
    ``--model counter_model`` preset (the reference's CounterModel/main.py is
    a near-copy of the AttnGAN++ one — here it IS the same entry point)."""
    import argparse
    import sys

    argv = list(sys.argv[1:] if argv is None else argv)
    if "--smoke" in argv:
        p = argparse.ArgumentParser()
        p.add_argument("--smoke", action="store_true")
        p.add_argument("--device", choices=["cpu", "tpu"], default="cpu")
        args = p.parse_args(argv)
        if args.device == "cpu":
            jax.config.update("jax_platforms", "cpu")
        print({k: round(v, 4) for k, v in smoke_train().items()})
        return
    from tise_tpu.models import main as models_main

    models_main.main(["--model", "counter_model", *argv])


if __name__ == "__main__":
    main()
