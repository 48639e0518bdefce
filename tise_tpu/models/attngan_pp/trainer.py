"""AttnGAN++ training step + loop (reference: AttnGAN++/trainer.py).

Reference loop per step (trainer.py:297-418): frozen bi-LSTM text encoding ->
G forward -> per-scale D update (Adam 2e-4, betas (0.5, 0.999),
trainer.py:135-159) -> G update with adversarial + DAMSM (frozen CNN encoder)
+ KL losses -> EMA of G params (avg = 0.999 avg + 0.001 p, :387-388).

TPU redesign: the whole step (3 D updates + G update + EMA) is ONE jitted
SPMD program.  The batch axis is sharded over the ``data`` mesh axis and
parameters are replicated — XLA inserts the gradient psums that
DataParallel's gather and SyncBN's thread rendezvous perform by hand in the
reference (SURVEY.md section 2.3).  The wide INIT_STAGE fc and the DAMSM
embedding table can shard over a second ``model`` axis (see shardings()).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field
from typing import Any, Dict, NamedTuple, Optional, Tuple

import flax
import jax
import jax.numpy as jnp
import numpy as np
import optax

from tise_tpu.backbones import damsm
from tise_tpu.models.attngan_pp import losses
from tise_tpu.models.attngan_pp.discriminator import DNet
from tise_tpu.models.attngan_pp.generator import GanConfig, GNet


@dataclass(frozen=True)
class TrainConfig:
    gan: GanConfig = field(default_factory=GanConfig)
    batch_size: int = 64  # TRAIN.BATCH_SIZE
    g_lr: float = 2e-4  # TRAIN.GENERATOR_LR
    d_lr: float = 2e-4  # TRAIN.DISCRIMINATOR_LR
    beta1: float = 0.5  # Adam betas (trainer.py:141,146)
    beta2: float = 0.999
    ema_decay: float = 0.999  # trainer.py:387-388
    max_epoch: int = 600
    snapshot_interval: int = 5
    ntoken: int = 5450  # vocab size (dataset-dependent)
    damsm: losses.DamsmWeights = field(default_factory=losses.DamsmWeights)
    #: compute dtype of the FROZEN DAMSM image encoder inside the G loss:
    #: "fast" runs its fwd+bwd in bf16 (the loss grid and everything
    #: trainable stays f32 — only the gradient pulled back into G's fakes
    #: carries the reduced precision; drift bounded in
    #: tests/test_attngan.py::test_fast_encoder_gradient_drift).  The
    #: default "highest" matches the reference's f32 training exactly.
    encoder_precision: str = "highest"


SCALES = (64, 128, 256)


class TrainState(flax.struct.PyTreeNode):
    step: jax.Array
    g_params: Any
    g_batch_stats: Any
    g_opt: Any
    g_ema: Any  # EMA copy of g_params (trainer.py:279,387-388)
    d_params: Any  # dict scale -> params
    d_spectral: Any  # dict scale -> spectral power-iteration state
    d_opt: Any


class Models(NamedTuple):
    gnet: GNet
    dnets: Dict[int, DNet]
    text_encoder: damsm.RNNEncoder
    image_encoder: damsm.CNNEncoder


def build_models(cfg: TrainConfig, dtype=jnp.float32) -> Models:
    gan = cfg.gan
    gnet = GNet(cfg=gan, dtype=dtype)
    dnets = {
        s: DNet(ndf=gan.df_dim, nef=gan.embedding_dim, scale=s, dtype=dtype) for s in SCALES[: gan.branch_num]
    }
    text_encoder = damsm.RNNEncoder(ntoken=cfg.ntoken, nhidden=gan.embedding_dim // 2, dtype=dtype)
    enc_dtype = jnp.bfloat16 if cfg.encoder_precision == "fast" else dtype
    image_encoder = damsm.CNNEncoder(nef=gan.embedding_dim, dtype=enc_dtype)
    return Models(gnet, dnets, text_encoder, image_encoder)


def init_state(
    cfg: TrainConfig, models: Models, rng: jax.Array, encoder_params: Optional[Dict[str, Any]] = None
) -> Tuple[TrainState, Dict[str, Any]]:
    """Initialise all trainable state + the frozen encoder params.

    ``encoder_params`` carries converted DAMSM checkpoints
    ({"text": ..., "image": ...}); random-init when absent (smoke tests).
    """
    gan = cfg.gan
    b = 2  # init batch (shapes are batch-polymorphic)
    r_g, r_d, r_t, r_i, r_n = jax.random.split(rng, 5)
    z = jnp.zeros((b, gan.z_dim))
    sent = jnp.zeros((b, gan.embedding_dim))
    words = jnp.zeros((b, gan.embedding_dim, gan.words_num))
    mask = jnp.zeros((b, gan.words_num), bool)

    g_vars = models.gnet.init(r_g, z, sent, words, mask, r_n, train=True)
    g_params, g_stats = g_vars["params"], g_vars.get("batch_stats", {})

    d_params, d_spectral = {}, {}
    for s, dnet in models.dnets.items():
        imgs = jnp.zeros((b, s, s, 3))
        d_vars = dnet.init(jax.random.fold_in(r_d, s), imgs, sent)
        d_params[str(s)] = d_vars["params"]
        d_spectral[str(s)] = d_vars.get("spectral", {})

    if encoder_params is None:
        caps = jnp.zeros((b, gan.words_num), jnp.int32)
        lens = jnp.ones((b,), jnp.int32)
        text_p = models.text_encoder.init(r_t, caps, lens)
        image_p = models.image_encoder.init(r_i, jnp.zeros((b, 256, 256, 3)))
        encoder_params = {"text": text_p, "image": image_p}

    g_tx = optax.adam(cfg.g_lr, b1=cfg.beta1, b2=cfg.beta2)
    d_tx = optax.adam(cfg.d_lr, b1=cfg.beta1, b2=cfg.beta2)
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        g_params=g_params,
        g_batch_stats=g_stats,
        g_opt=g_tx.init(g_params),
        g_ema=jax.tree.map(jnp.copy, g_params),
        d_params=d_params,
        d_spectral=d_spectral,
        d_opt={k: d_tx.init(p) for k, p in d_params.items()},
    )
    return state, encoder_params


class Batch(NamedTuple):
    """One training batch; images at every scale (prepare_data semantics,
    datasets.py:25-51 — here NHWC in [-1, 1])."""

    images: Tuple[jax.Array, ...]  # ([B,64,64,3], [B,128,128,3], [B,256,256,3])
    captions: jax.Array  # int32 [B, T]
    cap_lens: jax.Array  # int32 [B]
    class_ids: jax.Array  # int32 [B]


def make_train_step(cfg: TrainConfig, models: Models, ablate: frozenset = frozenset()):
    """Build the fused jitted train step: 3 D updates, then the G update with
    the freshly updated discriminators (reference ordering,
    trainer.py:332-379), then EMA.

    ``ablate`` is the profiling hook (tools/train_ablate.py): any subset of
    {"d_updates", "g_update", "damsm", "ema"} skips that section (XLA then
    dead-code-eliminates its compute — whole-program ablation, the only
    timing methodology that survives XLA fusion; see ROADMAP measurement
    rules).  Two finer sections split the G update's interior (VERDICT r4
    weak #3): "g_backward" stops after the head gradients (skips the vjp
    pullback through G and the optimizer; the head grads are kept alive via
    a metrics probe so XLA cannot DCE the head backward), "g_opt" stops
    after the full G gradient (skips only the Adam update).  Production
    callers pass nothing."""
    g_tx = optax.adam(cfg.g_lr, b1=cfg.beta1, b2=cfg.beta2)
    d_tx = optax.adam(cfg.d_lr, b1=cfg.beta1, b2=cfg.beta2)
    scales = SCALES[: cfg.gan.branch_num]
    do_d = "d_updates" not in ablate
    do_g = "g_update" not in ablate
    do_damsm = "damsm" not in ablate
    do_ema = "ema" not in ablate

    def encode_text(encoder_params, captions, cap_lens):
        words_embs, sent_emb = models.text_encoder.apply(encoder_params["text"], captions, cap_lens)
        mask = captions == 0  # reference: mask padding token 0 (trainer.py:316)
        return words_embs, sent_emb, mask

    def train_step(state: TrainState, batch: Batch, encoder_params, rng: jax.Array):
        rng_ca, rng_z = jax.random.split(jax.random.fold_in(rng, state.step))
        words_embs, sent_emb, mask = encode_text(encoder_params, batch.captions, batch.cap_lens)
        words_embs = jax.lax.stop_gradient(words_embs)
        sent_emb = jax.lax.stop_gradient(sent_emb)
        b = batch.captions.shape[0]
        z = jax.random.normal(rng_z, (b, cfg.gan.z_dim))

        # ---- G forward, ONCE, via vjp (BN in train mode; stats updated
        # once, as in torch where the single netG forward serves both the D
        # and G losses, trainer.py:321-331).  A grad-of-closure G update
        # would trace a SECOND identical forward that XLA does not reliably
        # CSE with this one; vjp reuses these residuals for the G backward
        # after the D updates (the torch ordering: D steps consume detached
        # fakes, the retained graph backs the G step). ----
        def g_fwd(g_params):
            (fakes_f, _attn, mu_f, logvar_f), mut = models.gnet.apply(
                {"params": g_params, "batch_stats": state.g_batch_stats},
                z,
                sent_emb,
                words_embs,
                mask,
                rng_ca,
                train=True,
                mutable=["batch_stats"],
            )
            return (tuple(fakes_f), mu_f, logvar_f), mut["batch_stats"]

        (fakes, mu, logvar), g_vjp, new_g_stats = jax.vjp(g_fwd, state.g_params, has_aux=True)

        # ---- D updates (fakes detached: losses.py:138) ----
        fakes_sg = [jax.lax.stop_gradient(f) for f in fakes]
        new_d_params, new_d_spectral, d_metrics = {}, {}, {}

        def d_loss_fn(params, dnet, spectral, real, fake):
            var = {"params": params, "spectral": spectral}
            real_h, mut = dnet.apply(var, real, method=dnet.features, mutable=["spectral"])
            fake_h, _ = dnet.apply(var, fake, method=dnet.features, mutable=["spectral"])
            rc = dnet.apply(var, real_h, sent_emb, method=dnet.cond_logits, mutable=["spectral"])[0]
            fc = dnet.apply(var, fake_h, sent_emb, method=dnet.cond_logits, mutable=["spectral"])[0]
            # wrong pairs: real features vs shifted conditions (losses.py:146-148)
            wc = dnet.apply(var, real_h[: b - 1], sent_emb[1:], method=dnet.cond_logits, mutable=["spectral"])[0]
            ru = dnet.apply(var, real_h, method=dnet.uncond_logits, mutable=["spectral"])[0]
            fu = dnet.apply(var, fake_h, method=dnet.uncond_logits, mutable=["spectral"])[0]
            parts = losses.discriminator_loss(rc, ru, fc, fu, wc)
            return parts.total, (parts, mut["spectral"])

        d_total = 0.0
        new_d_opt = {}
        if do_d:
            for i, s in enumerate(scales):
                key = str(s)
                dnet = models.dnets[s]
                grad_fn = jax.value_and_grad(d_loss_fn, has_aux=True)
                (loss, (parts, new_spec)), grads = grad_fn(
                    state.d_params[key], dnet, state.d_spectral[key], batch.images[i], fakes_sg[i]
                )
                updates, new_d_opt[key] = d_tx.update(grads, state.d_opt[key], state.d_params[key])
                new_d_params[key] = optax.apply_updates(state.d_params[key], updates)
                new_d_spectral[key] = new_spec
                d_metrics[f"d{s}_loss"] = loss
                d_total = d_total + loss
        else:
            new_d_params, new_d_spectral, new_d_opt = state.d_params, state.d_spectral, state.d_opt

        # ---- G update (uses the UPDATED discriminators): differentiate the
        # loss head w.r.t. the G OUTPUTS, then pull the cotangents back
        # through the saved forward (g_vjp) — one G forward per step ----
        def head_loss(fakes_h, mu_h, logvar_h):
            total = 0.0
            for i, s in enumerate(scales):
                key = str(s)
                dnet = models.dnets[s]
                var = {"params": new_d_params[key], "spectral": new_d_spectral[key]}
                h, _ = dnet.apply(var, fakes_h[i], method=dnet.features, mutable=["spectral"])
                cond = dnet.apply(var, h, sent_emb, method=dnet.cond_logits, mutable=["spectral"])[0]
                uncond = dnet.apply(var, h, method=dnet.uncond_logits, mutable=["spectral"])[0]
                total = total + losses.generator_adv_loss(cond, uncond)
            # DAMSM on the finest scale via the frozen image encoder
            # (losses.py:218-230); encoder expects [-1, 1] images
            if do_damsm:
                region, cnn_code = models.image_encoder.apply(encoder_params["image"], fakes_h[-1])
                # loss math always f32 (no-op cast unless encoder_precision=fast)
                w_loss, s_loss = losses.generator_damsm_loss(
                    region.astype(jnp.float32), cnn_code.astype(jnp.float32),
                    words_embs, sent_emb, batch.cap_lens, batch.class_ids, cfg.damsm
                )
            else:
                w_loss = s_loss = jnp.float32(0.0)
            kl = losses.kl_loss(mu_h, logvar_h)
            total = total + w_loss + s_loss + kl
            return total, (w_loss, s_loss, kl)

        ablate_probe = jnp.float32(0.0)  # keeps ablated-dead grads alive (see docstring)
        if do_g:
            (g_loss, (w_loss, s_loss, kl)), head_grads = jax.value_and_grad(
                head_loss, argnums=(0, 1, 2), has_aux=True
            )(fakes, mu, logvar)
            if "g_backward" in ablate:
                ablate_probe = sum(jnp.sum(x) for x in jax.tree_util.tree_leaves(head_grads))
                new_g_params, new_g_opt = state.g_params, state.g_opt
            else:
                (g_grads,) = g_vjp(head_grads)
                if "g_opt" in ablate:
                    ablate_probe = sum(jnp.sum(x) for x in jax.tree_util.tree_leaves(g_grads))
                    new_g_params, new_g_opt = state.g_params, state.g_opt
                else:
                    g_updates, new_g_opt = g_tx.update(g_grads, state.g_opt, state.g_params)
                    new_g_params = optax.apply_updates(state.g_params, g_updates)
        else:
            g_loss = w_loss = s_loss = kl = jnp.float32(0.0)
            new_g_params, new_g_opt = state.g_params, state.g_opt

        # ---- EMA (trainer.py:387-388) ----
        decay = cfg.ema_decay
        if do_ema:
            new_ema = jax.tree.map(lambda e, p: decay * e + (1.0 - decay) * p, state.g_ema, new_g_params)
        else:
            new_ema = state.g_ema

        metrics = {
            "g_loss": g_loss,
            "d_loss": d_total,
            "w_loss": w_loss,
            "s_loss": s_loss,
            "kl_loss": kl,
            **d_metrics,
        }
        if ablate:
            metrics["ablate_probe"] = ablate_probe  # an OUTPUT — XLA keeps it
        new_state = state.replace(
            step=state.step + 1,
            g_params=new_g_params,
            g_batch_stats=new_g_stats,
            g_opt=new_g_opt,
            g_ema=new_ema,
            d_params=new_d_params,
            d_spectral=new_d_spectral,
            d_opt=new_d_opt,
        )
        return new_state, metrics

    return train_step


def make_sharded_train_step(cfg: TrainConfig, models: Models, mesh):
    """jit the step with batch sharded over the data axis, state replicated."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    data = mesh.axis_names[0]
    repl = NamedSharding(mesh, P())
    shard = NamedSharding(mesh, P(data))
    step = make_train_step(cfg, models)

    batch_sh = Batch(
        images=tuple(NamedSharding(mesh, P(data)) for _ in range(cfg.gan.branch_num)),
        captions=shard,
        cap_lens=shard,
        class_ids=shard,
    )
    return jax.jit(
        step,
        in_shardings=(repl, batch_sh, repl, repl),
        out_shardings=(repl, repl),
        donate_argnums=(0,),
    )


def synthetic_batch(cfg: TrainConfig, rng: np.random.RandomState, batch_size: int) -> Batch:
    """Tiny random batch for smoke tests / the multichip dryrun."""
    gan = cfg.gan
    t = gan.words_num
    lens = rng.randint(2, t + 1, size=batch_size).astype(np.int32)
    caps = np.zeros((batch_size, t), np.int32)
    for i, l in enumerate(lens):
        caps[i, :l] = rng.randint(1, cfg.ntoken, size=l)
    imgs = tuple(
        (rng.rand(batch_size, s, s, 3).astype(np.float32) * 2 - 1) for s in SCALES[: gan.branch_num]
    )
    return Batch(
        images=imgs,
        captions=caps,
        cap_lens=lens,
        class_ids=rng.randint(0, 20, size=batch_size).astype(np.int32),
    )


def smoke_train(n_steps: int = 2, batch_size: int = 4, gf_dim: int = 16, df_dim: int = 16) -> Dict[str, float]:
    """Run a couple of tiny steps end-to-end (CPU-friendly)."""
    gan = GanConfig(gf_dim=gf_dim, df_dim=df_dim, z_dim=16, condition_dim=16, embedding_dim=32, words_num=8)
    cfg = TrainConfig(gan=gan, batch_size=batch_size, ntoken=100)
    models = build_models(cfg)
    state, enc = init_state(cfg, models, jax.random.PRNGKey(0))
    step = jax.jit(make_train_step(cfg, models), donate_argnums=(0,))
    rng = np.random.RandomState(0)
    metrics = {}
    for i in range(n_steps):
        batch = synthetic_batch(cfg, rng, batch_size)
        state, metrics = step(state, batch, enc, jax.random.PRNGKey(1))
    return {k: float(v) for k, v in metrics.items()}


def main(argv=None) -> None:
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--smoke", action="store_true", help="run a tiny 2-step training smoke test")
    p.add_argument(
        "--device",
        choices=["cpu", "tpu"],
        default="cpu",
        help="--smoke backend; cpu avoids minutes-long TPU compiles for a correctness check",
    )
    args = p.parse_args(argv)
    if args.smoke:
        if args.device == "cpu":
            jax.config.update("jax_platforms", "cpu")
        m = smoke_train()
        print({k: round(v, 4) for k, v in m.items()})
    else:
        p.error("full training requires a dataset; see tise_tpu/models/datasets.py (use --smoke for a check)")


if __name__ == "__main__":
    main()
