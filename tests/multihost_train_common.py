"""Shared world-building for the multi-host GAN train-step test: the worker
processes and the parent's single-process oracle must construct the SAME
config, initial state, frozen encoders, and global batch (all deterministic
on CPU) so the only variable is how the step is sharded."""

import numpy as np


def make_world():
    import jax

    from tise_tpu.models.attngan_pp import trainer as T
    from tise_tpu.models.attngan_pp.generator import GanConfig

    gan = GanConfig(gf_dim=8, df_dim=8, z_dim=16, condition_dim=16, embedding_dim=32, words_num=8)
    cfg = T.TrainConfig(gan=gan, batch_size=4, ntoken=64)
    models = T.build_models(cfg)
    state, enc = T.init_state(cfg, models, jax.random.PRNGKey(0))
    batch_np = T.synthetic_batch(cfg, np.random.RandomState(0), cfg.batch_size)
    return cfg, models, state, enc, batch_np
