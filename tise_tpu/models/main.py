"""Training entry point (reference: AttnGAN++/main.py + miscc/utils.py
``get_parameters``).

Wires the caption-image dataset, the frozen DAMSM encoders and the trainer
into one CLI — flag surface mirrors the reference parser (data_dir, dataset,
batch_size, max_epoch, lrs, dims, net_e, snapshot_interval, seed...) with the
TPU additions (mesh layout).

    python -m tise_tpu.models.main --train true --data_dir data/birds \\
        --dataset birds --net_e DAMSMencoders/bird/text_encoder200.pth \\
        --image_encoder DAMSMencoders/bird/image_encoder200.pth \\
        --output_dir output/birds_attngan_pp
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def get_parameters() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser()
    p.add_argument("--train", type=lambda s: s.lower() in ("1", "true", "yes"), default=True)
    p.add_argument("--model", choices=["attngan_pp", "counter_model"], default="attngan_pp")
    p.add_argument("--dataset", type=str, default="birds")
    p.add_argument("--data_dir", type=str, required=True)
    p.add_argument("--output_dir", type=str, default="output/run")
    p.add_argument("--version", type=str, default="")
    p.add_argument("--gpu_id", type=int, default=0, help="ignored (TPU build)")
    p.add_argument("--num_workers", type=int, default=8)
    p.add_argument("--manual_seed", type=int, default=100)
    # model dims (miscc/config.py defaults)
    p.add_argument("--gf_dim", type=int, default=128)
    p.add_argument("--df_dim", type=int, default=64)
    p.add_argument("--z_dim", type=int, default=100)
    p.add_argument("--condition_dim", type=int, default=100)
    p.add_argument("--text_emb_dim", type=int, default=256)
    p.add_argument("--num_residual", type=int, default=2)
    p.add_argument("--num_branch", type=int, default=3)
    p.add_argument("--base_size", type=int, default=64)
    p.add_argument("--words_num", type=int, default=18)
    p.add_argument("--caps_per_img", type=int, default=10)
    # training
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--max_epoch", type=int, default=600)
    p.add_argument("--snapshot_interval", type=int, default=5)
    p.add_argument("--d_lr", type=float, default=2e-4)
    p.add_argument("--g_lr", type=float, default=2e-4)
    p.add_argument("--encoder_precision", choices=("highest", "fast"), default="highest",
                   help="frozen DAMSM image-encoder compute dtype in the G loss: "
                        "'fast' = bf16 fwd+bwd with f32 loss math (TPU training "
                        "accelerator; gradient drift bounded in tests)")
    p.add_argument("--smooth_gamma_1", type=float, default=5.0)
    p.add_argument("--smooth_gamma_2", type=float, default=5.0)
    p.add_argument("--smooth_gamma_3", type=float, default=10.0)
    p.add_argument("--smooth_lambda", type=float, default=1.0)
    # frozen encoders
    p.add_argument("--net_e", type=str, required=True, help="DAMSM text encoder (.pth/.npz)")
    p.add_argument("--image_encoder", type=str, required=True, help="DAMSM image encoder (.pth/.npz)")
    return p


def main(argv=None) -> None:
    args = get_parameters().parse_args(argv)
    if not args.train:
        raise SystemExit("evaluation-image generation lives in tise_tpu.models.generate")

    from tise_tpu.backbones import damsm
    from tise_tpu.core import weights as weights_io
    from tise_tpu.models import datasets as ds
    from tise_tpu.models.attngan_pp import losses
    from tise_tpu.models.attngan_pp.generator import GanConfig
    from tise_tpu.models.attngan_pp.trainer import TrainConfig
    from tise_tpu.models.attngan_pp.train_loop import train

    np.random.seed(args.manual_seed)

    dataset = ds.TextImageDataset(
        args.data_dir,
        "train",
        base_size=args.base_size,
        branch_num=args.num_branch,
        words_num=args.words_num,
        captions_per_image=args.caps_per_img,
        seed=args.manual_seed,
        augment=True,  # Scale(76/64)+RandomCrop+Flip (AttnGAN++/main.py image_transform)
    )
    gan = GanConfig(
        gf_dim=args.gf_dim,
        df_dim=args.df_dim,
        z_dim=args.z_dim,
        condition_dim=args.condition_dim,
        embedding_dim=args.text_emb_dim,
        r_num=args.num_residual,
        branch_num=args.num_branch,
        words_num=args.words_num,
    )
    weights = losses.DamsmWeights(
        gamma1=args.smooth_gamma_1,
        gamma2=args.smooth_gamma_2,
        gamma3=args.smooth_gamma_3,
        lam=args.smooth_lambda if args.model == "attngan_pp" else 5.0,
    )
    cfg = TrainConfig(
        gan=gan,
        batch_size=args.batch_size,
        g_lr=args.g_lr,
        d_lr=args.d_lr,
        max_epoch=args.max_epoch,
        snapshot_interval=args.snapshot_interval,
        ntoken=dataset.n_words,
        damsm=weights,
        encoder_precision=args.encoder_precision,
    )

    def load(path, converter):
        if path.endswith(".npz"):
            return weights_io.load_pytree_npz(path)
        return converter(weights_io.load_torch_state_dict(path))

    encoder_params = {
        "text": load(args.net_e, damsm.rnn_params_from_torch),
        "image": load(args.image_encoder, damsm.cnn_params_from_torch),
    }
    module = None
    if args.model == "counter_model":
        from tise_tpu.models.counter_model import trainer as counter_trainer

        module = counter_trainer
    train(cfg, dataset, args.output_dir, encoder_params=encoder_params, module=module)


if __name__ == "__main__":
    main()
