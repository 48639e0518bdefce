"""Hand-built torch CLIP ViT-B/32 oracle for full-forward converter parity.

The pip ``clip`` package is not installed here, so this is an independent
torch transcription of openai/CLIP's ViT-B/32 (the backbone behind RP
text_relevance/RP_coco.py:31 and PA positional_alignment/PA.py:30), emitting
the exact OpenAI ``state_dict`` key layout consumed by
``tise_tpu.backbones.clip_vit.params_from_openai_state_dict``.

Deliberately independent implementation choices: torch.nn.MultiheadAttention
(packed in_proj, the module OpenAI uses), nn.LayerNorm, conv patchify — so a
pass validates my flax attention/LN math against torch's own kernels, not
against a transcription of my own code.
"""

from __future__ import annotations

import numpy as np
import torch
from torch import nn


class QuickGELU(nn.Module):
    def forward(self, x):
        return x * torch.sigmoid(1.702 * x)


class ResidualAttentionBlock(nn.Module):
    def __init__(self, d_model: int, n_head: int):
        super().__init__()
        self.attn = nn.MultiheadAttention(d_model, n_head)
        self.ln_1 = nn.LayerNorm(d_model)
        self.mlp = nn.Sequential()
        self.mlp.add_module("c_fc", nn.Linear(d_model, d_model * 4))
        self.mlp.add_module("gelu", QuickGELU())
        self.mlp.add_module("c_proj", nn.Linear(d_model * 4, d_model))
        self.ln_2 = nn.LayerNorm(d_model)
        self.attn_mask = None

    def forward(self, x):  # x: [T, B, D] (torch MHA default seq-first)
        y = self.ln_1(x)
        a, _ = self.attn(y, y, y, need_weights=False, attn_mask=self.attn_mask)
        x = x + a
        x = x + self.mlp(self.ln_2(x))
        return x


class Transformer(nn.Module):
    def __init__(self, width: int, layers: int, heads: int):
        super().__init__()
        self.resblocks = nn.Sequential(*[ResidualAttentionBlock(width, heads) for _ in range(layers)])

    def forward(self, x):
        return self.resblocks(x)


class VisionTransformer(nn.Module):
    def __init__(self, input_resolution=224, patch_size=32, width=768, layers=12, heads=12, output_dim=512):
        super().__init__()
        self.conv1 = nn.Conv2d(3, width, kernel_size=patch_size, stride=patch_size, bias=False)
        scale = width ** -0.5
        self.class_embedding = nn.Parameter(scale * torch.randn(width))
        n_patch = (input_resolution // patch_size) ** 2
        self.positional_embedding = nn.Parameter(scale * torch.randn(n_patch + 1, width))
        self.ln_pre = nn.LayerNorm(width)
        self.transformer = Transformer(width, layers, heads)
        self.ln_post = nn.LayerNorm(width)
        self.proj = nn.Parameter(scale * torch.randn(width, output_dim))

    def forward(self, x):  # [B, 3, H, W]
        x = self.conv1(x)
        x = x.reshape(x.shape[0], x.shape[1], -1).permute(0, 2, 1)  # [B, T-1, D]
        cls = self.class_embedding.to(x.dtype) + torch.zeros(
            x.shape[0], 1, x.shape[-1], dtype=x.dtype
        )
        x = torch.cat([cls, x], dim=1)
        x = x + self.positional_embedding.to(x.dtype)
        x = self.ln_pre(x)
        x = x.permute(1, 0, 2)  # -> [T, B, D]
        x = self.transformer(x)
        x = x.permute(1, 0, 2)
        x = self.ln_post(x[:, 0, :])
        return x @ self.proj


class TorchCLIP(nn.Module):
    """visual + text towers with OpenAI state_dict key names."""

    def __init__(self, embed_dim=512, vocab_size=49408, context_length=77,
                 t_width=512, t_heads=8, t_layers=12):
        super().__init__()
        self.visual = VisionTransformer(output_dim=embed_dim)
        self.transformer = Transformer(t_width, t_layers, t_heads)
        self.vocab_size = vocab_size
        self.context_length = context_length
        self.token_embedding = nn.Embedding(vocab_size, t_width)
        self.positional_embedding = nn.Parameter(torch.empty(context_length, t_width).normal_(std=0.01))
        self.ln_final = nn.LayerNorm(t_width)
        self.text_projection = nn.Parameter(torch.empty(t_width, embed_dim).normal_(std=0.02))
        self.logit_scale = nn.Parameter(torch.ones([]) * np.log(1 / 0.07))
        mask = torch.full((context_length, context_length), float("-inf"))
        mask.triu_(1)
        self.register_buffer("attn_mask", mask, persistent=False)

    @torch.no_grad()
    def encode_image(self, images):
        return self.visual(images)

    @torch.no_grad()
    def encode_text(self, tokens):
        x = self.token_embedding(tokens)
        x = x + self.positional_embedding
        x = x.permute(1, 0, 2)
        for blk in self.transformer.resblocks:
            blk.attn_mask = self.attn_mask
        x = self.transformer(x)
        x = x.permute(1, 0, 2)
        x = self.ln_final(x)
        x = x[torch.arange(x.shape[0]), tokens.argmax(dim=-1)]
        return x @ self.text_projection


def random_torch_clip(seed: int = 0) -> TorchCLIP:
    torch.manual_seed(seed)
    model = TorchCLIP().eval()
    # well-conditioned random weights so 12 pre-LN layers stay O(1)
    for m in model.modules():
        if isinstance(m, nn.Linear):
            nn.init.normal_(m.weight, std=0.02)
            if m.bias is not None:
                nn.init.normal_(m.bias, std=0.01)
        elif isinstance(m, nn.MultiheadAttention):
            nn.init.normal_(m.in_proj_weight, std=0.02)
            nn.init.normal_(m.in_proj_bias, std=0.01)
            nn.init.normal_(m.out_proj.weight, std=0.02)
            nn.init.normal_(m.out_proj.bias, std=0.01)
        elif isinstance(m, nn.Conv2d):
            nn.init.normal_(m.weight, std=0.02)
        elif isinstance(m, nn.Embedding):
            nn.init.normal_(m.weight, std=0.02)
    return model
