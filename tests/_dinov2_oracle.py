"""Torch mini-oracle for the DINOv2 ViT-S/14 backbone (test-side only).

The reference hub-loads ``facebookresearch/dinov2`` (resnet.py:219), which
is unavailable offline — so the flax rebuild (havc_tpu/models/vit.py) was
previously validated structurally only.  This module transcribes the
published DINOv2 inference math (vision_transformer.py of the dinov2 repo:
patch embed, cls token, bicubic pos-embed interpolation with
interpolate_offset=0.1, pre-norm blocks with LayerScale and exact GELU,
``get_intermediate_layers`` with the shared final norm) into a ~150-line
torch module whose parameter names match the hub checkpoint layout, so a
synthetic (or real) DINOv2 state_dict loads directly.

Used as (a) a numeric oracle for models/vit.py and (b) a stand-in hub
backbone so the reference's full ColorMNet network can be constructed and
driven end-to-end offline.
"""
import math

import torch
import torch.nn as nn
import torch.nn.functional as F


class _LayerScale(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.gamma = nn.Parameter(torch.ones(dim))

    def forward(self, x):
        return x * self.gamma


class _Attention(nn.Module):
    def __init__(self, dim, heads):
        super().__init__()
        self.qkv = nn.Linear(dim, dim * 3)
        self.proj = nn.Linear(dim, dim)
        self.heads = heads
        self.scale = (dim // heads) ** -0.5

    def forward(self, x):
        b, n, c = x.shape
        qkv = (
            self.qkv(x)
            .reshape(b, n, 3, self.heads, c // self.heads)
            .permute(2, 0, 3, 1, 4)
        )
        q, k, v = qkv[0] * self.scale, qkv[1], qkv[2]
        attn = (q @ k.transpose(-2, -1)).softmax(dim=-1)
        x = (attn @ v).transpose(1, 2).reshape(b, n, c)
        return self.proj(x)


class _Mlp(nn.Module):
    def __init__(self, dim, hidden):
        super().__init__()
        self.fc1 = nn.Linear(dim, hidden)
        self.fc2 = nn.Linear(hidden, dim)

    def forward(self, x):
        return self.fc2(F.gelu(self.fc1(x)))


class _Block(nn.Module):
    def __init__(self, dim, heads):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim)
        self.attn = _Attention(dim, heads)
        self.ls1 = _LayerScale(dim)
        self.norm2 = nn.LayerNorm(dim)
        self.mlp = _Mlp(dim, dim * 4)
        self.ls2 = _LayerScale(dim)

    def forward(self, x):
        x = x + self.ls1(self.attn(self.norm1(x)))
        x = x + self.ls2(self.mlp(self.norm2(x)))
        return x


class _PatchEmbed(nn.Module):
    def __init__(self, dim, patch):
        super().__init__()
        self.proj = nn.Conv2d(3, dim, kernel_size=patch, stride=patch)

    def forward(self, x):
        return self.proj(x).flatten(2).transpose(1, 2)  # (B, N, dim)


class MiniDinoViT(nn.Module):
    """Checkpoint-layout-compatible DINOv2 ViT (inference path only)."""

    def __init__(self, patch_size=14, dim=384, depth=12, heads=6,
                 pretrain_grid=37, interpolate_offset=0.1):
        super().__init__()
        self.patch_size = patch_size
        self.interpolate_offset = interpolate_offset
        self.cls_token = nn.Parameter(torch.zeros(1, 1, dim))
        self.pos_embed = nn.Parameter(
            torch.zeros(1, pretrain_grid * pretrain_grid + 1, dim)
        )
        self.mask_token = nn.Parameter(torch.zeros(1, dim))  # unused at eval
        self.patch_embed = _PatchEmbed(dim, patch_size)
        self.blocks = nn.ModuleList(
            [_Block(dim, heads) for _ in range(depth)]
        )
        self.norm = nn.LayerNorm(dim)

    def interpolate_pos_encoding(self, x, w, h):
        # upstream vision_transformer.py interpolate_pos_encoding: bicubic
        # with scale_factor=(grid + 0.1)/pretrain_grid, antialias False
        npatch = x.shape[1] - 1
        n = self.pos_embed.shape[1] - 1
        if npatch == n and w == h:
            return self.pos_embed
        pos_embed = self.pos_embed.float()
        class_pos = pos_embed[:, 0]
        patch_pos = pos_embed[:, 1:]
        dim = x.shape[-1]
        w0 = w // self.patch_size
        h0 = h // self.patch_size
        m = int(math.sqrt(n))
        assert n == m * m
        sx = float(w0 + self.interpolate_offset) / m
        sy = float(h0 + self.interpolate_offset) / m
        patch_pos = F.interpolate(
            patch_pos.reshape(1, m, m, dim).permute(0, 3, 1, 2),
            scale_factor=(sx, sy),
            mode="bicubic",
            antialias=False,
        )
        assert (w0, h0) == patch_pos.shape[-2:]
        patch_pos = patch_pos.permute(0, 2, 3, 1).view(1, -1, dim)
        return torch.cat((class_pos.unsqueeze(0), patch_pos), dim=1)

    def prepare_tokens(self, x):
        b, _, w, h = x.shape
        x = self.patch_embed(x)
        x = torch.cat((self.cls_token.expand(b, -1, -1), x), dim=1)
        return x + self.interpolate_pos_encoding(x, w, h)

    def get_intermediate_layers(self, x, n=1, reshape=False,
                                return_class_token=False, norm=True):
        b, _, w, h = x.shape
        tokens = self.prepare_tokens(x)
        blocks_to_take = (
            range(len(self.blocks) - n, len(self.blocks))
            if isinstance(n, int) else n
        )
        outputs = []
        for i, blk in enumerate(self.blocks):
            tokens = blk(tokens)
            if i in blocks_to_take:
                outputs.append(tokens)
        if norm:
            outputs = [self.norm(out) for out in outputs]
        outputs = [out[:, 1:] for out in outputs]
        if reshape:
            outputs = [
                out.reshape(b, w // self.patch_size, h // self.patch_size, -1)
                .permute(0, 3, 1, 2)
                .contiguous()
                for out in outputs
            ]
        return tuple(outputs)

    def eval(self):
        super().eval()
        return self
