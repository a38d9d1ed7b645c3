"""Torch mini-oracle for DDColor (test-side only).

The reference consumes DDColor through the external ``vsddcolor`` wheel
(absent in this environment), so the flax rebuild was previously
structural-only.  This module transcribes the published upstream
architecture (piddnad/DDColor ``basicsr/archs/ddcolor_arch.py``):

* ConvNeXt encoder with per-stage output LayerNorms (norm0..norm3,
  channels-first),
* pixel decoder = fastai UnetBlockWide chain + CustomPixelShuffle_ICNR —
  REUSED from the reference's own vendored fastai/deoldify modules
  (already activation-parity-proven in test_ref_parity_deoldify), so the
  oracle adds no new transcription risk there,
* MultiScaleColorDecoder: Mask2Former post-norm cross/self/FFN rounds
  over 3 scales with DETR sine position embeddings and level embeddings,
* query-score fusion + spectral refine conv.

Parameter names match the wheel checkpoint layout consumed by
convert.ddcolor_key_map, so ``state_dict()`` flows straight through the
converter.
"""
import math
import types

import torch
import torch.nn as nn
import torch.nn.functional as F


class _LayerNormCF(nn.Module):
    """Channels-first LayerNorm (upstream convnext.py LayerNorm
    data_format='channels_first')."""

    def __init__(self, dim, eps=1e-6):
        super().__init__()
        self.weight = nn.Parameter(torch.ones(dim))
        self.bias = nn.Parameter(torch.zeros(dim))
        self.eps = eps

    def forward(self, x):
        u = x.mean(1, keepdim=True)
        s = (x - u).pow(2).mean(1, keepdim=True)
        x = (x - u) / torch.sqrt(s + self.eps)
        return self.weight[:, None, None] * x + self.bias[:, None, None]


class _ConvNeXtBlockT(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.dwconv = nn.Conv2d(dim, dim, 7, padding=3, groups=dim)
        self.norm = nn.LayerNorm(dim, eps=1e-6)
        self.pwconv1 = nn.Linear(dim, 4 * dim)
        self.act = nn.GELU()
        self.pwconv2 = nn.Linear(4 * dim, dim)
        self.gamma = nn.Parameter(1e-6 * torch.ones(dim))

    def forward(self, x):
        inp = x
        x = self.dwconv(x)
        x = x.permute(0, 2, 3, 1)
        x = self.norm(x)
        x = self.pwconv2(self.act(self.pwconv1(x)))
        x = self.gamma * x
        return inp + x.permute(0, 3, 1, 2)


class _ConvNeXtT(nn.Module):
    def __init__(self, depths, dims):
        super().__init__()
        self.downsample_layers = nn.ModuleList()
        self.downsample_layers.append(nn.Sequential(
            nn.Conv2d(3, dims[0], 4, stride=4), _LayerNormCF(dims[0])
        ))
        for s in range(3):
            self.downsample_layers.append(nn.Sequential(
                _LayerNormCF(dims[s]), nn.Conv2d(dims[s], dims[s + 1], 2, 2)
            ))
        self.stages = nn.ModuleList(
            nn.Sequential(*[_ConvNeXtBlockT(dims[s]) for _ in range(depths[s])])
            for s in range(4)
        )
        for s in range(4):
            self.add_module(f"norm{s}", _LayerNormCF(dims[s]))

    def forward(self, x):
        feats = []
        for s in range(4):
            x = self.downsample_layers[s](x)
            x = self.stages[s](x)
            feats.append(getattr(self, f"norm{s}")(x))
        return feats


def sine_pos_t(h, w, num_pos_feats=128, temperature=10000.0):
    """DETR PositionEmbeddingSine, normalize=True, no mask."""
    eps = 1e-6
    scale = 2 * math.pi
    y_embed = torch.arange(1, h + 1, dtype=torch.float32)[:, None].repeat(1, w)
    x_embed = torch.arange(1, w + 1, dtype=torch.float32)[None, :].repeat(h, 1)
    y_embed = y_embed / (y_embed[-1:, :] + eps) * scale
    x_embed = x_embed / (x_embed[:, -1:] + eps) * scale
    dim_t = torch.arange(num_pos_feats, dtype=torch.float32)
    dim_t = temperature ** (2 * torch.div(dim_t, 2, rounding_mode="floor")
                            / num_pos_feats)
    pos_x = x_embed[:, :, None] / dim_t
    pos_y = y_embed[:, :, None] / dim_t
    pos_x = torch.stack(
        (pos_x[:, :, 0::2].sin(), pos_x[:, :, 1::2].cos()), dim=3
    ).flatten(2)
    pos_y = torch.stack(
        (pos_y[:, :, 0::2].sin(), pos_y[:, :, 1::2].cos()), dim=3
    ).flatten(2)
    return torch.cat((pos_y, pos_x), dim=2)  # (h, w, 2*num_pos_feats)


class _CrossAttentionLayerT(nn.Module):
    def __init__(self, d, heads):
        super().__init__()
        self.multihead_attn = nn.MultiheadAttention(d, heads)
        self.norm = nn.LayerNorm(d)

    def forward(self, tgt, memory, pos, query_pos):
        tgt2 = self.multihead_attn(tgt + query_pos, memory + pos, memory)[0]
        return self.norm(tgt + tgt2)


class _SelfAttentionLayerT(nn.Module):
    def __init__(self, d, heads):
        super().__init__()
        self.self_attn = nn.MultiheadAttention(d, heads)
        self.norm = nn.LayerNorm(d)

    def forward(self, tgt, query_pos):
        q = k = tgt + query_pos
        tgt2 = self.self_attn(q, k, tgt)[0]
        return self.norm(tgt + tgt2)


class _FFNLayerT(nn.Module):
    def __init__(self, d, ffn):
        super().__init__()
        self.linear1 = nn.Linear(d, ffn)
        self.linear2 = nn.Linear(ffn, d)
        self.norm = nn.LayerNorm(d)

    def forward(self, tgt):
        return self.norm(tgt + self.linear2(F.relu(self.linear1(tgt))))


class _MLPT(nn.Module):
    def __init__(self, dims):
        super().__init__()
        self.layers = nn.ModuleList(
            nn.Linear(a, b) for a, b in zip(dims[:-1], dims[1:])
        )

    def forward(self, x):
        for i, l in enumerate(self.layers):
            x = l(x) if i == 0 else l(F.relu(x))
        return x


class _MultiScaleColorDecoderT(nn.Module):
    def __init__(self, in_channels, hidden_dim, num_queries, nheads,
                 dim_feedforward, dec_layers, color_embed_dim):
        super().__init__()
        self.dec_layers = dec_layers
        self.transformer_cross_attention_layers = nn.ModuleList(
            _CrossAttentionLayerT(hidden_dim, nheads) for _ in range(dec_layers)
        )
        self.transformer_self_attention_layers = nn.ModuleList(
            _SelfAttentionLayerT(hidden_dim, nheads) for _ in range(dec_layers)
        )
        self.transformer_ffn_layers = nn.ModuleList(
            _FFNLayerT(hidden_dim, dim_feedforward) for _ in range(dec_layers)
        )
        self.decoder_norm = nn.LayerNorm(hidden_dim)
        self.query_feat = nn.Embedding(num_queries, hidden_dim)
        self.query_embed = nn.Embedding(num_queries, hidden_dim)
        self.level_embed = nn.Embedding(3, hidden_dim)
        self.input_proj = nn.ModuleList(
            nn.Conv2d(c, hidden_dim, 1) for c in in_channels
        )
        self.color_embed = _MLPT(
            (hidden_dim, hidden_dim, hidden_dim, color_embed_dim)
        )
        self.hidden_dim = hidden_dim

    def forward(self, feats):
        # feats: [1/16, 1/8, 1/4] channels-first
        src, pos = [], []
        for i in range(3):
            h, w = feats[i].shape[-2:]
            pe = sine_pos_t(h, w, self.hidden_dim // 2)
            pos.append(pe.flatten(0, 1)[:, None, :])  # (hw, 1, d)
            s = self.input_proj[i](feats[i]).flatten(2).permute(2, 0, 1)
            src.append(s + self.level_embed.weight[i][None, None, :])
        bs = feats[0].shape[0]
        query_embed = self.query_embed.weight.unsqueeze(1).repeat(1, bs, 1)
        output = self.query_feat.weight.unsqueeze(1).repeat(1, bs, 1)
        for i in range(self.dec_layers):
            lvl = i % 3
            output = self.transformer_cross_attention_layers[i](
                output, src[lvl], pos[lvl], query_embed
            )
            output = self.transformer_self_attention_layers[i](
                output, query_embed
            )
            output = self.transformer_ffn_layers[i](output)
        output = self.decoder_norm(output)
        color_embed = self.color_embed(output)  # (q, b, cdim)
        return color_embed.permute(1, 0, 2)


class _Hook:
    stored = None


def build_ddcolor_oracle(unet_mod, layers_mod, fastai_layers_mod,
                         encoder_depths=(1, 1, 2, 1),
                         encoder_dims=(32, 64, 128, 256),
                         unet_out=(64, 64, 32), hidden_dim=64,
                         num_queries=16, dec_layers=3, heads=8, ffn_dim=128):
    """Assemble the oracle using the reference's own fastai unet blocks
    (passed in via _ref_loader modules)."""
    NormType = fastai_layers_mod.NormType

    class DDColorOracle(nn.Module):
        def __init__(self):
            super().__init__()
            self.encoder = nn.Module()
            self.encoder.arch = _ConvNeXtT(encoder_depths, encoder_dims)
            dec = nn.Module()
            layers = []
            in_c = encoder_dims[3]
            skips = (encoder_dims[2], encoder_dims[1], encoder_dims[0])
            for i, out in enumerate(unet_out):
                blk = unet_mod.UnetBlockWide(
                    in_c, skips[i], out * 2, hook=_Hook(), blur=True,
                    self_attention=False, norm_type=NormType.Spectral,
                    extra_bn=True,
                )
                layers.append(blk)
                in_c = out
            dec.layers = nn.ModuleList(layers)
            dec.last_shuf = unet_mod.CustomPixelShuffle_ICNR(
                in_c, unet_out[-1], scale=4, blur=True,
                norm_type=NormType.Weight,
            )
            dec.color_decoder = _MultiScaleColorDecoderT(
                [unet_out[0], unet_out[1], unet_out[2]], hidden_dim,
                num_queries, heads, ffn_dim, dec_layers, unet_out[-1]
            )
            self.decoder = dec
            self.refine_net = nn.Sequential(
                layers_mod.custom_conv_layer(
                    num_queries + 3, 2, ks=1, use_activ=False,
                    norm_type=NormType.Spectral,
                )
            )

        def forward(self, x):
            f4, f8, f16, f32 = self.encoder.arch(x)
            y = f32
            outs = []
            for blk, skip in zip(self.decoder.layers, (f16, f8, f4)):
                blk.hook.stored = skip
                y = blk(y)
                outs.append(y)
            emb = self.decoder.last_shuf(y)
            color_embed = self.decoder.color_decoder(outs)  # (b, q, cdim)
            sim = torch.einsum("bqc,bchw->bqhw", color_embed, emb)
            out = torch.cat([sim, x], dim=1)
            return self.refine_net(out)

    return DDColorOracle()
