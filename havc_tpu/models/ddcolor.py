"""DDColor: ConvNeXt encoder + fastai-style pixel decoder + Mask2Former
color-query decoder (upstream piddnad/DDColor architecture, NHWC Flax).

The reference consumes DDColor through the external ``vsddcolor`` wheel
(reference: vsdeoldify/vsslib/vsmodels.py:290-374 — fp16 input, scenechange
gating, ``input_size = trunc(render_factor/2) * 32``; model variants
"modelscope" and "artistic", README.md:117-123).  The wheel wraps upstream
DDColor (``basicsr/archs/ddcolor_arch.py``), re-expressed here:

* **Encoder**: ConvNeXt with per-stage output LayerNorms (norm0..norm3) —
  the decoder consumes NORMED stage features (models/convnext.py
  ``out_norms=True``).
* **Pixel decoder**: three fastai UnetBlockWide blocks (shared with
  DeOldify — upstream DDColor vendors the same fastai-derived unet utils)
  from 1/32 up to 1/4 (outputs 512, 512, 256 for the published geometry),
  then ``last_shuf`` = PixelShuffle_ICNR(scale=4) to a full-resolution
  256-channel embedding.
* **Color decoder** (``MultiScaleColorDecoder``, Mask2Former-style):
  100 learned query features + query pos-embeddings, 9 post-norm blocks
  cycling cross-attn (queries <- scale tokens + sine pos + level embed),
  self-attn, FFN over the scales 1/16 -> 1/8 -> 1/4; final LayerNorm and a
  3-layer MLP ``color_embed``.
* **Fusion**: ``einsum(color_embed, pixel_embedding)`` -> (B,H,W,Q) score
  map, concatenated with the input image, 1x1 spectral conv -> 2 ab
  channels (``refine_net``).

I/O convention (upstream inference pipeline): input is the GRAY RGB
rendering of LAB (L, 0, 0) — i.e. ``lab_to_rgb`` of the luma, NOT L/100
replicated — in [0,1]; output is raw LAB ab.

Spectral/weight norms are folded at conversion (convert.fold_*); BatchNorms
are inference-form.  Checkpoint layout + adaptive config detection live in
convert.ddcolor_key_map / ddcolor_config_from_state_dict.

TPU notes: everything is matmul-shaped (MXU); attention sequence lengths
are tiny (100 queries x <=(S/4)^2 keys), so plain einsum attention with f32
accumulation is optimal — no flash tiling needed.  bf16-safe.
"""
from __future__ import annotations

import math
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.colorspace import lab_to_rgb, rgb_to_lab
from ..ops.resize import resize
from .convnext import CONVNEXT_CONFIGS, ConvNeXt
from .deoldify import PixelShuffleICNR, UnetBlockWide

__all__ = ["DDColor", "DDCOLOR_CONFIGS", "colorize", "init_params",
           "sine_position_embedding"]

DDCOLOR_CONFIGS = {
    # test/dev scale (not a published geometry)
    "micro": dict(encoder="micro", dim=64, num_queries=16, num_blocks=3,
                  unet_out=(64, 64, 32), heads=8, ffn_dim=128),
    "tiny": dict(encoder="tiny", dim=256, num_queries=100, num_blocks=9,
                 unet_out=(512, 512, 256)),
    "large": dict(encoder="large", dim=256, num_queries=100, num_blocks=9,
                  unet_out=(512, 512, 256)),
    # the published model names map to the large encoder
    "artistic": dict(encoder="large", dim=256, num_queries=100, num_blocks=9,
                     unet_out=(512, 512, 256)),
    "modelscope": dict(encoder="large", dim=256, num_queries=100,
                       num_blocks=9, unet_out=(512, 512, 256)),
}


def sine_position_embedding(h: int, w: int, num_pos_feats: int = 128,
                            temperature: float = 10000.0,
                            dtype=jnp.float32) -> jnp.ndarray:
    """DETR PositionEmbeddingSine (normalize=True): (H, W, 2*num_pos_feats)
    with the y-embedding first, interleaved sin/cos per frequency."""
    scale = 2.0 * math.pi
    eps = 1e-6
    y = jnp.arange(1, h + 1, dtype=jnp.float32)[:, None] * jnp.ones((1, w))
    x = jnp.arange(1, w + 1, dtype=jnp.float32)[None, :] * jnp.ones((h, 1))
    y = y / (h + eps) * scale
    x = x / (w + eps) * scale
    i = jnp.arange(num_pos_feats, dtype=jnp.float32)
    dim_t = temperature ** (2.0 * jnp.floor(i / 2.0) / num_pos_feats)
    pos_x = x[..., None] / dim_t
    pos_y = y[..., None] / dim_t
    pos_x = jnp.stack(
        [jnp.sin(pos_x[..., 0::2]), jnp.cos(pos_x[..., 1::2])], axis=-1
    ).reshape(h, w, num_pos_feats)
    pos_y = jnp.stack(
        [jnp.sin(pos_y[..., 0::2]), jnp.cos(pos_y[..., 1::2])], axis=-1
    ).reshape(h, w, num_pos_feats)
    return jnp.concatenate([pos_y, pos_x], axis=-1).astype(dtype)


class MHA(nn.Module):
    """torch nn.MultiheadAttention equivalent (packed qkv split by the
    converter into q/k/v Dense + out proj), f32 accumulation on the MXU."""

    dim: int
    heads: int = 8

    @nn.compact
    def __call__(self, q_in, k_in, v_in):
        d = self.dim // self.heads
        q = nn.Dense(self.dim, name="q", dtype=q_in.dtype)(q_in)
        k = nn.Dense(self.dim, name="k", dtype=q_in.dtype)(k_in)
        v = nn.Dense(self.dim, name="v", dtype=q_in.dtype)(v_in)

        def split(x):
            return x.reshape(x.shape[:-1] + (self.heads, d))

        q, k, v = split(q), split(k), split(v)
        logits = jnp.einsum(
            "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
        ) / jnp.sqrt(d).astype(jnp.float32)
        attn = jax.nn.softmax(logits, axis=-1).astype(q_in.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v,
                         preferred_element_type=jnp.float32).astype(q_in.dtype)
        out = out.reshape(out.shape[:-2] + (self.dim,))
        return nn.Dense(self.dim, name="proj", dtype=q_in.dtype)(out)


class ColorDecoderBlock(nn.Module):
    """One Mask2Former round: cross-attn -> self-attn -> FFN, all
    post-norm (normalize_before=False) with positional embeddings added to
    queries/keys but NOT values (transformer_*_layers forward_post)."""

    dim: int
    heads: int = 8
    ffn_dim: int = 2048

    @nn.compact
    def __call__(self, queries, query_pos, tokens, token_pos):
        x = queries
        y = MHA(self.dim, self.heads, name="cross")(
            x + query_pos, tokens + token_pos, tokens
        )
        x = nn.LayerNorm(name="cross_norm")(x + y)
        y = MHA(self.dim, self.heads, name="self")(
            x + query_pos, x + query_pos, x
        )
        x = nn.LayerNorm(name="self_norm")(x + y)
        y = nn.Dense(self.ffn_dim, name="ffn1", dtype=x.dtype)(x)
        y = nn.relu(y)
        y = nn.Dense(self.dim, name="ffn2", dtype=x.dtype)(y)
        x = nn.LayerNorm(name="ffn_norm")(x + y)
        return x


class DDColor(nn.Module):
    """Full model: gray RGB (B,S,S,3) in [0,1] -> raw LAB ab (B,S,S,2)."""

    encoder: str = "large"
    dim: int = 256  # color decoder hidden dim
    num_queries: int = 100
    num_blocks: int = 9  # dec_layers
    unet_out: Sequence[int] = (512, 512, 256)  # pixel decoder stage outputs
    heads: int = 8
    ffn_dim: int = 2048
    num_output_channels: int = 2
    unet_extra_bn: bool = True  # custom_conv_layer extra_bn in the decoder
    do_normalize: bool = False  # imagenet-normalize inputs (DDColor.normalize)

    @nn.compact
    def __call__(self, x):
        img = x
        if self.do_normalize:
            mean = jnp.asarray([0.485, 0.456, 0.406], x.dtype)
            std = jnp.asarray([0.229, 0.224, 0.225], x.dtype)
            x = (x - mean) / std
        cfg = CONVNEXT_CONFIGS[self.encoder]
        feats = ConvNeXt(name="convnext", out_norms=True, **cfg)(x)
        f4, f8, f16, f32 = feats  # normed stage outputs (Encoder hooks)

        # pixel decoder: UnetBlockWide chain from 1/32 (ddcolor_arch
        # Decoder.make_layers; n_out semantics = 2 * output channels)
        y = f32
        scale_feats = []
        for i, (skip, out_ch) in enumerate(zip((f16, f8, f4), self.unet_out)):
            y = UnetBlockWide(
                out_ch * 2, blur=True, self_attention=False,
                use_bn=self.unet_extra_bn, name=f"layer{i}",
            )(y, skip)
            scale_feats.append(y)  # 1/16, 1/8, 1/4
        # last_shuf: PixelShuffle_ICNR scale=4 (Spectral last_norm -> no bn)
        emb = PixelShuffleICNR(
            self.unet_out[-1], blur=True, use_bn=False, scale=4,
            name="last_shuf",
        )(y)  # (B, S, S, 256) full-res embedding

        # color decoder (MultiScaleColorDecoder)
        b = x.shape[0]
        d = self.dim
        query_feat = self.param(
            "query_feat", nn.initializers.normal(1.0), (self.num_queries, d))
        query_embed = self.param(
            "query_embed", nn.initializers.normal(1.0), (self.num_queries, d))
        level_embed = self.param(
            "level_embed", nn.initializers.normal(1.0), (3, d))

        tokens, poss = [], []
        for s, feat in enumerate(scale_feats):
            t = nn.Conv(d, (1, 1), name=f"input_proj{s}", dtype=x.dtype)(feat)
            fh, fw = t.shape[1:3]
            t = t.reshape(b, fh * fw, d) + jnp.asarray(level_embed[s], x.dtype)
            pos = sine_position_embedding(fh, fw, d // 2, dtype=x.dtype)
            tokens.append(t)
            poss.append(pos.reshape(1, fh * fw, d))

        q = jnp.broadcast_to(
            jnp.asarray(query_feat, x.dtype), (b, self.num_queries, d))
        qp = jnp.asarray(query_embed, x.dtype)[None]
        for i in range(self.num_blocks):
            lvl = i % 3
            q = ColorDecoderBlock(
                d, self.heads, self.ffn_dim, name=f"block{i}"
            )(q, qp, tokens[lvl], poss[lvl])
        q = nn.LayerNorm(name="decoder_norm")(q)
        # color_embed: 3-layer MLP (hidden_dim, hidden_dim ->
        # color_embed_dim = pixel-embedding channels) with ReLU between
        e = q
        dims = (d, d, self.unet_out[-1])
        for j in range(3):
            if j > 0:
                e = nn.relu(e)
            e = nn.Dense(dims[j], name=f"color_embed{j}", dtype=x.dtype)(e)

        # (B,H,W,Q) per-pixel query scores, fused with the input image
        sim = jnp.einsum(
            "bhwc,bqc->bhwq", emb, e, preferred_element_type=jnp.float32
        ).astype(x.dtype)
        fused = jnp.concatenate([sim, img], axis=-1)
        ab = nn.Conv(self.num_output_channels, (1, 1), name="refine",
                     dtype=x.dtype)(fused)
        return ab

    @staticmethod
    def from_config(name: str) -> "DDColor":
        return DDColor(**DDCOLOR_CONFIGS[name])


def init_params(model: DDColor, input_size: int = 256, seed: int = 0):
    rng = jax.random.PRNGKey(seed)
    dummy = jnp.zeros((1, input_size, input_size, 3), jnp.float32)
    return model.init(rng, dummy)


def colorize(
    params,
    rgb: jnp.ndarray,
    model: DDColor,
    input_size: int = 384,
) -> jnp.ndarray:
    """Driver: RGB (B,H,W,3) [0,1] -> colorized RGB.

    Pipeline semantics per the upstream DDColor
    ``ImageColorizationPipeline`` (which the vsddcolor wheel transcribes,
    vsmodels.py:352-360): the RGB image is resized FIRST (plain bilinear,
    no antialias — F.interpolate semantics), then L is extracted from the
    RESIZED image and rendered as the gray RGB of LAB (L, 0, 0); the
    model's raw ab output is bilinear-resized back (no antialias) and
    joined with the ORIGINAL-resolution L.
    """
    h, w = rgb.shape[-3], rgb.shape[-2]
    l_orig = rgb_to_lab(rgb)[..., 0:1]
    rgb_rs = jnp.clip(
        resize(rgb, input_size, input_size, "bilinear", antialias=False),
        0.0, 1.0,
    )
    l_rs = rgb_to_lab(rgb_rs)[..., 0:1]
    gray = lab_to_rgb(
        jnp.concatenate([l_rs, jnp.zeros_like(l_rs), jnp.zeros_like(l_rs)],
                        axis=-1)
    )
    ab = model.apply(params, gray)
    ab_up = resize(ab, h, w, "bilinear", antialias=False)
    out = lab_to_rgb(jnp.concatenate([l_orig, ab_up], axis=-1))
    return jnp.clip(out, 0.0, 1.0)
