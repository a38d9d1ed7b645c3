"""DINOv2 ViT-S/14 feature extractor (Flax, NHWC).

Rebuild of the DINOv2 backbone ColorMNet hub-loads (reference:
vsdeoldify/colormnet/model/resnet.py:211-246 ``Segmentor``: intermediate
layers [8, 9, 10, 11] concatenated -> 1536ch -> 1x1 conv + BN + ReLU ->
bilinear re-interp from the 1/14 patch grid to the 1/16 grid; SURVEY.md
hard-part #3).

Standard ViT-S/14: patch embed 14x14 stride 14, dim 384, 12 blocks,
6 heads, MLP ratio 4, pre-norm, learned pos embeddings (interpolated to
the input grid) + CLS token (dropped for feature maps).
"""
from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

__all__ = ["ViT", "VIT_CONFIGS", "DinoSegmentor", "torch_bicubic_resize"]

VIT_CONFIGS = {
    "dinov2_s14": dict(patch=14, dim=384, depth=12, heads=6),
    # test/dev configs
    "micro": dict(patch=14, dim=64, depth=4, heads=2),
    "nano": dict(patch=14, dim=32, depth=2, heads=2),
}


class Attention(nn.Module):
    dim: int
    heads: int

    @nn.compact
    def __call__(self, x):
        b, n, c = x.shape
        d = self.dim // self.heads
        qkv = nn.Dense(self.dim * 3, name="qkv", dtype=x.dtype)(x)
        q, k, v = jnp.split(qkv.reshape(b, n, 3, self.heads, d), 3, axis=2)
        q, k, v = q[:, :, 0], k[:, :, 0], v[:, :, 0]
        logits = jnp.einsum(
            "bnhd,bmhd->bhnm", q, k, preferred_element_type=jnp.float32
        ) / jnp.sqrt(d)
        attn = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
        out = jnp.einsum(
            "bhnm,bmhd->bnhd", attn, v, preferred_element_type=jnp.float32
        ).astype(x.dtype)
        out = out.reshape(b, n, self.dim)
        return nn.Dense(self.dim, name="proj", dtype=x.dtype)(out)


class Block(nn.Module):
    """DINOv2 block: pre-norm attn/MLP with LayerScale (ls1/ls2.gamma) and
    exact (erf) GELU, matching the upstream facebookresearch/dinov2
    vision_transformer.py checkpoint layout."""

    dim: int
    heads: int

    @nn.compact
    def __call__(self, x):
        y = nn.LayerNorm(name="norm1")(x)
        y = Attention(self.dim, self.heads, name="attn")(y)
        ls1 = self.param("ls1_gamma", nn.initializers.ones, (self.dim,))
        x = x + y * jnp.asarray(ls1, x.dtype)
        y = nn.LayerNorm(name="norm2")(x)
        y = nn.Dense(self.dim * 4, name="mlp_fc1", dtype=x.dtype)(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(self.dim, name="mlp_fc2", dtype=x.dtype)(y)
        ls2 = self.param("ls2_gamma", nn.initializers.ones, (self.dim,))
        return x + y * jnp.asarray(ls2, x.dtype)


def _cubic_weights(t: jnp.ndarray, a: float = -0.75) -> jnp.ndarray:
    """Cubic convolution weights for 4 taps at offsets (-1, 0, 1, 2) from
    the floor index, torch/OpenCV convention (A = -0.75)."""
    # |x| for the four taps given fractional position t in [0, 1)
    x0, x1, x2, x3 = 1.0 + t, t, 1.0 - t, 2.0 - t

    def near(x):  # |x| <= 1
        return (a + 2.0) * x**3 - (a + 3.0) * x**2 + 1.0

    def far(x):  # 1 < |x| < 2
        return a * x**3 - 5.0 * a * x**2 + 8.0 * a * x - 4.0 * a

    return jnp.stack([far(x0), near(x1), near(x2), far(x3)], axis=-1)


def _bicubic_1d(x: jnp.ndarray, out_size: int, scale: float, axis: int):
    """Torch ``F.interpolate(mode='bicubic', align_corners=False)`` along
    one axis with an explicit sampling scale (matches scale_factor
    semantics: src = (dst + 0.5) / scale - 0.5, taps clamped to edges)."""
    in_size = x.shape[axis]
    dst = jnp.arange(out_size, dtype=jnp.float32)
    src = (dst + 0.5) / scale - 0.5
    i0 = jnp.floor(src)
    t = src - i0
    w = _cubic_weights(t)  # (out, 4)
    idx = jnp.clip(
        i0[:, None].astype(jnp.int32) + jnp.arange(-1, 3)[None, :],
        0, in_size - 1,
    )  # (out, 4)
    taps = jnp.take(x, idx.reshape(-1), axis=axis)
    shape = list(x.shape)
    shape[axis : axis + 1] = [out_size, 4]
    taps = taps.reshape(shape)
    w_shape = [1] * taps.ndim
    w_shape[axis], w_shape[axis + 1] = out_size, 4
    return jnp.sum(taps * w.reshape(w_shape), axis=axis + 1)


def torch_bicubic_resize(x: jnp.ndarray, out_hw, scale_hw=None):
    """Torch-exact bicubic resize over the two leading-minor spatial axes of
    a (B, H, W, C) array.  ``scale_hw`` supplies explicit sampling scales
    (F.interpolate scale_factor semantics); defaults to out/in.

    Interpolation weights are f32; the result is cast back to the input
    dtype so bf16 feature paths stay bf16 (a scan carry whose dtype leaks
    to f32 breaks lax.scan type matching)."""
    oh, ow = out_hw
    sh = scale_hw[0] if scale_hw else oh / x.shape[1]
    sw = scale_hw[1] if scale_hw else ow / x.shape[2]
    dtype = x.dtype
    x = _bicubic_1d(x, oh, sh, axis=1)
    return _bicubic_1d(x, ow, sw, axis=2).astype(dtype)


def _linear_1d(x: jnp.ndarray, out_size: int, scale: float, axis: int):
    """Torch ``F.interpolate(mode='bilinear', align_corners=False)`` along
    one axis — NO antialiasing even when downscaling (unlike
    jax.image.resize); negative source coords clamp to 0 (torch
    area_pixel_compute_source_index)."""
    in_size = x.shape[axis]
    dst = jnp.arange(out_size, dtype=jnp.float32)
    src = jnp.maximum((dst + 0.5) / scale - 0.5, 0.0)
    i0 = jnp.floor(src).astype(jnp.int32)
    i0 = jnp.clip(i0, 0, in_size - 1)
    i1 = jnp.clip(i0 + 1, 0, in_size - 1)
    t = src - i0.astype(jnp.float32)
    a = jnp.take(x, i0, axis=axis)
    b = jnp.take(x, i1, axis=axis)
    shape = [1] * x.ndim
    shape[axis] = out_size
    t = t.reshape(shape)
    return a * (1.0 - t) + b * t


def torch_bilinear_resize(x: jnp.ndarray, out_hw):
    """Torch-exact ``F.interpolate(mode='bilinear', align_corners=False,
    antialias=False)`` over H, W of a (B, H, W, C) array — matches the
    reference's feature-map re-grids (e.g. the Segmentor's 1/14 -> 1/16
    DOWNSCALE, resnet.py:244, where jax.image.resize would antialias).

    f32 interpolation weights, result cast back to the input dtype (keeps
    bf16 engine paths bf16 — see torch_bicubic_resize)."""
    oh, ow = out_hw
    dtype = x.dtype
    x = _linear_1d(x, oh, oh / x.shape[1], axis=1)
    return _linear_1d(x, ow, ow / x.shape[2], axis=2).astype(dtype)


class ViT(nn.Module):
    """Returns the requested intermediate layer outputs as feature maps
    (B, H/p, W/p, dim) — ``get_intermediate_layers(..., reshape=True)``."""

    patch: int = 14
    dim: int = 384
    depth: int = 12
    heads: int = 6
    out_layers: Sequence[int] = (8, 9, 10, 11)
    # pos_embed is stored at the DINOv2 pretraining grid (518/14 = 37) and
    # bicubic-interpolated to the runtime grid, like the upstream
    # interpolate_pos_encoding — so converted checkpoints load untouched
    # whatever the working resolution
    pretrain_grid: int = 37

    @nn.compact
    def __call__(self, rgb) -> Tuple[jnp.ndarray, ...]:
        b, h, w, _ = rgb.shape
        # inputs must be patch multiples (the reference pads clips to 112 =
        # lcm(16, 14), colormnet_render pad_divide_by); resize if not
        gh, gw = max(h // self.patch, 1), max(w // self.patch, 1)
        if (gh * self.patch, gw * self.patch) != (h, w):
            rgb = jax.image.resize(
                rgb, (b, gh * self.patch, gw * self.patch, rgb.shape[-1]),
                "bilinear",
            )
        x = nn.Conv(
            self.dim, (self.patch, self.patch),
            strides=(self.patch, self.patch), padding="VALID",
            name="patch_embed", dtype=rgb.dtype,
        )(rgb)
        x = x.reshape(b, gh * gw, self.dim)
        cls = self.param("cls_token", nn.initializers.zeros, (1, 1, self.dim))
        g0 = self.pretrain_grid
        pos = self.param(
            "pos_embed", nn.initializers.normal(0.02),
            (1, g0 * g0 + 1, self.dim),
        )
        pos_cls, pos_patch = pos[:, :1], pos[:, 1:]
        if (gh, gw) != (g0, g0):
            # upstream interpolate_pos_encoding (dinov2
            # vision_transformer.py): bicubic with
            # scale_factor=(grid + 0.1)/pretrain_grid, antialias off —
            # replicated exactly so converted checkpoints see the same
            # positional code as the torch reference
            off = 0.1
            pos_patch = torch_bicubic_resize(
                pos_patch.reshape(1, g0, g0, self.dim).astype(jnp.float32),
                (gh, gw),
                scale_hw=((gh + off) / g0, (gw + off) / g0),
            ).reshape(1, gh * gw, self.dim).astype(pos.dtype)
        x = jnp.concatenate(
            [jnp.broadcast_to(jnp.asarray(cls, x.dtype), (b, 1, self.dim)), x],
            axis=1,
        )
        x = x + jnp.concatenate([pos_cls, pos_patch], axis=1).astype(x.dtype)
        outs = []
        final_norm = nn.LayerNorm(name="norm")
        for i in range(self.depth):
            x = Block(self.dim, self.heads, name=f"block{i}")(x)
            if i in self.out_layers:
                # get_intermediate_layers(norm=True) applies the SHARED
                # final norm to every tapped layer (dinov2
                # vision_transformer.py), not per-layer norms
                outs.append(
                    final_norm(x)[:, 1:].reshape(b, gh, gw, self.dim)
                )
        return tuple(outs)


class DinoSegmentor(nn.Module):
    """Segmentor head (resnet.py:211-246): concat 4 intermediate layers ->
    1x1 conv (no bias) + BN + ReLU -> resize from the 1/14 grid to 1/16."""

    vit_config: str = "dinov2_s14"

    @nn.compact
    def __call__(self, rgb):
        cfg = VIT_CONFIGS[self.vit_config]
        n_out = 4
        feats = ViT(
            patch=cfg["patch"], dim=cfg["dim"], depth=cfg["depth"],
            heads=cfg["heads"],
            out_layers=tuple(range(cfg["depth"] - n_out, cfg["depth"])),
            name="backbone",
        )(rgb)
        f = jnp.concatenate(feats, axis=-1)  # (B, gh, gw, 4*dim)
        f = nn.Conv(f.shape[-1], (1, 1), use_bias=False, name="conv3",
                    dtype=f.dtype)(f)
        scale = self.param("bn_scale", nn.initializers.ones, (f.shape[-1],))
        bias = self.param("bn_bias", nn.initializers.zeros, (f.shape[-1],))
        mean = self.param("bn_mean", nn.initializers.zeros, (f.shape[-1],))
        var = self.param("bn_var", nn.initializers.ones, (f.shape[-1],))
        f = (f - jnp.asarray(mean, f.dtype)) / jnp.sqrt(
            jnp.asarray(var, f.dtype) + 1e-5
        ) * jnp.asarray(scale, f.dtype) + jnp.asarray(bias, f.dtype)
        f = nn.relu(f)
        # re-interp from the 1/14 grid to the 1/16 grid (x * 14/16) —
        # torch-exact bilinear, no antialias (resnet.py:243-244)
        b, gh, gw, c = f.shape
        nh, nw = int(gh * 14 / 16), int(gw * 14 / 16)
        return torch_bilinear_resize(f, (nh, nw))
