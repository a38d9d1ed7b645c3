"""DeOldify DynamicUnet (Wide + Deep) in Flax, fastai-free.

Rebuild of the reference's DeOldify engine (reference:
vsdeoldify/deoldify/unet.py:24-285 ``DynamicUnetWide``/``DynamicUnetDeep``,
deoldify/layers.py:8-46 ``custom_conv_layer``,
deoldify/generators.py:12-80 model configs,
deoldify/filters.py:76-124 inference driver):

* **Wide** (Video & Stable weights): ResNet101 body, nf_factor=2 (nf=1024),
  blur=True, spectral norm, self-attention, y_range=(-3, 3).
* **Deep** (Artistic weights): ResNet34 body, nf_factor=1.5, UnetBlockDeep
  channel sizing.

The fastai hooked-encoder becomes an explicit multi-output encoder
(models/resnet.py returns every stage activation); hook order is the
fastai one: reversed size-change indices -> (layer3, layer2, layer1, relu).
Spectral norm is inference-folded by the weight converter (W = W_orig /
sigma), so all convs here are plain convs. ``extra_bn=True`` in the
reference (NormType.Spectral) means every custom_conv_layer carries a
BatchNorm — kept here as inference BatchNorms.

Blocks:
* CustomPixelShuffle_ICNR: 1x1 conv (to nf*4) -> ReLU -> PixelShuffle(2)
  -> replication-pad (1,0,1,0) -> 2x2 stride-1 avg-pool "blur".
* UnetBlockWide: shuf(up) ++ BN(skip) -> ReLU -> one conv (+ optional
  fastai SelfAttention).  UnetBlockDeep: two convs, nf_factor-scaled.
* last_cross: dense merge with the network *input* + a res_block, then
  1x1 conv to 3 channels and SigmoidRange(-3, 3).

Driver (``colorize``): square-stretch to ``render_factor*16`` (the
reference uses PIL BILINEAR), imagenet-normalize, forward, denormalize,
then copy the model's chroma onto the original-resolution luma
(filters.py:100-124 post-process).
"""
from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.colorspace import copy_chroma
from ..ops.resize import resize
from .layers import BatchNormInference, PtConv, sigmoid_range
from .resnet import ResNetBody

__all__ = [
    "DeOldifyWide",
    "DeOldifyDeep",
    "DEOLDIFY_CONFIGS",
    "colorize",
    "init_params",
    "IMAGENET_MEAN",
    "IMAGENET_STD",
]

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)

DEOLDIFY_CONFIGS = {
    # weights_name -> (variant, encoder, nf_factor)
    "video": ("wide", "resnet101", 2),
    "stable": ("wide", "resnet101", 2),
    "artistic": ("deep", "resnet34", 1.5),
}


class SelfAttention(nn.Module):
    """fastai SelfAttention: 1x1 f/g/h convs, softmax(f^T g), gamma-gated."""

    channels: int

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        n = h * w
        f = PtConv(c // 8, 1, 1, 0, use_bias=False, name="query")(x).reshape(b, n, c // 8)
        g = PtConv(c // 8, 1, 1, 0, use_bias=False, name="key")(x).reshape(b, n, c // 8)
        hh = PtConv(c, 1, 1, 0, use_bias=False, name="value")(x).reshape(b, n, c)
        # fastai computes softmax over the first dim of f^T g
        logits = jnp.einsum(
            "bnf,bmf->bnm", f, g, preferred_element_type=jnp.float32
        )
        beta = jax.nn.softmax(logits, axis=1).astype(x.dtype)
        o = jnp.einsum(
            "bnm,bnc->bmc", beta, hh, preferred_element_type=jnp.float32
        ).astype(x.dtype)
        gamma = self.param("gamma", nn.initializers.zeros, (1,))
        return (jnp.asarray(gamma, x.dtype) * o.reshape(b, h, w, c) + x)


class ConvBnRelu(nn.Module):
    """custom_conv_layer inference form: conv -> ReLU -> BN (+ attention).

    The reference order is conv, relu, bn (fastai puts activation before
    norm); spectral norm is folded into the conv weight.
    """

    features: int
    kernel_size: int = 3
    use_activ: bool = True
    use_bn: bool = True
    self_attention: bool = False

    @nn.compact
    def __call__(self, x):
        pad = (self.kernel_size - 1) // 2
        x = PtConv(
            self.features, self.kernel_size, 1, pad,
            use_bias=not self.use_bn, name="conv",
        )(x)
        if self.use_activ:
            x = nn.relu(x)
        if self.use_bn:
            x = BatchNormInference(self.features, name="bn")(x)
        if self.self_attention:
            x = SelfAttention(self.features, name="attn")(x)
        return x


class PixelShuffleICNR(nn.Module):
    """1x1 conv to nf*4 -> ReLU -> PixelShuffle(2) -> pad+avgpool blur.

    ``use_bn=True`` matches CustomPixelShuffle_ICNR (deoldify/unet.py:24:
    custom_conv_layer with extra_bn, spectral-normed, no bias); the FINAL
    shuffle of the net is fastai's PixelShuffle_ICNR (layers.py:204:
    weight-normed conv WITH bias, no BN, blur=False) -> use_bn=False.
    """

    features: int
    blur: bool = True
    use_bn: bool = True
    scale: int = 2

    @nn.compact
    def __call__(self, x):
        r = self.scale
        x = ConvBnRelu(
            self.features * r * r, kernel_size=1, use_activ=False,
            use_bn=self.use_bn, name="conv",
        )(x)
        x = nn.relu(x)
        # PixelShuffle(r), NHWC; torch channel layout is (c_out, dy, dx)
        # with c_out slowest — match it so converted weights line up
        b, h, w, c = x.shape
        co = c // (r * r)
        x = x.reshape(b, h, w, co, r, r)
        x = x.transpose(0, 1, 4, 2, 5, 3).reshape(b, h * r, w * r, co)
        if self.blur:
            # ReplicationPad2d((1,0,1,0)): pad left/top by 1
            x = jnp.pad(x, ((0, 0), (1, 0), (1, 0), (0, 0)), mode="edge")
            x = nn.avg_pool(x, (2, 2), strides=(1, 1))
        return x


class UnetBlockWide(nn.Module):
    """fastai/DeOldify UnetBlockWide; also the pixel-decoder block of
    DDColor (which vendors the same fastai-derived unet utils)."""

    n_out: int
    blur: bool = True
    self_attention: bool = False
    use_bn: bool = True  # extra_bn (NormType.Spectral) variant

    @nn.compact
    def __call__(self, up_in, skip):
        up_out = self.n_out // 2
        x = PixelShuffleICNR(
            up_out, blur=self.blur, use_bn=self.use_bn, name="shuf"
        )(up_in)
        if x.shape[1:3] != skip.shape[1:3]:
            x = jax.image.resize(
                x, (x.shape[0],) + skip.shape[1:3] + (x.shape[-1],), "nearest"
            )
        s = BatchNormInference(skip.shape[-1], name="bn")(skip)
        cat = nn.relu(jnp.concatenate([x, s], axis=-1))
        return ConvBnRelu(
            up_out, self_attention=self.self_attention, use_bn=self.use_bn,
            name="conv",
        )(cat)


class UnetBlockDeep(nn.Module):
    nf_factor: float = 1.5
    final_div: bool = True
    blur: bool = True
    self_attention: bool = False

    @nn.compact
    def __call__(self, up_in, skip):
        up_c = up_in.shape[-1]
        x = PixelShuffleICNR(up_c // 2, blur=self.blur, name="shuf")(up_in)
        if x.shape[1:3] != skip.shape[1:3]:
            x = jax.image.resize(
                x, (x.shape[0],) + skip.shape[1:3] + (x.shape[-1],), "nearest"
            )
        s = BatchNormInference(skip.shape[-1], name="bn")(skip)
        cat = nn.relu(jnp.concatenate([x, s], axis=-1))
        ni = cat.shape[-1]
        nf = int((ni if self.final_div else ni // 2) * self.nf_factor)
        x = ConvBnRelu(nf, name="conv1")(cat)
        return ConvBnRelu(nf, self_attention=self.self_attention, name="conv2")(x)


class ResBlock(nn.Module):
    """fastai res_block (layers.py:154-161): two conv_layers + residual.

    With NormType.Spectral the fastai conv_layer has NO BatchNorm and the
    convs carry a bias (bn=False -> bias=True) — conv -> ReLU only.
    """

    features: int

    @nn.compact
    def __call__(self, x):
        y = ConvBnRelu(self.features, use_bn=False, name="conv1")(x)
        y = ConvBnRelu(self.features, use_bn=False, name="conv2")(y)
        return x + y


class _DynamicUnetBase(nn.Module):
    encoder: str = "resnet101"
    n_classes: int = 3
    self_attention: bool = True
    blur: bool = True
    y_range: Tuple[float, float] = (-3.0, 3.0)

    def _encode(self, x):
        feats = ResNetBody.from_config(self.encoder)(x)
        relu_out, l1, l2, l3, l4 = feats
        # fastai hook order: reversed size-change indices
        return l4, [l3, l2, l1, relu_out]

    def _head(self, x, inp, ni):
        # upscale to input res if the first skip was at half input res;
        # fastai PixelShuffle_ICNR here: no BN (weight-normed conv w/ bias).
        # NOTE blur is ALWAYS applied: fastai assigns self.blur = AvgPool2d
        # unconditionally and `if self.blur` tests the module, not the flag
        # (layers.py:214-220) — a shipped fastai-1.0.60 quirk the weights
        # were trained with, reproduced faithfully.
        if x.shape[1] != inp.shape[1]:
            x = PixelShuffleICNR(
                x.shape[-1], blur=True, use_bn=False, name="final_shuf"
            )(x)
        # last_cross: dense merge with the network input
        x = jnp.concatenate([x, inp], axis=-1)
        x = ResBlock(x.shape[-1], name="last_cross")(x)
        x = PtConv(self.n_classes, 1, 1, 0, name="head_conv")(x)
        return sigmoid_range(x, *self.y_range)


class DeOldifyWide(_DynamicUnetBase):
    """DynamicUnetWide (Video/Stable): nf = 512 * nf_factor."""

    nf_factor: int = 2

    @nn.compact
    def __call__(self, x):
        inp = x
        bottom, skips = self._encode(x)
        ni = bottom.shape[-1]
        y = BatchNormInference(ni, name="pre_bn")(bottom)
        y = nn.relu(y)
        y = ConvBnRelu(ni * 2, name="mid_conv1")(y)
        y = ConvBnRelu(ni, name="mid_conv2")(y)
        nf = 512 * self.nf_factor
        n_blocks = len(skips)
        for i, skip in enumerate(skips):
            not_final = i != n_blocks - 1
            n_out = nf if not_final else nf // 2
            sa = self.self_attention and (i == n_blocks - 3)
            y = UnetBlockWide(
                n_out, blur=self.blur, self_attention=sa, name=f"up{i}"
            )(y, skip)
        return self._head(y, inp, y.shape[-1])


class DeOldifyDeep(_DynamicUnetBase):
    """DynamicUnetDeep (Artistic): per-block nf_factor channel scaling."""

    encoder: str = "resnet34"
    nf_factor: float = 1.5

    @nn.compact
    def __call__(self, x):
        inp = x
        bottom, skips = self._encode(x)
        ni = bottom.shape[-1]
        y = BatchNormInference(ni, name="pre_bn")(bottom)
        y = nn.relu(y)
        y = ConvBnRelu(ni * 2, name="mid_conv1")(y)
        y = ConvBnRelu(ni, name="mid_conv2")(y)
        n_blocks = len(skips)
        for i, skip in enumerate(skips):
            not_final = i != n_blocks - 1
            sa = self.self_attention and (i == n_blocks - 3)
            y = UnetBlockDeep(
                nf_factor=self.nf_factor, final_div=not_final,
                blur=self.blur, self_attention=sa, name=f"up{i}",
            )(y, skip)
        return self._head(y, inp, y.shape[-1])


def make_model(weights_name: str):
    """Model for a published weights name: video / stable / artistic."""
    variant, encoder, nf = DEOLDIFY_CONFIGS[weights_name]
    if variant == "wide":
        return DeOldifyWide(encoder=encoder, nf_factor=int(nf))
    return DeOldifyDeep(encoder=encoder, nf_factor=float(nf))


def init_params(model: nn.Module, input_size: int = 64, seed: int = 0):
    rng = jax.random.PRNGKey(seed)
    dummy = jnp.zeros((1, input_size, input_size, 3), jnp.float32)
    return model.init(rng, dummy)


def colorize(
    params,
    rgb: jnp.ndarray,
    model: nn.Module,
    render_factor: int = 24,
) -> jnp.ndarray:
    """Driver matching deoldify/filters.py:76-124.

    Square-stretch to ``render_factor*16`` (bilinear), LA grayscale
    transform (``image.convert('LA').convert('RGB')``, filters.py:94 —
    rec601 luma replicated to 3 channels), imagenet-normalize, U-Net
    forward, denormalize, then marry the model chroma to the
    original-resolution luma.
    """
    from ..ops.colorspace import rgb_to_gray

    h, w = rgb.shape[-3], rgb.shape[-2]
    size = render_factor * 16
    sq = resize(rgb, size, size, "bilinear")
    sq = rgb_to_gray(sq)
    mean = jnp.asarray(IMAGENET_MEAN, rgb.dtype)
    std = jnp.asarray(IMAGENET_STD, rgb.dtype)
    out = model.apply(params, (sq - mean) / std)
    out = jnp.clip(out * std + mean, 0.0, 1.0)
    out_full = resize(out, h, w, "bilinear")
    return jnp.clip(copy_chroma(out_full, rgb), 0.0, 1.0)
