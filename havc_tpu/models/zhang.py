"""Zhang et al. colorization CNNs (eccv16 + siggraph17) in Flax.

Rebuild of the reference's vendored colorizers (reference:
vsdeoldify/colorization/colorizers/eccv16.py:9-108 ``ECCVGenerator``,
siggraph17.py:7-162 ``SIGGRAPHGenerator``, base_color.py:1-23 LAB norms,
__init__.py:31-106 ``ModelColorization`` driver) as NHWC inference graphs:

* **eccv16**: 8 conv blocks (blocks 5-6 dilated x2), 313-bin color-class
  softmax -> 1x1 ab regression head, 4x bilinear upsample.
* **siggraph17**: user-guided arch — 4-channel input (L + ab hints + mask;
  HAVC always feeds zero hints), stride-2 subsampling between blocks 1-4,
  three shortcut connections on the decoder (model3short8 etc.), tanh ab
  head.  (The classification branch exists only for training and is
  omitted from the inference graph; its weights are simply unused.)

Driver semantics (``colorize``): L channel extracted in CIELAB, model run at
256x256, predicted ab bilinearly upsampled to the original size and joined
with the *original-resolution* L — identical to the reference's
preprocess_img/postprocess_tens flow (colorizers/util.py:25-55).

Weight conversion from the published checkpoints is systematic:
``convert.torch_to_flax`` maps ``modelN.K.{weight,bias}``/BatchNorm stats
onto these modules' parameter trees.
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.colorspace import lab_to_rgb, rgb_to_lab
from ..ops.resize import resize
from .layers import BatchNormInference, PtConv, PtConvTranspose, resize_bilinear

__all__ = ["ECCV16", "Siggraph17", "colorize", "init_params"]

# LAB normalization constants (reference base_color.py:8-23).
L_CENT = 50.0
L_NORM = 100.0
AB_NORM = 110.0


class _ConvBlock(nn.Module):
    """N convs (optional stride on the last, optional dilation) + ReLU each,
    then inference BatchNorm — one "modelK" block of the Zhang nets."""

    features: int
    n_convs: int
    last_stride: int = 1
    dilation: int = 1
    norm: bool = True

    @nn.compact
    def __call__(self, x):
        for i in range(self.n_convs):
            stride = self.last_stride if i == self.n_convs - 1 else 1
            pad = self.dilation
            x = PtConv(
                self.features,
                kernel_size=3,
                stride=stride,
                padding=pad,
                dilation=self.dilation,
                name=f"conv{i}",
            )(x)
            x = nn.relu(x)
        if self.norm:
            x = BatchNormInference(self.features, name="norm")(x)
        return x


class ECCV16(nn.Module):
    """ECCVGenerator: input L (B,H,W,1) normalized, output ab (B,H,W,2)."""

    @nn.compact
    def __call__(self, input_l):
        x = (input_l - L_CENT) / L_NORM
        x = _ConvBlock(64, 2, last_stride=2, name="model1")(x)
        x = _ConvBlock(128, 2, last_stride=2, name="model2")(x)
        x = _ConvBlock(256, 3, last_stride=2, name="model3")(x)
        x = _ConvBlock(512, 3, name="model4")(x)
        x = _ConvBlock(512, 3, dilation=2, name="model5")(x)
        x = _ConvBlock(512, 3, dilation=2, name="model6")(x)
        x = _ConvBlock(512, 3, name="model7")(x)
        # model8: convtranspose up + 2 convs + 313-class head (no norm)
        x = PtConvTranspose(256, 4, 2, 1, name="model8_up")(x)
        x = nn.relu(x)
        x = PtConv(256, 3, 1, 1, name="model8_conv1")(x)
        x = nn.relu(x)
        x = PtConv(256, 3, 1, 1, name="model8_conv2")(x)
        x = nn.relu(x)
        x = PtConv(313, 1, 1, 0, name="model8_class")(x)
        x = jax.nn.softmax(x, axis=-1)
        x = PtConv(2, 1, 1, 0, use_bias=False, name="model_out")(x)
        x = resize_bilinear(x, 4)
        return x * AB_NORM


class Siggraph17(nn.Module):
    """SIGGRAPHGenerator inference graph (zero ab hints by default)."""

    @nn.compact
    def __call__(self, input_l, input_ab=None, mask=None):
        if input_ab is None:
            input_ab = jnp.zeros(input_l.shape[:-1] + (2,), input_l.dtype)
        if mask is None:
            mask = jnp.zeros_like(input_l)
        x = jnp.concatenate(
            [(input_l - L_CENT) / L_NORM, input_ab / AB_NORM, mask], axis=-1
        )
        conv1 = _ConvBlock(64, 2, name="model1")(x)
        conv2 = _ConvBlock(128, 2, name="model2")(conv1[:, ::2, ::2, :])
        conv3 = _ConvBlock(256, 3, name="model3")(conv2[:, ::2, ::2, :])
        conv4 = _ConvBlock(512, 3, name="model4")(conv3[:, ::2, ::2, :])
        conv5 = _ConvBlock(512, 3, dilation=2, name="model5")(conv4)
        conv6 = _ConvBlock(512, 3, dilation=2, name="model6")(conv5)
        conv7 = _ConvBlock(512, 3, name="model7")(conv6)

        up8 = PtConvTranspose(256, 4, 2, 1, name="model8_up")(conv7)
        short8 = PtConv(256, 3, 1, 1, name="model3short8")(conv3)
        x = nn.relu(up8 + short8)
        x = PtConv(256, 3, 1, 1, name="model8_conv1")(x)
        x = nn.relu(x)
        x = PtConv(256, 3, 1, 1, name="model8_conv2")(x)
        x = nn.relu(x)
        conv8 = BatchNormInference(256, name="model8_norm")(x)

        up9 = PtConvTranspose(128, 4, 2, 1, name="model9_up")(conv8)
        short9 = PtConv(128, 3, 1, 1, name="model2short9")(conv2)
        x = nn.relu(up9 + short9)
        x = PtConv(128, 3, 1, 1, name="model9_conv1")(x)
        x = nn.relu(x)
        conv9 = BatchNormInference(128, name="model9_norm")(x)

        up10 = PtConvTranspose(128, 4, 2, 1, name="model10_up")(conv9)
        short10 = PtConv(128, 3, 1, 1, name="model1short10")(conv1)
        x = nn.relu(up10 + short10)
        x = PtConv(128, 3, 1, 1, name="model10_conv1")(x)
        x = nn.leaky_relu(x, negative_slope=0.2)
        out = PtConv(2, 1, 1, 0, name="model_out")(x)
        return jnp.tanh(out) * AB_NORM


def init_params(model: nn.Module, input_size: int = 256, seed: int = 0):
    """Initialize a parameter pytree (random — real use loads converted
    torch checkpoints via models.convert)."""
    rng = jax.random.PRNGKey(seed)
    dummy = jnp.zeros((1, input_size, input_size, 1), jnp.float32)
    return model.init(rng, dummy)


def colorize(
    params,
    rgb: jnp.ndarray,
    model: nn.Module,
    input_size: int = 256,
) -> jnp.ndarray:
    """Full driver: RGB (B,H,W,3) [0,1] -> colorized RGB.

    Mirrors ModelColorization.picture_colorization / preprocess_img +
    postprocess_tens: L at original res, model at ``input_size`` squared,
    predicted ab upsampled back and joined with the original L.
    """
    h, w = rgb.shape[-3], rgb.shape[-2]
    lab = rgb_to_lab(rgb)
    l_orig = lab[..., 0:1]
    # the reference resizes the RGB image FIRST (PIL bicubic) and takes the
    # LAB of the result (colorizers/util.py preprocess_img:25-33)
    rgb_rs = jnp.clip(resize(rgb, input_size, input_size, "bicubic"), 0.0, 1.0)
    l_rs = rgb_to_lab(rgb_rs)[..., 0:1]
    ab = model.apply(params, l_rs)
    ab_up = resize(ab, h, w, "bilinear")
    out = lab_to_rgb(jnp.concatenate([l_orig, ab_up], axis=-1))
    return jnp.clip(out, 0.0, 1.0)
