"""Common Flax building blocks with torch-compatible semantics.

The five model families re-implemented in this package were published as
PyTorch models; to load their released weights we need layers whose math
matches torch's exactly (padding rules, transposed-conv geometry, batch-norm
inference form).  Everything is NHWC (TPU-native); the weight converter
(convert.py) handles OIHW->HWIO transposition.
"""
from __future__ import annotations

from typing import Callable, Sequence

import flax.linen as nn
import jax.numpy as jnp

__all__ = [
    "PtConv",
    "PtConvTranspose",
    "BatchNormInference",
    "resize_bilinear",
    "leaky_relu",
    "sigmoid_range",
]


class PtConv(nn.Module):
    """Conv2d with torch semantics: explicit symmetric padding, dilation.

    torch ``Conv2d(cin, cout, k, stride=s, padding=p, dilation=d)``.
    """

    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 0
    dilation: int = 1
    use_bias: bool = True
    groups: int = 1

    @nn.compact
    def __call__(self, x):
        return nn.Conv(
            features=self.features,
            kernel_size=(self.kernel_size, self.kernel_size),
            strides=(self.stride, self.stride),
            padding=((self.padding, self.padding), (self.padding, self.padding)),
            kernel_dilation=(self.dilation, self.dilation),
            use_bias=self.use_bias,
            feature_group_count=self.groups,
            dtype=x.dtype,
        )(x)


class PtConvTranspose(nn.Module):
    """ConvTranspose2d with torch semantics (k=4, s=2, p=1 -> exact 2x).

    torch output size: ``(in-1)*s - 2p + k``.  flax's ConvTranspose with
    ``transpose_kernel=True`` plus padding ``k-1-p`` on the dilated input
    reproduces torch exactly; the converter stores weights accordingly.
    """

    features: int
    kernel_size: int = 4
    stride: int = 2
    padding: int = 1
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        p = self.kernel_size - 1 - self.padding
        return nn.ConvTranspose(
            features=self.features,
            kernel_size=(self.kernel_size, self.kernel_size),
            strides=(self.stride, self.stride),
            padding=((p, p), (p, p)),
            transpose_kernel=True,
            use_bias=self.use_bias,
            dtype=x.dtype,
        )(x)


class BatchNormInference(nn.Module):
    """BatchNorm2d in inference form: y = (x - mean) / sqrt(var+eps) * g + b.

    Running statistics are plain parameters here (no mutable state) since
    all engines are inference-only; the converter folds torch's
    running_mean/var into ``mean``/``var``.
    """

    features: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = self.param("mean", nn.initializers.zeros, (self.features,))
        var = self.param("var", nn.initializers.ones, (self.features,))
        inv = jnp.asarray(scale, x.dtype) * jnp.asarray(
            1.0 / jnp.sqrt(var + self.eps), x.dtype
        )
        return x * inv + jnp.asarray(bias - mean * scale / jnp.sqrt(var + self.eps), x.dtype)


def resize_bilinear(x: jnp.ndarray, scale: int) -> jnp.ndarray:
    """torch ``nn.Upsample(scale_factor=s, mode='bilinear')`` with
    align_corners=False semantics via jax.image.resize."""
    import jax

    b, h, w, c = x.shape
    return jax.image.resize(x, (b, h * scale, w * scale, c), method="bilinear")


def leaky_relu(x, negative_slope=0.2):
    return jnp.where(x >= 0, x, x * negative_slope)


def sigmoid_range(x, lo, hi):
    """fastai SigmoidRange: sigmoid scaled to (lo, hi)."""
    return nn.sigmoid(x) * (hi - lo) + lo
