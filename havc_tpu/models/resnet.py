"""torchvision-style ResNet bodies in Flax (NHWC, inference form).

Used as:
* DeOldify encoder bodies — resnet101 (Video/Stable, DynamicUnetWide) and
  resnet34 (Artistic, DynamicUnetDeep); fastai's ``create_body`` cuts off
  avgpool/fc, and the U-Net hooks the activations right before each spatial
  downsampling (reference: deoldify/generators.py:12-80,
  fastai/vision/learner.py create_body).
* ColorMNet key encoder — resnet50 f4/f8/f16 features
  (reference: colormnet/model/resnet.py:211-246).

``ResNetBody.__call__`` therefore returns the five stage activations
``(relu, layer1, layer2, layer3, layer4)`` at strides 2/4/8/16/32 — the
exact hook points the downstream models consume.

BatchNorms are inference-form (folded running stats, models/layers.py).
"""
from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from .layers import BatchNormInference, PtConv

__all__ = ["ResNetBody", "RESNET_CONFIGS"]

RESNET_CONFIGS = {
    # dev/test scale (not a published geometry)
    "nano": dict(block="basic", layers=(1, 1, 1, 1), stem_features=16),
    "resnet18": dict(block="basic", layers=(2, 2, 2, 2)),
    "resnet34": dict(block="basic", layers=(3, 4, 6, 3)),
    "resnet50": dict(block="bottleneck", layers=(3, 4, 6, 3)),
    "resnet101": dict(block="bottleneck", layers=(3, 4, 23, 3)),
}


class BasicBlock(nn.Module):
    features: int
    stride: int = 1
    downsample: bool = False

    @nn.compact
    def __call__(self, x):
        identity = x
        out = PtConv(self.features, 3, self.stride, 1, use_bias=False, name="conv1")(x)
        out = BatchNormInference(self.features, name="bn1")(out)
        out = nn.relu(out)
        out = PtConv(self.features, 3, 1, 1, use_bias=False, name="conv2")(out)
        out = BatchNormInference(self.features, name="bn2")(out)
        if self.downsample:
            identity = PtConv(
                self.features, 1, self.stride, 0, use_bias=False, name="down_conv"
            )(x)
            identity = BatchNormInference(self.features, name="down_bn")(identity)
        return nn.relu(out + identity)


class Bottleneck(nn.Module):
    features: int  # bottleneck width; output is features * 4
    stride: int = 1
    downsample: bool = False
    dilation: int = 1

    @nn.compact
    def __call__(self, x):
        identity = x
        out = PtConv(self.features, 1, 1, 0, use_bias=False, name="conv1")(x)
        out = BatchNormInference(self.features, name="bn1")(out)
        out = nn.relu(out)
        out = PtConv(
            self.features, 3, self.stride, self.dilation,
            dilation=self.dilation, use_bias=False, name="conv2",
        )(out)
        out = BatchNormInference(self.features, name="bn2")(out)
        out = nn.relu(out)
        out = PtConv(self.features * 4, 1, 1, 0, use_bias=False, name="conv3")(out)
        out = BatchNormInference(self.features * 4, name="bn3")(out)
        if self.downsample:
            identity = PtConv(
                self.features * 4, 1, self.stride, 0, use_bias=False,
                name="down_conv",
            )(x)
            identity = BatchNormInference(self.features * 4, name="down_bn")(identity)
        return nn.relu(out + identity)


def _max_pool_3x3_s2(x):
    """torch MaxPool2d(3, stride=2, padding=1)."""
    return nn.max_pool(
        x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1))
    )


class ResNetBody(nn.Module):
    """Headless ResNet returning all stage activations.

    ``in_features`` lets callers widen the stem input (e.g. ColorMNet's
    value encoder feeds extra channels).
    """

    block: str = "bottleneck"
    layers: Sequence[int] = (3, 4, 23, 3)
    stem_features: int = 64
    # ColorMNet's encoders keep only conv1..layer3 (modules.py:105-170) —
    # building layer4 would both waste FLOPs and create params absent from
    # checkpoints
    num_stages: int = 4

    @nn.compact
    def __call__(self, x) -> Tuple[jnp.ndarray, ...]:
        x = PtConv(self.stem_features, 7, 2, 3, use_bias=False, name="conv1")(x)
        x = BatchNormInference(self.stem_features, name="bn1")(x)
        relu_out = nn.relu(x)  # stride 2
        x = _max_pool_3x3_s2(relu_out)

        Block = BasicBlock if self.block == "basic" else Bottleneck
        expansion = 1 if self.block == "basic" else 4
        feats = []
        in_ch = self.stem_features
        for stage, n_blocks in enumerate(self.layers[: self.num_stages]):
            width = self.stem_features * (2**stage)
            stride = 1 if stage == 0 else 2
            out_ch = width * expansion
            for b in range(n_blocks):
                x = Block(
                    width,
                    stride=stride if b == 0 else 1,
                    downsample=(b == 0 and (stride != 1 or in_ch != out_ch)),
                    name=f"layer{stage + 1}_block{b}",
                )(x)
            in_ch = out_ch
            feats.append(x)
        return (relu_out, *feats)

    @staticmethod
    def from_config(name: str, num_stages: int = 4) -> "ResNetBody":
        return ResNetBody(**RESNET_CONFIGS[name], num_stages=num_stages)
