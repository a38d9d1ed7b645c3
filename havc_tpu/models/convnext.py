"""ConvNeXt backbone (encoder of DDColor) in Flax, NHWC.

The reference consumes DDColor through the external ``vsddcolor`` wheel
(reference: vsdeoldify/vsslib/vsmodels.py:290-374 calls ``vsddcolor.ddcolor``
with RGBH/RGBS input and ``input_size=trunc(rf/2)*32``); the underlying
model is upstream DDColor: a ConvNeXt encoder + color-query transformer
decoder.  This is a from-scratch NHWC ConvNeXt matching the standard
published architecture (depthwise 7x7 -> LN -> pw 4x MLP -> gamma scale,
stage downsample convs), sized by the usual depth/dim configs.

TPU notes: depthwise 7x7 convs map to the VPU; the 1x1 MLPs dominate FLOPs
and hit the MXU.  bf16-friendly (LayerNorm in f32 via dtype promotion).
"""
from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

__all__ = ["ConvNeXt", "CONVNEXT_CONFIGS"]

CONVNEXT_CONFIGS = {
    # "micro" is a test/dev config (not a published checkpoint size)
    "micro": dict(depths=(1, 1, 2, 1), dims=(32, 64, 128, 256)),
    "tiny": dict(depths=(3, 3, 9, 3), dims=(96, 192, 384, 768)),
    "small": dict(depths=(3, 3, 27, 3), dims=(96, 192, 384, 768)),
    "base": dict(depths=(3, 3, 27, 3), dims=(128, 256, 512, 1024)),
    "large": dict(depths=(3, 3, 27, 3), dims=(192, 384, 768, 1536)),
}


class ConvNeXtBlock(nn.Module):
    """dw7x7 -> LN -> pw(4x) -> GELU -> pw -> layer-scale -> residual."""

    dim: int
    layer_scale_init: float = 1e-6

    @nn.compact
    def __call__(self, x):
        inp = x
        x = nn.Conv(
            self.dim, (7, 7), padding=((3, 3), (3, 3)),
            feature_group_count=self.dim, name="dwconv", dtype=x.dtype,
        )(x)
        x = nn.LayerNorm(epsilon=1e-6, name="norm")(x)
        x = nn.Dense(4 * self.dim, name="pwconv1", dtype=x.dtype)(x)
        x = nn.gelu(x, approximate=False)  # torch nn.GELU default is erf
        x = nn.Dense(self.dim, name="pwconv2", dtype=x.dtype)(x)
        gamma = self.param(
            "gamma",
            nn.initializers.constant(self.layer_scale_init),
            (self.dim,),
        )
        return inp + x * jnp.asarray(gamma, x.dtype)


class ConvNeXt(nn.Module):
    """Returns the four stage features (1/4, 1/8, 1/16, 1/32), NHWC.

    ``out_norms=True`` applies the per-stage output LayerNorms (norm0..3)
    that DDColor's Encoder hooks (upstream convnext.py out_indices) — the
    decoder consumes NORMED stage features.
    """

    depths: Sequence[int] = (3, 3, 9, 3)
    dims: Sequence[int] = (96, 192, 384, 768)
    out_norms: bool = False

    @nn.compact
    def __call__(self, x) -> Tuple[jnp.ndarray, ...]:
        feats = []
        # stem: 4x4 stride-4 conv + LN
        x = nn.Conv(self.dims[0], (4, 4), strides=(4, 4), name="stem_conv",
                    dtype=x.dtype)(x)
        x = nn.LayerNorm(epsilon=1e-6, name="stem_norm")(x)
        for stage in range(4):
            if stage > 0:
                x = nn.LayerNorm(epsilon=1e-6, name=f"down{stage}_norm")(x)
                x = nn.Conv(
                    self.dims[stage], (2, 2), strides=(2, 2),
                    name=f"down{stage}_conv", dtype=x.dtype,
                )(x)
            for blk in range(self.depths[stage]):
                x = ConvNeXtBlock(
                    self.dims[stage], name=f"stage{stage}_block{blk}"
                )(x)
            if self.out_norms:
                feats.append(
                    nn.LayerNorm(epsilon=1e-6, name=f"out_norm{stage}")(x)
                )
            else:
                feats.append(x)
        return tuple(feats)
