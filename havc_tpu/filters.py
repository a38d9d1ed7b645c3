"""Clip-level filters: batched analogs of vsslib/vsfilters.py.

Each function maps ``(T, H, W, 3)`` RGB [0,1] frames; scene-change gating
(the reference's per-frame ``_SceneChangePrev`` early-returns) is handled by
the callers (api layer) which colorize/filter only flagged frames via
index gather/scatter — computing *only* the needed frames instead of the
reference's "skip inside the callback" pattern.

Reference: vsdeoldify/vsslib/vsfilters.py:520-700 (dark tweak, chroma
bright tweak, colormap, constrained tweak), vsfilters.py:863-899
(recover_clip_luma), __init__.py:3545-3560 (_clip_chroma_resize).
"""
from __future__ import annotations

import jax.numpy as jnp

from .ops.chroma import (
    chroma_tweak,
    luma_adjusted_levels,
    tweak,
)
from .ops.colorspace import copy_chroma, luma, rgb_to_yuv, yuv_to_rgb
from .ops.merge import luma_masked_merge, w_luma_masked_merge
from .ops.resize import resize

__all__ = [
    "dark_tweak",
    "chroma_bright_tweak",
    "colormap_filter",
    "constrained_tweak",
    "recover_clip_luma",
    "chroma_resize_restore",
]


def dark_tweak(
    x: jnp.ndarray,
    dark_threshold: float = 0.3,
    dark_amount: float = 0.8,
    dark_hue_adjust: str = "none",
) -> jnp.ndarray:
    """Darken + desaturate dark regions (vs_sc_dark_tweak:609-636).

    Derived params follow the reference: white limit clamps dark_threshold
    to [0.1, 0.5], sat = 1.1-amount in [0.1, 0.8], bright = -amount.
    """
    d_threshold = 0.1
    d_white = min(max(dark_threshold, d_threshold), 0.50)
    d_sat = min(max(1.1 - dark_amount, 0.10), 0.80)
    d_bright = -min(max(dark_amount, 0.20), 0.90)
    dark_img = tweak(x, bright=d_bright, sat=d_sat)
    if dark_hue_adjust not in ("none", ""):
        from .ops.chroma import adjust_hue_range

        dark_img = adjust_hue_range(dark_img, dark_hue_adjust)
    if d_threshold == d_white:
        return luma_masked_merge(dark_img, x, d_threshold)
    return w_luma_masked_merge(dark_img, x, d_threshold, d_white)


def chroma_bright_tweak(
    x: jnp.ndarray,
    black_threshold: float = 0.3,
    white_threshold: float = 0.6,
    dark_sat: float = 0.8,
    dark_bright: float = -0.10,
    chroma_adjust: str = "none",
) -> jnp.ndarray:
    """Luma-gradient saturation smoothing (vs_sc_chroma_bright_tweak:525)."""
    dark_img = chroma_tweak(x, sat=dark_sat, bright=dark_bright, hue_adjust=chroma_adjust)
    if black_threshold == white_threshold:
        return luma_masked_merge(dark_img, x, black_threshold)
    return w_luma_masked_merge(dark_img, x, black_threshold, white_threshold)


def colormap_filter(x: jnp.ndarray, colormap_adjust: str = "none") -> jnp.ndarray:
    """Direct hue color mapping (vs_sc_colormap:567)."""
    if colormap_adjust in ("none", ""):
        return x
    return chroma_tweak(x, hue_adjust=colormap_adjust)


def constrained_tweak(
    x: jnp.ndarray,
    luma_min: float = 0.1,
    gamma: float = 1.0,
    gamma_luma_min: float = 0.0,
    gamma_alpha: float = 0.0,
    gamma_min: float = 0.5,
) -> jnp.ndarray:
    """Luma-constrained gamma (sc_constrained_tweak:656-680)."""
    return luma_adjusted_levels(
        x, luma_min, gamma, gamma_luma_min, gamma_alpha, gamma_min
    )


def recover_clip_luma(hires: jnp.ndarray, colored: jnp.ndarray) -> jnp.ndarray:
    """Copy chroma of ``colored`` onto luma of ``hires``
    (vs_recover_clip_luma:863-899)."""
    return jnp.clip(copy_chroma(colored, hires), 0.0, 1.0)


def recover_clip_luma_y(y: jnp.ndarray, colored: jnp.ndarray) -> jnp.ndarray:
    """``recover_clip_luma`` taking the precomputed luma plane (..., H, W)
    instead of an RGB clip — identical output, 3x less memory for callers
    that buffer the luma source (streaming's rolling full-res buffer)."""
    yuv = rgb_to_yuv(colored)
    return jnp.clip(
        yuv_to_rgb(jnp.stack([y, yuv[..., 1], yuv[..., 2]], axis=-1)),
        0.0, 1.0,
    )


def chroma_resize_restore(hires: jnp.ndarray, lowres: jnp.ndarray) -> jnp.ndarray:
    """Spline64 upscale + luma copy-back (_clip_chroma_resize:3545)."""
    h, w = hires.shape[-3], hires.shape[-2]
    up = resize(lowres, h, w, "spline64")
    return recover_clip_luma(hires, up)
