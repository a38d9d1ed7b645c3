"""Multi-scale retinex (MSR / MSRCP) kernels.

TPU-native rebuild of the reference's Retinex path (reference:
vsdeoldify/vsslib/vsretinex.py:25-164 — MSRCP plugin "fast" path and a
pure-Python MSR "slow" path; used by rgb_equalizer method 5 and the
``retinex/red`` ColorFix mode).

Design: the heavy op is a large-sigma Gaussian blur at several scales
(classic MSR sigmas 25/80/250).  A direct separable conv with 3-sigma taps
is bandwidth-hostile at sigma 250, so each Gaussian is approximated by three
iterated box filters (Kovesi's method) computed with cumulative sums —
O(N) per scale, fully fused by XLA, no gathers.
"""
from __future__ import annotations

import math

import jax.numpy as jnp

from .colorspace import luma

__all__ = ["gaussian_blur_box", "msr", "msr_luma", "msrcp"]


def _box_filter_1d(x: jnp.ndarray, radius: int, axis: int) -> jnp.ndarray:
    """Mean filter of width 2*radius+1 along ``axis`` via cumsum, edge-padded."""
    if radius <= 0:
        return x
    n = x.shape[axis]
    pad = [(0, 0)] * x.ndim
    pad[axis] = (radius + 1, radius)
    xp = jnp.pad(x, pad, mode="edge")
    c = jnp.cumsum(xp, axis=axis)
    hi = jnp.take(c, jnp.arange(n) + 2 * radius + 1, axis=axis)
    lo = jnp.take(c, jnp.arange(n), axis=axis)
    return (hi - lo) / (2 * radius + 1)


def _box_radius_for_sigma(sigma: float, passes: int = 3) -> int:
    # ideal box width for iterated-box gaussian approximation
    w = math.sqrt(12.0 * sigma * sigma / passes + 1.0)
    r = int((w - 1) / 2)
    return max(r, 1)


def gaussian_blur_box(x: jnp.ndarray, sigma: float, passes: int = 3) -> jnp.ndarray:
    """Approximate Gaussian blur of ``(..., H, W)`` by iterated box filters."""
    r = _box_radius_for_sigma(sigma, passes)
    out = x
    for _ in range(passes):
        out = _box_filter_1d(out, r, axis=-2)
        out = _box_filter_1d(out, r, axis=-1)
    return out


def msr(
    intensity: jnp.ndarray, sigmas=(25.0, 80.0, 250.0),
    lower_thr: float = 0.001, upper_thr: float = 0.001,
) -> jnp.ndarray:
    """Multi-scale retinex of a single-channel image ``(..., H, W)`` in [0,1].

    ``MSR = mean_k [ log(I+1') - log(G_k * I + 1') ]`` followed by the
    MSRCP "simplest color balance": clip the lower/upper histogram tails
    (plugin lower_thr/upper_thr quantiles, vsretinex.py:60 passes 0.001)
    and stretch to [0,1].
    """
    eps = 1.0 / 255.0
    log_i = jnp.log(intensity + eps)
    acc = jnp.zeros_like(intensity)
    for s in sigmas:
        blurred = gaussian_blur_box(intensity, s)
        acc = acc + (log_i - jnp.log(blurred + eps))
    out = acc / len(sigmas)
    lo = jnp.quantile(
        out.reshape(out.shape[:-2] + (-1,)), lower_thr, axis=-1
    )[..., None, None]
    hi = jnp.quantile(
        out.reshape(out.shape[:-2] + (-1,)), 1.0 - upper_thr, axis=-1
    )[..., None, None]
    return jnp.clip((out - lo) / jnp.maximum(hi - lo, 1e-6), 0.0, 1.0)


def msrcp_rgb(
    rgb: jnp.ndarray, sigmas=(25.0, 80.0, 250.0),
    lower_thr: float = 0.001, upper_thr: float = 0.001,
) -> jnp.ndarray:
    """MSRCP on an RGB image — the Retinex plugin's RGB path
    (retinex.MSRCP as called by vs_retinex_fast, vsretinex.py:59-62).

    Chromaticity preservation: intensity I = (R+G+B)/3 is MSR-enhanced
    and balance-stretched, then each pixel's channels are scaled by the
    SAME gain ``I_out / I_in``, capped so the largest channel reaches at
    most 1.0 (hue preserved instead of clipped).  ``chroma_protect``
    applies only to YUV-format plugin input, which the reference never
    feeds (vs_retinex converts to RGB24 first, vsretinex.py:32-39).
    """
    inten = jnp.mean(rgb, axis=-1)
    enhanced = msr(inten, sigmas, lower_thr, upper_thr)
    eps = 1.0 / 255.0
    gain = enhanced / jnp.maximum(inten, eps)
    peak = jnp.max(rgb, axis=-1)
    gain = jnp.minimum(gain, 1.0 / jnp.maximum(peak, eps))
    return jnp.clip(rgb * gain[..., None], 0.0, 1.0)


def msr_yuv(
    rgb: jnp.ndarray, sigmas=(25.0, 80.0, 250.0), range_tv: bool = False
) -> jnp.ndarray:
    """The reference's pure-Python "slow" path (vs_retinex_slow,
    vsretinex.py:90-164): MSR on the Y plane only, min-max normalized to
    the output range, chroma untouched."""
    from .colorspace import rgb_to_yuv, yuv_to_rgb

    yuv = rgb_to_yuv(rgb)
    y = yuv[..., 0]
    eps = 1.0 / 255.0
    log_i = jnp.log(y + eps)
    acc = jnp.zeros_like(y)
    for s in sigmas:
        acc = acc + (log_i - jnp.log(gaussian_blur_box(y, s) + eps))
    out = acc / len(sigmas)
    lo = jnp.min(out, axis=(-2, -1), keepdims=True)
    hi = jnp.max(out, axis=(-2, -1), keepdims=True)
    mn, mx = (16.0 / 255.0, 235.0 / 255.0) if range_tv else (0.0, 1.0)
    y_norm = (out - lo) / jnp.maximum(hi - lo, 1e-6) * (mx - mn) + mn
    out_yuv = yuv.at[..., 0].set(jnp.clip(y_norm, mn, mx))
    return jnp.clip(yuv_to_rgb(out_yuv), 0.0, 1.0)


def _luma_blend(orig, new, f_luma, luma_limit=0.40, alpha=0.90,
                min_w=0.25, decay=3.0):
    """image_luma_blend (imfilters.py:612-624): dark frames keep a share
    of the original; weight ramps with (luma/limit)^decay."""
    bright_scale = jnp.clip((f_luma / luma_limit) ** decay, 0.0, 1.0)
    w = jnp.maximum(alpha * bright_scale, min_w)
    w = jnp.where(f_luma < luma_limit, w, 1.0)
    return orig * (1.0 - w[..., None, None, None]) + new * w[..., None, None, None]


def retinex_filter(
    rgb: jnp.ndarray,  # (T, H, W, 3) or (H, W, 3), [0,1]
    luma_dark: float = 0.20,
    luma_bright: float = 0.80,
    sigmas=(25.0, 80.0, 250.0),
    range_tv: bool = True,
    blend: bool = False,
    fast_mode: bool = True,
) -> jnp.ndarray:
    """The patched Retinex wrapper (vs_retinex / filter_retinex,
    vsretinex.py:26-95): MSRCP (fast) or MSR-on-Y (slow), applied only to
    frames whose mean luma falls within [luma_dark, luma_bright] (dark and
    bright frames pass through to avoid artifacts), with an optional
    dark-frame blend ramp."""
    single = rgb.ndim == 3
    if single:
        rgb = rgb[None]
    y = luma(rgb)
    if range_tv:
        f_luma = jnp.maximum(jnp.mean(y, axis=(-2, -1)) / (235.0 / 255.0)
                             - 0.07, 0.0)
    else:
        f_luma = jnp.mean(y, axis=(-2, -1))
    filt = msrcp_rgb(rgb, sigmas) if fast_mode else msr_yuv(
        rgb, sigmas, range_tv=not range_tv
    )
    if blend:
        min_w, decay = (0.25, 3.0) if fast_mode else (0.15, 4.0)
        filt = _luma_blend(rgb, filt, f_luma, 0.40, 0.90, min_w, decay)
    in_range = jnp.logical_and(f_luma >= luma_dark, f_luma <= luma_bright)
    out = jnp.where(in_range[..., None, None, None], filt, rgb)
    return out[0] if single else out


# back-compat alias (pre-round-3 name for the chroma-preserving path)
def msr_luma(rgb, sigmas=(25.0, 80.0, 250.0), chroma_protect=None):
    return msrcp_rgb(rgb, sigmas)


msrcp = msrcp_rgb
