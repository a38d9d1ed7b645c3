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
    intensity: jnp.ndarray, sigmas=(25.0, 80.0, 250.0)
) -> jnp.ndarray:
    """Multi-scale retinex of a single-channel image ``(..., H, W)`` in [0,1].

    ``MSR = mean_k [ log(I) - log(G_k * I) ]`` followed by a per-frame
    1%/99% percentile stretch back to [0,1] (the MSRCP "simplest color
    balance" step).
    """
    eps = 1.0 / 255.0
    log_i = jnp.log(intensity + eps)
    acc = jnp.zeros_like(intensity)
    for s in sigmas:
        blurred = gaussian_blur_box(intensity, s)
        acc = acc + (log_i - jnp.log(blurred + eps))
    out = acc / len(sigmas)
    # MSRCP "simplest color balance" stretch; the reference plugin call
    # uses lower_thr=upper_thr=0.001 (vsretinex.py:60)
    lo = jnp.percentile(out, 0.1, axis=(-2, -1), keepdims=True)
    hi = jnp.percentile(out, 99.9, axis=(-2, -1), keepdims=True)
    return jnp.clip((out - lo) / jnp.maximum(hi - lo, 1e-6), 0.0, 1.0)


def msr_luma(
    rgb: jnp.ndarray, sigmas=(25.0, 80.0, 250.0),
    chroma_protect: float = 1.2,
) -> jnp.ndarray:
    """MSR on the intensity channel with chroma-preserving rescale (MSRCP,
    the plugin path of vsretinex.py:59-62 with chroma_protect=1.2).

    Each RGB pixel is scaled by ``MSR(I)/I`` so hue/saturation ratios are
    preserved; ``chroma_protect`` > 1 damps the chroma amplification
    logarithmically (large intensity gains otherwise oversaturate):
    the chroma offsets around the intensity are scaled by
    ``log(1 + (g-1)*p) / log(p)``-style compression instead of g itself.
    """
    inten = luma(rgb)
    enhanced = msr(inten, sigmas)
    gain = enhanced / jnp.maximum(inten, 1.0 / 255.0)
    # bound the gain to avoid blowing up dark pixels
    gain = jnp.clip(gain, 0.0, 4.0)
    if chroma_protect and chroma_protect > 1.0:
        p = float(chroma_protect)
        cgain = jnp.where(
            gain > 1.0,
            1.0 + jnp.log1p((gain - 1.0) * p) / math.log(1.0 + p),
            gain,
        )
    else:
        cgain = gain
    # decompose into intensity + chroma offsets; amplify offsets with the
    # protected gain, intensity with the full gain
    offs = rgb - inten[..., None]
    out = enhanced[..., None] + offs * cgain[..., None]
    return jnp.clip(out, 0.0, 1.0)


# alias matching the reference's naming
msrcp = msr_luma
