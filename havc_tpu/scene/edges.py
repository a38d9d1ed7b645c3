"""Edge-based scene detection.

Rebuild of the reference's edge detector (reference:
vsdeoldify/vsslib/vsscdetect_edge.py:32-503 ``SceneDetectEdges``:
Kirsch + TCanny + Retinex edge masks, temporal median, edge-diff ratio
detector with multi-threshold reasons and an SSIM confirmation filter).

Device phase (jnp): Kirsch 8-direction compass edges + Sobel gradient
magnitude over downscaled luma, temporal median-of-3, per-frame edge
histograms/counts.  Host phase: the sequential edge-change-ratio decision
loop with the same gates as the luma detector.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from ..ops.colorspace import luma
from ..ops.resize import resize
from .detect import (
    DEF_THT_BLACK,
    DEF_THT_WHITE,
    SceneFlags,
    _ssim_uniform,
    _work_size,
)

__all__ = ["edge_stats", "scene_detect_edges", "kirsch_edges", "sobel_magnitude"]

# The 8 Kirsch compass kernels (3x3), max response taken.
_KIRSCH = np.array(
    [
        [[5, 5, 5], [-3, 0, -3], [-3, -3, -3]],
        [[5, 5, -3], [5, 0, -3], [-3, -3, -3]],
        [[5, -3, -3], [5, 0, -3], [5, -3, -3]],
        [[-3, -3, -3], [5, 0, -3], [5, 5, -3]],
        [[-3, -3, -3], [-3, 0, -3], [5, 5, 5]],
        [[-3, -3, -3], [-3, 0, 5], [-3, 5, 5]],
        [[-3, -3, 5], [-3, 0, 5], [-3, -3, 5]],
        [[-3, 5, 5], [-3, 0, 5], [-3, -3, -3]],
    ],
    dtype=np.float32,
)


def _conv2d(x: jnp.ndarray, k: np.ndarray) -> jnp.ndarray:
    """(T, H, W) conv with a stack of (N, 3, 3) kernels -> (T, N, H, W)."""
    t = x.shape[0]
    xin = jnp.pad(x[:, None], ((0, 0), (0, 0), (1, 1), (1, 1)), mode="edge")
    kern = jnp.asarray(k)[:, None]  # (N,1,3,3)
    return lax.conv_general_dilated(xin, kern, (1, 1), "VALID")


def kirsch_edges(gray: jnp.ndarray, thresh: float = 0.25) -> jnp.ndarray:
    """Kirsch compass edge mask over (T, H, W) luma in [0,1]
    (vsscdetect_edge.kirsch:114)."""
    resp = _conv2d(gray, _KIRSCH)  # (T,8,H,W)
    mag = jnp.max(resp, axis=1) / 15.0  # normalize by max kernel gain
    return (mag > thresh).astype(gray.dtype)


def _to_gray709_limited(rgb: jnp.ndarray) -> jnp.ndarray:
    """The reference's GRAY8 conversion (vsscdetect_edge.py:169:
    resize.Bicubic(format=GRAY8, matrix_s='709')): BT.709 luma mapped to
    LIMITED range [16/255, 235/255] — the range the uint8 statistics and
    luma gates are computed in."""
    y = (0.2126 * rgb[..., 0] + 0.7152 * rgb[..., 1] + 0.0722 * rgb[..., 2])
    return y * (219.0 / 255.0) + 16.0 / 255.0


_SOBEL_X = np.array([[[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]]], np.float32)
_SOBEL_Y = np.array([[[-1, -2, -1], [0, 0, 0], [1, 2, 1]]], np.float32)


def sobel_magnitude(gray: jnp.ndarray) -> jnp.ndarray:
    """Gradient magnitude (the TCanny-role edge strength)."""
    gx = _conv2d(gray, _SOBEL_X)[:, 0]
    gy = _conv2d(gray, _SOBEL_Y)[:, 0]
    return jnp.hypot(gx, gy) / 5.66  # normalize to ~[0,1]


def _temporal_median3(x: jnp.ndarray) -> jnp.ndarray:
    """Median of (prev, cur, next) along T (zsmooth TemporalMedian role)."""
    t = x.shape[0]
    prev = x[jnp.clip(jnp.arange(t) - 1, 0, t - 1)]
    nxt = jnp.clip(jnp.arange(t) + 1, 0, t - 1)
    nxt = x[nxt]
    return jnp.clip(
        jnp.minimum(jnp.maximum(jnp.minimum(prev, x), jnp.minimum(x, nxt)),
                    jnp.maximum(prev, nxt)),
        0.0, 1.0,
    )


def _gaussian_blur_small(x: jnp.ndarray, sigma: float = 1.2) -> jnp.ndarray:
    """Small-sigma separable Gaussian for the TCanny-role pre-blur."""
    r = max(int(3 * sigma), 1)
    t = np.arange(-r, r + 1, dtype=np.float32)
    k = np.exp(-(t**2) / (2 * sigma * sigma))
    k /= k.sum()
    kx = jnp.asarray(k)[None, None, None, :]
    ky = jnp.asarray(k)[None, None, :, None]
    xin = jnp.pad(x[:, None], ((0, 0), (0, 0), (r, r), (r, r)), mode="edge")
    out = lax.conv_general_dilated(xin, ky, (1, 1), "VALID")
    out = lax.conv_general_dilated(out, kx, (1, 1), "VALID")
    return out[:, 0]


def retinex_edgemask_draft(gray: jnp.ndarray, sigma: float = 1.2) -> jnp.ndarray:
    """The edge mask the LIVE edge detector uses
    (vsscdetect_edge.retinex_edgemask:120, called with draft=True at
    :177): sqrt gamma boost -> TCanny(mode=1)-role Gaussian-blurred
    gradient magnitude, summed with the Kirsch compass response and
    clipped.

    VS uint8 semantics preserved: std.Convolution divides by the
    coefficient sum, which is ZERO for the Kirsch kernels -> divisor 1,
    i.e. the response is UNNORMALIZED and saturates at the code ceiling
    (255 in uint8 == 1.0 here) — the mask is near-binary at modest edges.
    The TCanny magnitude likewise saturates instead of being rescaled.
    (The non-draft MSRCP mask exists in the reference but is dead code on
    the live path.)"""
    enhanced = jnp.sqrt(jnp.clip(gray, 0.0, 1.0))
    tcanny = jnp.hypot(
        _conv2d(_gaussian_blur_small(enhanced, sigma), _SOBEL_X)[:, 0],
        _conv2d(_gaussian_blur_small(enhanced, sigma), _SOBEL_Y)[:, 0],
    )
    resp = _conv2d(gray, _KIRSCH)  # (T,8,H,W), saturate=False -> |resp|
    kirsch_mag = jnp.clip(jnp.max(jnp.abs(resp), axis=1), 0.0, 1.0)
    return jnp.clip(kirsch_mag + jnp.clip(tcanny, 0.0, 1.0), 0.0, 1.0)


@jax.jit
def _edge_kernel(gray_small: jnp.ndarray, offset: int = 2):
    t = gray_small.shape[0]
    mask = retinex_edgemask_draft(gray_small)
    nxt = gray_small[jnp.clip(jnp.arange(t) + offset, 0, t - 1)]
    diff = jnp.abs(gray_small - nxt)
    # PlaneStatsAverage of MaskedMerge(blank, diff, mask) == mean(diff*mask)
    edge_diff = 10.0 * (diff * mask).mean(axis=(-2, -1))
    ssim_diff = 4.0 * diff.mean(axis=(-2, -1))
    lumas = gray_small.mean(axis=(-2, -1))
    return mask, edge_diff, ssim_diff, lumas


def edge_stats(frames: np.ndarray, offset: int = 2):
    """Device phase: downscale 709-limited gray (the reference's GRAY8
    working space), draft retinex edge mask, the reference's edge_diff
    (masked) and ssim_diff (plain) statistics."""
    x = jnp.asarray(frames)
    gray = _to_gray709_limited(x)
    h, w = gray.shape[-2], gray.shape[-1]
    nh, nw = _work_size(h, w)
    gray_small = resize(gray[..., None], nh, nw, "spline36")[..., 0]
    mask, edge_diff, ssim_diff, lumas = _edge_kernel(gray_small, offset)
    return (
        np.asarray(gray_small), np.asarray(mask), np.asarray(edge_diff),
        np.asarray(ssim_diff), np.asarray(lumas),
    )


def scene_detect_edges(
    frames: np.ndarray,
    threshold: float = 0.07,
    frequency: int = 0,
    sc_tht_ssim: float = 0.0,
    sc_diff_offset: int = 2,
    sc_min_int: int = 30,
    sc_mult_tht: int = 7,
    tht_white: float = DEF_THT_WHITE,
    tht_black: float = 0.12,
    min_length: int | None = None,  # legacy alias of sc_min_int
) -> SceneFlags:
    """Edge-based detector with the reference's full decision ladder
    (vsscdetect_edge.py:32-260 SceneDetectEdges +
    vs_edge_based_scenedetect): draft retinex edge mask, offset-N frame
    diff, multi-threshold reasons —

    * reason 3/4: the classic luma detector fired (mandatory_ref_1; +4 when
      the edge diff also exceeds ``sc_mult_tht`` x threshold),
    * reason 2: edge diff alone exceeds ``sc_mult_tht`` x threshold
      (mandatory_ref_2),
    * reason 1: both edge_diff > threshold and ssim_diff > 1.75*threshold
      with the ``sc_min_int`` minimum distance,

    all gated to ``tht_black <= luma <= tht_white``, with the repeated-
    mandatory dedup distance ``max(sc_mult_tht*0.5, 3)``.  An optional
    SSIM confirmation pass (``sc_tht_ssim``) drops cuts too similar to the
    previous reference."""
    if min_length is not None:
        sc_min_int = min_length
    T = len(frames)
    sc_mult_tht = 7 if sc_mult_tht == 0 else sc_mult_tht
    sc_diff_offset = max(sc_diff_offset, 1)
    ssim_diff_threshold = round(1.75 * threshold, 5)

    grays, mask, edge_diff, ssim_diff, lumas = edge_stats(frames, sc_diff_offset)

    # mandatory_ref_1: raw misc.SCDetect(threshold=0.10) on the same
    # downscaled gray clip (vsscdetect_edge.py:170) — normalized mean
    # absolute luma difference vs the PREVIOUS frame, no extra gates
    prev_diff = np.abs(
        grays - grays[np.clip(np.arange(T) - 1, 0, T - 1)]
    ).mean(axis=(-2, -1))
    prev_diff[0] = 0.0
    mandatory_1 = prev_diff > 0.10

    sc = np.zeros(T, dtype=np.int8)
    reason = np.zeros(T, dtype=np.int8)
    last_sc = -sc_min_int
    last_status = ""
    prev_ref_gray = None
    min_dist_small = max(int(sc_mult_tht * 0.5), 3)
    for n in range(T):
        if n == 0:
            sc[n] = 1
            reason[n] = 4
            last_sc = 0
            last_status = "tht_max_first"
            prev_ref_gray = grays[n]
            continue
        f_luma = float(lumas[n])
        in_luma = tht_black <= f_luma <= tht_white
        above_tht = (float(edge_diff[n]) > threshold) and (
            float(ssim_diff[n]) > ssim_diff_threshold)
        above_dist_max = (n - last_sc) >= sc_min_int
        above_dist_min = (n - last_sc) >= min_dist_small
        m1 = bool(mandatory_1[n])
        m2 = float(edge_diff[n]) > threshold * sc_mult_tht
        accept = False
        if in_luma:
            if m1:
                if ("tht_max" not in last_status) or above_dist_min:
                    accept = True
                    reason[n] = 4 if m2 else 3
                    last_status = "tht_max+edge_max" if m2 else "tht_max"
            elif m2:
                if ("edge_max" not in last_status) or above_dist_min:
                    accept = True
                    reason[n] = 2
                    last_status = "edge_max"
            elif above_dist_max and above_tht:
                accept = True
                reason[n] = 1
                last_status = "accepted"
        if accept and 0.0 < sc_tht_ssim < 1.0 and prev_ref_gray is not None:
            if _ssim_uniform(grays[n], prev_ref_gray) >= sc_tht_ssim:
                accept = False
                reason[n] = 0
        if accept:
            sc[n] = 1
            last_sc = n
            prev_ref_gray = grays[n]

    if frequency > 1:
        # frequency forcing on top of detection (SceneDetectEdges freq path)
        for n in range(T):
            if n % frequency == 0:
                sc[n] = 1
    return SceneFlags(
        sc_prev=sc,
        sc_next=np.zeros(T, dtype=np.int8),
        luma=lumas.astype(np.float32),
        ratio=edge_diff.astype(np.float32),
        threshold=threshold,
    )
