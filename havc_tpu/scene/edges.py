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


@jax.jit
def _edge_kernel(gray_small: jnp.ndarray):
    edges = kirsch_edges(gray_small)
    mag = sobel_magnitude(gray_small)
    mask = jnp.maximum(edges, (mag > 0.25).astype(gray_small.dtype))
    mask = _temporal_median3(mask)
    density = mask.mean(axis=(-2, -1))
    # edge-change ratio vs previous frame: new + vanished edges
    t = mask.shape[0]
    prev = mask[jnp.clip(jnp.arange(t) - 1, 0, t - 1)]
    changed = jnp.abs(mask - prev).mean(axis=(-2, -1))
    ecr = changed / jnp.maximum(jnp.maximum(density, density[jnp.clip(jnp.arange(t) - 1, 0, t - 1)]), 1e-4)
    lumas = gray_small.mean(axis=(-2, -1))
    return mask, density, ecr, lumas


def edge_stats(frames: np.ndarray):
    """Device phase: downscale luma, edge masks, density, edge-change ratio."""
    x = jnp.asarray(frames)
    gray = luma(x)
    h, w = gray.shape[-2], gray.shape[-1]
    nh, nw = _work_size(h, w)
    gray_small = resize(gray[..., None], nh, nw, "bicubic")[..., 0]
    mask, density, ecr, lumas = _edge_kernel(gray_small)
    return (
        np.asarray(gray_small), np.asarray(mask), np.asarray(density),
        np.asarray(ecr), np.asarray(lumas),
    )


def scene_detect_edges(
    frames: np.ndarray,
    threshold: float = 0.5,
    min_length: int = 1,
    tht_white: float = DEF_THT_WHITE,
    tht_black: float = DEF_THT_BLACK,
    sc_tht_ssim: float = 0.0,
) -> SceneFlags:
    """Edge-change-ratio detector with luma gates + optional SSIM filter
    (vsscdetect_edge.vs_edge_based_scenedetect:140 semantics)."""
    T = len(frames)
    grays, mask, density, ecr, lumas = edge_stats(frames)

    sc = np.zeros(T, dtype=np.int8)
    last_ref = None
    prev_gray = None
    for n in range(T):
        f_luma = float(lumas[n])
        if n == 0 or last_ref is None:
            accept = True
        elif n - last_ref < min_length:
            accept = False
        else:
            accept = float(ecr[n]) > threshold
            accept = accept and (tht_black < f_luma < tht_white)
            if accept and 0.0 < sc_tht_ssim < 1.0 and prev_gray is not None:
                accept = _ssim_uniform(grays[n], prev_gray) < sc_tht_ssim
        if accept:
            sc[n] = 1
            last_ref = n
            prev_gray = grays[n]
    return SceneFlags(
        sc_prev=sc,
        sc_next=np.zeros(T, dtype=np.int8),
        luma=lumas.astype(np.float32),
        ratio=ecr.astype(np.float32),
        threshold=threshold,
    )
