"""Temporal chroma stabilization + deflicker as time-axis jnp kernels.

TPU-native rebuild of the reference's temporal chain (reference:
vsdeoldify/vsslib/vsfilters.py:38-242 ``vs_chroma_stabilizer_ex`` /
``_average_clips_ex``, imfilters.py:680-705 ``_color_temporal_stabilizer``,
vsplugins.py:263-272 ``vs_reduce_flicker``):

* temporal chroma averaging over a window of up to 15 frames, arithmetic or
  center-weighted, applied to U/V only (luma passes through);
* per-offset gray-pixel color restore: before a shifted frame enters the
  average, its gray pixels are repainted from the *current* frame so
  desaturated frames don't bleach the average (vsfilters.py:216-242);
* scene-change reset: frames on the far side of a scene cut must not leak
  chroma across the cut — handled with a mask built from the scene-change
  flags instead of the reference's ordered frame requests;
* temporal luma deflicker (ReduceFlicker-style).

The reference expresses these as per-frame callbacks over shifted clips; the
TPU design expresses them as one batched kernel over a ``(T, H, W, 3)``
window so the whole thing is one fused XLA program — no sequential state.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .chroma import restore_color
from .colorspace import rgb_to_yuv, yuv_to_rgb_preserve_luma

__all__ = [
    "average_weights",
    "chroma_stabilizer",
    "reduce_flicker",
]


def average_weights(nframes: int, weighted: bool = False) -> np.ndarray:
    """Build the averaging weight vector for a window of ``nframes``.

    Mirrors vsfilters._build_avg_arithmetic / _build_avg_weighted
    (vsfilters.py:118-157): weights are integer percentages summing to 100;
    the weighted variant gives the center frame ~40% and splits the rest
    geometrically over the neighbours.
    """
    nframes = int(nframes)
    assert nframes % 2 == 1 and nframes >= 3
    if not weighted:
        w = np.full(nframes, 100.0 / nframes)
        return (w / w.sum()).astype(np.float32)
    nh = (nframes - 1) // 2
    # center gets weight proportional to 2**nh, neighbours decay by half
    center = 2.0 ** nh
    side = [2.0 ** (nh - 1 - abs(i)) for i in range(-nh + 1, nh)]
    w = np.array(side[:nh - 1][::-1] + [center] + side[:nh - 1]) if nh > 1 else np.array([1.0, 2.0, 1.0])
    # fall back to symmetric triangle if shapes go degenerate
    if len(w) != nframes:
        ramp = np.arange(1, nh + 1, dtype=np.float64)
        w = np.concatenate([ramp, [nh + 1.0], ramp[::-1]])
    return (w / w.sum()).astype(np.float32)


def chroma_stabilizer(
    frames: jnp.ndarray,
    nframes: int = 5,
    weighted: bool = False,
    scenechange: jnp.ndarray | None = None,
    sat: float = 1.0,
    tht: int = 15,
) -> jnp.ndarray:
    """Temporal chroma averaging over ``(T, H, W, 3)`` RGB frames.

    For each output frame t the chroma (U, V) is a weighted average over the
    window ``t-Nh .. t+Nh``.  Border frames use edge replication (the
    reference shifts clips with DuplicateFrames, same effect).

    Per the reference (vsfilters.py:216-242), each *shifted* frame first has
    its gray pixels restored from the center frame (``restore_color`` with
    threshold ``tht``) so mostly-gray neighbours don't desaturate the
    average.  When ``scenechange`` (bool/int array of shape (T,)) is given,
    windows are additionally masked so no frame from a different scene
    segment contributes: a neighbour at offset o<0 is excluded if any scene
    cut occurs in (t+o, t], and symmetrically for o>0.
    """
    T = frames.shape[0]
    nframes = min(max(int(nframes), 3), 15)
    if nframes % 2 == 0:
        nframes += 1
    nh = (nframes - 1) // 2
    w = jnp.asarray(average_weights(nframes, weighted))

    yuv = rgb_to_yuv(frames)
    y_c = yuv[..., 0]

    if scenechange is not None:
        sc = jnp.asarray(scenechange, dtype=jnp.int32)
        # segment id per frame = cumulative count of scene starts
        seg = jnp.cumsum(sc)
    else:
        seg = jnp.zeros((T,), dtype=jnp.int32)

    acc_u = jnp.zeros_like(y_c)
    acc_v = jnp.zeros_like(y_c)
    acc_w = jnp.zeros((T,) + (1,) * (frames.ndim - 2), dtype=frames.dtype)

    for k, off in enumerate(range(-nh, nh + 1)):
        idx = jnp.clip(jnp.arange(T) + off, 0, T - 1)
        shifted = frames[idx]
        if off != 0:
            # repaint gray pixels of the shifted frame from the center frame
            shifted = restore_color(
                color=frames, gray=shifted, sat=sat, tht=tht, tht_scen=0.8
            )
        yuv_s = rgb_to_yuv(shifted)
        same_scene = (seg[idx] == seg).astype(frames.dtype)
        wk = w[k] * same_scene.reshape((T,) + (1,) * (frames.ndim - 2))
        acc_u = acc_u + yuv_s[..., 1] * wk
        acc_v = acc_v + yuv_s[..., 2] * wk
        acc_w = acc_w + wk

    u = acc_u / jnp.maximum(acc_w, 1e-6)
    v = acc_v / jnp.maximum(acc_w, 1e-6)
    return yuv_to_rgb_preserve_luma(jnp.stack([y_c, u, v], axis=-1))


def reduce_flicker(
    frames: jnp.ndarray, strength: int = 5, scenechange: jnp.ndarray | None = None
) -> jnp.ndarray:
    """Temporal luma deflicker over ``(T, H, W, 3)`` RGB frames.

    ReduceFlicker-style (the reference loads ReduceFlicker.dll,
    vsplugins.py:263-272): pull each frame's luma toward the average of its
    temporal neighbours, bounded so detail isn't smeared.  ``strength``
    (1..~10) scales the correction limit.  Scene cuts gate the correction
    exactly like :func:`chroma_stabilizer`.
    """
    T = frames.shape[0]
    yuv = rgb_to_yuv(frames)
    y = yuv[..., 0]
    prev_i = jnp.clip(jnp.arange(T) - 1, 0, T - 1)
    next_i = jnp.clip(jnp.arange(T) + 1, 0, T - 1)
    y_prev, y_next = y[prev_i], y[next_i]
    target = 0.5 * (y_prev + y_next)
    limit = strength / 255.0
    # pull halfway toward the neighbour average: a full jump would re-invert
    # alternating flicker instead of damping it
    corr = jnp.clip(0.5 * (target - y), -limit, limit)
    if scenechange is not None:
        sc = jnp.asarray(scenechange, dtype=jnp.int32)
        seg = jnp.cumsum(sc)
        ok = ((seg[prev_i] == seg) & (seg[next_i] == seg)).astype(y.dtype)
        corr = corr * ok.reshape((T,) + (1,) * (y.ndim - 1))
    y_new = jnp.clip(y + corr, 0.0, 1.0)
    return yuv_to_rgb_preserve_luma(
        jnp.stack([y_new, yuv[..., 1], yuv[..., 2]], axis=-1)
    )
