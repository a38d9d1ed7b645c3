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

    Exact transcription of vsfilters._build_avg_arithmetic /
    _build_avg_weighted (vsfilters.py:119-157): integer percentages summing
    to 100, returned /100.  Arithmetic gives each neighbour trunc(100/N)
    and the remainder to the center (so e.g. N=7 -> 14/14/14/16/14/14/14).
    The weighted variant builds an ASCENDING ramp trunc(100*(i+1)/WBase)
    and — reference quirk — appends the same ascending ramp on the right
    side without mirroring (the +1 neighbour gets the smallest weight, the
    farthest future neighbour the largest)."""
    import math

    nframes = int(nframes)
    assert nframes % 2 == 1 and nframes >= 3
    nh = round((nframes - 1) / 2)
    if not weighted:
        wi = math.trunc(100.0 / nframes)
        wc = 100 - (nframes - 1) * wi
        w = [wi] * nh + [wc] + [wi] * nh
    else:
        wbase = nframes * (nframes + 1) * 0.5
        ramp = [math.trunc(100.0 * (i + 1) / wbase) for i in range(nh)]
        wc = 100 - 2 * sum(ramp)
        w = ramp + [wc] + ramp
    return (np.asarray(w, np.float64) / 100.0).astype(np.float32)


def chroma_stabilizer(
    frames: jnp.ndarray,
    nframes: int = 5,
    weighted: bool = False,
    scenechange: jnp.ndarray | None = None,
    sat: float = 1.0,
    tht: int = 15,
    weight: float = 0.2,
    tht_scen: float = 0.8,
    frame0: jnp.ndarray | int = 0,
) -> jnp.ndarray:
    """Temporal chroma averaging over ``(T, H, W, 3)`` RGB frames.

    For each output frame t the chroma (U, V) is a weighted average over the
    window ``t-Nh .. t+Nh``.  Border frames use edge replication (the
    reference shifts with one-hot AverageFrames, which clamps at clip
    bounds — same effect).

    Per the reference (vsfilters.py:216-242 _average_clips_ex +
    vs_sc_recover_clip_color:305-356), when ``tht`` > 0 each *shifted*
    frame first has its gray pixels restored from the center frame
    (``restore_color``) so mostly-gray neighbours don't bleach the average,
    with three reference details:

    * ``weight`` is the restore's inner merge weight — the restored
      neighbour is blended back toward the raw neighbour at ``weight``
      (there is NO outer blend in the reference);
    * neighbours whose mean luma falls outside the standard range
      [0.22, 0.78] (DEF_STANDARD_DARK/BRIGHT, constants.py:28-29) clamp
      the weight to ``min(weight, -0.8)`` — mostly the center frame's
      saturated colors instead;
    * the first 15 output frames skip the restore entirely (the
      ``n < 15`` warm-up passthrough, vsfilters.py:338-339); ``frame0``
      is the global index of frames[0] so chunked/streaming callers keep
      the warm-up aligned with the whole-clip result.

    ``tht`` == 0 maps to the plain U/V average (vs_clip_color_stabilizer,
    vsfilters.py:48-66 — the reference's fast-stab path).  When
    ``scenechange`` (bool/int array of shape (T,)) is given, windows are
    additionally masked so no frame from a different scene segment
    contributes.
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

    bshape = (T,) + (1,) * (frames.ndim - 2)   # broadcasts over (T, H, W)
    fshape = (T,) + (1,) * (frames.ndim - 1)   # broadcasts over (T, H, W, C)
    warm = ((jnp.arange(T) + frame0) < 15).reshape(fshape)

    for k, off in enumerate(range(-nh, nh + 1)):
        idx = jnp.clip(jnp.arange(T) + off, 0, T - 1)
        shifted = frames[idx]
        if off != 0 and tht > 0:
            # repaint gray pixels of the shifted frame from the center
            # frame; per-frame weight selection per the reference's
            # standard-luma rule
            r_pos = restore_color(
                color=frames, gray=shifted, sat=sat, tht=tht,
                weight=weight, tht_scen=tht_scen,
            )
            w_neg = min(weight, -0.8)
            r_neg = restore_color(
                color=frames, gray=shifted, sat=sat, tht=tht,
                weight=w_neg, tht_scen=tht_scen,
            )
            y_mean = jnp.mean(rgb_to_yuv(shifted)[..., 0],
                              axis=tuple(range(1, frames.ndim - 1)))
            standard = jnp.logical_and(
                y_mean >= 0.22, y_mean <= 0.78
            ).reshape(fshape)
            restored = jnp.where(standard, r_pos, r_neg)
            shifted = jnp.where(warm, shifted, restored)
        yuv_s = rgb_to_yuv(shifted)
        same_scene = (seg[idx] == seg).astype(frames.dtype)
        wk = w[k] * same_scene.reshape(bshape)
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
