"""Resampling kernels as MXU matmuls.

TPU-native replacement for the VapourSynth C++ resizers the reference uses
everywhere (``resize.Spline64/Spline36/Bicubic/Lanczos/Point`` — reference:
vsdeoldify/__init__.py:2502-2504, vsslib/vsresize.py:30-127) and for PIL's
BILINEAR square-stretch inside DeOldify (reference: deoldify/filters.py:76-99).

Design: a separable polyphase resampler is two banded matrices.  Rather than
gather-based interpolation (bad for TPU), we build dense weight matrices
``W_h (H_out x H_in)`` and ``W_w (W_out x W_in)`` host-side (cached) and apply
them as two ``einsum`` contractions — these lower to ``dot_general`` on the
MXU, making resize one of the fastest ops in the pipeline instead of a
bandwidth-bound gather.  Weight rows are normalized and edge-clamped
(replicate border), matching zimg behaviour; kernels are stretched by the
scale factor when downscaling (antialiasing), as VS/zimg do.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["resize", "resize_kernel_matrix", "KERNELS"]


# --- kernel functions (numpy, host-side) ------------------------------------


def _kernel_point(x):
    return (np.abs(x) <= 0.5).astype(np.float64)


def _kernel_bilinear(x):
    x = np.abs(x)
    return np.maximum(1.0 - x, 0.0)


def _kernel_bicubic(x, b=0.0, c=0.5):
    # Mitchell-Netravali family; VS default Bicubic is b=0, c=0.5 (Catmull-Rom).
    x = np.abs(x)
    x2 = x * x
    x3 = x2 * x
    p1 = (12 - 9 * b - 6 * c) * x3 + (-18 + 12 * b + 6 * c) * x2 + (6 - 2 * b)
    p2 = (-b - 6 * c) * x3 + (6 * b + 30 * c) * x2 + (-12 * b - 48 * c) * x + (
        8 * b + 24 * c
    )
    out = np.where(x < 1.0, p1, np.where(x < 2.0, p2, 0.0))
    return out / 6.0


def _kernel_lanczos(x, a=3):
    x = np.abs(x)
    with np.errstate(divide="ignore", invalid="ignore"):
        out = np.sinc(x) * np.sinc(x / a)
    return np.where(x < a, out, 0.0)


def _piecewise_spline(x, coeffs):
    """Evaluate a piecewise-cubic spline kernel given per-interval cubic
    coefficients ``[(a3, a2, a1, a0), ...]`` for x in [i, i+1)."""
    x = np.abs(x)
    out = np.zeros_like(x)
    for i, (a3, a2, a1, a0) in enumerate(coeffs):
        t = x - i
        seg = ((a3 * t + a2) * t + a1) * t + a0
        out = np.where((x >= i) & (x < i + 1), seg, out)
    return out


# Standard AviSynth/zimg spline kernel coefficients.
_SPLINE16 = [(1.0, -9.0 / 5.0, -1.0 / 5.0, 1.0), (-1.0 / 3.0, 4.0 / 5.0, -7.0 / 15.0, 0.0)]
_SPLINE36 = [
    (13.0 / 11.0, -453.0 / 209.0, -3.0 / 209.0, 1.0),
    (-6.0 / 11.0, 270.0 / 209.0, -156.0 / 209.0, 0.0),
    (1.0 / 11.0, -45.0 / 209.0, 26.0 / 209.0, 0.0),
]
_SPLINE64 = [
    (49.0 / 41.0, -6387.0 / 2911.0, -3.0 / 2911.0, 1.0),
    (-24.0 / 41.0, 4032.0 / 2911.0, -2328.0 / 2911.0, 0.0),
    (6.0 / 41.0, -1008.0 / 2911.0, 582.0 / 2911.0, 0.0),
    (-1.0 / 41.0, 168.0 / 2911.0, -97.0 / 2911.0, 0.0),
]

KERNELS = {
    "point": (_kernel_point, 0.5),
    "bilinear": (_kernel_bilinear, 1.0),
    "bicubic": (functools.partial(_kernel_bicubic, b=0.0, c=0.5), 2.0),
    "mitchell": (functools.partial(_kernel_bicubic, b=1 / 3, c=1 / 3), 2.0),
    "lanczos": (functools.partial(_kernel_lanczos, a=3), 3.0),
    "spline16": (functools.partial(_piecewise_spline, coeffs=_SPLINE16), 2.0),
    "spline36": (functools.partial(_piecewise_spline, coeffs=_SPLINE36), 3.0),
    "spline64": (functools.partial(_piecewise_spline, coeffs=_SPLINE64), 4.0),
}


@functools.lru_cache(maxsize=512)
def resize_kernel_matrix(
    in_size: int, out_size: int, kernel: str = "spline64",
    antialias: bool = True,
) -> np.ndarray:
    """Build the (out_size, in_size) resampling weight matrix, float32.

    Uses the center-aligned mapping ``src = (dst + 0.5) * in/out - 0.5`` and
    stretches the kernel by the scale factor when downscaling
    (``antialias=False`` skips the stretch — torch
    ``F.interpolate(antialias=False)`` / cv2 INTER_LINEAR semantics).
    """
    fn, support = KERNELS[kernel]
    scale = in_size / out_size
    stretch = max(scale, 1.0) if antialias else 1.0
    sup = support * stretch

    dst = np.arange(out_size, dtype=np.float64)
    src_center = (dst + 0.5) * scale - 0.5  # (out,)

    lo = np.floor(src_center - sup).astype(np.int64)
    width = int(math.ceil(2.0 * sup)) + 2
    taps = lo[:, None] + np.arange(width)[None, :]  # (out, width)
    dist = (src_center[:, None] - taps) / stretch
    w = fn(dist)
    # normalize rows
    w = w / np.maximum(w.sum(axis=1, keepdims=True), 1e-12)
    # scatter into the dense matrix with edge clamp (replicate border)
    taps_clamped = np.clip(taps, 0, in_size - 1)
    mat = np.zeros((out_size, in_size), dtype=np.float64)
    np.add.at(mat, (np.repeat(dst.astype(np.int64), width), taps_clamped.ravel()), w.ravel())
    return mat.astype(np.float32)


def resize(
    img: jnp.ndarray,
    height: int,
    width: int,
    kernel: str = "spline64",
    antialias: bool = True,
) -> jnp.ndarray:
    """Resize ``(..., H, W, C)`` image(s) to ``(..., height, width, C)``.

    Two MXU matmuls (vertical then horizontal pass).  Weight matrices are
    computed host-side once per (size, kernel, antialias) triple and
    cached; the jnp constants are folded into the jitted program.
    """
    h_in, w_in = img.shape[-3], img.shape[-2]
    # HIGHEST keeps f32 accumulation on the MXU; default precision lets XLA
    # round operands to bf16, which is visible (~1e-2) in chroma fidelity.
    prec = jax.lax.Precision.HIGHEST
    out = img
    if h_in != height:
        wh = jnp.asarray(resize_kernel_matrix(h_in, height, kernel, antialias))
        out = jnp.einsum(
            "oh,...hwc->...owc", wh, out,
            preferred_element_type=jnp.float32, precision=prec,
        ).astype(img.dtype)
    if w_in != width:
        ww = jnp.asarray(resize_kernel_matrix(w_in, width, kernel, antialias))
        out = jnp.einsum(
            "pw,...hwc->...hpc", ww, out,
            preferred_element_type=jnp.float32, precision=prec,
        ).astype(img.dtype)
    return out


# --- aspect-preserving pad/restore geometry ---------------------------------
#
# Rebuild of the reference's SmartResize / ClipPadder geometry
# (vsslib/vsresize.py:159-411): instead of stretching a clip to the model
# aspect, borders are added (black for SmartResize, gray-128 for ClipPadder)
# so spatial correspondence models (ColorMNet/DeepEx exemplar matching)
# see undistorted geometry; restore = resize to padded size + crop.

from typing import NamedTuple


class PadMeta(NamedTuple):
    """Geometry captured by smart_resize_pad, consumed by
    smart_resize_restore."""

    orig_h: int
    orig_w: int
    pad_w: int  # symmetric horizontal border (pre-resize pixels)
    pad_h: int  # symmetric vertical border


def smart_resize_pad(
    frames, target_h: int, target_w: int, kernel: str = "spline64",
    border: float = 0.0, even_pad: bool = False,
):
    """Pad to the target aspect ratio (symmetric borders) then resize to
    (target_h, target_w) — SmartResizeColorizer.get_resized_clip
    (vsresize.py:294-315; SmartResizeReference rounds the pad down to a
    multiple of 2, ``even_pad=True``).  Returns (resized, PadMeta)."""
    import math as _math

    h, w = frames.shape[-3], frames.shape[-2]
    ratio_clip = round(w / h, 2)
    ratio_target = round(target_w / target_h, 2)
    pad_w = pad_h = 0
    if ratio_clip < ratio_target:
        new_w = round(h * ratio_target)
        pad_w = int(round((new_w - w) / 2))
        if even_pad:
            pad_w = _math.trunc(pad_w / 2) * 2
    elif ratio_clip > ratio_target:
        new_h = round(w / ratio_target)
        pad_h = int(round((new_h - h) / 2))
        if even_pad:
            pad_h = _math.trunc(pad_h / 2) * 2
    if pad_w or pad_h:
        pads = [(0, 0)] * (frames.ndim - 3) + [
            (pad_h, pad_h), (pad_w, pad_w), (0, 0)]
        frames = jnp.pad(frames, pads, constant_values=border)
    out = jnp.clip(resize(frames, target_h, target_w, kernel), 0.0, 1.0)
    return out, PadMeta(h, w, pad_w, pad_h)


def smart_resize_restore(frames, meta: PadMeta, kernel: str = "spline64"):
    """Resize back to the padded geometry and crop the borders off
    (SmartResize*.restore_clip_size, vsresize.py:316-329)."""
    ph, pw = meta.pad_h, meta.pad_w
    full_h = meta.orig_h + 2 * ph
    full_w = meta.orig_w + 2 * pw
    out = jnp.clip(resize(frames, full_h, full_w, kernel), 0.0, 1.0)
    if ph:
        out = out[..., ph:-ph, :, :]
    if pw:
        out = out[..., pw:-pw, :]
    return out


def pad_to_square(frames, size: int = 512, kernel: str = "lanczos",
                  border: float = 128.0 / 255.0):
    """ClipPadder.pad (vsresize.py:176-217): fit into a size x size box
    preserving aspect (lanczos), then gray-128 borders.  Returns
    (padded, PadMeta) where PadMeta.pad_* are post-resize pixels."""
    h, w = frames.shape[-3], frames.shape[-2]
    scale = size / max(w, h)
    new_w, new_h = int(w * scale), int(h * scale)
    out = jnp.clip(resize(frames, new_h, new_w, kernel), 0.0, 1.0)
    pad_w = size - new_w
    pad_h = size - new_h
    l, t = pad_w // 2, pad_h // 2
    pads = [(0, 0)] * (frames.ndim - 3) + [
        (t, pad_h - t), (l, pad_w - l), (0, 0)]
    out = jnp.pad(out, pads, constant_values=border)
    return out, PadMeta(h, w, l, t)


def unpad_from_square(frames, meta: PadMeta, size: int = 512,
                      kernel: str = "lanczos"):
    """ClipPadder.unpad: crop the content box, resize to the original."""
    scale = size / max(meta.orig_w, meta.orig_h)
    new_w, new_h = int(meta.orig_w * scale), int(meta.orig_h * scale)
    t, l = meta.pad_h, meta.pad_w
    out = frames[..., t:t + new_h, l:l + new_w, :]
    return jnp.clip(resize(out, meta.orig_h, meta.orig_w, kernel), 0.0, 1.0)


__all__ += ["PadMeta", "smart_resize_pad", "smart_resize_restore",
            "pad_to_square", "unpad_from_square"]
