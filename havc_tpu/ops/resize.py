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
    in_size: int, out_size: int, kernel: str = "spline64"
) -> np.ndarray:
    """Build the (out_size, in_size) resampling weight matrix, float32.

    Uses the center-aligned mapping ``src = (dst + 0.5) * in/out - 0.5`` and
    stretches the kernel by the scale factor when downscaling.
    """
    fn, support = KERNELS[kernel]
    scale = in_size / out_size
    stretch = max(scale, 1.0)
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
) -> jnp.ndarray:
    """Resize ``(..., H, W, C)`` image(s) to ``(..., height, width, C)``.

    Two MXU matmuls (vertical then horizontal pass).  Weight matrices are
    computed host-side once per (size, kernel) pair and cached; the jnp
    constants are folded into the jitted program.
    """
    h_in, w_in = img.shape[-3], img.shape[-2]
    # HIGHEST keeps f32 accumulation on the MXU; default precision lets XLA
    # round operands to bf16, which is visible (~1e-2) in chroma fidelity.
    prec = jax.lax.Precision.HIGHEST
    out = img
    if h_in != height:
        wh = jnp.asarray(resize_kernel_matrix(h_in, height, kernel))
        out = jnp.einsum(
            "oh,...hwc->...owc", wh, out,
            preferred_element_type=jnp.float32, precision=prec,
        ).astype(img.dtype)
    if w_in != width:
        ww = jnp.asarray(resize_kernel_matrix(w_in, width, kernel))
        out = jnp.einsum(
            "pw,...hwc->...hpc", ww, out,
            preferred_element_type=jnp.float32, precision=prec,
        ).astype(img.dtype)
    return out
