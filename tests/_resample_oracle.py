"""Independent resampling oracle (round-4 verdict item: the golden driver
gates previously used the repo's own spline kernels on BOTH sides, so a
convention bug in ops/resize.py would pass every gate).

Everything here is derived/implemented independently of havc_tpu.ops.resize:

* Spline16/36/64 kernel pieces are DERIVED from first principles — the
  cardinal natural cubic spline over 2N equally spaced nodes, evaluated in
  the central interval (the construction behind AviSynth/zimg SplineNN:
  interpolate a delta at each node with natural end conditions; the kernel
  piece for |x| in [j, j+1) is the cardinal weight of the node j to the
  left) — using exact Fraction arithmetic, no copied coefficient tables.
  test_resample_oracle.py pins the derived pieces against the published
  AviSynth/zimg constants.
* ``oracle_resize`` is a direct per-output-pixel gather loop (scalar
  numpy): center mapping ``src = (dst + 0.5) * in/out - 0.5``, kernel
  stretched by the scale when downscaling (antialias), weights normalized
  per row, out-of-range taps CLAMPED to the edge sample (zimg accumulates
  out-of-bound weights onto the boundary pixel — replicate-border
  semantics).  No weight matrices, no einsum — structurally different from
  the implementation under test.

Reference use sites this oracles: zimg Spline36/64 via VapourSynth
``resize.Spline64`` at vsdeoldify/__init__.py:2502-2504 and
vsslib/vsutils/havc_utils.py:57-237.
"""
from __future__ import annotations

import math
from fractions import Fraction
from functools import lru_cache

import numpy as np


def natural_spline_coeffs(values):
    """Natural cubic spline through ``(i, values[i])`` — exact Fractions.
    Returns per-interval coefficients ``(a3, a2, a1, a0)`` in t = x - i."""
    y = [Fraction(v) for v in values]
    n = len(y)
    m = n - 2
    # second derivatives M_i, natural BC M_0 = M_{n-1} = 0:
    # M_{i-1} + 4 M_i + M_{i+1} = 6 (y_{i+1} - 2 y_i + y_{i-1})
    rows = []
    for i in range(m):
        r = [Fraction(0)] * m + [6 * (y[i + 2] - 2 * y[i + 1] + y[i])]
        r[i] = Fraction(4)
        if i > 0:
            r[i - 1] = Fraction(1)
        if i < m - 1:
            r[i + 1] = Fraction(1)
        rows.append(r)
    for c in range(m):  # exact Gauss-Jordan
        p = next(i for i in range(c, m) if rows[i][c] != 0)
        rows[c], rows[p] = rows[p], rows[c]
        pv = rows[c][c]
        rows[c] = [x / pv for x in rows[c]]
        for i in range(m):
            if i != c and rows[i][c] != 0:
                f = rows[i][c]
                rows[i] = [x - f * z for x, z in zip(rows[i], rows[c])]
    M = [Fraction(0)] + [rows[i][m] for i in range(m)] + [Fraction(0)]
    out = []
    for i in range(n - 1):
        out.append((
            (M[i + 1] - M[i]) / 6,
            M[i] / 2,
            y[i + 1] - y[i] - Fraction(2 * M[i] + M[i + 1], 6),
            y[i],
        ))
    return out


@lru_cache(maxsize=None)
def spline_kernel_pieces(n_half: int):
    """Derive the SplineNN kernel (N = (2*n_half)^2): cardinal natural
    spline over 2*n_half nodes, central interval.  Piece j covers
    |x| in [j, j+1)."""
    n = 2 * n_half
    center = n_half - 1
    pieces = []
    for j in range(n_half):
        vals = [0] * n
        vals[center - j] = 1
        pieces.append(natural_spline_coeffs(vals)[center])
    return tuple(
        tuple(float(c) for c in p) for p in pieces
    )


def _spline_eval(x: np.ndarray, n_half: int) -> np.ndarray:
    x = np.abs(x)
    out = np.zeros_like(x)
    for j, (a3, a2, a1, a0) in enumerate(spline_kernel_pieces(n_half)):
        t = x - j
        seg = ((a3 * t + a2) * t + a1) * t + a0
        out = np.where((x >= j) & (x < j + 1), seg, out)
    return out


def _bicubic_eval(x, b=0.0, c=0.5):
    x = np.abs(x)
    p = np.where(
        x < 1.0,
        ((12 - 9 * b - 6 * c) * x**3 + (-18 + 12 * b + 6 * c) * x**2
         + (6 - 2 * b)),
        np.where(
            x < 2.0,
            ((-b - 6 * c) * x**3 + (6 * b + 30 * c) * x**2
             + (-12 * b - 48 * c) * x + (8 * b + 24 * c)),
            0.0,
        ),
    )
    return p / 6.0


def _lanczos_eval(x, a=3):
    x = np.abs(x)
    with np.errstate(divide="ignore", invalid="ignore"):
        out = np.sinc(x) * np.sinc(x / a)
    return np.where(x < a, out, 0.0)


_ORACLE_KERNELS = {
    "spline16": (lambda x: _spline_eval(x, 2), 2.0),
    "spline36": (lambda x: _spline_eval(x, 3), 3.0),
    "spline64": (lambda x: _spline_eval(x, 4), 4.0),
    "bicubic": (lambda x: _bicubic_eval(x, 0.0, 0.5), 2.0),
    "mitchell": (lambda x: _bicubic_eval(x, 1 / 3, 1 / 3), 2.0),
    "lanczos": (lambda x: _lanczos_eval(x, 3), 3.0),
    "bilinear": (lambda x: np.maximum(1.0 - np.abs(x), 0.0), 1.0),
}


def _oracle_resize_1d(img: np.ndarray, out_size: int, axis: int,
                      kernel: str, antialias: bool) -> np.ndarray:
    fn, support = _ORACLE_KERNELS[kernel]
    in_size = img.shape[axis]
    if in_size == out_size:
        return img
    scale = in_size / out_size
    stretch = max(scale, 1.0) if antialias else 1.0
    sup = support * stretch
    img = np.moveaxis(img, axis, 0).astype(np.float64)
    out = np.zeros((out_size,) + img.shape[1:], np.float64)
    for o in range(out_size):  # direct per-pixel gather (oracle clarity)
        center = (o + 0.5) * scale - 0.5
        lo = int(math.floor(center - sup))
        hi = int(math.ceil(center + sup))
        taps = np.arange(lo, hi + 1)
        w = fn((center - taps) / stretch)
        w = w / w.sum()
        acc = np.zeros(img.shape[1:], np.float64)
        for t, wt in zip(taps, w):
            if wt != 0.0:
                acc += wt * img[min(max(t, 0), in_size - 1)]
        out[o] = acc
    return np.moveaxis(out, 0, axis)


def oracle_resize(img: np.ndarray, height: int, width: int,
                  kernel: str = "spline64",
                  antialias: bool = True) -> np.ndarray:
    """Resize ``(..., H, W, C)`` — vertical pass then horizontal pass,
    float64 accumulation, returned as float64."""
    out = np.asarray(img, np.float64)
    out = _oracle_resize_1d(out, height, out.ndim - 3, kernel, antialias)
    out = _oracle_resize_1d(out, width, out.ndim - 2, kernel, antialias)
    return out
