"""Output format restore: RGB -> YUV with matrix/range conversion and
error-diffusion dithering.

Rebuild of the reference's ``restore_format`` encode path
(havc_utils.py:167-237): the pipeline works internally in full-range RGB
(float here, RGB24 there) and restores the ORIGINAL colorimetry on output —
BT.601/709/2020 matrix, limited/full range, 4:2:0 subsampling, and zimg's
``dither_type="error_diffusion"`` quantization (Floyd–Steinberg in the
native library; XLA is the wrong tool for sequential error propagation).

The device side (matrix multiply, range scale, chroma subsample) is jnp;
quantization+dither runs in native/framepipe.cpp via ctypes with a numpy
rounding fallback when the toolchain is unavailable.
"""
from __future__ import annotations

from typing import Tuple

import numpy as np

import jax.numpy as jnp

__all__ = [
    "MATRIX_COEFFS",
    "rgb_to_yuv_planes",
    "yuv420p8_to_rgb",
    "restore_format_yuv420p8",
]

# Kr, Kb per matrix (ITU-R)
MATRIX_COEFFS = {
    "601": (0.299, 0.114),
    "709": (0.2126, 0.0722),
    "2020": (0.2627, 0.0593),
}


def _fs_dither(plane_codes: np.ndarray, lo: float, hi: float) -> np.ndarray:
    """Error-diffusion quantize float code values -> uint8 (native FS; numpy
    round fallback)."""
    x = np.ascontiguousarray(plane_codes, np.float32)
    n, h, w = x.shape
    try:
        import ctypes

        from .native import load_native

        lib = load_native()
        if not hasattr(lib, "fs_dither_u8_batch"):
            raise AttributeError("fs_dither_u8_batch missing (stale .so)")
        lib.fs_dither_u8_batch.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_float, ctypes.c_float,
        ]
        out = np.empty((n, h, w), np.uint8)
        lib.fs_dither_u8_batch(
            x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            n, w, h, float(lo), float(hi),
        )
        return out
    except Exception:
        return np.clip(np.round(x), lo, hi).astype(np.uint8)


def rgb_to_yuv_planes(
    frames: jnp.ndarray, matrix: str = "709", range_full: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(T,H,W,3) RGB [0,1] -> float CODE-VALUE planes (Y, U, V) at full
    resolution: Y in [16,235] / U,V in [16,240] for limited range, [0,255]
    for full.  Quantization/dither is the caller's step."""
    kr, kb = MATRIX_COEFFS[matrix]
    kg = 1.0 - kr - kb
    r, g, b = frames[..., 0], frames[..., 1], frames[..., 2]
    y = kr * r + kg * g + kb * b
    cb = (b - y) / (2.0 * (1.0 - kb))
    cr = (r - y) / (2.0 * (1.0 - kr))
    if range_full:
        return y * 255.0, cb * 255.0 + 128.0, cr * 255.0 + 128.0
    return y * 219.0 + 16.0, cb * 224.0 + 128.0, cr * 224.0 + 128.0


def _subsample_420(c: jnp.ndarray) -> jnp.ndarray:
    """2x2 mean chroma subsample (T,H,W) -> (T,H/2,W/2); H/W padded to even
    by edge replication first."""
    t, h, w = c.shape
    if h % 2:
        c = jnp.concatenate([c, c[:, -1:, :]], axis=1)
        h += 1
    if w % 2:
        c = jnp.concatenate([c, c[:, :, -1:]], axis=2)
        w += 1
    return c.reshape(t, h // 2, 2, w // 2, 2).mean(axis=(2, 4))


def restore_format_yuv420p8(
    frames: np.ndarray | jnp.ndarray,
    matrix: str = "709",
    range_full: bool = False,
    dither: str = "error_diffusion",
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Full restore_format path for the common case (original clip was
    YUV/GRAY -> YUV420P8 output, havc_utils.py:186-222): returns uint8
    planes (Y (T,H,W), U, V (T,H/2,W/2))."""
    y, u, v = rgb_to_yuv_planes(jnp.asarray(frames), matrix, range_full)
    u = _subsample_420(u)
    v = _subsample_420(v)
    y_np, u_np, v_np = np.asarray(y), np.asarray(u), np.asarray(v)
    if range_full:
        y_rng = c_rng = (0.0, 255.0)
    else:
        y_rng, c_rng = (16.0, 235.0), (16.0, 240.0)
    if dither == "error_diffusion":
        return (
            _fs_dither(y_np, *y_rng),
            _fs_dither(u_np, *c_rng),
            _fs_dither(v_np, *c_rng),
        )
    return (
        np.clip(np.round(y_np), *y_rng).astype(np.uint8),
        np.clip(np.round(u_np), *c_rng).astype(np.uint8),
        np.clip(np.round(v_np), *c_rng).astype(np.uint8),
    )


def yuv420p8_to_rgb(
    y: np.ndarray, u: np.ndarray, v: np.ndarray,
    matrix: str = "709", range_full: bool = False,
) -> jnp.ndarray:
    """Inverse: uint8 planes -> (T,H,W,3) RGB [0,1] (bilinear chroma
    upsample)."""
    import jax

    yf = jnp.asarray(y, jnp.float32)
    uf = jnp.asarray(u, jnp.float32)
    vf = jnp.asarray(v, jnp.float32)
    if range_full:
        yn = yf / 255.0
        cb = (uf - 128.0) / 255.0
        cr = (vf - 128.0) / 255.0
    else:
        yn = (yf - 16.0) / 219.0
        cb = (uf - 128.0) / 224.0
        cr = (vf - 128.0) / 224.0
    t, h, w = yn.shape
    up = lambda c: jax.image.resize(c, (t, h, w), "bilinear")
    cb, cr = up(cb), up(cr)
    kr, kb = MATRIX_COEFFS[matrix]
    kg = 1.0 - kr - kb
    r = yn + 2.0 * (1.0 - kr) * cr
    b = yn + 2.0 * (1.0 - kb) * cb
    g = (yn - kr * r - kb * b) / kg
    return jnp.clip(jnp.stack([r, g, b], axis=-1), 0.0, 1.0)
