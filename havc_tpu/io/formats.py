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
    "restore_format_yuv",
    "yuv_planes_to_rgb",
]

# Kr, Kb per matrix (ITU-R)
MATRIX_COEFFS = {
    "601": (0.299, 0.114),
    "709": (0.2126, 0.0722),
    "2020": (0.2627, 0.0593),
}


def _fs_dither(
    plane_codes: np.ndarray, lo: float, hi: float, bits: int = 8
) -> np.ndarray:
    """Error-diffusion quantize float code values -> uint8/uint16 (native
    FS; numpy round fallback)."""
    x = np.ascontiguousarray(plane_codes, np.float32)
    n, h, w = x.shape
    dtype = np.uint8 if bits <= 8 else np.uint16
    fname = "fs_dither_u8_batch" if bits <= 8 else "fs_dither_u16_batch"
    try:
        import ctypes

        from .native import load_native

        ctype = ctypes.c_uint8 if bits <= 8 else ctypes.c_uint16
        lib = load_native()
        if not hasattr(lib, fname):
            raise AttributeError(f"{fname} missing (stale .so)")
        fn = getattr(lib, fname)
        fn.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctype),
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_float, ctypes.c_float,
        ]
        out = np.empty((n, h, w), dtype)
        fn(
            x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            out.ctypes.data_as(ctypes.POINTER(ctype)),
            n, w, h, float(lo), float(hi),
        )
        return out
    except Exception:
        return np.clip(np.round(x), lo, hi).astype(dtype)


def _ranges(bits: int, range_full: bool):
    """(y_scale, y_offset, c_scale, c_offset, y_clamp, c_clamp) code-value
    mapping for a bit depth — zimg/ITU conventions: limited-range excursions
    scale by 2^(bits-8), full range spans [0, 2^bits - 1]."""
    s = float(1 << (bits - 8))
    if range_full:
        peak = float((1 << bits) - 1)
        mid = float(1 << (bits - 1))
        return peak, 0.0, peak, mid, (0.0, peak), (0.0, peak)
    return (
        219.0 * s, 16.0 * s, 224.0 * s, 128.0 * s,
        (16.0 * s, 235.0 * s), (16.0 * s, 240.0 * s),
    )


def rgb_to_yuv_planes(
    frames: jnp.ndarray, matrix: str = "709", range_full: bool = False,
    bits: int = 8,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(T,H,W,3) RGB [0,1] -> float CODE-VALUE planes (Y, U, V) at full
    resolution for the given bit depth (8/10/12/16): limited range Y in
    [16,235]*2^(b-8) etc., full range [0, 2^b-1].  Quantization/dither is
    the caller's step."""
    kr, kb = MATRIX_COEFFS[matrix]
    kg = 1.0 - kr - kb
    r, g, b = frames[..., 0], frames[..., 1], frames[..., 2]
    y = kr * r + kg * g + kb * b
    cb = (b - y) / (2.0 * (1.0 - kb))
    cr = (r - y) / (2.0 * (1.0 - kr))
    ys, yo, cs, co, _, _ = _ranges(bits, range_full)
    return y * ys + yo, cb * cs + co, cr * cs + co


def _subsample(c: jnp.ndarray, subsampling: str = "420") -> jnp.ndarray:
    """Mean chroma subsample: '420' 2x2, '422' horizontal 2x1, '444'
    identity; odd dims padded by edge replication first."""
    if subsampling == "444":
        return c
    t, h, w = c.shape
    if w % 2:
        c = jnp.concatenate([c, c[:, :, -1:]], axis=2)
        w += 1
    if subsampling == "422":
        return c.reshape(t, h, w // 2, 2).mean(axis=3)
    if h % 2:
        c = jnp.concatenate([c, c[:, -1:, :]], axis=1)
        h += 1
    return c.reshape(t, h // 2, 2, w // 2, 2).mean(axis=(2, 4))


def _subsample_420(c: jnp.ndarray) -> jnp.ndarray:
    return _subsample(c, "420")


def restore_format_yuv(
    frames: np.ndarray | jnp.ndarray,
    matrix: str = "709",
    range_full: bool = False,
    bits: int = 8,
    subsampling: str = "420",
    dither: str = "error_diffusion",
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """General restore_format path (havc_utils.py:167-237): the reference
    restores the clip's ORIGINAL format — any of 8/10/12/16-bit,
    4:2:0/4:2:2/4:4:4, BT.601/709/2020, limited/full — with
    error-diffusion dithering.  Returns (Y, U, V) planes as uint8 (bits<=8)
    or uint16."""
    y, u, v = rgb_to_yuv_planes(jnp.asarray(frames), matrix, range_full, bits)
    u = _subsample(u, subsampling)
    v = _subsample(v, subsampling)
    y_np, u_np, v_np = np.asarray(y), np.asarray(u), np.asarray(v)
    _, _, _, _, y_rng, c_rng = _ranges(bits, range_full)
    if dither == "error_diffusion":
        return (
            _fs_dither(y_np, *y_rng, bits=bits),
            _fs_dither(u_np, *c_rng, bits=bits),
            _fs_dither(v_np, *c_rng, bits=bits),
        )
    dtype = np.uint8 if bits <= 8 else np.uint16
    return (
        np.clip(np.round(y_np), *y_rng).astype(dtype),
        np.clip(np.round(u_np), *c_rng).astype(dtype),
        np.clip(np.round(v_np), *c_rng).astype(dtype),
    )


def restore_format_yuv420p8(
    frames: np.ndarray | jnp.ndarray,
    matrix: str = "709",
    range_full: bool = False,
    dither: str = "error_diffusion",
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """restore_format for the common case (original clip was YUV/GRAY ->
    YUV420P8 output, havc_utils.py:186-222)."""
    return restore_format_yuv(
        frames, matrix, range_full, bits=8, subsampling="420", dither=dither
    )


def yuv_planes_to_rgb(
    y: np.ndarray, u: np.ndarray, v: np.ndarray,
    matrix: str = "709", range_full: bool = False, bits: int = 8,
) -> jnp.ndarray:
    """Inverse: uint8/uint16 planes (any subsampling) -> (T,H,W,3) RGB
    [0,1] (bilinear chroma upsample)."""
    import jax

    yf = jnp.asarray(y, jnp.float32)
    uf = jnp.asarray(u, jnp.float32)
    vf = jnp.asarray(v, jnp.float32)
    ys, yo, cs, co, _, _ = _ranges(bits, range_full)
    yn = (yf - yo) / ys
    cb = (uf - co) / cs
    cr = (vf - co) / cs
    t, h, w = yn.shape
    up = lambda c: (
        c if c.shape[1:] == (h, w)
        else jax.image.resize(c, (t, h, w), "bilinear")
    )
    cb, cr = up(cb), up(cr)
    kr, kb = MATRIX_COEFFS[matrix]
    kg = 1.0 - kr - kb
    r = yn + 2.0 * (1.0 - kr) * cr
    b = yn + 2.0 * (1.0 - kb) * cb
    g = (yn - kr * r - kb * b) / kg
    return jnp.clip(jnp.stack([r, g, b], axis=-1), 0.0, 1.0)


def yuv420p8_to_rgb(
    y: np.ndarray, u: np.ndarray, v: np.ndarray,
    matrix: str = "709", range_full: bool = False,
) -> jnp.ndarray:
    return yuv_planes_to_rgb(y, u, v, matrix, range_full, bits=8)
