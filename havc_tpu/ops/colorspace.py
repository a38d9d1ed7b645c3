"""Color-space conversion kernels (pure jnp, TPU-friendly).

All kernels operate on float32/bfloat16 arrays with RGB in ``[0, 1]`` and
layout ``(..., H, W, 3)`` (channel-last, batchable).  They are the TPU-native
replacement for the reference's per-frame ``cv2.cvtColor`` calls
(reference: vsdeoldify/vsslib/imfilters.py:160-269, nputils.py:310-372,
restcolor.py:38-134) and the LAB path used by the Zhang/DeepEx/ColorMNet
engines (reference: vsdeoldify/colorization/colorizers/util.py:25-55).

Conventions
-----------
* ``YUV``: matches OpenCV's 8-bit ``COLOR_RGB2YUV`` rescaled to [0,1]:
  ``Y = 0.299 R + 0.587 G + 0.114 B``; ``U = 0.492 (B - Y) + 0.5``;
  ``V = 0.877 (R - Y) + 0.5``.  The reference stores chroma as uint8 with
  neutral 128; here neutral is 0.5.
* ``HSV``: H in [0, 1) (fraction of a full 360-degree turn), S, V in [0, 1]
  (cv2 8-bit stores H/2 in [0,180); multiply our H by 180 to compare).
* ``LAB``: CIELAB with D65 white, L in [0, 100], a/b roughly [-110, 110]
  (the scale used by all the reference's colorization models).

Everything is elementwise, shape-polymorphic and jit/vmap/pjit-safe; XLA
fuses these into surrounding kernels so there is no standalone memory
round-trip for a conversion.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "rgb_to_yuv",
    "yuv_to_rgb",
    "rgb_to_gray",
    "luma",
    "rgb_to_hsv",
    "hsv_to_rgb",
    "rgb_to_lab",
    "lab_to_rgb",
    "srgb_to_linear",
    "linear_to_srgb",
    "copy_chroma",
    "copy_luma",
]

# --- YUV (cv2 full-range analog) -------------------------------------------

_YUV_U_SCALE = 0.492
_YUV_V_SCALE = 0.877

# Rec.601 luma weights — the reference uses these everywhere
# (nputils.py:101-138 builds luma as 0.299/0.587/0.114).
_LUMA_R = 0.299
_LUMA_G = 0.587
_LUMA_B = 0.114


def luma(rgb: jnp.ndarray) -> jnp.ndarray:
    """Rec.601 luma of an RGB image; returns shape ``(..., H, W)``."""
    return (
        _LUMA_R * rgb[..., 0] + _LUMA_G * rgb[..., 1] + _LUMA_B * rgb[..., 2]
    )


def rgb_to_gray(rgb: jnp.ndarray) -> jnp.ndarray:
    """Replicate luma over 3 channels (reference np_rgb_to_gray behaviour)."""
    y = luma(rgb)
    return jnp.stack([y, y, y], axis=-1)


def rgb_to_yuv(rgb: jnp.ndarray) -> jnp.ndarray:
    y = luma(rgb)
    u = _YUV_U_SCALE * (rgb[..., 2] - y) + 0.5
    v = _YUV_V_SCALE * (rgb[..., 0] - y) + 0.5
    return jnp.stack([y, u, v], axis=-1)


def yuv_to_rgb(yuv: jnp.ndarray) -> jnp.ndarray:
    y = yuv[..., 0]
    u = yuv[..., 1] - 0.5
    v = yuv[..., 2] - 0.5
    r = y + v / _YUV_V_SCALE
    b = y + u / _YUV_U_SCALE
    g = (y - _LUMA_R * r - _LUMA_B * b) / _LUMA_G
    return jnp.stack([r, g, b], axis=-1)


def yuv_to_rgb_preserve_luma(yuv: jnp.ndarray) -> jnp.ndarray:
    """YUV -> RGB that keeps Y exact by desaturating out-of-gamut pixels.

    Plain ``clip(yuv_to_rgb(x))`` shifts luma when chroma leaves the RGB
    gamut; here the chroma offset vector is scaled per pixel by the largest
    s <= 1 keeping all channels in [0,1] (RGB is affine in U,V at fixed Y, so
    this is exact).  Matches the reference pipelines that edit U/V planes in
    YUV clips and never disturb Y (e.g. vsfilters AverageFrames on U/V).
    """
    y = jnp.clip(yuv[..., 0], 0.0, 1.0)
    rgb = yuv_to_rgb(jnp.stack([y, yuv[..., 1], yuv[..., 2]], axis=-1))
    k = rgb - y[..., None]
    eps = 1e-6
    s_hi = jnp.where(k > eps, (1.0 - y[..., None]) / jnp.maximum(k, eps), jnp.inf)
    s_lo = jnp.where(k < -eps, -y[..., None] / jnp.minimum(k, -eps), jnp.inf)
    s = jnp.minimum(jnp.min(s_hi, axis=-1), jnp.min(s_lo, axis=-1))
    s = jnp.clip(s, 0.0, 1.0)[..., None]
    return jnp.clip(y[..., None] + k * s, 0.0, 1.0)


def copy_chroma(src: jnp.ndarray, luma_from: jnp.ndarray) -> jnp.ndarray:
    """Combine chroma (U, V) of ``src`` with luma of ``luma_from``.

    TPU equivalent of the reference's chroma_post_process
    (imfilters.py:312-321): convert both to YUV, take Y from one and UV from
    the other, convert back.
    """
    yuv_src = rgb_to_yuv(src)
    y = luma(luma_from)
    return yuv_to_rgb(
        jnp.stack([y, yuv_src[..., 1], yuv_src[..., 2]], axis=-1)
    )


def copy_luma(src: jnp.ndarray, chroma_from: jnp.ndarray) -> jnp.ndarray:
    """Keep luma of ``src``, take chroma from ``chroma_from``."""
    return copy_chroma(chroma_from, src)


# --- HSV ---------------------------------------------------------------------


def rgb_to_hsv(rgb: jnp.ndarray) -> jnp.ndarray:
    """RGB -> HSV with H in [0,1), S,V in [0,1] (cv2-compatible up to scale)."""
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    v = jnp.maximum(jnp.maximum(r, g), b)
    mn = jnp.minimum(jnp.minimum(r, g), b)
    c = v - mn
    safe_c = jnp.where(c > 0, c, 1.0)
    # Hue sextant selection, branchless.
    h_r = ((g - b) / safe_c) % 6.0
    h_g = (b - r) / safe_c + 2.0
    h_b = (r - g) / safe_c + 4.0
    h = jnp.where(v == r, h_r, jnp.where(v == g, h_g, h_b))
    h = jnp.where(c > 0, h / 6.0, 0.0)
    s = jnp.where(v > 0, c / jnp.where(v > 0, v, 1.0), 0.0)
    return jnp.stack([h, s, v], axis=-1)


def hsv_to_rgb(hsv: jnp.ndarray) -> jnp.ndarray:
    h, s, v = hsv[..., 0], hsv[..., 1], hsv[..., 2]
    h = (h % 1.0) * 6.0
    i = jnp.floor(h)
    f = h - i
    p = v * (1.0 - s)
    q = v * (1.0 - s * f)
    t = v * (1.0 - s * (1.0 - f))
    i = i.astype(jnp.int32) % 6
    r = jnp.select(
        [i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
        [v, q, p, p, t, v],
    )
    g = jnp.select(
        [i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
        [t, v, v, q, p, p],
    )
    b = jnp.select(
        [i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
        [p, p, t, v, v, q],
    )
    return jnp.stack([r, g, b], axis=-1)


# --- sRGB <-> linear ---------------------------------------------------------


def srgb_to_linear(c: jnp.ndarray) -> jnp.ndarray:
    c = jnp.clip(c, 0.0, 1.0)
    return jnp.where(c <= 0.04045, c / 12.92, ((c + 0.055) / 1.055) ** 2.4)


def linear_to_srgb(c: jnp.ndarray) -> jnp.ndarray:
    c = jnp.clip(c, 0.0, 1.0)
    return jnp.where(
        c <= 0.0031308, c * 12.92, 1.055 * (c ** (1.0 / 2.4)) - 0.055
    )


# --- CIELAB (D65) ------------------------------------------------------------

# sRGB -> XYZ (D65) matrices, applied as explicit channel arithmetic: a
# (N,3)x(3,3) einsum gets dispatched to a low-precision GEMM by XLA on some
# backends (bf16-grade error observed on CPU), and explicit mul-adds fuse
# into the surrounding elementwise program anyway.
_RGB2XYZ = (
    (0.412453, 0.357580, 0.180423),
    (0.212671, 0.715160, 0.072169),
    (0.019334, 0.119193, 0.950227),
)
_XYZ2RGB = (
    (3.240479, -1.537150, -0.498535),
    (-0.969256, 1.875992, 0.041556),
    (0.055648, -0.204043, 1.057311),
)


def _apply_mat3(v: jnp.ndarray, mat) -> jnp.ndarray:
    rows = [
        m[0] * v[..., 0] + m[1] * v[..., 1] + m[2] * v[..., 2] for m in mat
    ]
    return jnp.stack(rows, axis=-1)
# D65 reference white.
_WHITE = jnp.array([0.950456, 1.0, 1.088754], dtype=jnp.float32)

_LAB_DELTA = 6.0 / 29.0


def _lab_f(t: jnp.ndarray) -> jnp.ndarray:
    return jnp.where(
        t > _LAB_DELTA**3,
        jnp.cbrt(jnp.maximum(t, 1e-8)),
        t / (3.0 * _LAB_DELTA**2) + 4.0 / 29.0,
    )


def _lab_finv(t: jnp.ndarray) -> jnp.ndarray:
    return jnp.where(
        t > _LAB_DELTA,
        t**3,
        3.0 * _LAB_DELTA**2 * (t - 4.0 / 29.0),
    )


def rgb_to_lab(rgb: jnp.ndarray) -> jnp.ndarray:
    """sRGB [0,1] -> CIELAB (L in [0,100], a/b approx [-110,110])."""
    lin = srgb_to_linear(rgb)
    xyz = _apply_mat3(lin, _RGB2XYZ)
    fxyz = _lab_f(xyz / _WHITE)
    l = 116.0 * fxyz[..., 1] - 16.0
    a = 500.0 * (fxyz[..., 0] - fxyz[..., 1])
    b = 200.0 * (fxyz[..., 1] - fxyz[..., 2])
    return jnp.stack([l, a, b], axis=-1)


def lab_to_rgb(lab: jnp.ndarray) -> jnp.ndarray:
    l, a, b = lab[..., 0], lab[..., 1], lab[..., 2]
    fy = (l + 16.0) / 116.0
    fx = fy + a / 500.0
    fz = fy - b / 200.0
    xyz = jnp.stack([_lab_finv(fx), _lab_finv(fy), _lab_finv(fz)], axis=-1)
    xyz = xyz * _WHITE
    lin = _apply_mat3(xyz, _XYZ2RGB)
    return linear_to_srgb(lin)


# --- CIEDE2000 (test metric) -------------------------------------------------


def ciede2000(lab1: jnp.ndarray, lab2: jnp.ndarray) -> jnp.ndarray:
    """CIEDE2000 color difference between two LAB images.

    Used as the fidelity gate for golden-frame tests (reference publishes
    CIEDE2000 tables in README.md:243-319).  Returns per-pixel dE, same
    leading shape as inputs minus the channel axis.
    """
    L1, a1, b1 = lab1[..., 0], lab1[..., 1], lab1[..., 2]
    L2, a2, b2 = lab2[..., 0], lab2[..., 1], lab2[..., 2]

    C1 = jnp.hypot(a1, b1)
    C2 = jnp.hypot(a2, b2)
    Cbar = 0.5 * (C1 + C2)
    G = 0.5 * (1.0 - jnp.sqrt(Cbar**7 / (Cbar**7 + 25.0**7 + 1e-30)))
    a1p = (1.0 + G) * a1
    a2p = (1.0 + G) * a2
    C1p = jnp.hypot(a1p, b1)
    C2p = jnp.hypot(a2p, b2)
    h1p = jnp.degrees(jnp.arctan2(b1, a1p)) % 360.0
    h2p = jnp.degrees(jnp.arctan2(b2, a2p)) % 360.0

    dLp = L2 - L1
    dCp = C2p - C1p
    dh = h2p - h1p
    dh = jnp.where(dh > 180.0, dh - 360.0, dh)
    dh = jnp.where(dh < -180.0, dh + 360.0, dh)
    dh = jnp.where(C1p * C2p == 0.0, 0.0, dh)
    dHp = 2.0 * jnp.sqrt(C1p * C2p) * jnp.sin(jnp.radians(dh) / 2.0)

    Lbp = 0.5 * (L1 + L2)
    Cbp = 0.5 * (C1p + C2p)
    hsum = h1p + h2p
    hdiff = jnp.abs(h1p - h2p)
    hbp = jnp.where(
        C1p * C2p == 0.0,
        hsum,
        jnp.where(
            hdiff <= 180.0,
            0.5 * hsum,
            jnp.where(hsum < 360.0, 0.5 * (hsum + 360.0), 0.5 * (hsum - 360.0)),
        ),
    )
    T = (
        1.0
        - 0.17 * jnp.cos(jnp.radians(hbp - 30.0))
        + 0.24 * jnp.cos(jnp.radians(2.0 * hbp))
        + 0.32 * jnp.cos(jnp.radians(3.0 * hbp + 6.0))
        - 0.20 * jnp.cos(jnp.radians(4.0 * hbp - 63.0))
    )
    dTheta = 30.0 * jnp.exp(-(((hbp - 275.0) / 25.0) ** 2))
    Rc = 2.0 * jnp.sqrt(Cbp**7 / (Cbp**7 + 25.0**7 + 1e-30))
    Sl = 1.0 + 0.015 * (Lbp - 50.0) ** 2 / jnp.sqrt(20.0 + (Lbp - 50.0) ** 2)
    Sc = 1.0 + 0.045 * Cbp
    Sh = 1.0 + 0.015 * Cbp * T
    Rt = -jnp.sin(jnp.radians(2.0 * dTheta)) * Rc
    return jnp.sqrt(
        (dLp / Sl) ** 2
        + (dCp / Sc) ** 2
        + (dHp / Sh) ** 2
        + Rt * (dCp / Sc) * (dHp / Sh)
    )
