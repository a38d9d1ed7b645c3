"""Pallas TPU kernels for the hot post-processing chain.

The BASELINE north star calls for the vsslib post-filters (YUV converts,
dark-area desaturation, luma-gradient chroma smoothing, hue colormap) to
fuse into Pallas kernels over batched frame tiles.  XLA fuses elementwise
chains well on its own; the Pallas version additionally pins the tile
schedule (8x128-aligned VMEM blocks over H x W) and keeps every
intermediate in registers/VMEM with exactly one HBM read and one write per
pixel — the speed-of-light memory profile for this bandwidth-bound stage.

``post_chain_pallas(frames, ...)`` == dark_tweak -> chroma_bright_tweak ->
colormap composition (filters.py) with hue ranges baked in as static
constants.  Numerics are validated against the jnp composition in
tests/test_pallas.py; the API layer uses the Pallas path on TPU when
``use_pallas=True``.
"""
from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

__all__ = ["post_chain_pallas", "post_chain_reference", "pallas_available"]


def pallas_available() -> bool:
    try:
        from jax.experimental import pallas as pl  # noqa: F401
        from jax.experimental.pallas import tpu as pltpu  # noqa: F401

        return jax.default_backend() in ("tpu",)
    except Exception:
        return False


# --- shared elementwise math (traced inside both the Pallas kernel and the
# jnp reference, guaranteeing identical numerics) ---------------------------


def _luma(r, g, b):
    return 0.299 * r + 0.587 * g + 0.114 * b


def _rgb_to_hsv(r, g, b):
    v = jnp.maximum(jnp.maximum(r, g), b)
    mn = jnp.minimum(jnp.minimum(r, g), b)
    c = v - mn
    safe_c = jnp.where(c > 0, c, 1.0)
    h_r = ((g - b) / safe_c) % 6.0
    h_g = (b - r) / safe_c + 2.0
    h_b = (r - g) / safe_c + 4.0
    h = jnp.where(v == r, h_r, jnp.where(v == g, h_g, h_b))
    h = jnp.where(c > 0, h / 6.0, 0.0)
    s = jnp.where(v > 0, c / jnp.where(v > 0, v, 1.0), 0.0)
    return h, s, v


def _hsv_to_rgb(h, s, v):
    h6 = (h % 1.0) * 6.0
    i = jnp.floor(h6)
    f = h6 - i
    p = v * (1.0 - s)
    q = v * (1.0 - s * f)
    t = v * (1.0 - s * (1.0 - f))
    i = i.astype(jnp.int32) % 6
    # nested where instead of jnp.select: select lowers through argmax,
    # which Mosaic doesn't support inside Pallas kernels
    def pick(c0, c1, c2, c3, c4, c5):
        return jnp.where(
            i == 0, c0,
            jnp.where(i == 1, c1,
                      jnp.where(i == 2, c2,
                                jnp.where(i == 3, c3,
                                          jnp.where(i == 4, c4, c5)))),
        )

    r = pick(v, q, p, p, t, v)
    g = pick(t, v, v, q, p, p)
    b = pick(p, p, t, v, v, q)
    return r, g, b


def _post_math(
    r, g, b,
    dark_thr: float, dark_white: float, dark_sat: float, dark_bright: float,
    sm_black: float, sm_white: float, sm_sat: float, sm_bright: float,
    cmap_ranges: Tuple[Tuple[float, float], ...], cmap_hue_shift: float,
    cmap_sat: float, cmap_weight: float,
):
    """The fused pixel program: dark tweak -> chroma smoothing -> colormap."""
    # ---- dark tweak (filters.dark_tweak): darken+desat dark regions
    h, s, v = _rgb_to_hsv(r, g, b)
    s_d = jnp.clip(s * dark_sat, 0.0, 1.0)
    v_d = jnp.clip(v * (1.0 + dark_bright), 0.0, 1.0)
    rd, gd, bd = _hsv_to_rgb(h, s_d, v_d)
    y = _luma(r, g, b)
    # gradient mask between dark_thr and dark_white on ORIGINAL luma —
    # exact w_luma_masked_merge constants (round()ed, grad to 3 decimals)
    maxw = round(dark_white * 255)
    tresh = min(round(dark_thr * 255), maxw - 10)
    grad = round(1.0 / (maxw - tresh), 3)
    w = jnp.clip((y * 255.0 - tresh) * grad, 0.0, 1.0)
    r1 = rd * (1 - w) + r * w
    g1 = gd * (1 - w) + g * w
    b1 = bd * (1 - w) + b * w

    # ---- chroma bright tweak (filters.chroma_bright_tweak)
    h, s, v = _rgb_to_hsv(r1, g1, b1)
    s_d = jnp.clip(s * sm_sat, 0.0, 1.0)
    v_d = jnp.clip(v * (1.0 + sm_bright), 0.0, 1.0)
    rs, gs, bs = _hsv_to_rgb(h, s_d, v_d)
    y1 = _luma(r1, g1, b1)
    maxw = round(sm_white * 255)
    tresh = min(round(sm_black * 255), maxw - 10)
    grad = round(1.0 / (maxw - tresh), 3)
    w = jnp.clip((y1 * 255.0 - tresh) * grad, 0.0, 1.0)
    r2 = rs * (1 - w) + r1 * w
    g2 = gs * (1 - w) + g1 * w
    b2 = bs * (1 - w) + b1 * w

    # ---- colormap (filters.colormap_filter): hue-shift inside ranges
    if cmap_ranges:
        h, s, v = _rgb_to_hsv(r2, g2, b2)
        h_deg = h * 360.0
        in_range = jnp.zeros_like(h, dtype=bool)
        for lo, hi in cmap_ranges:
            in_range = in_range | ((h_deg > lo) & (h_deg < hi))
        shift = min(max(int(cmap_hue_shift), -360), 360) / 360.0
        h_m = (h + shift) % 1.0
        s_m = jnp.clip(s * cmap_sat, 0.0, 1.0)
        rm, gm, bm = _hsv_to_rgb(h_m, s_m, v)
        m = in_range.astype(r2.dtype)
        r3 = r2 * (1 - m) + rm * m
        g3 = g2 * (1 - m) + gm * m
        b3 = b2 * (1 - m) + bm * m
        if cmap_weight > 0:
            # pull back toward the unmapped colors (hue!=0 branch of
            # adjust_chroma)
            r3 = r3 * (1 - cmap_weight) + r2 * cmap_weight
            g3 = g3 * (1 - cmap_weight) + g2 * cmap_weight
            b3 = b3 * (1 - cmap_weight) + b2 * cmap_weight
        r2, g2, b2 = r3, g3, b3

    return (
        jnp.clip(r2, 0.0, 1.0),
        jnp.clip(g2, 0.0, 1.0),
        jnp.clip(b2, 0.0, 1.0),
    )


def post_chain_reference(frames: jnp.ndarray, **kw) -> jnp.ndarray:
    """jnp oracle: the identical pixel program without Pallas."""
    r, g, b = frames[..., 0], frames[..., 1], frames[..., 2]
    r, g, b = _post_math(r, g, b, **_fill_defaults(kw))
    return jnp.stack([r, g, b], axis=-1)


def _fill_defaults(kw: dict) -> dict:
    out = dict(
        dark_thr=0.1, dark_white=0.3, dark_sat=0.3, dark_bright=-0.8,
        sm_black=0.3, sm_white=0.7, sm_sat=0.9, sm_bright=0.0,
        cmap_ranges=(), cmap_hue_shift=0.0, cmap_sat=1.0, cmap_weight=0.0,
    )
    out.update(kw)
    out["cmap_ranges"] = tuple(tuple(r) for r in out["cmap_ranges"])
    return out


@functools.partial(jax.jit, static_argnames=("params",))
def _post_chain_pallas_impl(frames: jnp.ndarray, params) -> jnp.ndarray:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    kw = dict(params)
    kw["cmap_ranges"] = tuple(tuple(r) for r in kw["cmap_ranges"])

    t, h0, w0, _ = frames.shape
    # pad to (8, 128) tile multiples (TPU sublane/lane constraints), crop
    # after — cheaper than shrinking tiles below hardware granularity
    tile_h, tile_w = 8, 128
    h = -(-h0 // tile_h) * tile_h
    w = -(-w0 // tile_w) * tile_w
    if (h, w) != (h0, w0):
        frames = jnp.pad(
            frames, ((0, 0), (0, h - h0), (0, w - w0), (0, 0)), mode="edge"
        )
    # planar layout for clean (sublane, lane) tiling
    planar = frames.transpose(0, 3, 1, 2)  # (T, 3, H, W)

    grid = (t, h // tile_h, w // tile_w)
    spec = pl.BlockSpec(
        (1, 3, tile_h, tile_w),
        lambda i, j, k: (i, 0, j, k),
        memory_space=pltpu.VMEM,
    )

    def squeeze_kernel(in_ref, out_ref):
        r = in_ref[0, 0]
        g = in_ref[0, 1]
        b = in_ref[0, 2]
        ro, go, bo = _post_math(r, g, b, **kw)
        out_ref[0, 0] = ro
        out_ref[0, 1] = go
        out_ref[0, 2] = bo

    out = pl.pallas_call(
        squeeze_kernel,
        out_shape=jax.ShapeDtypeStruct(planar.shape, planar.dtype),
        grid=grid,
        in_specs=[spec],
        out_specs=spec,
    )(planar)
    return out.transpose(0, 2, 3, 1)[:, :h0, :w0]


def post_chain_pallas(frames: jnp.ndarray, **kw) -> jnp.ndarray:
    """Fused post chain on TPU via Pallas; falls back to the jnp program
    off-TPU.  ``frames``: (T, H, W, 3) float32 RGB [0,1]."""
    params = _fill_defaults(kw)
    if not pallas_available():
        return post_chain_reference(frames, **params)
    hashable = tuple(sorted(
        (k, v if not isinstance(v, tuple) else v) for k, v in params.items()
    ))
    return _post_chain_pallas_impl(frames, hashable)
