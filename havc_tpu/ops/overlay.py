"""Blend-mode compositor (HAVC_clip_overlay).

Rebuild of the reference's overlay tool (reference:
vsdeoldify/__init__.py:3029-3148): 9 blend modes expressed as std.Expr RPN
strings there; plain fused jnp arithmetic here.  Values in [0,1]
(peak=1, neutral=0.5 — the float-format branch of the reference).
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

__all__ = ["overlay", "BLEND_MODES"]

BLEND_MODES = (
    "normal", "addition", "average", "difference", "divide",
    "exclusion", "multiply", "overlay", "subtract",
)


def _blend(mode: str, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """x = overlay, y = base (matching the reference's Expr operand order)."""
    if mode == "normal":
        return x
    if mode == "addition":
        return x + y
    if mode == "average":
        return (x + y) / 2
    if mode == "difference":
        return jnp.abs(x - y)
    if mode == "divide":
        return jnp.where(y <= 0, 1.0, jnp.minimum(x / jnp.maximum(y, 1e-6), 1.0))
    if mode == "exclusion":
        return x + y - 2 * x * y
    if mode == "multiply":
        return x * y
    if mode == "overlay":
        return jnp.where(x < 0.5, 2 * x * y, 1 - 2 * (1 - x) * (1 - y))
    if mode == "subtract":
        return x - y
    raise ValueError(f"overlay: invalid mode '{mode}'")


def overlay(
    base: jnp.ndarray,
    over: jnp.ndarray,
    x: int = 0,
    y: int = 0,
    mask: Optional[jnp.ndarray] = None,
    opacity: float = 1.0,
    mode: str = "normal",
) -> jnp.ndarray:
    """Composite ``over`` onto ``base`` at (x, y) with mask/opacity/mode.

    ``base``/``over``: (..., H, W, 3); ``mask``: (..., h, w) or (...,h,w,1)
    in [0,1], same size as ``over``.
    """
    bh, bw = base.shape[-3], base.shape[-2]
    oh, ow = over.shape[-3], over.shape[-2]

    # crop the overlay to the visible region, then pad to base size
    cl, pl = max(-x, 0), max(x, 0)
    ct, pt = max(-y, 0), max(y, 0)
    cr = max((x + ow) - bw, 0)
    cb = max((y + oh) - bh, 0)
    over_c = over[..., ct : oh - cb, cl : ow - cr, :]
    pad = [(0, 0)] * (over.ndim - 3) + [
        (pt, bh - pt - over_c.shape[-3]),
        (pl, bw - pl - over_c.shape[-2]),
        (0, 0),
    ]
    over_p = jnp.pad(over_c, pad)

    if mask is None:
        m = jnp.zeros(base.shape[:-1], base.dtype)
        m = m.at[..., pt : pt + over_c.shape[-3], pl : pl + over_c.shape[-2]].set(1.0)
    else:
        if mask.ndim == over.ndim:
            mask = mask[..., 0]
        m_c = mask[..., ct : oh - cb, cl : ow - cr]
        pad_m = [(0, 0)] * (m_c.ndim - 2) + [
            (pt, bh - pt - m_c.shape[-2]),
            (pl, bw - pl - m_c.shape[-1]),
        ]
        m = jnp.pad(m_c, pad_m)
    m = jnp.clip(m * min(max(opacity, 0.0), 1.0), 0.0, 1.0)[..., None]

    blended = jnp.clip(_blend(mode.lower(), over_p, base), 0.0, 1.0)
    return base * (1 - m) + blended * m
