"""Fast Global Smoother (ops/fgs.py) — the DeepEx WLS filter
(deepex/__init__.py:193-208 cv2.ximgproc FastGlobalSmoother equivalent).
"""
import numpy as np
import pytest

import jax.numpy as jnp

from havc_tpu.ops.fgs import fgs_smooth, fgs_smooth_ab


def _numpy_fgs(guide, x, lam=500.0, sigma=4.0, num_iter=3):
    """Independent loop-based oracle: per-row/column Thomas solves with
    the paper's lambda schedule."""
    guide = guide.astype(np.float64)
    out = x.astype(np.float64).copy()
    b, h, w, c = out.shape
    denom = 4.0**num_iter - 1.0

    def solve_line(g, f, lam_t):
        n = len(g)
        wgt = np.exp(-np.abs(np.diff(g)) / sigma)
        a = np.zeros(n)
        cc = np.zeros(n)
        a[1:] = -lam_t * wgt
        cc[:-1] = -lam_t * wgt
        bb = 1.0 - a - cc
        # Thomas
        cp = np.zeros(n)
        dp = np.zeros((n,) + f.shape[1:])
        cp[0] = cc[0] / bb[0]
        dp[0] = f[0] / bb[0]
        for i in range(1, n):
            m = bb[i] - a[i] * cp[i - 1]
            cp[i] = cc[i] / m
            dp[i] = (f[i] - a[i] * dp[i - 1]) / m
        u = np.zeros_like(dp)
        u[-1] = dp[-1]
        for i in range(n - 2, -1, -1):
            u[i] = dp[i] - cp[i] * u[i + 1]
        return u

    for t in range(1, num_iter + 1):
        lam_t = 1.5 * lam * (4.0 ** (num_iter - t)) / denom
        for bi in range(b):
            for y in range(h):  # horizontal
                out[bi, y] = solve_line(guide[bi, y], out[bi, y], lam_t)
            for xx in range(w):  # vertical
                out[bi, :, xx] = solve_line(
                    guide[bi, :, xx], out[bi, :, xx], lam_t)
    return out


def test_fgs_matches_numpy_oracle():
    rng = np.random.default_rng(0)
    guide = (rng.random((1, 12, 16)) * 255).round().astype(np.float32)
    x = rng.standard_normal((1, 12, 16, 2)).astype(np.float32) * 20

    ref = _numpy_fgs(guide, x)
    got = np.asarray(fgs_smooth(jnp.asarray(guide), jnp.asarray(x)))
    err = np.abs(ref - got).max() / max(np.abs(ref).max(), 1e-3)
    assert err < 1e-4, f"rel err {err:.2e}"


def test_fgs_edge_aware():
    """Flat regions smooth strongly; guide edges block diffusion."""
    h = w = 32
    guide = np.zeros((1, h, w), np.float32)
    guide[:, :, w // 2:] = 255.0  # hard edge in the guide
    rng = np.random.default_rng(1)
    x = np.zeros((1, h, w, 1), np.float32)
    x[:, :, : w // 2] = 10.0
    x[:, :, w // 2:] = -10.0
    x += rng.standard_normal(x.shape).astype(np.float32)

    out = np.asarray(fgs_smooth(jnp.asarray(guide), jnp.asarray(x)))
    # noise crushed within each side
    assert out[0, :, : w // 2 - 2].std() < 0.4
    assert out[0, :, w // 2 + 2:].std() < 0.4
    # the edge survives (no bleed across the guide discontinuity)
    assert out[0, :, : w // 2 - 2].mean() > 8.0
    assert out[0, :, w // 2 + 2:].mean() < -8.0


def test_fgs_ab_guide_quantization():
    """fgs_smooth_ab quantizes the L guide to uint8 codes (the reference
    casts to uint8 before building the filter)."""
    rng = np.random.default_rng(2)
    l = rng.random((1, 8, 8, 1)).astype(np.float32) * 100
    ab = rng.standard_normal((1, 8, 8, 2)).astype(np.float32) * 30
    out = np.asarray(fgs_smooth_ab(jnp.asarray(l), jnp.asarray(ab)))
    guide = np.round(np.clip(l[..., 0] * 255 / 100, 0, 255))
    ref = _numpy_fgs(guide, ab)
    assert np.abs(out - ref).max() / np.abs(ref).max() < 1e-4


@pytest.mark.skipif(
    not hasattr(__import__("cv2"), "ximgproc"),
    reason="cv2.ximgproc unavailable (expected offline)",
)
def test_fgs_matches_opencv():  # pragma: no cover - env-dependent
    import cv2

    rng = np.random.default_rng(3)
    guide = (rng.random((24, 24)) * 255).astype(np.uint8)
    x = rng.standard_normal((24, 24)).astype(np.float32) * 10
    f = cv2.ximgproc.createFastGlobalSmootherFilter(guide, 500, 4)
    ref = f.filter(x)
    got = np.asarray(fgs_smooth(
        jnp.asarray(guide[None].astype(np.float32)),
        jnp.asarray(x[None, :, :, None]),
    ))[0, :, :, 0]
    assert np.abs(ref - got).max() / max(np.abs(ref).max(), 1e-3) < 0.05
