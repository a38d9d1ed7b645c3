"""Fast Global Smoother (Min et al. 2014) — the WLS edge-aware filter the
reference applies to Deep-Exemplar chroma (reference:
vsdeoldify/deepex/__init__.py:193-208:
``cv2.ximgproc.createFastGlobalSmootherFilter(guide_u8, lambda=500,
sigma_color=4)`` on the predicted LAB a/b planes, guide = L * 255/100 as
uint8).

Round-2 shipped a guided-filter stand-in with no fidelity bound; this is
the actual separable WLS solver: per row (then per column) the 1D system

    (I + lambda_t A) u = f,   A tridiagonal from guide weights
    w(p,q) = exp(-|I_p - I_q| / sigma_color)

solved exactly with the Thomas algorithm, iterated T=3 times with the
paper's lambda schedule ``lambda_t = 1.5 * lambda * 4^(T-t) / (4^T - 1)``
(OpenCV's lambda_attenuation=0.25 realizes the same ratios).

TPU mapping: the tridiagonal solves are ``lax.scan``s along the solve
axis, vectorized over all rows x channels (a (B*H, C) problem per scan
step — VPU-shaped).  Two scans per pass (forward elimination + back
substitution), two passes per iteration.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

__all__ = ["fgs_smooth", "fgs_smooth_ab"]


def _tridiag_thomas(a, b, c, f):
    """Solve a[i] u[i-1] + b[i] u[i] + c[i] u[i+1] = f[i] along axis 0.

    Shapes: (N, R) — N solve axis, R independent systems.  a[0] and
    c[N-1] must be 0.
    """
    def fwd(carry, x):
        cp_prev, dp_prev = carry
        ai, bi, ci, fi = x
        denom = bi - ai * cp_prev
        cp = ci / denom
        dp = (fi - ai * dp_prev) / denom
        return (cp, dp), (cp, dp)

    zeros = jnp.zeros_like(a[0])
    (_, _), (cps, dps) = lax.scan(fwd, (zeros, zeros), (a, b, c, f))

    def bwd(u_next, x):
        cp, dp = x
        u = dp - cp * u_next
        return u, u

    _, us = lax.scan(bwd, zeros, (cps, dps), reverse=True)
    return us


def _pass_axis(x, guide, lam, sigma, axis):
    """One horizontal/vertical WLS pass over (B, H, W, C) x with (B, H, W)
    guide; solve along ``axis`` (1=vertical columns, 2=horizontal rows)."""
    # move solve axis to front, flatten the rest
    xm = jnp.moveaxis(x, axis, 0)  # (N, ..., C)
    gm = jnp.moveaxis(guide, axis, 0)  # (N, ...)
    n = xm.shape[0]
    xr = xm.reshape(n, -1, x.shape[-1]).reshape(n, -1)  # (N, R*C)
    c_ch = x.shape[-1]
    gr = gm.reshape(n, -1)  # (N, R)

    d = jnp.abs(gr[1:] - gr[:-1])  # (N-1, R)
    w = jnp.exp(-d / sigma)
    lw = lam * w
    zeros = jnp.zeros_like(gr[:1])
    a = -jnp.concatenate([zeros, lw])  # (N, R): a[0] = 0
    c = -jnp.concatenate([lw, zeros])  # c[N-1] = 0
    b = 1.0 - a - c

    rep = lambda m: jnp.repeat(m[:, :, None], c_ch, axis=2).reshape(n, -1)
    us = _tridiag_thomas(rep(a), rep(b), rep(c), xr)
    return jnp.moveaxis(
        us.reshape(xm.shape), 0, axis
    )


def fgs_smooth(
    guide: jnp.ndarray,  # (B, H, W) guide plane (uint8-scale codes)
    x: jnp.ndarray,  # (B, H, W, C) planes to smooth
    lam: float = 500.0,
    sigma_color: float = 4.0,
    num_iter: int = 3,
) -> jnp.ndarray:
    """cv2.ximgproc FastGlobalSmoother equivalent."""
    guide = guide.astype(jnp.float32)
    out = x.astype(jnp.float32)
    denom = 4.0**num_iter - 1.0
    for t in range(1, num_iter + 1):
        lam_t = 1.5 * lam * (4.0 ** (num_iter - t)) / denom
        out = _pass_axis(out, guide, lam_t, sigma_color, axis=2)  # rows
        out = _pass_axis(out, guide, lam_t, sigma_color, axis=1)  # cols
    return out.astype(x.dtype)


def fgs_smooth_ab(lab_l: jnp.ndarray, ab: jnp.ndarray,
                  lam: float = 500.0, sigma_color: float = 4.0) -> jnp.ndarray:
    """The reference's exact WLS call on DeepEx output: guide =
    round(L * 255/100) uint8 codes (deepex/__init__.py:200-203), a/b
    planes filtered independently."""
    guide = jnp.round(
        jnp.clip(lab_l[..., 0] * (255.0 / 100.0), 0.0, 255.0)
    )
    return fgs_smooth(guide, ab, lam=lam, sigma_color=sigma_color)
