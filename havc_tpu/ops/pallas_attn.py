"""Pallas TPU kernel for ColorMNet's local window attention.

The per-frame hot loop of the exemplar engine (SURVEY hard-part #3):
window-15 attention between the current frame's keys and the last memory
frame (models/colormnet.py LocalAttention; reference attention.py:714-915
uses a CUDA spatial_correlation_sampler).

Why a kernel: the XLA fallback unfolds k and v into (H, W, 225, C) patch
tensors in HBM.  At the published geometry (h16 x w16 = 14 x 28, Cv = 1024)
the value unfold alone is ~361 MB of HBM traffic per frame — while the
actual compute is only ~0.2 GFLOP.  This kernel keeps the whole problem
VMEM-resident (q/k/v/attn ~ a few MB) and walks the 225 window offsets with
shifted elementwise multiply-accumulates on the VPU: HBM traffic drops to
the O(HW*C) inputs/outputs.

Layout notes (pallas_guide: lane dim = 128): channel-last tensors with
C = 64/1024 map cleanly onto (8,128) f32 tiles; the 225-offset axis lives
in a (225, H, W) scratch so the per-offset store is a major-axis dynamic
slice.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["local_window_attention", "local_window_attention_reference"]


def _kernel(q_ref, k_ref, v_ref, rel_ref, mask_ref, out_ref, logit_scratch,
            *, h: int, w: int, win: int, d_qk: int):
    # Mosaic constraint: dynamic slice offsets are only supported on the
    # MAJOR axis — loop dy dynamically (fori), unroll the 15 dx offsets
    # statically (minor-axis slices must be static).
    scale = 1.0 / math.sqrt(d_qk)
    q = q_ref[:] * scale  # (h, w, d_qk)

    def qk_body(dy, _):
        krows = k_ref[pl.ds(dy, h), :, :]  # (h, w+2p, d_qk)
        for dx in range(win):
            kwin = krows[:, dx:dx + w, :]
            logit_scratch[pl.ds(dy * win + dx, 1), :, :] = jnp.sum(
                q * kwin, axis=-1, dtype=jnp.float32
            )[None]
        return 0

    jax.lax.fori_loop(0, win, qk_body, 0)

    logits = logit_scratch[:] + rel_ref[:]  # (win*win, h, w)
    logits = jnp.where(mask_ref[:] > 0.5, logits, -1e8)
    m = jnp.max(logits, axis=0, keepdims=True)
    e = jnp.exp(logits - m)
    attn = e / jnp.sum(e, axis=0, keepdims=True)
    logit_scratch[:] = attn

    out_ref[:] = jnp.zeros(out_ref.shape, out_ref.dtype)

    def av_body(dy, _):
        # accumulate straight into the output ref: no multi-MB loop carry,
        # and each v window is sliced on demand (mixed dynamic-major /
        # static-minor slice) instead of materializing whole padded rows
        acc = out_ref[:]
        for dx in range(win):
            vwin = v_ref[pl.ds(dy, h), dx:dx + w, :]  # (h, w, d_vu)
            a = logit_scratch[pl.ds(dy * win + dx, 1), :, :][0]  # (h, w)
            acc = acc + a[:, :, None] * vwin
        out_ref[:] = acc
        return 0

    jax.lax.fori_loop(0, win, av_body, 0)


@functools.partial(jax.jit, static_argnames=("max_dis", "interpret"))
def local_window_attention(
    q: jnp.ndarray,  # (B, H, W, d_qk)
    k: jnp.ndarray,  # (B, H, W, d_qk)
    v: jnp.ndarray,  # (B, H, W, d_vu)
    rel: jnp.ndarray,  # (B, H, W, win*win) relative position logits
    max_dis: int = 7,
    interpret: bool = False,
) -> jnp.ndarray:
    """Masked window-(2*max_dis+1) attention, VMEM-resident.

    Equivalent to the unfold-einsum path of models/colormnet.LocalAttention
    (without its projections): returns (B, H, W, d_vu) f32.
    """
    win = 2 * max_dis + 1
    b, h, w, d_qk = q.shape
    d_vu = v.shape[-1]

    pad = ((max_dis, max_dis), (max_dis, max_dis), (0, 0))
    # border-validity mask, (win*win, h, w)
    ys = jnp.arange(h)[None, :, None]
    xs = jnp.arange(w)[None, None, :]
    offs = jnp.arange(win * win)[:, None, None]
    dy = offs // win - max_dis
    dx = offs % win - max_dis
    mask = (
        (ys + dy >= 0) & (ys + dy < h) & (xs + dx >= 0) & (xs + dx < w)
    ).astype(jnp.float32)

    kern = functools.partial(_kernel, h=h, w=w, win=win, d_qk=d_qk)
    call = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((h, w, d_vu), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # q
            pl.BlockSpec(memory_space=pltpu.VMEM),  # k padded
            pl.BlockSpec(memory_space=pltpu.VMEM),  # v padded
            pl.BlockSpec(memory_space=pltpu.VMEM),  # rel
            pl.BlockSpec(memory_space=pltpu.VMEM),  # mask
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((win * win, h, w), jnp.float32)],
        interpret=interpret,
    )

    def one(qi, ki, vi, reli):
        kp = jnp.pad(ki.astype(jnp.float32), pad)
        vp = jnp.pad(vi.astype(jnp.float32), pad)
        rel_t = reli.astype(jnp.float32).transpose(2, 0, 1)  # (win*win,h,w)
        return call(qi.astype(jnp.float32), kp, vp, rel_t, mask)

    return jax.vmap(one)(q, k, v, rel)


def local_window_attention_reference(q, k, v, rel, max_dis: int = 7):
    """Unfold-einsum oracle (the XLA path) for kernel validation."""
    win = 2 * max_dis + 1
    b, h, w, _ = q.shape

    def unfold(x):
        n, c = x.shape[0], x.shape[-1]
        patches = jax.lax.conv_general_dilated_patches(
            x.transpose(0, 3, 1, 2), (win, win), (1, 1),
            [(max_dis, max_dis)] * 2,
        )
        return patches.reshape(n, c, win * win, h, w).transpose(0, 3, 4, 2, 1)

    scale = 1.0 / math.sqrt(q.shape[-1])
    k_unf = unfold(k)
    qk = jnp.einsum("bhwc,bhwnc->bhwn", q * scale, k_unf,
                    preferred_element_type=jnp.float32)
    ones = jnp.ones((1, h, w, 1), q.dtype)
    mask = unfold(ones)[..., 0]
    qk = qk + rel.astype(jnp.float32)
    qk = jnp.where(mask > 0.5, qk, -1e8)
    attn = jax.nn.softmax(qk, axis=-1)
    v_unf = unfold(v)
    return jnp.einsum("bhwn,bhwnc->bhwc", attn, v_unf,
                      preferred_element_type=jnp.float32)
