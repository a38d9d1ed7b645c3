"""The eight model-combine ("merge") methods as batched jnp kernels.

TPU-native rebuild of the reference's merge engine (reference:
vsdeoldify/vsslib/mcomb.py:116-516, imfilters.py:160-269), which blends the
"stable" colorizer output (DeOldify) with the "vivid" one (DDColor) per
frame.  Method ids match the reference:

* 2 ``SimpleMerge``            — weighted lerp
* 3 ``ConstrainedChromaMerge`` — YUV chroma clamp +/-alpha, dark red-fix,
                                  double re-merge composition
* 4 ``LumaMaskedMerge``        — (gradient) luma mask merge
* 5 ``AdaptiveLumaMerge``      — weight decays with frame luma
* 6 ``ChromaRetentionMerge``   — gray-pixel gradient color restore
* 7 ``ChromaBoundAdaptiveMerge`` — Laplacian-texture adaptive chroma clamp

All kernels take ``(..., H, W, 3)`` RGB in [0,1] batches and are pure
functions — per-frame scalar branches in the reference (mean-luma gates)
become ``jnp.where`` selects over per-frame reductions so the whole merge
stage jits and fuses into one XLA program.  Scene-change gating (the
reference only merges on scene-change frames in exemplar mode) is handled
by the pipeline layer masking frames, not here.
"""
from __future__ import annotations

from functools import partial

import jax.numpy as jnp
from jax import lax

from .chroma import (
    adjust_chroma,
    gradient_mask,
    mask_merge,
    parse_hue_ranges,
    restore_color,
    restore_color_gradient,
    tweak,
    weighted_merge,
)
from .colorspace import luma, rgb_to_hsv, rgb_to_yuv, yuv_to_rgb
from .resize import resize

__all__ = [
    "simple_merge",
    "luma_masked_merge",
    "w_luma_masked_merge",
    "adaptive_luma_merge",
    "constrained_chroma_merge",
    "chroma_bound_adaptive_merge",
    "chroma_retention_merge",
    "combine_models",
    "luma_blend",
    "DEF_CMC_p",
    "DEF_LMM_p",
    "DEF_ALM_p",
    "DEF_CRT_p",
]

# Default parameter packs (reference: vsslib/constants.py:19-22).
DEF_CMC_p = [0.15, True, 20, 24]
DEF_LMM_p = [0.15, 0.65, 1.0]
DEF_ALM_p = [0.8, 1.0, 0.15]
DEF_CRT_p = [0.8, 30, 2, False, 0, 0]


def _frame_luma(rgb: jnp.ndarray) -> jnp.ndarray:
    """Mean Rec.601 luma per frame, shape (..., 1, 1, 1) for broadcasting."""
    return jnp.mean(luma(rgb), axis=(-2, -1))[..., None, None, None]


def simple_merge(a: jnp.ndarray, b: jnp.ndarray, b_weight: float = 0.5) -> jnp.ndarray:
    """Method 2: plain weighted merge (mcomb.SimpleMerge)."""
    return weighted_merge(a, b, b_weight)


def luma_masked_merge(
    dark: jnp.ndarray, white: jnp.ndarray, luma_limit: float = 0.4
) -> jnp.ndarray:
    """Binary luma mask: pixels of ``white`` with luma > limit kept, rest
    filled from ``dark`` (imfilters.image_luma_merge)."""
    mask = (luma(white) > luma_limit).astype(white.dtype)
    return mask_merge(dark, white, mask)


def w_luma_masked_merge(
    dark: jnp.ndarray,
    white: jnp.ndarray,
    dark_luma: float = 0.3,
    white_luma: float = 0.9,
) -> jnp.ndarray:
    """Gradient luma mask merge (imfilters.w_image_luma_merge +
    nputils.w_np_rgb_to_gray): linear ramp of the mask from ``dark_luma`` to
    ``white_luma`` on the luma of ``white``."""
    if dark_luma >= white_luma:
        return dark
    y255 = luma(white) * 255.0
    max_white = round(white_luma * 255)
    tresh = min(round(dark_luma * 255), max_white - 10)
    grad = round(1.0 / (max_white - tresh), 3)
    w = jnp.clip((y255 - tresh) * grad, 0.0, 1.0)
    return mask_merge(dark, white, w)


def luma_blend(
    a: jnp.ndarray,
    b: jnp.ndarray,
    luma_limit: float = 0.4,
    alpha: float = 0.90,
    min_w: float = 0.15,
    decay: float = 4.0,
) -> jnp.ndarray:
    """Frame-luma-driven blend (imfilters.image_luma_blend): below
    ``luma_limit`` the blend weight decays as ``alpha*(L/limit)**decay``."""
    fl = _frame_luma(a)
    bright_scale = jnp.clip((fl / luma_limit) ** decay, 0.0, 1.0)
    w = jnp.maximum(alpha * bright_scale, min_w)
    out = weighted_merge(a, b, w)
    return jnp.where(fl < luma_limit, out, b)


def adaptive_luma_merge(
    a: jnp.ndarray,
    b: jnp.ndarray,
    luma_threshold: float = 0.6,
    alpha: float = 1.0,
    b_weight: float = 0.5,
    min_weight: float = 0.15,
) -> jnp.ndarray:
    """Method 5 (mcomb.AdaptiveLumaMerge): DDColor weight decays as
    ``w*(luma/tht)**alpha`` (floored at min_weight) on dark frames."""
    fl = _frame_luma(b)
    bright_scale = (jnp.maximum(fl, 1e-6) / luma_threshold) ** alpha
    w_dark = jnp.maximum(b_weight * bright_scale, min_weight)
    w = jnp.where(fl < luma_threshold, w_dark, b_weight)
    return weighted_merge(a, b, w)


# --- chroma-clamped merges ---------------------------------------------------

_RED_FIX_RANGES = parse_hue_ranges("280:360,0:30")


def _dark_red_fix(img: jnp.ndarray) -> jnp.ndarray:
    """Dark-frame red-shift correction (mcomb.py:350-362).

    The reference picks one of four saturation treatments from the frame's
    mean luma; here all four are computed (cheap at chroma resolution) and
    selected per frame with nested jnp.where.
    """
    fl = _frame_luma(img)

    def sat_in_red(img, sat):
        return adjust_chroma(img, _RED_FIX_RANGES, sat=sat, hue=0, weight=0.0)

    # luma in (0.2, 0.3]: sat 0.9 on red range, gradient-luma remerge 0.2-0.3
    img_d1 = w_luma_masked_merge(sat_in_red(img, 0.9), img, 0.2, 0.3)
    # luma in (0.1, 0.2]: sat 0.8 on red range, gradient remerge 0.1-0.2
    img_d2 = w_luma_masked_merge(sat_in_red(img, 0.8), img, 0.1, 0.2)
    # luma <= 0.1: global desaturation 0.7
    img_d3 = tweak(img, sat=0.7)

    out = jnp.where(fl > 0.3, img, img_d1)
    out = jnp.where(fl > 0.2, out, jnp.where(fl > 0.1, img_d2, img_d3))
    return out


def chroma_limit(
    stable: jnp.ndarray, new: jnp.ndarray, alpha: float = 0.15
) -> jnp.ndarray:
    """Clamp chroma of ``new`` within +/-alpha (relative, on the offset
    0..1 chroma encoding) of ``stable``'s chroma; luma from ``stable``
    (imfilters.chroma_stabilizer)."""
    yuv1 = rgb_to_yuv(stable)
    yuv2 = rgb_to_yuv(new)
    u1, v1 = yuv1[..., 1], yuv1[..., 2]
    u2 = jnp.clip(yuv2[..., 1], u1 * (1 - alpha), jnp.clip(u1 * (1 + alpha), 0, 1))
    v2 = jnp.clip(yuv2[..., 2], v1 * (1 - alpha), jnp.clip(v1 * (1 + alpha), 0, 1))
    # the reference saturates at every uint8 cast; clip the RGB reconstruction
    return jnp.clip(yuv_to_rgb(jnp.stack([yuv1[..., 0], u2, v2], axis=-1)), 0.0, 1.0)


def constrained_chroma_merge(
    a: jnp.ndarray,
    b: jnp.ndarray,
    b_weight: float = 0.5,
    chroma_threshold: float = 0.2,
    red_fix: bool = True,
) -> jnp.ndarray:
    """Method 3 (mcomb.py:171-177 + ConstrainedChromaMerge): chroma clamp
    with optional dark red-fix, then the double re-merge composition
    ``SimpleMerge(CCM, SimpleMerge(a, b, min(w, 0.6)), 0.3)``."""
    stab = chroma_limit(a, b, chroma_threshold)
    if b_weight < 1.0:
        stab = weighted_merge(a, stab, b_weight)
    if red_fix:
        stab = _dark_red_fix(stab)
    clip_m = simple_merge(a, b, min(b_weight, 0.6))
    return simple_merge(stab, clip_m, 0.3)


def _laplacian(y: jnp.ndarray) -> jnp.ndarray:
    """3x3 Laplacian (cv2.Laplacian default kernel) with replicate border.

    Expressed as a depthwise conv so XLA fuses it; input (..., H, W).
    """
    k = jnp.array(
        [[0.0, 1.0, 0.0], [1.0, -4.0, 1.0], [0.0, 1.0, 0.0]], dtype=y.dtype
    )
    batch_shape = y.shape[:-2]
    x = y.reshape((-1,) + y.shape[-2:])[:, None]  # (N,1,H,W)
    x = jnp.pad(x, ((0, 0), (0, 0), (1, 1), (1, 1)), mode="edge")
    out = lax.conv_general_dilated(
        x, k[None, None], window_strides=(1, 1), padding="VALID"
    )
    return out[:, 0].reshape(batch_shape + y.shape[-2:])


def chroma_bound_adaptive_merge(
    a: jnp.ndarray,
    b: jnp.ndarray,
    red_fix: bool = True,
    base_tol: int = 14,
    max_extra: int = 18,
    b_weight: float = 0.5,
) -> jnp.ndarray:
    """Method 7 (mcomb.ChromaBoundAdaptiveMerge +
    imfilters.chroma_stabilizer_adaptive): per-pixel chroma tolerance
    ``base_tol + max_extra * |Laplacian(Y)|`` on centered chroma.

    ``base_tol``/``max_extra`` are quoted on the reference's 0..255 scale.
    """
    yuv1 = rgb_to_yuv(a)
    yuv2 = rgb_to_yuv(b)
    y1 = yuv1[..., 0]
    u1, v1 = yuv1[..., 1] - 0.5, yuv1[..., 2] - 0.5
    u2, v2 = yuv2[..., 1] - 0.5, yuv2[..., 2] - 0.5
    # reference computes Laplacian on Y in 0..255 then /255 and clips to 1
    texture = jnp.clip(jnp.abs(_laplacian(y1 * 255.0)) / 255.0, 0.0, 1.0)
    tol = (base_tol + max_extra * texture) / 255.0
    u2m = jnp.clip(u2, jnp.clip(u1 - tol, -0.5, 0.5), jnp.clip(u1 + tol, -0.5, 0.5))
    v2m = jnp.clip(v2, jnp.clip(v1 - tol, -0.5, 0.5), jnp.clip(v1 + tol, -0.5, 0.5))
    out = jnp.clip(
        yuv_to_rgb(jnp.stack([y1, u2m + 0.5, v2m + 0.5], axis=-1)), 0.0, 1.0
    )
    if b_weight < 1.0:
        out = weighted_merge(a, out, b_weight)
    if red_fix:
        out = _dark_red_fix(out)
    return out


def chroma_retention_merge(
    a: jnp.ndarray,
    b: jnp.ndarray,
    sat: float = 0.8,
    tht: int = 30,
    b_weight: float = 0.9,
    alpha: float = 2.0,
    mask_weight: float = 0.0,
    chroma_resize: bool = True,
    binary_mask: bool = False,
    algo: int = 0,
    return_mask: bool = False,
) -> jnp.ndarray:
    """Method 6 (mcomb.ChromaRetentionMerge): restore colors of gray pixels
    of ``a`` from ``b``, optionally at reduced "chroma resolution" with the
    full-res luma re-married afterwards.  ``return_mask=True`` returns the
    gray-pixel selection mask as a 3-channel image (reference
    ChromaRetentionMerge return_mask debugging aid)."""
    alpha = max(min(alpha, 10.0), 1.0)
    h, w = a.shape[-3], a.shape[-2]
    work_a, work_b = a, b
    did_resize = False
    if chroma_resize:
        rf = min(max(int(0.4 * w / 16), 16), 48)
        frame_size = min(rf * 16, w)
        if frame_size < w:
            work_a = resize(a, frame_size, frame_size, "spline64")
            work_b = resize(b, frame_size, frame_size, "spline64")
            did_resize = True
    if binary_mask:
        # reference passes (clip, clip_color) = (a, b) with a as the image
        # to repair: restore_color(color=b, gray=a)
        restored = restore_color(
            color=work_b, gray=work_a, sat=sat, tht=tht,
            weight=mask_weight, tht_scen=1.0, return_mask=return_mask,
        )
    else:
        restored = restore_color_gradient(
            color=work_b, gray=work_a, sat=sat, tht=tht,
            weight=mask_weight, alpha=alpha, algo=algo,
            return_mask=return_mask,
        )
    if return_mask:
        mask = restored[..., None] * jnp.ones((3,), restored.dtype)
        if did_resize:
            mask = resize(mask, h, w, "spline64")
        return jnp.clip(mask, 0.0, 1.0)
    if did_resize:
        restored = resize(restored, h, w, "spline64")
        # re-marry full-res luma (vs_sc_recover_clip_luma)
        yuv_r = rgb_to_yuv(restored)
        restored = yuv_to_rgb(
            jnp.stack([luma(a), yuv_r[..., 1], yuv_r[..., 2]], axis=-1)
        )
    return weighted_merge(a, restored, b_weight)


def combine_models(
    a: jnp.ndarray,
    b: jnp.ndarray,
    method: int = 2,
    sat: tuple = (1.0, 1.0),
    hue: tuple = (0.0, 0.0),
    b_weight: float = 0.5,
    cmc_p=None,
    lmm_p=None,
    alm_p=None,
    crt_p=None,
    invert_clips: bool = False,
) -> jnp.ndarray:
    """Dispatch over the merge methods (mcomb.vs_sc_combine_models).

    ``a`` is the stable colorizer (DeOldify), ``b`` the vivid one (DDColor).
    """
    cmc_p = list(cmc_p or DEF_CMC_p)
    lmm_p = list(lmm_p or DEF_LMM_p)
    alm_p = list(alm_p or DEF_ALM_p)
    crt_p = list(crt_p or DEF_CRT_p)
    if len(cmc_p) == 1:
        cmc_p = cmc_p + [True, 20, 24]

    if invert_clips:
        a, b = b, a
    if a is not None and (hue[0] != 0 or sat[0] != 1):
        a = tweak(a, hue=hue[0], sat=sat[0])
    if b is not None and (hue[1] != 0 or sat[1] != 1):
        b = tweak(b, hue=hue[1], sat=sat[1])
    if a is None:
        return b
    if b is None:
        return a

    if method == 2:
        return simple_merge(a, b, b_weight)
    if method == 3:
        return constrained_chroma_merge(a, b, b_weight, cmc_p[0], cmc_p[1])
    if method == 4:
        luma_mask_limit, luma_white_limit, luma_mask_sat = lmm_p
        c = tweak(a, sat=luma_mask_sat) if luma_mask_sat < 1 else a
        if luma_mask_limit == luma_white_limit:
            masked = luma_masked_merge(c, b, luma_mask_limit)
        else:
            masked = w_luma_masked_merge(c, b, luma_mask_limit, luma_white_limit)
        if b_weight < 1.0:
            return weighted_merge(a, masked, b_weight)
        return masked
    if method == 5:
        return adaptive_luma_merge(a, b, alm_p[0], alm_p[1], b_weight, alm_p[2])
    if method == 6:
        return chroma_retention_merge(
            a, b, sat=crt_p[0], tht=crt_p[1], b_weight=b_weight,
            alpha=crt_p[2], chroma_resize=crt_p[3], mask_weight=crt_p[4],
            algo=crt_p[5],
        )
    if method == 7:
        return chroma_bound_adaptive_merge(
            a, b, red_fix=cmc_p[1], base_tol=cmc_p[2], max_extra=cmc_p[3],
            b_weight=b_weight,
        )
    raise ValueError(f"HAVC: unsupported merge method {method}")
