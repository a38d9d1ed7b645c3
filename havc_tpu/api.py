"""Public HAVC_* API — mirror of the reference's vsdeoldify/__init__.py
entry points, operating on :class:`havc_tpu.clip.Clip`.

Implemented against the reference's semantics with file:line citations on
each function.  Parameter names, packs, and defaults match the reference so
a vs-deoldify user can port scripts directly.
"""
from __future__ import annotations

import math
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from . import engines, filters, presets
from .utils import cached_jit
from .clip import Clip, from_frames
from .ops import chroma as chroma_ops
from .ops import equalize, lut3d
from .ops import merge as merge_ops
from .ops import retinex as retinex_ops
from .ops import temporal as temporal_ops
from .ops import tiles as tiles_ops
from .ops.resize import resize
from .scene.detect import SceneDetector, SceneFlags, scene_detect

__all__ = [
    "HAVC_main",
    "HAVC_main_presets",
    "HAVC_main_colorizer",
    "HAVC_colorizer",
    "HAVC_stabilizer",
    "HAVC_merge",
    "HAVC_bw_tune",
    "HAVC_auto_levels",
    "HAVC_retinex",
    "HAVC_rgb_denoise",
    "HAVC_adjust_rgb",
    "HAVC_tweak",
    "HAVC_TimeCube",
    "HAVC_SceneDetect",
    "HAVC_extract_reference_frames",
    "HAVC_export_reference_frames",
    "HAVC_clip_slice",
    "HAVC_clip_reconstruct",
    "HAVC_recover_clip_color",
    "HAVC_set_debug_level",
    "DEF_TWEAK_p",
]

from .ops.merge import DEF_ALM_p, DEF_CMC_p, DEF_CRT_p, DEF_LMM_p

DEF_TWEAK_p = engines.DEF_TWEAK_p

_DEBUG_LEVEL = [0]


def HAVC_set_debug_level(level: int = 0):
    """Mirror of HAVC_set_debug_level (__init__.py:3440)."""
    _DEBUG_LEVEL[0] = level


def _batched(clip: Clip, fn, batch_size: int = 8) -> Clip:
    return clip.map_batches(fn, batch_size=batch_size)


def _batched2(clipa: Clip, clipb: Clip, fn, batch_size: int = 8):
    """Two-clip batch map with edge-replicated tail padding.  Residency
    follows ``clipa`` (device in -> device out)."""
    T = clipa.num_frames
    on_dev = clipa.on_device
    outs = []
    for s in range(0, T, batch_size):
        a = jnp.asarray(clipa.frames[s : s + batch_size])
        b = jnp.asarray(clipb.frames[s : s + batch_size])
        n = a.shape[0]
        if n < batch_size:
            a = jnp.concatenate([a, jnp.repeat(a[-1:], batch_size - n, 0)])
            b = jnp.concatenate([b, jnp.repeat(b[-1:], batch_size - n, 0)])
        r = fn(a, b)
        outs.append(r[:n] if on_dev else np.asarray(r)[:n])
    joined = jnp.concatenate(outs) if on_dev else np.concatenate(outs)
    return clipa.with_frames(joined)


# --------------------------------------------------------------------------
# HAVC_colorizer — the core colorize step (__init__.py:2290-2523)
# --------------------------------------------------------------------------


def HAVC_colorizer(
    clip: Clip,
    method: int = 2,
    mweight: float = 0.4,
    deoldify_p=(0, 24, 1.0, 0.0),
    ddcolor_p=(1, 24, 1.0, 0.0, True),
    ddtweak=(False, False, False),
    ddtweak_p=(DEF_TWEAK_p, "300:360|0.8,0.1"),
    cmc_p=DEF_CMC_p,
    lmm_p=DEF_LMM_p,
    alm_p=DEF_ALM_p,
    crt_p=DEF_CRT_p,
    cmb_sw: bool = False,
    sc_threshold: float = 0.0,
    sc_tht_offset: int = 1,
    sc_min_freq: int = 0,
    sc_tht_ssim: float = 0.0,
    sc_normalize: bool = False,
    sc_min_int: int = 1,
    sc_tht_white: float = 0.70,
    sc_tht_black: float = 0.10,
    batch_size: int = 8,
) -> Clip:
    """Colorize using DeOldify and/or DDColor and combine (method 0-7).

    Mirror of HAVC_colorizer (__init__.py:2290-2523): optional scene
    detection (sets reference-frame flags), Spline64 square resize to
    ``max(rf)*16``, both engines, merge dispatch, chroma-resize restore.
    """
    if sc_threshold < 0:
        raise ValueError("HAVC_colorizer: sc_threshold must be >= 0")
    if sc_min_freq < 0:
        raise ValueError("HAVC_colorizer: sc_min_freq must be >= 0")

    if method == 0:
        merge_weight = 0.0
    elif method == 1:
        merge_weight = 1.0
    else:
        merge_weight = mweight
    if merge_weight == 0.0:
        method = 0
    elif merge_weight == 1.0:
        method = 1

    do_model, do_rf, do_sat, do_hue = deoldify_p[:4]
    dd_model, dd_rf, dd_sat, dd_hue = ddcolor_p[:4]

    if dd_rf != 0 and dd_rf not in range(10, 65):
        raise ValueError("HAVC_colorizer: ddcolor render_factor must be between: 10-64")
    if dd_rf == 0:
        dd_rf = min(max(math.trunc(0.4 * clip.width / 16), 16), 32)

    scenechange = not (sc_threshold == 0 and sc_min_freq == 0)
    if scenechange:
        # device-resident clips stay on device: frame_stats reduces on the
        # accelerator and only per-frame scalars (+ optional SSIM maps)
        # come back to host
        flags = scene_detect(
            clip.frames,
            threshold=sc_threshold,
            frequency=sc_min_freq,
            sc_tht_filter=sc_tht_ssim,
            min_length=sc_min_int,
            tht_white=sc_tht_white,
            tht_black=sc_tht_black,
            tht_offset=sc_tht_offset,
            normalize=sc_normalize,
        )
        clip = clip.with_sc(flags)

    frame_size = min(max(dd_rf, do_rf) * 16, clip.width)
    clip_orig = clip

    sc_prev = clip.sc.sc_prev if (scenechange and clip.sc is not None) else None

    # FUSED device pipeline (round-2 perf fix for the round-1 "host
    # round-trip per stage" weakness): work-resize -> both engines ->
    # combine -> per-engine tweak -> full-res chroma restore runs as ONE
    # jitted program per batch — frames cross host<->device once.  With
    # scene gating the same program runs over the GATHERED scene-change
    # frames only (round-3: the gated path previously materialized to
    # numpy between every stage and ran engines on all frames);
    # non-reference frames pass through unchanged (vs_sc_* f[0].copy()).
    sc_idx = (
        None if sc_prev is None
        else np.nonzero(np.asarray(sc_prev).astype(bool))[0]
    )
    return _colorize_fused(
        clip, method, merge_weight, do_model, do_rf, do_sat, do_hue,
        dd_model, dd_rf, dd_sat, dd_hue, ddtweak, ddtweak_p,
        cmc_p, lmm_p, alm_p, crt_p, cmb_sw, frame_size, batch_size,
        sc_idx=sc_idx,
    )


def _colorize_fused(
    clip: Clip, method: int, merge_weight: float,
    do_model: int, do_rf: int, do_sat: float, do_hue: float,
    dd_model: int, dd_rf: int, dd_sat: float, dd_hue: float,
    ddtweak, ddtweak_p, cmc_p, lmm_p, alm_p, crt_p, cmb_sw: bool,
    frame_size: int, batch_size: int,
    sc_idx: Optional[np.ndarray] = None,
) -> Clip:
    """HAVC_colorizer body as one jitted program per batch (no per-stage
    host materialization).  ``sc_idx`` selects the scene-change frames to
    colorize (gather/compute/scatter); others pass through."""
    do_fn = dd_fn = None
    do_params = dd_params = None
    if method != 1:
        do_fn, do_params = engines.make_deoldify_fn(do_model, do_rf)
    if method != 0:
        dd_fn, dd_params = engines.make_ddcolor_fn(
            dd_model, dd_rf, tweaks_flags=tuple(ddtweak), tweaks=ddtweak_p
        )

    def stage(params, frames):
        p_do, p_dd = params
        work = jnp.clip(resize(frames, frame_size, frame_size, "spline64"), 0.0, 1.0)
        if method == 0:
            combined = do_fn(p_do, work)
            if do_sat != 1 or do_hue != 0:
                combined = chroma_ops.tweak(combined, hue=do_hue, sat=do_sat)
        elif method == 1:
            combined = dd_fn(p_dd, work)
            if dd_sat != 1 or dd_hue != 0:
                combined = chroma_ops.tweak(combined, hue=dd_hue, sat=dd_sat)
        else:
            a = do_fn(p_do, work)
            b = dd_fn(p_dd, work)
            combined = merge_ops.combine_models(
                a, b, method=method, sat=(do_sat, dd_sat), hue=(do_hue, dd_hue),
                b_weight=merge_weight, cmc_p=cmc_p, lmm_p=lmm_p, alm_p=alm_p,
                crt_p=crt_p, invert_clips=cmb_sw,
            )
        return filters.chroma_resize_restore(frames, combined)

    fn = cached_jit(
        ("colorize_fused", method, merge_weight, do_model, do_rf, do_sat,
         do_hue, dd_model, dd_rf, dd_sat, dd_hue, tuple(ddtweak),
         str(ddtweak_p), tuple(cmc_p), tuple(lmm_p), tuple(alm_p),
         tuple(crt_p), cmb_sw, frame_size, clip.height, clip.width,
         batch_size),
        lambda: stage,
    )
    params = (do_params, dd_params)
    on_dev = clip.on_device
    xp = jnp if on_dev else np
    all_frames = clip.frames if on_dev else np.asarray(clip.frames)

    def run_over(arr):
        outs = []
        for s in range(0, len(arr), batch_size):
            chunk = jnp.asarray(arr[s : s + batch_size])
            n = chunk.shape[0]
            if n < batch_size:
                chunk = jnp.concatenate(
                    [chunk, jnp.repeat(chunk[-1:], batch_size - n, 0)]
                )
            r = fn(params, chunk)
            outs.append(r[:n] if on_dev else np.asarray(r)[:n])
        return xp.concatenate(outs) if outs else arr

    if sc_idx is None:
        return clip.with_frames(run_over(all_frames))
    if len(sc_idx) == 0:
        return clip
    if on_dev:
        # device scatter (no host copy of the full clip)
        out = all_frames.at[jnp.asarray(sc_idx)].set(
            run_over(all_frames[jnp.asarray(sc_idx)])
        )
    else:
        out = all_frames.copy()
        out[sc_idx] = run_over(all_frames[sc_idx])
    return clip.with_frames(out)


def _chroma_resize_clip(hires: Clip, lowres: Clip, batch_size: int = 8) -> Clip:
    """_clip_chroma_resize analog (__init__.py:3545-3560).  Output
    residency follows ``hires`` (device in -> device out)."""
    T = hires.num_frames
    on_dev = hires.on_device
    outs = []
    fn = cached_jit(("chroma_resize_restore",), lambda: filters.chroma_resize_restore)
    for s in range(0, T, batch_size):
        hi = jnp.asarray(hires.frames[s : s + batch_size])
        lo = jnp.asarray(lowres.frames[s : s + batch_size])
        n = hi.shape[0]
        if n < batch_size:
            hi = jnp.concatenate([hi, jnp.repeat(hi[-1:], batch_size - n, 0)])
            lo = jnp.concatenate([lo, jnp.repeat(lo[-1:], batch_size - n, 0)])
        r = fn(hi, lo)
        outs.append(r[:n] if on_dev else np.asarray(r)[:n])
    joined = jnp.concatenate(outs) if on_dev else np.concatenate(outs)
    return hires.with_frames(joined).copy_sc_from(lowres)


# --------------------------------------------------------------------------
# HAVC_stabilizer — post chain (__init__.py:2748-2873)
# --------------------------------------------------------------------------


def HAVC_stabilizer(
    clip: Clip,
    dark: bool = False,
    dark_p=(0.2, 0.8),
    smooth: bool = False,
    smooth_p=(0.3, 0.7, 0.9, 0.0, "none"),
    colormap: str = "none",
    colormap_p: str = "none",
    stab: bool = False,
    stab_p=(5, "A", 1, 15, 0.2, 0.15),
    deflicker: bool = True,
    render_factor: int = 24,
    use_pallas: bool = True,
    batch_size: int = 8,
) -> Clip:
    """Post-process chain: dark tweak -> chroma smoothing -> colormap ->
    temporal chroma stabilization -> deflicker, run at chroma resolution
    with full-res luma restored (HAVC_stabilizer, __init__.py:2748-2873)."""
    if render_factor != 0 and render_factor not in range(16, 65):
        raise ValueError("HAVC_stabilizer: render_factor must be between: 16-64")
    if render_factor == 0:
        render_factor = min(max(math.trunc(0.4 * clip.width / 16), 16), 32)

    # one upload, then the whole chain (downscale -> tweaks -> temporal
    # stabilize -> full-res chroma restore) stays device-resident; the
    # same device copy of the hi-res frames feeds both the downscale and
    # the final luma restore.  Output residency follows the input.
    on_dev_in = clip.on_device
    clip = clip.to_device()
    clip_orig = clip
    frame_size = min(render_factor * 16, clip.width)
    work = _batched(
        clip,
        lambda x: jnp.clip(resize(x, frame_size, frame_size, "spline64"), 0.0, 1.0),
        batch_size,
    )

    dark_hue_adjust = dark_p[2] if len(dark_p) > 2 else "none"
    chroma_adjust = smooth_p[4] if len(smooth_p) > 4 else "none"

    # fused Pallas fast path: dark + smooth + colormap in ONE kernel when
    # the per-stage hue-DSL extras aren't used (they need the full DSL)
    x = work
    cmap_l = (colormap or "none").lower()
    fusable = (
        use_pallas
        and dark and smooth
        and dark_hue_adjust in ("none", "")
        and chroma_adjust in ("none", "")
    )
    if fusable:
        from .ops.chroma import parse_hue_adjust
        from .ops.pallas_kernels import post_chain_pallas

        cmap_ranges, cmap_hue, cmap_sat, cmap_w = (), 0.0, 1.0, 0.0
        if cmap_l not in ("none", ""):
            cmap_str = presets.get_colormap(cmap_l, "light") if "->" in cmap_l else cmap_l
            pa = parse_hue_adjust(cmap_str)
            if pa is not None:
                cmap_ranges, cmap_sat, cmap_hue, cmap_w = (
                    pa.ranges, pa.sat, float(pa.hue), pa.weight
                )
        d_white = min(max(dark_p[0], 0.1), 0.50)
        d_sat = min(max(1.1 - dark_p[1], 0.10), 0.80)
        d_bright = -min(max(dark_p[1], 0.20), 0.90)
        x = x.with_frames(
            post_chain_pallas(
                jnp.asarray(x.frames),
                dark_thr=0.1, dark_white=d_white, dark_sat=d_sat,
                dark_bright=d_bright,
                sm_black=smooth_p[0], sm_white=smooth_p[1],
                sm_sat=smooth_p[2], sm_bright=-smooth_p[3],
                cmap_ranges=cmap_ranges, cmap_hue_shift=cmap_hue,
                cmap_sat=cmap_sat, cmap_weight=cmap_w,
            )
        )
    if dark and not fusable:
        x = _batched(
            x,
            lambda f: filters.dark_tweak(
                f, dark_threshold=dark_p[0], dark_amount=dark_p[1],
                dark_hue_adjust=dark_hue_adjust.lower(),
            ),
            batch_size,
        )
    if smooth and not fusable:
        x = _batched(
            x,
            lambda f: filters.chroma_bright_tweak(
                f, black_threshold=smooth_p[0], white_threshold=smooth_p[1],
                dark_sat=smooth_p[2], dark_bright=-smooth_p[3],
                chroma_adjust=chroma_adjust.lower(),
            ),
            batch_size,
        )
    cmap = cmap_l
    if cmap not in ("none", "") and not fusable:
        cmap_adjust = presets.get_colormap(cmap, "light") if "->" in cmap else cmap
        x = _batched(
            x, lambda f: filters.colormap_filter(f, cmap_adjust), batch_size
        )
    if stab:
        nframes, mode, sat, tht, weight, tht_scen = stab_p[:6]
        sc = x.sc.sc_prev if x.sc is not None else None
        frames = jnp.asarray(x.frames)
        stab_fn = cached_jit(
            ("stab", nframes, str(mode), sat, tht),
            lambda: lambda f, s: temporal_ops.chroma_stabilizer(
                f, nframes=nframes, weighted=(str(mode).upper() == "W"),
                scenechange=s, sat=sat, tht=tht,
            ),
        )
        scv = jnp.asarray((sc if sc is not None else np.zeros(len(x), np.int8)).astype(np.int32))
        stabilized = stab_fn(frames, scv)
        if weight > 0:
            stabilized = frames * weight + stabilized * (1 - weight)
        x = x.with_frames(stabilized)
        if deflicker:
            defl = cached_jit(
                ("deflicker",),
                lambda: lambda f, s: temporal_ops.reduce_flicker(f, scenechange=s),
            )
            x = x.with_frames(defl(jnp.asarray(x.frames), scv))

    out = _chroma_resize_clip(clip_orig, x, batch_size)
    return out if on_dev_in else out.to_host()


# --------------------------------------------------------------------------
# merge / tune / misc public utilities
# --------------------------------------------------------------------------


def HAVC_merge(
    clipa: Clip,
    clipb: Clip,
    method: int = 2,
    mweight: float = 0.5,
    cmc_p=DEF_CMC_p,
    lmm_p=DEF_LMM_p,
    alm_p=DEF_ALM_p,
    crt_p=DEF_CRT_p,
    cmb_sw: bool = False,
    batch_size: int = 8,
) -> Clip:
    """Public combine wrapper (HAVC_merge, __init__.py:2536-2675)."""
    fn = cached_jit(
        ("merge", method, mweight, tuple(cmc_p), tuple(lmm_p), tuple(alm_p),
         tuple(crt_p), cmb_sw),
        lambda: lambda a, b: merge_ops.combine_models(
            a, b, method=method, b_weight=mweight, cmc_p=cmc_p, lmm_p=lmm_p,
            alm_p=alm_p, crt_p=crt_p, invert_clips=cmb_sw,
        ),
    )
    return _batched2(clipa, clipb, fn, batch_size)


def bw_tune_frames(
    x: jnp.ndarray,
    tn_id: int,
    method: int = 0,
    luma_blend: bool = True,
    range_tv: bool = True,
) -> jnp.ndarray:
    """Pure per-frame core of HAVC_bw_tune (__init__.py:1293-1337):
    strength tables per tune level, rgb_balance with the per-channel
    warm-up factors (step #1, skipped for ScaleAbs/Retinex), histogram
    equalization (step #2), inside the reference's full->limited range
    bracket (std.Levels AND a resize range conversion — the codes are
    compressed TWICE on entry and expanded twice on exit, reproduced
    exactly)."""
    b_strength = [0.0, 0.30, 0.40, 0.50]
    w_strength = [0.0, 0.30, 0.40, 0.50]
    r_factor = [1.0, 0.96, 0.94, 0.92]
    g_factor = [1.0, 1.03, 1.05, 1.08]
    b_factor = [1.0, 1.0, 1.0, 1.0]
    method = min(5, method)
    if method == 5:
        b_strength = [0.0, 0.98, 0.99, 1.0]
    weight3 = float(tn_id) if method == 4 else w_strength[tn_id]

    def lim(v):
        return v * (219.0 / 255.0) + 16.0 / 255.0

    def unlim(v):
        return (v - 16.0 / 255.0) * (255.0 / 219.0)

    if range_tv:
        x = lim(lim(x))
    if method < 4:
        x = equalize.rgb_balance(
            x, strength=w_strength[tn_id],
            rgb_factor=(r_factor[tn_id], g_factor[tn_id], b_factor[tn_id]),
        )
    x = equalize.rgb_equalizer(
        x, method=method, strength=b_strength[tn_id], weight3=weight3,
        luma_blend_on=luma_blend,
    )
    if range_tv:
        x = jnp.clip(unlim(unlim(x)), 0.0, 1.0)
    return x


def HAVC_bw_tune(
    clip: Clip,
    bw_tune: str = "none",
    method: int = 0,
    luma_blend: bool = True,
    range_tv: bool = True,
    batch_size: int = 8,
) -> Clip:
    """B&W contrast/luminosity restoration (HAVC_bw_tune,
    __init__.py:1266-1339)."""
    tn_id = presets.get_tune_id(bw_tune)
    if tn_id == 0:
        return clip
    return _batched(
        clip,
        lambda x: bw_tune_frames(x, tn_id, method, luma_blend, range_tv),
        batch_size,
    )


def HAVC_auto_levels(
    clip: Clip, mode: str = "Medium", method: int = 5, luma_blend: bool = True,
    batch_size: int = 8,
) -> Clip:
    """vs_auto_levels analog (havc_utils.py:785-833)."""
    return HAVC_bw_tune(
        clip, mode, method, luma_blend, batch_size=batch_size
    )


def HAVC_retinex(
    clip: Clip,
    luma_dark: float = 0.20,  # constants.DEF_RETINEX_DARK
    luma_bright: float = 0.80,  # constants.DEF_RETINEX_BRIGHT
    sigmas=(25.0, 80.0, 250.0),
    range_tv_in: bool = True,
    range_tv_out: bool = True,
    blend: bool = False,
    chroma_resize: bool = False,
    fast_mode: bool = True,
    batch_size: int = 4,
    strength: Optional[float] = None,  # pre-round-3 compat: simple mix
) -> Clip:
    """Patched MSRCP retinex (HAVC_retinex, __init__.py:1073-1101 +
    vs_retinex): chromaticity-preserving MSR on the intensity channel,
    applied only to frames with mean luma inside [luma_dark, luma_bright]
    (dark/bright frames pass through), optional dark-frame blend ramp."""
    if strength is not None:
        return _batched(
            clip,
            lambda x: x * (1 - strength)
            + retinex_ops.msrcp_rgb(x, sigmas) * strength,
            batch_size,
        )
    return _batched(
        clip,
        lambda x: retinex_ops.retinex_filter(
            x, luma_dark=luma_dark, luma_bright=luma_bright, sigmas=sigmas,
            range_tv=range_tv_in, blend=blend, fast_mode=fast_mode,
        ),
        batch_size,
    )


def HAVC_rgb_denoise(clip: Clip, batch_size: int = 8) -> Clip:
    """rgb_denoise analog (havc_utils.py:752-773)."""
    return _batched(
        clip,
        lambda x: equalize.rgb_equalizer(
            equalize.rgb_balance(x, strength=0.3, rgb_factor=(0.98, 1.02, 1.0)),
            method=0, strength=0.2, luma_blend_on=False,
        ),
        batch_size,
    )


def HAVC_adjust_rgb(
    clip: Clip, factor=(1.0, 1.0, 1.0), bias=(0, 0, 0), gamma=(1.0, 1.0, 1.0),
    batch_size: int = 8,
) -> Clip:
    """Per-channel gain/bias/gamma (havc_utils.adjust_rgb:664-749)."""
    return _batched(
        clip, lambda x: equalize.adjust_rgb(x, factor, bias, gamma), batch_size
    )


def HAVC_tweak(
    clip: Clip, hue: float = 0, sat: float = 1, bright: float = 0,
    cont: float = 1, gamma: float = 1, batch_size: int = 8,
) -> Clip:
    """vs_tweak analog (vsfilters.py:753-850)."""
    return _batched(
        clip,
        lambda x: chroma_ops.tweak(x, hue=hue, sat=sat, bright=bright, cont=cont, gamma=gamma),
        batch_size,
    )


def HAVC_TimeCube(clip: Clip, lut: int | str = 0, batch_size: int = 8) -> Clip:
    """3D-LUT film look (HAVC_TimeCube, __init__.py:2995-3026): built-in
    look id/name or a path to a user .cube file; per-LUT tweak applied."""
    if isinstance(lut, str) and lut.endswith(".cube"):
        table = lut3d.load_cube(lut)
        tweaks = None
    else:
        table = lut3d.make_look_lut(lut)
        lut_id = lut if isinstance(lut, int) else lut3d.LUT_NAMES.index(lut)
        tweaks = lut3d.LUT_TWEAKS.get(lut_id)
    tbl = jnp.asarray(table)

    def apply(x):
        out = lut3d.apply_lut3d(x, tbl)
        if tweaks is not None:
            bright, cont, gamma, sat = tweaks
            out = chroma_ops.tweak(out, sat=sat, bright=bright, cont=cont, gamma=gamma)
        return out

    return _batched(clip, apply, batch_size)


def HAVC_SceneDetect(
    clip: Clip,
    sc_threshold: float = 0.10,
    sc_tht_offset: int = 1,
    sc_tht_ssim: float = 0.0,
    sc_min_int: int = 1,
    sc_min_freq: int = 0,
    sc_normalize: bool = False,
    sc_tht_white: float = 0.70,
    sc_tht_black: float = 0.10,
) -> Clip:
    """Scene detection front-end (HAVC_SceneDetect, __init__.py:3191)."""
    flags = scene_detect(
        np.asarray(clip.frames),
        threshold=sc_threshold,
        frequency=sc_min_freq,
        sc_tht_filter=sc_tht_ssim,
        min_length=sc_min_int,
        tht_white=sc_tht_white,
        tht_black=sc_tht_black,
        tht_offset=sc_tht_offset,
        normalize=sc_normalize,
    )
    return clip.with_sc(flags)


def HAVC_extract_reference_frames(
    clip: Clip, sc_framedir: str, sc_algo: int = 0, **detect_kwargs
) -> list:
    """Detect scenes + export ref_nnnnnn frames (__init__.py:3272-3352).

    ``sc_algo`` (reference ids): 0 = standard luma detector (+SSIM filter),
    1 = edge-based detector, 2 = SCXvid keyframe heuristic (Xvid first-pass
    intra-vs-inter block voting, scene.motion.scene_detect_xvid),
    3 = MVTools motion-vector SCDetection (scene.motion block-SAD;
    thresholds derived like the reference: thscd1 ~ sc_threshold*2500,
    thscd2 ~ sc_tht_ssim*300)."""
    from .io import export_reference_frames

    if sc_algo == 1:
        edge_kwargs = {
            "sc_threshold": detect_kwargs.get("sc_threshold", 0.035),
            "sc_tht_ssim": detect_kwargs.get("sc_tht_ssim", 0.80),
            "sc_diff_offset": detect_kwargs.get("sc_tht_offset", 2),
            "sc_min_int": detect_kwargs.get("sc_min_int", 20),
            "sc_tht_white": detect_kwargs.get("sc_tht_white", 0.70),
            "sc_tht_black": detect_kwargs.get("sc_tht_black", 0.10),
        }
        clip = HAVC_SceneDetectEdges(clip, **edge_kwargs)
    elif sc_algo == 2:
        from .scene.motion import scene_detect_xvid

        flags = scene_detect_xvid(
            np.asarray(clip.frames),
            min_length=detect_kwargs.get("sc_min_int", 1),
        )
        clip = clip.with_sc(flags)
    elif sc_algo == 3:
        from .scene.motion import scene_detect_motion

        tht = detect_kwargs.get("sc_threshold", 0.10)
        ssim = detect_kwargs.get("sc_tht_ssim", 0.45)
        flags = scene_detect_motion(
            np.asarray(clip.frames),
            bad_sad=min(tht * 2500, 1000) / 4096.0,
            bad_ratio=min(ssim * 300, 300) / 300.0 * 0.6 + 0.2,
            min_length=detect_kwargs.get("sc_min_int", 1),
        )
        clip = clip.with_sc(flags)
    else:
        clip = HAVC_SceneDetect(clip, **detect_kwargs)
    return export_reference_frames(clip, sc_framedir)


def HAVC_export_reference_frames(clip: Clip, sc_framedir: str) -> list:
    """Export frames already flagged on the clip (__init__.py:3311)."""
    from .io import export_reference_frames

    return export_reference_frames(clip, sc_framedir)


def HAVC_clip_slice(clip: Clip, rows: int = 2, cols: int = 2, overlap: int = 64):
    """Overlapping tile slice (HAVC_clip_slice, __init__.py:2886)."""
    tiles, meta = tiles_ops.slice_tiles(
        jnp.asarray(clip.frames), rows, cols, overlap
    )
    return from_frames(np.asarray(tiles), fps=clip.fps), meta


def HAVC_clip_reconstruct(
    clip: Clip, tiles_clip: Clip, meta: dict, recover_luma: bool = True
) -> Clip:
    """Tile blend-reconstruction (HAVC_clip_reconstruct, __init__.py:2916)."""
    rec = tiles_ops.reconstruct_tiles(
        jnp.asarray(tiles_clip.frames),
        meta,
        recover_luma=jnp.asarray(clip.frames) if recover_luma else None,
    )
    return clip.with_frames(np.asarray(rec))


def HAVC_recover_clip_color(
    clip: Clip,
    clip_color: Clip,
    sat: float = 0.8,
    tht: int = 30,
    weight: float = 0.0,
    alpha: float = 2.0,
    chroma_resize: bool = True,
    binary_mask: bool = False,
    algo: int = 0,
    batch_size: int = 8,
) -> Clip:
    """Restore gray-pixel colors from a donor clip (HAVC_recover_clip_color,
    __init__.py:2956-2992 -> ChromaRetentionMerge machinery)."""
    fn = cached_jit(
        ("recover_color", sat, tht, weight, alpha, chroma_resize, binary_mask, algo),
        lambda: lambda a, b: merge_ops.chroma_retention_merge(
            a, b, sat=sat, tht=tht, b_weight=1.0, alpha=alpha,
            mask_weight=weight, chroma_resize=chroma_resize,
            binary_mask=binary_mask, algo=algo,
        ),
    )
    return _batched2(clip, clip_color, fn, batch_size)


# --------------------------------------------------------------------------
# HAVC_main / presets pipeline (__init__.py:101-912)
# --------------------------------------------------------------------------


def HAVC_main_colorizer(
    clip: Clip,
    color_model: str = "video+artistic",
    comb_method: str = "constrained-chroma",
    video_tune: str = "balanced",
    color_fix: str = "violet/red",
    color_tune: str = "light",
    color_map: str = "none",
    deoldify_rf: int = 24,
    ddcolor_rf: int = 24,
    enable_stabilizer: bool = True,
    sc_threshold: float = 0.0,
    sc_min_freq: int = 0,
    batch_size: int = 8,
) -> Clip:
    """Classic colorization pipeline (HAVC_main_colorizer,
    __init__.py:535-912, non-exemplar path): resolves the preset knobs,
    runs HAVC_colorizer, then the stabilizer chain."""
    do_model, dd_model, dd_method = presets.get_color_model(color_model)
    mweight = presets.get_mweight(video_tune)
    method = presets.get_comb_method(comb_method)
    dd_tweak, hue_range, hue_range2, chroma_adjust, chroma_adjust2 = (
        presets.get_color_tune(color_tune, color_fix, color_map, dd_model)
    )

    if dd_method == 0:  # deoldify only
        method = 0
    elif dd_method == 1:  # ddcolor/zhang only
        method = 1

    colored = HAVC_colorizer(
        clip,
        method=method,
        mweight=mweight,
        deoldify_p=(do_model, deoldify_rf, 1.0, 0.0),
        ddcolor_p=(dd_model, ddcolor_rf, 1.0, 0.0, True),
        ddtweak=tuple(dd_tweak),
        ddtweak_p=(DEF_TWEAK_p, hue_range),
        sc_threshold=sc_threshold,
        sc_min_freq=sc_min_freq,
        batch_size=batch_size,
    )

    if enable_stabilizer:
        colored = HAVC_stabilizer(
            colored,
            dark=True,
            dark_p=(0.2, 0.8),
            smooth=True,
            smooth_p=(0.3, 0.7, 0.9, 0.0, hue_range2),
            colormap=chroma_adjust2,
            stab=True,
            stab_p=(5, "A", 1, 15, 0.2, 0.15),
            render_factor=min(deoldify_rf, ddcolor_rf),
            batch_size=batch_size,
        )
    return colored


def HAVC_main_presets(
    clip: Clip,
    preset: str = "fast",
    color_model: str = "video+artistic",
    comb_method: str = "constrained-chroma",
    video_tune: str = "balanced",
    color_fix: str = "violet/red",
    color_tune: str = "light",
    color_map: str = "none",
    color_temp: str = "none",
    bw_tune: str = "none",
    enable_deep_ex: bool = False,
    sc_threshold: float = 0.0,
    sc_min_freq: int = 0,
    lut: Optional[int] = None,
    deflicker: bool = False,
    engine_config: Optional[str] = None,
    batch_size: int = 8,
) -> Clip:
    """Preset pipeline (HAVC_main_presets, __init__.py:469-912):
    B&W pre-tune -> colorizer (-> exemplar propagation) -> BW post -> LUT
    -> deflicker."""
    _, deoldify_rf, ddcolor_rf = presets.get_render_factors(preset)

    work = clip
    if bw_tune.lower() != "none":
        work = HAVC_bw_tune(work, bw_tune, method=0, batch_size=batch_size)

    if enable_deep_ex:
        from .exemplar import HAVC_deepex  # lazy: heavy module

        ref = HAVC_colorizer(
            work,
            method=presets.get_comb_method(comb_method),
            mweight=presets.get_mweight(video_tune),
            deoldify_p=(presets.get_color_model(color_model)[0], deoldify_rf, 1.0, 0.0),
            ddcolor_p=(presets.get_color_model(color_model)[1], ddcolor_rf, 1.0, 0.0, True),
            sc_threshold=sc_threshold if sc_threshold > 0 else 0.10,
            sc_min_freq=sc_min_freq,
            batch_size=batch_size,
        )
        colored = HAVC_deepex(clip=work, clip_ref=ref, batch_size=batch_size)
    else:
        # classic path: the reference calls HAVC_colorizer WITHOUT
        # sc_threshold here (__init__.py:853-860) — ScThreshold only
        # gates reference-frame generation for the DeepEx path, so every
        # frame is colorized
        colored = HAVC_main_colorizer(
            work,
            color_model=color_model,
            comb_method=comb_method,
            video_tune=video_tune,
            color_fix=color_fix,
            color_tune=color_tune,
            color_map=color_map,
            deoldify_rf=deoldify_rf,
            ddcolor_rf=ddcolor_rf,
            sc_threshold=0.0,
            sc_min_freq=0,
            batch_size=batch_size,
        )

    # ColorTemp: temporal color stabilization by re-coloring through the
    # second ColorMNet instance with the colorized clip as per-frame
    # reference (__init__.py:888-894: sc_frequency=1 flags + HAVC_cmnet2
    # with ref_merge=color_temp, render_vivid=True)
    ct_id = presets.get_temp_color(color_temp)
    if ct_id > 0:
        from .exemplar import HAVC_cmnet2
        from .scene.detect import SceneFlags

        # reference call form (__init__.py:888-894): ref_merge=color_temp
        # (weights 0.3..0.7 via refmerge_weight), separate scene detection
        # of the video at ref_thresh=0.10 drives ref updates + merging
        ref = colored.with_sc(SceneFlags.every(colored.num_frames, freq=1))
        colored = HAVC_cmnet2(
            clip, ref, render_speed="medium", render_vivid=True,
            ref_merge=ct_id, dark=True, dark_p=(0.2, 0.8), ref_thresh=0.10,
            encode_mode=0, max_memory_frames=0, ref_freq=0, ref_norm=True,
            smooth=True, smooth_p=(0.3, 0.7, 0.9, 0.0, "none"),
            engine_config=engine_config,
        )
    if lut is not None:
        colored = HAVC_TimeCube(colored, lut, batch_size=batch_size)
    if deflicker:
        sc = colored.sc.sc_prev if colored.sc is not None else None
        fn = cached_jit(
            ("deflicker",),
            lambda: lambda f, s: temporal_ops.reduce_flicker(f, scenechange=s),
        )
        scv = jnp.asarray(
            (sc if sc is not None else np.zeros(len(colored), np.int8)).astype(np.int32)
        )
        out = fn(jnp.asarray(colored.frames), scv)
        colored = colored.with_frames(
            out if colored.on_device else np.asarray(out)
        )
    return colored


def HAVC_main(
    clip: Clip,
    Preset: str = "medium",
    FrameInterp: int = 0,
    ColorModel: str = "video+artistic",
    CombMethod: str = "constrained-chroma",
    VideoTune: str = "balanced",
    ColorFix: str = "violet/red",
    ColorTune: str = "light",
    ColorMap: str = "none",
    ColorTemp: str = "none",
    BWTune: str = "none",
    EnableDeepEx: bool = False,
    ScThreshold: float = 0.0,
    ScMinFreq: int = 0,
    batch_size: int = 8,
) -> Clip:
    """Top-level entry (HAVC_main, __init__.py:101-330).

    Placebo preset takes the tiled path (HAVC_placebo_preset,
    __init__.py:430-467): 4-tile slice, per-tile colorize, blend
    reconstruct.  VerySlow runs the dual-clip darkened pass
    (HAVC_veryslow_preset, __init__.py:341-428).  Other presets go through
    HAVC_main_presets.
    """
    pr_id, deoldify_rf, ddcolor_rf = presets.get_render_factors(Preset)

    # FrameInterp > 0: colorize only every Nth frame and interpolate the
    # rest with the exemplar propagator (HAVC_main FrameInterp param ->
    # HAVC_colorizer_fast, __init__.py:2160-2288)
    if FrameInterp > 0:
        do_model, dd_model, _ = presets.get_color_model(ColorModel)
        return HAVC_colorizer_fast(
            clip, sc_min_freq=FrameInterp,
            method=presets.get_comb_method(CombMethod),
            mweight=presets.get_mweight(VideoTune),
            deoldify_p=(do_model, deoldify_rf, 1.0, 0.0),
            ddcolor_p=(dd_model, ddcolor_rf, 1.0, 0.0, True),
            batch_size=batch_size,
        )

    common = dict(
        color_model=ColorModel, comb_method=CombMethod, video_tune=VideoTune,
        color_fix=ColorFix, color_tune=ColorTune, color_map=ColorMap,
        color_temp=ColorTemp, bw_tune=BWTune, enable_deep_ex=EnableDeepEx,
        sc_threshold=ScThreshold, sc_min_freq=ScMinFreq,
        batch_size=batch_size,
    )

    if pr_id == 0:  # placebo: tiled HD path
        tiles_clip, meta = HAVC_clip_slice(clip, 2, 2, overlap=max(clip.width // 16, 32))
        colored_tiles = HAVC_main_presets(tiles_clip, preset="slower", **common)
        return HAVC_clip_reconstruct(clip, colored_tiles, meta)

    if pr_id == 1:
        # veryslow: dual darkened pass (HAVC_veryslow_preset,
        # __init__.py:341-428) — DeOldify pass darkened harder
        # (gamma 0.90 / cont 0.80) + ColorAdjust + slight desat; DDColor
        # pass lighter (0.95/0.95); merged at the VideoTune weight; then a
        # final ColorAdjust + hue/sat tweak blended 40/60, and optional
        # ColorTemp re-color through the second ColorMNet instance.
        do_name, dd_name, dd_method = presets.get_color_model(ColorModel)
        pass_a = pass_b = None
        if dd_method != 1:  # DeOldify half
            dark_a = HAVC_tweak(clip, bright=-1 / 255.0, gamma=0.90,
                                cont=0.80, batch_size=batch_size)
            pass_a = HAVC_main_presets(
                dark_a, preset="slower",
                **{**common,
                   "color_model": f"deoldify({['video', 'stable', 'artistic'][do_name]})",
                   "color_fix": "none", "color_tune": "medium"},
            )
            pass_a = HAVC_bw_tune(pass_a, "medium", method=4, batch_size=batch_size)
            pass_a = HAVC_tweak(pass_a, sat=0.95, hue=5, batch_size=batch_size)
        if dd_method != 0:  # DDColor/Zhang half
            dark_b = HAVC_tweak(clip, bright=-1 / 255.0, gamma=0.95,
                                cont=0.95, batch_size=batch_size)
            dd_names = {0: "ddcolor(modelscope)", 1: "ddcolor(artistic)",
                        2: "zhang(siggraph17)", 3: "zhang(eccv16)"}
            pass_b = HAVC_main_presets(
                dark_b, preset="slower",
                **{**common,
                   "color_model": dd_names.get(dd_name, "ddcolor(artistic)")},
            )
        if pass_a is None:
            merged = pass_b
        elif pass_b is None:
            merged = pass_a
        else:
            merged = HAVC_merge(
                pass_a, pass_b, method=presets.get_comb_method(CombMethod),
                mweight=presets.get_mweight(VideoTune),
            )
        ct_id = presets.get_temp_color(ColorTemp)
        if ct_id > 0:
            # temporal re-color through ColorMNet instance 2
            # (__init__.py:404-412)
            from .exemplar import HAVC_cmnet2
            from .scene.detect import SceneFlags

            ref = merged.with_sc(SceneFlags.every(merged.num_frames, freq=1))
            merged = HAVC_cmnet2(
                clip, ref, render_speed="medium", render_vivid=True,
                ref_merge=ct_id, dark=True, dark_p=(0.2, 0.8),
                ref_thresh=0.10, encode_mode=0, max_memory_frames=0,
                ref_freq=0, ref_norm=True, smooth=True,
                smooth_p=(0.3, 0.7, 0.9, 0.0, "none"),
                colormap="300:360|0.8,0.1",
            )
        adjusted = HAVC_bw_tune(merged, BWTune, batch_size=batch_size) \
            if BWTune.lower() != "none" else merged
        adjusted = HAVC_tweak(adjusted, hue=10, sat=1.05, cont=0.90,
                              batch_size=batch_size)
        return HAVC_merge(adjusted, merged, method=2, mweight=0.4)

    return HAVC_main_presets(clip, preset=Preset, **common)


# --------------------------------------------------------------------------
# Overlay / fast-colorizer / color-adjust / edge-detect / misc entry points
# --------------------------------------------------------------------------


def HAVC_clip_overlay(
    base: Clip,
    overlay_clip: Clip,
    x: int = 0,
    y: int = 0,
    mask: Optional[Clip] = None,
    opacity: float = 1.0,
    mode: str = "normal",
    batch_size: int = 8,
) -> Clip:
    """Blend-mode compositor (HAVC_clip_overlay, __init__.py:3029-3148)."""
    from .ops.overlay import overlay as op_overlay

    mask_frames = (
        jnp.asarray(mask.frames)[..., 0] if mask is not None else None
    )
    fn = cached_jit(
        ("overlay", x, y, mode, opacity, mask is not None,
         base.height, base.width, overlay_clip.height, overlay_clip.width),
        lambda: (
            (lambda b, o, m: op_overlay(b, o, x, y, m, opacity, mode))
            if mask is not None
            else (lambda b, o: op_overlay(b, o, x, y, None, opacity, mode))
        ),
    )
    T = base.num_frames
    on_dev = base.on_device
    outs = []
    for s in range(0, T, batch_size):
        b = jnp.asarray(base.frames[s : s + batch_size])
        o = jnp.asarray(overlay_clip.frames[s : s + batch_size])
        if mask is not None:
            m = mask_frames[s : s + batch_size]
            r = fn(b, o, m)
        else:
            r = fn(b, o)
        outs.append(r if on_dev else np.asarray(r))
    joined = jnp.concatenate(outs) if on_dev else np.concatenate(outs)
    return base.with_frames(joined)


def HAVC_colorizer_fast(
    clip: Clip,
    sc_min_freq: int = 10,
    ex_model: Optional[int] = None,
    render_speed: str = "medium",
    engine_config: Optional[str] = None,
    chroma_adjust: str = "none",
    batch_size: int = 8,
    **colorizer_kwargs,
) -> Clip:
    """Fast colorizer (HAVC_colorizer_fast + vs_frame_interpolation,
    __init__.py:2138-2288): colorize only every Nth frame with the classic
    engines, then interpolate the colors of in-between frames with an
    exemplar propagator.

    Engine selection follows vs_frame_interpolation: interp < 5 uses
    Deep-Exemplar, >= 5 uses ColorMNet with refs every ``2 * interp``
    frames; both run render_vivid=True (__init__.py:2138-2157)."""
    from .exemplar import HAVC_deepex

    if ex_model is None:
        ex_model = 1 if sc_min_freq < 5 else 0
    ref_freq = sc_min_freq if sc_min_freq < 5 else sc_min_freq * 2
    ref = HAVC_colorizer(
        clip, sc_threshold=0.10, sc_min_freq=ref_freq,
        batch_size=batch_size, **colorizer_kwargs,
    )
    return HAVC_deepex(
        clip, ref, ex_model=ex_model, render_speed=render_speed,
        engine_config=engine_config, render_vivid=True,
        colormap=chroma_adjust, batch_size=batch_size,
    )


def HAVC_restore_video(*args, **kwargs):
    """Re-export of the exemplar restore entry (see havc_tpu.exemplar)."""
    from .exemplar import HAVC_restore_video as _restore

    return _restore(*args, **kwargs)


def HAVC_ColorAdjust(
    clip: Clip,
    clip_ref: Optional[Clip] = None,
    bw_tune: str = "none",
    lut: Optional[int] = None,
    deflicker: bool = False,
    ex_model: int = 0,
    engine_config: Optional[str] = None,
    batch_size: int = 8,
) -> Clip:
    """Post color-adjust: optional ReColor via exemplar propagation from a
    reference clip + BW tune + LUT + deflicker (HAVC_ColorAdjust /
    HAVC_main_restore, __init__.py:957-1253)."""
    out = clip
    if clip_ref is not None:
        out = HAVC_restore_video(
            out, clip_ref, ex_model=ex_model, engine_config=engine_config
        )
    if bw_tune.lower() != "none":
        out = HAVC_bw_tune(out, bw_tune, method=0, batch_size=batch_size)
    if lut is not None:
        out = HAVC_TimeCube(out, lut, batch_size=batch_size)
    if deflicker:
        sc = out.sc.sc_prev if out.sc is not None else np.zeros(len(out), np.int8)
        fn = cached_jit(
            ("deflicker",),
            lambda: lambda f, s: temporal_ops.reduce_flicker(f, scenechange=s),
        )
        out = out.with_frames(
            np.asarray(
                fn(jnp.asarray(out.frames),
                   jnp.asarray(sc.astype(np.int32)))
            )
        )
    return out


HAVC_main_restore = HAVC_ColorAdjust


def HAVC_SceneDetectEdges(
    clip: Clip,
    sc_threshold: float = 0.035,
    sc_frequency: int = 0,
    sc_tht_ssim: float = 0.80,
    sc_diff_offset: int = 2,
    sc_min_int: int = 20,
    sc_mult_tht: int = 15,
    sc_tht_white: float = 0.70,
    sc_tht_black: float = 0.10,
) -> Clip:
    """Edge-based scene detection (HAVC_SceneDetectEdges, __init__.py:3219;
    vsscdetect_edge.py:32-260 — draft retinex edge mask, offset-frame diff,
    multi-threshold decision reasons, luma gates, SSIM confirmation)."""
    from .scene.edges import scene_detect_edges

    flags = scene_detect_edges(
        np.asarray(clip.frames),
        threshold=sc_threshold,
        frequency=sc_frequency,
        sc_diff_offset=sc_diff_offset,
        sc_min_int=sc_min_int,
        sc_mult_tht=sc_mult_tht,
        tht_white=sc_tht_white,
        tht_black=sc_tht_black,
        sc_tht_ssim=sc_tht_ssim,
    )
    return clip.with_sc(flags)


def HAVC_read_video(path: str, fpsnum: int = 0, fpsden: int = 1, **kwargs) -> Clip:
    """Video reader entry (havc_utils.HAVC_read_video:249-322)."""
    from .io import read_video

    fps_force = fpsnum / fpsden if fpsnum > 0 else None
    return read_video(path, fps_force=fps_force, **kwargs)


def HAVC_export_list_frames(clip: Clip, sc_framedir: str, frame_list: list) -> list:
    """Export an explicit frame list (vs_list_export_frames analog)."""
    from .io import export_reference_frames

    return export_reference_frames(clip, sc_framedir, frame_list=frame_list)


def HAVC_DeepRemaster(*args, **kwargs):
    from .exemplar import HAVC_DeepRemaster as _dr

    return _dr(*args, **kwargs)


def HAVC_deepex(*args, **kwargs):
    from .exemplar import HAVC_deepex as _dx

    return _dx(*args, **kwargs)


def HAVC_cmnet2(*args, **kwargs):
    from .exemplar import HAVC_cmnet2 as _c2

    return _c2(*args, **kwargs)


# --------------------------------------------------------------------------
# Global parameter setters + legacy shims (__init__.py:3418-3663)
# --------------------------------------------------------------------------

_GLOBAL_PARAMS = {
    "tweak": list(DEF_TWEAK_p),
    "cmc": list(DEF_CMC_p),
    "lmm": list(DEF_LMM_p),
    "alm": list(DEF_ALM_p),
    "crt": list(DEF_CRT_p),
}


def HAVC_set_tweak_params(**kwargs):
    """Mutate the module-global DDColor tweak defaults
    (HAVC_set_tweak_params, __init__.py:3418)."""
    names = ["bright", "cont", "gamma", "luma_constrained_tweak", "luma_min",
             "gamma_luma_min", "gamma_alpha", "gamma_min"]
    for k, v in kwargs.items():
        if k in names:
            _GLOBAL_PARAMS["tweak"][names.index(k)] = v
    return list(_GLOBAL_PARAMS["tweak"])


def HAVC_set_merge_params(cmc_p=None, lmm_p=None, alm_p=None, crt_p=None):
    """Mutate the global merge parameter packs (HAVC_set_merge_params)."""
    if cmc_p is not None:
        _GLOBAL_PARAMS["cmc"] = list(cmc_p)
    if lmm_p is not None:
        _GLOBAL_PARAMS["lmm"] = list(lmm_p)
    if alm_p is not None:
        _GLOBAL_PARAMS["alm"] = list(alm_p)
    if crt_p is not None:
        _GLOBAL_PARAMS["crt"] = list(crt_p)
    return dict(_GLOBAL_PARAMS)


def ddeoldify(clip: Clip, *args, **kwargs) -> Clip:
    """Deprecated legacy entry -> HAVC_main (__init__.py:3612-3663)."""
    import warnings

    warnings.warn("ddeoldify() is deprecated; use HAVC_main()", DeprecationWarning)
    return HAVC_main(clip, *args, **kwargs)


def HAVC_ddeoldify(clip: Clip, *args, **kwargs) -> Clip:
    """Deprecated legacy entry -> HAVC_colorizer."""
    import warnings

    warnings.warn(
        "HAVC_ddeoldify() is deprecated; use HAVC_colorizer()", DeprecationWarning
    )
    return HAVC_colorizer(clip, *args, **kwargs)


__all__ += [
    "HAVC_clip_overlay",
    "HAVC_colorizer_fast",
    "HAVC_restore_video",
    "HAVC_ColorAdjust",
    "HAVC_main_restore",
    "HAVC_SceneDetectEdges",
    "HAVC_read_video",
    "HAVC_export_list_frames",
    "HAVC_DeepRemaster",
    "HAVC_deepex",
    "HAVC_cmnet2",
    "HAVC_set_tweak_params",
    "HAVC_set_merge_params",
    "ddeoldify",
    "HAVC_ddeoldify",
]


def HAVC_degrain(clip: Clip, strength: int = 1, batch_size: int = 4) -> Clip:
    """Luma degrain via non-local means (vs_degrain / KNLMeansCL role,
    vsfilters.py:913-1010)."""
    from .ops.denoise import degrain

    return _batched(clip, lambda x: degrain(x, strength), batch_size)


def HAVC_SceneDetectMotion(
    clip: Clip,
    bad_sad: float = 0.08,
    bad_ratio: float = 0.55,
    sc_min_int: int = 1,
) -> Clip:
    """Motion-vector-style scene detection (vs_mv_sc_detect / SCXvid role,
    vsscdect.py:498-576)."""
    from .scene.motion import scene_detect_motion

    flags = scene_detect_motion(
        np.asarray(clip.frames), bad_sad=bad_sad, bad_ratio=bad_ratio,
        min_length=sc_min_int,
    )
    return clip.with_sc(flags)


__all__ += ["HAVC_degrain", "HAVC_SceneDetectMotion"]


def HAVC_cmnet(clip: Clip, clip_ref: Optional[Clip] = None, **kwargs) -> Clip:
    """First ColorMNet instance front-end (HAVC_cmnet; same body as
    HAVC_deepex pinned to ex_model=0)."""
    kwargs.setdefault("ex_model", 0)
    return HAVC_deepex(clip, clip_ref, **kwargs)


def HAVC_placebo_preset(clip: Clip, **kwargs) -> Clip:
    """Tiled HD path (HAVC_placebo_preset, __init__.py:430-467)."""
    return HAVC_main(clip, Preset="placebo", **kwargs)


def HAVC_veryslow_preset(clip: Clip, **kwargs) -> Clip:
    """Dual darkened-pass path (HAVC_veryslow_preset, __init__.py:341-428)."""
    return HAVC_main(clip, Preset="veryslow", **kwargs)


def ddeoldify_main(clip: Clip, *args, **kwargs) -> Clip:
    """Deprecated legacy entry -> HAVC_main (__init__.py:3612)."""
    import warnings

    warnings.warn("ddeoldify_main() is deprecated; use HAVC_main()", DeprecationWarning)
    return HAVC_main(clip, *args, **kwargs)


def ddeoldify_stabilizer(clip: Clip, *args, **kwargs) -> Clip:
    """Deprecated legacy entry -> HAVC_stabilizer."""
    import warnings

    warnings.warn(
        "ddeoldify_stabilizer() is deprecated; use HAVC_stabilizer()",
        DeprecationWarning,
    )
    return HAVC_stabilizer(clip, *args, **kwargs)


__all__ += [
    "HAVC_cmnet",
    "HAVC_placebo_preset",
    "HAVC_veryslow_preset",
    "ddeoldify_main",
    "ddeoldify_stabilizer",
]
