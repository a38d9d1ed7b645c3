"""Public HAVC_* API — mirror of the reference's vsdeoldify/__init__.py
entry points, operating on :class:`havc_tpu.clip.Clip`.

Implemented against the reference's semantics with file:line citations on
each function.  Parameter names, packs, and defaults match the reference so
a vs-deoldify user can port scripts directly.
"""
from __future__ import annotations

import math
import os
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
DEF_HAVC_METHOD_PLACEBO = 10  # constants.py:18

_DEBUG_LEVEL = [0]


def HAVC_set_debug_level(debug_level: int = 0):
    """Mirror of HAVC_set_debug_level (__init__.py:3440): 0 = silent,
    1 = info, 2 = info + debug (constants.py:13-15)."""
    if debug_level in (0, 1, 2):
        _DEBUG_LEVEL[0] = debug_level


def _log_debug(*msg) -> None:
    if _DEBUG_LEVEL[0] >= 2:
        print("HAVC-DEBUG:", *msg)


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
    device_index: int = 0,
    torch_dir: Optional[str] = None,
    debug_level: int = 0,
    batch_size: int = 8,
) -> Clip:
    """Colorize using DeOldify and/or DDColor and combine (method 0-7).

    Mirror of HAVC_colorizer (__init__.py:2290-2523): optional scene
    detection (sets reference-frame flags), Spline64 square resize to
    ``max(rf)*16``, both engines, merge dispatch, chroma-resize restore.

    ``device_index``/``torch_dir`` are accepted for script compatibility:
    device selection is JAX-global here (jax.devices()) and weights load
    through the converted-checkpoint registry (set_weights_dir)."""
    del device_index, torch_dir
    if debug_level:
        HAVC_set_debug_level(debug_level)
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
    stab_p=(5, "A", 1, 15, 0.2, 0.8),
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
        # ``weight`` is the restore's INNER merge weight, handed through to
        # restore_color per shifted neighbour (vs_chroma_stabilizer_ex ->
        # vs_recover_clip_color, vsfilters.py:84-116,305-356) — the
        # reference applies no outer blend
        stab_fn = cached_jit(
            ("stab", nframes, str(mode), sat, tht, weight, tht_scen),
            lambda: lambda f, s: temporal_ops.chroma_stabilizer(
                f, nframes=nframes, weighted=(str(mode).upper() == "W"),
                scenechange=s, sat=sat, tht=tht, weight=weight,
                tht_scen=tht_scen,
            ),
        )
        scv = jnp.asarray((sc if sc is not None else np.zeros(len(x), np.int8)).astype(np.int32))
        stabilized = stab_fn(frames, scv)
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
    clipa: Clip = None,
    clipb: Optional[Clip] = None,
    clip_luma: Optional[Clip] = None,
    weight: float = 0.5,
    method: int = 2,
    cmc_p=DEF_CMC_p,
    lmm_p=DEF_LMM_p,
    alm_p=DEF_ALM_p,
    crt_p=DEF_CRT_p,
    cmb_sw: bool = False,
    mweight: Optional[float] = None,
    batch_size: int = 8,
) -> Clip:
    """Public combine wrapper (HAVC_merge, __init__.py:2536-2675).

    ``method`` 0/1 return clipa/clipb (luma-merged with ``clip_luma`` when
    given); otherwise the 8 combine methods apply with ``weight`` = the
    weight of clipb.  ``clip_luma``, when given, provides the luma
    component of the result (__init__.py:2546-2551).  ``mweight`` is a
    legacy alias of weight."""
    if clipa is None:
        raise ValueError("HAVC_merge: clipa is required")
    if mweight is not None:
        weight = mweight

    def _with_luma(c: Clip) -> Clip:
        if clip_luma is None:
            return c
        from .filters import recover_clip_luma as _rl

        fn_l = cached_jit(
            ("merge_luma", c.height, c.width),
            lambda: _rl,
        )
        return _batched2(clip_luma, c, fn_l, batch_size)

    if method == 0 or clipb is None:
        return _with_luma(clipa)
    if method == 1:
        return _with_luma(clipb)

    fn = cached_jit(
        ("merge", method, weight, tuple(cmc_p), tuple(lmm_p), tuple(alm_p),
         tuple(crt_p), cmb_sw),
        lambda: lambda a, b: merge_ops.combine_models(
            a, b, method=method, b_weight=weight, cmc_p=cmc_p, lmm_p=lmm_p,
            alm_p=alm_p, crt_p=crt_p, invert_clips=cmb_sw,
        ),
    )
    return _with_luma(_batched2(clipa, clipb, fn, batch_size))


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
    clip: Clip = None,
    bw_tune: str = "Light",
    bw_method: int = 0,
    luma_blend: bool = True,
    range_tv: bool = True,
    chroma_resize: bool = False,
    batch_size: int = 8,
    method: Optional[int] = None,
) -> Clip:
    """B&W contrast/luminosity restoration (HAVC_bw_tune,
    __init__.py:1266-1339).  ``chroma_resize=True`` runs the filter at the
    reference's reduced chroma resolution and re-marries the original luma
    (convert_format_RGB24(chroma_resize=True) speed path).  ``method`` is a
    deprecated alias of ``bw_method``."""
    if clip is None:
        raise ValueError("HAVC_bw_tune: clip is required")
    if method is not None:
        bw_method = method
    tn_id = presets.get_tune_id(bw_tune)
    if tn_id == 0:
        return clip
    work = clip
    if chroma_resize:
        rf = min(max(int(0.4 * clip.width / 16), 16), 48)
        frame_size = min(rf * 16, clip.width)
        if frame_size < clip.width:
            work = _batched(
                clip, lambda x: resize(x, frame_size, frame_size, "spline64"),
                batch_size,
            )
    out = _batched(
        work,
        lambda x: bw_tune_frames(x, tn_id, bw_method, luma_blend, range_tv),
        batch_size,
    )
    if chroma_resize and work is not clip:
        out = _chroma_resize_clip(clip, out, batch_size)
    return out


def auto_levels_frames(
    x: jnp.ndarray,
    tn_id: int,
    method: int = 0,
    luma_blend: bool = False,
    range_tv: bool = True,
) -> jnp.ndarray:
    """Pure per-frame core of vs_auto_levels (havc_utils.py:785-838):
    unlike bw_tune there is NO rgb_balance warm-up step and the strength
    table is [0, 0.98, 0.99, 1.0] for every method; equalization runs
    inside the same full->limited double range bracket."""
    b_strength = [0.0, 0.98, 0.99, 1.0]

    def lim(v):
        return v * (219.0 / 255.0) + 16.0 / 255.0

    def unlim(v):
        return (v - 16.0 / 255.0) * (255.0 / 219.0)

    if range_tv:
        x = lim(lim(x))
    x = equalize.rgb_equalizer(
        x, method=min(5, method), strength=b_strength[tn_id],
        luma_blend_on=luma_blend,
    )
    if range_tv:
        x = jnp.clip(unlim(unlim(x)), 0.0, 1.0)
    return x


def HAVC_auto_levels(
    clip: Clip = None, mode: str = "Light", method: int = 0,
    luma_blend: bool = False, range_tv: bool = True, batch_size: int = 8,
) -> Clip:
    """Histogram-equalization / retinex contrast filter for B&W clips
    (HAVC_auto_levels, __init__.py:3150-3179 -> vs_auto_levels,
    havc_utils.py:785-838)."""
    if clip is None:
        raise ValueError("HAVC_auto_levels: clip is required")
    tn_id = presets.get_tune_id(mode)
    if tn_id == 0:
        return clip
    return _batched(
        clip,
        lambda x: auto_levels_frames(x, tn_id, method, luma_blend, range_tv),
        batch_size,
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


def HAVC_rgb_denoise(
    clip: Clip,
    denoise_levels=(0.4, 0.3),
    rgb_factors=(0.95, 1.05, 1.01),
    batch_size: int = 8,
) -> Clip:
    """Color/contrast denoise for DDColor/Zhang output (HAVC_rgb_denoise,
    __init__.py:924-945 -> havc_utils.rgb_denoise:752-773):
    ``denoise_levels=[color, contrast]`` strengths, ``rgb_factors`` the
    per-channel balance gains, all inside the reference's full->limited
    range bracket (compressed twice on entry, expanded twice on exit,
    matching bw_tune_frames)."""
    w_str, b_str = float(denoise_levels[0]), float(denoise_levels[1])
    r, g, b = (float(v) for v in rgb_factors)

    def lim(v):
        return v * (219.0 / 255.0) + 16.0 / 255.0

    def unlim(v):
        return (v - 16.0 / 255.0) * (255.0 / 219.0)

    def apply(x):
        x = lim(lim(x))
        x = equalize.rgb_balance(x, strength=w_str, rgb_factor=(r, g, b))
        x = equalize.rgb_equalizer(
            x, method=0, strength=b_str, luma_blend_on=False,
        )
        return jnp.clip(unlim(unlim(x)), 0.0, 1.0)

    return _batched(clip, apply, batch_size)


def HAVC_adjust_rgb(
    clip: Clip = None, strength: float = 0.0, factor=(1.0, 1.0, 1.0),
    bias=(0, 0, 0), gamma=(1.0, 1.0, 1.0), batch_size: int = 8,
) -> Clip:
    """Per-channel gain/bias/gamma with optional auto white-balance
    pre-pass at ``strength`` (HAVC_adjust_rgb, __init__.py: strength=1
    normalizes fully, 0<strength<1 blends the normalized clip)."""

    if clip is None:
        raise ValueError("HAVC_adjust_rgb: clip is required")

    def apply(x):
        if strength > 0:
            x = equalize.rgb_balance(x, strength=min(strength, 1.0))
        return equalize.adjust_rgb(x, factor, bias, gamma)

    return _batched(clip, apply, batch_size)


def HAVC_tweak(
    clip: Clip = None, hue: float = 0, sat: float = 1, bright: float = 0,
    cont: float = 1, gamma: float = 1, batch_size: int = 8,
) -> Clip:
    """vs_tweak analog (vsfilters.py:753-850)."""
    if clip is None:
        raise ValueError("HAVC_tweak: clip is required")
    return _batched(
        clip,
        lambda x: chroma_ops.tweak(x, hue=hue, sat=sat, bright=bright, cont=cont, gamma=gamma),
        batch_size,
    )


def HAVC_TimeCube(
    clip: Clip,
    strength: float = 1.0,
    lut_effect: int | str = 0,
    factors=None,
    lut: Optional[int | str] = None,
    batch_size: int = 8,
) -> Clip:
    """3D-LUT film look (HAVC_TimeCube, __init__.py:2995-3026 +
    vs_timecube, vsplugins.py:325-378): built-in look id/name or a path
    to a user .cube file, the exact per-LUT (hue/sat/bright/cont/gamma)
    tweak table, then a merge with the input at ``strength`` (LUT 8
    Amber_Light uses the ChromaBound merge, method 7, CMC_p =
    [0.15, True, 25, 25]; the rest a simple weighted merge).

    ``factors`` = (hue, sat, bright, cont, gamma) overrides the table
    (bright in 0-255 units, like the reference).  ``lut`` is a legacy
    alias of lut_effect."""
    if lut is not None:
        lut_effect = lut
    if strength == 0:
        return clip
    if isinstance(lut_effect, str) and lut_effect.endswith(".cube"):
        table = lut3d.load_cube(lut_effect)
        lut_id = -1
        tweaks = None
    else:
        table = lut3d.make_look_lut(lut_effect)
        lut_id = (lut_effect if isinstance(lut_effect, int)
                  else lut3d.LUT_NAMES.index(lut_effect))
        tweaks = lut3d.LUT_TWEAKS.get(lut_id)
    if factors is not None:
        tweaks = tuple(factors)
    tbl = jnp.asarray(table)

    def apply(x):
        out = lut3d.apply_lut3d(x, tbl)
        if tweaks is not None:
            hue, sat, bright, cont, gamma = tweaks
            out = chroma_ops.tweak(out, hue=hue, sat=sat,
                                   bright=bright / 255.0, cont=cont,
                                   gamma=gamma)
        if strength < 1.0:
            if lut_id == 8:
                out = merge_ops.combine_models(
                    x, out, method=7, b_weight=strength,
                    cmc_p=(0.15, True, 25, 25),
                )
            else:
                out = x * (1.0 - strength) + out * strength
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
    sc_debug: bool = False,
) -> Clip:
    """Scene detection front-end (HAVC_SceneDetect, __init__.py:3191).
    ``sc_debug=True`` logs every New/Skip decision with its
    SSIM/hist/luma/reason scores like the reference (vsscdect.py:406-479)."""
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
        debug=sc_debug,
    )
    return clip.with_sc(flags)


def HAVC_extract_reference_frames(
    clip: Clip,
    sc_threshold: float = 0.10,
    sc_tht_offset: int = 1,
    sc_tht_ssim: float = 0.0,
    sc_min_int: int = 1,
    sc_min_freq: int = 0,
    sc_framedir: str = "./",
    sc_sequence: bool = False,
    sc_normalize: bool = False,
    ref_offset: int = 0,
    sc_tht_white: float = 0.70,
    sc_tht_black: float = 0.10,
    ref_ext: str = "jpg",
    ref_jpg_quality: int = 95,
    ref_override: bool = True,
    sc_algo: int = 0,
    sc_debug: bool = False,
) -> list:
    """Detect scenes + export ref_nnnnnn frames (__init__.py:3272-3352).

    ``sc_algo`` (reference ids): 0 = standard luma detector (+SSIM filter),
    1 = edge-based detector, 2 = SCXvid keyframe heuristic (Xvid first-pass
    intra-vs-inter block voting, scene.motion.scene_detect_xvid),
    3 = MVTools motion-vector SCDetection (scene.motion block-SAD;
    thresholds derived like the reference: thscd1 ~ sc_threshold*2500,
    thscd2 ~ sc_tht_ssim*300).

    Returns the list of written file paths (the reference returns the
    flagged clip; in this eager pipeline the flags live on ``clip.sc``
    and the written paths are the useful artifact)."""
    from .io import export_reference_frames

    if sc_algo == 1:
        clip = HAVC_SceneDetectEdges(
            clip,
            sc_threshold=sc_threshold,
            sc_tht_ssim=sc_tht_ssim,
            sc_tht_offset=sc_tht_offset,
            sc_min_int=sc_min_int,
            sc_mult_tht=sc_min_freq if sc_min_freq > 0 else 15,
            sc_tht_white=sc_tht_white,
            sc_tht_black=sc_tht_black,
            sc_debug=sc_debug,
        )
    elif sc_algo == 2:
        from .scene.motion import scene_detect_xvid

        flags = scene_detect_xvid(
            np.asarray(clip.frames), min_length=sc_min_int
        )
        clip = clip.with_sc(flags)
    elif sc_algo == 3:
        from .scene.motion import scene_detect_motion

        flags = scene_detect_motion(
            np.asarray(clip.frames),
            bad_sad=min(sc_threshold * 2500, 1000) / 4096.0,
            bad_ratio=min(sc_tht_ssim * 300, 300) / 300.0 * 0.6 + 0.2,
            min_length=sc_min_int,
        )
        clip = clip.with_sc(flags)
    else:
        clip = HAVC_SceneDetect(
            clip,
            sc_threshold=sc_threshold,
            sc_tht_offset=sc_tht_offset,
            sc_tht_ssim=sc_tht_ssim,
            sc_min_int=sc_min_int,
            sc_min_freq=sc_min_freq,
            sc_normalize=sc_normalize,
            sc_tht_white=sc_tht_white,
            sc_tht_black=sc_tht_black,
            sc_debug=sc_debug,
        )
    return export_reference_frames(
        clip, sc_framedir, ext=ref_ext, ref_offset=ref_offset,
        ref_jpg_quality=ref_jpg_quality, ref_override=ref_override,
        sequence=sc_sequence,
    )


def HAVC_export_reference_frames(
    clip: Clip,
    sc_framedir: str = "./",
    ref_offset: int = 0,
    ref_ext: str = "jpg",
    ref_jpg_quality: int = 95,
    ref_override: bool = True,
) -> list:
    """Export frames already flagged on the clip (__init__.py:3364-3385)."""
    from .io import export_reference_frames

    return export_reference_frames(
        clip, sc_framedir, ext=ref_ext, ref_offset=ref_offset,
        ref_jpg_quality=ref_jpg_quality, ref_override=ref_override,
    )


class ClipTiles:
    """Tile bundle matching the reference's ClipTiles (vstiles4.py:29-46):
    the original clip, the stacked overlapping tiles, and the slicing
    geometry needed to reconstruct."""

    def __init__(self, clip_orig: Clip, tiles_clip: Clip, meta: dict,
                 overlap_x: int, overlap_y: int):
        self.clip_orig = clip_orig
        self.tiles_clip = tiles_clip  # all tiles stacked on the batch axis
        self.meta = meta
        self.original_width = clip_orig.width
        self.original_height = clip_orig.height
        self.base_tile_w = meta["tw"]
        self.base_tile_h = meta["th"]
        self.overlap_x = overlap_x
        self.overlap_y = overlap_y

    @property
    def tiles(self) -> list:
        """Per-tile clips in reference order ([tl, tr] or [tl, tr, bl, br])."""
        t = self.meta["shape"][0]
        n = len(self.meta["ys"]) * len(self.meta["xs"])
        frames = self.tiles_clip.frames
        return [
            self.tiles_clip.with_frames(frames[i * t : (i + 1) * t])
            for i in range(n)
        ]

    def with_tiles(self, tiles_clip: Clip) -> "ClipTiles":
        """New bundle with processed tile frames (same geometry)."""
        out = ClipTiles(self.clip_orig, tiles_clip, self.meta,
                        self.overlap_x, self.overlap_y)
        return out

    def __len__(self):
        return len(self.meta["ys"]) * len(self.meta["xs"])


def HAVC_clip_slice(
    clip: Clip, slices: int = 2, overlap_x: int = 32, overlap_y: int = 32,
) -> ClipTiles:
    """Overlapping tile slice (HAVC_clip_slice, __init__.py:2886-2911):
    ``slices=2`` -> two side-by-side tiles (overlap_x only), ``slices=4``
    -> a 2x2 grid.  Tiles stack on the batch axis so downstream colorizers
    see a 2x/4x larger batch (the TPU version of per-tile parallelism)."""
    if slices == 4:
        rows, cols = 2, 2
    elif slices == 2:
        rows, cols = 1, 2
    else:
        raise ValueError("HAVC_clip_slice: slices must be 2 or 4")
    tiles, meta = tiles_ops.slice_tiles(
        jnp.asarray(clip.frames), rows, cols, overlap_x, overlap_y=overlap_y
    )
    tiles_clip = from_frames(np.asarray(tiles), fps=clip.fps)
    return ClipTiles(clip, tiles_clip, meta, overlap_x,
                     overlap_y if slices == 4 else 0)


def HAVC_clip_reconstruct(
    clip_tiles: ClipTiles, blend_weight: float = 0.5,
    chroma_resize: bool = False,
) -> Clip:
    """Tile blend-reconstruction (HAVC_clip_reconstruct, __init__.py:2923-2947):
    ramp-blends the overlap zones back to the original geometry.
    ``chroma_resize=True`` re-marries the original clip's luma onto the
    reconstructed chroma (the reference's Y copy-back). ``blend_weight``
    is accepted for parity; this implementation always uses the smooth
    linear-ramp blend (the reference's blend_weight==0 mode), which
    dominates the fixed-weight mode in seam quality."""
    del blend_weight
    clip = clip_tiles.clip_orig
    rec = tiles_ops.reconstruct_tiles(
        jnp.asarray(clip_tiles.tiles_clip.frames),
        clip_tiles.meta,
        recover_luma=jnp.asarray(clip.frames) if chroma_resize else None,
    )
    return clip.with_frames(np.asarray(rec))


def HAVC_recover_clip_color(
    clip: Clip = None,
    clip_color: Clip = None,
    sat: float = 0.8,
    tht: int = 30,
    strength: float = 1.0,
    alpha: float = 2.0,
    mask_weight: float = 1.0,
    chroma_resize: bool = True,
    return_mask: bool = False,
    binary_mask: bool = False,
    algo: int = 0,
    weight: Optional[float] = None,
    batch_size: int = 8,
) -> Clip:
    """Restore gray-pixel colors from a donor clip (HAVC_recover_clip_color,
    __init__.py:2956-2992 -> ChromaRetentionMerge): ``strength`` is the
    filter weight (reference clipb_weight), ``mask_weight`` the masked-donor
    blend weight, ``return_mask=True`` returns the gray-selection mask clip.
    ``weight`` is a deprecated alias of ``mask_weight``."""
    if clip is None or clip_color is None:
        raise ValueError("HAVC_recover_clip_color: clip and clip_color are required")
    if weight is not None:
        mask_weight = weight
    fn = cached_jit(
        ("recover_color", sat, tht, strength, mask_weight, alpha,
         chroma_resize, return_mask, binary_mask, algo),
        lambda: lambda a, b: merge_ops.chroma_retention_merge(
            a, b, sat=sat, tht=tht, b_weight=strength, alpha=alpha,
            mask_weight=mask_weight, chroma_resize=chroma_resize,
            binary_mask=binary_mask, algo=algo, return_mask=return_mask,
        ),
    )
    return _batched2(clip, clip_color, fn, batch_size)


# --------------------------------------------------------------------------
# HAVC_main / presets pipeline (__init__.py:101-912)
# --------------------------------------------------------------------------


def _check_deepex_input(DeepExOnlyRefFrames, ScFrameDir, DeepExMethod,
                        ScThreshold, ScMinFreq, DeepExRefMerge):
    """Mirror of havc_utils._check_input (havc_utils.py:591-609)."""
    if DeepExOnlyRefFrames and ScFrameDir is None:
        raise ValueError(
            "HAVC_main: DeepExOnlyRefFrames is enabled but ScFrameDir is unset")
    if ScFrameDir is not None and DeepExMethod != 0 and DeepExOnlyRefFrames:
        raise ValueError(
            "HAVC_main: DeepExOnlyRefFrames is enabled but method not = 0 (HAVC)")
    if DeepExMethod not in (0, DEF_HAVC_METHOD_PLACEBO) and ScFrameDir is None:
        raise ValueError("HAVC_main: DeepExMethod != 0 but ScFrameDir is unset")
    if (DeepExMethod in (0, 1, 2, 5, 6, DEF_HAVC_METHOD_PLACEBO)
            and ScThreshold == 0 and ScMinFreq == 0):
        raise ValueError(
            "HAVC_main: DeepExMethod in (0, 1, 2, 5, 6) but ScThreshold and "
            "ScMinFreq are not set")
    if DeepExMethod in (2, 6) and DeepExRefMerge > 0:
        raise ValueError(
            "HAVC_main: RefMerge cannot be used with DeepExMethod in (2, 6)")


def _frame_interpolation(clip: Clip, clip_ref: Clip, frame_interp: int = 5,
                         chroma_adjust: str = "none",
                         process_id: int = 1, batch_size: int = 8) -> Clip:
    """vs_frame_interpolation (__init__.py:2138-2157): interp < 5 uses
    Deep-Exemplar, >= 5 ColorMNet with refs every 2*interp frames;
    process_id=2 = the cmnet2 variant with dark/smooth prefilters."""
    from .exemplar import HAVC_cmnet2, HAVC_deepex

    if frame_interp < 5:
        return HAVC_deepex(
            clip=clip, clip_ref=clip_ref, method=0, render_speed="medium",
            render_vivid=True, ref_merge=0, only_ref_frames=False,
            dark=False, ref_thresh=0.10, ex_model=1, encode_mode=0,
            max_memory_frames=0, ref_freq=frame_interp, ref_norm=False,
            smooth=False, colormap=chroma_adjust, batch_size=batch_size,
        )
    if process_id == 1:
        return HAVC_deepex(
            clip=clip, clip_ref=clip_ref, method=0, render_speed="medium",
            render_vivid=True, ref_merge=0, only_ref_frames=False,
            dark=False, ref_thresh=0.10, ex_model=0, encode_mode=0,
            max_memory_frames=0, ref_freq=frame_interp * 2, ref_norm=False,
            smooth=False, colormap=chroma_adjust, batch_size=batch_size,
        )
    return HAVC_cmnet2(
        clip=clip, clip_ref=clip_ref, render_speed="medium",
        render_vivid=True, ref_merge=0, dark=True, dark_p=(0.2, 0.8),
        ref_thresh=0.10, encode_mode=0, max_memory_frames=0,
        ref_freq=frame_interp * 2, ref_norm=True, smooth=True,
        smooth_p=(0.3, 0.7, 0.9, 0.0, "none"), colormap=chroma_adjust,
        batch_size=batch_size,
    )


def _colortemp_recolor(clip: Clip, clip_colored: Clip, color_temp: int,
                       chroma_adjust: str, engine_config=None,
                       batch_size: int = 8) -> Clip:
    """ColorTemp temporal re-colorization: the colorized clip becomes a
    freq-1 reference and the B&W video is re-colored through the second
    ColorMNet instance with ref_merge=color_temp (__init__.py:888-894)."""
    from .exemplar import HAVC_cmnet2

    ref = clip_colored.with_sc(SceneFlags.every(clip_colored.num_frames, freq=1))
    return HAVC_cmnet2(
        clip=clip, clip_ref=ref, render_speed="medium", render_vivid=True,
        ref_merge=color_temp, dark=True, dark_p=(0.2, 0.8), ref_thresh=0.10,
        encode_mode=0, max_memory_frames=0, ref_freq=0, ref_norm=True,
        smooth=True, smooth_p=(0.3, 0.7, 0.9, 0.0, "none"),
        colormap=chroma_adjust, engine_config=engine_config,
        batch_size=batch_size,
    )


def HAVC_main_colorizer(
    clip: Clip,
    Preset: str = "Medium",
    ColorModel: str = "Video+Artistic",
    CombMethod: str = "Simple",
    VideoTune: str = "Stable",
    ColorFix: str = "Magenta/Violet",
    ColorTemp: str = "None",
    ColorTune: str = "Medium",
    ColorMap: str = "None",
    EnableDeepEx: bool = False,
    DeepExMethod: int = 0,
    DeepExPreset: str = "Medium",
    DeepExRefMerge: int = 0,
    DeepExOnlyRefFrames: bool = False,
    ScFrameDir: Optional[str] = None,
    ScThreshold: float = 0.10,
    ScThtOffset: int = 1,
    ScMinFreq: int = 0,
    ScMinInt: int = 1,
    ScThtSSIM: float = 0.0,
    ScNormalize: bool = False,
    DeepExModel: int = 0,
    DeepExVivid: bool = True,
    DeepExEncMode: int = 0,
    DeepExMaxMemFrames: int = 0,
    FrameInterp: int = 0,
    RefRange: tuple = (0, 0),
    enable_fp16: bool = True,
    debug_level: int = 0,
    engine_config: Optional[str] = None,
    batch_size: int = 8,
) -> Clip:
    """Main HAVC coloring function (HAVC_main_colorizer,
    __init__.py:796-912) — full reference orchestration:

    * classic path: HAVC_colorizer (or HAVC_colorizer_fast with
      FrameInterp), optional Placebo/VerySlow tile slicing, ColorTemp
      re-color, then the speed-tier stabilizer settings (colormap-only
      for fast presets; dark+smooth+colormap+stab for slower ones; the
      full chain incl. hue_range2 for placebo/veryslow) — :854-910;
    * DeepEx methods 0/1/2: HAVC reference generation -> HAVC_deepex ->
      fast-stabilizer settings (stab_p=(3,'A',1,0,0,0)) — :769-835;
    * DeepEx methods 3/4: directory references (DeepRemaster fast path
      for DeepExModel=2) — :837-852;
    * DeepEx methods 5/6: external reference video + RefRange slice ->
      HAVC_restore_video — :785-800.

    ``enable_fp16`` maps to the engines' reduced-precision path (bf16 on
    TPU).  ``debug_level`` sets the log level.
    """
    HAVC_set_debug_level(debug_level)

    speed_id, deoldify_rf, ddcolor_rf = presets.get_render_factors(Preset)
    ddcolor_weight = presets.get_mweight(VideoTune)
    do_model, dd_model, dd_method = presets.get_color_model(ColorModel)
    if dd_method == 2:
        dd_method = presets.get_comb_method(CombMethod)
    dd_tweak, hue_range, hue_range2, chroma_adjust, chroma_adjust2 = (
        presets.get_color_tune(ColorTune, ColorFix, ColorMap, dd_model)
    )

    # stabilization not applicable when only refs are output or ColorTune
    # is disabled (:748-749)
    stab_enabled = not DeepExOnlyRefFrames and ColorTune.lower() != "none"

    color_temp = presets.get_temp_color(ColorTemp)
    if color_temp > 0:
        ScMinFreq = 1  # forced (:753-755)
        DeepExVivid = EnableDeepEx
    if FrameInterp > 4:
        EnableDeepEx = False  # incompatible (:756-757)

    # Placebo/VerySlow tile slicing geometry (:760-767)
    slices_n = 0
    overlap_x = int(round(max(min((0.5 * clip.width) * 0.2, 192), 64)) // 2 * 2)
    overlap_y = int(round(max(min((0.5 * clip.height) * 0.2, 108), 64)) // 2 * 2)
    deoldify_rf_n = min(max(math.trunc((0.5 * clip.width + overlap_x) / 16), 22), 32)
    ddcolor_rf_n = deoldify_rf_n
    if speed_id in (0, 1):
        slices_n = 4 if speed_id == 0 else 2

    def _colorize(c, do_rf, dd_rf, **sc):
        return HAVC_colorizer(
            c, method=dd_method, mweight=ddcolor_weight,
            deoldify_p=(do_model, do_rf, 1.0, 0.0),
            ddcolor_p=(dd_model, dd_rf, 1.0, 0.0, enable_fp16),
            ddtweak=tuple(dd_tweak), ddtweak_p=(DEF_TWEAK_p, hue_range),
            batch_size=batch_size, **sc,
        )

    if EnableDeepEx and DeepExMethod in (0, 1, 2, 5, 6,
                                         DEF_HAVC_METHOD_PLACEBO):
        from .exemplar import HAVC_deepex, HAVC_restore_video

        _check_deepex_input(DeepExOnlyRefFrames, ScFrameDir, DeepExMethod,
                            ScThreshold, ScMinFreq, DeepExRefMerge)

        ref_freq = ScMinFreq if ScMinFreq > 1 else 0
        if DeepExRefMerge > 0:
            ScMinFreq = 1
        ref_tresh = (ScThreshold if ScThreshold is not None
                     and 0 < ScThreshold < 1 else 0.10)

        if DeepExMethod in (5, 6):
            from .io import read_video

            clip_ref = read_video(ScFrameDir)
            clip_s, clip_e = RefRange
            if clip_e > 0 and 0 <= clip_s <= clip_e:
                clip_ref = clip_ref[clip_s:clip_e]
            clip_colored = HAVC_restore_video(
                clip, clip_ref, method=DeepExMethod,
                render_speed=DeepExPreset, ex_model=DeepExModel,
                ref_merge=DeepExRefMerge, ref_thresh=ref_tresh,
                ref_freq=ref_freq, max_memory_frames=DeepExMaxMemFrames,
                render_vivid=DeepExVivid, encode_mode=DeepExEncMode,
                ref_norm=ScNormalize, engine_config=engine_config,
                batch_size=batch_size,
            )
        else:  # HAVC methods 0/1/2 (+ the internal PLACEBO interp method)
            if FrameInterp == 0 or DeepExRefMerge == 0:
                clip_ref = _colorize(
                    clip, deoldify_rf, ddcolor_rf,
                    sc_threshold=ScThreshold, sc_tht_offset=ScThtOffset,
                    sc_min_freq=ScMinFreq, sc_min_int=ScMinInt,
                    sc_tht_ssim=ScThtSSIM, sc_normalize=ScNormalize,
                )
            else:
                clip_ref = HAVC_colorizer_fast(
                    clip, method=dd_method, mweight=ddcolor_weight,
                    deoldify_p=(do_model, deoldify_rf, 1.0, 0.0),
                    ddcolor_p=(dd_model, ddcolor_rf, 1.0, 0.0, enable_fp16),
                    ddtweak=tuple(dd_tweak),
                    ddtweak_p=(DEF_TWEAK_p, hue_range),
                    frame_interp=FrameInterp, chroma_adjust=chroma_adjust,
                    debug_level=debug_level, batch_size=batch_size,
                )
            if color_temp > 0:
                clip_ref = _colortemp_recolor(
                    clip, clip_ref, color_temp, chroma_adjust,
                    engine_config, batch_size,
                )
            if DeepExMethod != DEF_HAVC_METHOD_PLACEBO:
                clip_colored = HAVC_deepex(
                    clip=clip, clip_ref=clip_ref, method=DeepExMethod,
                    render_speed=DeepExPreset, render_vivid=DeepExVivid,
                    ref_merge=DeepExRefMerge, sc_framedir=ScFrameDir,
                    only_ref_frames=DeepExOnlyRefFrames, dark=True,
                    dark_p=(0.2, 0.8), ref_thresh=ref_tresh,
                    ex_model=DeepExModel, encode_mode=DeepExEncMode,
                    max_memory_frames=DeepExMaxMemFrames,
                    ref_freq=ScMinFreq, ref_norm=ScNormalize, smooth=True,
                    smooth_p=(0.3, 0.7, 0.9, 0.0, "none"),
                    colormap=chroma_adjust, engine_config=engine_config,
                    batch_size=batch_size,
                )
            else:
                clip_colored = clip_ref

        # faster stabilization settings on the DeepEx output (:832-835)
        if DeepExMethod != DEF_HAVC_METHOD_PLACEBO:
            clip_colored = HAVC_stabilizer(
                clip_colored, stab=stab_enabled, stab_p=(3, "A", 1, 0, 0, 0),
                colormap=chroma_adjust2, render_factor=min(deoldify_rf, ddcolor_rf),
                batch_size=batch_size,
            )
        return clip_colored

    if EnableDeepEx and DeepExMethod in (3, 4):
        from .exemplar import HAVC_DeepRemaster, HAVC_deepex

        if DeepExModel == 2:
            # DeepRemaster fast path reads the folder directly (:839-842)
            return HAVC_DeepRemaster(
                clip, render_vivid=DeepExVivid, ref_dir=ScFrameDir,
                ref_buffer_size=DeepExMaxMemFrames or 20, mode=0,
            )
        ref_merge = 0 if DeepExModel != 3 else DeepExRefMerge
        return HAVC_deepex(
            clip=clip, clip_ref=None, method=DeepExMethod,
            render_speed=DeepExPreset, render_vivid=DeepExVivid,
            sc_framedir=ScFrameDir, ref_merge=ref_merge,
            only_ref_frames=DeepExOnlyRefFrames, dark=True,
            dark_p=(0.2, 0.8), smooth=True,
            smooth_p=(0.3, 0.7, 0.9, 0.0, "none"), ex_model=DeepExModel,
            encode_mode=DeepExEncMode,
            max_memory_frames=DeepExMaxMemFrames, colormap=chroma_adjust,
            engine_config=engine_config, batch_size=batch_size,
        )

    # ------------------- classic path (:854-910) -------------------
    # NOTE: the classic path colorizes EVERY frame — ScThreshold only
    # gates DeepEx reference generation (:856-860 call without sc_*)
    if FrameInterp == 0:
        if slices_n == 0:
            clip_colored = _colorize(clip, deoldify_rf, ddcolor_rf)
        else:
            ct = HAVC_clip_slice(
                clip, slices=slices_n, overlap_x=overlap_x,
                overlap_y=overlap_y,
            )
            tiles_colored = _colorize(ct.tiles_clip, deoldify_rf_n, ddcolor_rf_n)
            clip_colored = HAVC_clip_reconstruct(
                ct.with_tiles(tiles_colored), chroma_resize=True
            )
    else:
        fast_kw = dict(
            method=dd_method, mweight=ddcolor_weight,
            ddtweak=tuple(dd_tweak), ddtweak_p=(DEF_TWEAK_p, hue_range),
            frame_interp=FrameInterp, chroma_adjust=chroma_adjust,
            debug_level=debug_level, batch_size=batch_size,
        )
        if slices_n == 0:
            clip_colored = HAVC_colorizer_fast(
                clip, deoldify_p=(do_model, deoldify_rf, 1.0, 0.0),
                ddcolor_p=(dd_model, ddcolor_rf, 1.0, 0.0, enable_fp16),
                **fast_kw,
            )
        else:
            ct = HAVC_clip_slice(
                clip, slices=slices_n, overlap_x=overlap_x,
                overlap_y=overlap_y,
            )
            tiles_colored = HAVC_colorizer_fast(
                ct.tiles_clip, deoldify_p=(do_model, deoldify_rf_n, 1.0, 0.0),
                ddcolor_p=(dd_model, ddcolor_rf_n, 1.0, 0.0, enable_fp16),
                **fast_kw,
            )
            clip_colored = HAVC_clip_reconstruct(
                ct.with_tiles(tiles_colored), chroma_resize=True
            )

    if color_temp > 0:
        clip_colored = _colortemp_recolor(
            clip, clip_colored, color_temp, chroma_adjust, engine_config,
            batch_size,
        )

    # speed-tier stabilizer settings (:905-910)
    rf = min(deoldify_rf, ddcolor_rf)
    if speed_id > 4:  # fast / faster / veryfast: colormap only
        clip_colored = HAVC_stabilizer(
            clip_colored, colormap=chroma_adjust, render_factor=rf,
            batch_size=batch_size,
        )
    elif speed_id > 1:  # slower / slow / medium
        clip_colored = HAVC_stabilizer(
            clip_colored, dark=True, dark_p=(0.2, 0.8),
            colormap=chroma_adjust, smooth=True,
            smooth_p=(0.3, 0.7, 0.9, 0.0, "none"),
            stab=(stab_enabled and dd_method != 0),
            stab_p=(5, "A", 1, 15, 0.2, 0.8), render_factor=rf,
            batch_size=batch_size,
        )
    else:  # placebo / veryslow: all filters incl. hue_range2
        clip_colored = HAVC_stabilizer(
            clip_colored, dark=True, dark_p=(0.2, 0.8),
            colormap=chroma_adjust, smooth=True,
            smooth_p=(0.3, 0.7, 0.9, 0.0, "none"), stab=stab_enabled,
            stab_p=(5, "A", 1, 15, 0.2, 0.8, hue_range2), render_factor=rf,
            batch_size=batch_size,
        )
    return clip_colored


def HAVC_main_presets(
    clip: Clip,
    Preset: str = "Medium",
    FrameInterp: int = 0,
    ColorModel: str = "Video+Artistic",
    CombMethod: str = "Simple",
    VideoTune: str = "Stable",
    ColorFix: str = "Magenta/Violet",
    ColorTune: str = "Light",
    ColorMap: str = "None",
    ColorTemp: str = "None",
    BlackWhiteTune: str = "None",
    BlackWhiteMode: int = 0,
    BlackWhiteBlend: bool = True,
    EnableDeepEx: bool = False,
    DeepExMethod: int = 0,
    DeepExPreset: str = "Medium",
    DeepExRefMerge: int = 0,
    DeepExOnlyRefFrames: bool = False,
    ScFrameDir: Optional[str] = None,
    ScThreshold: float = 0.10,
    ScThtOffset: int = 1,
    ScMinFreq: int = 0,
    ScMinInt: int = 1,
    ScThtSSIM: float = 0.0,
    ScNormalize: bool = False,
    DeepExModel: int = 0,
    DeepExVivid: bool = True,
    DeepExEncMode: int = 0,
    DeepExMaxMemFrames: int = 0,
    RefRange: tuple = (0, 0),
    enable_fp16: bool = True,
    debug_level: int = 0,
    engine_config: Optional[str] = None,
    batch_size: int = 8,
    lut: Optional[int] = None,
    deflicker: bool = False,
) -> Clip:
    """Preset pipeline (HAVC_main_presets, __init__.py:469-535):

    * BlackWhiteMode 6 (MSRCP retinex) runs as a PRE-pass (bw_method=5 on
      the B&W input) and downgrades the post-pass to light/CLAHE (:500-505);
    * HAVC_main_colorizer with every knob forwarded;
    * BlackWhiteTune post-pass;
    * ColorFix='retinex/red' applies the ColorTune-selected film LUT
      (Exploration 0.8 / City_Skyline 0.6 / Amber_Light 0.4 or FUJ_Film
      0.6) (:518-529);
    * deflicker whenever DeepEx/ColorTemp/retinex ran (:496, :531-532).

    TPU-native extras: ``lut`` applies an extra HAVC_TimeCube look and
    ``deflicker`` forces the deflicker stage; ``engine_config`` and
    ``batch_size`` thread through.
    """
    HAVC_set_debug_level(debug_level)
    speed_id, _, _ = presets.get_render_factors(Preset)

    EnableRetinex = (ColorTune.lower() != "none"
                     and ColorFix.lower() == "retinex/red")
    BWTuneRetinex = (BlackWhiteTune.lower() != "none" and BlackWhiteMode == 6)
    DeFlicker = (EnableDeepEx or ColorTemp.lower() != "none"
                 or EnableRetinex or BWTuneRetinex or deflicker)

    from .utils.profiling import stage_timer

    work = clip
    if BWTuneRetinex:
        with stage_timer("bw_pre_tune"):
            work = HAVC_bw_tune(work, BlackWhiteTune, bw_method=5,
                                luma_blend=BlackWhiteBlend,
                                batch_size=batch_size)
        BlackWhiteTune, BlackWhiteMode, BlackWhiteBlend = "light", 0, True

    with stage_timer("colorizer"):
        clip_colored = HAVC_main_colorizer(
            work, Preset, ColorModel, CombMethod, VideoTune, ColorFix,
            ColorTemp, ColorTune, ColorMap, EnableDeepEx, DeepExMethod,
            DeepExPreset, DeepExRefMerge, DeepExOnlyRefFrames, ScFrameDir,
            ScThreshold, ScThtOffset, ScMinFreq, ScMinInt, ScThtSSIM,
            ScNormalize, DeepExModel, DeepExVivid, DeepExEncMode,
            DeepExMaxMemFrames, FrameInterp, RefRange, enable_fp16,
            debug_level, engine_config, batch_size,
        )

    if BWTuneRetinex:
        with stage_timer("retinex_tweak"):
            clip_colored = HAVC_tweak(clip_colored, hue=5.0, sat=0.95,
                                      bright=0, cont=0.98, gamma=0.98,
                                      batch_size=batch_size)

    if BlackWhiteTune.lower() != "none":
        with stage_timer("bw_post_tune"):
            clip_colored = HAVC_bw_tune(clip_colored, BlackWhiteTune,
                                        BlackWhiteMode, BlackWhiteBlend,
                                        batch_size=batch_size)

    clip_final = clip_colored
    if EnableRetinex:
        tune = ColorTune.lower()
        with stage_timer("retinex_lut"):
            if tune == "light":
                clip_final = HAVC_TimeCube(clip_colored, 0.8, lut3d.LUT_NAMES.index("exploration"), batch_size=batch_size)
            elif tune == "medium":
                clip_final = HAVC_TimeCube(clip_colored, 0.6, lut3d.LUT_NAMES.index("city_skyline"), batch_size=batch_size)
            elif tune == "strong":
                if ColorMap.lower() == "red->brown":
                    clip_final = HAVC_TimeCube(clip_colored, 0.4, lut3d.LUT_NAMES.index("amber_light"), batch_size=batch_size)
                else:
                    clip_final = HAVC_TimeCube(clip_colored, 0.6, lut3d.LUT_NAMES.index("fuj_film"), batch_size=batch_size)

    if lut is not None:
        with stage_timer("lut_effect"):
            clip_final = HAVC_TimeCube(clip_final, lut_effect=lut,
                                       batch_size=batch_size)

    if DeFlicker:
        with stage_timer("deflicker"):
            sc = clip_final.sc.sc_prev if clip_final.sc is not None else None
            fn = cached_jit(
                ("deflicker",),
                lambda: lambda f, s: temporal_ops.reduce_flicker(f, scenechange=s),
            )
            scv = jnp.asarray(
                (sc if sc is not None
                 else np.zeros(len(clip_final), np.int8)).astype(np.int32)
            )
            out = fn(jnp.asarray(clip_final.frames), scv)
            clip_final = clip_final.with_frames(
                out if clip_final.on_device else np.asarray(out)
            )
    # residual asynchronously-dispatched device work is charged here, so
    # the per-stage rows above stay dispatch-side and this row closes the
    # books (device_sync ~ 0 on host-resident clips)
    with stage_timer("device_sync", sync=clip_final.frames):
        pass
    return clip_final


def HAVC_veryslow_preset(
    clip: Clip,
    Preset: str = "Slower",
    FrameInterp: int = 0,
    ColorModel: str = "Video+Artistic",
    CombMethod: str = "Simple",
    VideoTune: str = "Stable",
    ColorFix: str = "Magenta/Violet",
    ColorTune: str = "Light",
    ColorMap: str = "None",
    ColorTemp: str = "None",
    BlackWhiteTune: str = "None",
    BlackWhiteMode: int = 0,
    BlackWhiteBlend: bool = True,
    EnableDeepEx: bool = False,
    DeepExMethod: int = 0,
    ScThreshold: float = 0.1,
    ScMinFreq: int = 0,
    RefRange: tuple = (0, 0),
    enable_fp16: bool = True,
    debug_level: int = 0,
    engine_config: Optional[str] = None,
    batch_size: int = 8,
) -> Clip:
    """VerySlow dual-pass (HAVC_veryslow_preset, __init__.py:341-428):

    split the color model, colorize a HARD-darkened clip with the
    DeOldify half (then ScaleAbs-LUT medium bw-tune + sat 0.95/hue 5) and
    a lightly-darkened clip with the DDColor half, merge with clip luma
    at the VideoTune weight, optional ColorTemp re-color (FrameInterp>0:
    sparse refs + ColorMNet interpolation instead), then the final
    BlackWhiteTune adjust + hue 10/sat 1.05/cont 0.90 tweak blended 40/60.
    """
    do_name, dd_name = presets.split_color_model(ColorModel)

    def _pass(dark_gamma, dark_cont, model, cf, ctune, cmap, extra):
        dark = HAVC_tweak(clip, bright=-1 / 255.0, gamma=dark_gamma,
                          cont=dark_cont, batch_size=batch_size)
        return HAVC_main_presets(
            dark, Preset=Preset, ColorModel=model, ColorTemp="none",
            ColorFix=cf, ColorTune=ctune, ColorMap=cmap,
            BlackWhiteTune="light", BlackWhiteMode=0, BlackWhiteBlend=True,
            FrameInterp=0, EnableDeepEx=extra.get("deepex", EnableDeepEx),
            DeepExMethod=extra.get("method", DeepExMethod),
            ScThreshold=extra.get("tht", ScThreshold),
            ScMinFreq=extra.get("freq", ScMinFreq), RefRange=RefRange,
            enable_fp16=enable_fp16, debug_level=debug_level,
            engine_config=engine_config, batch_size=batch_size,
        )

    color_temp = presets.get_temp_color(ColorTemp)
    interp = FrameInterp > 0
    extra = ({"deepex": True, "method": DEF_HAVC_METHOD_PLACEBO, "tht": 0.1,
              "freq": FrameInterp if FrameInterp < 5 else FrameInterp * 2}
             if interp else {})

    clip1 = None
    if do_name != "none":
        clip1 = _pass(0.90, 0.80, do_name, "none", "medium", "none", extra)
        clip1 = HAVC_ColorAdjust(clip1, BlackWhiteTune="medium",
                                 BlackWhiteMode=4, BlackWhiteBlend=True,
                                 ReColor=False, chroma_resize=True,
                                 batch_size=batch_size)
        clip1 = HAVC_tweak(clip1, sat=0.95, hue=5, batch_size=batch_size)
    clip2 = None
    if dd_name != "none":
        clip2 = _pass(0.95, 0.95, dd_name, ColorFix, ColorTune, ColorMap,
                      extra)

    if clip1 is None:
        clip_colored = HAVC_merge(clipa=clip2, clip_luma=clip, method=0,
                                  batch_size=batch_size)
    elif clip2 is None:
        clip_colored = HAVC_merge(clipa=clip1, clip_luma=clip, method=0,
                                  batch_size=batch_size)
    else:
        clip_colored = HAVC_merge(
            clipa=clip1, clipb=clip2, clip_luma=clip,
            weight=presets.get_mweight(VideoTune),
            method=presets.get_comb_method(CombMethod),
            batch_size=batch_size,
        )

    if interp:
        ref = clip_colored.with_sc(
            SceneFlags.every(clip_colored.num_frames, freq=extra["freq"])
        )
        clip_colored = _frame_interpolation(
            clip, ref, FrameInterp, chroma_adjust="300:360|0.8,0.1",
            process_id=2, batch_size=batch_size,
        )
    elif color_temp > 0:
        clip_colored = _colortemp_recolor(
            clip, clip_colored, color_temp, "300:360|0.8,0.1",
            engine_config, batch_size,
        )

    clip_adjusted = HAVC_ColorAdjust(
        clip_colored, BlackWhiteTune=BlackWhiteTune,
        BlackWhiteMode=BlackWhiteMode, BlackWhiteBlend=BlackWhiteBlend,
        ReColor=False, batch_size=batch_size,
    )
    clip_adjusted = HAVC_tweak(clip_adjusted, hue=10, sat=1.05, cont=0.90,
                               batch_size=batch_size)
    return HAVC_merge(clipa=clip_adjusted, clipb=clip_colored, weight=0.4,
                      method=2, batch_size=batch_size)


def HAVC_placebo_preset(
    clip: Clip,
    CombMethod: str = "Simple",
    VideoTune: str = "Stable",
    ColorModel: str = "Video+Artistic",
    ColorFix: str = "Magenta/Violet",
    ColorTune: str = "Light",
    ColorMap: str = "None",
    ColorTemp: str = "None",
    FrameInterp: int = 0,
    BlackWhiteTune: str = "None",
    BlackWhiteMode: int = 0,
    BlackWhiteBlend: bool = True,
    RefRange: tuple = (0, 0),
    enable_fp16: bool = True,
    debug_level: int = 0,
    engine_config: Optional[str] = None,
    batch_size: int = 8,
) -> Clip:
    """Placebo tiled-HD path (HAVC_placebo_preset, __init__.py:430-467):
    HAVC_main_presets at Preset='placebo' (4-tile slicing happens inside
    HAVC_main_colorizer), then ColorTemp re-color or ColorMNet frame
    interpolation."""
    kw = dict(
        ColorModel=ColorModel, CombMethod=CombMethod, VideoTune=VideoTune,
        ColorFix=ColorFix, ColorTune=ColorTune, ColorMap=ColorMap,
        ColorTemp="none", BlackWhiteTune=BlackWhiteTune,
        BlackWhiteMode=BlackWhiteMode, BlackWhiteBlend=BlackWhiteBlend,
        RefRange=RefRange, enable_fp16=enable_fp16, debug_level=debug_level,
        engine_config=engine_config, batch_size=batch_size,
    )
    if FrameInterp == 0:
        clip_colored = HAVC_main_presets(clip, "placebo", 0, **kw)
        color_temp = presets.get_temp_color(ColorTemp)
        if color_temp > 0:
            clip_colored = _colortemp_recolor(
                clip, clip_colored, color_temp, "300:360|0.8,0.1",
                engine_config, batch_size,
            )
        return clip_colored
    ref_freq = FrameInterp if FrameInterp < 5 else FrameInterp * 2
    clip_colored = HAVC_main_presets(
        clip, "placebo", 0, EnableDeepEx=True,
        DeepExMethod=DEF_HAVC_METHOD_PLACEBO, ScThreshold=0.1,
        ScMinFreq=ref_freq, **kw,
    )
    ref = clip_colored.with_sc(
        SceneFlags.every(clip_colored.num_frames, freq=ref_freq)
    )
    return _frame_interpolation(
        clip, ref, FrameInterp, chroma_adjust="300:360|0.8,0.1",
        process_id=2, batch_size=batch_size,
    )


def HAVC_main(
    clip: Clip,
    Preset: str = "Medium",
    FrameInterp: int = 0,
    ColorModel: str = "Video+Artistic",
    CombMethod: str = "Simple",
    VideoTune: str = "Stable",
    ColorFix: str = "Magenta/Violet",
    ColorTune: str = "Light",
    ColorMap: str = "None",
    ColorTemp: str = "None",
    BlackWhiteTune: str = "None",
    BlackWhiteMode: int = 0,
    BlackWhiteBlend: bool = True,
    EnableDeepEx: bool = False,
    DeepExMethod: int = 0,
    DeepExPreset: str = "Medium",
    DeepExRefMerge: int = 0,
    DeepExOnlyRefFrames: bool = False,
    ScFrameDir: Optional[str] = None,
    ScThreshold: float = 0.10,
    ScThtOffset: int = 1,
    ScMinFreq: int = 0,
    ScMinInt: int = 1,
    ScThtSSIM: float = 0.0,
    ScNormalize: bool = False,
    DeepExModel: int = 0,
    DeepExVivid: bool = True,
    DeepExEncMode: int = 0,
    DeepExMaxMemFrames: int = 0,
    RefRange: tuple = (0, 0),
    enable_fp16: bool = True,
    debug_level: int = 0,
    BWTune: Optional[str] = None,
    engine_config: Optional[str] = None,
    batch_size: int = 8,
) -> Clip:
    """Top-level entry (HAVC_main, __init__.py:101-330) — full reference
    parameter surface, same names and defaults.

    Preset routing (:320-330): Placebo -> HAVC_placebo_preset (tiled HD),
    VerySlow -> HAVC_veryslow_preset (dual darkened pass at 'Slower',
    DeepEx disabled), the rest -> HAVC_main_presets.

    TPU-native extras: ``BWTune`` (legacy alias of BlackWhiteTune),
    ``engine_config`` (exemplar engine scale override), ``batch_size``.
    ``enable_fp16`` maps to the engines' reduced-precision path (bf16 on
    TPU); ``debug_level`` sets the log level.
    """
    if BWTune is not None:
        BlackWhiteTune = BWTune
    HAVC_set_debug_level(debug_level)

    speed_id, _, _ = presets.get_render_factors(Preset)

    if speed_id == 0:
        return HAVC_placebo_preset(
            clip, CombMethod, VideoTune, ColorModel, ColorFix, ColorTune,
            ColorMap, ColorTemp, FrameInterp, BlackWhiteTune,
            BlackWhiteMode, BlackWhiteBlend, RefRange, enable_fp16,
            debug_level, engine_config=engine_config, batch_size=batch_size,
        )
    if speed_id == 1:
        return HAVC_veryslow_preset(
            clip, "slower", FrameInterp, ColorModel, CombMethod, VideoTune,
            ColorFix, ColorTune, ColorMap, ColorTemp, BlackWhiteTune,
            BlackWhiteMode, BlackWhiteBlend, EnableDeepEx=False,
            RefRange=RefRange, enable_fp16=enable_fp16,
            debug_level=debug_level, engine_config=engine_config,
            batch_size=batch_size,
        )
    return HAVC_main_presets(
        clip, Preset, FrameInterp, ColorModel, CombMethod, VideoTune,
        ColorFix, ColorTune, ColorMap, ColorTemp, BlackWhiteTune,
        BlackWhiteMode, BlackWhiteBlend, EnableDeepEx, DeepExMethod,
        DeepExPreset, DeepExRefMerge, DeepExOnlyRefFrames, ScFrameDir,
        ScThreshold, ScThtOffset, ScMinFreq, ScMinInt, ScThtSSIM,
        ScNormalize, DeepExModel, DeepExVivid, DeepExEncMode,
        DeepExMaxMemFrames, RefRange, enable_fp16, debug_level,
        engine_config, batch_size,
    )



# --------------------------------------------------------------------------
# Overlay / fast-colorizer / color-adjust / edge-detect / misc entry points
# --------------------------------------------------------------------------


def HAVC_clip_overlay(
    base: Clip,
    overlay: Clip = None,
    x: int = 0,
    y: int = 0,
    mask: Optional[Clip] = None,
    opacity: float = 1.0,
    mode: str = "normal",
    planes=None,
    mask_first_plane: bool = True,
    overlay_clip: Optional[Clip] = None,
    batch_size: int = 8,
) -> Clip:
    """Blend-mode compositor (HAVC_clip_overlay, __init__.py:3029-3148):
    9 blend modes, x/y placement, optional mask + opacity.  ``planes``
    selects which RGB channels are processed (others copy from base);
    ``mask_first_plane=False`` uses each mask channel for its own plane.
    ``overlay_clip`` is a deprecated alias of ``overlay``."""
    from .ops.overlay import overlay as op_overlay

    if overlay is None:
        overlay = overlay_clip
    if overlay is None:
        raise ValueError("HAVC_clip_overlay: overlay clip is required")
    if planes is None:
        plane_sel = (0, 1, 2)
    elif isinstance(planes, int):
        plane_sel = (planes,)
    else:
        plane_sel = tuple(planes)

    per_plane_mask = (
        mask is not None and not mask_first_plane
        and np.asarray(mask.frames).ndim == 4
    )
    mask_frames = None
    if mask is not None:
        mf = jnp.asarray(mask.frames)
        mask_frames = mf if per_plane_mask else (mf[..., 0] if mf.ndim == 4 else mf)

    def _compose(b, o, m):
        if per_plane_mask:
            outs = [
                op_overlay(b, o, x, y, m[..., c], opacity, mode)[..., c]
                for c in range(3)
            ]
            out = jnp.stack(outs, axis=-1)
        else:
            out = op_overlay(b, o, x, y, m, opacity, mode)
        if plane_sel != (0, 1, 2):
            keep = jnp.asarray(
                [1.0 if c in plane_sel else 0.0 for c in range(3)], b.dtype
            )
            out = out * keep + b * (1.0 - keep)
        return out

    fn = cached_jit(
        ("overlay", x, y, mode, opacity, mask is not None, per_plane_mask,
         plane_sel, base.height, base.width, overlay.height, overlay.width),
        lambda: (
            (lambda b, o, m: _compose(b, o, m))
            if mask is not None
            else (lambda b, o: _compose(b, o, None))
        ),
    )
    T = base.num_frames
    on_dev = base.on_device
    outs = []
    for s in range(0, T, batch_size):
        b = jnp.asarray(base.frames[s : s + batch_size])
        o = jnp.asarray(overlay.frames[s : s + batch_size])
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
    method: int = 2,
    mweight: float = 0.4,
    deoldify_p=(0, 24, 1.0, 0.0),
    ddcolor_p=(1, 24, 1.0, 0.0, True),
    ddtweak=(False, False, False),
    ddtweak_p=(DEF_TWEAK_p, "300:360|0.8,0.1"),
    frame_interp: int = 5,
    chroma_adjust: str = "none",
    debug_level: int = 0,
    sc_min_freq: Optional[int] = None,
    engine_config: Optional[str] = None,
    batch_size: int = 8,
) -> Clip:
    """Fast colorizer (HAVC_colorizer_fast, __init__.py:2160-2288):
    colorize only every ``frame_interp``-th frame with the classic
    engines (sc_threshold=0.1, sc_min_freq=frame_interp), then
    interpolate the in-between colors with an exemplar propagator
    (vs_frame_interpolation: interp < 5 Deep-Exemplar, >= 5 ColorMNet at
    refs every 2*interp; both render_vivid=True).

    ``sc_min_freq`` is a legacy alias of frame_interp."""
    if sc_min_freq is not None:
        frame_interp = sc_min_freq
    HAVC_set_debug_level(debug_level)
    if frame_interp not in range(1, 11):
        raise ValueError("HAVC_colorizer_fast: frame_interp must be in range [1-10]")
    ref = HAVC_colorizer(
        clip, method=method, mweight=mweight, deoldify_p=deoldify_p,
        ddcolor_p=ddcolor_p, ddtweak=ddtweak, ddtweak_p=ddtweak_p,
        sc_threshold=0.1, sc_tht_offset=1, sc_min_freq=frame_interp,
        sc_min_int=1, sc_tht_ssim=0.0, sc_normalize=False,
        batch_size=batch_size,
    )
    return _frame_interpolation(
        clip, ref, frame_interp, chroma_adjust, process_id=1,
        batch_size=batch_size,
    )


def HAVC_restore_video(*args, **kwargs):
    """Re-export of the exemplar restore entry (see havc_tpu.exemplar)."""
    from .exemplar import HAVC_restore_video as _restore

    return _restore(*args, **kwargs)


def HAVC_main_restore(
    clip: Clip,
    clip_colored: Optional[Clip] = None,
    DeepExPreset: str = "medium",
    DeepExModel: int = 0,
    DeepExRefMerge: int = 0,
    ScThreshold: float = 0.10,
    ScMinFreq: int = 0,
    ScNormalize: bool = False,
    DeepExMaxMemFrames: int = 0,
    DeepExMethod: int = 5,
    DeepExVivid: bool = True,
    DeepExEncMode: int = 0,
    BlackWhiteTune: str = "Medium",
    BlackWhiteMode: int = 0,
    BlackWhiteBlend: bool = True,
    chroma_resize: bool = False,
    engine_config: Optional[str] = None,
    batch_size: int = 8,
) -> Clip:
    """Main HAVC restoring function (HAVC_main_restore,
    __init__.py:1114-1264): optional exemplar re-color from
    ``clip_colored`` (BlackWhiteMode 6 runs MSRCP as a pre-pass), then
    the BlackWhiteTune post chain with the reference's per-mode
    hue/sat/bright/cont/gamma tweak tables."""
    del chroma_resize  # speed hack in the reference; stages already work at chroma res
    BWTuneRetinex = BlackWhiteTune.lower() != "none" and BlackWhiteMode == 6

    if clip_colored is not None:
        work = clip
        if BWTuneRetinex:
            work = HAVC_bw_tune(work, BlackWhiteTune, bw_method=5,
                                luma_blend=BlackWhiteBlend,
                                batch_size=batch_size)
            BlackWhiteTune, BlackWhiteMode = "none", 5
        out = HAVC_restore_video(
            work, clip_colored, method=DeepExMethod,
            render_speed=DeepExPreset, ex_model=DeepExModel,
            ref_merge=DeepExRefMerge, ref_thresh=ScThreshold,
            ref_freq=ScMinFreq, max_memory_frames=DeepExMaxMemFrames,
            render_vivid=DeepExVivid, encode_mode=DeepExEncMode,
            ref_norm=ScNormalize, engine_config=engine_config,
            batch_size=batch_size,
        )
        if BWTuneRetinex:
            return HAVC_tweak(out, hue=5.0, sat=0.95, bright=0, cont=0.98,
                              gamma=0.98, batch_size=batch_size)
        if BlackWhiteTune.lower() != "none":
            out = HAVC_adjust_rgb(out, strength=0.5,
                                  gamma=(1.0, 1.0, 0.98),
                                  batch_size=batch_size)
            return HAVC_tweak(out, hue=5, sat=1.05, bright=0, cont=1.0,
                              batch_size=batch_size)
        return out

    if BlackWhiteTune.lower() == "none":
        return clip
    BlackWhiteMode = min(BlackWhiteMode, 5)

    i = BlackWhiteMode
    cont = [1.0, 0.95, 1.0, 0.95, 0.95, 0.90]
    hue = [-10.0, -10.0, -10.0, -10.0, -10.0, -5.0]
    sat = [1.10, 1.05, 1.10, 1.10, 0.95, 0.95]
    bright = [0.0, 0.0, 0.0, 0.0, 0.0, -1.0]
    if BlackWhiteTune.lower() == "light":
        gamma = [1.0, 0.98, 0.98, 0.98, 0.98, 0.98]
    else:
        gamma = [1.0, 0.95, 0.95, 0.95, 0.95, 0.95]

    out = HAVC_bw_tune(clip, BlackWhiteTune, i, BlackWhiteBlend, True,
                       batch_size=batch_size)
    if BlackWhiteMode < 4:  # skip for ScaleAbs / Retinex
        out = HAVC_tweak(out, hue[i], sat[i], bright[i] / 255.0, cont[i],
                         gamma[i], batch_size=batch_size)
    return out


def HAVC_ColorAdjust(
    clip: Clip,
    BlackWhiteTune: str = "Light",
    BlackWhiteMode: int = 0,
    BlackWhiteBlend: bool = True,
    ReColor: bool = True,
    Strength: int = 0,
    ScThreshold: float = 0.10,
    ScNormalize: bool = True,
    DeepExVivid: bool = True,
    ScMinFreq: int = 0,
    chroma_resize: bool = False,
    clip_ref: Optional[Clip] = None,
    engine_config: Optional[str] = None,
    batch_size: int = 8,
) -> Clip:
    """HAVC color post-processing (HAVC_ColorAdjust, __init__.py:957-1110):
    optional ReColor (ColorMNet re-color of the clip itself at freq-1
    references, merge strength via DeepExRefMerge = 1 + (4 - Strength)),
    BlackWhiteTune via HAVC_main_restore, and the BlackWhiteMode 4/6
    ColorTune film-LUT remapping table.

    TPU-native extra: ``clip_ref`` re-colors from an external reference
    clip instead of the clip itself."""
    DeepExRefMerge = 1 + min(max(4 - Strength, 0), 4)

    if BlackWhiteTune.lower() == "none" and not ReColor and clip_ref is None:
        return clip

    if ReColor or clip_ref is not None:
        clip_colored = clip_ref if clip_ref is not None else clip
        clip_colored = clip_colored.with_sc(
            SceneFlags.every(clip_colored.num_frames, freq=1)
        )
    else:
        clip_colored = None

    tn_id = presets.get_tune_id(BlackWhiteTune)
    if tn_id != 0 and BlackWhiteMode in (4, 6):
        bw_tune, bw_mode = "none", 4
    else:
        bw_tune, bw_mode = BlackWhiteTune, BlackWhiteMode

    out = HAVC_main_restore(
        clip, clip_colored, "medium", 0, DeepExRefMerge, ScThreshold,
        ScMinFreq, ScNormalize, 0, 5, DeepExVivid, 0,
        BlackWhiteTune=bw_tune, BlackWhiteMode=bw_mode,
        BlackWhiteBlend=BlackWhiteBlend, chroma_resize=chroma_resize,
        engine_config=engine_config, batch_size=batch_size,
    )

    if tn_id != 0 and BlackWhiteMode in (4, 6):
        # ColorTune film-LUT remap (__init__.py:1046-1058)
        lut_map = {
            (4, 1): (0.8, "exploration"), (4, 2): (0.6, "city_skyline"),
            (4, 3): (0.5, "amber_light"), (6, 1): (0.6, "fuj_film"),
            (6, 2): (0.7, "flat_pop"), (6, 3): (0.5, "warm_haze"),
        }
        entry = lut_map.get((BlackWhiteMode, tn_id))
        if entry is not None:
            strength, name = entry
            out = HAVC_TimeCube(out, strength,
                                lut3d.LUT_NAMES.index(name),
                                batch_size=batch_size)
    return out


def HAVC_SceneDetectEdges(
    clip: Clip,
    sc_threshold: float = 0.035,
    sc_tht_offset: int = 2,
    sc_tht_ssim: float = 0.80,
    sc_min_int: int = 20,
    sc_mult_tht: int = 15,
    sc_tht_white: float = 0.70,
    sc_tht_black: float = 0.10,
    sc_debug: bool = False,
) -> Clip:
    """Edge-based scene detection (HAVC_SceneDetectEdges, __init__.py:3227;
    vsscdetect_edge.py:32-260 — retinex edge mask, offset-frame diff,
    multi-threshold decision reasons, luma gates, SSIM confirmation).
    ``sc_tht_offset`` maps to the internal detector's frame-diff offset
    (the reference passes it as ``sc_diff_offset``)."""
    from .scene.edges import scene_detect_edges

    flags = scene_detect_edges(
        np.asarray(clip.frames),
        threshold=sc_threshold,
        frequency=0,
        sc_diff_offset=sc_tht_offset,
        sc_min_int=sc_min_int,
        sc_mult_tht=sc_mult_tht,
        tht_white=sc_tht_white,
        tht_black=sc_tht_black,
        sc_tht_ssim=sc_tht_ssim,
    )
    if sc_debug:
        print("HAVC-SC-EDGES:", list(np.nonzero(flags.sc_prev)[0]))
    return clip.with_sc(flags)


def HAVC_read_video(
    source: str = None,
    fpsnum: int = 0,
    fpsden: int = 1,
    width: int = 0,
    height: int = 0,
    return_rgb: bool = True,
    path: Optional[str] = None,
    **kwargs,
) -> Clip:
    """Video reader entry (havc_utils.HAVC_read_video:249-322): decode to
    full-range RGB float frames; ``width``/``height`` > 0 resize with
    Spline36 (either alone keeps the other dimension); ``fpsnum/fpsden``
    forces the frame rate.  ``return_rgb=False`` (the reference's
    limited-range YUV output mode) is accepted but this eager pipeline
    always yields RGB — the limited/full bracket is applied at the
    restore_format boundary instead.  ``path`` is a deprecated alias of
    ``source``."""
    from .io import read_video
    from .ops.resize import resize as _resize

    if source is None:
        source = path
    if source is None:
        raise ValueError("HAVC_read_video: source is required")
    if not os.path.isfile(source):
        raise IOError(f"HAVC: invalid clip -> {source}")
    del return_rgb
    fps_force = fpsnum / fpsden if fpsnum > 0 else None
    clip = read_video(source, fps_force=fps_force, **kwargs)
    w = width if width > 0 else (clip.width if height > 0 else 0)
    h = height if height > 0 else (clip.height if width > 0 else 0)
    if w > 0 and h > 0 and (w != clip.width or h != clip.height):
        clip = _batched(
            clip, lambda x: jnp.clip(_resize(x, h, w, "spline36"), 0.0, 1.0)
        )
    return clip


def HAVC_export_list_frames(
    clip: Clip,
    sc_framedir: str = "./",
    ref_list: Optional[list] = None,
    offset: int = 0,
    ref_ext: str = "jpg",
    ref_jpg_quality: int = 95,
    ref_override: bool = True,
    fast_extract: bool = True,
    frame_list: Optional[list] = None,
) -> list:
    """Export an explicit frame list (HAVC_export_list_frames,
    __init__.py:3387-3416 -> vs_list_export_frames).  A single-element
    ``ref_list=[N]`` exports a frame every N frames; ``fast_extract`` is
    accepted for compatibility (frames here are always random-access).
    ``frame_list`` is a deprecated alias of ``ref_list``."""
    del fast_extract
    from .io import export_reference_frames

    if ref_list is None:
        ref_list = frame_list
    if not ref_list:
        return []
    if len(ref_list) == 1:
        step = int(ref_list[0])
        ref_list = list(range(0, clip.num_frames, max(step, 1)))
    return export_reference_frames(
        clip, sc_framedir, ext=ref_ext, frame_list=ref_list,
        ref_offset=offset, ref_jpg_quality=ref_jpg_quality,
        ref_override=ref_override,
    )


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


def HAVC_set_tweak_params(tweaks_param: Optional[list] = None, **kwargs):
    """Set the global DDColor tweak defaults (HAVC_set_tweak_params,
    __init__.py:3418-3438).  ``tweaks_param`` is the reference's 8-slot
    list [bright, cont, gamma, luma_constrained_tweak, luma_min,
    gamma_luma_min, gamma_alpha, gamma_min]; individual slots can also be
    set by keyword name.  The shared DEF_TWEAK_p list is mutated in place
    so every engine default bound to it sees the update."""
    if tweaks_param is not None:
        DEF_TWEAK_p[:] = list(tweaks_param)
    names = ["bright", "cont", "gamma", "luma_constrained_tweak", "luma_min",
             "gamma_luma_min", "gamma_alpha", "gamma_min"]
    for k, v in kwargs.items():
        if k in names:
            DEF_TWEAK_p[names.index(k)] = v
    _GLOBAL_PARAMS["tweak"] = list(DEF_TWEAK_p)
    return list(DEF_TWEAK_p)


def HAVC_set_merge_params(method: int = 2, merge_params: Optional[list] = None,
                          cmc_p=None, lmm_p=None, alm_p=None, crt_p=None):
    """Set the global merge parameter pack for a combine method
    (HAVC_set_merge_params, __init__.py:3453-3520): method 3/7 -> CMC,
    4 -> LMM, 5 -> ALM, 6 -> CRT; methods 0-2 take no parameters.  The
    named ``cmc_p``/``lmm_p``/... keywords are an additional direct form.
    Packs are mutated in place so defaults bound to them see updates."""
    if merge_params is not None:
        if method in (3, 7):
            cmc_p = merge_params
        elif method == 4:
            lmm_p = merge_params
        elif method == 5:
            alm_p = merge_params
        elif method == 6:
            crt_p = merge_params
        elif method not in (0, 1, 2):
            raise ValueError(f"HAVC_set_merge_params: unsupported method: {method}")
    if cmc_p is not None:
        DEF_CMC_p[:] = list(cmc_p)
        _GLOBAL_PARAMS["cmc"] = list(cmc_p)
    if lmm_p is not None:
        DEF_LMM_p[:] = list(lmm_p)
        _GLOBAL_PARAMS["lmm"] = list(lmm_p)
    if alm_p is not None:
        DEF_ALM_p[:] = list(alm_p)
        _GLOBAL_PARAMS["alm"] = list(alm_p)
    if crt_p is not None:
        DEF_CRT_p[:] = list(crt_p)
        _GLOBAL_PARAMS["crt"] = list(crt_p)
    return dict(_GLOBAL_PARAMS)


def HAVC_ddeoldify(
    clip: Clip,
    method: int = 2,
    mweight: float = 0.4,
    deoldify_p=(0, 24, 1.0, 0.0),
    ddcolor_p=(1, 24, 1.0, 0.0, True),
    ddtweak: bool = False,
    ddtweak_p=(DEF_TWEAK_p, "300:360|0.8,0.1"),
    cmc_tresh: float = 0.2,
    lmm_p=(0.2, 0.8, 1.0),
    alm_p=(0.8, 1.0, 0.15),
    cmb_sw: bool = False,
    sc_threshold: float = 0.0,
    sc_tht_offset: int = 1,
    sc_min_freq: int = 0,
    sc_tht_ssim: float = 0.0,
    sc_normalize: bool = False,
    sc_min_int: int = 1,
    sc_tht_white: float = 0.70,
    sc_tht_black: float = 0.10,
    device_index: int = 0,
    torch_dir: Optional[str] = None,
    sc_debug: bool = False,
    batch_size: int = 8,
) -> Clip:
    """Deprecated legacy entry -> HAVC_colorizer (__init__.py:3612-3629):
    scalar ddtweak becomes the 3-flag pack and cmc_tresh seeds the CMC
    parameter list like the reference forward."""
    import warnings

    warnings.warn(
        "HAVC_ddeoldify() is deprecated; use HAVC_colorizer()", DeprecationWarning
    )
    return HAVC_colorizer(
        clip, method, mweight, deoldify_p, ddcolor_p,
        (bool(ddtweak), False, False), ddtweak_p,
        [cmc_tresh] + list(DEF_CMC_p[1:]), lmm_p, alm_p, DEF_CRT_p, cmb_sw,
        sc_threshold, sc_tht_offset, sc_min_freq, sc_tht_ssim, sc_normalize,
        sc_min_int, sc_tht_white, sc_tht_black, device_index, torch_dir,
        debug_level=2 if sc_debug else 0, batch_size=batch_size,
    )


def ddeoldify(
    clip: Clip,
    method: int = 2,
    mweight: float = 0.4,
    deoldify_p=(0, 24, 1.0, 0.0),
    ddcolor_p=(1, 24, 1.0, 0.0, True),
    dotweak: bool = False,
    dotweak_p=(0.0, 1.0, 1.0, False, 0.2, 0.5, 1.5, 0.5),
    ddtweak: bool = False,
    ddtweak_p=(DEF_TWEAK_p, "300:360|0.8,0.1"),
    degrain_strength: int = 0,
    cmc_tresh: float = 0.2,
    lmm_p=(0.2, 0.8, 1.0),
    alm_p=(0.8, 1.0, 0.15),
    cmb_sw: bool = False,
    device_index: int = 0,
    torch_dir: Optional[str] = None,
    batch_size: int = 8,
) -> Clip:
    """Deprecated legacy entry -> HAVC_colorizer (__init__.py:3642-3653);
    ``dotweak``/``dotweak_p``/``degrain_strength`` are accepted and
    dropped exactly like the reference's forward."""
    import warnings

    warnings.warn("ddeoldify() is deprecated; use HAVC_colorizer()", DeprecationWarning)
    del dotweak, dotweak_p, degrain_strength
    return HAVC_colorizer(
        clip, method, mweight, deoldify_p, ddcolor_p,
        (bool(ddtweak), False, False), ddtweak_p,
        [cmc_tresh] + list(DEF_CMC_p[1:]), lmm_p, alm_p, DEF_CRT_p, cmb_sw,
        sc_threshold=0, sc_min_freq=0, device_index=device_index,
        torch_dir=torch_dir, batch_size=batch_size,
    )


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


def vs_frame_interpolation(clip: Clip, clip_ref: Clip, frame_interp: int = 5,
                           chroma_adjust: str = "none",
                           process_id: int = 1, batch_size: int = 8) -> Clip:
    """Color frame interpolation (vs_frame_interpolation,
    __init__.py:2138-2157): public form of the exemplar-propagation
    interpolator used by HAVC_colorizer_fast and the Placebo preset."""
    return _frame_interpolation(
        clip, clip_ref, frame_interp, chroma_adjust, process_id, batch_size
    )


def disable_warnings():
    """Silence noisy third-party loggers (disable_warnings,
    __init__.py:3583-3603; the reference blocks matplotlib/PIL/torch/dinov2
    warnings that break its RPC server — here the equivalent set is JAX's
    platform chatter plus the same generic warning categories)."""
    import logging
    import warnings as _w

    for module in ("jax", "jax._src.xla_bridge", "flax", "matplotlib",
                   "PIL", "numpy", "absl"):
        logging.getLogger(module).setLevel(logging.ERROR)
    _w.simplefilter(action="ignore", category=FutureWarning)
    _w.simplefilter(action="ignore", category=UserWarning)
    _w.simplefilter(action="ignore", category=DeprecationWarning)


def HAVC_cmnet(clip: Clip, clip_ref: Optional[Clip] = None, **kwargs) -> Clip:
    """First ColorMNet instance front-end (HAVC_cmnet; same body as
    HAVC_deepex pinned to ex_model=0)."""
    kwargs.setdefault("ex_model", 0)
    return HAVC_deepex(clip, clip_ref, **kwargs)


def ddeoldify_main(
    clip: Clip,
    Preset: str = "Fast",
    VideoTune: str = "Stable",
    ColorFix: str = "Violet/Red",
    ColorTune: str = "Light",
    ColorMap: str = "None",
    degrain_strength: int = 0,
    enable_fp16: bool = True,
    batch_size: int = 8,
) -> Clip:
    """Deprecated legacy entry -> HAVC_main (__init__.py:3631-3639);
    ``degrain_strength`` is accepted and dropped like the reference."""
    import warnings

    warnings.warn("ddeoldify_main() is deprecated; use HAVC_main()", DeprecationWarning)
    del degrain_strength
    return HAVC_main(
        clip, Preset=Preset, VideoTune=VideoTune, ColorFix=ColorFix,
        ColorTune=ColorTune, ColorMap=ColorMap, enable_fp16=enable_fp16,
        batch_size=batch_size,
    )


def ddeoldify_stabilizer(
    clip: Clip,
    dark: bool = False,
    dark_p=(0.2, 0.8),
    smooth: bool = False,
    smooth_p=(0.3, 0.7, 0.9, 0.0, "none"),
    stab: bool = False,
    stab_p=(5, "A", 1, 15, 0.2, 0.80),
    colormap: str = "none",
    render_factor: int = 24,
    batch_size: int = 8,
) -> Clip:
    """Deprecated legacy entry -> HAVC_stabilizer (__init__.py:3656-3663)."""
    import warnings

    warnings.warn(
        "ddeoldify_stabilizer() is deprecated; use HAVC_stabilizer()",
        DeprecationWarning,
    )
    return HAVC_stabilizer(
        clip, dark=dark, dark_p=dark_p, smooth=smooth, smooth_p=smooth_p,
        stab=stab, stab_p=stab_p, colormap=colormap,
        render_factor=render_factor, batch_size=batch_size,
    )


__all__ += [
    "HAVC_cmnet",
    "HAVC_placebo_preset",
    "HAVC_veryslow_preset",
    "ddeoldify_main",
    "ddeoldify_stabilizer",
    "vs_frame_interpolation",
    "disable_warnings",
    "ClipTiles",
]
