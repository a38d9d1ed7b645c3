"""Streaming HAVC_main: bounded-memory classic colorization of arbitrarily
long video (VERDICT round-1 gap: io/stream.py existed but no HAVC_* entry
point could use it — a feature-length 1080p clip would need ~1.5 TB as a
Clip).

``HAVC_main_streaming(path_in, path_out, ...)`` runs the classic pipeline
(HAVC_main_colorizer semantics: spline64 work resize -> DeOldify || DDColor
-> combine -> dark/smooth/colormap post -> temporal chroma stabilization ->
deflicker -> full-res chroma restore) as a three-stage stream:

1. background decode (io/stream.stream_batches),
2. ONE jitted per-frame stage at work resolution (model + merge + post),
3. overlap-chunked temporal stage: the ±(nh+1) frame window the stabilizer
   and deflicker need is provided by processing chunks with halos, so the
   output is numerically IDENTICAL to the whole-clip path (halo >= window:
   interior frames see exactly the same neighbourhood; true clip edges use
   the same edge replication).

Memory: O(batch + chunk + halo) frames — independent of video length.

Reference mapping: the VapourSynth frame graph evaluates lazily with a
bounded frame cache (SURVEY L0); this is the TPU-native equivalent of that
property for the classic path.  The exemplar path streams via the scan
carry instead (exemplar.colormnet_propagate resume_state).
"""
from __future__ import annotations

import math
from typing import Optional

import numpy as np

import jax.numpy as jnp

from . import engines, presets
from .filters import chroma_bright_tweak, colormap_filter, dark_tweak
from .filters import recover_clip_luma
from .ops import merge as merge_ops
from .ops import temporal as temporal_ops
from .ops.resize import resize
from .utils import cached_jit

__all__ = ["HAVC_main_streaming"]


def _build_frame_stage(
    method: int, mweight: float, do_model: int, dd_model: int,
    deoldify_rf: int, ddcolor_rf: int, dd_tweak, hue_range: str,
    hue_range2: str, chroma_adjust2: str, frame_size: int,
):
    """One jitted function: work resize -> engines -> combine -> per-frame
    post chain; returns work-res colorized frames (temporal + restore
    happen downstream)."""
    do_fn = dd_fn = None
    do_params = dd_params = None
    if method != 1:
        do_fn, do_params = engines.make_deoldify_fn(do_model, deoldify_rf)
    if method != 0:
        dd_fn, dd_params = engines.make_ddcolor_fn(
            dd_model, ddcolor_rf, tweaks_flags=tuple(dd_tweak),
            tweaks=(engines.DEF_TWEAK_p, hue_range),
        )

    def stage(params, frames):
        p_do, p_dd = params
        work = jnp.clip(resize(frames, frame_size, frame_size, "spline64"), 0.0, 1.0)
        if method == 0:
            combined = do_fn(p_do, work)
        elif method == 1:
            combined = dd_fn(p_dd, work)
        else:
            a = do_fn(p_do, work)
            b = dd_fn(p_dd, work)
            combined = merge_ops.combine_models(a, b, method=method, b_weight=mweight)
        # stabilizer per-frame pre-chain (dark -> smooth -> colormap)
        x = dark_tweak(combined, dark_threshold=0.2, dark_amount=0.8)
        x = chroma_bright_tweak(
            x, black_threshold=0.3, white_threshold=0.7, dark_sat=0.9,
            dark_bright=-0.0, chroma_adjust=(hue_range2 or "none").lower(),
        )
        cmap = (chroma_adjust2 or "none").lower()
        if cmap not in ("none", ""):
            x = colormap_filter(x, cmap)
        return x

    key = ("stream_stage", method, mweight, do_model, dd_model, deoldify_rf,
           ddcolor_rf, tuple(dd_tweak), hue_range, hue_range2, chroma_adjust2,
           frame_size)
    return cached_jit(key, lambda: stage), (do_params, dd_params)


def HAVC_main_streaming(
    path_in: str,
    path_out: str,
    Preset: str = "medium",
    ColorModel: str = "video+artistic",
    CombMethod: str = "constrained-chroma",
    VideoTune: str = "balanced",
    ColorFix: str = "violet/red",
    ColorTune: str = "light",
    ColorMap: str = "none",
    enable_stabilizer: bool = True,
    stab_nframes: int = 5,
    batch_size: int = 8,
    chunk_size: int = 32,
    count: Optional[int] = None,
    codec: str = "mp4v",
) -> int:
    """Classic HAVC_main as a bounded-memory stream; returns frames written.

    Parameter semantics match HAVC_main (api.py) / the reference
    HAVC_main_presets classic path.  Exemplar/FrameInterp modes are not
    streamable through this entry (use the scan-carry API instead).
    """
    import cv2

    from .io.stream import stream_batches

    _, deoldify_rf, ddcolor_rf = presets.get_render_factors(Preset)
    do_model, dd_model, dd_method = presets.get_color_model(ColorModel)
    mweight = presets.get_mweight(VideoTune)
    method = presets.get_comb_method(CombMethod)
    if dd_method == 0:
        method = 0
    elif dd_method == 1:
        method = 1
    dd_tweak, hue_range, hue_range2, chroma_adjust, chroma_adjust2 = (
        presets.get_color_tune(ColorTune, ColorFix, ColorMap, dd_model)
    )

    cap = cv2.VideoCapture(path_in)
    fps = cap.get(cv2.CAP_PROP_FPS) or 25.0
    w = int(cap.get(cv2.CAP_PROP_FRAME_WIDTH))
    h = int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
    cap.release()
    if w <= 0 or h <= 0:
        raise IOError(f"cannot read video geometry: {path_in}")

    frame_size = min(max(ddcolor_rf, deoldify_rf) * 16, w)
    stage, params = _build_frame_stage(
        method, mweight, do_model, dd_model, deoldify_rf, ddcolor_rf,
        dd_tweak, hue_range, hue_range2, chroma_adjust2, frame_size,
    )

    nf = min(max(int(stab_nframes), 3), 15)
    nf = nf + 1 if nf % 2 == 0 else nf  # chroma_stabilizer rounds up to odd
    halo = ((nf - 1) // 2 + 1) if enable_stabilizer else 0  # +1: deflicker

    def temporal_chunk(x):
        # stab_p defaults (5, 'A', 1, 15, 0.2, 0.15): arithmetic window,
        # sat=1, tht=15, then 0.2 blend back to the unstabilized frames
        # (HAVC_stabilizer, api.py)
        s = temporal_ops.chroma_stabilizer(
            x, nframes=stab_nframes, weighted=False, sat=1.0, tht=15
        )
        s = x * 0.2 + s * 0.8
        return temporal_ops.reduce_flicker(s)

    temporal_fn = cached_jit(
        ("stream_temporal", stab_nframes, chunk_size, halo),
        lambda: temporal_chunk,
    )
    restore_fn = cached_jit(
        ("stream_restore", h, w, frame_size),
        lambda: lambda hi, lo: recover_clip_luma(
            hi, jnp.clip(resize(lo, h, w, "spline64"), 0.0, 1.0)
        ),
    )

    writer = cv2.VideoWriter(path_out, cv2.VideoWriter_fourcc(*codec), fps, (w, h))
    if not writer.isOpened():
        raise IOError(f"cannot open video writer: {path_out}")

    written = 0
    # rolling buffers: originals (full res) + colorized work-res frames;
    # work_buf[0] is global frame index `global_start`
    orig_buf: list[np.ndarray] = []
    work_buf: list[np.ndarray] = []
    global_start = 0
    next_emit = 0

    def emit(orig_chunk, work_chunk):
        nonlocal written
        out = np.asarray(
            restore_fn(jnp.asarray(orig_chunk), jnp.asarray(work_chunk))
        )
        for frame in out:
            u8 = (np.clip(frame, 0, 1) * 255).round().astype(np.uint8)
            writer.write(cv2.cvtColor(u8, cv2.COLOR_RGB2BGR))
            written += 1

    def flush(final: bool):
        """Emit every frame whose temporal window is complete (all frames
        when final).  Exactness: the window uses real past/future halo
        frames where they exist; at the true clip boundaries the padding
        replicates the edge frame — identical to the whole-clip ops' index
        clipping, so streaming == in-memory numerically."""
        nonlocal global_start, next_emit
        while True:
            buffered_end = global_start + len(work_buf)
            avail = buffered_end - next_emit
            if final:
                ready = min(avail, chunk_size)
            else:
                ready = chunk_size if avail - halo >= chunk_size else 0
            if ready <= 0:
                return

            lo = next_emit - global_start
            hi = lo + ready
            if not enable_stabilizer:
                emit(np.stack(orig_buf[lo:hi]), np.stack(work_buf[lo:hi]))
            else:
                ext_lo = max(lo - halo, 0)
                ext_hi = min(hi + halo, len(work_buf))
                ext = np.stack(work_buf[ext_lo:ext_hi])
                front = (lo - halo) - ext_lo  # negative -> pad front
                if front < 0:
                    ext = np.concatenate(
                        [np.repeat(ext[:1], -front, 0), ext])
                want = chunk_size + 2 * halo
                if ext.shape[0] < want:
                    ext = np.concatenate(
                        [ext, np.repeat(ext[-1:], want - ext.shape[0], 0)])
                smoothed = np.asarray(temporal_fn(jnp.asarray(ext)))
                emit(np.stack(orig_buf[lo:hi]), smoothed[halo : halo + ready])
            next_emit += ready
            # retain `halo` past frames for the next chunk's window
            drop = max((next_emit - halo) - global_start, 0)
            if drop:
                del orig_buf[:drop], work_buf[:drop]
                global_start += drop

    for batch in stream_batches(path_in, batch_size, prefetch=4, count=count):
        n = batch.shape[0]
        if n < batch_size:
            padded = np.concatenate(
                [batch, np.repeat(batch[-1:], batch_size - n, axis=0)]
            )
        else:
            padded = batch
        colored = np.asarray(stage(params, jnp.asarray(padded)))[:n]
        orig_buf.extend(batch)
        work_buf.extend(colored)
        flush(final=False)
    flush(final=True)
    writer.release()
    return written
