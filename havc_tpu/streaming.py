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
The default chunk of 64 amortizes the halo recompute (6/70 frames) and the
per-chunk temporal/restore/pack dispatches; measured on the real chip the
compute-only loop plateaus there (41 fps @ chunk 32 -> 48 fps @ chunk 64,
flat through 128 — BENCH r5).

Transfer design (tunnel/PCIe-bound paths): frames cross the host<->device
link as uint8 in BOTH directions (decode hands uint8 to the first jitted
stage, the final quantize runs on device), and the rolling halo buffers
between the per-frame stage and the temporal/restore stages are
DEVICE-RESIDENT — interior frames never round-trip to the host at all.
By default the link carries 1 byte/pixel up (B&W sources auto-detected as
gray within 3 code values upload luma only; bit-identical for an
exactly-gray decode) and 0.5 bytes/pixel down: in gray-upload mode the
host already owns the output luma, so only the packed I420 chroma planes
cross the link (``uv420``) and the luma-only deflicker runs on host Y
planes; when the device retunes luma (BWTune/LUT) auto falls back to full
device-side I420 packing (1.5 B/px, OpenCV-exact — the mp4 encoder
subsamples chroma to 4:2:0 anyway).  vs 3+3 for naive uint8 RGB that is
a 4-8x cut in link bytes.  Downloads start asynchronously when packed and
up to ``pipeline_depth`` (default 3) chunks stay in flight on the
download/write path so host encode overlaps device execution
(``pipeline_depth=1`` is the classic one-chunk-behind overlap).

Reference mapping: the VapourSynth frame graph evaluates lazily with a
bounded frame cache (SURVEY L0); this is the TPU-native equivalent of that
property for the classic path.  ``HAVC_restore_video_streaming`` extends
it to EVERY exemplar engine: ColorMNet streams via the scan carry
(resume_state), Deep-Exemplar via the carried scene reference, and
DeepRemaster via a bounded lookahead that replays the sliding
past/future reference window exactly (see its docstring).
"""
from __future__ import annotations

import math
from typing import Optional

import numpy as np

import jax.numpy as jnp

from . import engines, presets
from .filters import chroma_bright_tweak, colormap_filter, dark_tweak
from .filters import recover_clip_luma, recover_clip_luma_y
from .ops.colorspace import luma as luma_of
from .ops import merge as merge_ops
from .ops import temporal as temporal_ops
from .ops.resize import resize
from .utils import cached_jit

__all__ = ["HAVC_main_streaming", "HAVC_restore_video_streaming",
           "last_transfer"]

# observability: the transfer modes the LAST streaming call actually
# selected (upload+download), e.g. "gray+uv420" — ``transfer_format=
# 'auto'`` resolves per clip geometry/options, so callers (bench.py,
# logs) read back the decision here rather than re-deriving the gate
_LAST_TRANSFER: Optional[str] = None


def last_transfer() -> Optional[str]:
    """Upload+download modes selected by the most recent streaming call
    (``None`` before any call), e.g. ``"gray+uv420"`` / ``"rgb+i420"``."""
    return _LAST_TRANSFER


def _resolve_transfer(transfer_format: str, even: bool, use_gray: bool,
                      luma_retuned: bool = False):
    """Resolve the download mode and record the selection.

    ``uv420`` (chroma-only download, 0.5 B/px) is sound only when the
    host OWNS the output luma: gray upload (host Y == stage luma
    bit-exactly) and nothing retunes luma on device (BWTune/LUT).  An
    explicit ``uv420`` request that fails the gate falls back to
    ``i420`` (device-packed YUV420, 1.5 B/px) rather than erroring —
    matching what ``auto`` would pick; odd geometries fall back to RGB
    (I420 needs even dims).  Returns ``(use_uv420, use_i420)``.
    """
    uv_ok = even and use_gray and not luma_retuned
    tf = transfer_format
    if tf == "auto":
        tf = "uv420" if uv_ok else ("i420" if even else "rgb")
    use_uv420 = tf == "uv420" and uv_ok
    use_i420 = (tf == "i420" or (tf == "uv420" and not uv_ok)) and even
    global _LAST_TRANSFER
    _LAST_TRANSFER = ("gray+" if use_gray else "rgb+") + (
        "uv420" if use_uv420 else "i420" if use_i420 else "rgb")
    return use_uv420, use_i420


class _FrameBuf:
    """Rolling device-resident frame buffer with BATCH-granular storage.

    The r5.0 loop stored one device array per frame (``buf.extend(
    batch[:n])`` runs n slice programs) and re-``jnp.stack``-ed ~40 of
    them per chunk — O(frames) tiny dispatches per chunk, which on a
    high-latency link (the tunneled dev chip) dominated the streaming
    loop (compute-only 42 fps vs 66 fps for the same fused pipeline).
    Storing the stage's (B, ...) output batches whole keeps appends at
    ONE dispatch per batch and windows at one concat of <=~6 segment
    operands; dropping consumed frames slices at most the boundary
    segment once per chunk.
    """

    def __init__(self):
        self.segs: list = []  # device arrays, shape (b_i, ...)
        self.n = 0

    def __len__(self) -> int:
        return self.n

    def append(self, batch) -> None:
        self.segs.append(batch)
        self.n += int(batch.shape[0])

    def window(self, lo: int, hi: int):
        """Frames [lo, hi) with edge-replicated padding for out-of-range
        indices — identical to the whole-clip ops' index clipping.  One
        concatenate over the overlapping segments (plus the pad repeats
        at true clip edges)."""
        lo_c, hi_c = max(lo, 0), min(hi, self.n)
        parts, pos = [], 0
        for s in self.segs:
            b = int(s.shape[0])
            s_lo, s_hi = max(lo_c - pos, 0), min(hi_c - pos, b)
            if s_lo < s_hi:
                parts.append(s if (s_lo, s_hi) == (0, b) else s[s_lo:s_hi])
            pos += b
        if lo < 0:
            parts.insert(0, jnp.repeat(parts[0][:1], -lo, 0))
        if hi > self.n:
            parts.append(jnp.repeat(parts[-1][-1:], hi - self.n, 0))
        return parts[0] if len(parts) == 1 else jnp.concatenate(parts)

    def drop(self, k: int) -> None:
        """Forget the first ``k`` frames (their windows are complete)."""
        while self.segs and int(self.segs[0].shape[0]) <= k:
            b = int(self.segs[0].shape[0])
            k -= b
            self.n -= b
            self.segs.pop(0)
        if k:
            self.segs[0] = self.segs[0][k:]
            self.n -= k


def _sync_nodownload(dev) -> None:
    """Force a packed chunk's program to complete WITHOUT downloading it:
    fetch one element through a (1,...,1) slice.  Never ``reshape(-1)``
    — ravel copies the operand into the default tiled layout, padding
    the minor dim to the (8,128) tile (42.7x memory for ...x3 RGB
    shapes; see bench._sync_1px).  block_until_ready alone can return
    before compute completes on the axon platform (bench.py:13-20)."""
    np.asarray(dev[tuple(slice(0, 1) for _ in range(dev.ndim))])


def _studio_y(v_u8: np.ndarray) -> np.ndarray:
    """OpenCV's BT.601 studio-swing Y mapping of full-range luma bytes —
    the exact integer form cv2.COLOR_RGB2YUV_I420 applies, so the host-
    assembled Y plane matches the device I420 pack bit-for-bit."""
    v = v_u8.astype(np.int32)
    return ((900726 * v + (1 << 19) + (16 << 20)) >> 20).astype(np.uint8)


class _WritePipeline:
    """Pipelined device->host->encoder write path shared by both
    streaming entry points.

    Packed chunks queue with their async downloads already in flight;
    pushing a chunk retires the oldest ones down to ``depth``
    outstanding, so up to ``depth`` chunks overlap later compute and the
    host encode (``depth=1`` is the classic one-chunk-behind overlap).
    ``finish()`` retires everything.

    ``sink``: ``"video"`` encodes via ``writer``; ``"null"`` downloads
    but skips the encode; ``"device"`` only syncs (1-px slice fetch, no
    download).  In uv420 mode ``y_provider(meta, n)`` supplies the
    studio-swing Y planes (the host owns the output luma there) and
    ``meta`` is whatever the caller queued with the chunk.
    """

    def __init__(self, sink: str, writer, depth: int, use_uv420: bool,
                 use_i420: bool, y_provider=None):
        self.sink = sink
        self.writer = writer
        self.depth = max(int(depth), 1)
        self.use_uv420 = use_uv420
        self.use_i420 = use_i420
        self.y_provider = y_provider
        self.pending: list = []
        self.written = 0

    def push(self, dev, meta, n: int) -> None:
        if self.sink != "device":
            try:
                # start the device->host copy as soon as the chunk is
                # packed: it overlaps later chunks' compute and host IO
                dev.copy_to_host_async()
            except AttributeError:
                pass
        self.pending.append((dev, meta, n))
        self._drain(keep=self.depth)

    def finish(self) -> None:
        self._drain(keep=0)

    def _drain(self, keep: int) -> None:
        while len(self.pending) > keep:
            self._retire(*self.pending.pop(0))

    def _retire(self, dev, meta, n: int) -> None:
        if self.sink == "device":
            _sync_nodownload(dev)
            self.written += n
            return
        import cv2

        host = np.asarray(dev)
        if self.use_uv420:
            ystudio = self.y_provider(meta, n)
            for i in range(n):
                if self.writer is not None:
                    fr = np.concatenate([ystudio[i], host[i]], axis=0)
                    self.writer.write(
                        cv2.cvtColor(fr, cv2.COLOR_YUV2BGR_I420))
                self.written += 1
            return
        conv = cv2.COLOR_YUV2BGR_I420 if self.use_i420 else cv2.COLOR_RGB2BGR
        for fr in host:
            if self.writer is not None:
                self.writer.write(cv2.cvtColor(fr, conv))
            self.written += 1


def _is_gray(bgr: np.ndarray, tol: int = 3) -> bool:
    """True when a decoded frame's channels agree to within ``tol`` code
    values.  tol=0 would make the luma upload provably bit-identical;
    tol=3 additionally covers B&W mp4 that went through a re-encode
    (<=2-3 codes of chroma ringing, collapsed by the luma upload — below
    the engines' own luma-conversion differences)."""
    spread = (bgr.max(axis=-1).astype(np.int16)
              - bgr.min(axis=-1).astype(np.int16)).max()
    return int(spread) <= tol


def _build_frame_stage(
    method: int, mweight: float, do_model: int, dd_model: int,
    deoldify_rf: int, ddcolor_rf: int, dd_tweak, hue_range: str,
    hue_range2: str, chroma_adjust2: str, frame_size: int,
    bw_tune_id: int = 0, bw_method: int = 0,
):
    """One jitted function: (optional BWTune pre-tune at full res) -> work
    resize -> engines -> combine -> per-frame post chain; returns
    (tuned full-res LUMA planes, work-res colorized frames) — temporal +
    restore happen downstream.  The luma-only first output is exact: the
    restore stage never reads the original's chroma
    (recover_clip_luma = Y from original, UV from colorized), and
    buffering planes instead of RGB cuts the rolling full-res device
    buffer 3x.  Same knob resolution as
    api.HAVC_main_presets/HAVC_main_colorizer."""
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
        if frames.ndim == 3:
            # grayscale transfer boundary (B&W sources): 1 byte/PIXEL
            # crossed the link; replicate to RGB on device
            frames = frames[..., None]
        if frames.dtype == jnp.uint8:
            # uint8 transfer boundary: frames cross the host->device link at
            # 1 byte/channel; /255 fuses into the first compute stage here
            frames = frames.astype(jnp.float32) / 255.0
        if frames.shape[-1] == 1:
            frames = jnp.broadcast_to(frames, frames.shape[:-1] + (3,))
        if bw_tune_id > 0:
            from .api import bw_tune_frames

            frames = bw_tune_frames(frames, bw_tune_id, bw_method)
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
        return luma_of(frames), x

    key = ("stream_stage", method, mweight, do_model, dd_model, deoldify_rf,
           ddcolor_rf, tuple(dd_tweak), hue_range, hue_range2, chroma_adjust2,
           frame_size, bw_tune_id, bw_method)
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
    BWTune: str = "none",
    bw_method: int = 0,
    LUT: Optional[int] = None,
    EnableDeflicker: bool = True,
    enable_stabilizer: bool = True,
    stab_p=(5, "A", 1, 15, 0.2, 0.8),
    batch_size: int = 8,
    chunk_size: int = 64,
    count: Optional[int] = None,
    codec: str = "mp4v",
    gray_input="auto",
    transfer_format: str = "auto",
    pipeline_depth: int = 3,
    sink: str = "video",
    source: str = "video",
) -> int:
    """Classic HAVC_main as a bounded-memory stream; returns frames written.

    Knob resolution is SHARED with api.HAVC_main_presets (same presets
    tables, same bw_tune_frames pre-tune, same stabilizer parameter pack,
    the same HAVC_TimeCube LUT and reduce_flicker deflicker at full
    resolution after the restore).  Exemplar/FrameInterp modes stream via
    the scan-carry entry (HAVC_restore_video_streaming) instead.

    Transfer knobs (they decide bytes on the host<->device link, the
    bottleneck on tunneled/PCIe-fed chips):

    - ``gray_input``: ``"auto"`` (default) probes the first decoded frame;
      if its channels agree to within 3 code values — exactly-gray decode
      (bit-identical replication on device) or re-encoded B&W with
      residual chroma ringing (collapsed by the luma upload) — the input
      crosses the link as 1 byte/PIXEL luma.  ``True`` forces the luma
      path (``cv2.COLOR_BGR2GRAY``) even for colored sources (the classic
      pipeline never reads input chroma); ``False`` always sends RGB.
    - ``transfer_format``: ``"auto"`` (default) picks the cheapest sound
      mode.  ``"uv420"`` downloads ONLY the packed chroma planes
      (0.5 bytes/pixel): in gray-upload mode the host already owns the
      output luma (the stage luma is exactly the decoded gray), so the
      luma-only deflicker runs on host Y planes and the frame is
      reassembled host-side; requires gray upload, ``BWTune='none'`` and
      no LUT (both retune luma on device), else auto falls back to
      ``"i420"`` — full device-side YUV420 packing (1.5 bytes/pixel,
      OpenCV-exact BT.601 studio-swing; the mp4 encoder subsamples chroma
      to 4:2:0 anyway).  ``"rgb"`` downloads full RGB uint8 (exactly the
      in-memory pipeline's pre-encode frames).
    - ``pipeline_depth``: how many packed output chunks may be in flight
      on the download/write path before the oldest is drained.  Depth 1
      is the classic one-chunk-behind overlap; on a high-latency or
      drifting link (the tunneled dev chip runs 4-13 MB/s down) deeper
      pipelining keeps several async downloads outstanding so transfer
      latency hides behind compute.  Memory cost: ``depth`` packed chunks
      (uint8) on host+device.
    - ``sink``: measurement hooks that keep the COMPUTE path identical.
      ``"video"`` (default) encodes to ``path_out``; ``"null"`` performs
      the full device->host download but skips the cv2 encode/write
      (isolates encoder cost); ``"device"`` leaves every packed chunk on
      device and syncs on a 1-pixel fetch only (isolates the download
      leg — this is the pipeline-only fps artifact, see bench.py).
    - ``source``: ``"video"`` (default) decodes+uploads every frame;
      ``"device"`` decodes ONE batch, uploads it once, and feeds the
      device-resident batch ``count // batch_size`` times — the identical
      per-batch compute/chunk/pack machinery with ZERO link traffic on
      the input side (``count`` required, rounded down to a batch
      multiple).  With ``sink="device"`` this is the compute-only
      pipeline rate a directly-attached chip is bounded by.
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
    bw_tune_id = presets.get_tune_id(BWTune)

    cap = cv2.VideoCapture(path_in)
    fps = cap.get(cv2.CAP_PROP_FPS) or 25.0
    w = int(cap.get(cv2.CAP_PROP_FRAME_WIDTH))
    h = int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
    use_gray = bool(gray_input) and gray_input is not None
    if gray_input == "auto":
        # probe: send luma when the decode is gray to within 3 code values
        # (exactly-gray decode -> bit-identical replication; decoded B&W
        # mp4 that went through a re-encode carries <=2-3 codes of chroma
        # ringing, which the luma upload collapses — below the engines'
        # own luma-conversion differences, and the pipeline never reads
        # input chroma)
        ok, probe = cap.read()
        use_gray = bool(ok) and _is_gray(probe)
    cap.release()
    if w <= 0 or h <= 0:
        raise IOError(f"cannot read video geometry: {path_in}")
    even = h % 2 == 0 and w % 2 == 0
    # BWTune retunes luma on device; a LUT remaps luma and chroma jointly
    use_uv420, use_i420 = _resolve_transfer(
        transfer_format, even, use_gray,
        luma_retuned=bw_tune_id > 0 or LUT is not None)
    # device deflicker only when the tail stays on device; in uv420 mode
    # the (luma-only) deflicker runs on host Y planes instead
    dev_deflicker = EnableDeflicker and not use_uv420

    frame_size = min(max(ddcolor_rf, deoldify_rf) * 16, w)
    stage, params = _build_frame_stage(
        method, mweight, do_model, dd_model, deoldify_rf, ddcolor_rf,
        dd_tweak, hue_range, hue_range2, chroma_adjust2, frame_size,
        bw_tune_id=bw_tune_id, bw_method=bw_method,
    )

    # stab_p pack (HAVC_stabilizer semantics): (nframes, 'A'|'W', sat,
    # tht, weight-back, ...)
    stab_nframes = int(stab_p[0])
    stab_weighted = str(stab_p[1]).upper().startswith("W")
    stab_sat = float(stab_p[2])
    stab_tht = float(stab_p[3])
    stab_back = float(stab_p[4])
    stab_tht_scen = float(stab_p[5]) if len(stab_p) > 5 else 0.8
    nf = min(max(stab_nframes, 3), 15)
    nf = nf + 1 if nf % 2 == 0 else nf  # chroma_stabilizer rounds up to odd
    # halos: temporal chroma window at work res, plus 1 frame of full-res
    # deflicker context on each side (context frames themselves need their
    # chroma windows complete, so the buffers retain the sum)
    halo_t = ((nf - 1) // 2) if enable_stabilizer else 0
    # device context frames for the deflicker; in uv420 mode the host
    # does the deflicker but the flush must still hold one frame of
    # decode lead so y[next] exists at chunk boundaries
    halo_d = 1 if dev_deflicker else 0
    halo_win = halo_t + halo_d  # device window context
    # decode lead required before a chunk may emit (>= window, +1 when
    # the host deflicker needs y[next] at the chunk boundary)
    halo = halo_win + (1 if (EnableDeflicker and use_uv420) else 0)

    def temporal_chunk(x, f0):
        # weight is restore_color's inner merge weight (no outer blend —
        # api.HAVC_stabilizer semantics, vsfilters.py:84-116); f0 = global
        # index of x[0] keeps the n<15 warm-up aligned with the whole-clip
        # result across chunks
        return temporal_ops.chroma_stabilizer(
            x, nframes=stab_nframes, weighted=stab_weighted, sat=stab_sat,
            tht=stab_tht, weight=stab_back, tht_scen=stab_tht_scen,
            frame0=f0,
        )

    temporal_fn = cached_jit(
        ("stream_temporal", tuple(stab_p[:6]), chunk_size, halo_win),
        lambda: temporal_chunk,
    )

    if LUT is not None:
        from .ops import lut3d

        table = jnp.asarray(lut3d.make_look_lut(LUT))
        tweaks = lut3d.LUT_TWEAKS.get(LUT)
    else:
        table = tweaks = None

    def restore_chunk(hi_y, lo):
        """Full-res tail: luma-restore -> LUT -> deflicker (api order:
        stabilizer -> HAVC_TimeCube -> reduce_flicker).  ``hi_y`` is the
        buffered luma plane (the restore never reads original chroma)."""
        out = recover_clip_luma_y(
            hi_y, jnp.clip(resize(lo, h, w, "spline64"), 0.0, 1.0)
        )
        if table is not None:
            from .ops import lut3d

            out = lut3d.apply_lut3d(out, table)
            if tweaks is not None:
                from .ops.chroma import tweak as chroma_tweak_fn

                hue, sat, bright, cont, gamma = tweaks
                out = chroma_tweak_fn(out, hue=hue, sat=sat,
                                      bright=bright / 255.0, cont=cont,
                                      gamma=gamma)
        if dev_deflicker:
            out = temporal_ops.reduce_flicker(out)
        return out

    restore_fn = cached_jit(
        ("stream_restore", h, w, frame_size, LUT, dev_deflicker),
        lambda: restore_chunk,
    )

    if sink not in ("video", "null", "device"):
        raise ValueError(f"HAVC_main_streaming: unknown sink {sink!r}")
    writer = None
    if sink == "video":
        writer = cv2.VideoWriter(
            path_out, cv2.VideoWriter_fourcc(*codec), fps, (w, h))
        if not writer.isOpened():
            raise IOError(f"cannot open video writer: {path_out}")
    # rolling buffers: original LUMA planes (full res, post-BWTune) +
    # colorized work-res frames; frame 0 of the buffer is global frame
    # index `global_start`.  Buffers hold DEVICE arrays at BATCH
    # granularity (_FrameBuf): interior frames never visit the host —
    # only the final packed frames come back over the link.
    orig_buf = _FrameBuf()
    work_buf = _FrameBuf()
    global_start = 0
    next_emit = 0

    from .utils import rgb_unit_to_i420_u8 as to_i420, unit_to_u8 as to_u8

    # host Y planes for the uv420 tail (uint8, decoded gray — the stage
    # luma is exactly these values /255 in gray-upload mode)
    y_host: list = []
    y_base = 0

    def _host_y_window(start, ready):
        """Host-side luma tail: deflicker (reduce_flicker numerics, luma
        only) then the OpenCV studio-swing Y mapping the device I420 pack
        uses.  y[start-1 .. start+ready] come from the host decode; at
        clip edges indices clip like the whole-clip op."""
        n_dec = y_base + len(y_host)

        def get(i):
            return y_host[max(0, min(i, n_dec - 1)) - y_base]

        ys = np.stack([get(j) for j in range(start - 1, start + ready + 1)])
        y01 = ys.astype(np.float32) / 255.0
        cur = y01[1:ready + 1]
        if EnableDeflicker:
            target = 0.5 * (y01[0:ready] + y01[2:ready + 2])
            limit = 5.0 / 255.0
            corr = np.clip(0.5 * (target - cur), -limit, limit)
            cur = np.clip(cur + corr, 0.0, 1.0)
        return _studio_y(np.rint(cur * 255.0).astype(np.uint8))

    def _y_for_chunk(start, ready):
        # called at chunk-retire time; trims the rolling host-Y buffer,
        # keeping one past plane for the next chunk's deflicker
        nonlocal y_base
        ystudio = _host_y_window(start, ready)
        keep_from = start + ready - 1
        if keep_from > y_base:
            del y_host[: keep_from - y_base]
            y_base = keep_from
        return ystudio

    pipe = _WritePipeline(sink, writer, pipeline_depth, use_uv420,
                          use_i420, y_provider=_y_for_chunk)

    def emit(orig_ctx, work_ctx, ready):
        """orig/work with halo_d frames of context each side; the restore
        stage (luma recover -> LUT -> device deflicker) runs on the
        context and the interior `ready` frames are written."""
        out = restore_fn(orig_ctx, work_ctx)[halo_d: halo_d + ready]
        if use_uv420:
            # only the chroma planes of the packed I420 cross the link
            # (0.5 B/px); XLA dead-code-eliminates the Y computation from
            # the sliced concat, and the host supplies Y from its decode
            dev = to_i420(out)[:, h:, :]
        elif use_i420:
            dev = to_i420(out)
        else:
            dev = to_u8(out)
        pipe.push(dev, next_emit, ready)

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
            orig_ctx = orig_buf.window(lo - halo_d, hi + halo_d)
            if not enable_stabilizer:
                work_ctx = work_buf.window(lo - halo_d, hi + halo_d)
            else:
                # work window with BOTH halos; temporal over it, then keep
                # the deflicker-context interior (whose chroma windows are
                # complete)
                ext = work_buf.window(lo - halo_win, hi + halo_win)
                smoothed = temporal_fn(ext, jnp.int32(next_emit - halo_win))
                work_ctx = smoothed[halo_t: halo_t + ready + 2 * halo_d]
            emit(orig_ctx, work_ctx, ready)
            next_emit += ready
            # retain the window's past frames for the next chunk
            drop = max((next_emit - halo_win) - global_start, 0)
            if drop:
                orig_buf.drop(drop)
                work_buf.drop(drop)
                global_start += drop

    if source not in ("video", "device"):
        raise ValueError(f"HAVC_main_streaming: unknown source {source!r}")
    first_host = None
    if source == "device":
        # one decoded batch uploaded once; the loop below then re-feeds the
        # device-resident batch — identical compute/chunk/pack machinery
        # with no decode and no host->device traffic inside the run
        if count is None:
            raise ValueError(
                "HAVC_main_streaming: source='device' requires count")
        if int(count) < batch_size:
            raise ValueError(
                "HAVC_main_streaming: source='device' processes count "
                "rounded DOWN to a batch multiple — count must be >= "
                f"batch_size ({batch_size}), got {count}")
        first_host = next(stream_batches(
            path_in, batch_size, prefetch=1, count=batch_size,
            gray=use_gray), None)
        if first_host is None:
            raise IOError(
                f"HAVC_main_streaming: no frames decoded from {path_in}")
        if first_host.shape[0] < batch_size:
            first_host = np.concatenate(
                [first_host,
                 np.repeat(first_host[-1:],
                           batch_size - first_host.shape[0], axis=0)])
        dev0 = jnp.asarray(first_host)
        dev0.block_until_ready()
        batches = (dev0 for _ in range(int(count) // batch_size))
    else:
        batches = stream_batches(path_in, batch_size, prefetch=4,
                                 count=count, gray=use_gray)

    for batch in batches:
        n = int(batch.shape[0])
        if n < batch_size:
            padded = np.concatenate(
                [batch, np.repeat(batch[-1:], batch_size - n, axis=0)]
            )
        else:
            padded = batch
        tuned, colored = stage(params, jnp.asarray(padded))
        if use_uv420 and sink != "device":
            y_host.extend(
                (first_host if first_host is not None else batch)[:n])
        # batch-granular appends: one device program per batch (a tail
        # slice only when the decode came up short), not one per frame
        orig_buf.append(tuned if n == batch_size else tuned[:n])
        work_buf.append(colored if n == batch_size else colored[:n])
        flush(final=False)
    flush(final=True)
    pipe.finish()
    if writer is not None:
        writer.release()
    return pipe.written



def HAVC_restore_video_streaming(
    path_in: str,
    path_ref: str,
    path_out: str,
    render_speed: str = "medium",
    engine_config: Optional[str] = None,
    sc_threshold: float = 0.10,
    chunk_size: int = 32,
    count: Optional[int] = None,
    codec: str = "mp4v",
    work_size: Optional[tuple] = None,
    gray_input="auto",
    transfer_format: str = "auto",
    ex_model: int = 0,
    render_vivid: bool = False,
    frame_propagate: bool = True,
    max_memory_frames: int = 0,
    ref_freq: Optional[int] = None,
    pipeline_depth: int = 3,
    sink: str = "video",
    frame_mindim: int = 320,
) -> int:
    """Exemplar restore as a bounded-memory stream (the streaming form of
    HAVC_restore_video): a B&W video is re-colorized from a synchronized
    colored reference video through the chosen exemplar engine, with the
    engine's recurrence carried across chunks so chunked output matches
    the whole-clip path:

    - ``ex_model=0`` (ColorMNet): the scan carry (``resume_state``) flows
      across chunks — BIT-CONSISTENT with the whole-clip scan (the
      guarantee pinned by test_exemplar's chunked==whole test).  The
      reference's XML-RPC ColorMNet server holds its memory bank per
      process instead (SURVEY 3.3); here the bank is the scan carry.
    - ``ex_model=1`` (Deep-Exemplar): the driver pins the scene reference
      (deepex/__init__.py:176) so frames are independent given their
      scene's reference — the carry is the current scene's reference
      frame, re-marked as the first frame of the next chunk.
    - ``ex_model=2`` (DeepRemaster): the sliding past/future reference
      window (remaster_render.ref_buffer_adjust:203-231) is replayed
      exactly: a LOOKAHEAD cursor decodes the reference stream ahead of
      the input just far enough to know the next ``ref_buffer_size``
      scene-change references (bounded memory), and each chunk passes the
      trimmed reference slice + global positions to
      :func:`remaster_propagate` (``frame0``).  Periodic references every
      ``ref_freq=10`` frames per the reference driver (DEF_MIN_FREQ,
      constants.py:61).
    - ``ex_model=3`` (Deep-CMnet hybrid): ColorMNet blended with
      Deep-Exemplar (always vivid) at weight 0.3
      (max(refmerge_weight[0], 0.3), __init__.py:1706-1721).

    Scene flags come from the reference stream: a frame is a reference
    when its mean absolute luma difference against the previous reference
    frame exceeds ``sc_threshold`` (SCDetect semantics, resumable across
    chunk boundaries via the carried last frame), or — with ``ref_freq``
    > 1 — every ``ref_freq`` frames.  Memory is O(chunk +
    ref_buffer_size) frames regardless of video length.

    ``render_vivid``/``frame_propagate`` follow the engine semantics of
    the in-memory path (HAVC_restore_video uses frame_propagate=False,
    render_vivid=True; the streaming default keeps the historical
    frame_propagate=True carry).  ``max_memory_frames`` bounds ColorMNet
    long-term memory / sizes the DeepRemaster reference buffer.

    ``pipeline_depth``/``sink`` behave as in :func:`HAVC_main_streaming`:
    up to ``pipeline_depth`` packed output chunks stay in flight on the
    download/write path, and ``sink`` selects video encode (default),
    ``"null"`` (download, no encode) or ``"device"`` (no download —
    1-pixel sync only; the pipeline-only measurement hook).
    """
    import cv2

    from .exemplar import (
        DEF_VIVID_HUE_HIGH,
        DEF_VIVID_HUE_LOW,
        DEF_VIVID_SAT_HIGH,
        DEF_VIVID_SAT_LOW,
        _get_engine,
        colormnet_propagate,
        deepex_propagate,
        pad112_geometry,
        remaster_propagate,
        remaster_work_shape,
        resolve_engine_config,
        smart_resize_shape,
    )
    from .ops.chroma import chroma_tweak
    from .ops.colorspace import lab_to_rgb, rgb_to_lab, luma as luma_of
    from .ops.resize import smart_resize_pad, smart_resize_restore

    if ex_model not in (0, 1, 2, 3):
        raise ValueError(
            f"HAVC_restore_video_streaming: unsupported ex_model {ex_model}")
    engine_config = resolve_engine_config(engine_config)
    if ref_freq is None:
        # DeepRemaster needs periodic refs (DEF_MIN_FREQ, constants.py:61)
        ref_freq = 10 if ex_model == 2 else 0
    length = 2  # DeepRemaster frames per forward (remaster_render)
    if ex_model == 2 and chunk_size % length:
        chunk_size += 1  # keep chunk boundaries window-aligned

    cap_in = cv2.VideoCapture(path_in)
    cap_ref = cv2.VideoCapture(path_ref)
    if not (cap_in.isOpened() and cap_ref.isOpened()):
        raise IOError("cannot open input/reference video")
    fps = cap_in.get(cv2.CAP_PROP_FPS) or 25.0
    w = int(cap_in.get(cv2.CAP_PROP_FRAME_WIDTH))
    h = int(cap_in.get(cv2.CAP_PROP_FRAME_HEIGHT))
    # the reference stream may have its own geometry (e.g. the bundled
    # sample_colored_sync.mp4 is 300x220 against the 920x672 B&W input);
    # scene detection runs at REF resolution, both streams meet at the
    # engine work size via smart_resize_pad
    rw = int(cap_ref.get(cv2.CAP_PROP_FRAME_WIDTH)) or w
    rh = int(cap_ref.get(cv2.CAP_PROP_FRAME_HEIGHT)) or h
    # transfer knobs (see HAVC_main_streaming): luma-only upload for the
    # B&W stream when its decode is exactly gray; I420 packed download
    use_gray = bool(gray_input) and gray_input is not None
    if gray_input == "auto":
        ok, probe = cap_in.read()
        use_gray = bool(ok) and _is_gray(probe)
        cap_in.set(cv2.CAP_PROP_POS_FRAMES, 0)
    even = h % 2 == 0 and w % 2 == 0
    # the output luma here IS the decoded B&W luma (recover_clip_luma),
    # so with the gray upload the host can reassemble frames from the
    # downloaded chroma planes alone (0.5 B/px); nothing retunes luma
    use_uv420, use_i420 = _resolve_transfer(transfer_format, even, use_gray)

    if work_size is None:
        if ex_model == 2:
            # DeepRemaster's own geometry (resize_for_inference: min dim
            # -> frame_mindim, each side /16) — NetworkC's skip concat
            # breaks at the deepex smart sizes (216x384 is not /16)
            wh, ww = remaster_work_shape(w, h, frame_mindim)
        else:
            wh, ww = smart_resize_shape(w, h, render_speed)
    else:
        wh, ww = work_size

    pad_fn = cached_jit(
        ("smart_resize_pad", wh, ww, h, w),
        lambda: lambda x: smart_resize_pad(x, wh, ww, "spline64")[0],
    )
    from .ops.resize import smart_resize_pad as _srp

    _, pad_meta = _srp(jnp.zeros((1, h, w, 3), jnp.float32), wh, ww)
    restore_fn = cached_jit(
        ("restore_full", h, w, tuple(pad_meta)),
        lambda: lambda hi, lo: recover_clip_luma(
            hi, smart_resize_restore(lo, pad_meta, "spline64")
        ),
    )

    # --- engines + per-engine chunk runners ------------------------------
    cm_engine = dx_engine = rm_engine = None
    if ex_model in (0, 3):
        # the engine runs at the reference's pad_divide_by(112) geometry
        # (the 1/14 and 1/16 grids align); colormnet_propagate pads in
        # normalized-LAB space and unpads the prediction back
        ph, pw = pad112_geometry(wh, ww)[:2]
        kw = dict(config=engine_config, work_size=(ph, pw))
        if max_memory_frames > 0:
            kw["max_mem"] = int(max_memory_frames)
        cm_engine = _get_engine("colormnet", **kw)
        ref_ab_fn = cached_jit(
            ("cm_ref_ab", wh, ww),
            lambda: lambda x: jnp.clip(
                rgb_to_lab(x)[..., 1:3] / 110.0, -1.0, 1.0),
        )
        join_fn = cached_jit(
            ("cm_join", wh, ww),
            lambda: lambda fr, ab: jnp.clip(
                lab_to_rgb(jnp.concatenate(
                    [rgb_to_lab(fr)[..., 0:1], ab * 110.0], axis=-1
                )), 0.0, 1.0,
            ),
        )
    if ex_model in (1, 3):
        dx_engine = _get_engine("deepex", speed=render_speed)
        dx_to = cached_jit(
            ("dx_resize", wh, ww, dx_engine.h, dx_engine.w),
            lambda: lambda x: jnp.clip(
                resize(x, dx_engine.h, dx_engine.w, "spline64"), 0.0, 1.0),
        )
        dx_back = cached_jit(
            ("dx_back", dx_engine.h, dx_engine.w, wh, ww),
            lambda: lambda x: jnp.clip(
                resize(x, wh, ww, "spline64"), 0.0, 1.0),
        )
    if ex_model == 2:
        rm_engine = _get_engine("remaster")
        buf = int(max_memory_frames) if max_memory_frames > 0 else 20
        vivid_pre = cached_jit(
            ("vivid_pre",),
            lambda: lambda x: chroma_tweak(
                x, sat=DEF_VIVID_SAT_HIGH, hue=int(DEF_VIVID_HUE_LOW)),
        )
        vivid_post = cached_jit(
            ("vivid_post",),
            lambda: lambda x: chroma_tweak(
                x, sat=DEF_VIVID_SAT_LOW, hue=int(DEF_VIVID_HUE_HIGH)),
        )

    if sink not in ("video", "null", "device"):
        raise ValueError(
            f"HAVC_restore_video_streaming: unknown sink {sink!r}")
    writer = None
    if sink == "video":
        writer = cv2.VideoWriter(
            path_out, cv2.VideoWriter_fourcc(*codec), fps, (w, h))
        if not writer.isOpened():
            raise IOError(f"cannot open video writer: {path_out}")

    def read_chunk(cap, n, gray=False):
        # uint8 at the transfer boundary: 1 byte/channel crosses the link,
        # /255 runs on device (from_u8); gray streams send 1 byte/PIXEL
        conv = cv2.COLOR_BGR2GRAY if gray else cv2.COLOR_BGR2RGB
        out = []
        for _ in range(n):
            ok, bgr = cap.read()
            if not ok:
                break
            out.append(cv2.cvtColor(bgr, conv))
        return np.stack(out) if out else None

    import jax

    from .utils import (
        gray_to_rgb,
        rgb_unit_to_i420_u8 as to_i420,
        u8_to_unit as from_u8,
        unit_to_u8 as to_u8,
    )

    def _sc_scan(refs, last, has_last, n0):
        """Resumable SCDetect on device: mean |luma - last ref luma| >
        threshold (plus the every-``ref_freq``-frames forcing when > 1),
        sequential carry = the last REFERENCE frame's luma.  Only the
        (t,) bool flags come back to the host."""
        lumas = luma_of(refs)
        idx = jnp.arange(lumas.shape[0]) + n0

        def step(carry, xs):
            lu, n = xs
            prev, has = carry
            diff = jnp.abs(lu - prev).mean()
            flag = jnp.logical_or(~has, diff > sc_threshold)
            if ref_freq > 1:
                flag = jnp.logical_or(flag, n % ref_freq == 0)
            prev = jnp.where(flag, lu, prev)
            return (prev, jnp.logical_or(has, flag)), flag

        (last, has_last), flags = jax.lax.scan(
            step, (last, has_last), (lumas, idx))
        return flags, last, has_last

    sc_fn = cached_jit(
        ("stream_sc_scan", wh, ww, sc_threshold, rh, rw, ref_freq),
        lambda: _sc_scan,
    )

    # --- engine carries ---------------------------------------------------
    state = None  # ColorMNet scan carry
    carry_ref = None  # DeepEx current-scene reference (device, (1,h,w,3))
    # carry of the resumable detector: the previous REFERENCE frame's luma
    # (at the reference stream's own geometry)
    last_ref_luma = jnp.zeros((rh, rw), jnp.float32)
    has_last = jnp.zeros((), bool)

    def run_colormnet(work, work_refs, is_ref):
        nonlocal state
        ab, state = colormnet_propagate(
            cm_engine, work, ref_ab_fn(work_refs), is_ref,
            frame_propagate=frame_propagate, vivid=render_vivid,
            resume_state=state, return_state=True, device_out=True,
        )
        return join_fn(work, ab)

    def run_deepex(work, work_refs, is_ref, vivid):
        nonlocal carry_ref
        dxf, dxr = dx_to(work), dx_to(work_refs)
        flags = np.asarray(is_ref, bool).copy()
        if not flags[0]:
            # mid-scene chunk start: condition frame 0 on the carried
            # scene reference — per-frame outputs are independent given
            # the scene ref, so this replays the whole-clip grouping
            flags[0] = True
            dxr = jnp.concatenate([carry_ref, dxr[1:]], axis=0)
        out = deepex_propagate(
            dx_engine, dxf, dxr, flags,
            frame_propagate=frame_propagate, vivid=vivid, device_out=True,
        )
        li = int(np.nonzero(flags)[0][-1])
        carry_ref = dxr[li:li + 1]
        return dx_back(out)

    # --- DeepRemaster lookahead reference scanner -------------------------
    # decodes the REFERENCE stream ahead of the input cursor just far
    # enough to know the next window of scene-change references; holds
    # O(ref_buffer_size) work-res reference frames
    ref_imgs: list = []  # device (wh, ww, 3) per found reference
    ref_pos: list = []  # global frame index per found reference
    ref_base = 0  # global ref index of ref_imgs[0]
    ref_eof = False
    ref_n = 0  # next reference-stream frame index to decode
    ws = 0  # global sliding-window start (persistent across chunks)

    def scan_more_refs(batch: int = 32):
        nonlocal ref_eof, ref_n, last_ref_luma, has_last
        fr = read_chunk(cap_ref, batch)
        if fr is None:
            ref_eof = True
            return
        rgb = from_u8(jnp.asarray(fr))
        flags, last_ref_luma, has_last = sc_fn(
            rgb, last_ref_luma, has_last, jnp.int32(ref_n))
        f = np.asarray(flags)
        if f.any():
            if render_vivid:
                # DeepRemaster pre-tweak on the references at FULL res
                # (remaster/__init__.py:92-93), before the work resize
                rgb = vivid_pre(rgb)
            w_refs = pad_fn(rgb)
            for i in np.nonzero(f)[0]:
                ref_imgs.append(w_refs[int(i)])
                ref_pos.append(ref_n + int(i))
        ref_n += len(fr)
        if len(fr) < batch:
            ref_eof = True

    def found_refs() -> int:
        return ref_base + len(ref_pos)

    def ensure_refs(k: int):
        while found_refs() < k and not ref_eof:
            scan_more_refs()

    S = half_idx = 0
    if ex_model == 2:
        ensure_refs(buf)
        S = min(buf, found_refs()) if ref_eof else buf
        half_idx = max(round(S * (1.0 - 0.5)) - 1, 0)

    def run_remaster(work, f0, t):
        nonlocal ws, ref_base
        ws0 = ws
        # replay ref_buffer_adjust's advance for every window start in
        # the chunk, decoding the reference stream ahead on demand — the
        # exact whole-clip schedule with bounded lookahead
        for st in range(f0, f0 + t, length):
            while True:
                ensure_refs(ws + S + 1)
                if ref_eof and ws + S >= found_refs():
                    break
                if not (st > ref_pos[ws + half_idx - ref_base]):
                    break
                ws += 1
        hi = min(ws + S, found_refs())
        refs_sl = jnp.stack(ref_imgs[ws0 - ref_base: hi - ref_base])
        pos_sl = np.asarray(ref_pos[ws0 - ref_base: hi - ref_base])
        colored = remaster_propagate(
            rm_engine, work, refs_sl, length=length,
            ref_positions=pos_sl, ref_buffer_size=buf, frame0=f0,
            device_out=True,
        )
        if render_vivid:
            colored = vivid_post(colored)
        # refs below the advanced window start are never read again
        if ws > ref_base:
            del ref_imgs[: ws - ref_base], ref_pos[: ws - ref_base]
            ref_base = ws
        return colored

    # pipelined write path shared with HAVC_main_streaming; in uv420
    # mode the host Y is the studio-swing map of its own decoded gray
    # bytes (the output luma IS the input luma here), queued per chunk
    pipe = _WritePipeline(sink, writer, pipeline_depth, use_uv420,
                          use_i420,
                          y_provider=lambda y_u8, t: _studio_y(y_u8))

    emitted = 0  # frames handed to the write pipeline
    frame0 = 0  # global index of the next input frame
    while count is None or emitted < count:
        n = chunk_size if count is None else min(chunk_size, count - emitted)
        bw_u8 = read_chunk(cap_in, n, gray=use_gray)
        if bw_u8 is None:
            break
        t = len(bw_u8)
        if ex_model == 2:
            # mirror the in-memory trim-to-min-length: never emit input
            # frames past the reference stream's end
            while not ref_eof and ref_n < frame0 + t:
                scan_more_refs()
            t = min(t, max(ref_n - frame0, 0))
            if t <= 0:
                break
            refs_u8 = None
        else:
            refs_u8 = read_chunk(cap_ref, n)
            if refs_u8 is None:
                break
            t = min(t, len(refs_u8))
        bw_u8 = bw_u8[:t]
        bw = from_u8(jnp.asarray(bw_u8))
        if use_gray:
            bw = gray_to_rgb(bw)
        work = pad_fn(bw)

        if ex_model == 2:
            colored_small = run_remaster(work, frame0, t)
        else:
            refs = from_u8(jnp.asarray(refs_u8[:t]))
            # resumable scene detection on the reference stream
            flags, last_ref_luma, has_last = sc_fn(
                refs, last_ref_luma, has_last, jnp.int32(frame0))
            is_ref = np.asarray(flags)
            work_refs = pad_fn(refs)
            if ex_model == 0:
                colored_small = run_colormnet(work, work_refs, is_ref)
            elif ex_model == 1:
                colored_small = run_deepex(work, work_refs, is_ref,
                                           render_vivid)
            else:  # 3: Deep-CMnet hybrid (__init__.py:1706-1721)
                a = run_colormnet(work, work_refs, is_ref)
                b = run_deepex(work, work_refs, is_ref, True)
                colored_small = a * 0.7 + b * 0.3

        full = restore_fn(bw, colored_small)
        if use_uv420:
            dev = to_i420(full)[:, h:, :]
        elif use_i420:
            dev = to_i420(full)
        else:
            dev = to_u8(full)
        pipe.push(dev, bw_u8 if use_uv420 else None, t)
        emitted += t
        frame0 += t
        if t < n:
            break
    pipe.finish()
    cap_in.release()
    cap_ref.release()
    if writer is not None:
        writer.release()
    return pipe.written
