"""HAVC_main_streaming: chunked==whole equivalence and bounded memory."""
import os
import sys

sys.path.insert(0, os.path.dirname(__file__))

import numpy as np
import pytest

import jax.numpy as jnp

import cv2

from havc_tpu import streaming
from havc_tpu.ops import temporal as temporal_ops
from havc_tpu.ops.resize import resize
from havc_tpu.filters import recover_clip_luma


def _write_test_video(path, t=40, h=72, w=96, seed=0):
    rng = np.random.default_rng(seed)
    wr = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*"mp4v"), 25, (w, h))
    base = rng.random((h, w, 3)).astype(np.float32)
    frames = []
    for i in range(t):
        f = np.clip(base * (0.5 + 0.4 * np.sin(i / 5.0)) + 0.1 * rng.random((h, w, 3)), 0, 1)
        g = f.mean(axis=-1, keepdims=True).repeat(3, axis=-1)  # grayscale-ish
        frames.append(g.astype(np.float32))
        wr.write(cv2.cvtColor((g * 255).astype(np.uint8), cv2.COLOR_RGB2BGR))
    wr.release()
    return frames


def _read_video(path):
    cap = cv2.VideoCapture(str(path))
    out = []
    while True:
        ok, bgr = cap.read()
        if not ok:
            break
        out.append(cv2.cvtColor(bgr, cv2.COLOR_BGR2RGB).astype(np.float32) / 255.0)
    cap.release()
    return np.stack(out)


@pytest.mark.parametrize("chunk_size", [8, 16])
def test_streaming_equals_whole_clip(tmp_path, chunk_size):
    """The overlap-chunked temporal stage must reproduce the whole-clip
    ops exactly (same per-frame stage, same temporal window math)."""
    src = tmp_path / "in.mp4"
    _write_test_video(src, t=40)

    out_path = tmp_path / "out.mp4"
    n = streaming.HAVC_main_streaming(
        str(src), str(out_path), Preset="fast",
        ColorModel="zhang(eccv16)", batch_size=8, chunk_size=chunk_size,
    )
    assert n == 40
    got = _read_video(out_path)
    assert got.shape[0] == 40

    # whole-clip reference: identical stage composition without chunking
    from havc_tpu import presets as pr

    frames = _read_video(src)
    _, do_rf, dd_rf = pr.get_render_factors("fast")
    do_model, dd_model, dd_method = pr.get_color_model("zhang(eccv16)")
    method = 1 if dd_method == 1 else 2
    dd_tweak, hue_range, hue_range2, _, chroma_adjust2 = pr.get_color_tune(
        "light", "violet/red", "none", dd_model)
    frame_size = min(max(do_rf, dd_rf) * 16, frames.shape[2])
    stage, params = streaming._build_frame_stage(
        method, pr.get_mweight("balanced"), do_model, dd_model, do_rf, dd_rf,
        dd_tweak, hue_range, hue_range2, chroma_adjust2, frame_size,
    )
    work = []
    for s in range(0, 40, 8):
        work.append(
            np.asarray(stage(params, jnp.asarray(frames[s:s + 8]))[1])
        )
    work = np.concatenate(work)  # stage()[0] is now the luma plane only
    sm = np.asarray(temporal_ops.chroma_stabilizer(
        jnp.asarray(work), nframes=5, weighted=False, sat=1.0, tht=15))
    sm = work * 0.2 + sm * 0.8
    full = np.asarray(recover_clip_luma(
        jnp.asarray(frames),
        jnp.clip(resize(jnp.asarray(sm), frames.shape[1], frames.shape[2],
                        "spline64"), 0, 1),
    ))
    # deflicker runs at FULL resolution after the restore (api order)
    full = np.asarray(temporal_ops.reduce_flicker(jnp.asarray(full)))
    # compare pre-encode output against the decoded stream (mp4 is lossy:
    # allow codec-scale tolerance, but the mean must be tight)
    err = np.abs(full - got).mean()
    assert err < 0.02, f"streaming vs whole-clip mean err {err:.4f}"


def test_streaming_bounded_buffers(tmp_path, monkeypatch):
    """Internal buffers must stay O(chunk + halo) regardless of length:
    the rolling device buffers (_FrameBuf) are bounded by chunk + window
    halo + one decode batch, independent of the 64-frame clip length."""
    src = tmp_path / "in.mp4"
    _write_test_video(src, t=64, h=48, w=64)
    peak = {"n": 0}

    orig_append = streaming._FrameBuf.append

    def spy_append(self, batch):
        orig_append(self, batch)
        peak["n"] = max(peak["n"], len(self))

    monkeypatch.setattr(streaming._FrameBuf, "append", spy_append)
    out_path = tmp_path / "out.mp4"
    n = streaming.HAVC_main_streaming(
        str(src), str(out_path), Preset="fast", ColorModel="zhang(eccv16)",
        batch_size=4, chunk_size=8,
    )
    assert n == 64
    # halo = 3 (nframes 5 -> nh 2, +1 deflicker): retained window 2*3,
    # plus the un-emitted chunk (8) and the batch just appended (4)
    assert 0 < peak["n"] <= 8 + 2 * 3 + 4


def test_streaming_with_bwtune_lut_equals_whole(tmp_path):
    """Preset-knob unification: BWTune pre-tune + LUT + deflicker flow
    through the streaming stage exactly like the in-memory composition."""
    from havc_tpu import presets as pr
    from havc_tpu.api import bw_tune_frames
    from havc_tpu.ops import lut3d

    src = tmp_path / "in.mp4"
    _write_test_video(src, t=24, h=64, w=80, seed=3)

    out_path = tmp_path / "out.mp4"
    n = streaming.HAVC_main_streaming(
        str(src), str(out_path), Preset="fast", ColorModel="zhang(eccv16)",
        BWTune="light", LUT=0, EnableDeflicker=True,
        batch_size=8, chunk_size=8,
    )
    assert n == 24
    got = _read_video(out_path)

    frames = _read_video(src)
    _, do_rf, dd_rf = pr.get_render_factors("fast")
    do_model, dd_model, dd_method = pr.get_color_model("zhang(eccv16)")
    method = 1 if dd_method == 1 else 2
    dd_tweak, hue_range, hue_range2, _, chroma_adjust2 = pr.get_color_tune(
        "light", "violet/red", "none", dd_model)
    frame_size = min(max(do_rf, dd_rf) * 16, frames.shape[2])
    stage, params = streaming._build_frame_stage(
        method, pr.get_mweight("balanced"), do_model, dd_model, do_rf, dd_rf,
        dd_tweak, hue_range, hue_range2, chroma_adjust2, frame_size,
        bw_tune_id=pr.get_tune_id("light"), bw_method=0,
    )
    tuned_l, work_l = [], []
    for s in range(0, 24, 8):
        t_, w_ = stage(params, jnp.asarray(frames[s:s + 8]))
        tuned_l.append(np.asarray(t_))
        work_l.append(np.asarray(w_))
    tuned = np.concatenate(tuned_l)  # luma planes (stage returns Y only)
    work = np.concatenate(work_l)
    sm = np.asarray(temporal_ops.chroma_stabilizer(
        jnp.asarray(work), nframes=5, weighted=False, sat=1.0, tht=15))
    sm = work * 0.2 + sm * 0.8
    from havc_tpu.filters import recover_clip_luma_y

    full = np.asarray(recover_clip_luma_y(
        jnp.asarray(tuned),
        jnp.clip(resize(jnp.asarray(sm), frames.shape[1], frames.shape[2],
                        "spline64"), 0, 1),
    ))
    full = np.asarray(lut3d.apply_lut3d(jnp.asarray(full),
                                        jnp.asarray(lut3d.make_look_lut(0))))
    tw = lut3d.LUT_TWEAKS.get(0)
    if tw is not None:
        from havc_tpu.ops.chroma import tweak as chroma_tweak_fn

        full = np.asarray(chroma_tweak_fn(
            jnp.asarray(full), hue=tw[0], sat=tw[1], bright=tw[2] / 255.0,
            cont=tw[3], gamma=tw[4]))
    full = np.asarray(temporal_ops.reduce_flicker(jnp.asarray(full)))
    err = np.abs(np.clip(full, 0, 1) - got).mean()
    assert err < 0.02, f"streaming vs whole-clip mean err {err:.4f}"


@pytest.mark.slow
def test_restore_video_streaming_exemplar(tmp_path):
    """Exemplar streaming: the scan carry flows across chunks, so two
    chunk sizes must produce identical outputs (bit-consistency of
    resume_state), and the result must re-marry the B&W luma."""
    src = tmp_path / "in.mp4"
    ref = tmp_path / "ref.mp4"
    frames = _write_test_video(src, t=12, h=64, w=64, seed=5)
    # colored reference: tint the gray frames
    wr = cv2.VideoWriter(str(ref), cv2.VideoWriter_fourcc(*"mp4v"), 25,
                         (64, 64))
    for f in frames:
        tinted = np.clip(f * np.array([1.2, 0.9, 0.8]), 0, 1)
        wr.write(cv2.cvtColor((tinted * 255).astype(np.uint8),
                              cv2.COLOR_RGB2BGR))
    wr.release()

    outs = {}
    for chunk in (4, 12):
        out_path = tmp_path / f"out_{chunk}.mp4"
        n = streaming.HAVC_restore_video_streaming(
            str(src), str(ref), str(out_path), chunk_size=chunk,
            work_size=(32, 32),
        )
        assert n == 12
        outs[chunk] = _read_video(out_path)
    # chunked == whole through the carried scan state (codec-lossy bound)
    err = np.abs(outs[4] - outs[12]).mean()
    assert err < 5e-3, f"chunked exemplar streams diverge: {err:.4f}"


def test_streaming_gray_auto_and_i420(tmp_path, monkeypatch):
    """Transfer knobs: (a) the auto probe must select the luma upload for
    an exactly-gray source; (b) default (gray+uv420: chroma-only download,
    host-side luma deflicker + reassembly) must match the full-RGB
    transfer output to well under codec scale, and so must the
    intermediate i420 mode."""
    from havc_tpu.io import stream as io_stream

    src = tmp_path / "in.mp4"
    # smooth exactly-gray content: per-pixel noise would make the i420
    # top-left chroma siting measurably differ from the encoder's own
    # averaging subsample; realistic footage is smooth at chroma scale
    wr = cv2.VideoWriter(str(src), cv2.VideoWriter_fourcc(*"mp4v"), 25,
                         (80, 64))
    yy, xx = np.mgrid[0:64, 0:80].astype(np.float32)
    for i in range(16):
        g = 0.25 + 0.5 * (xx / 80) * (0.5 + 0.5 * np.sin(i / 4 + yy / 21))
        u8 = (np.clip(g, 0, 1) * 255).round().astype(np.uint8)
        wr.write(cv2.merge([u8, u8, u8]))
    wr.release()

    seen = {}
    orig = io_stream.stream_batches

    def spy(path, batch_size=8, prefetch=4, count=None, gray=False):
        seen["gray"] = gray
        return orig(path, batch_size, prefetch, count, gray)

    monkeypatch.setattr(streaming, "stream_batches", spy, raising=False)
    monkeypatch.setattr(io_stream, "stream_batches", spy)

    out_def = tmp_path / "out_def.mp4"
    n = streaming.HAVC_main_streaming(
        str(src), str(out_def), Preset="fast", ColorModel="zhang(eccv16)",
        batch_size=8, chunk_size=8,
    )
    assert n == 16
    assert seen["gray"] is True  # auto probe picked the luma upload

    out_rgb = tmp_path / "out_rgb.mp4"
    streaming.HAVC_main_streaming(
        str(src), str(out_rgb), Preset="fast", ColorModel="zhang(eccv16)",
        batch_size=8, chunk_size=8, gray_input=False, transfer_format="rgb",
    )
    out_i420 = tmp_path / "out_i420.mp4"
    streaming.HAVC_main_streaming(
        str(src), str(out_i420), Preset="fast", ColorModel="zhang(eccv16)",
        batch_size=8, chunk_size=8, transfer_format="i420",
    )
    a, b, c = _read_video(out_def), _read_video(out_rgb), _read_video(out_i420)
    err = np.abs(a - b).mean()
    assert err < 8e-3, f"gray+uv420 vs rgb transfer diverged: {err:.4f}"
    # uv420 vs i420: same chroma bytes, Y path differs only by the
    # quantize-before-vs-after studio mapping (and gamut-clip pixels)
    err2 = np.abs(a - c).mean()
    assert err2 < 5e-3, f"uv420 vs i420 diverged: {err2:.4f}"


def test_streaming_pipeline_depth_and_sinks(tmp_path):
    """(a) Deeper download pipelining must not change output bytes —
    depth 1 (pre-r5 one-chunk-behind) and depth 3 write identical
    streams; (b) the measurement sinks (null = no encode, device = no
    download) process every frame and write nothing."""
    src = tmp_path / "in.mp4"
    _write_test_video(src, t=24, h=64, w=80, seed=9)

    outs = {}
    for depth in (1, 3):
        out_path = tmp_path / f"out_d{depth}.mp4"
        n = streaming.HAVC_main_streaming(
            str(src), str(out_path), Preset="fast",
            ColorModel="zhang(eccv16)", batch_size=8, chunk_size=8,
            pipeline_depth=depth,
        )
        assert n == 24
        outs[depth] = _read_video(out_path)
    assert np.array_equal(outs[1], outs[3]), "pipeline depth changed output"

    for sink in ("null", "device"):
        out_path = tmp_path / f"out_{sink}.mp4"
        n = streaming.HAVC_main_streaming(
            str(src), str(out_path), Preset="fast",
            ColorModel="zhang(eccv16)", batch_size=8, chunk_size=8,
            sink=sink,
        )
        assert n == 24
        assert not out_path.exists(), f"sink={sink} wrote a file"

    with pytest.raises(ValueError):
        streaming.HAVC_main_streaming(
            str(src), str(tmp_path / "x.mp4"), sink="bogus")


def test_streaming_device_source(tmp_path):
    """source='device' (bench compute-only mode): decodes one batch,
    uploads it once, and re-feeds the device-resident batch through the
    identical compute/chunk/pack machinery.  Count semantics: processes
    count rounded down to a batch multiple; requires count; the video
    sink still writes a real file of that length."""
    src = tmp_path / "in.mp4"
    _write_test_video(src, t=8, h=64, w=80, seed=3)

    n = streaming.HAVC_main_streaming(
        str(src), str(tmp_path / "o1.mp4"), Preset="fast",
        ColorModel="zhang(eccv16)", batch_size=8, chunk_size=8,
        sink="device", source="device", count=24,
    )
    assert n == 24

    out_path = tmp_path / "o2.mp4"
    n = streaming.HAVC_main_streaming(
        str(src), str(out_path), Preset="fast",
        ColorModel="zhang(eccv16)", batch_size=8, chunk_size=8,
        source="device", count=16,
    )
    assert n == 16
    assert _read_video(out_path).shape[0] == 16

    with pytest.raises(ValueError):
        streaming.HAVC_main_streaming(
            str(src), str(tmp_path / "x.mp4"), source="device")
    with pytest.raises(ValueError):  # count < batch would round to zero
        streaming.HAVC_main_streaming(
            str(src), str(tmp_path / "x.mp4"), source="device", count=4)
    with pytest.raises(ValueError):
        streaming.HAVC_main_streaming(
            str(src), str(tmp_path / "x.mp4"), source="bogus")


def test_restore_streaming_ref_geometry_and_sinks(tmp_path):
    """The reference stream may have its own geometry (the bundled
    sample_colored_sync.mp4 is 300x220 against the 920x672 B&W input):
    scene detection runs at ref resolution and both streams meet at the
    work size.  Also covers the restore path's null/device sinks."""
    src = tmp_path / "in.mp4"
    ref = tmp_path / "ref.mp4"
    frames = _write_test_video(src, t=10, h=64, w=96, seed=11)
    wr = cv2.VideoWriter(str(ref), cv2.VideoWriter_fourcc(*"mp4v"), 25,
                         (48, 32))
    for i, f in enumerate(frames):
        tinted = np.clip(f * np.array([1.2, 0.9, 0.8]) * (0.6 + 0.05 * i),
                         0, 1)
        small = cv2.resize(tinted, (48, 32), interpolation=cv2.INTER_AREA)
        wr.write(cv2.cvtColor((small * 255).astype(np.uint8),
                              cv2.COLOR_RGB2BGR))
    wr.release()

    out_path = tmp_path / "out.mp4"
    n = streaming.HAVC_restore_video_streaming(
        str(src), str(ref), str(out_path), chunk_size=5,
        work_size=(32, 32), ex_model=1, render_speed="fast",
    )
    assert n == 10
    got = _read_video(out_path)
    assert got.shape == (10, 64, 96, 3)

    for sink in ("null", "device"):
        out_s = tmp_path / f"out_{sink}.mp4"
        n = streaming.HAVC_restore_video_streaming(
            str(src), str(ref), str(out_s), chunk_size=5,
            work_size=(32, 32), ex_model=1, render_speed="fast",
            sink=sink,
        )
        assert n == 10
        assert not out_s.exists()


def test_write_pipeline_depth_semantics():
    """pipeline_depth counts chunks left in flight AFTER the current one
    is queued: depth=1 is one-chunk-behind (the just-pushed chunk stays
    pending, the previous retires), depth=3 holds three.  Regression for
    the r5 off-by-one where depth=1 drained the just-pushed chunk
    synchronously (zero overlap)."""
    retired = []

    class _Spy(streaming._WritePipeline):
        def _retire(self, dev, meta, n):
            retired.append(meta)
            super()._retire(dev, meta, n)

    chunk = jnp.zeros((2, 4, 4), jnp.uint8)

    p1 = _Spy("device", None, 1, False, False)
    p1.push(chunk, "a", 2)
    assert retired == []          # one chunk stays in flight
    p1.push(chunk, "b", 2)
    assert retired == ["a"]       # previous retires, current pends
    p1.finish()
    assert retired == ["a", "b"]
    assert p1.written == 4

    retired.clear()
    p3 = _Spy("device", None, 3, False, False)
    for m in "abcd":
        p3.push(chunk, m, 2)
    assert retired == ["a"]       # three stay outstanding
    p3.finish()
    assert retired == ["a", "b", "c", "d"]
    assert p3.written == 8


def test_transfer_mode_resolution():
    """The pure transfer gate: uv420 only when the host owns the output
    luma (even dims + gray upload + no device luma retune); explicit
    requests that fail the gate fall back like auto; odd dims -> rgb."""
    cases = [
        # (tf, even, gray, retuned) -> (uv420, i420, last)
        (("auto", True, True, False), (True, False, "gray+uv420")),
        (("auto", True, True, True), (False, True, "gray+i420")),   # BWTune/LUT
        (("auto", True, False, False), (False, True, "rgb+i420")),
        (("auto", False, True, False), (False, False, "gray+rgb")),
        (("uv420", True, True, False), (True, False, "gray+uv420")),
        (("uv420", True, False, False), (False, True, "rgb+i420")),  # fallback
        (("uv420", False, True, False), (False, False, "gray+rgb")),
        (("i420", True, True, False), (False, True, "gray+i420")),
        (("i420", False, False, False), (False, False, "rgb+rgb")),
        (("rgb", True, True, False), (False, False, "gray+rgb")),
    ]
    for (tf, even, gray, retuned), (uv, i420, last) in cases:
        got = streaming._resolve_transfer(tf, even, gray, retuned)
        assert got == (uv, i420), (tf, even, gray, retuned, got)
        assert streaming.last_transfer() == last, (tf, even, gray, retuned)


def _write_scene_pair(tmp_path, t=15, period=5, h=64, w=64, seed=7):
    """B&W input + a colored reference whose tint (and luma) jumps every
    ``period`` frames — each jump trips the streaming SC scan."""
    src, ref = tmp_path / "in.mp4", tmp_path / "ref.mp4"
    frames = _write_test_video(src, t=t, h=h, w=w, seed=seed)
    tints = [np.array([1.3, 0.85, 0.7]), np.array([0.7, 1.0, 1.3]),
             np.array([1.0, 1.25, 0.8])]
    wr = cv2.VideoWriter(str(ref), cv2.VideoWriter_fourcc(*"mp4v"), 25,
                         (w, h))
    for i, f in enumerate(frames):
        k = (i // period) % len(tints)
        gain = 0.6 + 0.4 * ((i // period) % 2)
        tinted = np.clip(f * tints[k] * gain, 0, 1)
        wr.write(cv2.cvtColor((tinted * 255).astype(np.uint8),
                              cv2.COLOR_RGB2BGR))
    wr.release()
    return src, ref


def test_restore_streaming_ex2_default_geometry(tmp_path):
    """With no work_size, ex_model=2 streams at the REMASTER geometry
    (remaster_work_shape — /16 both sides), not the deepex smart size
    (216x384 medium is not /16 and crashed the r5 bench on real
    footage).  frame_mindim keeps the test size small."""
    src, ref = _write_scene_pair(tmp_path, t=8, period=4)
    out_path = tmp_path / "out_rm_default.mp4"
    n = streaming.HAVC_restore_video_streaming(
        str(src), str(ref), str(out_path), ex_model=2,
        max_memory_frames=4, frame_mindim=32, chunk_size=8,
    )
    assert n == 8
    assert _read_video(out_path).shape[0] == 8


@pytest.mark.parametrize("ex_model,chunks,kw", [
    (1, (5, 15), dict(render_speed="fast")),
    (2, (6, 24), dict(max_memory_frames=4)),
    (3, (5, 15), dict(render_speed="fast")),
])
def test_restore_video_streaming_engines(tmp_path, ex_model, chunks, kw):
    """DeepEx / DeepRemaster / hybrid streaming: the engine carry (scene
    reference, sliding ref window + lookahead, scan state) flows across
    chunks, so chunked == whole to codec scale.  The remaster case uses a
    4-slot buffer over ~6 references so the window actually slides and
    the lookahead decode-ahead engages."""
    t = max(chunks)
    src, ref = _write_scene_pair(tmp_path, t=t, period=5)
    outs = {}
    for chunk in chunks:
        out_path = tmp_path / f"out_{ex_model}_{chunk}.mp4"
        n = streaming.HAVC_restore_video_streaming(
            str(src), str(ref), str(out_path), chunk_size=chunk,
            work_size=(32, 32), ex_model=ex_model, **kw,
        )
        assert n == t
        outs[chunk] = _read_video(out_path)
    err = np.abs(outs[chunks[0]] - outs[chunks[1]]).mean()
    assert err < 5e-3, f"ex_model={ex_model} chunked stream diverged: {err:.4f}"
