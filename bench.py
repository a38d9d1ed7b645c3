"""Benchmark: end-to-end HAVC classic colorization throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.

Measures the full BASELINE config #4 pipeline ("Blended DeOldify+DDColor
with temporal chroma-smoothing") per-frame at 1080p:

  spline64 work-res resize -> DeOldify DynamicUnetWide (resnet101, rf=24)
  -> DDColor (ConvNeXt-large geometry, input 384) -> ConstrainedChroma
  merge (method 3) -> fused post chain (dark tweak + chroma smoothing +
  colormap) -> full-res chroma restore.  bf16 model paths, f32 chroma.

Measurement methodology (important on tunneled/async platforms):
``block_until_ready`` can return before compute completes on the axon
platform, and a per-iteration host transfer measures the transfer link
instead of the chip.  So EVERY metric here runs over an N-step *dependent
chain* (each step consumes the previous output, forcing sequential
execution on device) synchronized by a single 1-pixel transfer; the
same-length chain of the trivial glue ops is measured alongside and
subtracted to remove the artificial per-dispatch overhead the chain adds.
Each metric is the MEDIAN of >=3 timed repeats and carries a ``*_spread``
key = (max-min)/median, so run-to-run variance is in the artifact itself.
(Basis change r5: earlier rounds clocked the secondary metrics with a
single block_until_ready'd call, which on this platform could disagree
with interactive runs by 3x; all fps keys are now chain-clocked and are
NOT directly comparable to BENCH_r01..r04 values.)

Streaming metrics are wall-clock by construction (the host loop really
downloads/encodes), and the sink variants isolate the legs:
``e2e`` = decode + compute + download + encode, ``null`` sink skips the
encode, ``device`` sink skips the download (pipeline-only fps — what a
directly-attached chip would sustain), plus the measured host<->device
link bandwidth so the difference is arithmetic on recorded numbers.

Robustness (the round-1 artifact was rc=1 with zero numbers): the actual
measurement runs in a child subprocess under a timeout.  The orchestrator
first probes the default backend (the tunneled TPU can be unreachable for
hours); if the probe or the TPU child fails, the bench re-runs on the CPU
host platform with a reduced geometry and emits the number with an
explicit ``backend`` marker instead of crashing.  One JSON line is
printed in every case.

Baseline target: >=30 fps 1080p per chip (BASELINE.json north star).
Engines run at the published geometry with initialized weights (wall-clock
cost is weight-independent).
"""
import json
import os
import statistics
import subprocess
import sys
import time

_REPO = os.path.dirname(os.path.abspath(__file__))
_METRIC = "1080p_DD_pipeline_fps_per_chip"
_T_START = time.perf_counter()
_BUDGET_S = float(os.environ.get("HAVC_BENCH_BUDGET_S", "3600"))


def _elapsed():
    return time.perf_counter() - _T_START


def _over_budget(reserve_s: float = 0.0) -> bool:
    return _elapsed() + reserve_s > _BUDGET_S


def _emit(value, backend, note=None, extra=None):
    rec = {
        "metric": _METRIC,
        "value": round(float(value), 3),
        "unit": "frames/sec",
        "vs_baseline": round(float(value) / 30.0, 3),
        "backend": backend,
        "clock": ("dependent-chain, median of >=3 repeats with spread; "
                  "streaming = wall clock with real IO (basis changed r5)"),
    }
    if note:
        rec["note"] = note
    if extra:
        rec.update(extra)
    print(json.dumps(rec))


# ---------------------------------------------------------------------------
# sound clocks
# ---------------------------------------------------------------------------


def _sync_1px(x):
    """Force completion via a real 1-element fetch (block_until_ready can
    return before compute completes on the axon platform).

    Fetch through a (1,...,1) SLICE, never reshape(-1): ravel of a
    (T,1080,1920,3) array makes XLA copy the input into the default
    tiled layout T(8,128), padding the size-3 minor dim to 128 — a 42.7x
    allocation (51 GB at T=48) that aborts the compile on a 16 GB chip
    (this was the r5 havc_main bench failure)."""
    import numpy as np

    if isinstance(x, (tuple, list)):
        x = x[0]
    nd = getattr(x, "ndim", 0)
    return np.asarray(x[tuple(slice(0, 1) for _ in range(nd))] if nd else x)


class ChainClock:
    """Dependent-chain clock: times ``n_links`` calls of ``call`` where
    each call's input is perturbed by the previous call's output (true
    data dependence -> the device must run them sequentially), synced by
    one 1-px fetch.  The same-length chain of just the glue ops (probe +
    mix) is timed per repeat and subtracted, so the artificial dispatch
    overhead the chain adds is removed while the call's own real dispatch
    cost stays in.  Returns (fps_median, spread, times)."""

    def __init__(self):
        import jax
        import jax.numpy as jnp

        # 1e-12 on unit-scale data: numerically irrelevant, but a REAL
        # dependence (a literal *0 could be folded away by XLA)
        self._probe = jax.jit(
            lambda o: jnp.mean(o.astype(jnp.float32)) * 1e-12)
        self._mix = jax.jit(lambda x, s: x + s.astype(x.dtype))

    def _run(self, call, seed, n_links):
        t0 = time.perf_counter()
        x, out = seed, None
        for _ in range(n_links):
            out = call(x)
            x = self._mix(x, self._probe(out))
        _sync_1px(out)
        return time.perf_counter() - t0

    def fps(self, call, seed, items_per_call, n_links=3, repeats=3):
        out = call(seed)  # warm: compile every shape in the chain
        _sync_1px(out)
        self._run(lambda x: x, seed, n_links)  # warm the glue chain
        # warm the glue at the call's OUTPUT shape too: the timed chain
        # runs _probe on call(x) whose shape/dtype can differ from seed
        # (e.g. (T,H,W,2) ab out of an (T,H,W,3) rgb in) — without this
        # a remote compile lands inside timed repeat 1 and reads as a
        # relay stall in the *_chain_times_s artifact
        _sync_1px(self._mix(seed, self._probe(out)))
        times = []
        for _ in range(repeats):
            t_total = self._run(call, seed, n_links)
            t_glue = self._run(lambda x: x, seed, n_links)
            times.append(max(t_total - t_glue, 1e-9))
        med = statistics.median(times)
        spread = (max(times) - min(times)) / med if med > 0 else 0.0
        return items_per_call * n_links / med, spread, times


def _put(rec, key, fps, spread):
    rec[key] = round(float(fps), 2)
    rec[key + "_spread"] = round(float(spread), 3)


# ---------------------------------------------------------------------------
# streaming benches (wall clock with real IO; sink variants isolate legs)
# ---------------------------------------------------------------------------


def _ensure_1080p_input(sample="/root/reference/samples/sample_bw.mp4",
                        n_frames=192):
    """Loop/upscale the reference sample to 1080p once (prep excluded
    from every clock)."""
    import cv2

    tmp_in = "/tmp/havc_bench_1080p_in.mp4"
    if os.path.exists(tmp_in):
        # a killed prior run can leave a short file behind — validate it
        cap = cv2.VideoCapture(tmp_in)
        have = int(cap.get(cv2.CAP_PROP_FRAME_COUNT)) if cap.isOpened() else 0
        cap.release()
        if have < n_frames:
            os.remove(tmp_in)
    if not os.path.exists(tmp_in):
        cap = cv2.VideoCapture(sample)
        if not cap.isOpened():
            raise IOError(f"cannot open {sample}")
        wr = cv2.VideoWriter(
            tmp_in, cv2.VideoWriter_fourcc(*"mp4v"), 25.0, (1920, 1080))
        written = 0
        while written < n_frames:
            ok, frame = cap.read()
            if not ok:  # loop the sample
                cap.set(cv2.CAP_PROP_POS_FRAMES, 0)
                continue
            wr.write(cv2.resize(frame, (1920, 1080),
                                interpolation=cv2.INTER_CUBIC))
            written += 1
        cap.release()
        wr.release()
    return tmp_in


def _bench_link_bandwidth(repeats=3, mb=24):
    """Measured host<->device link bandwidth: device_put of a pinned-size
    uint8 array (up) and np.asarray of a device array (down), medians."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    n = mb * (1 << 20)
    host = np.random.default_rng(7).integers(
        0, 255, size=n, dtype=np.uint8)
    ups, downs = [], []
    dev = jax.device_put(host)
    _sync_1px(dev)
    for _ in range(repeats):
        t0 = time.perf_counter()
        dev = jax.device_put(host)
        _sync_1px(dev)
        ups.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        back = np.asarray(dev)
        downs.append(time.perf_counter() - t0)
        assert back[0] == host[0]
    return {
        "link_up_MBps": round(mb / statistics.median(ups), 1),
        "link_down_MBps": round(mb / statistics.median(downs), 1),
    }


def _bench_streaming_e2e(extra):
    """End-to-end streaming on real 1080p footage via the public
    HAVC_main_streaming, four configurations:

    - e2e (video sink, depth 3): decode -> pipeline -> download -> encode
    - e2e depth 1: the pre-r5 one-chunk-behind write path (A/B for the
      deeper download pipelining)
    - null sink: full download, no encode (isolates the cv2 encoder)
    - device sink: no download (still pays decode + gray upload)
    - device source + sink: zero link traffic — the compute/chunk/pack
      machinery alone (the directly-attached-chip pipeline rate)
    - plus host decode alone, so every leg of the projection is recorded
    """
    from havc_tpu.streaming import HAVC_main_streaming
    from havc_tpu import streaming as _streaming

    tmp_in = _ensure_1080p_input()
    tmp_out = "/tmp/havc_bench_1080p_out.mp4"

    # warm pass compiles every stage at the streaming batch/chunk shapes
    # (first-compile cost is a one-time artifact, not throughput); 64 is
    # exactly one default temporal chunk (r5: chunk_size default is 64 —
    # the measured compute-only plateau), so the timed 192-frame runs
    # (3 full chunks) compile nothing inside the clocks
    HAVC_main_streaming(tmp_in, tmp_out, Preset="medium", count=64)

    def timed(**kw):
        t0 = time.perf_counter()
        n = HAVC_main_streaming(tmp_in, tmp_out, Preset="medium", **kw)
        return n, time.perf_counter() - t0

    n, dt = timed(pipeline_depth=3)
    extra["e2e_streaming_fps_1080p"] = round(n / dt, 2)
    extra["e2e_streaming_frames"] = int(n)
    # default transfer resolves to gray upload (1 B/px, bit-identical
    # for the exactly-gray B&W source) + chroma-only uv420 download
    # (0.5 B/px: host owns the output luma in gray mode); record the
    # mode the call actually selected
    extra["e2e_streaming_transfer"] = _streaming.last_transfer() or "?"

    # pipeline-only: the compute + overlap machinery with the download
    # leg removed — still pays decode + the gray upload (2.07 MB/frame;
    # at the link_up above that alone can bound the loop).  Its own warm
    # pass: the device sink's 1-px sync slices are new (tiny) programs
    # that must not compile inside the clock.
    HAVC_main_streaming(tmp_in, tmp_out, Preset="medium", count=64,
                        sink="device")
    n, dt = timed(sink="device")
    extra["streaming_pipeline_only_fps_1080p"] = round(n / dt, 2)

    # compute-only: device source AND device sink — one decoded batch
    # uploaded once, then the identical per-batch compute/chunk/pack
    # machinery with ZERO link traffic.  This is the rate the streaming
    # pipeline itself sustains on a directly-attached chip (its host
    # would add decode, measured separately below).
    HAVC_main_streaming(tmp_in, tmp_out, Preset="medium", count=64,
                        sink="device", source="device")
    n, dt = timed(sink="device", source="device", count=192)
    extra["streaming_compute_only_fps_1080p"] = round(n / dt, 2)

    # A/B extras run at half length (per-frame rates stay comparable)
    # and with generous reserves: in bad relay weather the deliverable-
    # shaped restore block below outranks these legs
    if not _over_budget(reserve_s=600):
        n, dt = timed(pipeline_depth=1, count=128)  # 2 full 64-chunks:
        extra["e2e_streaming_fps_1080p_depth1"] = round(n / dt, 2)
    if not _over_budget(reserve_s=520):
        n, dt = timed(sink="null", count=128)  # no tail shape compiles
        extra["streaming_nullsink_fps_1080p"] = round(n / dt, 2)

    # host decode alone (cv2, this 1-core host) so the directly-attached
    # projection composes from recorded legs: decode || upload || compute
    import cv2

    cap = cv2.VideoCapture(tmp_in)
    n_dec = 0
    t0 = time.perf_counter()
    while True:
        ok, _fr = cap.read()
        if not ok:
            break
        n_dec += 1
    cap.release()
    if n_dec:
        extra["host_decode_fps_1080p"] = round(
            n_dec / (time.perf_counter() - t0), 2)


def _bench_restore_streaming(extra):
    """HAVC_restore_video_streaming wall-clock fps on the real bundled
    footage (920x672 B&W + 300x220 colored sync reference), all three
    exemplar engines, video sink — the deliverable-shaped exemplar
    numbers (VERDICT r4 item 5).  Reference hot paths:
    colormnet/__init__.py:216, remaster/__init__.py:123-145."""
    from havc_tpu.streaming import HAVC_restore_video_streaming

    bw = "/root/reference/samples/sample_bw.mp4"
    ref = "/root/reference/samples/sample_colored_sync.mp4"
    # 64 = two full 32-frame restore chunks (no tail shape beyond the
    # warm pass); short enough that all three engines fit the budget
    # even in bad relay weather (r5: 96-frame runs at 4.7-6.4 fps plus
    # per-engine compiles budget-skipped remaster twice)
    count = 64
    for ex_model, name in ((0, "colormnet"), (1, "deepex"), (2, "remaster")):
        if _over_budget(reserve_s=180):
            extra[f"restore_streaming_{name}_skipped"] = "bench budget"
            continue
        try:
            out = f"/tmp/havc_bench_restore_{name}.mp4"
            # warm: compile at the chunk shapes (chunk 32 + tail 16)
            HAVC_restore_video_streaming(
                bw, ref, out, ex_model=ex_model, count=48)
            t0 = time.perf_counter()
            n = HAVC_restore_video_streaming(
                bw, ref, out, ex_model=ex_model, count=count)
            dt = time.perf_counter() - t0
            extra[f"restore_streaming_{name}_fps"] = round(n / dt, 2)
            # pipeline-only leg (download removed, still pays decode +
            # upload) — the same sink decomposition the classic
            # streaming metrics carry, so the directly-attached-chip
            # projection is arithmetic for the exemplar path too.
            # Skippable separately: the wall-clock number above is the
            # deliverable; this leg is its decomposition.
            if _over_budget(reserve_s=90):
                extra[f"restore_streaming_{name}_deviceout_skipped"] = (
                    "bench budget")
                continue
            HAVC_restore_video_streaming(  # warm the 1-px sync programs
                bw, ref, out, ex_model=ex_model, count=48, sink="device")
            t0 = time.perf_counter()
            n = HAVC_restore_video_streaming(
                bw, ref, out, ex_model=ex_model, count=count,
                sink="device")
            dt = time.perf_counter() - t0
            extra[f"restore_streaming_{name}_deviceout_fps"] = round(
                n / dt, 2)
        except Exception as e:  # noqa: BLE001 - secondary metric only
            extra[f"restore_streaming_{name}_error"] = (
                f"{type(e).__name__}: {e}"[:160])


# ---------------------------------------------------------------------------
# child body
# ---------------------------------------------------------------------------


def run_child():
    """The measurement body.  Runs on whatever backend this process gets;
    prints one JSON line on success."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    try:
        from havc_tpu import enable_cache

        enable_cache("/tmp/havc_xla_cache")
    except Exception:
        pass

    backend = jax.default_backend()
    on_tpu = backend not in ("cpu",)

    from havc_tpu.models import ddcolor as dd
    from havc_tpu.models import deoldify as do
    from havc_tpu.ops import merge as merge_ops
    from havc_tpu.ops.pallas_kernels import post_chain_pallas, post_chain_reference
    from havc_tpu.ops.resize import resize
    from havc_tpu.filters import chroma_resize_restore

    H, W = 1080, 1920
    BATCH = 8 if on_tpu else 1  # B=8 beats B=4 by ~20% (64 vs 53 fps)
    RF = 24
    WORK = RF * 16  # 384

    if on_tpu:
        dd_model = dd.DDColor.from_config("large")
        do_model = do.DeOldifyWide(encoder="resnet101", nf_factor=2)
        input_size = 384
    else:  # keep the CPU fallback runnable
        dd_model = dd.DDColor.from_config("micro")
        do_model = do.DeOldifyWide(encoder="nano", nf_factor=1)
        input_size = 128

    dd_params = dd.init_params(dd_model, input_size=64)
    do_params = do.init_params(do_model, input_size=64)

    if on_tpu:
        # bf16 weights/activations for the model paths; merge/post stay f32
        cast = lambda t: jax.tree.map(
            lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, t
        )
        dd_params = cast(dd_params)
        do_params = cast(do_params)

    post_kw = dict(
        dark_thr=0.1, dark_white=0.3, dark_sat=0.3, dark_bright=-0.8,
        sm_black=0.3, sm_white=0.7, sm_sat=0.9, sm_bright=0.0,
        cmap_ranges=((300.0, 360.0),), cmap_hue_shift=0.0, cmap_sat=0.8,
        cmap_weight=0.1,
    )
    post = post_chain_pallas if on_tpu else post_chain_reference
    model_dtype = jnp.bfloat16 if on_tpu else jnp.float32

    @jax.jit
    def pipeline(dd_p, do_p, frames):
        work = jnp.clip(resize(frames, WORK, WORK, "spline64"), 0.0, 1.0)
        work_m = work.astype(model_dtype)
        stable = do.colorize(do_p, work_m, do_model, render_factor=RF).astype(jnp.float32)
        vivid = dd.colorize(dd_p, work_m, dd_model, input_size=input_size).astype(jnp.float32)
        merged = merge_ops.combine_models(stable, vivid, method=3, b_weight=0.5)
        tuned = post(merged, **post_kw)
        return chroma_resize_restore(frames, tuned)

    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.random((BATCH, H, W, 3), dtype=np.float32))

    clock = ChainClock()
    n_links = 10 if on_tpu else 2
    repeats = 3 if on_tpu else 2
    fps, h_spread, h_times = clock.fps(
        lambda y: pipeline(dd_params, do_params, y), frames,
        items_per_call=BATCH, n_links=n_links, repeats=repeats)

    # raw per-repeat chain times: a relay stall mid-repeat shows up as
    # one outlier here instead of silently inflating the spread scalar
    extra = {"headline_spread": round(float(h_spread), 3),
             "headline_chain_times_s": [round(t, 3) for t in h_times]}
    if on_tpu:
        # measured link bandwidth first: it contextualizes every
        # streaming delta below (fail-soft like all secondary metrics)
        try:
            extra.update(_bench_link_bandwidth())
        except Exception as e:  # noqa: BLE001
            extra["link_error"] = f"{type(e).__name__}: {e}"[:160]

        # END-TO-END streaming on REAL 1080p footage: e2e with IO,
        # depth-1 A/B, null-writer, and pipeline-only (device sink) —
        # the deliverable-shaped block (VERDICT r4 items 3+4)
        try:
            _bench_streaming_e2e(extra)
        except Exception as e:  # noqa: BLE001
            extra["e2e_streaming_error"] = f"{type(e).__name__}: {e}"[:160]

        # the PUBLIC api.HAVC_main at 1080p — scene detection, gated
        # colorize, stabilizer chain, post — chain-clocked
        try:
            from havc_tpu import api
            from havc_tpu.clip import from_frames

            T_m = 48
            rng3 = np.random.default_rng(2)
            base = rng3.random((H, W, 1), dtype=np.float32)
            seq = np.clip(
                base[None] * (0.45 + 0.4 * np.sin(
                    np.arange(T_m, dtype=np.float32) / 6.0
                ))[:, None, None, None] + 0.08,
                0, 1,
            ).repeat(3, axis=-1).astype(np.float32)
            # device-resident in/out, same convention as the fused-pipeline
            # metric above; the API preserves residency end to end
            clip0 = from_frames(seq).to_device()
            _sync_1px(clip0.frames)

            def call_main(fr):
                return api.HAVC_main(
                    clip0.with_frames(fr), Preset="medium", ScThreshold=0.10
                ).frames

            # the tunneled remote-compile service throws transient HTTP
            # 500s; one bounded retry keeps a hiccup out of the artifact
            try:
                fps_m, sp, _ = clock.fps(call_main, clip0.frames,
                                         items_per_call=T_m, n_links=2,
                                         repeats=3)
            except Exception:  # noqa: BLE001
                time.sleep(20.0)
                fps_m, sp, _ = clock.fps(call_main, clip0.frames,
                                         items_per_call=T_m, n_links=2,
                                         repeats=3)
            _put(extra, "havc_main_fps_1080p", fps_m, sp)
        except Exception as e:  # noqa: BLE001 - secondary metric only
            extra["havc_main_error"] = f"{type(e).__name__}: {e}"[:160]

        # ColorMNet exemplar engine at full geometry, device-resident,
        # chain-clocked; then the scene-batched THROUGHPUT mode at two
        # geometries so the sequential-vs-batched crossover is on record
        eng = None
        try:
            from havc_tpu.exemplar import ColorMNetEngine, colormnet_propagate

            eng = ColorMNetEngine(config="full", work_size=(224, 448))
            rng2 = np.random.default_rng(1)
            T = 16
            fr = jax.device_put(jnp.asarray(
                rng2.random((T, 224, 448, 3), dtype=np.float32)))
            rab = jax.device_put(jnp.asarray(
                rng2.random((T, 224, 448, 2), dtype=np.float32) * 2 - 1))
            _sync_1px(fr)
            is_ref = np.zeros(T, bool)
            is_ref[0] = True
            # device_out: engine throughput, not the tunnel download of
            # the (T,H,W,2) f32 output (~0.4 s for T=16 on this link)
            # 5 repeats + the raw per-repeat times in the artifact: the
            # relay occasionally stalls tens of seconds mid-repeat (r5
            # run: spread 69 from one stalled repeat), so the median
            # needs more samples and the tail must be visible, not
            # folded into a single spread scalar
            fps_c, sp, times_c = clock.fps(
                lambda x: colormnet_propagate(eng, x, rab, is_ref,
                                              device_out=True),
                fr, items_per_call=T, n_links=3, repeats=5)
            _put(extra, "colormnet_fps_224x448", fps_c, sp)
            extra["colormnet_chain_times_s"] = [
                round(t, 3) for t in times_c]
        except Exception as e:  # noqa: BLE001 - secondary metric only
            extra["colormnet_error"] = f"{type(e).__name__}: {e}"[:160]

        try:
            if eng is None:
                raise RuntimeError(
                    "engine construction failed above: "
                    + extra.get("colormnet_error", "unknown"))
            from havc_tpu.exemplar import colormnet_propagate_scenes

            rng2b = np.random.default_rng(11)
            for S, L in ((4, 8), (8, 8)):
                if S * L > 32 and _over_budget(reserve_s=300):
                    extra[f"colormnet_sp_s{S}l{L}_skipped"] = "bench budget"
                    continue
                fr_s = jax.device_put(jnp.asarray(
                    rng2b.random((S * L, 224, 448, 3), dtype=np.float32)))
                rab_s = jax.device_put(jnp.asarray(
                    rng2b.random((S * L, 224, 448, 2),
                                 dtype=np.float32) * 2 - 1))
                _sync_1px(fr_s)
                is_ref_s = np.zeros(S * L, bool)
                is_ref_s[::L] = True
                fps_s, sp, _ = clock.fps(
                    lambda x: colormnet_propagate_scenes(
                        eng, x, rab_s, is_ref_s, device_out=True),
                    fr_s, items_per_call=S * L, n_links=2, repeats=3)
                key = ("colormnet_sceneparallel_fps_224x448"
                       if (S, L) == (4, 8)
                       else f"colormnet_sceneparallel_fps_s{S}l{L}")
                _put(extra, key, fps_s, sp)
        except Exception as e:  # noqa: BLE001 - secondary metric only
            extra["colormnet_sceneparallel_error"] = (
                f"{type(e).__name__}: {e}"[:160])

        # the two other exemplar engines at their published working
        # geometries, device-resident, chain-clocked
        try:
            from havc_tpu.exemplar import DeepExEngine, deepex_propagate

            deng = DeepExEngine(speed="medium")  # 216x384
            rng4 = np.random.default_rng(4)
            Td = 16
            dfr = jax.device_put(jnp.asarray(
                rng4.random((Td, deng.h, deng.w, 3), dtype=np.float32)))
            drf = jax.device_put(jnp.asarray(
                rng4.random((Td, deng.h, deng.w, 3), dtype=np.float32)))
            _sync_1px(dfr)
            d_ref = np.zeros(Td, bool)
            d_ref[[0, 8]] = True
            fps_d, sp, _ = clock.fps(
                lambda x: deepex_propagate(deng, x, drf, d_ref,
                                           batch_size=8, device_out=True),
                dfr, items_per_call=Td, n_links=3, repeats=3)
            _put(extra, f"deepex_fps_{deng.h}x{deng.w}", fps_d, sp)
        except Exception as e:  # noqa: BLE001 - secondary metric only
            extra["deepex_error"] = f"{type(e).__name__}: {e}"[:160]

        try:
            from havc_tpu.exemplar import RemasterEngine, remaster_propagate

            reng = RemasterEngine()
            rng5 = np.random.default_rng(5)
            Tr, Hr, Wr = 16, 320, 576
            rfr = jax.device_put(jnp.asarray(
                rng5.random((Tr, Hr, Wr, 3), dtype=np.float32)))
            rrf = jax.device_put(jnp.asarray(
                rng5.random((8, Hr, Wr, 3), dtype=np.float32)))
            _sync_1px(rfr)
            rpos = np.arange(0, Tr, 2)
            fps_r, sp, _ = clock.fps(
                lambda x: remaster_propagate(
                    reng, x, rrf, ref_positions=rpos, ref_buffer_size=20,
                    device_out=True),
                rfr, items_per_call=Tr, n_links=3, repeats=3)
            _put(extra, f"remaster_fps_{Hr}x{Wr}", fps_r, sp)
        except Exception as e:  # noqa: BLE001 - secondary metric only
            extra["remaster_error"] = f"{type(e).__name__}: {e}"[:160]

        # exemplar restore on real footage, all 3 engines (wall clock
        # including both decode legs + encode)
        _bench_restore_streaming(extra)

        extra["bench_elapsed_s"] = round(_elapsed(), 1)

    note = None
    if not on_tpu:
        note = (
            "TPU backend unavailable; CPU host fallback at reduced model "
            "geometry (not comparable to the 30fps/1080p target)"
        )
    _emit(fps, backend, note=note, extra=extra)


def _probe_backend(timeout_s: float = 90.0, attempts: int = 3):
    """Ask a clean subprocess for the default backend; the tunneled TPU can
    hang indefinitely, so every probe is timeout-bounded with backoff."""
    code = "import jax; print('BACKEND=' + jax.default_backend())"
    for i in range(attempts):
        try:
            r = subprocess.run(
                [sys.executable, "-c", code],
                timeout=timeout_s,
                capture_output=True,
                text=True,
                cwd=_REPO,
            )
            for line in reversed((r.stdout or "").splitlines()):
                if line.startswith("BACKEND="):
                    return line.split("=", 1)[1].strip()
        except subprocess.TimeoutExpired:
            pass
        if i + 1 < attempts:
            time.sleep(15.0 * (i + 1))
    return None


def _run_child_subprocess(force_cpu: bool, timeout_s: float):
    env = dict(os.environ)
    if force_cpu:
        env["PALLAS_AXON_POOL_IPS"] = ""
        env.pop("AXON_POOL_SVC_OVERRIDE", None)
        env["JAX_PLATFORMS"] = "cpu"
    try:
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--child"],
            timeout=timeout_s,
            capture_output=True,
            text=True,
            env=env,
            cwd=_REPO,
        )
    except subprocess.TimeoutExpired:
        return None
    for line in reversed((r.stdout or "").splitlines()):
        line = line.strip()
        if line.startswith("{"):
            try:
                return json.loads(line)
            except json.JSONDecodeError:
                continue
    return None


def main():
    backend = _probe_backend()
    if backend is not None and backend != "cpu":
        # the child prints its JSON only at the END of run_child, so the
        # parent timeout must exceed the child's budget by the worst
        # single-leg overrun (budget checks only gate the START of legs;
        # a leg admitted near the budget can run long past it on a
        # stalled relay) — equal timeouts would forfeit every computed
        # metric to one slow leg
        rec = _run_child_subprocess(force_cpu=False,
                                    timeout_s=_BUDGET_S + 900.0)
        if rec is not None:
            print(json.dumps(rec))
            return
        note_prefix = "TPU bench child failed/timed out; "
    elif backend == "cpu":
        note_prefix = ""
    else:
        note_prefix = "TPU backend probe unreachable (3 attempts); "

    os.environ["HAVC_BENCH_BUDGET_S"] = "1800"  # reduced-geometry child
    rec = _run_child_subprocess(force_cpu=True, timeout_s=2400.0)
    if rec is not None:
        if note_prefix and "note" in rec:
            rec["note"] = note_prefix + rec["note"]
        print(json.dumps(rec))
        return
    _emit(0.0, "none", note=note_prefix + "CPU fallback bench also failed")


if __name__ == "__main__":
    try:
        if "--child" in sys.argv:
            run_child()
        else:
            main()
    except Exception as e:  # never exit without the JSON line
        _emit(0.0, "error", note=f"{type(e).__name__}: {e}"[:300])
