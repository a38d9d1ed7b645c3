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
instead of the chip.  So the clock runs over an N-step *dependent chain*
(each step consumes the previous output, forcing sequential execution on
device) synchronized by a single 1-pixel transfer; the same-length chain
of a trivial op is measured first and subtracted to remove per-dispatch
overhead.  On directly-attached hardware the correction is negligible.

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
import subprocess
import sys
import time

_REPO = os.path.dirname(os.path.abspath(__file__))
_METRIC = "1080p_DD_pipeline_fps_per_chip"


def _emit(value, backend, note=None, extra=None):
    rec = {
        "metric": _METRIC,
        "value": round(float(value), 3),
        "unit": "frames/sec",
        "vs_baseline": round(float(value) / 30.0, 3),
        "backend": backend,
    }
    if note:
        rec["note"] = note
    if extra:
        rec.update(extra)
    print(json.dumps(rec))


def _bench_streaming_e2e(
    sample: str = "/root/reference/samples/sample_bw.mp4",
    n_frames: int = 192,
):
    """End-to-end streaming throughput on real footage: loop/upscale the
    reference sample to 1080p once (prep excluded from the clock), then
    time the public HAVC_main_streaming — decode -> classic pipeline ->
    encode, wall clock INCLUDING both cv2 IO legs."""
    import cv2
    import numpy as np

    from havc_tpu.streaming import HAVC_main_streaming

    tmp_in = "/tmp/havc_bench_1080p_in.mp4"
    tmp_out = "/tmp/havc_bench_1080p_out.mp4"
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
            tmp_in, cv2.VideoWriter_fourcc(*"mp4v"), 25.0, (1920, 1080)
        )
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

    # warm pass compiles every stage at the streaming batch/chunk shapes
    # (first-compile cost is a one-time artifact, not throughput); 64 is a
    # multiple of the 32-frame temporal chunk like the timed run, so the
    # tail-chunk shapes match and nothing compiles inside the clock
    HAVC_main_streaming(tmp_in, tmp_out, Preset="medium", count=64)
    t0 = time.perf_counter()
    n = HAVC_main_streaming(tmp_in, tmp_out, Preset="medium")
    dt = time.perf_counter() - t0
    from havc_tpu import streaming as _streaming

    return {
        "e2e_streaming_fps_1080p": round(n / dt, 2),
        "e2e_streaming_frames": int(n),
        # default transfer resolves to gray upload (1 B/px, bit-identical
        # for the exactly-gray B&W source) + chroma-only uv420 download
        # (0.5 B/px: host owns the output luma in gray mode) + one-chunk
        # write pipelining = 1.5 B/px on the link vs 6 for naive RGB both
        # ways; record the mode the call actually selected
        "e2e_streaming_transfer": _streaming.last_transfer() or "gray+uv420",
    }


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

    @jax.jit
    def trivial(frames):
        return frames * 1.0000001 + 1e-9

    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.random((BATCH, H, W, 3), dtype=np.float32))

    def chain_time(fn, n):
        y = frames
        _ = np.asarray(fn(y)[0, 0, 0])  # warm/compile
        t0 = time.perf_counter()
        for _ in range(n):
            y = fn(y)
        np.asarray(y[0, 0, 0])  # 1-px sync
        return time.perf_counter() - t0

    n_iters = 10 if on_tpu else 2
    t_overhead = chain_time(trivial, n_iters)
    t_pipeline = chain_time(lambda y: pipeline(dd_params, do_params, y), n_iters)
    t_compute = max(t_pipeline - t_overhead, 1e-6)
    fps = BATCH * n_iters / t_compute

    extra = {}
    if on_tpu:
        # secondary metric (fail-soft): the PUBLIC api.HAVC_main itself at
        # 1080p — scene detection, gated colorize, stabilizer chain, post —
        # so the fused-program number above and the API number are both on
        # record (round-2 verdict: "the API is as fast as the bench" was
        # unproven)
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
            # metric above (the tunneled PJRT link's ~30 MB/s host<->device
            # path would otherwise dominate; a directly-attached chip
            # doesn't pay it).  The API preserves residency: device in ->
            # every stage stays on device -> device out.
            clip = from_frames(seq).to_device()
            jax.block_until_ready(clip.frames)
            # warm (compile) at the FULL clip shape — the temporal stages
            # (chroma_stabilizer, deflicker) trace over the whole time
            # axis, so a short-prefix warm leaves T=48 compiles in the
            # timed region
            jax.block_until_ready(
                api.HAVC_main(clip, Preset="medium", ScThreshold=0.10).frames
            )
            t0 = time.perf_counter()
            out = api.HAVC_main(clip, Preset="medium", ScThreshold=0.10)
            jax.block_until_ready(out.frames)
            dt = time.perf_counter() - t0
            extra["havc_main_fps_1080p"] = round(T_m / dt, 2)
        except Exception as e:  # noqa: BLE001 - secondary metric only
            extra["havc_main_error"] = f"{type(e).__name__}: {e}"[:160]

        # secondary metric (fail-soft): ColorMNet exemplar engine at full
        # geometry, device-resident steady state
        try:
            from havc_tpu.exemplar import ColorMNetEngine, colormnet_propagate

            eng = ColorMNetEngine(config="full", work_size=(224, 448))
            rng2 = np.random.default_rng(1)
            T = 16
            fr = jax.device_put(jnp.asarray(
                rng2.random((T, 224, 448, 3), dtype=np.float32)))
            rab = jax.device_put(jnp.asarray(
                rng2.random((T, 224, 448, 2), dtype=np.float32) * 2 - 1))
            jax.block_until_ready((fr, rab))
            is_ref = np.zeros(T, bool)
            is_ref[0] = True
            # device_out keeps the timing consistent with the DeepEx /
            # DeepRemaster numbers below (engine throughput, not the
            # tunnel's ~30 MB/s download of the (T,H,W,2) f32 output —
            # that transfer alone costs ~0.4 s for T=16 here)
            out = colormnet_propagate(eng, fr, rab, is_ref,
                                      device_out=True)  # compile
            jax.block_until_ready(out)
            t0 = time.perf_counter()
            out = colormnet_propagate(eng, fr, rab, is_ref, device_out=True)
            jax.block_until_ready(out)
            dt = time.perf_counter() - t0
            extra["colormnet_fps_224x448"] = round(T / dt, 2)
        except Exception as e:  # noqa: BLE001 - secondary metric only
            extra["colormnet_error"] = f"{type(e).__name__}: {e}"[:160]

        # secondary metric (fail-soft): ColorMNet THROUGHPUT mode — the
        # scene-batched scan (vivid semantics make scenes independent, so
        # the sequential T-step scan becomes a vmapped S-scene scan).
        # This is the TPU-native answer to the engine's latency floor.
        try:
            from havc_tpu.exemplar import colormnet_propagate_scenes

            S, L = 4, 8  # 4 scenes x 8 frames = 32 frames per call
            fr_s = jax.device_put(jnp.asarray(
                rng2.random((S * L, 224, 448, 3), dtype=np.float32)))
            rab_s = jax.device_put(jnp.asarray(
                rng2.random((S * L, 224, 448, 2), dtype=np.float32) * 2 - 1))
            jax.block_until_ready((fr_s, rab_s))
            is_ref_s = np.zeros(S * L, bool)
            is_ref_s[::L] = True
            out = colormnet_propagate_scenes(
                eng, fr_s, rab_s, is_ref_s, device_out=True)  # compile
            jax.block_until_ready(out)
            t0 = time.perf_counter()
            out = colormnet_propagate_scenes(
                eng, fr_s, rab_s, is_ref_s, device_out=True)
            jax.block_until_ready(out)
            dt = time.perf_counter() - t0
            extra["colormnet_sceneparallel_fps_224x448"] = round(
                (S * L) / dt, 2)
        except Exception as e:  # noqa: BLE001 - secondary metric only
            extra["colormnet_sceneparallel_error"] = (
                f"{type(e).__name__}: {e}"[:160])

        # secondary metric (fail-soft): END-TO-END streaming fps on REAL
        # footage at 1080p — decode (cv2) -> full classic pipeline ->
        # encode (cv2), via the public HAVC_main_streaming.  This is the
        # deliverable-shaped number: wall clock INCLUDES host video IO.
        try:
            extra.update(_bench_streaming_e2e())
        except Exception as e:  # noqa: BLE001 - secondary metric only
            extra["e2e_streaming_error"] = f"{type(e).__name__}: {e}"[:160]

        # secondary metrics (fail-soft): the two slow exemplar engines at
        # their published working geometries, device-resident inputs,
        # steady state after one compile call
        try:
            from havc_tpu.exemplar import DeepExEngine, deepex_propagate

            deng = DeepExEngine(speed="medium")  # 216x384
            rng4 = np.random.default_rng(4)
            Td = 16
            dfr = jax.device_put(jnp.asarray(
                rng4.random((Td, deng.h, deng.w, 3), dtype=np.float32)))
            drf = jax.device_put(jnp.asarray(
                rng4.random((Td, deng.h, deng.w, 3), dtype=np.float32)))
            jax.block_until_ready((dfr, drf))
            d_ref = np.zeros(Td, bool)
            d_ref[[0, 8]] = True
            out = deepex_propagate(deng, dfr, drf, d_ref, batch_size=8,
                                   device_out=True)  # compile
            jax.block_until_ready(out)
            t0 = time.perf_counter()
            out = deepex_propagate(deng, dfr, drf, d_ref, batch_size=8,
                                   device_out=True)
            jax.block_until_ready(out)
            dt = time.perf_counter() - t0
            extra[f"deepex_fps_{deng.h}x{deng.w}"] = round(Td / dt, 2)
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
            jax.block_until_ready((rfr, rrf))
            rpos = np.arange(0, Tr, 2)
            out = remaster_propagate(  # compile
                reng, rfr, rrf, ref_positions=rpos, ref_buffer_size=20,
                device_out=True)
            jax.block_until_ready(out)
            t0 = time.perf_counter()
            out = remaster_propagate(
                reng, rfr, rrf, ref_positions=rpos, ref_buffer_size=20,
                device_out=True)
            jax.block_until_ready(out)
            dt = time.perf_counter() - t0
            extra[f"remaster_fps_{Hr}x{Wr}"] = round(Tr / dt, 2)
        except Exception as e:  # noqa: BLE001 - secondary metric only
            extra["remaster_error"] = f"{type(e).__name__}: {e}"[:160]

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
        rec = _run_child_subprocess(force_cpu=False, timeout_s=2400.0)
        if rec is not None:
            print(json.dumps(rec))
            return
        note_prefix = "TPU bench child failed/timed out; "
    elif backend == "cpu":
        note_prefix = ""
    else:
        note_prefix = "TPU backend probe unreachable (3 attempts); "

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
