"""Benchmark: end-to-end HAVC classic colorization throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

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

Baseline target: >=30 fps 1080p per chip (BASELINE.json north star).
Engines run at the published geometry with initialized weights (wall-clock
cost is weight-independent).
"""
import json
import os
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    os.makedirs("/tmp/havc_xla_cache", exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/havc_xla_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    on_tpu = jax.default_backend() == "tpu"

    from havc_tpu.models import ddcolor as dd
    from havc_tpu.models import deoldify as do
    from havc_tpu.ops import merge as merge_ops
    from havc_tpu.ops.pallas_kernels import post_chain_pallas, post_chain_reference
    from havc_tpu.ops.resize import resize
    from havc_tpu.filters import chroma_resize_restore

    H, W = 1080, 1920
    BATCH = 4 if on_tpu else 1
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

    print(
        json.dumps(
            {
                "metric": "1080p_DD_pipeline_fps_per_chip",
                "value": round(fps, 3),
                "unit": "frames/sec",
                "vs_baseline": round(fps / 30.0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
