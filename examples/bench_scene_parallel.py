"""Benchmark: sequential vs scene-parallel ColorMNet propagation.

Measures the vivid-mode exemplar scan both ways on the current backend:

  sequential : colormnet_propagate(..., vivid=True)     — T scan steps
  scenes     : colormnet_propagate_scenes(...)          — max-len steps,
               S scenes batched on the scan step (one chip) and optionally
               sharded over a mesh data axis (multi chip)

Scene independence under vivid (reset-on-ref, the reference's
reset_on_ref_update) is what makes the transform legal; equality is pinned
by tests/test_exemplar_scenes.py, so this script only times.

Usage:  python examples/bench_scene_parallel.py [--config full]
        [--frames 48] [--scene-len 6] [--size 224 448]
"""
import argparse
import sys
import time
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="full")
    ap.add_argument("--frames", type=int, default=48)
    ap.add_argument("--scene-len", type=int, default=6)
    ap.add_argument("--size", type=int, nargs=2, default=(224, 448))
    ap.add_argument("--mesh", type=int, default=0,
                    help="shard scenes over an N-device data mesh")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (the axon TPU plugin "
                         "registers at interpreter start and ignores "
                         "JAX_PLATFORMS; jax.config still works pre-init)")
    args = ap.parse_args()

    import jax

    if args.cpu:
        if args.mesh > 0:
            flags = os.environ.get("XLA_FLAGS", "")
            if "host_platform_device_count" not in flags:
                os.environ["XLA_FLAGS"] = (
                    f"{flags} --xla_force_host_platform_device_count="
                    f"{args.mesh}"
                ).strip()
        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from havc_tpu.exemplar import (
        ColorMNetEngine,
        colormnet_propagate,
        colormnet_propagate_scenes,
    )

    h, w = args.size
    T = args.frames
    eng = ColorMNetEngine(config=args.config, work_size=(h, w), seed=0)
    rng = np.random.default_rng(0)
    frames = rng.random((T, h, w, 3), dtype=np.float32)
    ref_ab = (rng.random((T, h, w, 2), dtype=np.float32) * 2 - 1) * 0.4
    is_ref = np.zeros(T, bool)
    is_ref[:: args.scene_len] = True
    n_scenes = int(is_ref.sum())

    mesh = None
    if args.mesh > 0:
        from havc_tpu.parallel import make_mesh

        mesh = make_mesh(args.mesh, data=args.mesh, model=1)

    def run_seq():
        return colormnet_propagate(eng, frames, ref_ab, is_ref, vivid=True)

    def run_par():
        return colormnet_propagate_scenes(eng, frames, ref_ab, is_ref,
                                          mesh=mesh)

    for name, fn in (("sequential", run_seq), ("scene-parallel", run_par)):
        fn()  # compile
        t0 = time.perf_counter()
        fn()
        dt = time.perf_counter() - t0
        print(f"{name:15s}: {T / dt:7.2f} fps  ({dt * 1e3:.0f} ms, "
              f"{n_scenes} scenes x {args.scene_len} frames, "
              f"{jax.default_backend()})")


if __name__ == "__main__":
    main()
