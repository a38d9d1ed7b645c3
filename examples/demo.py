"""End-to-end demo: colorize a B&W clip with the classic HAVC pipeline.

Usage::

    python examples/demo.py INPUT.mp4 OUTPUT.mp4 [--preset fast]
        [--color-model video+artistic] [--frames N] [--deepex]

Mirrors a typical vs-deoldify VapourSynth script:

    from vsdeoldify import HAVC_main
    clip = HAVC_main(clip, Preset='fast', ColorTune='light', ...)

but as a self-contained CLI over havc_tpu's Clip pipeline.
"""
import argparse
import os
import sys
import time

# runnable from a checkout without installation
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("input")
    ap.add_argument("output")
    ap.add_argument("--preset", default="veryfast")
    ap.add_argument("--color-model", default="zhang(eccv16)")
    ap.add_argument("--color-tune", default="light")
    ap.add_argument("--color-map", default="none")
    ap.add_argument("--frames", type=int, default=None)
    ap.add_argument("--deepex", action="store_true",
                    help="exemplar propagation from scene-change refs")
    ap.add_argument("--weights-dir", default=None,
                    help="directory of converted .npz checkpoints")
    ap.add_argument("--streaming", action="store_true",
                    help="bounded-memory streaming pipeline (any length)")
    args = ap.parse_args()

    import havc_tpu
    from havc_tpu.io import read_video, write_video

    if args.weights_dir:
        from havc_tpu.engines import set_weights_dir

        set_weights_dir(args.weights_dir)

    if args.streaming:
        t0 = time.time()
        n = havc_tpu.HAVC_main_streaming(
            args.input, args.output, Preset=args.preset,
            ColorModel=args.color_model, ColorTune=args.color_tune,
            count=args.frames,
        )
        dt = time.time() - t0
        print(f"streamed {n} frames in {dt:.1f}s ({n / dt:.1f} fps)")
        return

    # device=True: the upload rides uint8 (1 byte/channel over the link)
    # and the whole pipeline stays device-resident until the final uint8
    # download inside write_video
    clip = read_video(args.input, count=args.frames, device=True)
    print(f"loaded {clip.num_frames} frames {clip.height}x{clip.width}")

    t0 = time.time()
    out = havc_tpu.HAVC_main(
        clip,
        Preset=args.preset,
        ColorModel=args.color_model,
        ColorTune=args.color_tune,
        ColorMap=args.color_map,
        EnableDeepEx=args.deepex,
        ScThreshold=0.10 if args.deepex else 0.0,
    )
    dt = time.time() - t0
    print(f"colorized in {dt:.1f}s ({clip.num_frames / dt:.1f} fps)")

    write_video(out, args.output)
    print(f"wrote {args.output}")


if __name__ == "__main__":
    main()
