"""Reproduce the reference's model-comparison benchmark (CIEDE2000).

The reference's published QA (reference README.md:217-321) colorizes 23
B&W test photos per model configuration and reports the mean CIEDE2000
color distance against the color originals (`test_images/Image_NN_test.jpg`
are the color ground truths; the B&W input is their luma).  This harness
runs the same methodology through havc_tpu's public API:

    python examples/evaluate_de2000.py --weights-dir /path/to/converted \
        --configs D+D DD DS DV

Published reference averages (test set #1): D+D 8.3, DD 8.5, DS 9.1,
DV 9.5, ColTran 12.7 (README.md:268).  With converted pretrained
checkpoints the havc_tpu numbers are directly comparable; without weights
the engines are randomly initialized and the run only demonstrates the
harness (refuses unless --allow-random is passed).

Output: a per-image markdown table + one JSON summary line per config.
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

# Model configurations from the reference comparison (README.md:224-236).
# deoldify_p = (model, render_factor, sat, hue); model 0=video 1=stable
# 2=artistic.  ddcolor_p = (model, render_factor, sat, hue, enabled);
# model 1=artistic (rf 24 == input 384).  method 0 = DeOldify only,
# 1 = DDColor only, 2 = SimpleMerge 50/50.
CONFIGS = {
    # --- test set #1 (README.md:243-268) ---
    "D+D": dict(method=2, mweight=0.5, deoldify_p=(0, 24, 1.0, 0.0),
                ddcolor_p=(1, 24, 1.0, 0.0, True)),
    "DD": dict(method=1, ddcolor_p=(1, 24, 1.0, 0.0, True)),
    "DS": dict(method=0, deoldify_p=(1, 24, 1.0, 0.0)),
    "DV": dict(method=0, deoldify_p=(0, 24, 1.0, 0.0)),
    # --- test set #2 (README.md:294-319; run with
    #     --images-dir /root/reference/test_images_ex) ---
    "DS+DD": dict(method=2, mweight=0.5, deoldify_p=(1, 30, 1.0, 0.0),
                  ddcolor_p=(1, 24, 1.0, 0.0, True)),
    "DA+DDs": dict(method=2, mweight=0.5, deoldify_p=(2, 30, 1.0, 0.0),
                   ddcolor_p=(0, 24, 1.0, 0.0, True)),
    "DA+DD": dict(method=2, mweight=0.5, deoldify_p=(2, 30, 1.0, 0.0),
                  ddcolor_p=(1, 24, 1.0, 0.0, True)),
    "DDs": dict(method=1, ddcolor_p=(0, 24, 1.0, 0.0, True)),
    "DA": dict(method=0, deoldify_p=(2, 30, 1.0, 0.0)),
    "zhang": None,  # handled via HAVC_main ColorModel (eccv16)
}

# Published reference averages per config (README.md:268, :319) — echoed
# into the JSON summary so the emitted table is directly comparable.
REFERENCE_AVERAGES = {
    "D+D": 8.3, "DD": 8.5, "DS": 9.1, "DV": 9.5,
    "DS+DD": 8.0, "DA+DDs": 8.0, "DA+DD": 8.1, "DDs": 8.9, "DA": 9.4,
}


def _load_images(images_dir, max_side, count=None):
    import cv2

    names = sorted(
        f for f in os.listdir(images_dir)
        if f.lower().endswith((".jpg", ".png")) and "comparison" not in f.lower()
    )
    if count:
        names = names[:count]
    out = []
    for name in names:
        bgr = cv2.imread(os.path.join(images_dir, name))
        if bgr is None:
            continue
        rgb = cv2.cvtColor(bgr, cv2.COLOR_BGR2RGB)
        h, w = rgb.shape[:2]
        scale = max_side / max(h, w)
        if scale < 1:
            rgb = cv2.resize(rgb, (int(w * scale), int(h * scale)),
                             interpolation=cv2.INTER_AREA)
        out.append((name, rgb))
    return out


def _bw_from_color(rgb_u8):
    """B&W input the reference methodology colorizes: the luma of the
    ground-truth photo, replicated to RGB (the HAVC pipeline's B&W clips
    are gray RGB24)."""
    import cv2

    gray = cv2.cvtColor(rgb_u8, cv2.COLOR_RGB2GRAY)
    return np.repeat(gray[..., None], 3, axis=-1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--images-dir", default="/root/reference/test_images")
    ap.add_argument("--configs", nargs="+", default=["D+D", "DD", "DS", "DV"],
                    choices=sorted(CONFIGS))
    ap.add_argument("--weights-dir", default=None)
    ap.add_argument("--src-dir", default=None,
                    help="directory with the RAW downloaded .pth "
                         "checkpoints; they are converted in place "
                         "(models.convert.convert_all) into "
                         "<src-dir>/converted and used as --weights-dir — "
                         "one command from downloads to the dE table")
    ap.add_argument("--max-side", type=int, default=432,
                    help="downscale bound for the ground-truth images")
    ap.add_argument("--count", type=int, default=None,
                    help="evaluate only the first N images")
    ap.add_argument("--allow-random", action="store_true",
                    help="run with randomly initialized engines (harness "
                         "demo only — the dE numbers are meaningless)")
    args = ap.parse_args()

    import havc_tpu
    from havc_tpu import metrics
    from havc_tpu.clip import Clip

    if args.src_dir:
        from havc_tpu.models.convert import convert_all

        out = os.path.join(args.src_dir, "converted")
        report = convert_all(args.src_dir, out)
        for name, status in report.items():
            print(f"convert: {name}: {status}")
        args.weights_dir = out

    if args.weights_dir:
        havc_tpu.set_weights_dir(args.weights_dir)
    elif not args.allow_random:
        ap.error("no --weights-dir given; pass --allow-random to run the "
                 "harness with random engine weights (demo only)")

    images = _load_images(args.images_dir, args.max_side, args.count)
    if not images:
        ap.error(f"no test images found under {args.images_dir}")

    header = "| Test # | " + " | ".join(args.configs) + " |"
    rows = []
    per_config = {c: [] for c in args.configs}
    for name, truth in images:
        bw = _bw_from_color(truth).astype(np.float32) / 255.0
        clip = Clip(bw[None])
        cells = []
        for cfg_name in args.configs:
            cfg = CONFIGS[cfg_name]
            if cfg is None:
                colored = havc_tpu.HAVC_main(
                    clip, Preset="medium", ColorModel="zhang(eccv16)",
                    EnableDeepEx=False,
                )
            else:
                colored = havc_tpu.HAVC_colorizer(clip, **cfg)
            out = np.asarray(colored.frames[0])
            de = float(
                metrics.dE2000(out, truth.astype(np.float32) / 255.0).mean()
            )
            per_config[cfg_name].append(de)
            cells.append(f"{de:.1f}")
        rows.append(f"| {name} | " + " | ".join(cells) + " |")

    print(header)
    print("|" + "---|" * (len(args.configs) + 1))
    for row in rows:
        print(row)
    avgs = {c: round(float(np.mean(v)), 2) for c, v in per_config.items()}
    print("| **Avg(dE)** | "
          + " | ".join(f"**{avgs[c]:.1f}**" for c in args.configs) + " |")
    print(json.dumps({
        "metric": "ciede2000_vs_ground_truth",
        "images": len(images),
        "averages": avgs,
        "weights": "converted" if args.weights_dir else "RANDOM (demo)",
        "reference_averages": {
            c: REFERENCE_AVERAGES[c] for c in args.configs
            if c in REFERENCE_AVERAGES
        },
    }))


if __name__ == "__main__":
    main()
