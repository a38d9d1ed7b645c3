"""Golden-frame gate for the D+D merge config (BASELINE config #1:
DeOldify + DDColor combined) through the FULL classic pipeline.

Reference flow transcribed from HAVC_colorizer (__init__.py:2436-2527):
square Spline64 resize to frame_size = max(rf)*16, DeOldify driver
(filters.py float chain) and DDColor driver (wheel pipeline) on the square
clip, vs_combine_models method 2 SimpleMerge at mweight
(image_weighted_merge, imfilters.py:113-124), then _clip_chroma_resize =
Spline64 upscale + vs_recover_clip_luma (original luma re-married).

The reference side's square/up resizes use the INDEPENDENT resampling
oracle (tests/_resample_oracle.py: spline kernel derived from cardinal
natural splines, scalar gather loop — round-4 verdict item 4 closed; the
repo kernel is additionally pinned against the same oracle across
geometries in test_resample_oracle.py), so the gate covers the resampling
convention as well as the model drivers, gray conventions, merge math and
luma recovery.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(__file__))

import numpy as np
import pytest

import jax

import cv2

torch = pytest.importorskip("torch")
import torch.nn.functional as TF

from test_golden_deoldify import (
    IMAGENET_MEAN,
    IMAGENET_STD,
    _load_image,
    wide_model,  # noqa: F401 fixture
)
from test_golden_ddcolor import _lab2rgb, _reference_driver as _dd_driver
from test_ref_parity_ddcolor import converted, oracle  # noqa: F401 fixtures
from havc_tpu import engines, metrics
from havc_tpu.models import convert

RF = 10  # both models at rf 10 -> frame_size 160, DDColor input 160


def _deoldify_float_square(tm, sq):
    """ColorizerFilter float chain on an ALREADY-square float image (the
    inner scale-to-square is a no-op when the clip was pre-squared by
    HAVC_colorizer): LA grayscale, imagenet norm, model, denorm clamp,
    UV copy onto the square image's luma."""
    x = torch.from_numpy(sq.transpose(2, 0, 1).copy())[None]
    y = (0.299 * x[:, 0] + 0.587 * x[:, 1] + 0.114 * x[:, 2])[:, None]
    gray = y.repeat(1, 3, 1, 1)
    xn = (gray - IMAGENET_MEAN) / IMAGENET_STD
    with torch.no_grad():
        out = tm(xn)
    out = (out * IMAGENET_STD + IMAGENET_MEAN).clamp(0, 1)
    up = out[0].numpy().transpose(1, 2, 0)

    def yuv(rgb):
        yy = 0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]
        u = 0.492 * (rgb[..., 2] - yy) + 0.5
        v = 0.877 * (rgb[..., 0] - yy) + 0.5
        return yy, u, v

    def join(y_o, u_c, v_c):
        r = y_o + (v_c - 0.5) / 0.877
        b = y_o + (u_c - 0.5) / 0.492
        g = (y_o - 0.299 * r - 0.114 * b) / 0.587
        return np.clip(np.stack([r, g, b], axis=-1), 0, 1)

    y_o, _, _ = yuv(sq)
    _, u_c, v_c = yuv(up)
    return join(y_o, u_c, v_c)


def _recover_luma(orig, colored):
    """vs_recover_clip_luma: luma from orig, chroma from colored (float
    YUV 0.299/0.587/0.114, 0.492/0.877)."""
    def yuv(rgb):
        yy = 0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]
        u = 0.492 * (rgb[..., 2] - yy) + 0.5
        v = 0.877 * (rgb[..., 0] - yy) + 0.5
        return yy, u, v

    y_o, _, _ = yuv(orig)
    _, u_c, v_c = yuv(colored)
    r = y_o + (v_c - 0.5) / 0.877
    b = y_o + (u_c - 0.5) / 0.492
    g = (y_o - 0.299 * r - 0.114 * b) / 0.587
    return np.clip(np.stack([r, g, b], axis=-1), 0, 1)


@pytest.mark.slow
def test_dd_merge_golden_de2000(tmp_path, wide_model, oracle, converted):  # noqa: F811
    import json

    from _ref_loader import state_dict_numpy
    from test_ref_parity_deoldify import _convert

    # registry: both engines from the same seeded oracles
    params = _convert(wide_model, convert.deoldify_wide_key_map())
    convert.save_params_npz(params, tmp_path / "deoldify_video.npz")
    sd = state_dict_numpy(oracle)
    sd = convert.fold_spectral_norm(sd)
    sd = convert.fold_weight_norm(sd)
    cfg = convert.ddcolor_config_from_state_dict(sd)
    tree = dict(converted)
    tree["__config__"] = {
        "json": np.frombuffer(json.dumps(cfg).encode(), np.uint8).copy()
    }
    convert.save_params_npz(tree, tmp_path / "ddcolor_artistic.npz")

    engines.set_weights_dir(str(tmp_path))
    try:
        from _resample_oracle import oracle_resize
        from havc_tpu import api
        from havc_tpu.clip import from_frames

        results = {}
        for img_name in ["Image_01_test.jpg", "Image_07_test.jpg",
                         "Image_13_test.jpg", "Image_19_test.jpg"]:
            rgb_u8 = _load_image(
                f"/root/reference/test_images/{img_name}", max_side=224
            )
            rgb = (rgb_u8 / 255.0).astype(np.float32)
            h, w = rgb.shape[:2]
            frame_size = min(RF * 16, w)

            # --- reference transcription (oracle-side resampling) -------
            sq = oracle_resize(
                rgb[None], frame_size, frame_size, "spline64"
            )[0].clip(0, 1).astype(np.float32)
            do_out = _deoldify_float_square(wide_model, sq)
            dd_out = _dd_driver(oracle, sq, (RF // 2) * 32)
            merged = 0.5 * do_out + 0.5 * dd_out  # SimpleMerge mweight=0.5
            up = oracle_resize(
                merged[None].astype(np.float32), h, w, "spline64"
            )[0].clip(0, 1)
            ref_out = _recover_luma(rgb, up)

            # --- repo pipeline ------------------------------------------
            clip = from_frames(rgb[None])
            with jax.default_matmul_precision("highest"):
                got_clip = api.HAVC_colorizer(
                    clip, method=2, mweight=0.5,
                    deoldify_p=(0, RF, 1.0, 0.0),
                    ddcolor_p=(1, RF, 1.0, 0.0, True),
                    sc_threshold=0.0, sc_min_freq=0,
                )
            got = np.asarray(got_clip.frames)[0]

            de = metrics.dE2000(
                (ref_out * 255).astype(np.uint8),
                (got * 255).astype(np.uint8),
            )
            results[img_name] = (
                float(np.mean(de)), float(np.percentile(de, 99))
            )
        for name, (mean_de, p99) in results.items():
            assert mean_de <= 1.0, (
                f"{name}: mean dE2000 {mean_de:.3f} > 1.0 ({results})"
            )
            assert p99 <= 5.0, f"{name}: p99 dE2000 {p99:.3f} > 5.0"
    finally:
        engines.set_weights_dir(None)
