"""PIPELINE-LEVEL golden gate (round-4 verdict item 5): the FULL classic
``HAVC_main`` chain — work-res colorize (Zhang eccv16 with the ColorTune
tweak chain) -> chroma restore -> stabilizer chain (dark tweak, chroma
smoothing, temporal chroma stabilizer) -> chroma restore — against a host
oracle that drives the REFERENCE'S OWN per-frame filter code, on real
footage.

Oracle composition (every stage cited):

* chain order / knob resolution transcribed from HAVC_main_presets ->
  HAVC_main_colorizer classic branch (__init__.py:469-912: Preset='medium'
  -> speed_id 4, rf 24/24; ColorModel='Zhang(eccv16)' -> dd_method=1,
  dd_model=3; ColorTune='Light' + ColorFix='Violet/Red' -> hue_range
  "300:360|0.7,0.1", dd_tweak=[True,False,False], stab_enabled=True) and
  HAVC_colorizer / HAVC_stabilizer (__init__.py:2436-2527, 2748-2873);
* the per-frame filters are the reference's own functions loaded live via
  _ref_loader: imfilters.luma_adjusted_levels / image_tweak /
  image_chroma_tweak / w_image_luma_merge / chroma_post_process and
  restcolor.adjust_hue_range / restore_color — NOT transcriptions;
* Zhang eccv16 runs the reference wheel flow at the driver's hardcoded
  256 (ModelColorization.colorize_frame, colorization/__init__.py:80-99)
  via the test_golden_zhang torch driver;
* square/up resizes use the independent spline oracle
  (tests/_resample_oracle.py), uint8-rounded between stages exactly like
  the reference's RGB24 ModifyFrame hops.

Documented oracle deviations (bounded, see assertions):

* the temporal average runs in float Rec709 YUV without the reference's
  YUV420P8 subsample + error-diffusion round-trips (quantization noise,
  sub-LSB per hop);
* vs_reduce_flicker (closed-source ReduceFlicker.dll, vsplugins.py:263)
  is omitted: it edits the work-res clip whose luma is discarded by the
  final chroma restore, so only its small chroma side effect is lost.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(__file__))

import numpy as np
import pytest

import jax

import cv2

torch = pytest.importorskip("torch")

from PIL import Image

from _ref_loader import load_ref_module
from _resample_oracle import oracle_resize
from test_golden_zhang import _reference_driver as _zhang_driver
from test_golden_zhang import torch_eccv16  # noqa: F401 fixture
from havc_tpu import engines, metrics
from havc_tpu.models import convert

T = 24
H, W = 80, 112
HUE_RANGE = "300:360|0.7,0.1"   # ColorTune='light' x ColorFix='violet/red'
STAB_P = (5, "A", 1, 15, 0.2, 0.8)  # medium-preset pack (__init__.py:906)


def _u8(x01):
    return np.uint8(np.clip(np.round(np.asarray(x01) * 255.0), 0, 255))


def _o_resize_u8(frames_u8, h, w):
    out = oracle_resize(frames_u8.astype(np.float64) / 255.0, h, w,
                        "spline64")
    return _u8(out)


def _load_footage():
    cap = cv2.VideoCapture("/root/reference/samples/sample_bw.mp4")
    frames = []
    while len(frames) < T:
        ok, bgr = cap.read()
        assert ok, "sample footage too short"
        rgb = cv2.cvtColor(bgr, cv2.COLOR_BGR2RGB)
        frames.append(cv2.resize(rgb, (W, H), interpolation=cv2.INTER_AREA))
    cap.release()
    return np.stack(frames)  # (T, H, W, 3) uint8


def _oracle_colorizer(frames_u8, tm, imf, rc):
    """HAVC_colorizer, method=1 / zhang eccv16 branch (__init__.py:
    2436-2527 + vsmodels.vs_sc_ddcolor:290-370): square spline64 ->
    luma-constrained tweak -> eccv16 at 256 -> hue-range adjust ->
    luma recover -> chroma-resize restore."""
    fsize = min(24 * 16, W)
    sq = _o_resize_u8(frames_u8, fsize, fsize)
    colored = []
    for t in range(T):
        img = Image.fromarray(sq[t])
        # DEF_TWEAK_p = [0.0, 1.0, 2.5, True, 0.3, 0.6, 1.5, 0.5]
        # (constants.py:23): bright=0/cont=1 -> vs_sc_tweak no-op; the
        # constrained-luma step runs luma_adjusted_levels
        img = imf.luma_adjusted_levels(
            img, luma_min=0.3, gamma=2.5, gamma_luma_min=0.6,
            gamma_alpha=1.5, gamma_min=0.5,
        )
        col = _u8(_zhang_driver(tm, np.asarray(img), f_size=256))
        col = rc.adjust_hue_range(Image.fromarray(col),
                                  hue_adjust=HUE_RANGE)
        # vs_recover_clip_luma(clip, clipb_rgb): luma from the UNtweaked
        # square clip (vsmodels.py:368-370)
        col = imf.chroma_post_process(col, Image.fromarray(sq[t]))
        colored.append(np.asarray(col))
    colored = np.stack(colored)
    # _clip_chroma_resize(clip_orig, clip_colored) (__init__.py:2521)
    up = _o_resize_u8(colored, H, W)
    return np.stack([
        np.asarray(imf.chroma_post_process(
            Image.fromarray(up[t]), Image.fromarray(frames_u8[t])
        )) for t in range(T)
    ])


def _rec709_yuv(rgb_u8f):
    """Full-range Rec709 YUV in 0..255 floats (the stabilizer's working
    space: resize.Bicubic(format=YUV..., matrix_s='709', range_s='full'))."""
    r, g, b = rgb_u8f[..., 0], rgb_u8f[..., 1], rgb_u8f[..., 2]
    y = 0.2126 * r + 0.7152 * g + 0.0722 * b
    u = (b - y) * (0.5 / (1.0 - 0.0722)) + 128.0
    v = (r - y) * (0.5 / (1.0 - 0.2126)) + 128.0
    return y, u, v


def _rec709_to_rgb(y, u, v):
    r = y + (v - 128.0) / (0.5 / (1.0 - 0.2126))
    b = y + (u - 128.0) / (0.5 / (1.0 - 0.0722))
    g = (y - 0.2126 * r - 0.0722 * b) / 0.7152
    return np.clip(np.stack([r, g, b], axis=-1), 0, 255)


def _oracle_stabilizer(frames_u8, imf, rc):
    """HAVC_stabilizer, medium-preset pack (__init__.py:903-906 +
    2748-2873): square resize at auto render_factor 16 -> dark tweak ->
    chroma-bright tweak -> temporal chroma stabilizer (algo 0:
    _average_clips_ex, vsfilters.py:216-242 with the
    vs_sc_recover_clip_color n<15 warm-up + standard-luma weight clamp,
    :305-356) -> chroma-resize restore."""
    fsize = min(16 * 16, W)
    sq = _o_resize_u8(frames_u8, fsize, fsize)
    x = []
    for t in range(T):
        img1 = Image.fromarray(sq[t])
        # vs_dark_tweak(0.2, 0.8) (vsfilters.py:605-662): d_thr=0.1,
        # d_white=0.2, d_sat=0.3, d_bright=-0.8
        img2 = imf.image_tweak(img1, bright=-0.8, sat=0.3, hue_range="none")
        img_m = imf.w_image_luma_merge(img2, img1, 0.1, 0.2)
        # vs_chroma_bright_tweak(0.3, 0.7, 0.9, -0.0)
        img3 = imf.image_chroma_tweak(img_m, bright=-0.0, sat=0.9,
                                      hue_adjust="none")
        img_m = imf.w_image_luma_merge(img3, img_m, 0.3, 0.7)
        x.append(np.asarray(img_m))
    x = np.stack(x).astype(np.float64)

    nframes, _, sat, tht, weight, tht_scen = STAB_P
    nh = (nframes - 1) // 2
    wlist = np.array([20, 20, 20, 20, 20], np.float64) / 100.0
    out = np.empty_like(x)
    for t in range(T):
        y_c, u_c, v_c = _rec709_yuv(x[t])
        acc_u, acc_v = wlist[nh] * u_c, wlist[nh] * v_c
        for k, off in enumerate(range(-nh, nh + 1)):
            if off == 0:
                continue
            j = min(max(t + off, 0), T - 1)
            if t < 15:
                nb = x[j]  # warm-up passthrough (vsfilters.py:338-339)
            else:
                y_mean = np.mean(cv2.cvtColor(
                    x[j].astype(np.uint8), cv2.COLOR_RGB2YUV)[..., 0]) / 255
                w_eff = weight if 0.22 <= round(y_mean, 6) <= 0.78 \
                    else min(weight, -0.8)
                nb = np.asarray(rc.restore_color(
                    Image.fromarray(x[t].astype(np.uint8)),
                    Image.fromarray(x[j].astype(np.uint8)),
                    sat, tht, w_eff, tht_scen, "none", False,
                )).astype(np.float64)
            _, u_n, v_n = _rec709_yuv(nb)
            acc_u += wlist[k] * u_n
            acc_v += wlist[k] * v_n
        out[t] = _rec709_to_rgb(y_c, acc_u, acc_v)
    out = np.uint8(np.clip(np.round(out), 0, 255))

    up = _o_resize_u8(out, H, W)
    return np.stack([
        np.asarray(imf.chroma_post_process(
            Image.fromarray(up[t]), Image.fromarray(frames_u8[t])
        )) for t in range(T)
    ])


@pytest.mark.slow
def test_havc_main_pipeline_golden_de2000(tmp_path, torch_eccv16):  # noqa: F811
    from _ref_loader import state_dict_numpy

    imf = load_ref_module("vsdeoldify.vsslib.imfilters")
    rc = load_ref_module("vsdeoldify.vsslib.restcolor")

    sd = state_dict_numpy(torch_eccv16)
    params = convert.convert_params(sd, convert.eccv16_key_map())
    convert.save_params_npz(params, tmp_path / "zhang_eccv16.npz")

    frames_u8 = _load_footage()

    # --- reference-chain oracle --------------------------------------
    colored = _oracle_colorizer(frames_u8, torch_eccv16, imf, rc)
    ref_out = _oracle_stabilizer(colored, imf, rc)

    # --- repo: the PUBLIC HAVC_main ----------------------------------
    engines.set_weights_dir(str(tmp_path))
    try:
        from havc_tpu import api
        from havc_tpu.clip import from_frames

        clip = from_frames((frames_u8 / 255.0).astype(np.float32))
        with jax.default_matmul_precision("highest"):
            got_clip = api.HAVC_main(
                clip, Preset="medium", ColorModel="Zhang(eccv16)",
                ColorTune="Light", ColorFix="Violet/Red", ColorMap="None",
            )
        got = np.asarray(got_clip.frames)
    finally:
        engines.set_weights_dir(None)

    de_means = []
    for t in range(T):
        de = metrics.dE2000(ref_out[t], _u8(got[t]))
        de_means.append(float(np.mean(de)))
    worst = int(np.argmax(de_means))
    assert float(np.mean(de_means)) <= 1.0, (
        f"pipeline mean dE2000 {np.mean(de_means):.3f} > 1.0; per-frame "
        + " ".join(f"{t}:{m:.2f}" for t, m in enumerate(de_means))
    )
    assert max(de_means) <= 2.0, (
        f"frame {worst} mean dE2000 {de_means[worst]:.3f} > 2.0"
    )
