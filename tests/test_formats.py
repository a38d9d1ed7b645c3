"""Output format restore: matrix/range/dither (havc_utils.py:167-237
equivalent encode path)."""
import numpy as np
import pytest

import jax.numpy as jnp

import cv2

from havc_tpu.io import formats as F


def _smooth(t=1, h=64, w=64, seed=0):
    rng = np.random.default_rng(seed)
    yy = np.linspace(0, 1, h)[None, :, None, None]
    xx = np.linspace(0, 1, w)[None, None, :, None]
    base = 0.15 + 0.55 * (0.6 * yy + 0.4 * xx)
    col = rng.random((t, 1, 1, 3)) * 0.3
    return np.clip(base + col, 0, 1).astype(np.float32)


def test_y_matches_cv2_bt601():
    rgb = _smooth()
    u8 = (rgb[0] * 255).round().astype(np.uint8)
    ycc = cv2.cvtColor(u8, cv2.COLOR_RGB2YCrCb)  # BT.601 full-range
    y, u, v = F.rgb_to_yuv_planes(jnp.asarray(rgb), "601", range_full=True)
    assert np.abs(np.asarray(y)[0] - ycc[..., 0].astype(np.float32)).max() < 1.0
    assert np.abs(np.asarray(v)[0] - ycc[..., 1].astype(np.float32)).max() < 1.0
    assert np.abs(np.asarray(u)[0] - ycc[..., 2].astype(np.float32)).max() < 1.0


def test_limited_range_bounds():
    y, u, v = F.restore_format_yuv420p8(_smooth(2), "709", range_full=False)
    assert y.min() >= 16 and y.max() <= 235
    assert u.min() >= 16 and u.max() <= 240
    assert y.shape == (2, 64, 64) and u.shape == (2, 32, 32)


@pytest.mark.parametrize("matrix", ["601", "709", "2020"])
@pytest.mark.parametrize("range_full", [False, True])
def test_roundtrip_smooth(matrix, range_full):
    rgb = _smooth(2)
    y, u, v = F.restore_format_yuv420p8(rgb, matrix, range_full)
    back = np.asarray(F.yuv420p8_to_rgb(y, u, v, matrix, range_full))
    err = np.abs(back - rgb).mean()
    assert err < 0.01, (matrix, range_full, err)


def test_error_diffusion_preserves_mean():
    """The point of the dither: sub-code gradients keep their average
    instead of banding to one code."""
    grad = np.tile(
        np.linspace(0.3, 0.3008, 64, dtype=np.float32)[None, :, None, None],
        (1, 1, 64, 3),
    )
    y_true = np.asarray(F.rgb_to_yuv_planes(jnp.asarray(grad))[0])
    y_d, _, _ = F.restore_format_yuv420p8(grad, dither="error_diffusion")
    y_r, _, _ = F.restore_format_yuv420p8(grad, dither="none")
    err_d = abs(float(y_d.mean()) - float(y_true.mean()))
    err_r = abs(float(y_r.mean()) - float(y_true.mean()))
    assert err_d < 0.02
    assert err_d < err_r / 5


def test_native_dither_matches_reference_fs():
    """Native FS vs a direct numpy transcription of Floyd-Steinberg."""
    rng = np.random.default_rng(1)
    codes = (rng.random((1, 8, 9), dtype=np.float32) * 40 + 100).astype(np.float32)
    got = F._fs_dither(codes, 0.0, 255.0)

    src = codes[0]
    h, w = src.shape
    err_cur = np.zeros(w + 2, np.float32)
    err_next = np.zeros(w + 2, np.float32)
    ref = np.zeros((h, w), np.uint8)
    for y in range(h):
        err_next[:] = 0
        for x in range(w):
            v = src[y, x] + err_cur[x + 1]
            code = np.uint8(np.clip(v + 0.5, 0, 255))
            ref[y, x] = code
            e = v - float(code)
            err_cur[x + 2] += e * 7 / 16
            err_next[x] += e * 3 / 16
            err_next[x + 1] += e * 5 / 16
            err_next[x + 2] += e * 1 / 16
        err_cur, err_next = err_next, err_cur
    # identical when the native lib is present; rounding fallback differs
    from havc_tpu.io.native import load_native, NativeUnavailable

    try:
        load_native()
    except NativeUnavailable:
        pytest.skip("native toolchain unavailable")
    np.testing.assert_array_equal(got[0], ref)


def test_y4m_write_native_read_roundtrip(tmp_path):
    """write_video_y4m (restore_format path) -> native Y4M reader: frames
    survive the matrix/range/dither encode within 8-bit 4:2:0 bounds."""
    from havc_tpu.clip import from_frames
    from havc_tpu.io import write_video_y4m
    from havc_tpu.io.native import NativeUnavailable, Y4MStream

    rgb = _smooth(3, 48, 64)
    clip = from_frames(rgb)
    path = str(tmp_path / "t.y4m")
    # BT.601 limited: the native reader decodes 601 full-range — use the
    # writer's 601/full mode so the roundtrip is self-consistent
    write_video_y4m(clip, path, matrix="601", range_full=True)
    try:
        frames = list(Y4MStream(path))
    except NativeUnavailable:
        pytest.skip("native toolchain unavailable")
    assert len(frames) == 3
    got = np.stack(frames)
    assert got.shape == rgb.shape
    err = np.abs(got - rgb).mean()
    assert err < 0.02, err


@pytest.mark.parametrize("bits,subsampling", [
    (8, "420"), (10, "420"), (10, "422"), (16, "444"), (12, "420"),
])
def test_highdepth_roundtrip(bits, subsampling):
    """restore_format at the clip's ORIGINAL depth/subsampling
    (havc_utils.py:167-237 restores 10/16-bit and 4:2:2/4:4:4 too):
    quantize-dither then invert; error bounded by the code-value step."""
    rgb = _smooth(t=2)
    y, u, v = F.restore_format_yuv(
        rgb, matrix="709", range_full=False, bits=bits,
        subsampling=subsampling,
    )
    dtype = np.uint8 if bits <= 8 else np.uint16
    assert y.dtype == dtype and u.dtype == dtype
    th, tw = rgb.shape[1:3]
    exp_c = {
        "420": (th // 2, tw // 2), "422": (th, tw // 2), "444": (th, tw)
    }[subsampling]
    assert u.shape[1:] == exp_c
    # limited-range bounds at this depth
    s = 1 << (bits - 8)
    assert y.min() >= 16 * s and y.max() <= 235 * s
    assert u.min() >= 16 * s and u.max() <= 240 * s

    back = np.asarray(F.yuv_planes_to_rgb(
        y, u, v, matrix="709", range_full=False, bits=bits
    ))
    # smooth content: error ~ quantization step + chroma subsample blur
    step = 1.0 / (219 * s)
    tol = max(4.0 * step, 0.02 if subsampling != "444" else 4.0 * step)
    assert np.abs(back - rgb).mean() < tol


def test_higher_depth_is_more_faithful():
    """10-bit restore must quantize measurably finer than 8-bit (the
    reason full-format restore matters for film sources)."""
    rgb = _smooth(t=1, h=96, w=96, seed=3)
    outs = {}
    for bits in (8, 16):
        y, u, v = F.restore_format_yuv(
            rgb, bits=bits, subsampling="444", dither="none"
        )
        back = np.asarray(F.yuv_planes_to_rgb(y, u, v, bits=bits))
        outs[bits] = np.abs(back - rgb).mean()
    assert outs[16] < outs[8] / 16


def test_u16_dither_preserves_mean():
    """The 16-bit-container FS dither diffuses quantization error (mean
    preserved well below the rounding step) at 10-bit code scale."""
    rng = np.random.default_rng(0)
    x = (rng.random((1, 64, 64), np.float32) * 0.002 + 0.5) * 876 + 64
    out = F._fs_dither(x, 64.0, 940.0, bits=10)
    assert out.dtype == np.uint16
    assert abs(float(out.mean()) - float(x.mean())) < 0.05
