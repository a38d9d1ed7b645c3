"""Resize (MXU-matmul resampler) vs cv2 oracles and invariants."""
import cv2
import numpy as np
import pytest

from havc_tpu.ops.resize import resize, resize_kernel_matrix


def test_rows_normalized():
    for k in ("bilinear", "bicubic", "lanczos", "spline36", "spline64"):
        m = resize_kernel_matrix(97, 41, k)
        assert np.abs(m.sum(axis=1) - 1.0).max() < 1e-5
        m = resize_kernel_matrix(41, 97, k)
        assert np.abs(m.sum(axis=1) - 1.0).max() < 1e-5


def test_identity():
    img = np.random.default_rng(0).random((1, 32, 48, 3), dtype=np.float32)
    out = np.asarray(resize(img, 32, 48, "spline64"))
    assert np.abs(out - img).max() < 1e-6


def test_constant_preserved():
    img = np.full((1, 40, 56, 3), 0.37, dtype=np.float32)
    for k in ("bilinear", "bicubic", "lanczos", "spline36", "spline64"):
        out = np.asarray(resize(img, 23, 91, k))
        assert np.abs(out - 0.37).max() < 1e-5, k


def test_bilinear_upscale_matches_cv2():
    rng = np.random.default_rng(1)
    img = rng.random((24, 32, 3), dtype=np.float32)
    out = np.asarray(resize(img, 48, 64, "bilinear"))
    ref = cv2.resize(img, (64, 48), interpolation=cv2.INTER_LINEAR)
    assert np.abs(out - ref).max() < 1e-5


def test_bicubic_upscale_matches_pil():
    # our bicubic is Catmull-Rom (b=0, c=0.5), the VapourSynth default;
    # PIL BICUBIC uses the same a=-0.5 kernel (cv2 INTER_CUBIC is a=-0.75)
    from PIL import Image

    rng = np.random.default_rng(2)
    img = (rng.random((24, 32, 3)) * 255).astype(np.uint8)
    out = np.asarray(resize(img.astype(np.float32) / 255.0, 48, 64, "bicubic"))
    ref = (
        np.asarray(
            Image.fromarray(img).resize((64, 48), Image.Resampling.BICUBIC)
        ).astype(np.float32)
        / 255.0
    )
    # PIL works in uint8 with intermediate clipping of the negative lobes,
    # so only a loose aggregate match is meaningful
    assert np.abs(out[2:-2, 2:-2] - ref[2:-2, 2:-2]).mean() < 0.005


def test_bicubic_impulse_response_analytic():
    # 2x upscale samples the kernel at +/-0.25, +/-0.75, +/-1.25, +/-1.75;
    # Catmull-Rom (b=0, c=0.5) values computed analytically
    def cr(x):
        x = abs(x)
        if x < 1:
            return 1.5 * x**3 - 2.5 * x**2 + 1
        if x < 2:
            return -0.5 * x**3 + 2.5 * x**2 - 4 * x + 2
        return 0.0

    x = np.zeros((1, 8, 1), np.float32)
    x[0, 3, 0] = 1.0
    up = np.asarray(resize(x, 1, 16, "bicubic"))[0, :, 0]
    expect = np.zeros(16)
    for o in range(16):
        src = (o + 0.5) * 0.5 - 0.5
        expect[o] = cr(src - 3)
    assert np.abs(up - expect).max() < 1e-5


def test_downscale_area_close_on_smooth_signal():
    # on a smooth (low-frequency) image, stretched-kernel antialiased
    # downscale and cv2 INTER_AREA must agree closely (they only differ in
    # how they weight high frequencies)
    yy, xx = np.mgrid[0:128, 0:128].astype(np.float32) / 128.0
    img = np.stack([0.5 + 0.4 * np.sin(3 * xx), yy * 0.8, xx * yy], axis=-1)
    out = np.asarray(resize(img, 32, 32, "bilinear"))
    ref = cv2.resize(img, (32, 32), interpolation=cv2.INTER_AREA)
    assert np.abs(out - ref).max() < 0.005


def test_batched_equivalence():
    rng = np.random.default_rng(4)
    batch = rng.random((3, 40, 40, 3), dtype=np.float32)
    out_b = np.asarray(resize(batch, 64, 24, "spline36"))
    for i in range(3):
        out_i = np.asarray(resize(batch[i], 64, 24, "spline36"))
        assert np.abs(out_b[i] - out_i).max() < 1e-6


def test_spline64_smoothness():
    # spline64 on a linear ramp must reproduce the ramp (cubic reproduces
    # polynomials up to degree 1 exactly after row normalization)
    x = np.linspace(0, 1, 64, dtype=np.float32)
    img = np.tile(x[None, :, None], (32, 1, 3))
    out = np.asarray(resize(img, 32, 128, "spline64"))
    expect = np.linspace(0, 1, 128)
    # interior only (border clamp distorts the extremes)
    assert np.abs(out[16, 8:-8, 0] - np.interp(
        (np.arange(128) + 0.5) * 64 / 128 - 0.5, np.arange(64), x)[8:-8]).max() < 5e-3
