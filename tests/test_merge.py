"""Merge-method kernels: semantics oracles for the 8 combine methods."""
import numpy as np
import pytest

from havc_tpu.ops import colorspace as cs
from havc_tpu.ops import merge as mg


def solid(r, g, b, shape=(1, 16, 16, 3)):
    img = np.zeros(shape, np.float32)
    img[..., 0], img[..., 1], img[..., 2] = r, g, b
    return img


def test_simple_merge_exact(rgb_batch):
    a, b = rgb_batch[:1], rgb_batch[1:]
    out = np.asarray(mg.simple_merge(a, b, 0.3))
    assert np.abs(out - (0.7 * a + 0.3 * b)).max() < 1e-6


def test_luma_masked_merge_binary():
    dark = solid(0.1, 0.1, 0.1)
    bright_half = np.concatenate(
        [solid(0.9, 0.9, 0.9, (1, 16, 8, 3)), solid(0.2, 0.2, 0.2, (1, 16, 8, 3))],
        axis=2,
    )
    out = np.asarray(mg.luma_masked_merge(dark, bright_half, 0.5))
    assert np.abs(out[0, :, :8] - 0.9).max() < 1e-5  # bright -> white img
    assert np.abs(out[0, :, 8:] - 0.1).max() < 1e-5  # dark -> dark img


def test_w_luma_masked_merge_ramp():
    dark = solid(0.0, 0.0, 0.0)
    y = np.linspace(0, 1, 16, dtype=np.float32)
    white = np.tile(y[None, None, :, None], (1, 16, 1, 3))
    out = np.asarray(mg.w_luma_masked_merge(dark, white, 0.3, 0.9))
    # below dark_luma the output is the dark image
    assert np.abs(out[0, :, 0]).max() < 1e-5
    # above white_luma the output is the white image
    assert np.abs(out[0, :, -1] - white[0, :, -1]).max() < 1e-4


def test_adaptive_luma_merge_dark_decay():
    a = solid(0.2, 0.3, 0.4)
    b_dark = solid(0.1, 0.1, 0.12)  # mean luma ~0.10 < 0.6
    out = np.asarray(mg.adaptive_luma_merge(a, b_dark, 0.6, 1.0, 0.5, 0.15))
    # weight should collapse to ~max(0.5 * 0.1/0.6, 0.15) = 0.15
    expect = 0.85 * a + 0.15 * b_dark
    assert np.abs(out - expect).max() < 0.02


def test_adaptive_luma_merge_bright_passthrough():
    a = solid(0.2, 0.3, 0.4)
    b = solid(0.8, 0.8, 0.85)
    out = np.asarray(mg.adaptive_luma_merge(a, b, 0.6, 1.0, 0.5, 0.15))
    expect = 0.5 * a + 0.5 * b
    assert np.abs(out - expect).max() < 1e-5


def test_chroma_limit_clamps():
    stable = solid(0.5, 0.5, 0.5)  # neutral chroma (u=v=0.5)
    wild = solid(0.9, 0.1, 0.1)  # strong chroma
    out = np.asarray(mg.chroma_limit(stable, wild, alpha=0.1))
    yuv = np.asarray(cs.rgb_to_yuv(out))
    # chroma of output within +/-10% of stable's (0.5 +/- 0.05)
    assert np.abs(yuv[..., 1] - 0.5).max() < 0.051
    assert np.abs(yuv[..., 2] - 0.5).max() < 0.051
    # luma comes from stable
    assert np.abs(yuv[..., 0] - 0.5).max() < 0.01


def test_chroma_bound_adaptive_within_tolerance():
    rng = np.random.default_rng(5)
    a = rng.random((1, 32, 32, 3), dtype=np.float32)
    b = rng.random((1, 32, 32, 3), dtype=np.float32)
    out = np.asarray(
        mg.chroma_bound_adaptive_merge(a, b, red_fix=False, b_weight=1.0)
    )
    yuv_a = np.asarray(cs.rgb_to_yuv(a))
    yuv_o = np.asarray(cs.rgb_to_yuv(out))
    max_tol = (14 + 18) / 255.0
    # only check pixels that stayed in gamut (clipping legitimately breaks
    # the chroma bound, same as the reference's uint8 saturation does)
    in_gamut = (out > 1e-4).all(-1) & (out < 1 - 1e-4).all(-1)
    du = np.abs(yuv_o[..., 1] - yuv_a[..., 1])[in_gamut]
    dv = np.abs(yuv_o[..., 2] - yuv_a[..., 2])[in_gamut]
    assert in_gamut.mean() > 0.3  # the check is meaningful
    assert du.max() < max_tol + 1e-3
    assert dv.max() < max_tol + 1e-3


@pytest.mark.parametrize("method", [2, 3, 4, 5, 6, 7])
def test_combine_models_all_methods_run(method, rgb_batch):
    a, b = rgb_batch[:1], rgb_batch[1:]
    out = np.asarray(mg.combine_models(a, b, method=method, b_weight=0.5))
    assert out.shape == a.shape
    assert np.isfinite(out).all()
    assert out.min() > -0.02 and out.max() < 1.02


def test_combine_models_invert():
    a, b = solid(0.1, 0.2, 0.3), solid(0.7, 0.6, 0.5)
    out1 = np.asarray(mg.combine_models(a, b, method=2, b_weight=0.3))
    out2 = np.asarray(
        mg.combine_models(b, a, method=2, b_weight=0.3, invert_clips=True)
    )
    assert np.abs(out1 - out2).max() < 1e-6


def test_combine_models_none_passthrough(rgb_batch):
    a = rgb_batch[:1]
    out = np.asarray(mg.combine_models(a, None, method=2))
    assert np.abs(out - a).max() < 1e-6
    out = np.asarray(mg.combine_models(None, a, method=2))
    assert np.abs(out - a).max() < 1e-6


def test_dark_red_fix_desaturates_dark_frames():
    dark_red = solid(0.08, 0.02, 0.02)  # mean luma ~0.04 < 0.1
    out = np.asarray(mg._dark_red_fix(dark_red))
    s_in = np.asarray(cs.rgb_to_hsv(dark_red))[..., 1]
    s_out = np.asarray(cs.rgb_to_hsv(out))[..., 1]
    assert s_out.mean() < s_in.mean()  # saturation reduced


def test_jit_batch_consistency(rgb_batch):
    import jax

    a = np.stack([rgb_batch[0], rgb_batch[0]])
    b = np.stack([rgb_batch[1], rgb_batch[1]])
    fn = jax.jit(lambda a, b: mg.combine_models(a, b, method=3))
    out = np.asarray(fn(a, b))
    assert np.abs(out[0] - out[1]).max() < 1e-6
