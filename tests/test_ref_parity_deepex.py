"""Deep-Exemplar conversion parity vs the reference torch modules
(NonlocalNet.py VGG19_pytorch/WarpNet, ColorVidNet.py, FrameColor.py)."""
import os
import sys

sys.path.insert(0, os.path.dirname(__file__))

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from _ref_loader import load_ref_module, state_dict_numpy
from havc_tpu.models import deepex as dx
from havc_tpu.models import convert


@pytest.fixture(scope="module")
def ref_nonlocal():
    return load_ref_module("vsdeoldify.deepex.models.NonlocalNet")


@pytest.fixture(scope="module")
def ref_colorvid():
    return load_ref_module("vsdeoldify.deepex.models.ColorVidNet")


def _nchw(a):
    return torch.from_numpy(np.transpose(a, (0, 3, 1, 2)).copy())


def _nhwc(t):
    return np.transpose(t.detach().numpy(), (0, 2, 3, 1))


def _rand(*shape, seed=0, scale=1.0):
    return (np.random.default_rng(seed).standard_normal(shape) * scale).astype(
        np.float32
    )


def _assert_close(ref, got, tol=3e-4, name=""):
    ref, got = np.asarray(ref), np.asarray(got)
    assert ref.shape == got.shape, f"{name}: {ref.shape} vs {got.shape}"
    scale = max(np.abs(ref).max(), 1e-3)
    err = np.abs(ref - got).max() / scale
    assert err < tol, f"{name}: rel err {err:.2e}"


def test_vgg19_parity(ref_nonlocal):
    torch.manual_seed(0)
    tm = ref_nonlocal.VGG19_pytorch().eval()
    sd = state_dict_numpy(tm)
    params = convert.convert_params(sd, convert.deepex_vgg19_key_map())

    x = np.abs(_rand(1, 64, 64, 3, seed=1, scale=0.2)) % 1.0
    with torch.no_grad():
        refs = tm(_nchw(x), ["r12", "r22", "r32", "r42", "r52"],
                  preprocess=True)

    fm = dx.VGG19Features()
    with jax.default_matmul_precision("highest"):
        got = fm.apply(params, jnp.asarray(x))
    for i, (r, g) in enumerate(zip(refs, got)):
        _assert_close(_nhwc(r), g, tol=1e-3, name=f"r{i}2")


def test_warpnet_parity(ref_nonlocal):
    torch.manual_seed(1)
    tm = ref_nonlocal.WarpNet(1).eval()
    sd = state_dict_numpy(tm)
    params = convert.convert_params(sd, convert.deepex_warpnet_key_map())

    H, W = 64, 96
    # VGG feature pyramid shapes (r22 at 1/2, r32 1/4, r42 1/8, r52 1/16)
    f2 = _rand(1, H // 2, W // 2, 128, seed=2, scale=0.5)
    f3 = _rand(1, H // 4, W // 4, 256, seed=3, scale=0.5)
    f4 = _rand(1, H // 8, W // 8, 512, seed=4, scale=0.5)
    f5 = _rand(1, H // 16, W // 16, 512, seed=5, scale=0.5)
    b_lab = _rand(1, H, W, 3, seed=6, scale=20.0)

    with torch.no_grad():
        y_t, sim_t = tm(
            _nchw(b_lab),
            _nchw(f2), _nchw(f3), _nchw(f4), _nchw(f5),
            _nchw(f2), _nchw(f3), _nchw(f4), _nchw(f5),
            temperature=0.01,
        )

    fm = dx.WarpNet()
    feats = (None, jnp.asarray(f2), jnp.asarray(f3), jnp.asarray(f4),
             jnp.asarray(f5))
    with jax.default_matmul_precision("highest"):
        y_j, sim_j = fm.apply(
            params, jnp.asarray(b_lab), feats, feats, 0.01
        )
    _assert_close(_nhwc(y_t), y_j, tol=2e-3, name="warped")
    _assert_close(_nhwc(sim_t), sim_j, tol=2e-3, name="similarity")


def test_colorvid_parity(ref_colorvid):
    torch.manual_seed(2)
    tm = ref_colorvid.ColorVidNet(7).eval()
    sd = state_dict_numpy(tm)
    params = convert.convert_params(sd, convert.deepex_colorvid_key_map())

    x = _rand(1, 64, 64, 7, seed=7, scale=10.0)
    with torch.no_grad():
        ref = tm(_nchw(x))

    fm = dx.ColorVidNet()
    with jax.default_matmul_precision("highest"):
        got = fm.apply(params, jnp.asarray(x))
    _assert_close(_nhwc(ref), got, tol=1e-3, name="ab")


def test_colorvid_checkpoint_coverage(ref_colorvid, ref_nonlocal):
    """Every WarpNet/ColorVidNet checkpoint tensor is consumed."""
    for tm, key_map in (
        (ref_colorvid.ColorVidNet(7), convert.deepex_colorvid_key_map()),
        (ref_nonlocal.WarpNet(1), convert.deepex_warpnet_key_map()),
        (ref_nonlocal.VGG19_pytorch(), convert.deepex_vgg19_key_map()),
    ):
        sd = state_dict_numpy(tm)
        convert.convert_params(sd, key_map, strict=True)
        consumed = set()
        for prefix, (path, kind) in key_map.items():
            for suffix in convert._KIND_RULES[kind]:
                consumed.add(f"{prefix}.{suffix}")
        # VGG19_pytorch defines conv5_3/5_4 but the engine only reads r52
        vgg_tail = {"conv5_3.weight", "conv5_3.bias",
                    "conv5_4.weight", "conv5_4.bias"}
        leftovers = [k for k in sd if k not in consumed and k not in vgg_tail]
        assert leftovers == [], leftovers


def test_frame_colorization_full_parity(ref_nonlocal, ref_colorvid):
    """End-to-end FrameColor.frame_colorization (FrameColor.py:41-67) vs the
    flax glue: VGG -> feature_normalize -> WarpNet -> centered-LAB
    ColorVidNet input."""
    fc = load_ref_module("vsdeoldify.deepex.models.FrameColor")
    torch.manual_seed(3)
    vgg_t = ref_nonlocal.VGG19_pytorch().eval()
    warp_t = ref_nonlocal.WarpNet(1).eval()
    color_t = ref_colorvid.ColorVidNet(7).eval()

    p_vgg = convert.convert_params(
        state_dict_numpy(vgg_t), convert.deepex_vgg19_key_map())
    p_warp = convert.convert_params(
        state_dict_numpy(warp_t), convert.deepex_warpnet_key_map())
    p_color = convert.convert_params(
        state_dict_numpy(color_t), convert.deepex_colorvid_key_map())

    H, W = 64, 64
    rng = np.random.default_rng(9)
    l_cur = (rng.random((1, H, W, 1)) * 100).astype(np.float32)
    ab_ref = (rng.standard_normal((1, H, W, 2)) * 30).astype(np.float32)
    l_ref = (rng.random((1, H, W, 1)) * 100).astype(np.float32)
    lab_ref = np.concatenate([l_ref, ab_ref], axis=-1)
    lab_last = np.concatenate(
        [l_cur, (rng.standard_normal((1, H, W, 2)) * 20).astype(np.float32)],
        axis=-1,
    )
    lab_cur = np.concatenate(
        [l_cur, np.zeros((1, H, W, 2), np.float32)], axis=-1)

    # torch reference: centered-LAB tensors (util.py l_mean=50)
    center = np.array([50.0, 0.0, 0.0], np.float32).reshape(1, 3, 1, 1)
    with torch.no_grad():
        ib_lab_t = _nchw(lab_ref) - center
        ia_lab_t = _nchw(lab_cur) - center
        ia_last_t = _nchw(lab_last) - center
        feats_b = vgg_t(
            fc.gray2rgb_batch(ib_lab_t[:, 0:1]),
            ["r12", "r22", "r32", "r42", "r52"], preprocess=True,
        )
        ab_t, warped_t, _ = fc.frame_colorization(
            ia_lab_t, ib_lab_t, ia_last_t, feats_b,
            vgg_t, warp_t, color_t, joint_training=False, temperature=0.01,
        )

    vgg_j = dx.VGG19Features()
    warp_j = dx.WarpNet()
    color_j = dx.ColorVidNet()
    with jax.default_matmul_precision("highest"):
        ref_rgb = jnp.repeat(jnp.asarray(l_ref) / 100.0, 3, axis=-1)
        feats_b_j = vgg_j.apply(p_vgg, ref_rgb)
        ab_j, warped_j, _ = dx.frame_colorization(
            p_vgg, p_warp, p_color,
            jnp.asarray(lab_cur), jnp.asarray(lab_ref),
            jnp.asarray(lab_last), feats_b_j,
            vgg_j, warp_j, color_j, temperature=0.01,
        )
    _assert_close(_nhwc(ab_t), ab_j, tol=3e-3, name="ab")
    # flax returns warped lab UNcentered
    _assert_close(_nhwc(warped_t + center), warped_j, tol=3e-3, name="warped")
