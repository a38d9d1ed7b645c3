"""Colorspace kernels vs cv2 oracles (the reference's ground truth)."""
import cv2
import numpy as np
import pytest

from havc_tpu.ops import colorspace as cs


def to_u8(x):
    return (np.clip(np.asarray(x), 0, 1) * 255).round().astype(np.uint8)


def test_luma_matches_cv2(rgb_batch):
    img = rgb_batch[0]
    y = np.asarray(cs.luma(img))
    u8 = to_u8(img)
    ref = cv2.cvtColor(u8, cv2.COLOR_RGB2YUV)[..., 0] / 255.0
    assert np.abs(y - ref).max() < 2.5 / 255.0


def test_yuv_roundtrip(rgb_batch):
    yuv = cs.rgb_to_yuv(rgb_batch)
    back = np.asarray(cs.yuv_to_rgb(yuv))
    assert np.abs(back - rgb_batch).max() < 1e-5


def test_yuv_matches_cv2(rgb_batch):
    img = rgb_batch[0]
    # uint8 cv2 saturates U/V at [0,255]; emulate that before comparing
    ours = np.clip(np.asarray(cs.rgb_to_yuv(img)) * 255.0, 0, 255)
    ref = cv2.cvtColor(to_u8(img), cv2.COLOR_RGB2YUV).astype(np.float32)
    assert np.abs(ours - ref).max() < 2.5  # uint8 quantization tolerance


def test_hsv_matches_cv2(rgb_batch):
    img = rgb_batch[0]
    ours = np.asarray(cs.rgb_to_hsv(img))
    ref = cv2.cvtColor(img, cv2.COLOR_RGB2HSV)  # float path: H in [0,360)
    h_deg = ours[..., 0] * 360.0
    dh = np.abs(h_deg - ref[..., 0])
    dh = np.minimum(dh, 360.0 - dh)
    assert dh.max() < 0.5
    assert np.abs(ours[..., 1] - ref[..., 1]).max() < 1e-3
    assert np.abs(ours[..., 2] - ref[..., 2]).max() < 1e-5


def test_hsv_roundtrip(rgb_batch):
    hsv = cs.rgb_to_hsv(rgb_batch)
    back = np.asarray(cs.hsv_to_rgb(hsv))
    assert np.abs(back - rgb_batch).max() < 1e-5


def test_lab_matches_cv2(rgb_batch):
    img = rgb_batch[0]
    ours = np.asarray(cs.rgb_to_lab(img))
    ref = cv2.cvtColor(img, cv2.COLOR_RGB2Lab)  # float path: true CIELAB
    # cv2 uses the legacy CIE constants (0.008856 / 903.3) and internal
    # LUTs; ~0.2 absolute difference, far below the dE<=1 fidelity gate
    assert np.abs(ours[..., 0] - ref[..., 0]).max() < 0.5
    assert np.abs(ours[..., 1:] - ref[..., 1:]).max() < 0.8


def test_lab_roundtrip(rgb_batch):
    lab = cs.rgb_to_lab(rgb_batch)
    back = np.asarray(cs.lab_to_rgb(lab))
    assert np.abs(back - rgb_batch).max() < 1e-3


def test_copy_chroma_keeps_luma(rgb_batch):
    a, b = rgb_batch[0], rgb_batch[1]
    out = cs.copy_chroma(a, b)
    y_out = np.asarray(cs.luma(out))
    y_b = np.asarray(cs.luma(b))
    assert np.abs(y_out - y_b).max() < 5e-3


def test_ciede2000_zero_for_identical(rgb_batch):
    lab = cs.rgb_to_lab(rgb_batch)
    de = np.asarray(cs.ciede2000(lab, lab))
    assert np.abs(de).max() < 1e-3


def test_ciede2000_known_pair():
    # Sharma et al. test pair #1: dE2000 = 2.0425
    lab1 = np.array([50.0, 2.6772, -79.7751], dtype=np.float32)
    lab2 = np.array([50.0, 0.0, -82.7485], dtype=np.float32)
    de = float(cs.ciede2000(lab1[None, None], lab2[None, None])[0, 0])
    assert abs(de - 2.0425) < 1e-3
