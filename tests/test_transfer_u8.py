"""uint8 transfer boundary: device uploads/downloads ride 1 byte/channel
with the normalize/quantize on device, bit-identical to the host math."""
import os
import sys

sys.path.insert(0, os.path.dirname(__file__))

import numpy as np
import pytest

import jax.numpy as jnp

from havc_tpu.clip import from_frames
from havc_tpu.utils import u8_to_unit, unit_to_u8


def test_u8_to_unit_matches_host():
    # XLA strength-reduces /255 to a reciprocal multiply: allow 1 ulp.
    # The roundtrip test below pins the invariant that matters (exact u8
    # recovery after quantize).
    rng = np.random.default_rng(0)
    u8 = rng.integers(0, 256, (3, 8, 9, 3), dtype=np.uint8)
    got = np.asarray(u8_to_unit(jnp.asarray(u8)))
    want = u8.astype(np.float32) / 255.0
    assert got.dtype == np.float32
    np.testing.assert_allclose(got, want, rtol=0, atol=1.2e-7)


def test_unit_to_u8_matches_host_quantize():
    rng = np.random.default_rng(1)
    x = rng.random((2, 7, 5, 3)).astype(np.float32) * 1.2 - 0.1  # out of range
    got = np.asarray(unit_to_u8(jnp.asarray(x)))
    want = (np.clip(x, 0, 1) * 255).round().astype(np.uint8)
    np.testing.assert_array_equal(got, want)


def test_u8_roundtrip_exact():
    """u8 -> unit -> u8 must be the identity for every code value."""
    u8 = np.arange(256, dtype=np.uint8).reshape(1, 16, 16, 1).repeat(3, -1)
    back = np.asarray(unit_to_u8(u8_to_unit(jnp.asarray(u8))))
    np.testing.assert_array_equal(back, u8)


def test_from_frames_device_u8_equals_host_path():
    rng = np.random.default_rng(2)
    u8 = rng.integers(0, 256, (4, 6, 8, 3), dtype=np.uint8)
    host = from_frames(u8)
    dev = from_frames(u8, device=True)
    assert dev.on_device and not host.on_device
    np.testing.assert_allclose(np.asarray(dev.frames), host.frames,
                               rtol=0, atol=1.2e-7)


def test_write_video_device_equals_host(tmp_path):
    import cv2

    from havc_tpu.io.video import write_video

    rng = np.random.default_rng(3)
    frames = rng.random((9, 32, 48, 3)).astype(np.float32)
    host = from_frames(frames)
    dev = host.to_device()
    p1, p2 = str(tmp_path / "h.avi"), str(tmp_path / "d.avi")
    # lossless codec so the comparison is exact
    write_video(host, p1, codec="FFV1")
    write_video(dev, p2, codec="FFV1")
    b1, b2 = open(p1, "rb").read(), open(p2, "rb").read()
    if not b1:  # FFV1 unavailable in this cv2 build: fall back to mp4v
        write_video(host, p1, codec="mp4v")
        write_video(dev, p2, codec="mp4v")
        b1, b2 = open(p1, "rb").read(), open(p2, "rb").read()
    assert b1 and b1 == b2


def test_read_video_device(tmp_path):
    import cv2

    from havc_tpu.io.video import read_video

    path = str(tmp_path / "in.mp4")
    wr = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 25, (48, 32))
    for i in range(5):
        wr.write(np.full((32, 48, 3), i * 40, np.uint8))
    wr.release()
    host = read_video(path)
    dev = read_video(path, device=True)
    assert dev.on_device
    np.testing.assert_allclose(np.asarray(dev.frames), host.frames,
                               rtol=0, atol=1.2e-7)


def test_i420_pack_matches_cv2_bit_exact():
    """Device I420 packing must be bit-identical to
    cv2.cvtColor(u8, COLOR_RGB2YUV_I420) — same BT.601 studio-swing
    integer math, same top-left 2x2 chroma siting, same plane packing."""
    import cv2

    from havc_tpu.utils import rgb_unit_to_i420_u8

    rng = np.random.default_rng(7)
    # include an H % 4 != 0 geometry: the packed chroma planes then do not
    # align to whole rows of W and only contiguous packing is correct
    for (t, h, w) in [(3, 32, 48), (2, 34, 46)]:
        u8 = rng.integers(0, 256, (t, h, w, 3), dtype=np.uint8)
        got = np.asarray(rgb_unit_to_i420_u8(jnp.asarray(
            u8.astype(np.float32) / 255.0)))
        assert got.shape == (t, h * 3 // 2, w)
        for i in range(t):
            want = cv2.cvtColor(u8[i], cv2.COLOR_RGB2YUV_I420)
            np.testing.assert_array_equal(got[i], want)


def test_i420_roundtrip_close():
    """cv2's YUV2BGR_I420 of the device packing must recover the input to
    within 4:2:0 subsampling error on smooth content."""
    import cv2

    from havc_tpu.utils import rgb_unit_to_i420_u8

    yy, xx = np.mgrid[0:64, 0:96].astype(np.float32)
    rgb = np.stack([yy / 64, xx / 96, (yy + xx) / 160], -1)[None]
    packed = np.asarray(rgb_unit_to_i420_u8(jnp.asarray(rgb)))[0]
    back = cv2.cvtColor(cv2.cvtColor(packed, cv2.COLOR_YUV2BGR_I420),
                        cv2.COLOR_BGR2RGB).astype(np.float32) / 255.0
    assert np.abs(back - rgb[0]).mean() < 0.02


def test_gray_to_rgb_replication():
    from havc_tpu.utils import gray_to_rgb

    rng = np.random.default_rng(8)
    g = rng.random((2, 6, 8)).astype(np.float32)
    out = np.asarray(gray_to_rgb(jnp.asarray(g)))
    assert out.shape == (2, 6, 8, 3)
    for c in range(3):
        np.testing.assert_array_equal(out[..., c], g)
