"""Native frame pipeline (C++ ring buffer + Y4M prefetch) via ctypes."""
import ctypes
import numpy as np
import pytest

from havc_tpu.io import native


@pytest.fixture(scope="module")
def lib():
    try:
        return native.load_native()
    except native.NativeUnavailable as e:
        pytest.skip(f"native lib unavailable: {e}")


def _write_y4m(path, frames_y):
    h, w = frames_y[0].shape
    hdr = f"YUV4MPEG2 W{w} H{h} F25:1 Ip A1:1 C420\n".encode()
    payload = b""
    u = np.full((h // 2, w // 2), 128, np.uint8)
    for y in frames_y:
        payload += b"FRAME\n" + y.tobytes() + u.tobytes() + u.tobytes()
    with open(path, "wb") as f:
        f.write(hdr + payload)


class TestConverters:
    def test_u8_f32_roundtrip(self, lib):
        rng = np.random.default_rng(0)
        x = rng.integers(0, 256, 4096, dtype=np.uint8)
        f = np.empty(4096, np.float32)
        lib.u8_to_f32(x.ctypes.data_as(ctypes.c_void_p),
                      f.ctypes.data_as(ctypes.c_void_p), 4096)
        assert np.abs(f - x / 255.0).max() < 1e-7
        back = np.empty(4096, np.uint8)
        lib.f32_to_u8(f.ctypes.data_as(ctypes.c_void_p),
                      back.ctypes.data_as(ctypes.c_void_p), 4096)
        assert (back == x).all()


class TestRing:
    def test_push_pop_order(self, lib):
        ring = lib.fr_create(4, 16)
        try:
            for i in range(3):
                data = bytes([i] * 16)
                assert lib.fr_push(ring, data, 16, i) == 0
            assert lib.fr_size(ring) == 3
            buf = np.empty(16, np.uint8)
            for i in range(3):
                idx = ctypes.c_int64()
                got = lib.fr_pop(ring, buf.ctypes.data_as(ctypes.c_void_p), idx)
                assert got == 16
                assert idx.value == i
                assert buf[0] == i
        finally:
            lib.fr_destroy(ring)


class TestY4M:
    def test_stream_batches(self, lib, tmp_path):
        rng = np.random.default_rng(1)
        frames = [rng.integers(0, 256, (16, 32), dtype=np.uint8) for _ in range(5)]
        path = str(tmp_path / "t.y4m")
        _write_y4m(path, frames)
        s = native.Y4MStream(path)
        assert (s.width, s.height) == (32, 16)
        got = []
        for b in s.read_batches(2):
            assert b.dtype == np.float32
            got.append(b)
        s.close()
        total = sum(b.shape[0] for b in got)
        assert total == 5
        # neutral chroma -> output is grayscale: channels identical-ish
        b0 = got[0][0]
        assert np.abs(b0[..., 0] - b0[..., 1]).max() < 0.02
