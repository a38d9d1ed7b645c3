"""ctypes bindings for the native frame pipeline (native/framepipe.cpp).

Provides the threaded decode->ring->batch path that replaces VapourSynth's
C++ frame scheduler on the host side.  Falls back gracefully (raises
``NativeUnavailable``) when the shared library hasn't been built — the
pure-Python cv2 reader (io/video.py) remains the default everywhere; the
native path is the high-throughput ingest for Y4M pipes
(``ffmpeg -i in.mp4 -f yuv4mpegpipe -``).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Iterator, Optional, Tuple

import numpy as np

__all__ = ["NativeUnavailable", "load_native", "Y4MStream", "build_native"]

_LIB = None
_LIB_PATH = os.path.join(os.path.dirname(__file__), "_framepipe.so")


class NativeUnavailable(RuntimeError):
    pass


def build_native() -> str:
    """Compile the native library in-tree (g++)."""
    src_dir = os.path.join(os.path.dirname(__file__), "..", "..", "native")
    subprocess.run(["make", "-C", src_dir], check=True, capture_output=True)
    return _LIB_PATH


def load_native(auto_build: bool = True):
    """Load (building if needed) the framepipe shared library."""
    global _LIB
    if _LIB is not None:
        return _LIB
    if not os.path.exists(_LIB_PATH):
        if not auto_build:
            raise NativeUnavailable(f"{_LIB_PATH} not built")
        try:
            build_native()
        except Exception as e:  # toolchain missing
            raise NativeUnavailable(f"cannot build framepipe: {e}")
    lib = ctypes.CDLL(_LIB_PATH)
    # signatures
    lib.fr_create.restype = ctypes.c_void_p
    lib.fr_create.argtypes = [ctypes.c_size_t, ctypes.c_size_t]
    lib.fr_destroy.argtypes = [ctypes.c_void_p]
    lib.fr_close.argtypes = [ctypes.c_void_p]
    lib.fr_push.restype = ctypes.c_int
    lib.fr_push.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_size_t, ctypes.c_int64,
    ]
    lib.fr_pop.restype = ctypes.c_int64
    lib.fr_pop.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64),
    ]
    lib.fr_size.restype = ctypes.c_size_t
    lib.fr_size.argtypes = [ctypes.c_void_p]
    lib.y4m_open.restype = ctypes.c_void_p
    lib.y4m_open.argtypes = [ctypes.c_char_p]
    lib.y4m_info.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int64),
    ]
    lib.y4m_read_frame.restype = ctypes.c_int64
    lib.y4m_read_frame.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
    lib.y4m_start_prefetch.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
    lib.y4m_close.argtypes = [ctypes.c_void_p]
    lib.u8_to_f32.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
    ]
    lib.f32_to_u8.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
    ]
    lib.yuv420_to_rgb_f32.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
    ]
    _LIB = lib
    return lib


class Y4MStream:
    """Background-threaded Y4M frame stream over the native ring buffer.

    Iterates float32 RGB frames in [0,1] with decode running on a native
    thread — the frame-level parallelism role of VapourSynth's scheduler.
    """

    def __init__(self, path: str, ring_capacity: int = 16):
        self.lib = load_native()
        self.reader = self.lib.y4m_open(path.encode())
        if not self.reader:
            raise IOError(f"cannot open Y4M: {path}")
        w = ctypes.c_int()
        h = ctypes.c_int()
        fn = ctypes.c_int()
        fd = ctypes.c_int()
        fb = ctypes.c_int64()
        self.lib.y4m_info(self.reader, w, h, fn, fd, fb)
        self.width, self.height = w.value, h.value
        self.fps = fn.value / max(fd.value, 1)
        self.frame_bytes = fb.value
        self.ring = self.lib.fr_create(ring_capacity, self.frame_bytes)
        self.lib.y4m_start_prefetch(self.reader, self.ring)
        self._buf = np.empty(self.frame_bytes, np.uint8)

    def __iter__(self) -> Iterator[np.ndarray]:
        while True:
            idx = ctypes.c_int64()
            got = self.lib.fr_pop(
                self.ring, self._buf.ctypes.data_as(ctypes.c_void_p), idx
            )
            if got <= 0:
                break
            rgb = np.empty((self.height, self.width, 3), np.float32)
            self.lib.yuv420_to_rgb_f32(
                self._buf.ctypes.data_as(ctypes.c_void_p),
                rgb.ctypes.data_as(ctypes.c_void_p),
                self.width, self.height,
            )
            yield rgb

    def read_batches(self, batch_size: int = 8) -> Iterator[np.ndarray]:
        batch = []
        for frame in self:
            batch.append(frame)
            if len(batch) == batch_size:
                yield np.stack(batch)
                batch = []
        if batch:
            yield np.stack(batch)

    def close(self):
        if self.reader:
            self.lib.y4m_close(self.reader)
            self.reader = None
        if self.ring:
            self.lib.fr_destroy(self.ring)
            self.ring = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
