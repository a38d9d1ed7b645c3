"""Streaming video processing with bounded memory.

The Clip abstraction holds a whole clip in host memory — right for the
filter-graph semantics, wrong for feature-length footage.  This module is
the production-serving path: decode -> batched device compute -> encode as
a pipeline with a bounded prefetch queue, so an arbitrarily long video
runs in O(batch) memory.  Decode runs on a background thread (cv2 or the
native Y4M ring, io/native.py); JAX async dispatch overlaps the next
batch's host->device copy with current compute (the double-buffered
loader of SURVEY 2.5's TPU-native design).
"""
from __future__ import annotations

import queue
import threading
from typing import Callable, Iterator, Optional

import numpy as np

import cv2

__all__ = ["stream_batches", "process_video"]


def _decode_worker(path: str, batch_size: int, out_q: queue.Queue, count=None,
                   gray: bool = False):
    cap = cv2.VideoCapture(path)
    conv = cv2.COLOR_BGR2GRAY if gray else cv2.COLOR_BGR2RGB
    try:
        batch = []
        n = 0
        while cap.isOpened():
            if count is not None and n >= count:
                break
            ok, bgr = cap.read()
            if not ok:
                break
            batch.append(cv2.cvtColor(bgr, conv))
            n += 1
            if len(batch) == batch_size:
                out_q.put(np.stack(batch))
                batch = []
        if batch:
            out_q.put(np.stack(batch))
    finally:
        cap.release()
        out_q.put(None)  # EOF sentinel


def stream_batches(
    path: str, batch_size: int = 8, prefetch: int = 4,
    count: Optional[int] = None, gray: bool = False,
) -> Iterator[np.ndarray]:
    """Yield (B, H, W, 3) uint8 RGB batches with background decode.

    uint8 is the transfer format on purpose: frames cross the host->device
    link (PCIe, or the tunneled PJRT relay here) at 1 byte/channel — 4x
    fewer bytes than float32 — and the /255 normalization runs on device
    where it fuses into the first compute stage.  Queue memory shrinks 4x
    too.

    ``gray=True`` yields (B, H, W) single-channel batches instead
    (``cv2.COLOR_BGR2GRAY``): for B&W footage this cuts the upload a
    further 3x; the device side replicates channels
    (``utils.gray_to_rgb``), bit-identically for exactly-gray sources.
    """
    q: queue.Queue = queue.Queue(maxsize=prefetch)
    t = threading.Thread(
        target=_decode_worker, args=(path, batch_size, q, count, gray),
        daemon=True,
    )
    t.start()
    while True:
        item = q.get()
        if item is None:
            break
        yield item
    t.join()


def process_video(
    path_in: str,
    path_out: str,
    fn: Callable[[np.ndarray], np.ndarray],
    batch_size: int = 8,
    prefetch: int = 4,
    count: Optional[int] = None,
    codec: str = "mp4v",
) -> int:
    """Stream a video through a batched frame function.

    ``fn`` maps (B, H, W, 3) float32 RGB [0,1] -> same shape (typically a
    jitted colorize pipeline).  The tail batch is padded to ``batch_size``
    so ``fn`` compiles exactly once.  Encode happens on the main thread
    while the decode thread fills the queue.  Returns frames written.

    Transfers ride uint8 in BOTH directions: the decode thread hands over
    uint8 batches which are normalized to [0,1] on device, and the output
    is clipped/rounded/quantized on device so only 1 byte/channel crosses
    the link each way (the host write loop gets display-ready uint8).
    """
    import jax
    import jax.numpy as jnp

    @jax.jit
    def fn_u8(u8):
        x = fn(u8.astype(jnp.float32) / 255.0)
        return jnp.round(jnp.clip(x, 0.0, 1.0) * 255.0).astype(jnp.uint8)

    cap = cv2.VideoCapture(path_in)
    fps = cap.get(cv2.CAP_PROP_FPS) or 25.0
    w = int(cap.get(cv2.CAP_PROP_FRAME_WIDTH))
    h = int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
    cap.release()
    writer = cv2.VideoWriter(
        path_out, cv2.VideoWriter_fourcc(*codec), fps, (w, h)
    )
    if not writer.isOpened():
        raise IOError(f"cannot open video writer: {path_out}")

    written = 0
    try:
        for batch in stream_batches(path_in, batch_size, prefetch, count):
            n = batch.shape[0]
            if n < batch_size:
                batch = np.concatenate(
                    [batch, np.repeat(batch[-1:], batch_size - n, axis=0)]
                )
            out = np.asarray(fn_u8(jnp.asarray(batch)))[:n]
            for u8 in out:
                writer.write(cv2.cvtColor(u8, cv2.COLOR_RGB2BGR))
                written += 1
    finally:
        writer.release()
    return written
