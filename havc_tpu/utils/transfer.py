"""uint8 transfer-boundary helpers.

Frames should cross the host<->device link as uint8 — 1 byte/channel, 4x
fewer bytes than float32 — with the [0,1] normalization and the final
clip/round/quantize running ON DEVICE, where XLA fuses them into the
adjacent compute.  On a tunneled PJRT link (this environment) or a
PCIe-fed chip the link, not the MXU, bounds end-to-end throughput, so
every entry/exit point of the framework (io.stream, streaming, read/
write_video, clip.from_frames(device=True)) routes through these two
jitted converters.
"""
from __future__ import annotations

import jax.numpy as jnp

from .jitcache import cached_jit

__all__ = ["u8_to_unit", "unit_to_u8", "rgb_unit_to_i420_u8", "gray_to_rgb"]


def u8_to_unit(u8):
    """(..., ) uint8 0..255 -> float32 [0,1], on device.

    Within 1 ulp of the host ``x.astype(f32)/255`` (XLA strength-reduces
    the division to a reciprocal multiply); ``unit_to_u8(u8_to_unit(x))``
    recovers every code value exactly."""
    fn = cached_jit(
        ("u8_to_unit",), lambda: lambda x: x.astype(jnp.float32) / 255.0
    )
    return fn(u8)


def unit_to_u8(x):
    """float [0,1] -> uint8 0..255 on device (clip, round-half-even —
    bit-identical to the host `(np.clip(x,0,1)*255).round()` it replaces)."""
    fn = cached_jit(
        ("unit_to_u8",),
        lambda: lambda v: jnp.round(
            jnp.clip(v, 0.0, 1.0) * 255.0
        ).astype(jnp.uint8),
    )
    return fn(x)


def gray_to_rgb(x):
    """(T, H, W) or (T, H, W, 1) -> (T, H, W, 3) by channel replication.

    The device half of the grayscale transfer boundary: B&W footage
    crosses the host->device link at 1 byte/pixel (3x fewer bytes than
    RGB) and is expanded on device.  For a source whose decoded channels
    are exactly equal (true of cv2's decode of gray mp4 content — measured
    spread 0 on the reference samples) the expansion of the host's
    ``cv2.COLOR_BGR2GRAY`` luma is bit-identical to sending the RGB."""
    if x.ndim == 3:
        x = x[..., None]
    return jnp.broadcast_to(x, x.shape[:-1] + (3,))


def _i420_pack(v):
    """float [0,1] RGB -> packed I420, bit-identical to
    ``cv2.cvtColor(unit_to_u8(v), cv2.COLOR_RGB2YUV_I420)``.

    OpenCV's convention (verified integer-exact against cv2): ITU-R
    BT.601 *studio-swing* fixed-point math with 20 fractional bits and
    chroma taken from the TOP-LEFT pixel of each 2x2 block (no
    averaging).  The output mp4 is yuv420 regardless — the encoder would
    subsample chroma anyway — so packing on device moves that step before
    the host<->device link and halves the download to 1.5 bytes/pixel.
    """
    u8 = jnp.round(jnp.clip(v, 0.0, 1.0) * 255.0).astype(jnp.int32)
    r, g, b = u8[..., 0], u8[..., 1], u8[..., 2]
    half, off_y, off_c = 1 << 19, 16 << 20, 128 << 20
    y = (269484 * r + 528482 * g + 102760 * b + half + off_y) >> 20
    rt, gt, bt = r[:, 0::2, 0::2], g[:, 0::2, 0::2], b[:, 0::2, 0::2]
    u = (-155188 * rt - 305135 * gt + 460324 * bt + half + off_c) >> 20
    w = (460324 * rt - 385875 * gt - 74448 * bt + half + off_c) >> 20
    t, hh, ww = v.shape[0], v.shape[1], v.shape[2]
    packed = jnp.concatenate(
        [y.reshape(t, -1), u.reshape(t, -1), w.reshape(t, -1)], axis=1
    )
    return packed.reshape(t, hh * 3 // 2, ww).astype(jnp.uint8)


def rgb_unit_to_i420_u8(x):
    """(T, H, W, 3) float [0,1] -> (T, H*3//2, W) uint8 packed I420 on
    device (H, W even).  The host side recovers BGR for a cv2 writer with
    ``cv2.cvtColor(frame, cv2.COLOR_YUV2BGR_I420)``."""
    fn = cached_jit(("rgb_unit_to_i420_u8",), lambda: _i420_pack)
    return fn(x)
