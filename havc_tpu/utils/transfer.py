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

__all__ = ["u8_to_unit", "unit_to_u8"]


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
