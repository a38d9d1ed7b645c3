"""The Clip abstraction — the framework's replacement for vs.VideoNode.

The reference builds lazily-evaluated VapourSynth clip graphs with per-frame
Python callbacks (reference: vsdeoldify/__init__.py uses
``std.ModifyFrame``/``FrameEval`` everywhere; format discipline via
``convert_format_RGB24``/``restore_format``, havc_utils.py:37-237).

TPU design: a :class:`Clip` is a *batched frame source* — frames are
float32/bfloat16 RGB in [0,1], shape ``(T, H, W, 3)`` — plus per-frame scene
metadata (:class:`havc_tpu.scene.SceneFlags`, the frame-prop bus) and a
:class:`ClipInfo` remembering the origin format.  Pipeline stages are pure
batched functions; :meth:`Clip.map_batches` streams them through the device
in fixed-size batches so every stage jits once and XLA pipelines
host->device transfers with compute (double buffering comes from JAX's
async dispatch: the next batch's ``device_put`` overlaps the current
batch's compute).
"""
from __future__ import annotations

from dataclasses import dataclass, field, replace
from typing import Callable, Optional

import numpy as np
import jax
import jax.numpy as jnp

from .scene.detect import SceneFlags

__all__ = ["Clip", "ClipInfo", "from_frames"]


@dataclass
class ClipInfo:
    """Origin-format record (the reference's ClipInfo, havc_utils.py:37-56)."""

    height: int
    width: int
    fps: float = 25.0
    matrix: str = "709"
    range_full: bool = True
    orig_dtype: str = "uint8"
    chroma_resized: bool = False
    orig_height: int = 0
    orig_width: int = 0


@dataclass
class Clip:
    """Batched RGB clip with frame metadata.

    ``frames``: numpy or jax array, (T, H, W, 3), float32 RGB in [0,1].
    ``sc``: optional scene-change flags (the frame-prop bus).
    """

    frames: np.ndarray
    fps: float = 25.0
    sc: Optional[SceneFlags] = None
    info: Optional[ClipInfo] = None

    def __post_init__(self):
        if self.info is None:
            t, h, w, _ = self.frames.shape
            self.info = ClipInfo(height=h, width=w, fps=self.fps,
                                 orig_height=h, orig_width=w)

    # -- basic properties -----------------------------------------------------
    @property
    def num_frames(self) -> int:
        return self.frames.shape[0]

    @property
    def height(self) -> int:
        return self.frames.shape[1]

    @property
    def width(self) -> int:
        return self.frames.shape[2]

    def __len__(self) -> int:
        return self.num_frames

    @property
    def on_device(self) -> bool:
        """True when frames live on an accelerator as a jax Array.  Pipeline
        stages preserve residency: device in -> device out (no host
        round-trips between stages), host in -> host out."""
        return isinstance(self.frames, jax.Array)

    # -- functional updates ---------------------------------------------------
    def with_frames(self, frames) -> "Clip":
        return replace(self, frames=frames)

    def to_device(self) -> "Clip":
        """Move frames to the default device ONCE; downstream stages then
        run with zero host<->device hops (the reference keeps frames in VS
        core memory and pays a GPU transfer per filter instead)."""
        if self.on_device:
            return self
        return replace(self, frames=jax.device_put(np.asarray(self.frames)))

    def to_host(self) -> "Clip":
        if not self.on_device:
            return self
        return replace(self, frames=np.asarray(self.frames))

    def with_sc(self, sc: SceneFlags) -> "Clip":
        return replace(self, sc=sc)

    def copy_sc_from(self, other: "Clip") -> "Clip":
        """vsscdect.CopySCDetect analog."""
        return replace(self, sc=other.sc)

    def __getitem__(self, idx) -> "Clip":
        if isinstance(idx, slice):
            sc = None
            if self.sc is not None:
                sc = SceneFlags(
                    sc_prev=self.sc.sc_prev[idx],
                    sc_next=self.sc.sc_next[idx],
                    luma=self.sc.luma[idx],
                    ratio=self.sc.ratio[idx],
                    threshold=self.sc.threshold,
                    frequency=self.sc.frequency,
                )
            return replace(self, frames=self.frames[idx], sc=sc)
        raise TypeError("Clip indexing supports slices only")

    # -- batched mapping ------------------------------------------------------
    def map_batches(
        self,
        fn: Callable,
        batch_size: int = 8,
        jit: bool = True,
        pass_sc: bool = False,
    ) -> "Clip":
        """Apply a pure batched function over frames in fixed-size batches.

        ``fn(batch)`` (or ``fn(batch, sc_batch)`` with ``pass_sc``) maps a
        ``(B, H, W, 3)`` array to a same-leading-dim array.  The tail batch
        is padded to ``batch_size`` (edge-replicate) so the function compiles
        exactly once; padding frames are dropped on output.  JAX async
        dispatch overlaps the next batch's H2D copy with current compute.
        """
        T = self.num_frames
        on_dev = self.on_device
        xp = jnp if on_dev else np
        f = jax.jit(fn) if jit else fn
        outs = []
        for start in range(0, T, batch_size):
            chunk = self.frames[start : start + batch_size]
            if not on_dev:
                chunk = np.asarray(chunk)
            n = chunk.shape[0]
            if n < batch_size:
                pad = xp.repeat(chunk[-1:], batch_size - n, axis=0)
                chunk = xp.concatenate([chunk, pad], axis=0)
            if pass_sc and self.sc is not None:
                scb = self.sc.sc_prev[start : start + batch_size].astype(np.int32)
                if len(scb) < batch_size:
                    scb = np.pad(scb, (0, batch_size - len(scb)), mode="edge")
                out = f(jnp.asarray(chunk), jnp.asarray(scb))
            else:
                out = f(jnp.asarray(chunk))
            outs.append(out[:n] if on_dev else np.asarray(out[:n]))
        return self.with_frames(xp.concatenate(outs, axis=0))

    def map_video(self, fn: Callable, jit: bool = True) -> "Clip":
        """Apply a whole-video function (temporal kernels needing the full
        time axis, e.g. chroma_stabilizer / exemplar scans)."""
        f = jax.jit(fn) if jit else fn
        if self.sc is not None:
            out = f(jnp.asarray(self.frames), jnp.asarray(self.sc.sc_prev.astype(np.int32)))
        else:
            out = f(jnp.asarray(self.frames), None)
        return self.with_frames(out if self.on_device else np.asarray(out))


def from_frames(frames: np.ndarray, fps: float = 25.0,
                device: bool = False) -> Clip:
    """Build a Clip from an array of frames.

    Accepts uint8 (0..255) or float (0..1), (T, H, W, 3) or (H, W, 3).

    ``device=True`` builds a device-resident Clip; uint8 input crosses the
    host->device link at 1 byte/channel and the /255 normalization runs on
    device (4x fewer transfer bytes than uploading float32 — the link, not
    the chip, is the bottleneck on tunneled/PCIe-fed setups).
    """
    frames = np.asarray(frames)
    if frames.ndim == 3:
        frames = frames[None]
    if device:
        if frames.dtype == np.uint8:
            from .utils import u8_to_unit

            return Clip(frames=u8_to_unit(jax.device_put(frames)), fps=fps)
        return Clip(frames=jax.device_put(frames.astype(np.float32)), fps=fps)
    if frames.dtype == np.uint8:
        frames = frames.astype(np.float32) / 255.0
    return Clip(frames=frames.astype(np.float32), fps=fps)
