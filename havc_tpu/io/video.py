"""Host-side video and reference-frame IO.

Replaces the reference's LSMASHSource plugin reader (reference:
vsdeoldify/havc_utils.py:249-322 ``HAVC_read_video``) and the reference-frame
export/import machinery (vsdeoldify/vsslib/vsutils.py:147-303:
``vs_sc_export_frames``, ``get_ref_num``, ``is_ref_file``; naming scheme
``ref_%06d.{jpg,png}``).

Decode/encode run on host threads via OpenCV's FFmpeg backend; frames enter
the pipeline as float32 RGB [0,1] numpy arrays that the Clip layer streams
to the device in batches.
"""
from __future__ import annotations

import os
import re
from typing import Optional

import cv2
import numpy as np

from ..clip import Clip, from_frames

__all__ = [
    "read_video",
    "write_video",
    "read_image",
    "write_image",
    "export_reference_frames",
    "read_reference_dir",
    "ref_frame_name",
    "parse_ref_num",
]

DEF_EXPORT_FORMAT = "jpg"  # reference constants.py:58
DEF_JPG_QUALITY = 95  # reference constants.py:59

_REF_RE = re.compile(r"ref_(\d{6})\.(jpg|jpeg|png)$", re.IGNORECASE)


def read_video(
    path: str,
    start: int = 0,
    count: Optional[int] = None,
    fps_force: Optional[float] = None,
    device: bool = False,
) -> Clip:
    """Decode a video file into a Clip (HAVC_read_video analog).

    ``device=True`` returns a device-resident Clip with the upload done in
    uint8 (1 byte/channel over the link; /255 on device — see
    clip.from_frames)."""
    cap = cv2.VideoCapture(path)
    if not cap.isOpened():
        raise IOError(f"cannot open video: {path}")
    fps = cap.get(cv2.CAP_PROP_FPS) or 25.0
    if start:
        cap.set(cv2.CAP_PROP_POS_FRAMES, start)
    frames = []
    while count is None or len(frames) < count:
        ok, bgr = cap.read()
        if not ok:
            break
        frames.append(cv2.cvtColor(bgr, cv2.COLOR_BGR2RGB))
    cap.release()
    if not frames:
        raise IOError(f"no frames decoded from: {path}")
    clip = from_frames(np.stack(frames), fps=fps_force or fps, device=device)
    return clip


def write_video(clip: Clip, path: str, codec: str = "mp4v",
                batch_size: int = 16) -> None:
    """Encode a Clip to a video file.

    Device-resident clips quantize on device and come back as uint8 in
    batches — 4x fewer bytes over the link than per-frame float32
    downloads, and the clip/round runs on the accelerator."""
    h, w = clip.height, clip.width
    fourcc = cv2.VideoWriter_fourcc(*codec)
    out = cv2.VideoWriter(path, fourcc, clip.fps, (w, h))
    if not out.isOpened():
        raise IOError(f"cannot open video writer: {path}")
    if clip.on_device:
        from ..utils import unit_to_u8 as to_u8

        for s in range(0, clip.num_frames, batch_size):
            for u8 in np.asarray(to_u8(clip.frames[s:s + batch_size])):
                out.write(cv2.cvtColor(u8, cv2.COLOR_RGB2BGR))
    else:
        for i in range(clip.num_frames):
            frame = np.asarray(clip.frames[i])
            u8 = (np.clip(frame, 0, 1) * 255).round().astype(np.uint8)
            out.write(cv2.cvtColor(u8, cv2.COLOR_RGB2BGR))
    out.release()


def read_image(path: str) -> np.ndarray:
    """Read an image as float32 RGB [0,1]."""
    bgr = cv2.imread(path, cv2.IMREAD_COLOR)
    if bgr is None:
        raise IOError(f"cannot read image: {path}")
    return cv2.cvtColor(bgr, cv2.COLOR_BGR2RGB).astype(np.float32) / 255.0


def write_image(img: np.ndarray, path: str, quality: int = DEF_JPG_QUALITY) -> None:
    u8 = (np.clip(np.asarray(img), 0, 1) * 255).round().astype(np.uint8)
    bgr = cv2.cvtColor(u8, cv2.COLOR_RGB2BGR)
    ext = os.path.splitext(path)[1].lower()
    params = [cv2.IMWRITE_JPEG_QUALITY, quality] if ext in (".jpg", ".jpeg") else []
    if not cv2.imwrite(path, bgr, params):
        raise IOError(f"cannot write image: {path}")


def ref_frame_name(n: int, ext: str = DEF_EXPORT_FORMAT) -> str:
    """Reference-frame file naming: ``ref_%06d.ext``."""
    return f"ref_{n:06d}.{ext}"


def parse_ref_num(filename: str) -> Optional[int]:
    """Frame number from a ``ref_nnnnnn.*`` file name, else None."""
    m = _REF_RE.search(os.path.basename(filename))
    return int(m.group(1)) if m else None


def export_reference_frames(
    clip: Clip,
    out_dir: str,
    ext: str = DEF_EXPORT_FORMAT,
    frame_list=None,
    ref_offset: int = 0,
    ref_jpg_quality: int = DEF_JPG_QUALITY,
    ref_override: bool = True,
    sequence: bool = False,
) -> list:
    """Export scene-change (or listed) frames as ref_nnnnnn images
    (vs_sc_export_frames / vs_list_export_frames analog,
    vsslib/vsutils.py:147-303): ``ref_offset`` is added to the emitted
    number, ``sequence=True`` renumbers consecutively instead of using
    the source frame index, ``ref_override=False`` skips existing files."""
    os.makedirs(out_dir, exist_ok=True)
    if frame_list is None:
        if clip.sc is None:
            raise ValueError("clip has no scene flags and no frame_list given")
        frame_list = list(np.nonzero(clip.sc.sc_prev)[0])
    written = []
    for i, n in enumerate(frame_list):
        num = (i if sequence else int(n)) + ref_offset
        path = os.path.join(out_dir, ref_frame_name(num, ext))
        if not ref_override and os.path.exists(path):
            continue
        write_image(np.asarray(clip.frames[int(n)]), path, quality=ref_jpg_quality)
        written.append(path)
    return written


def read_reference_dir(ref_dir: str) -> dict:
    """Load all ``ref_nnnnnn.*`` images as {frame_num: RGB float array}."""
    refs = {}
    if not os.path.isdir(ref_dir):
        raise IOError(f"reference dir not found: {ref_dir}")
    for name in sorted(os.listdir(ref_dir)):
        num = parse_ref_num(name)
        if num is not None:
            refs[num] = read_image(os.path.join(ref_dir, name))
    return refs


def write_video_y4m(
    clip: Clip,
    path: str,
    matrix: str = "709",
    range_full: bool = False,
    dither: str = "error_diffusion",
) -> None:
    """Write YUV4MPEG2 (4:2:0) with the full restore_format fidelity path:
    matrix + range conversion and error-diffusion dithering
    (havc_utils.py:167-237 equivalent; cv2's mp4 writer does its own opaque
    conversion, this path gives bit-controlled output ffmpeg can consume
    losslessly)."""
    from .formats import restore_format_yuv420p8

    frames = np.asarray(clip.frames)
    y, u, v = restore_format_yuv420p8(frames, matrix, range_full, dither)
    t, h, w = y.shape
    num = int(round(clip.fps * 1000))
    with open(path, "wb") as f:
        f.write(
            f"YUV4MPEG2 W{w} H{h} F{num}:1000 Ip A1:1 C420mpeg2\n".encode()
        )
        for i in range(t):
            f.write(b"FRAME\n")
            f.write(y[i].tobytes())
            f.write(u[i].tobytes())
            f.write(v[i].tobytes())
