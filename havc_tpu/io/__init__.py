"""Host video / image-sequence IO (replaces LSMASHSource + frame export)."""

from .stream import process_video, stream_batches  # noqa: F401
from .video import (  # noqa: F401
    read_video,
    write_video,
    write_video_y4m,
    read_image,
    write_image,
    export_reference_frames,
    read_reference_dir,
    ref_frame_name,
    parse_ref_num,
)
