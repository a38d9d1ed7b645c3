"""Scene detection: batched device stats + host decision state machine."""

from .detect import SceneDetector, SceneFlags, scene_detect  # noqa: F401
