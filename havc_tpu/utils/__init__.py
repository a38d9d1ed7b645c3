"""Utility helpers: jit caching, logging, profiling."""

from .jitcache import cached_jit, clear_jit_cache, enable_cache  # noqa: F401
from .transfer import (  # noqa: F401
    gray_to_rgb,
    rgb_unit_to_i420_u8,
    u8_to_unit,
    unit_to_u8,
)
from .log import (  # noqa: F401
    HAVC_LogMessage,
    HAVCError,
    MessageType,
    get_logger,
)
from .profiling import (  # noqa: F401
    device_trace,
    enable_profiling,
    reset_stages,
    stage_report,
    stage_timer,
    stage_times,
)
