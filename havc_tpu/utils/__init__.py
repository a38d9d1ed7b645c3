"""Utility helpers: jit caching, logging, profiling."""

from .jitcache import cached_jit, clear_jit_cache  # noqa: F401
