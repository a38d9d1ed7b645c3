"""Keyed jit cache.

The API layer builds pipeline stages as closures over Python-level config
(merge method, tweak knobs...).  A fresh ``jax.jit(lambda ...)`` per call
defeats XLA's compilation cache — every invocation would recompile
(~20-40s on first TPU compile).  ``cached_jit(key, factory)`` memoizes the
jitted callable by a hashable config key so each distinct configuration
compiles exactly once per process (and hits XLA's persistent cache across
processes).
"""
from __future__ import annotations

from typing import Callable, Dict, Hashable

import jax

_CACHE: Dict[Hashable, Callable] = {}


def cached_jit(key: Hashable, make_fn: Callable[[], Callable], **jit_kwargs) -> Callable:
    """Return a jitted callable for ``key``, building it once via ``make_fn``."""
    fn = _CACHE.get(key)
    if fn is None:
        fn = jax.jit(make_fn(), **jit_kwargs)
        _CACHE[key] = fn
    return fn


def clear_jit_cache():
    _CACHE.clear()


_DEFAULT_CACHE_DIR = "~/.cache/havc_tpu/xla"


def enable_cache(cache_dir: str = _DEFAULT_CACHE_DIR,
                 min_compile_time_secs: float = 1.0) -> str:
    """Enable XLA's PERSISTENT compilation cache for the whole library.

    The full-geometry engines pay a large one-time compile (ColorMNet
    'full' is minutes on a tunneled backend); with the persistent cache a
    second process deserializes the compiled executable instead of
    recompiling.  Call once before building engines:

        import havc_tpu
        havc_tpu.enable_cache()          # ~/.cache/havc_tpu/xla
        havc_tpu.enable_cache("/fast/dir")

    Returns the resolved cache directory.  Safe to call repeatedly; any
    program compiled through :func:`cached_jit` (every pipeline stage and
    engine scan) benefits automatically."""
    import os

    path = os.path.expanduser(cache_dir)
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update(
        "jax_persistent_cache_min_compile_time_secs",
        float(min_compile_time_secs),
    )
    try:  # cache even programs XLA deems "small" savings on (jax>=0.4.30)
        jax.config.update(
            "jax_persistent_cache_min_entry_size_bytes", 0
        )
    except Exception:  # older jax: flag absent
        pass
    return path
