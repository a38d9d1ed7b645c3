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
