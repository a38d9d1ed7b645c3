"""Per-stage timing + device tracing (the SURVEY §5 "tracing/profiling"
subsystem the reference lacks — its only instrumentation is ad-hoc fps
notes in docstrings, havc_utils.py:796-803).

Two layers:

- ``stage_timer(name)`` — wall-clock context manager that synchronizes on
  a JAX value at exit (``block_until_ready``) so asynchronous dispatch
  does not under-report device stages.  Times accumulate in a global
  registry; ``stage_report()`` formats it, ``reset_stages()`` clears it.
- ``device_trace(log_dir)`` — thin wrapper over ``jax.profiler.trace``
  emitting a TensorBoard-loadable XLA trace for kernel-level analysis.

The public pipeline (api.HAVC_main_presets and friends) enters
``stage_timer`` around every stage whenever profiling is enabled via
``enable_profiling(True)`` or the HAVC debug level is >= 1, so
``HAVC_set_debug_level(1)`` alone yields a per-stage breakdown.
"""
from __future__ import annotations

import contextlib
import time
from collections import OrderedDict
from typing import Optional

__all__ = [
    "enable_profiling",
    "profiling_enabled",
    "stage_timer",
    "stage_times",
    "stage_report",
    "reset_stages",
    "device_trace",
]

_ENABLED = [False]
_STAGES: "OrderedDict[str, list]" = OrderedDict()  # name -> [total_s, calls]


def enable_profiling(on: bool = True) -> None:
    _ENABLED[0] = bool(on)


def profiling_enabled() -> bool:
    if _ENABLED[0]:
        return True
    try:  # debug level >= 1 implies stage timing (reference debug levels,
        # constants.py:13-15, repurposed: the reference has no timing at all)
        from ..api import _DEBUG_LEVEL

        return _DEBUG_LEVEL[0] >= 1
    except Exception:
        return False


@contextlib.contextmanager
def stage_timer(name: str, sync: object = None):
    """Time a pipeline stage.  ``sync``, when given, is a JAX array (or
    pytree) blocked on at exit so device work is charged to this stage.
    No-op (near-zero overhead) when profiling is disabled."""
    if not profiling_enabled():
        yield
        return
    t0 = time.perf_counter()
    try:
        yield
    finally:
        if sync is not None:
            try:
                import jax

                jax.block_until_ready(sync)
            except Exception:
                pass
        dt = time.perf_counter() - t0
        ent = _STAGES.setdefault(name, [0.0, 0])
        ent[0] += dt
        ent[1] += 1


def stage_times() -> dict:
    """{stage: (total_seconds, calls)} accumulated since reset."""
    return {k: tuple(v) for k, v in _STAGES.items()}


def reset_stages() -> None:
    _STAGES.clear()


def stage_report() -> str:
    """Human-readable per-stage table, slowest first."""
    if not _STAGES:
        return "(no stages recorded)"
    rows = sorted(_STAGES.items(), key=lambda kv: -kv[1][0])
    width = max(len(k) for k, _ in rows)
    lines = [f"{'stage':<{width}}  total_s  calls  avg_ms"]
    for name, (tot, calls) in rows:
        lines.append(
            f"{name:<{width}}  {tot:7.3f}  {calls:5d}  {1e3 * tot / max(calls, 1):6.1f}"
        )
    return "\n".join(lines)


@contextlib.contextmanager
def device_trace(log_dir: str, host_tracer_level: Optional[int] = None):
    """XLA/device trace via jax.profiler (TensorBoard format)."""
    import jax

    kwargs = {}
    if host_tracer_level is not None:
        kwargs["host_tracer_level"] = host_tracer_level
    with jax.profiler.trace(log_dir, **kwargs):
        yield
