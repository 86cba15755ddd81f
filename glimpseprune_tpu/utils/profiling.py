"""Profiling decorators: the TPU equivalent of the reference's tracing layer.

The reference times hot calls with CUDA events and tracks peak device memory
(reference warppers.py:190-300 `time_logger`, :306-438 `memory_logger`), with
a global stats registry keyed by qualified name and thread-local on/off
context managers. On TPU there are no CUDA events: we block on the returned
pytree (`jax.block_until_ready`) and read wall-clock; memory comes from
`device.memory_stats()` where the backend exposes it.

Same public surface: @time_logger, @memory_logger, LoggerControl context
managers, stats registry dump for eval info.json artifacts.
"""

from __future__ import annotations

import functools
import os
import threading
import time
from collections import defaultdict
from typing import Any, Dict, Optional

import jax

_STATE = threading.local()


def _flag(name: str, default: bool = False) -> bool:
    return getattr(_STATE, name, default)


class LoggerControl:
    """Context manager to toggle time/memory logging on the current thread."""

    def __init__(self, time_active: bool = None, memory_active: bool = None):
        self._time = time_active
        self._memory = memory_active
        self._prev = {}

    def __enter__(self):
        if self._time is not None:
            self._prev["time_active"] = _flag("time_active")
            _STATE.time_active = self._time
        if self._memory is not None:
            self._prev["memory_active"] = _flag("memory_active")
            _STATE.memory_active = self._memory
        return self

    def __exit__(self, *exc):
        for k, v in self._prev.items():
            setattr(_STATE, k, v)
        return False


def time_logger_set_active(active: bool = True) -> LoggerControl:
    return LoggerControl(time_active=active)


def memory_logger_set_active(active: bool = True) -> LoggerControl:
    return LoggerControl(memory_active=active)


class _Stats:
    __slots__ = ("count", "total", "peak")

    def __init__(self):
        self.count = 0
        self.total = 0.0
        self.peak = 0.0

    def add(self, value: float):
        self.count += 1
        self.total += value
        self.peak = max(self.peak, value)

    @property
    def avg(self) -> float:
        return self.total / self.count if self.count else 0.0


_TIME_STATS: Dict[str, _Stats] = defaultdict(_Stats)
_MEM_STATS: Dict[str, _Stats] = defaultdict(_Stats)
_STATS_LOCK = threading.Lock()


def get_logger_stats() -> Dict[str, Any]:
    """Dump running stats for *_info.json artifacts
    (reference viscot_eval/infer_cot.py:424-438)."""
    with _STATS_LOCK:
        return {
            "time_ms": {
                k: {"avg": s.avg * 1e3, "count": s.count, "total": s.total * 1e3}
                for k, s in _TIME_STATS.items()
            },
            "peak_memory_bytes": {
                k: {"peak": s.peak, "count": s.count} for k, s in _MEM_STATS.items()
            },
        }


def reset_logger_stats():
    with _STATS_LOCK:
        _TIME_STATS.clear()
        _MEM_STATS.clear()


def _device_peak_bytes() -> float:
    total = 0.0
    for d in jax.local_devices():
        try:
            stats = d.memory_stats()
        except Exception:
            return 0.0
        if stats:
            total += stats.get("peak_bytes_in_use", stats.get("bytes_in_use", 0))
    return total


def time_logger(fn):
    """Time a call, blocking on its output pytree so device work is included."""

    name = getattr(fn, "__qualname__", getattr(fn, "__name__", str(fn)))

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        if not _flag("time_active"):
            return fn(*args, **kwargs)
        start = time.perf_counter()
        out = fn(*args, **kwargs)
        out = jax.block_until_ready(out)
        elapsed = time.perf_counter() - start
        with _STATS_LOCK:
            _TIME_STATS[name].add(elapsed)
        return out

    return wrapper


def memory_logger(fn):
    """Record device peak memory observed after the call."""

    name = getattr(fn, "__qualname__", getattr(fn, "__name__", str(fn)))

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        if not _flag("memory_active"):
            return fn(*args, **kwargs)
        out = fn(*args, **kwargs)
        out = jax.block_until_ready(out)
        with _STATS_LOCK:
            _MEM_STATS[name].add(_device_peak_bytes())
        return out

    return wrapper


def debug_calls(every_n: Optional[int] = None, prefix: str = ""):
    """Print every Nth call's args summary, gated by env DEBUG_CALLS_N
    (reference warppers.py:15-114 `@debug_calls`; used there for RL sample
    logging). N resolves at call time: decorator arg > env var > off."""

    def deco(fn):
        counter = {"n": 0}

        @functools.wraps(fn)
        def wrapper(*args, **kwargs):
            n = every_n or int(os.environ.get("DEBUG_CALLS_N", "0") or 0)
            if n > 0:
                counter["n"] += 1
                if counter["n"] % n == 0:
                    parts = [
                        f"{type(a).__name__}{getattr(a, 'shape', '')}" for a in args
                    ]
                    print(
                        f"[debug_calls]{prefix} {fn.__qualname__} "
                        f"#{counter['n']} ({', '.join(parts[:6])})"
                    )
            return fn(*args, **kwargs)

        return wrapper

    return deco


class profiler_trace:
    """Context manager writing a jax.profiler trace (TensorBoard/XProf format)
    when `log_dir` is truthy; no-op otherwise — the TPU-native replacement for
    the reference's CUDA-event timing when a full timeline is wanted."""

    def __init__(self, log_dir: Optional[str]):
        self.log_dir = log_dir

    def __enter__(self):
        if self.log_dir:
            import jax

            jax.profiler.start_trace(self.log_dir)
        return self

    def __exit__(self, *exc):
        if self.log_dir:
            import jax

            jax.profiler.stop_trace()
        return False
