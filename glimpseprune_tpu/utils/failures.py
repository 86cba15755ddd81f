"""Failure handling: OOM fallback + numerics debugging.

The reference guards the RL forward with `oom_resilient` decorators that
catch CUDA OOM and coordinate a skip across ranks (warppers.py:443-494).
Static shapes remove most of that failure class on TPU (SURVEY.md §5); what
remains is bucket-size overflow — `with_oom_fallback` retries a callable
with progressively smaller kwargs (e.g. max_pixels) on RESOURCE_EXHAUSTED.
"""

from __future__ import annotations

import functools
import warnings
from typing import Any, Callable, Dict, List, Optional, Sequence


def is_oom_error(e: BaseException) -> bool:
    return "RESOURCE_EXHAUSTED" in str(e) or "Out of memory" in str(e)


def with_oom_fallback(
    fallback_kwargs: Sequence[Dict[str, Any]],
    on_fallback: Optional[Callable[[int, BaseException], None]] = None,
):
    """Decorator: retry fn with each kwargs override on OOM.

    Example:
        @with_oom_fallback([{"max_pixels": 512 * 28 * 28},
                            {"max_pixels": 256 * 28 * 28}])
        def run(sample, max_pixels=None): ...
    """

    def decorator(fn):
        @functools.wraps(fn)
        def wrapper(*args, **kwargs):
            try:
                return fn(*args, **kwargs)
            except Exception as e:  # jax surfaces OOM as XlaRuntimeError
                if not is_oom_error(e):
                    raise
                last = e
                for i, override in enumerate(fallback_kwargs):
                    warnings.warn(
                        f"{fn.__name__}: OOM, retrying with {override} "
                        f"(fallback {i + 1}/{len(fallback_kwargs)})"
                    )
                    if on_fallback:
                        on_fallback(i, e)
                    try:
                        return fn(*args, **{**kwargs, **override})
                    except Exception as e2:
                        if not is_oom_error(e2):
                            raise
                        last = e2
                raise last

        return wrapper

    return decorator


def all_hosts_agree_ok(ok: bool) -> bool:
    """Cross-host failure agreement: True iff EVERY host succeeded.

    The reference all-reduces a failure indicator so all ranks skip or
    proceed together (warppers.py:443-494 oom_handler) — without it, a
    multi-host step that OOMs on one host deadlocks the others in the next
    collective. Every host must call this each step (success or failure);
    single-host returns `ok` untouched.
    """
    from glimpseprune_tpu.utils.multihost import gather_objects

    return all(gather_objects(bool(ok), max_bytes=64))


def oom_resilient_step(skip_value: Any = None):
    """Decorator (reference `oom_resilient`, warppers.py:443-494): catch OOM
    in a per-step callable and coordinate the skip across hosts — if ANY
    host OOMs, every host returns `skip_value` for that step."""

    def decorator(fn):
        @functools.wraps(fn)
        def wrapper(*args, **kwargs):
            ok, result, err = True, None, None
            try:
                result = fn(*args, **kwargs)
            except Exception as e:
                if not is_oom_error(e):
                    raise
                ok, err = False, e
            if all_hosts_agree_ok(ok):
                return result
            if err is not None:
                warnings.warn(f"{fn.__name__}: OOM — all hosts skip this step ({err})")
            else:
                warnings.warn(f"{fn.__name__}: another host OOMed — skipping in sync")
            return skip_value

        return wrapper

    return decorator


def enable_nan_checks(enabled: bool = True):
    """Turn on jax nan debugging (the reference has no sanitizer layer;
    SURVEY.md §5 recommends jax.debug_nans as the TPU equivalent)."""
    import jax

    jax.config.update("jax_debug_nans", enabled)


def assert_finite(tree, name: str = "tree"):
    """Host-side finiteness assertion over a pytree (post-step check)."""
    import jax
    import numpy as np

    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        arr = np.asarray(leaf)
        if arr.dtype.kind == "f" and not np.isfinite(arr).all():
            p = "/".join(str(getattr(k, "key", k)) for k in path)
            raise FloatingPointError(f"non-finite values in {name}:{p}")
