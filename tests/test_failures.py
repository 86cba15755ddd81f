"""OOM fallback + finiteness utilities."""

import numpy as np
import pytest

from glimpseprune_tpu.utils.failures import (
    assert_finite,
    is_oom_error,
    with_oom_fallback,
)


def test_oom_fallback_retries_then_succeeds():
    calls = []

    @with_oom_fallback([{"size": 2}, {"size": 1}])
    def fn(size=4):
        calls.append(size)
        if size > 1:
            raise RuntimeError("RESOURCE_EXHAUSTED: TPU backend error")
        return size

    assert fn() == 1
    assert calls == [4, 2, 1]


def test_oom_fallback_reraises_non_oom():
    @with_oom_fallback([{"size": 1}])
    def fn(size=4):
        raise ValueError("boom")

    with pytest.raises(ValueError):
        fn()


def test_oom_fallback_exhausted():
    @with_oom_fallback([{"size": 2}])
    def fn(size=4):
        raise RuntimeError("RESOURCE_EXHAUSTED again")

    with pytest.raises(RuntimeError, match="RESOURCE_EXHAUSTED"):
        fn()


def test_assert_finite():
    assert_finite({"a": np.ones(3)}, "ok")
    with pytest.raises(FloatingPointError, match="bad:a"):
        assert_finite({"a": np.array([1.0, np.nan])}, "bad")
    assert is_oom_error(RuntimeError("RESOURCE_EXHAUSTED: x"))
    assert not is_oom_error(RuntimeError("other"))


def test_debug_calls_and_profiler_trace(capsys, tmp_path, monkeypatch):
    import numpy as np
    from glimpseprune_tpu.utils.profiling import debug_calls, profiler_trace

    @debug_calls(every_n=2)
    def f(x):
        return x + 1

    for _ in range(4):
        f(np.zeros((2, 3)))
    out = capsys.readouterr().out
    assert out.count("[debug_calls]") == 2 and "ndarray(2, 3)" in out

    # env-gated path off by default
    @debug_calls()
    def g(x):
        return x

    g(1)
    assert "[debug_calls]" not in capsys.readouterr().out
    monkeypatch.setenv("DEBUG_CALLS_N", "1")
    g(1)
    assert "[debug_calls]" in capsys.readouterr().out

    # trace writes something under log_dir; None is a no-op
    import jax.numpy as jnp
    with profiler_trace(str(tmp_path)):
        jnp.ones(8).sum().block_until_ready()
    import os
    assert any(os.scandir(tmp_path))
    with profiler_trace(None):
        pass


def test_oom_resilient_step_cross_host_agreement(monkeypatch):
    """All hosts skip together when any host OOMs (reference
    warppers.py:443-494 all-reduces the failure indicator)."""
    from glimpseprune_tpu.utils import failures

    calls = []

    # simulate 4 hosts: host 2 failed this step
    monkeypatch.setattr(
        "glimpseprune_tpu.utils.multihost.gather_objects",
        lambda ok, max_bytes=64: ([True, True, ok, True], calls.append(ok))[0],
    )

    @failures.oom_resilient_step(skip_value="skipped")
    def step():
        return "result"

    # local success but a remote host failed -> skip in sync
    monkeypatch.setattr(
        "glimpseprune_tpu.utils.multihost.gather_objects",
        lambda ok, max_bytes=64: [True, True, False, ok],
    )
    with pytest.warns(UserWarning, match="another host OOMed"):
        assert step() == "skipped"

    # local OOM -> every host sees False and skips
    monkeypatch.setattr(
        "glimpseprune_tpu.utils.multihost.gather_objects",
        lambda ok, max_bytes=64: [True, True, True, ok],
    )

    @failures.oom_resilient_step(skip_value=None)
    def bad_step():
        raise RuntimeError("RESOURCE_EXHAUSTED: out of memory on host")

    with pytest.warns(UserWarning, match="all hosts skip"):
        assert bad_step() is None

    # all ok -> result flows through
    assert step() == "result"

    # non-OOM errors re-raise
    @failures.oom_resilient_step()
    def broken():
        raise ValueError("boom")

    with pytest.raises(ValueError):
        broken()
