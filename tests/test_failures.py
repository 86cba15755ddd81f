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
