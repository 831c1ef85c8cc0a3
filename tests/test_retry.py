"""Retry wrapper: the RobustCMMCore policy matrix
(reference ``tests/test_robust_cmmcore.py:39-151``)."""

import pytest

from shrimpy_tpu.utils.retry import RobustProxy, retry, robust_call


class Flaky:
    def __init__(self, fail_times: int, exc=RuntimeError):
        self.fail_times = fail_times
        self.calls = 0
        self.exc = exc

    def method(self, value=1):
        self.calls += 1
        if self.calls <= self.fail_times:
            raise self.exc("transient")
        return value * 10

    def always_fails(self):
        self.calls += 1
        raise RuntimeError("permanent")

    @property
    def attr(self):
        return 42


def test_robust_call_retries_then_succeeds():
    flaky = Flaky(fail_times=2)
    out = robust_call(flaky.method, 3, attempts=3, wait_s=0.0)
    assert out == 30
    assert flaky.calls == 3


def test_robust_call_exhausts_and_raises():
    flaky = Flaky(fail_times=10)
    with pytest.raises(RuntimeError, match="transient"):
        robust_call(flaky.method, attempts=3, wait_s=0.0)
    assert flaky.calls == 3


def test_no_retry_exceptions_propagate_immediately():
    flaky = Flaky(fail_times=5, exc=KeyboardInterrupt)
    with pytest.raises(KeyboardInterrupt):
        robust_call(
            flaky.method, attempts=3, wait_s=0.0, no_retry=(KeyboardInterrupt,)
        )
    assert flaky.calls == 1


def test_retry_decorator():
    calls = []

    @retry(attempts=2, wait_s=0.0)
    def sometimes():
        calls.append(1)
        if len(calls) < 2:
            raise OSError("io")
        return "ok"

    assert sometimes() == "ok"
    assert len(calls) == 2


def test_robust_proxy_wraps_methods():
    flaky = Flaky(fail_times=2)
    proxy = RobustProxy(flaky, attempts=3, wait_s=0.0)
    assert proxy.method(2) == 20
    assert flaky.calls == 3
    # non-callable attributes pass through
    assert proxy.attr == 42


def test_robust_proxy_no_retry_methods():
    flaky = Flaky(fail_times=5)
    proxy = RobustProxy(
        flaky, attempts=3, wait_s=0.0, no_retry_methods=frozenset({"method"})
    )
    with pytest.raises(RuntimeError):
        proxy.method()
    assert flaky.calls == 1
