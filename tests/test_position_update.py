"""Position store + update manager: thread safety, baselines, drain.

Mirrors the reference's concurrency tier
(``tests/test_position_update.py:120-152,333-418``).
"""

import threading
import time

import numpy as np
import pytest

from shrimpy_tpu.tracking.position import PositionStore, PositionUpdateManager


def test_store_set_get_update():
    store = PositionStore()
    store.set("A", 1.0, 2.0, 3.0)
    assert store.get("A").as_array().tolist() == [1.0, 2.0, 3.0]
    store.update("A", 0.5, -1.0, 0.0)
    assert store.get("A").as_array().tolist() == [1.5, 1.0, 3.0]
    assert store.get("missing") is None


def test_store_thread_safety_hammer():
    store = PositionStore()
    store.set("P", 0.0, 0.0, 0.0)
    n, threads = 200, 8

    def worker():
        for _ in range(n):
            store.update("P", 1.0, 1.0, 1.0)

    ts = [threading.Thread(target=worker) for _ in range(threads)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert store.get("P").as_array().tolist() == [n * threads] * 3


def test_baseline_correction_applied():
    store = PositionStore()
    store.set("P", 100.0, 200.0, 50.0)
    mgr = PositionUpdateManager(store, lambda stack, t, p: np.array([1.0, -2.0, 0.5]))
    mgr.record_acquisition(0, "P")
    # Simulate the pre-fetch race: the store moves after acquisition.
    store.set("P", 999.0, 999.0, 999.0)
    fut = mgr.on_stack_complete(np.zeros((2, 2, 2)), 0, "P")
    assert fut.result(timeout=10)
    # Correction is relative to the FROZEN baseline, not the moved store.
    np.testing.assert_allclose(store.get("P").as_array(), [99.0, 202.0, 49.5])
    mgr.shutdown()


def test_no_baseline_skips_correction():
    store = PositionStore()
    store.set("P", 10.0, 10.0, 10.0)
    mgr = PositionUpdateManager(store, lambda s, t, p: np.array([5.0, 5.0, 5.0]))
    fut = mgr.on_stack_complete(np.zeros((2, 2, 2)), 3, "P")  # no baseline
    assert fut.result(timeout=10) is False
    np.testing.assert_allclose(store.get("P").as_array(), [10.0, 10.0, 10.0])
    mgr.shutdown()


def test_updater_failure_keeps_position():
    store = PositionStore()
    store.set("P", 7.0, 7.0, 7.0)

    def bad_updater(stack, t, p):
        raise RuntimeError("compute failed")

    mgr = PositionUpdateManager(store, bad_updater)
    mgr.record_acquisition(0, "P")
    fut = mgr.on_stack_complete(np.zeros((2, 2, 2)), 0, "P")
    assert fut.result(timeout=10) is False
    np.testing.assert_allclose(store.get("P").as_array(), [7.0, 7.0, 7.0])
    mgr.shutdown()


def test_drain_pending_blocks_until_done():
    store = PositionStore()
    store.set("P", 0.0, 0.0, 0.0)
    started = threading.Event()

    def slow_updater(stack, t, p):
        started.set()
        time.sleep(0.3)
        return np.array([1.0, 0.0, 0.0])

    mgr = PositionUpdateManager(store, slow_updater)
    mgr.record_acquisition(0, "P")
    mgr.on_stack_complete(np.zeros((2, 2, 2)), 0, "P")
    started.wait(timeout=5)
    t0 = time.monotonic()
    assert mgr.drain_pending()
    assert time.monotonic() - t0 >= 0.1  # actually waited
    np.testing.assert_allclose(store.get("P").as_array(), [-1.0, 0.0, 0.0])
    mgr.shutdown()


def test_updates_serialized_single_worker():
    """At most one computation in flight (reference single-worker)."""
    store = PositionStore()
    active = []
    overlap = []

    def updater(stack, t, p):
        active.append(1)
        if len(active) > 1:
            overlap.append(True)
        time.sleep(0.05)
        active.pop()
        return np.zeros(3)

    mgr = PositionUpdateManager(store, updater)
    for t in range(4):
        store.set("P", 0, 0, 0)
        mgr.record_acquisition(t, "P")
        mgr.on_stack_complete(np.zeros((2, 2, 2)), t, "P")
    mgr.drain_pending()
    assert not overlap
    mgr.shutdown()
