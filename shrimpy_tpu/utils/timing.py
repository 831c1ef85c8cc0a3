"""Per-stage wall-clock + memory telemetry.

The reference instruments every heavy stage with ``time.monotonic()``
deltas and psutil RSS gauges (reference ``tracking.py:1034-1065``,
``preprocessing.py:282-316,418-433``, ``position_update.py:22-26``).
This module provides the structured equivalent: a reusable stage timer
that logs wall time, host RSS, and (when available) per-device HBM
usage, plus an optional ``jax.profiler`` trace hook — the idiomatic TPU
counterpart of the reference's ad-hoc GPU memory logging.
"""

from __future__ import annotations

import contextlib
import logging
import os
import time
from dataclasses import dataclass, field

import psutil

logger = logging.getLogger(__name__)

_PROC = psutil.Process(os.getpid())


def rss_gb() -> float:
    """Host resident-set size in GiB."""
    return _PROC.memory_info().rss / (1024**3)


def device_memory_stats() -> dict[str, float]:
    """Per-device HBM usage in GiB, if the backend exposes it."""
    import jax

    stats: dict[str, float] = {}
    for d in jax.local_devices():
        try:
            s = d.memory_stats()
        except Exception:  # backend may not support it (CPU)
            continue
        if s and "bytes_in_use" in s:
            stats[str(d)] = s["bytes_in_use"] / (1024**3)
    return stats


def memory_report() -> str:
    """One-line host + device memory summary."""
    parts = [f"rss={rss_gb():.2f}GiB"]
    for dev, gib in device_memory_stats().items():
        parts.append(f"{dev}={gib:.2f}GiB")
    return " ".join(parts)


@dataclass
class StageRecord:
    name: str
    seconds: float
    rss_gb: float


@dataclass
class StageTimer:
    """Accumulates named stage timings for a pipeline run.

    Usage::

        timer = StageTimer()
        with timer.stage("deskew"):
            out = deskew(...)
        logger.info(timer.summary())
    """

    records: list[StageRecord] = field(default_factory=list)

    @contextlib.contextmanager
    def stage(self, name: str, log: bool = True):
        t0 = time.monotonic()
        try:
            yield
        finally:
            dt = time.monotonic() - t0
            rec = StageRecord(name, dt, rss_gb())
            self.records.append(rec)
            if log:
                logger.info("stage %-20s %8.3fs  rss=%.2fGiB", name, dt, rec.rss_gb)

    def total(self) -> float:
        return sum(r.seconds for r in self.records)

    def summary(self) -> str:
        lines = [f"  {r.name:<24} {r.seconds:8.3f}s" for r in self.records]
        lines.append(f"  {'TOTAL':<24} {self.total():8.3f}s")
        return "\n".join(lines)

    def as_dict(self) -> dict[str, float]:
        out: dict[str, float] = {}
        for r in self.records:
            out[r.name] = out.get(r.name, 0.0) + r.seconds
        return out


@contextlib.contextmanager
def stage_timer(name: str, level: int = logging.INFO):
    """Standalone timing context (single stage)."""
    t0 = time.monotonic()
    try:
        yield
    finally:
        # memory_report() costs a per-device memory_stats RPC (a full
        # dispatch round-trip over a tunneled TPU): only pay it when
        # the record will actually be emitted.
        if logger.isEnabledFor(level):
            logger.log(
                level, "%s took %.3fs (%s)",
                name, time.monotonic() - t0, memory_report(),
            )


@contextlib.contextmanager
def profiler_trace(log_dir: str | None):
    """Wrap a region in a ``jax.profiler`` trace when ``log_dir`` is set."""
    if not log_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
