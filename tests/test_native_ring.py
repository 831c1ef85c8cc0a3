"""Native seqlock frame-ring core (shrimpy_tpu/native/ring.c).

Covers: build+load, native/numpy path parity on the same shared
segment, torn-slot detection under a GIL-free concurrent writer, and
the SHRIMPY_NATIVE_RING=0 fallback.
"""

from __future__ import annotations

import threading

import numpy as np
import pytest

from shrimpy_tpu.native import load_ring
from shrimpy_tpu.viewer.ring import FrameRing

pytestmark = pytest.mark.quick


def test_native_library_builds_and_loads():
    lib = load_ring()
    assert lib is not None, "host has cc; the native ring must build"


def test_env_knob_disables_native(monkeypatch):
    monkeypatch.setenv("SHRIMPY_NATIVE_RING", "0")
    ring = FrameRing(None, n_slots=2, frame_shape=(4, 4))
    try:
        assert ring._lib is None
        ring.write(3, np.full((4, 4), 7.0, np.float32))
        seq, frame = ring.read(3 % 2)
        assert seq == 3
        np.testing.assert_array_equal(frame, 7.0)
    finally:
        ring.close()


def test_native_and_numpy_paths_share_one_layout(monkeypatch):
    """A numpy-path reader attached to the same segment must see
    frames published by the native writer (layout contract), and vice
    versa."""
    writer = FrameRing(None, n_slots=4, frame_shape=(8, 16))
    assert writer._lib is not None
    monkeypatch.setenv("SHRIMPY_NATIVE_RING", "0")
    reader = FrameRing(
        writer.name, n_slots=4, frame_shape=(8, 16), create=False
    )
    assert reader._lib is None
    try:
        frame = np.arange(8 * 16, dtype=np.float32).reshape(8, 16)
        writer.write(5, frame)                      # native write
        seq, got = reader.read(5 % 4)               # numpy read
        assert seq == 5
        np.testing.assert_array_equal(got, frame)
        reader.write(9, frame * 2)                  # numpy write
        seq, got = writer.read(9 % 4)               # native read
        assert seq == 9
        np.testing.assert_array_equal(got, frame * 2)
    finally:
        reader.close()
        writer.close()


def test_native_read_rows_matches_numpy(monkeypatch):
    native = FrameRing(None, n_slots=4, frame_shape=(8, 16))
    assert native._lib is not None
    monkeypatch.setenv("SHRIMPY_NATIVE_RING", "0")
    plain = FrameRing(
        native.name, n_slots=4, frame_shape=(8, 16), create=False
    )
    try:
        rng = np.random.default_rng(0)
        for s in range(4):
            native.write(s, rng.random((8, 16), dtype=np.float32))
        slots = [2, None, 0, 3]
        np.testing.assert_array_equal(
            native.read_rows(5, slots), plain.read_rows(5, slots)
        )
    finally:
        plain.close()
        native.close()


def test_unwritten_and_torn_slots_report_minus_one():
    ring = FrameRing(None, n_slots=2, frame_shape=(4, 4))
    try:
        seq, _ = ring.read(1)
        assert seq == -1  # never written
        # Simulate mid-write state: marker set, data half-written.
        ring._seq[0] = -1
        seq, _ = ring.read(0)
        assert seq == -1
    finally:
        ring.close()


def test_concurrent_writer_never_yields_mixed_consistent_frame():
    """Hammer: a GIL-free native writer spins constant-valued frames
    (value == seq); any read reporting a consistent sequence must
    return the matching uniform frame — mixed bytes with a clean
    sequence number is exactly the seqlock violation the fences
    prevent."""
    ring = FrameRing(None, n_slots=2, frame_shape=(64, 64))
    assert ring._lib is not None
    stop = threading.Event()
    frames = [
        np.full((64, 64), float(s), np.float32) for s in range(64)
    ]

    def writer():
        s = 0
        while not stop.is_set():
            ring.write(s % 64, frames[s % 64])
            s += 1

    t = threading.Thread(target=writer, daemon=True)
    t.start()
    try:
        consistent = 0
        for _ in range(3000):
            for slot in (0, 1):
                seq, frame = ring.read(slot)
                if seq >= 0:
                    consistent += 1
                    vals = np.unique(frame)
                    assert vals.size == 1 and vals[0] == float(seq), (
                        f"torn frame published as consistent seq={seq}"
                    )
        assert consistent > 0
    finally:
        stop.set()
        t.join(timeout=5)
        ring.close()
