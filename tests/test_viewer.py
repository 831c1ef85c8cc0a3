"""Viewer ring + feeder: torn-slot detection, budget sizing, row gather."""

import numpy as np
import pytest

from shrimpy_tpu.viewer.ring import FrameRing


@pytest.fixture()
def ring():
    r = FrameRing(None, n_slots=4, frame_shape=(8, 16))
    yield r
    r.close()


def test_ring_write_read_roundtrip(ring):
    frame = np.arange(128, dtype=np.float32).reshape(8, 16)
    slot = ring.write(0, frame)
    seq, out = ring.read(slot)
    assert seq == 0
    np.testing.assert_array_equal(out, frame)


def test_ring_overwrites_oldest(ring):
    for seq in range(6):  # 6 frames into 4 slots
        ring.write(seq, np.full((8, 16), seq, np.float32))
    seq, latest = ring.latest()
    assert seq == 5
    assert latest[0, 0] == 5
    # Slot 0 now holds seq 4 (overwritten).
    assert ring.read(0)[0] == 4


def test_ring_read_rows_gather(ring):
    for seq in range(4):
        ring.write(seq, np.full((8, 16), seq, np.float32))
    rows = ring.read_rows(3, [0, 1, 2, 3])
    assert rows.shape == (4, 16)
    np.testing.assert_array_equal(rows[:, 0], [0, 1, 2, 3])


def test_slots_for_budget():
    # 1 MB budget, 8x16 float32 frames (512 B) -> 2048 slots.
    assert FrameRing.slots_for_budget(1.0, (8, 16)) == 2048
    # Tiny budget clamps to the 2-slot minimum.
    assert FrameRing.slots_for_budget(0.0001, (2048, 2048)) == 2


def test_cross_handle_visibility():
    """A reader attached by name sees the writer's frames (the
    cross-process contract, exercised in-process)."""
    writer = FrameRing(None, n_slots=2, frame_shape=(4, 4))
    try:
        reader = FrameRing(
            writer.name, n_slots=2, frame_shape=(4, 4), create=False
        )
        writer.write(7, np.full((4, 4), 3.5, np.float32))
        seq, frame = reader.latest()
        assert seq == 7
        assert frame[0, 0] == 3.5
        reader.close()
    finally:
        writer.close()


def test_feeder_never_raises_without_start():
    from shrimpy_tpu.viewer.feeder import ViewerFeeder

    feeder = ViewerFeeder(frame_shape=(8, 16))
    # Hook before start() silently no-ops (never-raise contract).
    feeder.on_volume(np.zeros((2, 8, 16), np.float32), 0, "0", "BF")
    assert feeder.dropped == 0
