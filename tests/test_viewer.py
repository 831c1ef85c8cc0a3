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


def test_deskew_preview_matches_volume_deskew(rng):
    """The row-gather preview equals the corresponding lab z-plane of a
    full volume deskew (up to the interpolation convention)."""
    import math

    from shrimpy_tpu.config import DeskewSettings
    from shrimpy_tpu.io.synthetic import render_beads_skewed
    from shrimpy_tpu.ops.deskew import deskew_volume
    from shrimpy_tpu.viewer.deskew_preview import deskew_preview_plane

    settings = DeskewSettings(
        ls_angle_deg=30.0, px_to_scan_ratio=0.386, keep_overhang=True
    )
    beads = np.array([[5.0, 40.0, 12.0], [8.0, 70.0, 20.0]])
    raw = render_beads_skewed((64, 32, 32), beads)

    t_row = 10  # lab z = 10 * sin(30 deg) = 5.0
    preview = deskew_preview_plane(raw[:, t_row, :], settings)

    full = np.asarray(deskew_volume(raw, settings))
    z_lab = int(round(t_row * math.sin(math.radians(30.0))))
    # The preview's y axis is offset by t*cos(theta) lab pixels.
    y_off = t_row * math.cos(math.radians(30.0))
    n = min(preview.shape[0], full.shape[1] - int(np.ceil(y_off)) - 1)
    ref_plane = full[z_lab, int(round(y_off)) : int(round(y_off)) + n, :]
    corr = np.corrcoef(preview[:n].ravel(), ref_plane.ravel())[0, 1]
    assert corr > 0.95, corr


def test_preview_from_ring(rng):
    from shrimpy_tpu.config import DeskewSettings
    from shrimpy_tpu.viewer.deskew_preview import preview_from_ring

    ring = FrameRing(None, n_slots=8, frame_shape=(16, 32))
    try:
        for s in range(8):
            ring.write(s, rng.random((16, 32), dtype=np.float32))
        settings = DeskewSettings(ls_angle_deg=30.0, px_to_scan_ratio=0.5)
        plane = preview_from_ring(ring, list(range(8)), tilt_row=4, settings=settings)
        assert plane.shape == (15, 32)  # floor(7/0.5)+1
        assert np.isfinite(plane).all()
    finally:
        ring.close()
