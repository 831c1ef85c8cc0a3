"""Frame-level replay camera: snap, z-stage tracking, sequenced bursts.

Mirrors the reference's ``tests/test_replay_camera.py`` tier on
coordinate-encoded fixtures (pixel values encode their own (p,t,c,z),
reference ``tests/test_replay_camera.py:33-49``): free-running snap
auto-increment, stage-tracked z selection with clipping, SequencedEvent
z-queue semantics (``replay_camera.py:470-521``), and the one-volume
LRU cache (``:293-308``).
"""

import pytest

from shrimpy_tpu.engine import AcqEvent, ReplayCamera, ReplaySource, SequencedBurst
from shrimpy_tpu.io.synthetic import (
    coordinate_encoded_fov,
    coordinate_encoded_plate,
    coordinate_encoded_value,
)


@pytest.fixture()
def camera(tmp_path):
    coordinate_encoded_fov(tmp_path / "src.zarr", shape=(3, 2, 5, 8, 8))
    return ReplayCamera(ReplaySource(tmp_path / "src.zarr"))


def test_free_running_snap_auto_increments_t(camera):
    camera.connect_z_stage(origin_um=0.0)
    f0 = camera.snap()
    f1 = camera.snap()
    z_center = 2
    assert f0[0, 0] == coordinate_encoded_value(0, 0, 0, z_center)
    assert f1[0, 0] == coordinate_encoded_value(0, 1, 0, z_center)
    # wraps at the dataset depth
    camera.snap()
    f3 = camera.snap()
    assert f3[0, 0] == coordinate_encoded_value(0, 0, 0, z_center)


def test_z_stage_tracking_maps_um_to_index(camera):
    camera.connect_z_stage(origin_um=100.0)
    z_step = camera._z_step_um
    camera.set_z_um(100.0 + 2 * z_step)
    assert camera.snap()[0, 0] == coordinate_encoded_value(0, 0, 0, 4)
    camera.set_z_um(100.0 - 1 * z_step)
    assert camera.snap()[0, 0] == coordinate_encoded_value(0, 1, 0, 1)
    # clipped at stack bounds
    camera.set_z_um(100.0 + 50 * z_step)
    assert camera.snap()[0, 0] == coordinate_encoded_value(0, 2, 0, 4)
    camera.set_z_um(100.0 - 50 * z_step)
    assert camera.snap()[0, 0] == coordinate_encoded_value(0, 0, 0, 0)


def test_sequenced_burst_queues_z_indices(camera):
    burst = SequencedBurst(
        [AcqEvent(t=1, channel="ch1", z_index=z) for z in (3, 0, 4)]
    )
    camera.on_event(burst)
    for expect_z in (3, 0, 4):
        assert camera.snap()[0, 0] == coordinate_encoded_value(0, 1, 1, expect_z)
    # queue drained: falls back to stage-tracked z, t stays event-pinned
    assert camera.snap()[0, 0] == coordinate_encoded_value(0, 1, 1, 2)


def test_single_event_pins_state(camera):
    camera.on_event(AcqEvent(t=2, channel="ch0", z_index=1))
    assert camera.snap()[0, 0] == coordinate_encoded_value(0, 2, 0, 1)
    # event-driven: no auto-increment
    camera.on_event(AcqEvent(t=2, channel="ch0", z_index=1))
    assert camera.snap()[0, 0] == coordinate_encoded_value(0, 2, 0, 1)


def test_event_switches_position_on_plate(tmp_path):
    coordinate_encoded_plate(
        tmp_path / "plate.zarr", n_positions=2, shape_tczyx=(1, 1, 3, 8, 8)
    )
    camera = ReplayCamera(ReplaySource(tmp_path / "plate.zarr"))
    camera.on_event(AcqEvent(t=0, position="0/1/001", z_index=1))
    assert camera.snap()[0, 0] == coordinate_encoded_value(1, 0, 0, 1)
    with pytest.raises(KeyError):
        camera.on_event(AcqEvent(t=0, position="9/9/999"))


def test_one_volume_cache_decodes_once(camera):
    """A full sequenced z-sweep decodes the source volume exactly once;
    switching channels evicts (one-volume LRU, replay_camera.py:293-308)."""
    src = camera.source
    src.cache_misses = 0
    camera.on_event(
        SequencedBurst([AcqEvent(t=0, channel="ch0", z_index=z) for z in range(5)])
    )
    vol = camera.snap_volume()
    assert vol.shape == (5, 8, 8)
    assert src.cache_misses == 1
    camera.on_event(AcqEvent(t=0, channel="ch1", z_index=0))
    camera.snap()
    assert src.cache_misses == 2
    # returning to the evicted volume re-decodes (cache depth is one)
    camera.on_event(AcqEvent(t=0, channel="ch0", z_index=0))
    camera.snap()
    assert src.cache_misses == 3


def test_z_um_event_moves_stage(camera):
    camera.connect_z_stage(origin_um=0.0)
    camera.on_event(AcqEvent(t=0, channel="ch0", z_um=camera._z_step_um))
    assert camera.snap()[0, 0] == coordinate_encoded_value(0, 0, 0, 3)


def test_burst_z_um_routes_through_stage_model(tmp_path):
    """SequencedBurst sub-events carrying z_um (stage targets) convert
    through the same z-stage model as single events — never a silent
    center-slice default."""
    from shrimpy_tpu.engine.replay import AcqEvent, ReplayCamera, SequencedBurst
    from shrimpy_tpu.io.synthetic import coordinate_encoded_fov

    coordinate_encoded_fov(tmp_path / "src.zarr", shape=(2, 1, 5, 8, 8))
    source = ReplaySource(tmp_path / "src.zarr")
    cam = ReplayCamera(source, z_step_um=1.0)
    # Stage targets 1 um apart map to consecutive source slices around
    # the center (z_center=2 at the origin).
    cam.on_event(SequencedBurst(events=[
        AcqEvent(t=0, channel=None, position="0", z_um=float(u))
        for u in (-2.0, -1.0, 0.0, 1.0, 2.0)
    ]))
    frames = [cam.snap() for _ in range(5)]
    for zi, f in enumerate(frames):
        assert f[0, 0] == coordinate_encoded_value(0, 0, 0, zi), zi
