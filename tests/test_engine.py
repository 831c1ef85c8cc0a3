"""Acquisition engine: replay, SkipEvent zero-padding, naming, tracking.

Mirrors the reference's integration tier
(``tests/test_mantis_integration.py:93-292``,
``tests/test_dynatrack_manager.py:508+``) on coordinate-encoded and
drifting-blob fixtures.
"""

import json

import numpy as np
import pytest

from shrimpy_tpu.engine import AcquisitionEngine, AcquisitionPlan, ReplaySource
from shrimpy_tpu.engine.engine import resolve_acquisition_name
from shrimpy_tpu.io.ngff import open_ngff
from shrimpy_tpu.io.synthetic import (
    coordinate_encoded_fov,
    coordinate_encoded_plate,
    coordinate_encoded_value,
    synthetic_blob_fov,
)


@pytest.fixture()
def fov_source(tmp_path):
    coordinate_encoded_fov(tmp_path / "src.zarr", shape=(2, 2, 4, 16, 16))
    return ReplaySource(tmp_path / "src.zarr")


def test_replay_source_serves_encoded_values(fov_source):
    vol = fov_source.volume("0", t=1, c=1)
    assert vol[2, 0, 0] == coordinate_encoded_value(0, 1, 1, 2)
    # timepoint wrap-around
    vol = fov_source.volume("0", t=3, c=0)
    assert vol[0, 0, 0] == coordinate_encoded_value(0, 1, 0, 0)


def test_basic_acquisition_roundtrip(tmp_path, fov_source):
    plan = AcquisitionPlan(time={"n_timepoints": 2})
    out = AcquisitionEngine(fov_source).acquire(tmp_path / "out", "acq", plan)
    store = open_ngff(out)
    pos = store.position()
    assert pos.shape == (2, 2, 4, 16, 16)
    data = pos.read()
    for t in range(2):
        for c in range(2):
            for z in range(4):
                assert data[t, c, z, 0, 0] == coordinate_encoded_value(0, t, c, z)
    summary = json.loads(
        (tmp_path / "out" / "acq_summary_metadata.json").read_text()
    )
    assert summary["volumes_acquired"] == 4
    assert summary["skipped_autofocus"] == []
    # Environment provenance (reference _logging.py:92-136): the
    # sidecar records the toolchain so bench/number archaeology can
    # tell a version change from a regression.
    env = summary["environment"]
    assert env["python"] and env["jax"] and env["numpy"]


def test_name_auto_increment(tmp_path, fov_source):
    plan = AcquisitionPlan()
    eng = AcquisitionEngine(fov_source)
    out1 = eng.acquire(tmp_path / "out", "acq", plan)
    out2 = eng.acquire(tmp_path / "out", "acq", plan)
    assert out1.name == "acq.zarr"
    assert out2.name == "acq_1.zarr"
    assert resolve_acquisition_name(tmp_path / "out", "acq") == "acq_2"


def test_autofocus_failure_zero_pads_on_disk(tmp_path, fov_source):
    plan = AcquisitionPlan(
        time={"n_timepoints": 2},
        autofocus={"enabled": True, "fail_at_indices": [1]},  # t=1, p=0
    )
    out = AcquisitionEngine(fov_source).acquire(tmp_path / "out", "acq", plan)
    data = open_ngff(out).position().read()
    # t=0 intact, t=1 zero-padded (read back from disk, as the reference
    # integration test verifies).
    assert data[0, 0, 0, 0, 0] == coordinate_encoded_value(0, 0, 0, 0)
    assert np.all(data[1] == 0)
    summary = json.loads((tmp_path / "out" / "acq_summary_metadata.json").read_text())
    assert summary["skipped_autofocus"] == [[1, "0"]]


def test_hcs_plate_acquisition(tmp_path):
    coordinate_encoded_plate(
        tmp_path / "plate.zarr", n_positions=2, shape_tczyx=(1, 1, 3, 8, 8)
    )
    source = ReplaySource(tmp_path / "plate.zarr")
    out = AcquisitionEngine(source).acquire(
        tmp_path / "out", "plate_acq", AcquisitionPlan()
    )
    store = open_ngff(out)
    assert store.is_plate
    keys = sorted(store.positions())
    assert keys == ["0/0/000", "0/1/001"]
    for p, key in enumerate(keys):
        data = store.positions()[key].read()
        assert data[0, 0, 1, 0, 0] == coordinate_encoded_value(p, 0, 0, 1)


def test_viewer_hook_errors_are_contained(tmp_path, fov_source):
    calls = []

    def bad_hook(vol, t, p, channel):
        calls.append((t, channel))
        raise RuntimeError("viewer crashed")

    out = AcquisitionEngine(fov_source, viewer_hooks=[bad_hook]).acquire(
        tmp_path / "out", "acq", AcquisitionPlan()
    )
    assert out.exists()
    assert len(calls) == 2  # one per channel, errors swallowed


def test_tracking_recenters_drifting_blob(tmp_path):
    """End-to-end DynaTrack loop closure: with tracking enabled, the
    corrected stage offsets follow the drift so later volumes are
    re-centered (the reference's 'positions actually shift' test)."""
    synthetic_blob_fov(
        tmp_path / "drift.zarr",
        shape_zyx=(8, 48, 48),
        n_timepoints=4,
        drift_zyx=(0.0, 4.0, -6.0),
        noise=0.5,
        zyx_scale=(1.0, 1.0, 1.0),
    )
    source = ReplaySource(tmp_path / "drift.zarr")
    plan = AcquisitionPlan(
        time={"n_timepoints": 4},
        metadata={
            "dynatrack": {
                "input_channel": "BF",
                "tracking_channel": "BF",
                "tracking_method": "pcc",
                # Demo geometry: moving the simulated stage +d shifts the
                # displayed image -d, so image axes map to stage axes
                # with a sign flip (the reference's configurable
                # image_to_stage matrix exists for exactly this).
                "image_to_stage_matrix_xyz": [
                    [-1.0, 0.0, 0.0],
                    [0.0, -1.0, 0.0],
                    [0.0, 0.0, -1.0],
                ],
            }
        },
    )
    engine = AcquisitionEngine(source)
    out = engine.acquire(tmp_path / "out", "tracked", plan)

    # The shift journal recorded per-timepoint corrections.
    journal = (tmp_path / "out" / "tracked_dynatrack_log.csv").read_text().splitlines()
    assert len(journal) == 1 + 4  # header + 4 timepoints

    # The stage ended up following the accumulated drift (x drifts -6/t,
    # stage correction is cumulative and negative of centering error).
    pos = engine._tracking.store.get("0") if engine._tracking else None
    data = open_ngff(out).position().read()
    # Tracked volumes at late timepoints are re-centered: the blob peak
    # should be closer to center than the uncorrected drift (3*(4,-6)).
    t3 = data[3, 0]
    peak = np.unravel_index(np.argmax(t3), t3.shape)
    center = np.array([4, 24, 24])
    uncorrected_err = np.linalg.norm([0, 3 * 4.0, 3 * -6.0])
    corrected_err = np.linalg.norm(np.array(peak) - center)
    assert corrected_err < uncorrected_err, (peak, uncorrected_err)


def test_periodic_refocus_recenters_z(tmp_path):
    """A defocused sample: the refocus routine shifts z so later
    timepoints are served re-centered (O3 remote-refocus parity)."""
    from scipy import ndimage

    from shrimpy_tpu.io.ngff import create_fov

    rng2 = np.random.default_rng(1)
    nz, ny, nx = 15, 48, 48
    sharp = rng2.random((ny, nx)).astype(np.float32)
    in_focus = 11  # off-center by +4 from nz//2=7
    stack = np.stack([
        ndimage.gaussian_filter(sharp, abs(z - in_focus) * 0.9 + 0.01)
        for z in range(nz)
    ])
    pos = create_fov(tmp_path / "src.zarr", shape=(2, 1, nz, ny, nx),
                     dtype="float32", channel_names=["BF"],
                     zyx_scale=(0.25, 0.116, 0.116))
    for t in range(2):
        pos.write((t, 0), stack)

    source = ReplaySource(tmp_path / "src.zarr")
    plan = AcquisitionPlan(
        time={"n_timepoints": 2},
        refocus={"enabled": True, "interval_timepoints": 1},
    )
    engine = AcquisitionEngine(source)
    out = engine.acquire(tmp_path / "out", "rf", plan)

    summary = json.loads((tmp_path / "out" / "rf_summary_metadata.json").read_text())
    events = summary["refocus_events"]
    assert events and events[0][2] == in_focus - nz // 2  # +4 detected at t=0

    # t=1 was acquired with the corrected z offset: its in-focus plane
    # sits at (in_focus - offset) = center.
    data = open_ngff(out).position().read()
    from shrimpy_tpu.engine.autofocus import focus_from_transverse_band
    idx1 = focus_from_transverse_band(data[1, 0], pixel_size_um=0.116)
    assert abs(idx1 - nz // 2) <= 1


def test_engine_autoexposure_records_per_position(tmp_path, fov_source):
    plan = AcquisitionPlan(
        autoexposure={
            "enabled": True,
            "algorithm": "mean_intensity",
            "settings": {"min_intensity": 100.0, "max_intensity": 60000.0,
                          "target_intensity": 1000.0,
                          "default_exposure_ms": 10.0,
                          "max_exposure_ms": 100.0},
        }
    )
    eng = AcquisitionEngine(fov_source)
    eng.acquire(tmp_path / "out", "ae", plan)
    summary = json.loads((tmp_path / "out" / "ae_summary_metadata.json").read_text())
    assert "0" in summary["exposures"]
    exposure, power = summary["exposures"]["0"]
    assert exposure > 0 and power > 0


def test_engine_autoexposure_manual_csv(tmp_path, fov_source):
    csv = tmp_path / "illum.csv"
    csv.write_text("well,exposure_ms,laser_power\n0,12.5,30\n")
    plan = AcquisitionPlan(
        autoexposure={"enabled": True, "algorithm": "manual",
                       "manual_csv": str(csv)}
    )
    eng = AcquisitionEngine(fov_source)
    eng.acquire(tmp_path / "out", "ae", plan)
    summary = json.loads((tmp_path / "out" / "ae_summary_metadata.json").read_text())
    assert summary["exposures"]["0"] == [12.5, 30.0]


def test_tracking_with_deskew_preprocessing(tmp_path):
    """The engine's tracker consumes the preprocessed (deskewed) product
    when a preprocessing chain is configured."""
    from shrimpy_tpu.io.ngff import create_fov
    from shrimpy_tpu.io.synthetic import render_beads_skewed

    raw0 = render_beads_skewed((48, 24, 24), np.array([[5.0, 40.0, 12.0]]))
    raw1 = render_beads_skewed((48, 24, 24), np.array([[5.0, 44.0, 10.0]]))
    pos = create_fov(tmp_path / "src.zarr", shape=(2, 1, 48, 24, 24),
                     dtype="float32", channel_names=["LS"],
                     zyx_scale=(0.3, 0.116, 0.116))
    pos.write((0, 0), raw0)
    pos.write((1, 0), raw1)

    plan = AcquisitionPlan(
        time={"n_timepoints": 2},
        metadata={
            "dynatrack": {
                "input_channel": "LS",
                "tracking_channel": "LS",
                "tracking_method": "pcc",
                "preprocessing": ["deskew"],
                "deskew": {"ls_angle_deg": 30.0, "px_to_scan_ratio": 0.386},
            }
        },
    )
    engine = AcquisitionEngine(ReplaySource(tmp_path / "src.zarr"))
    engine.acquire(tmp_path / "out", "pre", plan)
    journal = (tmp_path / "out" / "pre_dynatrack_log.csv").read_text().splitlines()
    assert len(journal) == 3  # header + 2
    # t=1 shift reflects the LAB-frame bead motion (+4 y, -2 x), not the
    # skewed-frame motion — proof the deskew ran before tracking.
    import csv as _csv
    row = list(_csv.DictReader(journal.__iter__()))[1]
    assert abs(float(row["shift_y_px"]) - 4.0) <= 1.0
    assert abs(float(row["shift_x_px"]) + 2.0) <= 1.0


def test_refocus_offsets_survive_chunked_acquisitions(tmp_path):
    """Chunk resume: the second acquisition of the same name starts from
    the previous chunk's accumulated refocus offsets."""
    from scipy import ndimage

    from shrimpy_tpu.io.ngff import create_fov

    rng2 = np.random.default_rng(2)
    nz, ny, nx = 15, 48, 48
    sharp = rng2.random((ny, nx)).astype(np.float32)
    in_focus = 10  # +3 from center
    stack = np.stack([
        ndimage.gaussian_filter(sharp, abs(z - in_focus) * 0.9 + 0.01)
        for z in range(nz)
    ])
    pos = create_fov(tmp_path / "src.zarr", shape=(1, 1, nz, ny, nx),
                     dtype="float32", channel_names=["BF"],
                     zyx_scale=(0.25, 0.116, 0.116))
    pos.write((0, 0), stack)

    plan = AcquisitionPlan(refocus={"enabled": True, "interval_timepoints": 1})
    source = ReplaySource(tmp_path / "src.zarr")
    AcquisitionEngine(source).acquire(tmp_path / "out", "chunked", plan)

    # Chunk 2 (auto-incremented name): starts with the +3 offset restored,
    # so its stack is already centered and no further event fires.
    eng2 = AcquisitionEngine(ReplaySource(tmp_path / "src.zarr"))
    eng2.acquire(tmp_path / "out", "chunked", plan)
    assert eng2._refocus_z.get("0", 0) == in_focus - nz // 2
    summary2 = json.loads(
        (tmp_path / "out" / "chunked_1_summary_metadata.json").read_text()
    )
    assert summary2["refocus_events"] == []


def test_timepoint_interval_pacing(tmp_path, fov_source):
    """interval_s is honored against wall clock: timepoint t starts no
    earlier than start + t * interval (reference drives timepoints from
    the MDA time plan; our VERDICT-r1 weak item 8)."""
    import time

    plan = AcquisitionPlan(time={"n_timepoints": 3, "interval_s": 0.15})
    t0 = time.monotonic()
    AcquisitionEngine(fov_source).acquire(tmp_path / "out", "paced", plan)
    elapsed = time.monotonic() - t0
    assert elapsed >= 0.3  # two inter-timepoint gaps
    summary = json.loads(
        (tmp_path / "out" / "paced_summary_metadata.json").read_text()
    )
    assert summary["interval_overruns"] == []


def test_latency_budget_overrun_recorded(tmp_path, fov_source):
    """A tracking updater slower than the timepoint interval blows the
    DynaTrack latency budget (reference position_update.py:275-287): the
    boundary drain overruns the interval and the summary records it."""
    import time

    from shrimpy_tpu.tracking.position import (
        PositionStore,
        PositionUpdateManager,
    )

    class SlowTrackingEngine(AcquisitionEngine):
        def _setup_tracking(self, plan, channels, out_dir, acq_name=None):
            def slow_updater(stack, t, p):
                time.sleep(0.25)  # > interval_s
                return np.zeros(3)

            self._tracking = PositionUpdateManager(
                PositionStore(), slow_updater
            )
            self._track_channel_idx = 0

    plan = AcquisitionPlan(time={"n_timepoints": 3, "interval_s": 0.05})
    SlowTrackingEngine(fov_source).acquire(tmp_path / "out", "slow", plan)
    summary = json.loads(
        (tmp_path / "out" / "slow_summary_metadata.json").read_text()
    )
    overruns = summary["interval_overruns"]
    assert len(overruns) == 2  # t=1 and t=2 both started late
    assert all(lateness > 0 for _, lateness in overruns)


def test_positions_from_platemap_csv(tmp_path):
    """A position-list CSV selects the acquired subset of an HCS plate."""
    from shrimpy_tpu.io.platemap import PositionEntry, PositionList

    coordinate_encoded_plate(
        tmp_path / "plate.zarr", n_positions=2, shape_tczyx=(1, 1, 3, 8, 8)
    )
    PositionList(
        [PositionEntry("B-000", row="0", col="1", fov="001")]
    ).write(tmp_path / "positions.csv")

    plan = AcquisitionPlan(positions_csv=str(tmp_path / "positions.csv"))
    out = AcquisitionEngine(ReplaySource(tmp_path / "plate.zarr")).acquire(
        tmp_path / "out", "subset", plan
    )
    store = open_ngff(out)
    assert sorted(store.positions()) == ["0/1/001"]


def test_positions_csv_unknown_key_raises(tmp_path):
    from shrimpy_tpu.io.platemap import PositionEntry, PositionList

    coordinate_encoded_plate(
        tmp_path / "plate.zarr", n_positions=1, shape_tczyx=(1, 1, 2, 8, 8)
    )
    PositionList([PositionEntry("X", row="9", col="9", fov="999")]).write(
        tmp_path / "bad.csv"
    )
    plan = AcquisitionPlan(positions_csv=str(tmp_path / "bad.csv"))
    with pytest.raises(ValueError, match="not in"):
        AcquisitionEngine(ReplaySource(tmp_path / "plate.zarr")).acquire(
            tmp_path / "out", "x", plan
        )


def test_engine_reuse_across_acquisitions(tmp_path, fov_source):
    """One engine instance can run a tracked acquisition and then an
    untracked one: per-run state (tracking manager, refocus offsets,
    exposures) resets at acquire() (review finding)."""
    tracked = AcquisitionPlan(
        time={"n_timepoints": 2},
        metadata={"dynatrack": {
            "input_channel": "ch0", "tracking_channel": "ch0",
            "tracking_method": "pcc",
        }},
    )
    eng = AcquisitionEngine(fov_source)
    eng.acquire(tmp_path / "out", "first", tracked)
    out2 = eng.acquire(tmp_path / "out", "second", AcquisitionPlan())
    assert out2.exists()
    assert eng._tracking is None
    summary = json.loads(
        (tmp_path / "out" / "second_summary_metadata.json").read_text()
    )
    assert summary["refocus_events"] == []


def test_plan_validation_errors_early(tmp_path, fov_source):
    with pytest.raises(ValueError, match="exceeds the source depth"):
        AcquisitionEngine(fov_source).acquire(
            tmp_path / "o1", "x", AcquisitionPlan(z={"n_slices": 99})
        )
    with pytest.raises(ValueError, match="not in the source store"):
        AcquisitionEngine(fov_source).acquire(
            tmp_path / "o2", "x", AcquisitionPlan(positions=["9/9/999"])
        )
    with pytest.raises(ValueError, match="interval_timepoints"):
        AcquisitionPlan(refocus={"enabled": True, "interval_timepoints": 0})


def test_unrelated_acquisition_does_not_seed_refocus(tmp_path, fov_source):
    """'plate_ctrl' summaries must not seed a fresh 'plate' acquisition's
    refocus offsets (prefix false-positive, review finding)."""
    (tmp_path / "out").mkdir(parents=True)
    (tmp_path / "out" / "plate_ctrl_summary_metadata.json").write_text(
        json.dumps({"refocus_events": [[0, "0", 5]]})
    )
    plan = AcquisitionPlan(refocus={"enabled": True})
    eng = AcquisitionEngine(fov_source)
    eng.acquire(tmp_path / "out", "plate", plan)
    # The unrelated offsets were NOT restored before the run began
    # (any refocus events in the summary came from this run's metric).
    summary = json.loads(
        (tmp_path / "out" / "plate_summary_metadata.json").read_text()
    )
    assert [e for e in summary["refocus_events"] if e[2] == 5] == []


def test_z_step_um_strides_the_source(tmp_path, fov_source):
    """ZPlan.step_um selects a strided z subset and records the step in
    the output store's z scale + the summary (declared fields change
    behavior — VERDICT round-2 item 4)."""
    # Source z scale is 1.0 um (create_fov default) -> step 2.0 = stride 2.
    plan = AcquisitionPlan(z={"step_um": 2.0})
    out = AcquisitionEngine(fov_source).acquire(tmp_path / "out", "acq", plan)
    pos = open_ngff(out).position()
    assert pos.shape[2] == 2  # slices 0, 2 of 4
    data = pos.read()
    assert data[0, 0, 1, 0, 0] == coordinate_encoded_value(0, 0, 0, 2)
    assert pos.zyx_scale[0] == pytest.approx(2.0)
    summary = json.loads(
        (tmp_path / "out" / "acq_summary_metadata.json").read_text()
    )
    assert summary["z_indices"] == [0, 2]
    assert summary["z_scale_um"] == pytest.approx(2.0)


def test_z_step_um_non_integer_stride_rejected(tmp_path, fov_source):
    with pytest.raises(ValueError, match="integer multiple"):
        AcquisitionEngine(fov_source).acquire(
            tmp_path / "out", "acq", AcquisitionPlan(z={"step_um": 1.5})
        )


def test_channel_exposure_scales_brightness(tmp_path, fov_source):
    """ChannelPlan.exposure_ms drives replay brightness emulation
    relative to source_exposure_ms, per channel, and lands in the
    summary."""
    plan = AcquisitionPlan(
        channels=[
            {"name": "ch0", "exposure_ms": 20.0},
            {"name": "ch1", "exposure_ms": 10.0},
        ],
        source_exposure_ms=10.0,
    )
    out = AcquisitionEngine(fov_source).acquire(tmp_path / "out", "acq", plan)
    data = open_ngff(out).position().read()
    base = coordinate_encoded_value(0, 0, 0, 1)
    assert data[0, 0, 1, 0, 0] == pytest.approx(2.0 * base)
    assert data[0, 1, 1, 0, 0] == pytest.approx(
        coordinate_encoded_value(0, 0, 1, 1)
    )
    summary = json.loads(
        (tmp_path / "out" / "acq_summary_metadata.json").read_text()
    )
    assert summary["channel_exposures_ms"] == {"ch0": 20.0, "ch1": 10.0}


def test_stage_positions_grid_generates_offset_tiles(tmp_path, fov_source):
    """A WellPlatePlan-style grid acquires (wells x grid) HCS positions,
    each replaying the source at its tile's stage offset (reference
    mantis.yaml:16-35)."""
    plan = AcquisitionPlan(
        stage_positions={
            "plate": {"rows": 2, "columns": 3},
            "selected_wells": [[1], [0, 2]],
            "well_points_plan": {
                "rows": 1,
                "columns": 2,
                # fov_width=16 px * 1 um, 50% overlap -> pitch 8 px; the
                # 2-tile grid centers at +-4 px in x.
                "overlap": [0.0, 50.0],
            },
        }
    )
    out = AcquisitionEngine(fov_source).acquire(tmp_path / "out", "acq", plan)
    store = open_ngff(out)
    keys = list(store.positions())
    assert keys == ["B/1/000000", "B/1/000001", "B/3/000000", "B/3/000001"]
    summary = json.loads(
        (tmp_path / "out" / "acq_summary_metadata.json").read_text()
    )
    grid = dict((k, tuple(v)) for k, v in summary["stage_position_grid"])
    assert grid["B/1/000000"] == (0, -4)
    assert grid["B/1/000001"] == (0, 4)
    # Tile content: the source volume rolled by minus the offset. The
    # coordinate encoding varies only in z here, so verify via the
    # source roll directly.
    src = fov_source.volume("0", 0, 0)
    tile = store.positions()["B/1/000001"].volume(0, 0)
    np.testing.assert_array_equal(
        np.asarray(tile), np.roll(src, -4, axis=2).astype(np.float32)
    )


def test_stage_positions_exclusive_with_positions():
    with pytest.raises(ValueError, match="only one of"):
        AcquisitionPlan(
            positions=["0"],
            stage_positions={"plate": {"rows": 1, "columns": 1}},
        )


def test_camera_mode_matches_volume_mode(tmp_path):
    """Frame-sequenced acquisition (ReplayCamera.snap via SequencedBurst
    z-queues) is voxel-identical to the volume path, including the
    tracking stage-offset interplay (VERDICT round-2 item 6)."""
    path = tmp_path / "src.zarr"
    synthetic_blob_fov(
        path,
        shape_zyx=(8, 32, 32),
        n_timepoints=3,
        drift_zyx=(0.0, 1.5, -1.0),
    )
    source_v = ReplaySource(path)
    track_meta = {"dynatrack": {
        "input_channel": "BF", "tracking_channel": "BF",
        "tracking_method": "pcc",
    }}
    plan_v = AcquisitionPlan(time={"n_timepoints": 3}, metadata=track_meta)
    out_v = AcquisitionEngine(source_v).acquire(tmp_path / "ov", "acq", plan_v)
    source_c = ReplaySource(path)
    plan_c = AcquisitionPlan(
        time={"n_timepoints": 3}, mode="camera", metadata=track_meta
    )
    out_c = AcquisitionEngine(source_c).acquire(tmp_path / "oc", "acq", plan_c)
    data_v = open_ngff(out_v).position().read()
    data_c = open_ngff(out_c).position().read()
    np.testing.assert_array_equal(np.asarray(data_v), np.asarray(data_c))
    summary = json.loads(
        (tmp_path / "oc" / "acq_summary_metadata.json").read_text()
    )
    assert summary["mode"] == "camera"


def test_camera_mode_with_z_stride_and_exposure(tmp_path, fov_source):
    """Camera mode honors z striding and exposure scaling identically."""
    plan = AcquisitionPlan(
        mode="camera",
        z={"step_um": 2.0},
        channels=[{"name": "ch1", "exposure_ms": 5.0}],
    )
    out = AcquisitionEngine(fov_source).acquire(tmp_path / "out", "acq", plan)
    data = open_ngff(out).position().read()
    assert data.shape[1:3] == (1, 2)
    assert data[0, 0, 1, 0, 0] == pytest.approx(
        0.5 * coordinate_encoded_value(0, 0, 1, 2)
    )


def test_refocus_corrects_in_source_slices_under_z_stride(tmp_path):
    """With ZPlan.step_um striding z, the refocus metric runs on the
    strided stack but the correction must be applied in SOURCE slices —
    an un-scaled delta under-corrects by the stride factor (round-3
    review finding)."""
    from scipy import ndimage

    from shrimpy_tpu.io.ngff import create_fov

    rng2 = np.random.default_rng(2)
    nz, ny, nx = 16, 48, 48
    sharp = rng2.random((ny, nx)).astype(np.float32)
    in_focus = 12  # source slices; stride 2 puts it exactly on-grid
    stack = np.stack([
        ndimage.gaussian_filter(sharp, abs(z - in_focus) * 0.9 + 0.01)
        for z in range(nz)
    ])
    pos = create_fov(tmp_path / "src.zarr", shape=(2, 1, nz, ny, nx),
                     dtype="float32", channel_names=["BF"],
                     zyx_scale=(0.25, 0.116, 0.116))
    for t in range(2):
        pos.write((t, 0), stack)

    source = ReplaySource(tmp_path / "src.zarr")
    plan = AcquisitionPlan(
        time={"n_timepoints": 2},
        z={"step_um": 0.5},  # stride 2 -> 8 acquired slices
        refocus={"enabled": True, "interval_timepoints": 1},
    )
    engine = AcquisitionEngine(source)
    out = engine.acquire(tmp_path / "out", "rf", plan)

    summary = json.loads(
        (tmp_path / "out" / "rf_summary_metadata.json").read_text()
    )
    # Strided stack: slices z=0,2..14, center idx 4 (source 8); sharpest
    # strided idx 6 (source 12) -> strided delta +2 -> SOURCE delta +4.
    assert summary["refocus_events"][0][2] == 4

    # t=1 served with the source roll: in-focus lands at strided center.
    data = open_ngff(out).position().read()
    from shrimpy_tpu.engine.autofocus import focus_from_transverse_band
    idx1 = focus_from_transverse_band(data[1, 0], pixel_size_um=0.116)
    assert idx1 == 4


def test_autoexposure_model_matches_replay_brightness(tmp_path, fov_source):
    """The AE simulation and the replay brightness emulation must share
    one camera model: the written AE-channel brightness lands in the
    band AE converged to, even when the plan's source exposure differs
    from the algorithm's default exposure (round-3 review finding)."""
    target = None  # derived from the source below
    src_mid = fov_source.volume("0", 0, 0)
    v = float(np.mean(src_mid[src_mid.shape[0] // 2]))
    target = 3.0 * v
    plan = AcquisitionPlan(
        source_exposure_ms=20.0,
        autoexposure={
            "enabled": True,
            "algorithm": "mean_intensity",
            "settings": {
                "min_intensity": 0.9 * target,
                "max_intensity": 1.1 * target,
                "target_intensity": target,
                "default_exposure_ms": 10.0,
                "max_exposure_ms": 500.0,
            },
        },
    )
    eng = AcquisitionEngine(fov_source)
    out = eng.acquire(tmp_path / "out", "ae", plan)
    data = open_ngff(out).position().read()
    mid = data[0, 0, data.shape[2] // 2]
    assert 0.9 * target <= float(np.mean(mid)) <= 1.1 * target


def test_plate_row_names_past_z():
    from shrimpy_tpu.engine.plan import _plate_row_name

    assert [_plate_row_name(i) for i in (0, 1, 25, 26, 27, 51, 52)] == [
        "A", "B", "Z", "AA", "AB", "AZ", "BA",
    ]
    # A 32-row (1536-well) plate generates valid row keys end to end.
    plan = AcquisitionPlan(
        stage_positions={
            "plate": {"rows": 32, "columns": 1},
            "selected_wells": [[31], [0]],
        }
    )
    gen = plan.stage_positions.generate((16, 16), (1.0, 1.0))
    assert gen[0].key == "AF/1/000000"


def test_overlap_at_or_above_100_is_rejected():
    with pytest.raises(ValueError, match="overlap"):
        AcquisitionPlan(
            stage_positions={
                "plate": {"rows": 1, "columns": 1},
                "well_points_plan": {"rows": 1, "columns": 2,
                                     "overlap": [0.0, 100.0]},
            }
        )
