"""Camera slice-rate model in replay pacing (reference archive
``acq_engine.py:540-598``, constants ``:75-93``).

The live engine derives a per-channel z-slice rate from camera physics
(labelfree Oryx + piezo step, lightsheet rolling-shutter readout, demo
fps cap) and paces hardware-sequenced bursts with it. With
``camera.model_acquisition`` on, the replay engine charges every
(t, p, channel) volume its modeled burst time and totals it in the
summary sidecar.
"""

import json
import math

import numpy as np
import pytest

from shrimpy_tpu.engine.engine import AcquisitionEngine
from shrimpy_tpu.engine.plan import AcquisitionPlan, CameraPlan
from shrimpy_tpu.engine.replay import ReplaySource
from shrimpy_tpu.io.synthetic import coordinate_encoded_fov


@pytest.fixture()
def fov_source(tmp_path):
    coordinate_encoded_fov(tmp_path / "src.zarr", shape=(2, 1, 3, 16, 16))
    return ReplaySource(tmp_path / "src.zarr")


def test_labelfree_rate_matches_reference():
    # min(1000 / (exposure + piezo step), floor(max_fps))
    # (acq_engine.py:546-552); 20 ms LC switch between channels (:553).
    cam = CameraPlan(mode="labelfree", max_fps=47.5)
    assert cam.slice_rate_hz(2.0) == 47.0  # fps-capped (floor(47.5))
    assert cam.slice_rate_hz(50.0) == pytest.approx(1000.0 / 51.5)
    assert cam.effective_channel_change_ms() == 20.0
    assert cam.volume_time_s(10, 50.0) == pytest.approx(
        10 * 51.5 / 1000.0 + 0.020
    )


def test_lightsheet_rate_and_readout_constraint():
    # 1000 / (exposure + readout + post-readout delay), exposure must
    # exceed the sensor readout (acq_engine.py:574-591).
    cam = CameraPlan(mode="lightsheet", readout_ms=10.0)
    assert cam.slice_rate_hz(20.0) == pytest.approx(1000.0 / 30.05)
    assert cam.effective_channel_change_ms() == 200.0  # filter wheel
    with pytest.raises(ValueError, match="exceed"):
        cam.slice_rate_hz(5.0)


def test_demo_rate_is_fps_capped():
    cam = CameraPlan(mode="demo", max_fps=30.0)
    assert cam.slice_rate_hz(100.0) == pytest.approx(10.0)
    assert cam.slice_rate_hz(1.0) == 30.0
    assert cam.effective_channel_change_ms() == 0.0


def test_summary_records_modeled_acquisition(tmp_path, fov_source):
    plan = AcquisitionPlan(
        time={"n_timepoints": 2},
        camera={
            "model_acquisition": True,
            "mode": "labelfree",
            "max_fps": 40.0,
            "time_scale": 0.0,
        },
    )
    AcquisitionEngine(fov_source).acquire(tmp_path / "out", "acq", plan)
    summary = json.loads(
        (tmp_path / "out" / "acq_summary_metadata.json").read_text()
    )
    # Default channel exposure = source_exposure_ms = 10 ms; piezo 1.5.
    rate = min(1000.0 / 11.5, math.floor(40.0))
    assert summary["camera_slice_rate_hz"] == {
        "ch0": pytest.approx(round(rate, 3))
    }
    # 2 timepoints x 1 position x 1 channel x 3 slices; a single-channel
    # burst pays NO channel change ((n_channels - 1) transitions per
    # burst, reference acq_engine.py:1553-1562).
    per_vol = 3 / rate
    assert summary["camera_acq_s"] == pytest.approx(2 * per_vol, abs=1e-3)


def test_channel_change_charged_per_transition(tmp_path):
    """(n_channels - 1) channel switches per (t, p) burst, matching the
    reference's await_cz_acq_completion accounting (archive
    acq_engine.py:1553-1562)."""
    coordinate_encoded_fov(
        tmp_path / "src2.zarr", shape=(1, 2, 3, 16, 16)
    )
    src = ReplaySource(tmp_path / "src2.zarr")
    plan = AcquisitionPlan(
        time={"n_timepoints": 1},
        camera={
            "model_acquisition": True,
            "mode": "labelfree",
            "max_fps": 40.0,
            "time_scale": 0.0,
        },
    )
    AcquisitionEngine(src).acquire(tmp_path / "out", "acq", plan)
    summary = json.loads(
        (tmp_path / "out" / "acq_summary_metadata.json").read_text()
    )
    rate = min(1000.0 / 11.5, math.floor(40.0))
    # 2 channels x 3 slices + exactly ONE 20 ms LC switch.
    assert summary["camera_acq_s"] == pytest.approx(
        2 * (3 / rate) + 0.020, abs=1e-3
    )


def test_timing_uses_physical_exposure_not_laser_power(tmp_path, fov_source):
    """Laser power scales brightness, not burst timing: an autoexposure
    result at half-nominal power must not halve the modeled exposure
    (which would trip the lightsheet readout assert on a physically
    valid exposure) nor journal a doubled rate."""
    from shrimpy_tpu.engine.autoexposure import NOMINAL_LASER_POWER

    plan = AcquisitionPlan(
        time={"n_timepoints": 1},
        channels=None,
        source_exposure_ms=20.0,
        camera={
            "model_acquisition": True,
            "mode": "lightsheet",
            "readout_ms": 15.0,
            "time_scale": 0.0,
        },
        autoexposure={"enabled": True, "algorithm": "manual",
                      "manual_csv": str(tmp_path / "man.csv")},
    )
    # 20 ms exposure at HALF nominal power: brightness-effective 10 ms
    # (< 15 ms readout, would raise), physical 20 ms (valid).
    (tmp_path / "man.csv").write_text(
        "well,exposure_ms,laser_power\n"
        f"0,20.0,{NOMINAL_LASER_POWER / 2}\n"
    )
    AcquisitionEngine(fov_source).acquire(tmp_path / "out", "acq", plan)
    summary = json.loads(
        (tmp_path / "out" / "acq_summary_metadata.json").read_text()
    )
    # Journaled rate reflects the PHYSICAL 20 ms exposure.
    rate = 1000.0 / (20.0 + 15.0 + 0.05)
    assert summary["camera_slice_rate_hz"]["ch0"] == pytest.approx(
        round(rate, 3)
    )


def test_time_scale_scales_the_sleep(tmp_path, fov_source, monkeypatch):
    import shrimpy_tpu.engine.engine as engine_mod

    slept = []
    monkeypatch.setattr(engine_mod.time, "sleep", lambda s: slept.append(s))
    plan = AcquisitionPlan(
        time={"n_timepoints": 2},
        camera={"model_acquisition": True, "mode": "demo", "time_scale": 0.5},
    )
    AcquisitionEngine(fov_source).acquire(tmp_path / "out", "acq", plan)
    per_vol = 3 / 30.0  # demo: 10 ms exposure is fps-capped at 30 Hz
    hits = [s for s in slept if np.isclose(s, per_vol * 0.5, atol=1e-9)]
    assert len(hits) == 2


def test_model_off_records_nothing(tmp_path, fov_source):
    plan = AcquisitionPlan(time={"n_timepoints": 1})
    AcquisitionEngine(fov_source).acquire(tmp_path / "out", "acq", plan)
    summary = json.loads(
        (tmp_path / "out" / "acq_summary_metadata.json").read_text()
    )
    assert summary["camera_slice_rate_hz"] == {}
    assert summary["camera_acq_s"] == 0.0


def test_sequenced_event_cap_matches_reference():
    """z x channels must fit the TriggerScope hardware-sequence length
    (reference archive acq_engine.py:171-183: 1200 events) on the
    real-instrument modes; the demo camera has no TriggerScope."""
    cam = CameraPlan(model_acquisition=True, mode="labelfree")
    cam.check_sequenced_events(600, 2)  # exactly 1200: allowed
    with pytest.raises(ValueError, match="1200"):
        cam.check_sequenced_events(601, 2)
    with pytest.raises(ValueError, match="1200"):
        CameraPlan(
            model_acquisition=True, mode="lightsheet", readout_ms=10.0
        ).check_sequenced_events(601, 2)
    # Demo mode: simulation only, unlimited by default...
    CameraPlan(model_acquisition=True).check_sequenced_events(10_000, 4)
    # ...but an explicit cap is honored in any mode,
    with pytest.raises(ValueError, match="hardware-sequence"):
        CameraPlan(
            model_acquisition=True, max_sequenced_events=100
        ).check_sequenced_events(101, 1)
    # and an explicit null lifts it on a real-instrument mode.
    CameraPlan(
        model_acquisition=True, mode="labelfree", max_sequenced_events=None
    ).check_sequenced_events(10_000, 4)
    # Without the acquisition model the plan never reaches hardware
    # sequencing, so the cap is moot.
    CameraPlan(
        model_acquisition=False, mode="labelfree"
    ).check_sequenced_events(10_000, 4)


def test_engine_fails_fast_on_sequenced_event_cap(tmp_path, fov_source):
    plan = AcquisitionPlan(
        time={"n_timepoints": 1},
        camera={"model_acquisition": True, "max_sequenced_events": 2},
    )
    with pytest.raises(ValueError, match="sequenced events"):
        # 3 source slices x 1 channel = 3 > 2.
        AcquisitionEngine(fov_source).acquire(tmp_path / "out", "acq", plan)


def test_plan_validate_enforces_sequenced_event_cap(tmp_path):
    from click.testing import CliRunner

    from shrimpy_tpu.cli.main import cli

    bad = tmp_path / "bad.yml"
    bad.write_text(
        "channels: [{name: GFP, exposure_ms: 20.0}, "
        "{name: RFP, exposure_ms: 20.0}]\n"
        "z: {n_slices: 601}\n"
        "camera: {model_acquisition: true, mode: labelfree}\n"
    )
    result = CliRunner().invoke(cli, ["plan", "validate", str(bad)])
    assert result.exit_code != 0
    assert "sequenced events" in result.output


def test_plan_validate_surfaces_camera_problems(tmp_path):
    """`plan validate` flags the lightsheet readout constraint pre-run
    (schema-only check; no store needed)."""
    from click.testing import CliRunner

    from shrimpy_tpu.cli.main import cli

    bad = tmp_path / "bad.yml"
    bad.write_text(
        "channels: [{name: GFP, exposure_ms: 5.0}]\n"
        "camera: {model_acquisition: true, mode: lightsheet}\n"
    )
    result = CliRunner().invoke(cli, ["plan", "validate", str(bad)])
    assert result.exit_code != 0
    assert "camera model" in result.output and "GFP" in result.output


def test_plan_validate_reports_non_numeric_autoexposure_setting():
    """A YAML string in autoexposure.settings must come back as a
    problem string, not crash validation with a TypeError
    (AutoexposureSettings is a plain dataclass — no coercion)."""
    from shrimpy_tpu.engine.plan import AcquisitionPlan, validate_plan

    plan = AcquisitionPlan(
        channels=[{"name": "GFP", "exposure_ms": 20.0}],
        camera={"model_acquisition": True, "mode": "lightsheet"},
        autoexposure={
            "enabled": True,
            "settings": {"min_exposure_ms": "15"},
        },
    )
    problems = validate_plan(plan)
    assert any(
        "min_exposure_ms" in p and "number" in p for p in problems
    ), problems


def test_invalid_lightsheet_exposure_fails_fast(tmp_path, fov_source):
    # source_exposure_ms default 10 ms == readout -> the engine must
    # refuse before writing any output (the reference asserts before
    # every lightsheet burst, acq_engine.py:585-588).
    plan = AcquisitionPlan(
        time={"n_timepoints": 1},
        camera={"model_acquisition": True, "mode": "lightsheet"},
    )
    with pytest.raises(ValueError, match="exceed"):
        AcquisitionEngine(fov_source).acquire(tmp_path / "out", "acq", plan)


def test_lightsheet_autoexposure_floor_fails_before_run(tmp_path, fov_source):
    """Autoexposure escalation can select exposures down to
    min_exposure_ms; on a modeled lightsheet camera that floor must
    exceed the sensor readout or a bright well aborts the run MID-
    acquisition (the reference asserts before every burst,
    acq_engine.py:585-588). Checked at run start and by plan validate."""
    from click.testing import CliRunner

    from shrimpy_tpu.cli.main import cli

    plan = AcquisitionPlan(
        time={"n_timepoints": 1},
        source_exposure_ms=20.0,
        camera={"model_acquisition": True, "mode": "lightsheet",
                "readout_ms": 10.0, "time_scale": 0.0},
        # Default min_exposure_ms=1.0 < 10 ms readout.
        autoexposure={"enabled": True},
    )
    with pytest.raises(ValueError, match="min_exposure_ms"):
        AcquisitionEngine(fov_source).acquire(tmp_path / "out", "acq", plan)
    assert not (tmp_path / "out" / "acq.zarr").exists()  # nothing written

    y = tmp_path / "p.yml"
    y.write_text(
        "source_exposure_ms: 20.0\n"
        "camera: {model_acquisition: true, mode: lightsheet}\n"
        "autoexposure: {enabled: true}\n"
    )
    r = CliRunner().invoke(cli, ["plan", "validate", str(y)])
    assert r.exit_code != 0 and "min_exposure_ms" in r.output

    # A floor above the readout validates clean.
    ok = AcquisitionPlan(
        time={"n_timepoints": 1},
        source_exposure_ms=20.0,
        camera={"model_acquisition": True, "mode": "lightsheet",
                "readout_ms": 10.0, "time_scale": 0.0},
        autoexposure={"enabled": True,
                      "settings": {"min_exposure_ms": 12.0}},
    )
    AcquisitionEngine(fov_source).acquire(tmp_path / "out2", "acq", ok)


def test_lightsheet_manual_autoexposure_entries_checked(tmp_path, fov_source):
    """Manual-CSV exposures are per-well arbitrary: every entry is
    validated against the readout constraint BEFORE the run."""
    (tmp_path / "man.csv").write_text(
        "well,exposure_ms,laser_power\n0,5.0,50\n"
    )
    plan = AcquisitionPlan(
        time={"n_timepoints": 1},
        source_exposure_ms=20.0,
        camera={"model_acquisition": True, "mode": "lightsheet",
                "readout_ms": 10.0, "time_scale": 0.0},
        autoexposure={"enabled": True, "algorithm": "manual",
                      "manual_csv": str(tmp_path / "man.csv")},
    )
    with pytest.raises(ValueError, match="well '0'"):
        AcquisitionEngine(fov_source).acquire(tmp_path / "out", "acq", plan)


def test_effective_rate_journaled_per_position(tmp_path, fov_source):
    """When autoexposure moves a position's exposure off the configured
    one, the summary journals the rate actually charged keyed by
    position|channel (a per-channel scalar cannot represent per-well
    autoexposure results)."""
    (tmp_path / "man.csv").write_text(
        "well,exposure_ms,laser_power\n0,40.0,100\n"
    )
    plan = AcquisitionPlan(
        time={"n_timepoints": 1},
        source_exposure_ms=20.0,
        camera={"model_acquisition": True, "mode": "lightsheet",
                "readout_ms": 15.0, "time_scale": 0.0},
        autoexposure={"enabled": True, "algorithm": "manual",
                      "manual_csv": str(tmp_path / "man.csv")},
    )
    AcquisitionEngine(fov_source).acquire(tmp_path / "out", "acq", plan)
    summary = json.loads(
        (tmp_path / "out" / "acq_summary_metadata.json").read_text()
    )
    # Configured rate: 20 ms exposure; charged rate: the manual 40 ms.
    assert summary["camera_slice_rate_hz"]["ch0"] == pytest.approx(
        round(1000.0 / 35.05, 3)
    )
    assert summary["camera_effective_rate_hz"] == {
        "0|ch0": pytest.approx(round(1000.0 / 55.05, 3))
    }
