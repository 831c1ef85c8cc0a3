"""Instrument-control drivers (shrimpy_tpu.devices): wire protocols,
device semantics, and engine-rig integration.

Mirrors the roles of the reference's archived microscope-operations
library (``microscope_operations.py:184-232,296-358,536-635``) with the
transports virtualized: every driver is exercised against its emulator
at the byte level, and the engine test runs a full acquisition with the
rig enabled and checks the device journal in the summary sidecar.
"""

import json
import struct

import numpy as np
import pytest

from shrimpy_tpu.devices import bus
from shrimpy_tpu.devices.daq import (
    CounterTask,
    get_total_num_daq_counter_samples,
    setup_daq_counter,
    start_daq_counters,
)
from shrimpy_tpu.devices.kim101 import (
    KIM101Emulator,
    KinesisPiezoMotor,
    set_relative_kim101_position,
    setup_kim101_stage,
)
from shrimpy_tpu.devices.rig import LaserSpec, build_rig
from shrimpy_tpu.devices.shutter import (
    Shutter,
    get_shutter_state,
    open_shutter,
    reset_shutter,
)
from shrimpy_tpu.devices.vortran import (
    StradusEmulator,
    VortranLaser,
    setup_vortran_laser,
)

pytestmark = pytest.mark.quick


@pytest.fixture(autouse=True)
def _clean_bus():
    bus.unbind_all()
    yield
    bus.unbind_all()


# -- Vortran Stradus (ASCII serial) -----------------------------------


def test_vortran_setup_turns_on_pulse_mode():
    emu = StradusEmulator(wavelength_nm=561, max_power_mw=50.0)
    laser = setup_vortran_laser(emu.port())
    assert laser.pulse_mode == 1
    assert laser.wavelength == 561
    assert laser.max_power == 50.0
    assert "PUL=1" in emu.journal


def test_vortran_power_roundtrip_and_clamp():
    emu = StradusEmulator(max_power_mw=100.0)
    laser = VortranLaser(emu.port())
    laser.pulse_power = 12.5
    assert emu.power_mw == 12.5
    assert laser.pulse_power == 12.5
    # The instrument clamps out-of-range requests; the driver reads the
    # applied value back rather than trusting the request.
    laser.pulse_power = 500.0
    assert laser.pulse_power == 100.0


def test_vortran_unknown_command_raises():
    emu = StradusEmulator()
    laser = VortranLaser(emu.port())
    with pytest.raises(IOError, match="rejected"):
        laser._txn("BOGUS=1")


def test_vortran_port_registry():
    emu = StradusEmulator()
    bus.bind_port("COM4", emu.port)
    laser = setup_vortran_laser("COM4")
    laser.emission = True
    assert emu.emission == 1
    with pytest.raises(FileNotFoundError, match="COM9"):
        VortranLaser("COM9")


# -- Thorlabs KIM101 (APT binary) -------------------------------------


def test_kim101_setup_drive_params_on_the_wire():
    emu = KIM101Emulator(serial_number=74000291)
    stage = setup_kim101_stage(emu.port(), max_voltage=112,
                               velocity=500, acceleration=1000)
    assert stage.serial_number == 74000291
    assert emu.drive_params == (112, 500, 1000)


def test_kim101_relative_move_and_completion_event():
    emu = KIM101Emulator()
    stage = KinesisPiezoMotor(emu.port())
    stage.move_by(30)
    assert stage.wait_move() == 30
    stage.move_by(-10)
    assert stage.wait_move() == 20
    assert emu.position_steps == 20


def test_kim101_compensated_move_tracks_commanded_position(monkeypatch):
    import shrimpy_tpu.devices.kim101 as mod

    # A calibration factor scales only the WIRE travel of negative
    # moves; true_position tracks the commanded steps
    # (microscope_operations.py:334-358).
    monkeypatch.setattr(mod, "KIM101_COMPENSATION_FACTOR", 2.0)
    emu = KIM101Emulator()
    stage = setup_kim101_stage(emu.port())
    set_relative_kim101_position(stage, 100)
    set_relative_kim101_position(stage, -40)
    assert stage.true_position == 60
    assert emu.position_steps == 100 - 80


def test_kim101_rejects_wrong_message_id():
    # A laser emulator on a KIM101 driver is a framing error, not a hang.
    emu = StradusEmulator()
    with pytest.raises((IOError, TimeoutError)):
        KinesisPiezoMotor(emu.port())


# -- DAQ counters ------------------------------------------------------


def _lf_topology(n_channels=2, n_slices=5, channel_hz=0.5, slice_hz=25.0):
    chan = setup_daq_counter(
        CounterTask("LF Channel Counter"), "cDAQ1/_ctr0", channel_hz,
        0.1, n_channels, "/cDAQ1/Ctr0InternalOutput",
    )
    z = setup_daq_counter(
        CounterTask("LF Z Counter"), "cDAQ1/_ctr2", slice_hz,
        0.1, n_slices, "/cDAQ1/PFI0",
    )
    z.cfg_dig_edge_start_trig(chan)
    z.retriggerable = True
    return chan, z


def test_daq_total_samples_is_the_product():
    chan, z = _lf_topology(n_channels=3, n_slices=7)
    assert get_total_num_daq_counter_samples([chan, z]) == 21


def test_daq_chained_schedule_one_train_per_parent_pulse():
    chan, z = _lf_topology(n_channels=2, n_slices=3,
                           channel_hz=1.0, slice_hz=10.0)
    times = z.chained_pulse_times()
    assert len(times) == 6
    np.testing.assert_allclose(
        times, [0.0, 0.1, 0.2, 1.0, 1.1, 1.2], atol=1e-12
    )


def test_daq_unretriggerable_chain_is_an_error():
    chan, z = _lf_topology()
    z.retriggerable = False
    with pytest.raises(RuntimeError, match="retriggerable"):
        z.chained_pulse_times()


def test_daq_start_requires_stop_first():
    chan, _ = _lf_topology()
    start_daq_counters(chan)
    assert chan.starts == 1
    # Still running -> start_daq_counters skips it (the reference only
    # restarts finished tasks, microscope_operations.py:213-221).
    start_daq_counters(chan)
    assert chan.starts == 1
    chan.stop()
    start_daq_counters(chan)
    assert chan.starts == 2


def test_daq_schedule_matches_camera_model():
    """The pulse schedule a real DAQ would emit must agree with the
    CameraPlan charge the replay engine sleeps on — one timing model,
    two views."""
    from shrimpy_tpu.engine.plan import CameraPlan

    cam = CameraPlan(model_acquisition=True, mode="labelfree", max_fps=30)
    exposure_ms, n_slices = 20.0, 12
    rate = cam.slice_rate_hz(exposure_ms)
    z = setup_daq_counter(
        CounterTask("Z"), "cDAQ1/_ctr2", rate, 0.1, n_slices, "/cDAQ1/PFI0"
    )
    assert z.burst_seconds() == pytest.approx(
        cam.volume_time_s(n_slices, exposure_ms, channel_change=False)
    )


# -- Shutter -----------------------------------------------------------


def test_shutter_bracket_saves_opens_and_restores():
    sh = Shutter()
    sh.set_auto_shutter(True)
    sh.set_open(False)
    saved = get_shutter_state(sh)
    open_shutter(sh)
    assert (sh.auto_shutter, sh.is_open) == (False, True)
    reset_shutter(sh, *saved)
    assert (sh.auto_shutter, sh.is_open) == saved
    # Restore order: open state FIRST, then auto-shutter (re-enabling
    # auto first would let the core re-close an operator-opened
    # shutter on real hardware).
    tail = sh.journal[-2:]
    assert tail[0][0] == "open" and tail[1][0] == "auto"


def test_open_shutter_without_device_is_noop():
    open_shutter(None)
    reset_shutter(None, True, False)


# -- Rig + engine integration -----------------------------------------


def test_build_rig_creates_emulators_for_unbound_ports():
    rig = build_rig(
        [LaserSpec(channel="GFP", wavelength_nm=488, power_mw=15.0)],
        o3_port="kim:o3",
    )
    assert rig.lasers["GFP"].pulse_power == 15.0
    assert rig.o3_stage is not None
    # Re-opening the same port sees the same instrument state.
    laser2 = VortranLaser(bus.open_port("emu:GFP"))
    assert laser2.pulse_power == 15.0


def test_engine_acquisition_with_rig(tmp_path):
    from shrimpy_tpu.engine import (
        AcquisitionEngine,
        AcquisitionPlan,
        ReplaySource,
    )
    from shrimpy_tpu.io.synthetic import coordinate_encoded_fov

    coordinate_encoded_fov(tmp_path / "src.zarr", shape=(2, 2, 4, 16, 16))
    plan = AcquisitionPlan(
        time={"n_timepoints": 2},
        channels=[
            {"name": "ch0", "exposure_ms": 10.0},
            {"name": "ch1", "exposure_ms": 10.0},
        ],
        camera={"model_acquisition": True, "mode": "demo", "time_scale": 0.0},
        hardware={
            "enabled": True,
            "lasers": [
                {"channel": "ch0", "wavelength_nm": 488, "power_mw": 12.0},
                {"channel": "ch1", "wavelength_nm": 561, "power_mw": 8.0},
            ],
            "o3_port": "kim:o3",
        },
    )
    out = AcquisitionEngine(ReplaySource(tmp_path / "src.zarr")).acquire(
        tmp_path / "out", "acq", plan
    )
    summary = json.loads(
        (tmp_path / "out" / "acq_summary_metadata.json").read_text()
    )
    hw = summary["hardware"]
    assert hw is not None and not hw["aborted"]
    # Lasers journaled at their configured powers, emission bracketed.
    assert hw["lasers"]["ch0"]["wavelength_nm"] == 488
    assert hw["lasers"]["ch1"]["power_mw"] == 8.0
    events = [tuple(e) for e in hw["events"]]
    kinds = [e[0] for e in events]
    assert kinds.count("shutter_open") == 1
    assert kinds.count("shutter_reset") == 1
    # One DAQ burst per (t, p) visit; expected frames = channels x slices.
    assert hw["daq_bursts"] == 2
    assert hw["daq_expected_frames_per_burst"] == 2 * 4
    assert ("daq_armed", 4, 2, 8) in events


def test_engine_rig_moves_o3_on_refocus(tmp_path):
    from shrimpy_tpu.engine import (
        AcquisitionEngine,
        AcquisitionPlan,
        ReplaySource,
    )
    from shrimpy_tpu.io.synthetic import synthetic_blob_fov

    synthetic_blob_fov(
        tmp_path / "src.zarr", shape_zyx=(9, 32, 32), n_timepoints=2,
        drift_zyx=(2.0, 0.0, 0.0),
    )
    plan = AcquisitionPlan(
        time={"n_timepoints": 2},
        refocus={"enabled": True, "interval_timepoints": 1},
        hardware={"enabled": True, "o3_port": "kim:o3",
                  "o3_steps_per_slice": 5},
    )
    out = AcquisitionEngine(ReplaySource(tmp_path / "src.zarr")).acquire(
        tmp_path / "out", "acq", plan
    )
    summary = json.loads(
        (tmp_path / "out" / "acq_summary_metadata.json").read_text()
    )
    hw = summary["hardware"]
    moves = [e for e in hw["events"] if e[0] == "o3_move"]
    total = sum(v for _, v in summary["refocus_total_z"].items())
    if total:
        assert moves, "refocus corrections must drive the O3 stage"
        assert hw["o3_true_position_steps"] == total * 5


def test_plan_validate_rejects_unknown_laser_channel():
    from shrimpy_tpu.engine.plan import AcquisitionPlan, validate_plan

    plan = AcquisitionPlan(
        channels=[{"name": "GFP", "exposure_ms": 10.0}],
        hardware={"enabled": True,
                  "lasers": [{"channel": "mCherry"}]},
    )
    problems = validate_plan(plan)
    assert any("mCherry" in p for p in problems)


def test_shared_emulator_is_thread_safe_across_ports():
    """Two arm engines can open the same port name (one physical
    instrument); concurrent command round-trips must not steal each
    other's replies (review finding: unlocked shared handle())."""
    import threading

    emu = StradusEmulator()
    bus.bind_port("COM7", emu.port)
    errors: list[Exception] = []

    def hammer():
        try:
            laser = setup_vortran_laser("COM7")
            for i in range(200):
                # Shared instrument state may be overwritten by the
                # other threads; what must hold is that every
                # round-trip parses ITS OWN echo+reply (no stolen or
                # torn messages -> IOError/TimeoutError).
                laser.pulse_power = float(i % 50)
                _ = laser.pulse_power
                _ = laser.pulse_mode
        except Exception as e:  # pragma: no cover - failure path
            errors.append(e)

    threads = [threading.Thread(target=hammer) for _ in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors


def test_hardware_plan_rejects_duplicate_and_overrange():
    from shrimpy_tpu.engine.plan import HardwarePlan

    with pytest.raises(ValueError, match="duplicate"):
        HardwarePlan(enabled=True, lasers=[
            {"channel": "a"}, {"channel": "a"},
        ])
    with pytest.raises(ValueError, match="exceeds"):
        HardwarePlan(enabled=True, lasers=[
            {"channel": "a", "power_mw": 200.0, "max_power_mw": 100.0},
        ])
