"""XY stage-speed model in replay pacing (reference mantis_engine.py:285-324).

The live engine slows short moves (< 2000 um -> 2.0 mm/s) to hold
autofocus lock and runs long moves at 5.75 mm/s; moves under 1 um are
ignored. With ``stage.model_speed`` on, the replay engine charges each
move its travel time and journals every move in the summary sidecar.
"""

import json

import numpy as np
import pytest

from shrimpy_tpu.engine.engine import AcquisitionEngine
from shrimpy_tpu.engine.plan import AcquisitionPlan, StagePlan
from shrimpy_tpu.engine.replay import ReplaySource
from shrimpy_tpu.io.platemap import PositionEntry, PositionList
from shrimpy_tpu.io.synthetic import (
    coordinate_encoded_fov,
    coordinate_encoded_plate,
)


@pytest.fixture()
def fov_source(tmp_path):
    coordinate_encoded_fov(tmp_path / "src.zarr", shape=(2, 1, 3, 16, 16))
    return ReplaySource(tmp_path / "src.zarr")


def test_move_time_rule_matches_reference():
    stage = StagePlan(model_speed=True)
    assert stage.move_time_s(0.5) is None  # negligible (< 1 um)
    speed, t = stage.move_time_s(1000.0)  # short move -> slow speed
    assert speed == 2.0
    assert t == pytest.approx(1.0 / 2.0)
    speed, t = stage.move_time_s(5000.0)  # long move -> fast speed
    assert speed == 5.75
    assert t == pytest.approx(5.0 / 5.75)


def test_grid_tiles_record_slow_moves(tmp_path, fov_source):
    plan = AcquisitionPlan(
        time={"n_timepoints": 2},
        stage={"model_speed": True, "time_scale": 0.0},
        stage_positions={
            "plate": {"rows": 1, "columns": 1},
            "well_points_plan": {
                "rows": 1,
                "columns": 2,
                "overlap": [0.0, 50.0],  # pitch 8 px = 8 um
            },
        },
    )
    AcquisitionEngine(fov_source).acquire(tmp_path / "out", "acq", plan)
    summary = json.loads(
        (tmp_path / "out" / "acq_summary_metadata.json").read_text()
    )
    moves = summary["stage_moves"]
    # 2 tiles x 2 timepoints: the first visit has no previous position;
    # every later visit is an 8 um tile hop (slow speed).
    assert len(moves) == 3
    for t, p_key, dist, speed, move_s in moves:
        assert dist == pytest.approx(8.0)
        assert speed == 2.0
        assert move_s == pytest.approx(8.0 / 1000.0 / 2.0, abs=1e-4)
    assert summary["stage_move_s"] == pytest.approx(
        sum(m[4] for m in moves), abs=1e-3
    )


def test_csv_homes_drive_fast_moves(tmp_path):
    coordinate_encoded_plate(
        tmp_path / "plate.zarr", n_positions=2, shape_tczyx=(1, 1, 2, 8, 8)
    )
    PositionList(
        [
            PositionEntry("A", row="0", col="0", fov="000", x_um=0.0, y_um=0.0),
            PositionEntry(
                "B", row="0", col="1", fov="001", x_um=3000.0, y_um=4000.0
            ),
        ]
    ).write(tmp_path / "positions.csv")
    plan = AcquisitionPlan(
        positions_csv=str(tmp_path / "positions.csv"),
        stage={"model_speed": True, "time_scale": 0.0},
    )
    AcquisitionEngine(ReplaySource(tmp_path / "plate.zarr")).acquire(
        tmp_path / "out", "acq", plan
    )
    summary = json.loads(
        (tmp_path / "out" / "acq_summary_metadata.json").read_text()
    )
    moves = summary["stage_moves"]
    assert len(moves) == 1  # the A -> B hop (first visit not charged)
    _, p_key, dist, speed, move_s = moves[0]
    assert p_key == "0/1/001"
    assert dist == pytest.approx(5000.0)  # hypot(3000, 4000)
    assert speed == 5.75
    assert move_s == pytest.approx(5.0 / 5.75, abs=1e-3)


def test_same_position_revisit_is_negligible(tmp_path, fov_source):
    plan = AcquisitionPlan(
        time={"n_timepoints": 3},
        stage={"model_speed": True, "time_scale": 0.0},
    )
    AcquisitionEngine(fov_source).acquire(tmp_path / "out", "acq", plan)
    summary = json.loads(
        (tmp_path / "out" / "acq_summary_metadata.json").read_text()
    )
    assert summary["stage_moves"] == []  # 0 um revisits: below deadband
    assert summary["stage_move_s"] == 0.0


def test_model_off_records_nothing(tmp_path, fov_source):
    plan = AcquisitionPlan(time={"n_timepoints": 2})
    AcquisitionEngine(fov_source).acquire(tmp_path / "out", "acq", plan)
    summary = json.loads(
        (tmp_path / "out" / "acq_summary_metadata.json").read_text()
    )
    assert summary["stage_moves"] == []


def test_move_time_sleep_feeds_latency_budget(tmp_path, fov_source, monkeypatch):
    """time_scale scales the charged sleep (1.0 = real-time replay)."""
    import shrimpy_tpu.engine.engine as engine_mod

    slept = []
    monkeypatch.setattr(
        engine_mod.time, "sleep", lambda s: slept.append(s)
    )
    plan = AcquisitionPlan(
        time={"n_timepoints": 2},
        stage={"model_speed": True, "time_scale": 0.5},
        stage_positions={
            "plate": {"rows": 1, "columns": 1},
            "well_points_plan": {
                "rows": 1,
                "columns": 2,
                "overlap": [0.0, 50.0],
            },
        },
    )
    AcquisitionEngine(fov_source).acquire(tmp_path / "out", "acq", plan)
    expected = 8.0 / 1000.0 / 2.0 * 0.5
    moves = [s for s in slept if np.isclose(s, expected, atol=1e-6)]
    assert len(moves) == 3
