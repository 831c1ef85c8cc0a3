"""Position-list CSV round trips + plate grids."""

import pytest

from shrimpy_tpu.io.platemap import PositionEntry, PositionList


def test_round_trip(tmp_path):
    plist = PositionList(
        [
            PositionEntry("A1-000", 100.0, 200.0, 5.0, "A", "1", "000"),
            PositionEntry("free", 1.5, -2.5, 0.0),
        ]
    )
    plist.write(tmp_path / "positions.csv")
    back = PositionList.read(tmp_path / "positions.csv")
    assert back.names() == ["A1-000", "free"]
    assert back.get("A1-000").hcs_key == "A/1/000"
    assert back.get("free").hcs_key is None
    assert back.get("free").y_um == -2.5


def test_update_coords(tmp_path):
    plist = PositionList([PositionEntry("P0", 0.0, 0.0, 0.0)])
    plist.update_coords("P0", 10.0, -5.0, 1.0)
    assert plist.get("P0").x_um == 10.0
    with pytest.raises(KeyError):
        plist.update_coords("missing", 0, 0, 0)


def test_plate_grid():
    plist = PositionList.from_plate_grid(["A", "B"], ["1", "2", "3"], fovs_per_well=4)
    assert len(plist) == 2 * 3 * 4
    e = plist.get("B/2-003")
    assert e.row == "B" and e.col == "2" and e.fov == "003"
    # wells are spaced by the pitch
    a1 = plist.get("A/1-000")
    b1 = plist.get("B/1-000")
    assert b1.y_um - a1.y_um == 9000.0
