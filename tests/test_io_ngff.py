"""OME-Zarr IO: roundtrips, layouts, versions, coordinate-encoded fixtures.

Modeled on the reference's replay-camera dataset tests
(``tests/test_replay_camera.py:33-128``).
"""

import json

import numpy as np
import pytest

from shrimpy_tpu.io import (
    coordinate_encoded_plate,
    coordinate_encoded_value,
    create_fov,
    open_ngff,
    synthetic_blob_fov,
    synthetic_ls_stack,
)
from shrimpy_tpu.io.synthetic import coordinate_encoded_fov


@pytest.mark.parametrize("version", ["0.4", "0.5"])
def test_fov_roundtrip(tmp_path, version):
    path = tmp_path / "fov.zarr"
    shape = (2, 1, 4, 16, 16)
    pos = create_fov(
        path, shape=shape, dtype="uint16", version=version, zyx_scale=(0.2, 0.1, 0.1)
    )
    data = np.arange(np.prod(shape), dtype=np.uint16).reshape(shape)
    pos.write(Ellipsis, data)

    store = open_ngff(path)
    assert not store.is_plate
    got = store.position()
    assert got.shape == shape
    assert got.zyx_scale == (0.2, 0.1, 0.1)
    np.testing.assert_array_equal(got.read(), data)
    # volume accessor
    np.testing.assert_array_equal(got.volume(1, 0), data[1, 0])


@pytest.mark.parametrize("version", ["0.4", "0.5"])
def test_coordinate_encoded_plate(tmp_path, version):
    path = tmp_path / "plate.zarr"
    store = coordinate_encoded_plate(
        path, n_positions=2, shape_tczyx=(2, 2, 3, 8, 8), version=version
    )
    keys = list(store.positions())
    assert keys == ["0/0/000", "0/1/001"]

    reopened = open_ngff(path)
    assert reopened.is_plate
    for p, key in enumerate(reopened.positions()):
        pos = reopened.position(key)
        for t in range(2):
            for c in range(2):
                for z in range(3):
                    plane = pos.read((t, c, z))
                    expected = coordinate_encoded_value(p, t, c, z)
                    assert plane.min() == plane.max() == expected, (p, t, c, z)


def test_fov_metadata_format_v05(tmp_path):
    path = tmp_path / "fov.zarr"
    coordinate_encoded_fov(path, shape=(1, 1, 2, 8, 8), version="0.5")
    meta = json.loads((path / "zarr.json").read_text())
    assert meta["zarr_format"] == 3
    ome = meta["attributes"]["ome"]
    assert ome["version"] == "0.5"
    assert ome["multiscales"][0]["axes"][0]["name"] == "t"
    # array is zarr v3 with blosc-zstd
    arr_meta = json.loads((path / "0" / "zarr.json").read_text())
    codecs = {c["name"] for c in arr_meta["codecs"]}
    assert "blosc" in codecs


def test_fov_metadata_format_v04(tmp_path):
    path = tmp_path / "fov.zarr"
    coordinate_encoded_fov(path, shape=(1, 1, 2, 8, 8), version="0.4")
    attrs = json.loads((path / ".zattrs").read_text())
    assert attrs["multiscales"][0]["version"] == "0.4"
    arr_meta = json.loads((path / "0" / ".zarray").read_text())
    assert arr_meta["compressor"]["id"] == "blosc"
    assert arr_meta["compressor"]["cname"] == "zstd"


def test_blob_fov_drift(tmp_path):
    pos = synthetic_blob_fov(
        tmp_path / "blob.zarr", shape_zyx=(8, 32, 32), n_timepoints=3,
        drift_zyx=(0.0, 4.0, -4.0), noise=0.0,
    )
    v0 = pos.volume(0, 0)
    v2 = pos.volume(2, 0)
    # peak drifts by (0, +8, -8) px over 2 timepoints
    p0 = np.unravel_index(np.argmax(v0), v0.shape)
    p2 = np.unravel_index(np.argmax(v2), v2.shape)
    assert p2[1] - p0[1] == 8
    assert p2[2] - p0[2] == -8


def test_synthetic_ls_stack_writes_scale(tmp_path):
    raw, beads = synthetic_ls_stack(
        tmp_path / "ls.zarr", raw_shape_szx=(32, 24, 24), n_beads=3
    )
    assert raw.shape == (32, 24, 24)
    assert raw.max() > 0
    store = open_ngff(tmp_path / "ls.zarr")
    z_scale, y_scale, x_scale = store.position().zyx_scale
    assert y_scale == x_scale == 0.116
    assert z_scale == pytest.approx(0.116 / 0.386, rel=1e-6)


def test_pyramid_levels(tmp_path):
    import numpy as np

    from shrimpy_tpu.io.ngff import add_pyramid_levels, create_fov, open_ngff

    pos = create_fov(
        tmp_path / "pyr.zarr", shape=(1, 1, 4, 16, 16), dtype="float32"
    )
    data = np.arange(4 * 16 * 16, dtype=np.float32).reshape(4, 16, 16)
    pos.write((0, 0), data)
    add_pyramid_levels(pos, n_levels=2)

    back = open_ngff(tmp_path / "pyr.zarr").position()
    assert len(back.multiscales[0]["datasets"]) == 3
    lvl1 = np.asarray(back.array("1")[0, 0].read().result())
    assert lvl1.shape == (4, 8, 8)
    # level 1 is the 2x2 YX mean of level 0
    np.testing.assert_allclose(
        lvl1[0, 0, 0], data[0, :2, :2].mean(), rtol=1e-6
    )
    lvl2 = np.asarray(back.array("2")[0, 0].read().result())
    assert lvl2.shape == (4, 4, 4)
    # scale metadata doubles per level on YX
    scales = [
        d["coordinateTransformations"][0]["scale"]
        for d in back.multiscales[0]["datasets"]
    ]
    assert scales[1][-1] == 2 * scales[0][-1]
    assert scales[2][-1] == 4 * scales[0][-1]
