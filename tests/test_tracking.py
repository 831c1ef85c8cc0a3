"""Tracking core: limits/dampening, methods, re-anchor, journal.

Mirrors the reference's pure unit tier for DynaTrack
(``tests/test_dynatrack.py:84-147,249-299,352-375,947-1030``).
"""

import numpy as np
import pytest

from shrimpy_tpu.config import DynaTrackConfig, ShiftSettings
from shrimpy_tpu.io.synthetic import gaussian_blob
from shrimpy_tpu.tracking import (
    ShiftJournal,
    Tracker,
    apply_dampening,
    apply_limits,
    image_to_stage_shift,
    shift_px_to_um,
)
from shrimpy_tpu.tracking.core import corrected_position, process_shift


def _config(**kwargs):
    defaults = dict(input_channel="BF", tracking_channel="BF")
    defaults.update(kwargs)
    return DynaTrackConfig(**defaults)


# -- pure post-processing ----------------------------------------------------


def test_shift_px_to_um():
    out = shift_px_to_um(np.array([2.0, -4.0, 1.0]), (0.5, 0.1, 0.1))
    np.testing.assert_allclose(out, [1.0, -0.4, 0.1])


def test_limits_deadband_and_clip():
    limits = {"z": (0.5, 2.0), "y": (0.0, 1.0)}
    out = apply_limits(np.array([0.3, -5.0, 7.0]), limits)
    # z below deadband -> 0; y clipped to -1 preserving sign; x unlimited.
    np.testing.assert_allclose(out, [0.0, -1.0, 7.0])


def test_limits_none_is_identity():
    s = np.array([1.0, 2.0, 3.0])
    np.testing.assert_allclose(apply_limits(s, None), s)


def test_dampening():
    out = apply_dampening(np.array([1.0, 2.0, 3.0]), (0.5, 0.5, 0.0))
    np.testing.assert_allclose(out, [0.5, 1.0, 0.0])


def test_image_to_stage_matrix():
    # Flip x and swap nothing: stage_x = -image_x.
    m = [[-1.0, 0, 0], [0, 1.0, 0], [0, 0, 1.0]]
    out = image_to_stage_shift(np.array([3.0, 2.0, 1.0]), m)  # zyx input
    np.testing.assert_allclose(out, [-1.0, 2.0, 3.0])  # xyz output


def test_corrected_position_subtracts_shift():
    pos = corrected_position(np.array([100.0, 200.0, 50.0]), np.array([1.0, -2.0, 0.5]))
    np.testing.assert_allclose(pos, [99.0, 202.0, 49.5])


def test_process_shift_chain():
    um, stage = process_shift(
        np.array([10.0, 10.0, 10.0]),
        scale_zyx_um=(0.1, 0.1, 0.1),
        settings=ShiftSettings(limits={"z": (0.0, 0.5)}, dampening=(1.0, 0.5, 0.5)),
        matrix_xyz=None,
    )
    np.testing.assert_allclose(um, [0.5, 0.5, 0.5])
    np.testing.assert_allclose(stage, [0.5, 0.5, 0.5])


# -- tracker methods ---------------------------------------------------------


def _blob_stack(center, shape=(16, 32, 32)):
    return gaussian_blob(shape, center, (2.0, 3.0, 3.0), amplitude=100.0)


def test_pcc_tracker_first_update_stores_reference():
    tracker = Tracker(_config(tracking_method="pcc"))
    r0 = tracker.update(_blob_stack((8.0, 16.0, 16.0)), t=0)
    np.testing.assert_allclose(r0.shift_px_zyx, 0.0)
    assert tracker.has_reference(0)

    # Object moved by (+2, -3, +4): PCC reports the displacement.
    r1 = tracker.update(_blob_stack((10.0, 13.0, 20.0)), t=1)
    np.testing.assert_allclose(r1.shift_px_zyx, [2.0, -3.0, 4.0], atol=0.6)


def test_reanchor_policy():
    tracker = Tracker(_config(tracking_method="pcc", reference_update_interval=2))
    tracker.update(_blob_stack((8.0, 16.0, 16.0)), t=0)
    r1 = tracker.update(_blob_stack((8.0, 18.0, 16.0)), t=1)
    assert not r1.reanchored
    r2 = tracker.update(_blob_stack((8.0, 20.0, 16.0)), t=2)
    assert r2.reanchored  # re-anchored at the interval
    # A re-anchor timepoint applies NO correction: correcting against a
    # reference we are about to discard would be re-measured (and thus
    # re-applied) against the new pre-correction anchor next timepoint
    # (reference tracking.py:1115-1137).
    np.testing.assert_allclose(r2.shift_px_zyx, [0.0, 0.0, 0.0])
    # After re-anchor, shifts are measured against the t=2 stack.
    r3 = tracker.update(_blob_stack((8.0, 21.0, 16.0)), t=3)
    np.testing.assert_allclose(r3.shift_px_zyx, [0.0, 1.0, 0.0], atol=0.6)


def test_tracking_interval_skips():
    tracker = Tracker(_config(tracking_method="pcc", tracking_interval=2))
    r = tracker.update(_blob_stack((8.0, 16.0, 16.0)), t=1)
    assert r.skipped
    assert not tracker.has_reference(0)


def test_intensity_center_of_mass_referenceless():
    tracker = Tracker(_config(tracking_method="intensity_center_of_mass"))
    # Blob displaced (+1, +2, -3) from the volume center (7.5, 15.5, 15.5).
    r = tracker.update(_blob_stack((8.5, 17.5, 12.5)), t=0)
    np.testing.assert_allclose(r.shift_px_zyx, [1.0, 2.0, -3.0], atol=0.3)


def test_multiotsu_center_of_mass(rng):
    cfg = _config(tracking_method="multiotsu_center_of_mass")
    cfg.segmentation.otsu_sigma = 1.0
    tracker = Tracker(cfg)
    stack = _blob_stack((9.0, 18.0, 14.0)) + rng.normal(0, 1.0, (16, 32, 32)).astype(
        np.float32
    )
    r = tracker.update(stack, t=0)
    np.testing.assert_allclose(r.shift_px_zyx, [1.5, 2.5, -1.5], atol=1.0)


def test_roi_center_pcc_referenceless():
    cfg = _config(tracking_method="roi_center_pcc")
    cfg.roi_center.blob_sigma = 3.0
    tracker = Tracker(cfg)
    r = tracker.update(_blob_stack((9.5, 19.5, 11.5)), t=0)
    np.testing.assert_allclose(r.shift_px_zyx, [2.0, 4.0, -4.0], atol=0.8)


def test_per_position_references():
    tracker = Tracker(_config(tracking_method="pcc"))
    tracker.update(_blob_stack((8.0, 16.0, 16.0)), t=0, p="A")
    tracker.update(_blob_stack((8.0, 10.0, 16.0)), t=0, p="B")
    rA = tracker.update(_blob_stack((8.0, 18.0, 16.0)), t=1, p="A")
    rB = tracker.update(_blob_stack((8.0, 13.0, 16.0)), t=1, p="B")
    np.testing.assert_allclose(rA.shift_px_zyx, [0.0, 2.0, 0.0], atol=0.6)
    np.testing.assert_allclose(rB.shift_px_zyx, [0.0, 3.0, 0.0], atol=0.6)


# -- journal -----------------------------------------------------------------


def test_shift_journal_round_trip(tmp_path):
    journal = ShiftJournal(tmp_path / "dynatrack_log.csv")
    cfg = _config(tracking_method="pcc")
    tracker = Tracker(cfg, scale_zyx_um=(0.5, 0.1, 0.1), journal=journal)
    tracker.update(_blob_stack((8.0, 16.0, 16.0)), t=0)
    tracker.update(_blob_stack((10.0, 16.0, 16.0)), t=1)

    rows = journal.rows()
    assert len(rows) == 2
    assert rows[0]["method"] == "pcc"
    assert float(rows[1]["shift_z_px"]) == pytest.approx(2.0, abs=0.6)
    assert float(rows[1]["shift_z_um"]) == pytest.approx(1.0, abs=0.3)


def test_config_rejects_unknown_keys():
    with pytest.raises(ValueError):
        DynaTrackConfig(input_channel="BF", tracking_channel="BF", bogus=1)


def test_config_rejects_unknown_method():
    with pytest.raises(ValueError, match="tracking_method"):
        _config(tracking_method="nope")


def test_debug_artifacts(tmp_path):
    from shrimpy_tpu.io.ngff import open_ngff
    from shrimpy_tpu.tracking.debug import DebugWriter

    cfg = _config(tracking_method="pcc", debug=True)
    tracker = Tracker(cfg, debug_writer=DebugWriter(tmp_path / "dbg"))
    tracker.update(_blob_stack((8.0, 16.0, 16.0)), t=0)
    tracker.update(_blob_stack((10.0, 13.0, 20.0)), t=1)

    store = open_ngff(tmp_path / "dbg" / "dynatrack_debug.zarr")
    pos = store.position()
    data0 = pos.volume(0, 0)
    assert data0.max() > 0
    pngs = sorted((tmp_path / "dbg").glob("debug_t*.png"))
    assert len(pngs) == 2


def test_tracking_scale_uses_deskewed_voxel():
    """With deskew in the preprocessing chain the tracker's px->um
    conversion must use the DESKEWED voxel (n_avg*px, px, px — the
    deskew output z grid is one camera pixel per slice), not the raw
    scan scale (reference manager.py:242-262 injects derived pixel
    sizes post-deskew)."""
    import numpy as np

    from shrimpy_tpu.config.schemas import DynaTrackConfig
    from shrimpy_tpu.tracking.preprocess import Preprocessor

    cfg = DynaTrackConfig(
        tracking_channel="BF",
        input_channel="BF",
        preprocessing=["deskew"],
        deskew={
            "ls_angle_deg": 30.0,
            "px_to_scan_ratio": 0.386,
            "pixel_size_um": 0.116,
            "average_n_slices": 3,
        },
    )
    pre = Preprocessor(cfg)
    raw_scale = (0.3, 0.116, 0.116)  # scan step 0.3 um
    scale = pre.tracking_scale_zyx((64, 128, 128), raw_scale)
    # Unit-pixel output z grid: n_avg*px per averaged slice (the old
    # px*sin(theta) figure understated the physical spacing 2x at 30).
    assert np.isclose(scale[0], 3 * 0.116)
    assert scale[1:] == (0.116, 0.116)

    cfg2 = DynaTrackConfig(
        tracking_channel="BF",
        input_channel="BF",
        preprocessing=["phase"],
        phase={"transfer_function": {
            "yx_pixel_size": 0.116, "z_pixel_size": 0.3,
        }},
    )
    pre2 = Preprocessor(cfg2)
    assert pre2.tracking_scale_zyx((64, 128, 128), raw_scale) == raw_scale
