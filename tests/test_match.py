"""NCC template matching (ops/match.py) vs a brute-force oracle.

Oracle is the direct normalized-cross-correlation formula (what
``skimage.feature.match_template`` computes, reference archive
``autotracker.py:162-184``) evaluated per displacement in numpy float64.
"""

import numpy as np
import pytest

from shrimpy_tpu.config.schemas import DynaTrackConfig
from shrimpy_tpu.ops.match import match_template, template_match_shift
from shrimpy_tpu.tracking.core import Tracker


def ncc_oracle(mov: np.ndarray, tmpl: np.ndarray) -> np.ndarray:
    mov = mov.astype(np.float64)
    tmpl = tmpl.astype(np.float64)
    tz = tmpl - tmpl.mean()
    ssd = float((tz * tz).sum())
    out_shape = tuple(m - t + 1 for m, t in zip(mov.shape, tmpl.shape))
    out = np.zeros(out_shape)
    for idx in np.ndindex(out_shape):
        win = mov[tuple(slice(i, i + t) for i, t in zip(idx, tmpl.shape))]
        var = float(((win - win.mean()) ** 2).sum())
        denom = np.sqrt(var * ssd)
        out[idx] = float((win * tz).sum()) / denom if denom > 1e-10 else 0.0
    return out


def test_ncc_surface_matches_oracle(rng):
    mov = rng.normal(size=(8, 12, 10)).astype(np.float32) * 10 + 50
    tmpl = mov[2:5, 3:7, 1:6].copy()
    got = match_template(mov, tmpl)
    want = ncc_oracle(mov, tmpl)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-4)
    # Self-match peaks at the template's own location with NCC ~ 1.
    peak = np.unravel_index(np.argmax(got), got.shape)
    assert peak == (2, 3, 1)
    assert got[peak] == pytest.approx(1.0, abs=1e-4)


def test_ncc_surface_matches_oracle_2d(rng):
    mov = rng.normal(size=(24, 17)).astype(np.float32)
    tmpl = rng.normal(size=(5, 6)).astype(np.float32)
    np.testing.assert_allclose(
        match_template(mov, tmpl), ncc_oracle(mov, tmpl), atol=2e-4
    )


def test_flat_windows_get_zero_ncc(rng):
    mov = np.zeros((6, 8, 8), np.float32)
    mov[3:, 4:, 4:] = rng.normal(size=(3, 4, 4))
    tmpl = mov[3:5, 4:6, 4:6].copy()
    surface = match_template(mov, tmpl)
    assert surface[0, 0, 0] == 0.0  # all-zero window: no variance


def test_template_shift_recovers_known_displacement(rng):
    ref = rng.normal(size=(10, 32, 32)).astype(np.float32)
    shift = (1, -3, 4)
    mov = np.roll(ref, shift, axis=(0, 1, 2))
    sl = ((3, 7), (10, 22), (8, 24))
    got = template_match_shift(ref, mov, sl)
    np.testing.assert_array_equal(got, shift)


def test_template_slice_bounds_checked(rng):
    ref = rng.normal(size=(4, 8, 8)).astype(np.float32)
    with pytest.raises(ValueError, match="out of bounds"):
        template_match_shift(ref, ref, ((0, 5), (0, 4), (0, 4)))
    with pytest.raises(ValueError, match="does not fit"):
        # Template larger than the (smaller) moving volume.
        template_match_shift(ref, ref[:2], ((0, 3), (0, 4), (0, 4)))


def test_tracker_template_matching_end_to_end(rng):
    cfg = DynaTrackConfig(
        input_channel="lf",
        tracking_channel="lf",
        tracking_method="template_matching",
        template={"slice_zyx": ((2, 6), (8, 24), (8, 24))},
    )
    tracker = Tracker(cfg, scale_zyx_um=(1.0, 1.0, 1.0))
    ref = rng.normal(size=(8, 32, 32)).astype(np.float32)
    r0 = tracker.update(ref, t=0)
    assert r0.reanchored  # first visit anchors, no correction
    mov = np.roll(ref, (1, 2, -3), axis=(0, 1, 2))
    r1 = tracker.update(mov, t=1)
    np.testing.assert_array_equal(r1.shift_px_zyx, (1, 2, -3))


def test_template_matching_requires_slice():
    with pytest.raises(ValueError, match="template.slice_zyx"):
        DynaTrackConfig(
            input_channel="lf",
            tracking_channel="lf",
            tracking_method="template_matching",
        )


def test_template_slice_schema_rejects_bad_bounds():
    with pytest.raises(ValueError, match="start < stop"):
        DynaTrackConfig(
            input_channel="lf",
            tracking_channel="lf",
            tracking_method="template_matching",
            template={"slice_zyx": ((0, 4), (5, 5), (0, 4))},
        )
