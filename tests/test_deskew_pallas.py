"""Pallas deskew kernel: parity vs the XLA path and the scipy oracle.

Runs in Pallas interpreter mode on the CPU mesh (SURVEY.md §4 strategy).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from shrimpy_tpu.config import DeskewSettings
from shrimpy_tpu.io.synthetic import render_beads_skewed
from shrimpy_tpu.ops.deskew import deskew_reference_scipy, deskew_volume
from shrimpy_tpu.ops.deskew_pallas import deskew_volume_pallas


@pytest.mark.parametrize("keep_overhang", [False, True])
def test_pallas_matches_xla(rng, keep_overhang):
    settings = DeskewSettings(
        ls_angle_deg=30.0, px_to_scan_ratio=0.386, keep_overhang=keep_overhang
    )
    raw = rng.random((40, 32, 24), dtype=np.float32) * 100.0
    ours = np.asarray(deskew_volume_pallas(raw, settings, interpret=True))
    xla = np.asarray(deskew_volume(raw, settings))
    assert ours.shape == xla.shape
    np.testing.assert_allclose(ours, xla, rtol=1e-4, atol=1e-3)


def test_pallas_matches_scipy_oracle(rng):
    settings = DeskewSettings(ls_angle_deg=30.0, px_to_scan_ratio=0.386)
    raw = rng.random((48, 24, 16), dtype=np.float32) * 50.0
    ours = np.asarray(deskew_volume_pallas(raw, settings, interpret=True))
    oracle = deskew_reference_scipy(raw, settings)
    err = np.abs(ours - oracle).max() / np.abs(oracle).max()
    assert err <= 1e-3, f"rel err {err:.2e}"


def test_pallas_z_averaging(rng):
    settings = DeskewSettings(
        ls_angle_deg=30.0, px_to_scan_ratio=0.386, average_n_slices=3
    )
    raw = rng.random((40, 32, 16), dtype=np.float32)
    ours = np.asarray(deskew_volume_pallas(raw, settings, interpret=True))
    xla = np.asarray(deskew_volume(raw, settings))
    np.testing.assert_allclose(ours, xla, rtol=1e-4, atol=1e-3)


def test_pallas_beads_land_correctly():
    """Geometric end-to-end: beads rendered in skewed space appear at
    their lab positions (minus the fully-sampled-band y crop)."""
    import math

    settings = DeskewSettings(ls_angle_deg=30.0, px_to_scan_ratio=0.386)
    beads = np.array([[6.0, 60.0, 12.0], [10.0, 80.0, 20.0]])
    raw = render_beads_skewed((64, 48, 32), beads)
    out = np.asarray(deskew_volume_pallas(raw, settings, interpret=True))
    y_off = 47 * math.cos(math.radians(30.0))
    for z, y, x in beads:
        zi, yi, xi = int(round(z)), int(round(y - y_off)), int(round(x))
        patch = out[zi - 2 : zi + 3, yi - 2 : yi + 3, xi - 2 : xi + 3]
        assert patch.max() > 0.3 * out.max()


def test_overhang_bands_clamp_to_scan_extent(rng):
    """keep_overhang output rows past the sampled scan extent carry
    only zero-weight taps, so their DMA bands clamp into the raw scan
    extent instead of zero-padding the raw volume out to the overhang
    (the padding alone was a 17.8 GB OOM at the (300, 2048, 2048) bench
    geometry). A long scan makes the overhang span several y blocks:
    both all-invalid and partially-valid bands must match the XLA
    gather path exactly."""
    from shrimpy_tpu.ops.deskew_pallas import _plan, _round_up

    raw = rng.random((180, 64, 64), dtype=np.float32) * 100.0
    s = DeskewSettings(
        ls_angle_deg=30.0, px_to_scan_ratio=0.386, keep_overhang=True
    )
    plan = _plan(raw.shape, s)
    assert plan["ns_eff"] <= max(_round_up(180, 8), plan["span"])
    ours = np.asarray(deskew_volume_pallas(raw, s, interpret=True))
    xla = np.asarray(deskew_volume(raw, s))
    assert ours.shape == xla.shape
    # Relative criterion: at this scan length the two paths' f32
    # coordinate roundoff differs by ~1.5e-5 relative (pre-existing,
    # measured identical before/after the band clamp).
    err = np.abs(ours - xla).max() / np.abs(xla).max()
    assert err <= 1e-4, f"rel err {err:.2e}"


def test_band_clamp_regression_long_scan(rng):
    """Scan extents much longer than one band span, with
    (ns - span) % 8 != 0: the last y-block's band must still include
    the final raw rows (the upper s_lo clamp used to shift it off them,
    zero-weighting the outermost output rows — production-geometry
    regression)."""
    from shrimpy_tpu.ops.deskew import _deskew_xla
    from shrimpy_tpu.ops.deskew_pallas import deskew_volume_pallas

    raw = rng.random((180, 64, 64), dtype=np.float32)
    s = DeskewSettings(ls_angle_deg=30.0, px_to_scan_ratio=0.386)
    ours = np.asarray(deskew_volume_pallas(raw, s))
    ref = np.asarray(_deskew_xla(
        jnp.asarray(raw), ls_angle_deg=30.0, px_to_scan_ratio=0.386,
        keep_overhang=False, average_n_slices=1,
    ))
    err = np.abs(ours - ref).max()
    assert err <= 1e-4, err
