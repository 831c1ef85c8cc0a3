"""Deskew: scipy-oracle parity + geometric bead validation.

The oracle contract is BASELINE.json configs[0]: max abs error <= 1e-3
vs ``scipy.ndimage.affine_transform`` (order=1) on the same inverse
affine map.
"""

import math

import numpy as np
import pytest

from shrimpy_tpu.config import DeskewSettings
from shrimpy_tpu.io.synthetic import render_beads_skewed, synthetic_ls_stack
from shrimpy_tpu.ops.deskew import (
    deskew_reference_scipy,
    deskew_volume,
    get_deskewed_shape,
)


@pytest.mark.parametrize("keep_overhang", [False, True])
@pytest.mark.parametrize("average_n_slices", [1, 3])
def test_deskew_matches_scipy(rng, keep_overhang, average_n_slices):
    settings = DeskewSettings(
        ls_angle_deg=30.0,
        px_to_scan_ratio=0.386,
        keep_overhang=keep_overhang,
        average_n_slices=average_n_slices,
    )
    raw = rng.random((40, 32, 24), dtype=np.float32) * 100.0

    ours = np.asarray(deskew_volume(raw, settings))
    oracle = deskew_reference_scipy(raw, settings)

    assert ours.shape == oracle.shape
    scale = np.abs(oracle).max()
    err = np.abs(ours - oracle).max() / max(scale, 1e-12)
    assert err <= 1e-3, f"relative max abs err {err:.2e} (scale {scale:.3g})"


def test_deskewed_shape_and_voxel_size():
    settings = DeskewSettings(
        ls_angle_deg=30.0, px_to_scan_ratio=0.386, keep_overhang=False,
        average_n_slices=3, pixel_size_um=0.116,
    )
    shape, voxel = get_deskewed_shape((1201, 256, 1600), settings)
    nz, ny, nx = shape
    assert nx == 1600
    # z extent: (256-1)*sin(30 deg) = 127.5 -> 128 full slices -> 43 averaged
    assert nz == -(-128 // 3)
    # y band: (1201-1)/0.386 - 255*cos(30) ~ 2887.5
    assert 2800 < ny < 2950
    assert voxel[1] == voxel[2] == 0.116
    # Output z spacing is ONE CAMERA PIXEL per slice (t = zo/sin(theta)
    # => z_lab(zo) = zo*px): 128 unit-px slices span the physical
    # (256-1)*px*sin(30)=127.5 px z extent. The old px*sin(theta)
    # figure understated the physical spacing 2x at 30 deg.
    assert voxel[0] == pytest.approx(3 * 0.116, rel=1e-6)


def test_deskew_beads_land_at_lab_positions():
    """A bead rendered in skewed space must appear at its lab-space voxel."""
    raw, beads = synthetic_ls_stack(raw_shape_szx=(64, 48, 48), n_beads=4, seed=3)
    settings = DeskewSettings(
        ls_angle_deg=30.0, px_to_scan_ratio=0.386, keep_overhang=True
    )
    out = np.asarray(deskew_volume(raw, settings))

    # find each bead's nearest local maximum
    for z, y, x in beads:
        zi, yi, xi = int(round(z)), int(round(y)), int(round(x))
        lo = np.maximum([zi - 3, yi - 3, xi - 3], 0)
        hi = [zi + 4, yi + 4, xi + 4]
        patch = out[lo[0] : hi[0], lo[1] : hi[1], lo[2] : hi[2]]
        # center of mass of the local patch ~ bead position
        w = patch - patch.min()
        total = w.sum()
        assert total > 0
        zz, yy, xx = np.meshgrid(
            np.arange(lo[0], lo[0] + patch.shape[0]),
            np.arange(lo[1], lo[1] + patch.shape[1]),
            np.arange(lo[2], lo[2] + patch.shape[2]),
            indexing="ij",
        )
        com = np.array([(w * g).sum() / total for g in (zz, yy, xx)])
        np.testing.assert_allclose(com, [z, y, x], atol=0.5)


def test_no_overhang_is_fully_sampled_subset():
    """keep_overhang=False output equals the central band of the full output."""
    settings_full = DeskewSettings(
        ls_angle_deg=30.0, px_to_scan_ratio=0.5, keep_overhang=True
    )
    settings_crop = DeskewSettings(
        ls_angle_deg=30.0, px_to_scan_ratio=0.5, keep_overhang=False
    )
    rng = np.random.default_rng(0)
    raw = rng.random((48, 24, 16), dtype=np.float32)
    full = np.asarray(deskew_volume(raw, settings_full))
    crop = np.asarray(deskew_volume(raw, settings_crop))

    theta = math.radians(30.0)
    y0 = (raw.shape[1] - 1) * math.cos(theta)
    # The cropped output samples y = yo + y0; compare against the scipy
    # oracle of the cropped geometry rather than an integer slice of the
    # full volume (y0 is not an integer).
    oracle = deskew_reference_scipy(raw, settings_crop)
    np.testing.assert_allclose(crop, oracle, atol=1e-3)
    # no-overhang z extent is the fully-sampled floor; overhang rounds up
    assert crop.shape[0] <= full.shape[0] <= crop.shape[0] + 1
    assert crop.shape[1] < full.shape[1]
    assert y0 > 0
