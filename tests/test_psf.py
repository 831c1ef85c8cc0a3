"""PSF measurement: detection, extraction, FWHM, end-to-end."""

import json

import numpy as np
import pytest

from shrimpy_tpu.io.ngff import create_fov
from shrimpy_tpu.io.synthetic import gaussian_blob
from shrimpy_tpu.psf import (
    characterize_psf,
    detect_beads,
    extract_psf,
    measure_psf,
)


def _bead_stack(shape=(48, 96, 96), sigma=(1.2, 2.0, 2.0), n=6, seed=3):
    rng = np.random.default_rng(seed)
    vol = np.zeros(shape, np.float32)
    centers = []
    margin = 20
    while len(centers) < n:
        c = rng.uniform(margin, np.asarray(shape) - margin)
        if all(np.linalg.norm(c - np.asarray(e)) > 24 for e in centers):
            centers.append(tuple(c))
    for c in centers:
        vol += gaussian_blob(shape, c, sigma, amplitude=1000.0)
    vol += rng.normal(20.0, 2.0, shape).astype(np.float32)
    return vol, np.asarray(centers), sigma


def test_detect_beads_finds_all():
    vol, centers, _ = _bead_stack()
    peaks = detect_beads(vol, threshold_percentile=99.0, min_distance=8)
    assert len(peaks) == len(centers)
    for c in centers:
        assert np.min(np.linalg.norm(peaks - c, axis=1)) < 2.0


def test_extract_and_characterize():
    vol, centers, sigma = _bead_stack()
    peaks = detect_beads(vol, threshold_percentile=99.0)
    psf = extract_psf(vol, peaks, (17, 21, 21))
    assert psf is not None
    assert psf.shape == (17, 21, 21)
    assert psf.sum() == pytest.approx(1.0, rel=1e-5)

    report = characterize_psf(psf, (0.25, 0.1, 0.1), n_beads=len(peaks))
    # FWHM of a Gaussian = 2.355 sigma (voxel) * scale.
    expected = [2.355 * s * sc for s, sc in zip(sigma, (0.25, 0.1, 0.1))]
    np.testing.assert_allclose(report.fwhm_um_zyx, expected, rtol=0.15)


def test_measure_psf_end_to_end(tmp_path):
    vol, _, _ = _bead_stack()
    pos = create_fov(
        tmp_path / "beads.zarr",
        shape=(1, 1, *vol.shape),
        dtype="float32",
        zyx_scale=(0.25, 0.1, 0.1),
    )
    pos.write((0, 0), vol)
    report = measure_psf(
        tmp_path / "beads.zarr", tmp_path / "psf", geometry="epi",
        threshold_percentile=99.0,
    )
    assert report.n_beads >= 5
    psf = np.load(tmp_path / "psf.npy")
    assert psf.shape == (31, 31, 31)
    meta = json.loads((tmp_path / "psf.json").read_text())
    assert meta["n_beads"] == report.n_beads

    # The measured PSF drives RL deconvolution directly.
    from shrimpy_tpu.config import DeconvolveSettings
    from shrimpy_tpu.ops.deconv import richardson_lucy

    out = richardson_lucy(
        vol[:16, :32, :32], psf, DeconvolveSettings(iterations=2)
    )
    assert np.isfinite(np.asarray(out)).all()


def test_no_beads_raises(tmp_path):
    pos = create_fov(tmp_path / "flat.zarr", shape=(1, 1, 16, 32, 32), dtype="float32")
    pos.write((0, 0), np.ones((16, 32, 32), np.float32))
    with pytest.raises(ValueError, match="beads|empty"):
        measure_psf(tmp_path / "flat.zarr", tmp_path / "psf")
