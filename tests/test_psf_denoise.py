"""Measured-PSF dispatch: noisy/aberrated PSFs must NOT silently drop
to the ~25x-slower FFT path (VERDICT round-1 weak #2).

A bead-measured PSF = smooth optics + iid measurement noise. Strict
rank decomposition can never reach a Frobenius tolerance below the
noise floor, so the auto path rank-truncates (SVD truncation = the PSF
denoiser) and keeps the separable fast path; genuinely non-separable
structure (residual above psf_denoise_max_residual) still routes to
the exact FFT path, loudly.
"""

import logging

import numpy as np
import pytest
from scipy.ndimage import rotate
from scipy.signal import fftconvolve

from shrimpy_tpu.config import DeconvolveSettings
from shrimpy_tpu.io.synthetic import gaussian_blob
from shrimpy_tpu.ops.deconv import (
    gaussian_psf,
    plan_separable_terms,
    richardson_lucy,
    richardson_lucy_reference,
    richardson_lucy_reference_separable,
    separable_decompose,
    separable_truncate,
)


@pytest.fixture(autouse=True)
def _propagate_deconv_logs():
    """Earlier tests may configure the package logger with
    propagate=False; caplog needs records to reach the root."""
    names = ("shrimpy_tpu", "shrimpy_tpu.ops", "shrimpy_tpu.ops.deconv")
    old = {n: logging.getLogger(n).propagate for n in names}
    for n in names:
        logging.getLogger(n).propagate = True
    yield
    for n, v in old.items():
        logging.getLogger(n).propagate = v


@pytest.fixture
def measured_like_psf(rng):
    """Tilted anisotropic Gaussian + 1% uniform noise floor — the
    shape/noise profile of a real bead-characterized light-sheet PSF
    (reference scripts/measure_psf.py geometry)."""
    psf = gaussian_psf((9, 21, 21), (1.4, 3.2, 2.2))
    psf = rotate(psf, angle=12.0, axes=(0, 1), reshape=False, order=3)
    psf = np.clip(psf, 0, None)
    psf = psf + rng.random(psf.shape, dtype=np.float32) * psf.max() * 0.01
    return (psf / psf.sum()).astype(np.float32)


def test_noisy_psf_defeats_strict_decomposition(measured_like_psf):
    assert separable_decompose(measured_like_psf, tol=1e-4, max_terms=12) is None


def test_plan_picks_denoised_separable(measured_like_psf, caplog):
    settings = DeconvolveSettings()
    with caplog.at_level(logging.WARNING):
        terms = plan_separable_terms(measured_like_psf, settings)
    assert terms is not None and len(terms) <= settings.max_separable_terms
    assert any("denoised to rank" in r.message for r in caplog.records)
    _, residual = separable_truncate(
        measured_like_psf, settings.max_separable_terms
    )
    assert residual <= settings.psf_denoise_max_residual


def test_plan_denoise_off_falls_back_to_fft(measured_like_psf, caplog):
    settings = DeconvolveSettings(psf_denoise="off")
    with caplog.at_level(logging.WARNING):
        terms = plan_separable_terms(measured_like_psf, settings)
    assert terms is None
    assert any("FFT path" in r.message for r in caplog.records)


def test_random_psf_still_routes_to_fft(rng, caplog):
    """A structureless PSF has a huge truncation residual: the denoise
    shortcut must refuse it (not all non-separable PSFs are noise)."""
    psf = rng.random((5, 9, 9), dtype=np.float32)
    psf /= psf.sum()
    settings = DeconvolveSettings()
    with caplog.at_level(logging.WARNING):
        terms = plan_separable_terms(psf, settings)
    assert terms is None
    assert any("exceeds psf_denoise_max_residual" in r.message for r in caplog.records)


def test_denoised_rl_matches_fp64_oracle(measured_like_psf, rng):
    """End parity: our RL with the rank-truncated PSF matches the fp64
    oracle running the SAME truncated terms to <= 1e-3."""
    shape = (12, 48, 48)
    truth = gaussian_blob(shape, (6.0, 22.0, 26.0), (1.4, 2.2, 2.2), 300.0)
    blurred = np.clip(
        fftconvolve(truth, measured_like_psf, mode="same")
        + rng.normal(0, 0.2, shape),
        0,
        None,
    ).astype(np.float32)
    settings = DeconvolveSettings(iterations=8)
    terms = plan_separable_terms(measured_like_psf, settings)
    assert terms is not None  # stays on the fast path
    ours = np.asarray(richardson_lucy(blurred, measured_like_psf, settings))
    oracle = richardson_lucy_reference_separable(
        blurred, measured_like_psf, iterations=8, terms=terms
    )
    err = np.abs(ours - oracle).max() / np.abs(oracle).max()
    assert err <= 1e-3, f"rel err {err:.2e}"


def test_denoised_rl_close_to_exact_psf_rl(measured_like_psf, rng):
    """Science sanity: deconvolving with the denoised PSF lands within
    a few e-3 of RL with the exact (noisy) PSF — the discarded rank is
    measurement noise, not signal."""
    shape = (12, 48, 48)
    truth = gaussian_blob(shape, (6.0, 22.0, 26.0), (1.4, 2.2, 2.2), 300.0)
    blurred = np.clip(
        fftconvolve(truth, measured_like_psf, mode="same")
        + rng.normal(0, 0.2, shape),
        0,
        None,
    ).astype(np.float32)
    ours = np.asarray(
        richardson_lucy(blurred, measured_like_psf, DeconvolveSettings(iterations=8))
    )
    exact = richardson_lucy_reference(blurred, measured_like_psf, iterations=8)
    interior = (slice(4, -4),) * 3
    err = (
        np.abs(ours[interior] - exact[interior]).max()
        / np.abs(exact[interior]).max()
    )
    assert err <= 2e-2, f"denoised vs exact-PSF RL: {err:.2e}"
    assert float(np.mean((ours - truth) ** 2)) < 0.6 * float(
        np.mean((blurred - truth) ** 2)
    )


# -- extended rank tier: structured PSFs between rank 6 and rank 10 ----------


@pytest.fixture
def rank8_psf():
    """A clean tilted light-sheet PSF: the 12-degree z-y rotation puts
    its cascade rank at 9 (the z extent), with rank 6 leaving ~1.7e-3 —
    exactly the clean-but-aberrated class the extended-rank tier exists
    for (measured deskewed-geometry PSFs are tilted the same way,
    reference ``scripts/measure_psf.py:186-190``)."""
    psf = gaussian_psf((9, 21, 21), (1.4, 3.2, 2.2))
    psf = rotate(psf, angle=12.0, axes=(0, 1), reshape=False, order=3)
    psf = np.clip(psf, 0, None)
    return (psf / psf.sum()).astype(np.float32)


def test_extended_rank_keeps_structured_psf_separable(rank8_psf, caplog):
    assert separable_decompose(rank8_psf, tol=1e-4, max_terms=6) is None
    settings = DeconvolveSettings()
    with caplog.at_level(logging.WARNING, logger="shrimpy_tpu.ops.deconv"):
        terms = plan_separable_terms(rank8_psf, settings)
    assert terms is not None
    assert 6 < len(terms) <= settings.max_extended_terms
    assert any("extended rank" in r.message for r in caplog.records)


def test_extended_rank_rl_parity(rank8_psf, rng):
    """RL-10 with an extended-rank PSF on the separable path matches the
    fp64 FFT-free oracle within the parity budget."""
    import jax.numpy as jnp

    vol = (rng.random((12, 48, 64), dtype=np.float32) * 100 + 1.0).astype(
        np.float32
    )
    settings = DeconvolveSettings(iterations=10, algorithm="auto")
    terms = plan_separable_terms(rank8_psf, settings)
    assert terms is not None and len(terms) > 6
    ours = np.asarray(richardson_lucy(jnp.asarray(vol), rank8_psf, settings))
    oracle = richardson_lucy_reference_separable(
        vol, rank8_psf, iterations=10, terms=terms
    )
    rel = np.abs(ours - oracle).max() / np.abs(oracle).max()
    assert rel <= 1e-3, rel


def test_denoise_stops_at_noise_plateau(measured_like_psf):
    """The denoise tier stops adding terms at the noise plateau (each
    extra term improving the residual by <8%) instead of always burning
    max_terms of per-iteration cost on noise modes."""
    full, _ = separable_truncate(measured_like_psf, max_terms=10)
    stopped, residual = separable_truncate(
        measured_like_psf, max_terms=10, plateau_rtol=0.08
    )
    assert len(stopped) < len(full)
    assert residual <= 0.06  # the structure is still captured
