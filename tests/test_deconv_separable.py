"""Separable (circulant-matmul) RL path: oracle parity + dispatch rules."""

import numpy as np
import pytest

# Heavyweight module (big compiles / end-to-end): excluded from the
# quick review-loop tier (docs/testing.md).
pytestmark = pytest.mark.slow
from scipy.signal import fftconvolve

from shrimpy_tpu.config import DeconvolveSettings
from shrimpy_tpu.io.synthetic import gaussian_blob
from shrimpy_tpu.ops.deconv import (
    gaussian_psf,
    richardson_lucy,
    richardson_lucy_reference_separable,
    separable_decompose,
)


def _scene(rng, shape=(20, 40, 40)):
    truth = gaussian_blob(shape, (10.0, 18.0, 24.0), (1.2, 1.8, 1.8), amplitude=400.0)
    psf = gaussian_psf((7, 13, 13), (1.2, 2.0, 2.0))
    blurred = np.clip(
        fftconvolve(truth, psf, mode="same") + rng.normal(0, 0.2, shape), 0, None
    ).astype(np.float32)
    return truth, psf, blurred


def asymmetric_psf(shape=(7, 11, 11)):
    """Rank-1 separable PSF with ASYMMETRIC taps on every axis.

    Measured bead PSFs are axially asymmetric; a backend that silently
    flips taps (correlation instead of convolution) passes symmetric-
    Gaussian parity tests but deconvolves real PSFs with a mirrored
    kernel. This fixture is the regression guard for that class of bug
    (round-1 advisor finding on the zy_pallas/conv3 kernels)."""
    axes = []
    for n, sigma, skew in zip(shape, (1.2, 1.8, 1.8), (0.55, 0.35, -0.45)):
        u = np.arange(n, dtype=np.float64) - n // 2
        t = np.exp(-0.5 * (u / sigma) ** 2) * (1.0 + skew * np.tanh(u / sigma))
        axes.append(t)
    psf = np.einsum("z,y,x->zyx", *axes)
    return (psf / psf.sum()).astype(np.float32)


def test_gaussian_psf_is_rank_one():
    psf = gaussian_psf((7, 13, 13), (1.2, 2.0, 2.0))
    terms = separable_decompose(psf, tol=1e-4, max_terms=6)
    assert terms is not None and len(terms) == 1
    wz, wy, wx = terms[0]
    recon = np.einsum("z,y,x->zyx", wz, wy, wx)
    assert np.abs(recon - psf).max() <= 1e-6


def test_random_psf_is_not_separable(rng):
    psf = rng.random((5, 7, 7), dtype=np.float32)
    assert separable_decompose(psf, tol=1e-4, max_terms=3) is None
    with pytest.raises(ValueError, match="separable"):
        richardson_lucy(
            rng.random((8, 16, 16), dtype=np.float32),
            psf,
            DeconvolveSettings(algorithm="separable"),
        )


def test_separable_matches_fp64_oracle(rng):
    truth, psf, blurred = _scene(rng)
    settings = DeconvolveSettings(algorithm="separable", iterations=10)
    ours = np.asarray(richardson_lucy(blurred, psf, settings))
    oracle = richardson_lucy_reference_separable(blurred, psf, iterations=10)
    err = np.abs(ours - oracle).max() / np.abs(oracle).max()
    assert err <= 1e-3, f"relative max abs err {err:.2e}"


def test_separable_agrees_with_fft_path(rng):
    """Same PSF, same scene: the two algorithms must agree in the
    interior (boundary grids differ, rim excluded)."""
    truth, psf, blurred = _scene(rng)
    sep = np.asarray(
        richardson_lucy(blurred, psf, DeconvolveSettings(algorithm="separable", iterations=8))
    )
    fft = np.asarray(
        richardson_lucy(blurred, psf, DeconvolveSettings(algorithm="fft", iterations=8))
    )
    interior = (slice(4, -4),) * 3
    scale = np.abs(fft[interior]).max()
    err = np.abs(sep[interior] - fft[interior]).max() / scale
    assert err <= 5e-3, f"interior disagreement {err:.2e}"


def test_auto_dispatch_uses_separable_for_gaussian(rng):
    truth, psf, blurred = _scene(rng)
    auto = np.asarray(richardson_lucy(blurred, psf, DeconvolveSettings(iterations=6)))
    sep = np.asarray(
        richardson_lucy(blurred, psf, DeconvolveSettings(algorithm="separable", iterations=6))
    )
    np.testing.assert_allclose(auto, sep, rtol=1e-5, atol=1e-5)


def test_separable_sharpens(rng):
    truth, psf, blurred = _scene(rng)
    out = np.asarray(
        richardson_lucy(blurred, psf, DeconvolveSettings(algorithm="separable", iterations=20))
    )
    assert float(np.mean((out - truth) ** 2)) < 0.5 * float(
        np.mean((blurred - truth) ** 2)
    )
    assert np.all(out >= 0.0)


def test_banded_path_matches_dense(rng, monkeypatch):
    """Force the block-banded scheme on a small volume: it must equal
    the dense circulant result exactly (same linear operator)."""
    import shrimpy_tpu.ops.deconv as dc

    truth, psf, blurred = _scene(rng, shape=(12, 40, 40))
    settings = DeconvolveSettings(algorithm="separable", iterations=5)
    dense = np.asarray(richardson_lucy(blurred, psf, settings))

    monkeypatch.setattr(dc, "_BLOCK", 16)
    monkeypatch.setattr(dc, "_DENSE_MAX", 24)  # force banded everywhere
    banded = np.asarray(richardson_lucy(blurred, psf, settings))
    # Grids differ (block rounding adds pad), so compare via the fp64
    # oracle of the banded grid instead of bitwise vs dense.
    oracle = richardson_lucy_reference_separable(blurred, psf, iterations=5)
    err_b = np.abs(banded - oracle).max() / np.abs(oracle).max()
    assert err_b <= 1e-3, f"banded vs oracle {err_b:.2e}"
    # And the two device paths agree closely in the interior.
    interior = (slice(3, -3),) * 3
    err_d = np.abs(banded[interior] - dense[interior]).max() / np.abs(dense).max()
    assert err_d <= 5e-3, f"banded vs dense interior {err_d:.2e}"


def test_fat_psf_falls_back_to_dense(rng, monkeypatch):
    """A PSF whose band exceeds one block must NOT assert in the
    banded stencil — _axis_is_banded keeps it dense (round-1 advisor:
    the radius argument was ignored)."""
    import shrimpy_tpu.ops.deconv as dc

    monkeypatch.setattr(dc, "_BLOCK", 8)
    monkeypatch.setattr(dc, "_DENSE_MAX", 24)
    # radius 6 fits _BLOCK=8 -> banded; (7,19,19) radius 9 > 8 -> dense.
    truth, _, _ = _scene(rng, shape=(12, 40, 40))
    psf = gaussian_psf((7, 19, 19), (1.2, 2.5, 2.5))
    blurred = np.clip(
        fftconvolve(truth, psf, mode="same") + rng.normal(0, 0.2, truth.shape),
        0, None,
    ).astype(np.float32)
    assert not dc._axis_is_banded(40, radius=9)
    settings = DeconvolveSettings(algorithm="separable", iterations=4)
    ours = np.asarray(richardson_lucy(blurred, psf, settings))
    oracle = richardson_lucy_reference_separable(blurred, psf, iterations=4)
    err = np.abs(ours - oracle).max() / np.abs(oracle).max()
    assert err <= 1e-3, f"rel err {err:.2e}"


def test_band_radius_near_block_size(rng, monkeypatch):
    """Band half-width just at the block limit exercises the widest
    banded stencil (taps == 2B+1) and still matches the oracle."""
    import shrimpy_tpu.ops.deconv as dc

    monkeypatch.setattr(dc, "_BLOCK", 8)
    monkeypatch.setattr(dc, "_DENSE_MAX", 24)
    truth, _, _ = _scene(rng, shape=(12, 40, 40))
    psf = gaussian_psf((7, 17, 17), (1.2, 2.2, 2.2))  # radius 8 == block
    blurred = np.clip(
        fftconvolve(truth, psf, mode="same") + rng.normal(0, 0.2, truth.shape),
        0, None,
    ).astype(np.float32)
    assert dc._axis_is_banded(40, radius=8)
    settings = DeconvolveSettings(algorithm="separable", iterations=4)
    ours = np.asarray(richardson_lucy(blurred, psf, settings))
    oracle = richardson_lucy_reference_separable(blurred, psf, iterations=4)
    err = np.abs(ours - oracle).max() / np.abs(oracle).max()
    assert err <= 1e-3, f"rel err {err:.2e}"


def test_zy_pallas_backend_matches_its_oracle(rng):
    """The fused z+y Pallas RL backend matches the fp64 circulant oracle
    on the exact-half-pad grid (interpret mode on CPU)."""
    truth, psf, blurred = _scene(rng, shape=(10, 32, 32))
    settings = DeconvolveSettings(
        algorithm="separable", separable_backend="zy_pallas", iterations=5
    )
    ours = np.asarray(richardson_lucy(blurred, psf, settings))
    pads = tuple((k // 2, k // 2) for k in psf.shape)
    oracle = richardson_lucy_reference_separable(
        blurred, psf, iterations=5, pads=pads
    )
    err = np.abs(ours - oracle).max() / np.abs(oracle).max()
    assert err <= 1e-3, f"rel err {err:.2e}"


@pytest.mark.parametrize("backend", ["linear_pallas", "zy_pallas"])
def test_pallas_backend_cache_survives_retrace(rng, backend):
    """The per-(shape, psf, settings) program caches must hold HOST
    constants: a closure built while an OUTER jit trace is active used
    to capture that trace's tracers, and a cache hit from a later trace
    (e.g. the plate runtime's final partial batch retracing the same
    jit) died with UnexpectedTracerError."""
    import jax

    truth, psf, blurred = _scene(rng, shape=(10, 32, 32))
    settings = DeconvolveSettings(
        algorithm="separable", separable_backend=backend, iterations=2
    )

    def f(v):
        return richardson_lucy(v, psf, settings)

    a = np.asarray(jax.jit(f)(blurred))  # builds the cache inside trace 1
    # A DIFFERENT jit program, same shapes -> cache hit from trace 2.
    b = np.asarray(jax.jit(lambda v: f(v) * 1.0)(blurred))
    np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-6)


def test_zy_pallas_agrees_with_matmul_backend(rng):
    truth, psf, blurred = _scene(rng, shape=(10, 32, 32))
    zy = np.asarray(richardson_lucy(
        blurred, psf,
        DeconvolveSettings(algorithm="separable", separable_backend="zy_pallas",
                           iterations=5),
    ))
    mm = np.asarray(richardson_lucy(
        blurred, psf,
        DeconvolveSettings(algorithm="separable", separable_backend="matmul",
                           iterations=5),
    ))
    # Same grid here (no block rounding at this size) -> near-identical.
    assert np.abs(zy - mm).max() / np.abs(mm).max() <= 1e-4


def test_linear_pallas_backend_matches_zero_boundary_oracle(rng):
    """Zero-boundary RL on the permanently-padded carry (no in-loop
    pads) matches its fp64 banded-Toeplitz oracle."""
    truth, psf, blurred = _scene(rng, shape=(10, 32, 32))
    settings = DeconvolveSettings(
        algorithm="separable", separable_backend="linear_pallas", iterations=5
    )
    ours = np.asarray(richardson_lucy(blurred, psf, settings))
    pads = tuple((k // 2, k // 2) for k in psf.shape)
    oracle = richardson_lucy_reference_separable(
        blurred, psf, iterations=5, pads=pads, boundary="zero"
    )
    err = np.abs(ours - oracle).max() / np.abs(oracle).max()
    assert err <= 1e-3, f"rel err {err:.2e}"


def test_linear_pallas_interior_agrees_with_matmul(rng):
    """Boundary semantics differ (zero vs circular on the padded rim),
    but interiors agree."""
    truth, psf, blurred = _scene(rng, shape=(10, 32, 32))
    lin = np.asarray(richardson_lucy(
        blurred, psf,
        DeconvolveSettings(algorithm="separable",
                           separable_backend="linear_pallas", iterations=5),
    ))
    mm = np.asarray(richardson_lucy(
        blurred, psf,
        DeconvolveSettings(algorithm="separable",
                           separable_backend="matmul", iterations=5),
    ))
    interior = (slice(3, -3),) * 3
    err = np.abs(lin[interior] - mm[interior]).max() / np.abs(mm).max()
    assert err <= 5e-3, f"interior disagreement {err:.2e}"


@pytest.mark.parametrize("backend", ["matmul", "zy_pallas", "linear_pallas"])
def test_asymmetric_psf_matches_oracle(rng, backend):
    """RL with an axially-asymmetric separable PSF tracks the fp64
    oracle on every backend — catches conv/correlation tap flips that
    symmetric Gaussians cannot see."""
    psf = asymmetric_psf()
    truth = gaussian_blob(
        (12, 36, 36), (6.0, 16.0, 20.0), (1.2, 1.8, 1.8), amplitude=400.0
    )
    blurred = np.clip(
        fftconvolve(truth, psf, mode="same") + rng.normal(0, 0.2, truth.shape),
        0,
        None,
    ).astype(np.float32)
    settings = DeconvolveSettings(
        algorithm="separable", separable_backend=backend, iterations=5
    )
    ours = np.asarray(richardson_lucy(blurred, psf, settings))
    if backend == "matmul":
        oracle = richardson_lucy_reference_separable(blurred, psf, iterations=5)
    else:
        pads = tuple((k // 2, k // 2) for k in psf.shape)
        boundary = "zero" if backend == "linear_pallas" else "circular"
        oracle = richardson_lucy_reference_separable(
            blurred, psf, iterations=5, pads=pads, boundary=boundary
        )
    err = np.abs(ours - oracle).max() / np.abs(oracle).max()
    assert err <= 1e-3, f"{backend}: rel err {err:.2e}"


@pytest.mark.parametrize("shape", [(7, 19, 23), (9, 33, 17), (12, 40, 40)])
@pytest.mark.parametrize("backend", ["matmul", "zy_pallas", "linear_pallas"])
def test_all_backends_odd_shapes(rng, shape, backend):
    """Odd/prime extents survive every separable backend (tile padding,
    stencil shifts, banded decisions) and track their own oracles."""
    psf = gaussian_psf((5, 7, 7), (1.0, 1.2, 1.2))
    vol = (rng.random(shape, dtype=np.float32) * 50 + 1.0).astype(np.float32)
    settings = DeconvolveSettings(
        algorithm="separable", separable_backend=backend, iterations=3
    )
    ours = np.asarray(richardson_lucy(vol, psf, settings))
    assert ours.shape == shape
    assert np.isfinite(ours).all() and (ours >= 0).all()
    if backend == "linear_pallas":
        pads = tuple((k // 2, k // 2) for k in psf.shape)
        oracle = richardson_lucy_reference_separable(
            vol, psf, iterations=3, pads=pads, boundary="zero"
        )
    elif backend == "zy_pallas":
        pads = tuple((k // 2, k // 2) for k in psf.shape)
        oracle = richardson_lucy_reference_separable(
            vol, psf, iterations=3, pads=pads
        )
    else:
        oracle = richardson_lucy_reference_separable(vol, psf, iterations=3)
    err = np.abs(ours - oracle).max() / np.abs(oracle).max()
    assert err <= 1e-3, f"{backend} {shape}: rel err {err:.2e}"


def test_fused_cache_respects_term_budget(rng):
    """Same PSF + shape under different rank budgets must NOT reuse a
    kernel baked with the other decomposition (cache keys on terms)."""
    import jax.numpy as jnp

    # Rank-2 PSF: two offset Gaussians.
    g1 = gaussian_psf((5, 9, 9), (1.0, 1.6, 1.6))
    g2 = np.roll(gaussian_psf((5, 9, 9), (0.8, 1.2, 2.0)), (0, 2, -2), (0, 1, 2))
    psf = (g1 + 0.6 * g2).astype(np.float32)
    psf /= psf.sum()
    vol = (rng.random((16, 160, 640), dtype=np.float32) * 100 + 1.0)

    out_full = np.asarray(richardson_lucy(
        jnp.asarray(vol), psf,
        DeconvolveSettings(iterations=3, algorithm="separable",
                           separable_backend="fused"),
    ))
    out_rank1 = np.asarray(richardson_lucy(
        jnp.asarray(vol), psf,
        DeconvolveSettings(iterations=3, algorithm="separable",
                           separable_backend="fused",
                           max_separable_terms=1, max_extended_terms=1,
                           psf_denoise_max_residual=1.0),
    ))
    assert np.abs(out_full - out_rank1).max() > 1e-3  # different kernels ran


def test_measured_patch_psf_stays_on_fast_paths(rng):
    """A Gaussian PSF in the bead-extraction 31-voxel patch (z radius
    15 as-delivered) crops to its real support, restoring the fused/
    linear kernels' z-radius bounds and shrinking every backend's
    cost — with parity against the (equally cropped) fp64 oracle."""
    import jax.numpy as jnp

    from shrimpy_tpu.ops.deconv import (
        _crop_psf_support,
        _resolve_separable_backend,
    )

    psf_patch = np.asarray(gaussian_psf((31, 31, 31), (1.5, 2.5, 2.5)))
    cropped = _crop_psf_support(psf_patch, 1e-5)
    assert cropped.shape[0] <= 17  # z radius back within the kernel bound
    assert float(psf_patch.sum() - cropped.sum()) / psf_patch.sum() < 1e-3

    vol = (rng.random((12, 48, 64), dtype=np.float32) * 100 + 1.0)
    settings = DeconvolveSettings(iterations=5, algorithm="separable",
                                  separable_backend="matmul")
    ours = np.asarray(richardson_lucy(jnp.asarray(vol), psf_patch, settings))
    oracle = richardson_lucy_reference_separable(vol, psf_patch, iterations=5)
    rel = np.abs(ours - oracle).max() / np.abs(oracle).max()
    assert rel <= 1e-3, rel
