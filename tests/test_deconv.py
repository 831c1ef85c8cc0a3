"""Richardson-Lucy: fp64-oracle parity + actual deconvolution power.

Modeled on the reference's pure-math kernel tier (SURVEY.md §4 tier 1):
the XLA path must match the trusted fp64 numpy oracle (BASELINE.json
parity budget, relative max abs err <= 1e-3), and RL must demonstrably
sharpen a blurred scene toward the ground truth.
"""

import numpy as np
import pytest
from scipy.signal import fftconvolve

from shrimpy_tpu.config import DeconvolveSettings
from shrimpy_tpu.io.synthetic import gaussian_blob, tilted_gaussian_psf
from shrimpy_tpu.ops.deconv import (
    gaussian_psf,
    richardson_lucy,
    richardson_lucy_reference,
)


def _blurred_scene(rng, shape=(24, 48, 48), sigma=(1.5, 2.5, 2.5)):
    truth = gaussian_blob(shape, (12.0, 20.0, 30.0), (1.0, 1.5, 1.5), amplitude=500.0)
    truth += gaussian_blob(shape, (10.0, 34.0, 14.0), (1.2, 2.0, 2.0), amplitude=300.0)
    psf = gaussian_psf((9, 15, 15), sigma)
    blurred = fftconvolve(truth, psf, mode="same").astype(np.float32)
    blurred += rng.normal(0.0, 0.2, size=shape).astype(np.float32)
    blurred = np.clip(blurred, 0.0, None)
    return truth, psf, blurred


def test_rl_matches_fp64_oracle(rng):
    truth, psf, blurred = _blurred_scene(rng)
    settings = DeconvolveSettings(algorithm="fft")  # pin to the FFT path
    ours = np.asarray(richardson_lucy(blurred, psf, settings, iterations=10))
    oracle = richardson_lucy_reference(blurred, psf, iterations=10)
    scale = np.abs(oracle).max()
    err = np.abs(ours - oracle).max() / max(scale, 1e-12)
    assert err <= 1e-3, f"relative max abs err {err:.2e}"


def test_rl_sharpens_toward_truth(rng):
    truth, psf, blurred = _blurred_scene(rng)
    deconv = np.asarray(richardson_lucy(blurred, psf, iterations=20))
    mse_before = float(np.mean((blurred - truth) ** 2))
    mse_after = float(np.mean((deconv - truth) ** 2))
    assert mse_after < 0.5 * mse_before, (mse_before, mse_after)
    # The restored peak must be sharper (higher max) than the blurred one.
    assert deconv.max() > 1.5 * blurred.max()


def test_donate_input_fft_path_matches_and_consumes(rng):
    """donate_input is honored at the dispatch boundary for EVERY
    backend — here the FFT path: identical result, caller's device
    array consumed."""
    import jax.numpy as jnp

    truth, psf, blurred = _blurred_scene(rng)
    settings = DeconvolveSettings(algorithm="fft")
    base = np.asarray(richardson_lucy(blurred, psf, settings, iterations=3))
    dvol = jnp.asarray(blurred)
    donated = np.asarray(richardson_lucy(
        dvol, psf,
        DeconvolveSettings(algorithm="fft", donate_input=True),
        iterations=3,
    ))
    np.testing.assert_allclose(donated, base, rtol=1e-6, atol=1e-5)
    assert dvol.is_deleted()


def test_rl_preserves_nonnegativity_and_flux(rng):
    truth, psf, blurred = _blurred_scene(rng)
    deconv = np.asarray(richardson_lucy(blurred, psf, iterations=20))
    assert np.all(deconv >= 0.0)
    # RL conserves total flux up to boundary effects.
    assert deconv.sum() == pytest.approx(blurred.sum(), rel=0.05)


def test_rl_identity_psf_is_noop(rng):
    vol = rng.random((8, 32, 32), dtype=np.float32) + 0.1
    psf = np.zeros((3, 3, 3), dtype=np.float32)
    psf[1, 1, 1] = 1.0
    out = np.asarray(richardson_lucy(vol, psf, iterations=5))
    np.testing.assert_allclose(out, vol, rtol=1e-4, atol=1e-4)


def test_settings_validation():
    with pytest.raises(ValueError):
        DeconvolveSettings(iterations=0)
    with pytest.raises(ValueError):
        DeconvolveSettings(unknown_key=1)


def test_fft2z_matches_fft3_exactly(rng):
    """fft2z (z-banded 2-D FFTs) is the SAME circular update on the
    SAME padded grid as fft3 — only float32 op order differs, so the
    two backends must agree far inside the 1e-3 parity budget."""
    truth, psf, blurred = _blurred_scene(rng)
    fft3 = np.asarray(richardson_lucy(
        blurred, psf,
        DeconvolveSettings(algorithm="fft", fft_backend="fft3"),
        iterations=10,
    ))
    fft2z = np.asarray(richardson_lucy(
        blurred, psf,
        DeconvolveSettings(algorithm="fft", fft_backend="fft2z"),
        iterations=10,
    ))
    rel = np.abs(fft2z - fft3).max() / np.abs(fft3).max()
    assert rel <= 2e-4, f"fft2z vs fft3 relative max abs err {rel:.2e}"


def test_fft2z_chunk_size_does_not_change_results(rng):
    """Any z chunking (including chunk=1 and a non-divisor request that
    gets rounded to a divisor) computes the same banded update."""
    truth, psf, blurred = _blurred_scene(rng)
    outs = [
        np.asarray(richardson_lucy(
            blurred, psf,
            DeconvolveSettings(
                algorithm="fft", fft_backend="fft2z", fft_z_chunk=zc
            ),
            iterations=5,
        ))
        for zc in (1, 7, 64)
    ]
    np.testing.assert_allclose(outs[0], outs[1], rtol=2e-5, atol=1e-5)
    np.testing.assert_allclose(outs[0], outs[2], rtol=2e-5, atol=1e-5)


def test_fft2z_single_plane_psf_band(rng):
    """kz == 1 (rz == 0, zero-width halo) exercises the degenerate band:
    per-plane 2-D deconvolution must still match the fft3 oracle."""
    vol = (rng.random((6, 24, 32), dtype=np.float32) * 100 + 1.0)
    psf = np.asarray(gaussian_psf((1, 9, 9), (1.0, 1.5, 1.5)))
    fft3 = np.asarray(richardson_lucy(
        vol, psf, DeconvolveSettings(algorithm="fft", fft_backend="fft3"),
        iterations=5,
    ))
    fft2z = np.asarray(richardson_lucy(
        vol, psf, DeconvolveSettings(algorithm="fft", fft_backend="fft2z"),
        iterations=5,
    ))
    rel = np.abs(fft2z - fft3).max() / np.abs(fft3).max()
    assert rel <= 2e-4, rel


def test_dft2z_matches_fp64_oracle_on_nonseparable_psf(rng):
    """dft2z (matmul-DFT transforms) is the banded circular update with
    the 2-D FFTs swapped for MXU einsums — on a genuinely non-separable
    (sheared) PSF it must track the fp64 oracle (run on the SAME
    tile-rounded matmul grid: the grid policy is transform-dependent,
    so the wrap distance of the circular update is too) well inside the
    1e-3 parity budget."""
    vol = rng.uniform(0, 100, (24, 60, 72)).astype(np.float32)
    zz, yy, xx = np.meshgrid(
        np.arange(7) - 3.0, np.arange(9) - 4.0, np.arange(9) - 4.0,
        indexing="ij",
    )
    psf = np.exp(
        -0.5 * (((zz + 0.9 * yy) / 1.2) ** 2
                + ((yy + 0.8 * xx) / 1.8) ** 2 + (xx / 2.5) ** 2)
    ).astype(np.float32)
    psf /= psf.sum()
    oracle = richardson_lucy_reference(
        vol, psf, iterations=8, grid_transform="matmul"
    )
    dft2z = np.asarray(richardson_lucy(
        vol, psf, DeconvolveSettings(algorithm="fft", fft_backend="dft2z"),
        iterations=8,
    ))
    rel = np.abs(dft2z - oracle).max() / np.abs(oracle).max()
    assert rel <= 2e-4, f"dft2z vs fp64 oracle relative max abs err {rel:.2e}"


def test_dftz_matches_fp64_oracle_on_nonseparable_psf(rng):
    """dftz (chunked 2-D matmul-DFTs + exact z-DFT instead of the
    banded z sum) is the same circular update as the fp64 oracle on the
    matmul grid."""
    vol = rng.uniform(0, 100, (24, 60, 72)).astype(np.float32)
    zz, yy, xx = np.meshgrid(
        np.arange(7) - 3.0, np.arange(9) - 4.0, np.arange(9) - 4.0,
        indexing="ij",
    )
    psf = np.exp(
        -0.5 * (((zz + 0.9 * yy) / 1.2) ** 2
                + ((yy + 0.8 * xx) / 1.8) ** 2 + (xx / 2.5) ** 2)
    ).astype(np.float32)
    psf /= psf.sum()
    oracle = richardson_lucy_reference(
        vol, psf, iterations=6, grid_transform="matmul"
    )
    dftz = np.asarray(richardson_lucy(
        vol, psf, DeconvolveSettings(algorithm="fft", fft_backend="dftz"),
        iterations=6,
    ))
    rel = np.abs(dftz - oracle).max() / np.abs(oracle).max()
    assert rel <= 2e-4, f"dftz vs fp64 oracle relative max abs err {rel:.2e}"


def test_dft3_matches_fp64_oracle(rng):
    """dft3 (whole-volume matmul-DFT update, no z-banding) is the same
    circular update as the fp64 oracle with the transforms swapped for
    MXU einsums (oracle pinned to the matmul tile-rounded grid)."""
    truth, psf, blurred = _blurred_scene(rng, shape=(16, 40, 40))
    oracle = richardson_lucy_reference(
        blurred, psf, iterations=6, grid_transform="matmul"
    )
    dft3 = np.asarray(richardson_lucy(
        blurred, psf, DeconvolveSettings(algorithm="fft", fft_backend="dft3"),
        iterations=6,
    ))
    rel = np.abs(dft3 - oracle).max() / np.abs(oracle).max()
    assert rel <= 2e-4, f"dft3 vs fp64 oracle relative max abs err {rel:.2e}"


def test_auto_backend_resolves_per_platform(rng):
    """auto on a 3-D volume routes to the platform-resolved 2z backend
    (dft2z on TPU, fft2z elsewhere); the result must equal an explicit
    run of that backend bit-for-bit (same program)."""
    from shrimpy_tpu.ops.dft import default_transform

    expected = "dft2z" if default_transform() == "matmul" else "fft2z"
    truth, psf, blurred = _blurred_scene(rng, shape=(12, 32, 32))
    auto = np.asarray(richardson_lucy(
        blurred, psf, DeconvolveSettings(algorithm="fft"), iterations=4,
    ))
    explicit = np.asarray(richardson_lucy(
        blurred, psf,
        DeconvolveSettings(algorithm="fft", fft_backend=expected),
        iterations=4,
    ))
    np.testing.assert_array_equal(auto, explicit)


def test_fft2z_requires_3d():
    img = np.ones((32, 32), dtype=np.float32)
    u = np.arange(5, dtype=np.float64) - 2
    psf = np.exp(-0.5 * (u[:, None] ** 2 + u[None, :] ** 2)).astype(
        np.float32
    )
    psf /= psf.sum()
    with pytest.raises(ValueError, match="fft2z"):
        richardson_lucy(
            img, psf,
            DeconvolveSettings(algorithm="fft", fft_backend="fft2z"),
            iterations=2,
        )
    # auto on 2-D silently uses fft3 (fft2z is a 3-D layout).
    out = np.asarray(richardson_lucy(
        img, psf, DeconvolveSettings(algorithm="fft"), iterations=2,
    ))
    assert out.shape == img.shape


def test_even_length_psf_axes_are_padded_to_odd(rng):
    """Even PSF axes have no symmetric centre: flipped taps are NOT the
    adjoint (one-voxel offset), so the separable backends diverged from
    the FFT path. PSFs now pad to odd lengths at entry (exactly
    equivalent), keeping every backend on the same adjoint (review
    finding)."""
    import jax.numpy as jnp

    from shrimpy_tpu.ops.deconv import (
        gaussian_psf,
        richardson_lucy_reference_separable,
    )

    psf_even = np.asarray(gaussian_psf((4, 8, 8), (0.9, 1.4, 1.4)))
    vol = (rng.random((12, 32, 40), dtype=np.float32) * 100 + 1.0).astype(
        np.float32
    )
    sep = np.asarray(richardson_lucy(
        jnp.asarray(vol), psf_even,
        DeconvolveSettings(iterations=5, algorithm="separable",
                           separable_backend="matmul"),
    ))
    oracle = richardson_lucy_reference_separable(vol, psf_even, iterations=5)
    rel = np.abs(sep - oracle).max() / np.abs(oracle).max()
    assert rel <= 1e-3, rel
    # And the separable result is a genuine deconvolution estimate, not
    # a shifted one: compare against the FFT path on the same data.
    fft = np.asarray(richardson_lucy(
        jnp.asarray(vol), psf_even,
        DeconvolveSettings(iterations=5, algorithm="fft"),
    ))
    # Different boundary handling (circular padded grid vs 5-smooth FFT
    # grid) keeps these from being identical; interior agreement within
    # a few percent proves no systematic voxel shift.
    interior = (slice(3, -3),) * 3
    rel2 = (np.abs(sep - fft)[interior].max()
            / np.abs(fft[interior]).max())
    assert rel2 <= 5e-2, rel2


def test_biggs_acceleration_startup_matches_plain(rng):
    """The Biggs-Andrews outer loop runs its first two updates plain
    (alpha stays 0 until two gradients exist — the paper's startup), so
    a 2-iteration accelerated run must equal plain RL exactly."""
    truth, psf_sep, blurred = _blurred_scene(rng, shape=(12, 32, 32))
    psf = tilted_gaussian_psf((5, 7, 7))
    plain = np.asarray(richardson_lucy(
        blurred, psf,
        DeconvolveSettings(algorithm="fft", fft_backend="fft3"),
        iterations=2,
    ))
    accel = np.asarray(richardson_lucy(
        blurred, psf,
        DeconvolveSettings(
            algorithm="fft", fft_backend="fft3", acceleration="biggs"
        ),
        iterations=2,
    ))
    np.testing.assert_allclose(accel, plain, rtol=1e-6, atol=1e-5)


def test_biggs_acceleration_advances_the_rl_trajectory_faster(rng):
    """Accelerated RL at k iterations sits FURTHER ALONG the plain RL
    trajectory (closer to the converged fixed point) than plain RL at
    1.5k iterations. Measured on this scene: accel-10 lands between
    plain-20 and plain-30 (Biggs & Andrews Appl. Opt. 36(8):1766
    report 2-3x after startup); the 1.5x bound is the conservative
    regression gate. MSE-to-truth is NOT the metric — on noisy data RL
    semi-converges, so being further along can mean a slightly higher
    MSE while still being exactly what the iteration count knob
    promises."""
    truth, _, _ = _blurred_scene(rng, shape=(16, 40, 40))
    psf = tilted_gaussian_psf((7, 9, 9))
    blurred = fftconvolve(truth, psf, mode="same").astype(np.float32)
    blurred = np.clip(
        blurred + rng.normal(0.0, 0.1, blurred.shape).astype(np.float32),
        0.0, None,
    )

    plain = DeconvolveSettings(algorithm="fft", fft_backend="fft3")
    accel = DeconvolveSettings(
        algorithm="fft", fft_backend="fft3", acceleration="biggs"
    )
    ref = np.asarray(
        richardson_lucy(blurred, psf, plain, iterations=40)
    ).astype(np.float64)

    def dist(s, iters):
        out = np.asarray(
            richardson_lucy(blurred, psf, s, iterations=iters)
        ).astype(np.float64)
        return float(np.linalg.norm(out - ref) / np.linalg.norm(ref))

    d_accel_10 = dist(accel, 10)
    assert d_accel_10 < dist(plain, 10), "acceleration made no progress"
    assert d_accel_10 <= dist(plain, 15), (
        f"accel-10 at {d_accel_10:.4f} did not reach plain-15 "
        f"({dist(plain, 15):.4f}) toward the fixed point"
    )


def test_biggs_acceleration_separable_startup_matches_plain(rng):
    """The separable (matmul-backend) route honors the acceleration
    knob through the same shared outer loop: a 2-iteration accelerated
    run equals plain RL exactly (alpha-0 startup)."""
    truth, psf, blurred = _blurred_scene(rng, shape=(12, 32, 32))
    plain = np.asarray(richardson_lucy(
        blurred, psf,
        DeconvolveSettings(separable_backend="matmul"),
        iterations=2,
    ))
    accel = np.asarray(richardson_lucy(
        blurred, psf,
        DeconvolveSettings(separable_backend="matmul", acceleration="biggs"),
        iterations=2,
    ))
    np.testing.assert_allclose(accel, plain, rtol=1e-6, atol=1e-5)


def test_biggs_acceleration_separable_advances_faster(rng):
    """Accelerated separable RL at 8 iterations is further along the
    trajectory (closer to the converged estimate) than plain at 12."""
    truth, psf, blurred = _blurred_scene(rng, shape=(12, 32, 32))
    plain = DeconvolveSettings(separable_backend="matmul")
    accel = DeconvolveSettings(
        separable_backend="matmul", acceleration="biggs"
    )
    ref = np.asarray(
        richardson_lucy(blurred, psf, plain, iterations=40)
    ).astype(np.float64)

    def dist(s, iters):
        out = np.asarray(
            richardson_lucy(blurred, psf, s, iterations=iters)
        ).astype(np.float64)
        return float(np.linalg.norm(out - ref) / np.linalg.norm(ref))

    assert dist(accel, 8) < dist(plain, 12), (dist(accel, 8), dist(plain, 12))


def test_acceleration_on_sharded_path_raises(rng):
    """shard_volumes runs the plain sharded RL update only; the
    acceleration knob must raise loudly there, not go silently inert."""
    from shrimpy_tpu.config import ReconstructSettings
    from shrimpy_tpu.parallel import reconstruct_batch
    from shrimpy_tpu.parallel.mesh import make_mesh

    truth, psf, blurred = _blurred_scene(rng, shape=(8, 16, 32))
    settings = ReconstructSettings(
        deconvolve=DeconvolveSettings(
            iterations=2, algorithm="fft", fft_backend="fft3",
            acceleration="biggs",
        ),
        shard_volumes=True,
    )
    batch = np.stack([blurred, blurred])
    with pytest.raises(ValueError, match="acceleration"):
        reconstruct_batch(
            batch, settings, psf=np.asarray(psf),
            mesh=make_mesh(8, space=4),
        )


def _dark_region_scene(rng, psf, shape=(16, 40, 40)):
    """Blurred two-blob scene with a genuinely dark octant — the RL
    stressor that exposes signed-kernel instability (exact zeros plus a
    clipped noise floor)."""
    truth = gaussian_blob(shape, (8.0, 18.0, 24.0), (1.0, 1.5, 1.5), amplitude=500.0)
    truth += gaussian_blob(shape, (7.0, 28.0, 12.0), (1.2, 2.0, 2.0), amplitude=300.0)
    blurred = fftconvolve(truth, psf, mode="same").astype(np.float32)
    blurred[:5, :13, :] = 0.0
    blurred = np.clip(
        blurred + rng.normal(0.0, 0.1, blurred.shape).astype(np.float32),
        0.0, None,
    )
    return truth, blurred


def test_nonneg_cp_beats_signed_cascade_and_is_nonneg():
    """The HALS nonneg CP factorization is both nonnegative (RL
    stability by construction) and MORE accurate per term than the
    greedy signed SVD cascade (joint optimization vs greedy): measured
    anchors on the bench PSF, kept as regression gates with margin."""
    from shrimpy_tpu.ops.deconv import nonneg_cp_decompose, separable_truncate

    psf = np.asarray(tilted_gaussian_psf((7, 9, 9)), np.float64)
    psf /= psf.sum()
    for k, bound in ((4, 0.15), (8, 0.06)):
        terms, resid = nonneg_cp_decompose(psf, k)
        assert resid <= bound, (k, resid)
        for wz, wy, wx in terms:
            assert (wz >= 0).all() and (wy >= 0).all() and (wx >= 0).all()
        _, signed_resid = separable_truncate(psf, max_terms=k)
        assert resid < signed_resid, (k, resid, signed_resid)


def test_hybrid_ladder_probes_the_settings_cap_rank():
    """max_extended_terms between built-in rungs must itself be probed
    (review finding: rank 9-10 were unreachable with cap 10 — the
    ladder broke at 12 without evaluating 10)."""
    from shrimpy_tpu.ops.deconv import plan_hybrid_terms

    # A random PSF keeps its nonneg-CP residual above the 0.15
    # early-stop through every rank here (measured 0.25 at 8, 0.24 at
    # 10), so the ladder runs to the cap.
    psf = np.random.RandomState(0).uniform(0.1, 1.0, (5, 7, 7))
    psf /= psf.sum()
    lo = DeconvolveSettings(algorithm="hybrid", max_extended_terms=8)
    hi = DeconvolveSettings(algorithm="hybrid", max_extended_terms=10)
    terms8, resid8 = plan_hybrid_terms(psf, lo)
    terms10, resid10 = plan_hybrid_terms(psf, hi)
    assert resid8 > 0.15 and resid10 > 0.15  # early-stop never fired
    assert len(terms10) == 10
    assert resid10 < resid8


def test_hybrid_zero_warm_iters_equals_fft_path(rng):
    """hybrid with hybrid_separable_iters=0 degenerates to the plain
    FFT path bit-for-bit (same program)."""
    psf = tilted_gaussian_psf((7, 9, 9))
    _, blurred = _dark_region_scene(rng, psf)
    plain = np.asarray(richardson_lucy(
        blurred, psf,
        DeconvolveSettings(algorithm="fft", fft_backend="fft3"),
        iterations=3,
    ))
    hyb = np.asarray(richardson_lucy(
        blurred, psf,
        DeconvolveSettings(
            algorithm="hybrid", fft_backend="fft3",
            hybrid_separable_iters=0,
        ),
        iterations=3,
    ))
    np.testing.assert_array_equal(hyb, plain)


def test_hybrid_warm_start_advances_exact_trajectory(rng):
    """Each warm (nonneg separable) iteration advances the EXACT
    trajectory by ~0.9-1.0 exact iterations (measured on this scene:
    hybrid(s=12, e=8) = 0.081 vs exact-20 = 0.080 toward the exact-60
    estimate); the regression gates are >= 0.5 exact-iterations-worth
    per warm iteration, with the dark octant exercising the stability
    that forced the nonneg warm operator."""
    psf = tilted_gaussian_psf((7, 9, 9))
    _, blurred = _dark_region_scene(rng, psf)
    exact = DeconvolveSettings(algorithm="fft", fft_backend="fft3")
    ref = np.asarray(
        richardson_lucy(blurred, psf, exact, iterations=40)
    ).astype(np.float64)

    def dist(out):
        out = np.asarray(out).astype(np.float64)
        return float(np.linalg.norm(out - ref) / np.linalg.norm(ref))

    hyb = DeconvolveSettings(
        algorithm="hybrid", fft_backend="fft3", hybrid_separable_iters=12,
        separable_backend="matmul",
    )
    d_h = dist(richardson_lucy(blurred, psf, hyb, iterations=8))
    d_e8 = dist(richardson_lucy(blurred, psf, exact, iterations=8))
    d_e14 = dist(richardson_lucy(blurred, psf, exact, iterations=14))
    assert d_h < d_e8, (d_h, d_e8)  # the warm start strictly helps
    # 12 warm iterations are worth >= 6 exact ones (measured ~11-12).
    assert d_h <= d_e14, (d_h, d_e14)


def test_hybrid_biggs_beats_plain_rl20(rng):
    """Biggs on BOTH hybrid phases: hybrid(s=16, e=3, biggs) beats
    plain exact RL-20 on the trajectory (measured margins +33-35%
    across four seeds; the regression gate is any positive margin) —
    the fastest RL-20-equivalent non-separable configuration (bench
    config 9). Acceleration of the WARM phase is load-bearing: a plain
    warm start with only the tail accelerated measured 0.091 vs
    plain-20's 0.078 at e=3 (does NOT beat it)."""
    psf = tilted_gaussian_psf((7, 9, 9))
    _, blurred = _dark_region_scene(rng, psf)
    exact = DeconvolveSettings(algorithm="fft", fft_backend="fft3")
    ref = np.asarray(
        richardson_lucy(blurred, psf, exact, iterations=60)
    ).astype(np.float64)

    def dist(out):
        out = np.asarray(out).astype(np.float64)
        return float(np.linalg.norm(out - ref) / np.linalg.norm(ref))

    d20 = dist(richardson_lucy(blurred, psf, exact, iterations=20))
    hb = DeconvolveSettings(
        algorithm="hybrid", fft_backend="fft3",
        hybrid_separable_iters=16, acceleration="biggs",
    )
    d_hb = dist(richardson_lucy(blurred, psf, hb, iterations=3))
    assert d_hb < d20, (d_hb, d20)
    # Keep a margin floor so a regression to "barely equal" trips.
    assert (d20 - d_hb) / d20 > 0.15, (d_hb, d20)


def test_hybrid_output_is_finite_and_positive_on_dark_scene(rng):
    """The full hybrid (auto-planned warm terms, default backends) on a
    dark-region scene: finite, nonnegative, and actually deconvolving
    (sharper peak). Signed warm kernels diverge here within 2
    iterations — this pins the nonneg warm operator + safety net."""
    psf = tilted_gaussian_psf((7, 9, 9))
    _, blurred = _dark_region_scene(rng, psf)
    out = np.asarray(richardson_lucy(
        blurred, psf,
        DeconvolveSettings(algorithm="hybrid", hybrid_separable_iters=10),
        iterations=4,
    ))
    assert np.isfinite(out).all()
    assert (out >= 0.0).all()
    assert out.max() > 1.2 * blurred.max()


def test_hybrid_requires_3d_psf():
    img = np.ones((32, 32), dtype=np.float32)
    u = np.arange(5, dtype=np.float64) - 2
    psf = np.exp(-0.5 * (u[:, None] ** 2 + u[None, :] ** 2)).astype(np.float32)
    psf /= psf.sum()
    with pytest.raises(ValueError, match="hybrid"):
        richardson_lucy(
            img, psf, DeconvolveSettings(algorithm="hybrid"), iterations=2
        )


def test_hybrid_pipeline_dispatch_matches_richardson_lucy(rng):
    """The runtime pipeline's deconv stage dispatches hybrid through
    the same rl_hybrid as richardson_lucy (single source of truth)."""
    from shrimpy_tpu.config import ReconstructSettings
    from shrimpy_tpu.parallel.pipeline import _deconv_fn

    psf = tilted_gaussian_psf((7, 9, 9))
    _, blurred = _dark_region_scene(rng, psf)
    settings = ReconstructSettings(
        deconvolve={
            "algorithm": "hybrid", "iterations": 3,
            "hybrid_separable_iters": 6, "fft_backend": "fft3",
        }
    )
    fn = _deconv_fn(settings, psf)
    via_pipeline = np.asarray(fn(blurred))
    direct = np.asarray(richardson_lucy(
        blurred, psf, settings.deconvolve, iterations=3
    ))
    np.testing.assert_array_equal(via_pipeline, direct)


def test_hybrid_on_sharded_path_raises():
    """shard_volumes runs the plain sharded RL update; hybrid must
    raise loudly there (schema tier), not go silently inert."""
    from shrimpy_tpu.config import ReconstructSettings

    with pytest.raises(ValueError, match="hybrid"):
        ReconstructSettings(
            shard_volumes=True,
            deconvolve={"algorithm": "hybrid", "iterations": 2},
        )
