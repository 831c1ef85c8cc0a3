"""Fused RL kernel: parity vs fp64 zero-boundary oracles (interpret)."""

import numpy as np
import pytest

# Heavyweight module (big compiles / end-to-end): excluded from the
# quick review-loop tier (docs/testing.md).
pytestmark = pytest.mark.slow
from scipy.signal import fftconvolve

from shrimpy_tpu.config import DeconvolveSettings
from shrimpy_tpu.io.synthetic import gaussian_blob
from shrimpy_tpu.ops.deconv import (
    _toeplitz_banded,
    gaussian_psf,
    richardson_lucy,
    richardson_lucy_reference_separable,
    separable_decompose,
)
from shrimpy_tpu.ops.rl_fused import (
    conv3_fused,
    fused_layout,
    fused_pad,
    rl_fused_supported,
)

# The fused kernel needs y >= one slab (~160 rows) and x >= bx + 256;
# this is the smallest geometry that exercises first/mid/last tiles in
# every axis without making CPU interpret mode crawl.
SHAPE = (12, 280, 650)
PSF_SHAPE = (5, 9, 9)


def _oracle_conv3(vol_g, terms, grid, flip):
    """Dense fp64 zero-boundary separable conv on the G grid."""
    out = np.zeros(grid, np.float64)
    v = np.zeros(grid, np.float64)
    v[: vol_g.shape[0], : vol_g.shape[1], : vol_g.shape[2]] = vol_g
    for wz, wy, wx in terms:
        wz, wy, wx = (
            np.asarray(w, np.float64)[::-1] if flip else np.asarray(w, np.float64)
            for w in (wz, wy, wx)
        )
        az = _toeplitz_banded(grid[0], wz).astype(np.float64)
        ay = _toeplitz_banded(grid[1], wy).astype(np.float64)
        ax = _toeplitz_banded(grid[2], wx).astype(np.float64)
        w = np.einsum("ab,byx->ayx", az, v)
        w = np.einsum("ab,zbx->zax", ay, w)
        out += np.einsum("ab,zyb->zya", ax, w)
    return out


@pytest.mark.parametrize("staggered", [False, True])
@pytest.mark.parametrize("flip", [False, True])
def test_conv3_fused_matches_zero_boundary_oracle(rng, flip, staggered):
    from tests.test_deconv_separable import asymmetric_psf

    psf = asymmetric_psf(PSF_SHAPE)
    terms = separable_decompose(psf / psf.sum())
    radii = tuple(k // 2 for k in psf.shape)
    g_shape = (16, 300, 666)
    layout = fused_layout(g_shape, radii, staggered=staggered)
    assert layout is not None
    vol = rng.random(g_shape, dtype=np.float32) * 10.0
    # Staggered layouts alternate the est x offset with direction:
    # conv reads est (@+rx), adjoint writes est.
    carry = fused_pad(vol, layout, est=not flip)
    out = np.asarray(
        conv3_fused(carry, carry, terms, layout, flip=flip, mode="plain")
    )
    ref = _oracle_conv3(vol.astype(np.float64), terms, layout["shape"], flip)
    # Interior comparison: the fused kernel writes the full padded grid
    # (pads re-zeroed only through the RL epilogues).
    sl = layout["interior_est"] if flip else layout["interior"]
    ref_sl = tuple(slice(0, n) for n in g_shape)
    err = np.abs(out[sl] - ref[ref_sl]).max() / np.abs(ref[ref_sl]).max()
    assert err <= 5e-5, f"flip={flip} staggered={staggered}: rel err {err:.2e}"


@pytest.mark.parametrize("staggered", [False, True])
def test_conv3_fused_epilogues(rng, staggered):
    psf = gaussian_psf(PSF_SHAPE, (1.0, 1.5, 1.5))
    terms = separable_decompose(psf)
    radii = tuple(k // 2 for k in psf.shape)
    g_shape = (16, 300, 666)
    layout = fused_layout(g_shape, radii, staggered=staggered)
    vol = rng.random(g_shape, dtype=np.float32) * 10.0 + 0.5
    aux_vol = rng.random(g_shape, dtype=np.float32) * 5.0
    # ratio direction (flip=False): carry is the est layout, out/aux
    # ride the data layout; mult direction (flip=True) is the mirror.
    carry_c = fused_pad(vol, layout, est=True)
    aux_c = fused_pad(aux_vol, layout)
    carry_f = fused_pad(vol, layout)
    aux_f = fused_pad(aux_vol, layout, est=True)
    conv_c = np.asarray(
        conv3_fused(carry_c, aux_c, terms, layout, mode="plain")
    )
    ratio = np.asarray(
        conv3_fused(carry_c, aux_c, terms, layout, mode="ratio", eps=1e-6)
    )
    conv_f = np.asarray(
        conv3_fused(carry_f, aux_f, terms, layout, flip=True, mode="plain")
    )
    mult = np.asarray(
        conv3_fused(carry_f, aux_f, terms, layout, flip=True, mode="mult")
    )
    np.testing.assert_allclose(
        ratio, np.asarray(aux_c) / np.maximum(conv_c, 1e-6),
        rtol=1e-5, atol=1e-6,
    )
    np.testing.assert_allclose(
        mult, np.asarray(aux_f) * conv_f, rtol=1e-5, atol=1e-6
    )
    # Epilogues keep the carry pads exactly zero (aux is zero there).
    gz, gy, gx = g_shape
    x_hi = layout["x_off"] + gx
    assert np.all(ratio[gz:] == 0) and np.all(mult[gz:] == 0)
    assert np.all(ratio[:, gy:] == 0) and np.all(mult[:, gy:] == 0)
    assert np.all(ratio[:, :, gx:] == 0) and np.all(mult[:, :, x_hi:] == 0)
    if layout["x_off"]:
        assert np.all(mult[:, :, : layout["x_off"]] == 0)


def test_rl_fused_matches_zero_boundary_oracle(rng):
    psf = gaussian_psf(PSF_SHAPE, (1.0, 1.6, 1.6))
    truth = gaussian_blob(
        SHAPE, (6.0, 140.0, 320.0), (1.5, 12.0, 18.0), amplitude=400.0
    )
    blurred = np.clip(
        fftconvolve(truth, psf, mode="same") + rng.normal(0, 0.2, SHAPE),
        0,
        None,
    ).astype(np.float32)
    assert rl_fused_supported(SHAPE, psf.shape)
    settings = DeconvolveSettings(
        algorithm="separable", separable_backend="fused", iterations=4
    )
    ours = np.asarray(richardson_lucy(blurred, psf, settings))
    pads = tuple((k // 2, k // 2) for k in psf.shape)
    oracle = richardson_lucy_reference_separable(
        blurred, psf, iterations=4, pads=pads, boundary="zero"
    )
    err = np.abs(ours - oracle).max() / np.abs(oracle).max()
    assert err <= 1e-3, f"rel err {err:.2e}"


def test_rl_fused_asymmetric_psf(rng):
    from tests.test_deconv_separable import asymmetric_psf

    psf = asymmetric_psf(PSF_SHAPE)
    truth = gaussian_blob(
        SHAPE, (6.0, 140.0, 320.0), (1.5, 12.0, 18.0), amplitude=400.0
    )
    blurred = np.clip(
        fftconvolve(truth, psf, mode="same") + rng.normal(0, 0.2, SHAPE),
        0,
        None,
    ).astype(np.float32)
    settings = DeconvolveSettings(
        algorithm="separable", separable_backend="fused", iterations=3
    )
    ours = np.asarray(richardson_lucy(blurred, psf, settings))
    pads = tuple((k // 2, k // 2) for k in psf.shape)
    oracle = richardson_lucy_reference_separable(
        blurred, psf, iterations=3, pads=pads, boundary="zero"
    )
    err = np.abs(ours - oracle).max() / np.abs(oracle).max()
    assert err <= 1e-3, f"rel err {err:.2e}"


def test_rl_fused_agrees_with_linear_pallas_interior(rng):
    psf = gaussian_psf(PSF_SHAPE, (1.0, 1.6, 1.6))
    vol = (rng.random(SHAPE, dtype=np.float32) * 50 + 1.0).astype(np.float32)
    fused = np.asarray(richardson_lucy(
        vol, psf,
        DeconvolveSettings(algorithm="separable",
                           separable_backend="fused", iterations=3),
    ))
    lin = np.asarray(richardson_lucy(
        vol, psf,
        DeconvolveSettings(algorithm="separable",
                           separable_backend="linear_pallas", iterations=3),
    ))
    # Identical zero-boundary semantics on the same G grid.
    err = np.abs(fused - lin).max() / np.abs(lin).max()
    assert err <= 1e-4, f"fused vs linear_pallas rel err {err:.2e}"


def test_fused_unsupported_geometries_guarded():
    assert not rl_fused_supported((10, 32, 32), (5, 9, 9))  # tiny y/x
    assert not rl_fused_supported((12, 280, 650), (21, 9, 9))  # rz > bz
    settings = DeconvolveSettings(
        algorithm="separable", separable_backend="fused", iterations=2
    )
    psf = gaussian_psf((5, 9, 9), (1.0, 1.5, 1.5))
    with pytest.raises(ValueError, match="fused kernel"):
        richardson_lucy(np.ones((10, 32, 32), np.float32), psf, settings)


def test_rl_fused_biggs_startup_matches_plain(rng):
    """The fused backend honors acceleration via the shared outer loop
    (ops/rl_outer.py): a 2-iteration accelerated run is bit-identical
    plain RL (alpha-0 startup), through the fused-layout carry."""
    psf = gaussian_psf(PSF_SHAPE, (1.0, 1.6, 1.6))
    vol = (rng.random(SHAPE, dtype=np.float32) * 50 + 1.0).astype(np.float32)
    plain = np.asarray(richardson_lucy(
        vol, psf,
        DeconvolveSettings(algorithm="separable",
                           separable_backend="fused", iterations=2),
    ))
    accel = np.asarray(richardson_lucy(
        vol, psf,
        DeconvolveSettings(algorithm="separable",
                           separable_backend="fused", iterations=2,
                           acceleration="biggs"),
    ))
    np.testing.assert_allclose(accel, plain, rtol=1e-6, atol=1e-5)


def test_rl_fused_biggs_inkernel_matches_generic(rng, monkeypatch):
    """The in-kernel Biggs implementation (ratio_accel builds y in the
    DMA ring; mult_accel emits x/dx/g and the alpha partials) must
    track the generic rl_outer XLA-epilogue implementation. The two
    compute the gradient with structurally different (exact-arithmetic
    identical) expressions and reduce the step-length sums in a
    different order, so agreement is to rounding, not bitwise."""
    import shrimpy_tpu.ops.rl_fused as rf

    psf = gaussian_psf(PSF_SHAPE, (1.0, 1.6, 1.6))
    vol = (rng.random(SHAPE, dtype=np.float32) * 50 + 1.0).astype(np.float32)
    settings = DeconvolveSettings(
        algorithm="separable", separable_backend="fused", iterations=6,
        acceleration="biggs",
    )
    assert rf._FUSE_ACCEL, "in-kernel Biggs must be the default"
    fused = np.asarray(richardson_lucy(vol, psf, settings))
    monkeypatch.setattr(rf, "_FUSE_ACCEL", False)
    generic = np.asarray(richardson_lucy(vol, psf, settings))
    scale = float(np.abs(generic).max())
    diff = np.abs(fused - generic)
    # Two-tier: the bulk must agree to f32-rounding-trajectory level;
    # isolated voxels may differ more where a 1-ulp y difference flips
    # the ratio's eps clamp (both sides are legitimate roundings).
    assert np.mean(diff <= 5e-4 * scale) >= 0.9999
    assert float(diff.max()) <= 2e-2 * scale


def test_rl_fused_donate_input_matches_and_consumes(rng):
    """``donate_input=True`` hands the raw volume's buffer to the
    program (it is dead once the padded carries are built — the HBM
    headroom that fits the Biggs production carry single-chip). The
    result must be identical to the non-donating run, and the caller's
    device array is consumed."""
    import jax.numpy as jnp

    psf = gaussian_psf(PSF_SHAPE, (1.0, 1.6, 1.6))
    vol = (rng.random(SHAPE, dtype=np.float32) * 50 + 1.0).astype(np.float32)
    base = np.asarray(richardson_lucy(
        vol, psf,
        DeconvolveSettings(algorithm="separable",
                           separable_backend="fused", iterations=3),
    ))
    device_vol = jnp.asarray(vol)
    donated = np.asarray(richardson_lucy(
        device_vol, psf,
        DeconvolveSettings(algorithm="separable",
                           separable_backend="fused", iterations=3,
                           donate_input=True),
    ))
    np.testing.assert_allclose(donated, base, rtol=1e-6, atol=1e-5)
    assert device_vol.is_deleted()
