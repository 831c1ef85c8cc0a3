"""Whole-iteration fused RL kernel: parity vs rl_fused + fp64 oracle.

All tests run in interpret mode on the CPU mesh (plain f32 dots — see
rl_fused.py's clone-safety note); the bf16x3 hardware numerics are
validated on the real MXU by scripts/bench_rl.py parity modes.
"""

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
from shrimpy_tpu.ops.rl_fused import rl_fused
from shrimpy_tpu.ops.rl_fused_iter import (
    iter_best_layout,
    iter_layout,
    rl_fused_iter,
    rl_iter_supported,
)

# Smallest geometry exercising first/mid/last tiles in y (nyb=3) and
# first/last in x without making CPU interpret mode crawl.
SHAPE = (12, 280, 650)
PSF_SHAPE = (5, 9, 9)


def _blurred(rng, psf, shape=SHAPE):
    truth = gaussian_blob(
        shape, (6.0, 140.0, 320.0), (1.5, 12.0, 18.0), amplitude=400.0
    )
    return np.clip(
        fftconvolve(truth, psf, mode="same") + rng.normal(0, 0.2, shape),
        0,
        None,
    ).astype(np.float32)


def _settings(**kw):
    return DeconvolveSettings(algorithm="separable", **kw)


def test_rl_iter_matches_rl_fused(rng):
    """Bit-for-algorithm parity: the fused-iteration kernel runs the
    same update sequence as rl_fused, so interpret-mode f32 results
    agree to round-off."""
    psf = gaussian_psf(PSF_SHAPE, (1.0, 1.6, 1.6))
    vol = _blurred(rng, psf)
    terms = separable_decompose(psf)
    s = _settings(iterations=3)
    assert rl_iter_supported(SHAPE, psf.shape)
    ours = np.asarray(rl_fused_iter(vol, psf, terms, s, 3))
    ref = np.asarray(rl_fused(vol, psf, terms, s, 3))
    err = np.abs(ours - ref).max() / np.abs(ref).max()
    assert err <= 1e-5, f"fused_iter vs rl_fused rel err {err:.2e}"


def test_rl_iter_matches_zero_boundary_oracle(rng):
    psf = gaussian_psf(PSF_SHAPE, (1.0, 1.6, 1.6))
    vol = _blurred(rng, psf)
    terms = separable_decompose(psf)
    ours = np.asarray(rl_fused_iter(vol, psf, terms, _settings(), 4))
    pads = tuple((k // 2, k // 2) for k in psf.shape)
    oracle = richardson_lucy_reference_separable(
        vol, psf, iterations=4, pads=pads, boundary="zero"
    )
    err = np.abs(ours - oracle).max() / np.abs(oracle).max()
    assert err <= 1e-3, f"rel err {err:.2e}"


def test_rl_iter_asymmetric_psf(rng):
    """Asymmetric taps catch adjoint tap-order (flip) bugs that
    symmetric Gaussians hide."""
    from tests.test_deconv_separable import asymmetric_psf

    psf = asymmetric_psf(PSF_SHAPE)
    vol = _blurred(rng, psf)
    terms = separable_decompose(psf / psf.sum())
    ours = np.asarray(rl_fused_iter(vol, psf, terms, _settings(), 3))
    ref = np.asarray(rl_fused(vol, psf, terms, _settings(), 3))
    err = np.abs(ours - ref).max() / np.abs(ref).max()
    assert err <= 1e-5, f"asymmetric rel err {err:.2e}"


def test_rl_iter_multi_term(rng):
    """Rank-2 separable decomposition exercises the n_terms loops."""
    def _t(sz, sy, sx, amp):
        g = gaussian_psf(PSF_SHAPE, (sz, sy, sx)).astype(np.float64)
        wz = g.sum((1, 2))
        wy = g.sum((0, 2))
        wx = g.sum((0, 1))
        wz *= amp / wz.sum()
        return wz, wy / wy.sum(), wx / wx.sum()

    terms = [_t(1.0, 1.6, 1.6, 0.7), _t(1.8, 0.9, 2.2, 0.3)]
    psf2 = sum(
        np.einsum("z,y,x->zyx", wz, wy, wx) for wz, wy, wx in terms
    )
    assert len(terms) >= 2
    vol = _blurred(rng, psf2)
    ours = np.asarray(rl_fused_iter(vol, psf2, terms, _settings(), 2))
    ref = np.asarray(rl_fused(vol, psf2, terms, _settings(), 2))
    err = np.abs(ours - ref).max() / np.abs(ref).max()
    assert err <= 1e-5, f"multi-term rel err {err:.2e}"


def test_rl_iter_mid_x_tile(rng, monkeypatch):
    """Force bx=256 so the x grid has a true interior tile (nxb=3):
    covers the unclamped slab path on both sides."""
    monkeypatch.setenv("SHRIMPY_RLI_BX", "256")
    psf = gaussian_psf(PSF_SHAPE, (1.0, 1.6, 1.6))
    radii = tuple(k // 2 for k in psf.shape)
    g = tuple(n + 2 * r for n, r in zip(SHAPE, radii))
    layout = iter_layout(g, radii)
    assert layout is not None and layout["shape"][2] // layout["bx"] >= 3
    vol = _blurred(rng, psf)
    terms = separable_decompose(psf)
    ours = np.asarray(rl_fused_iter(vol, psf, terms, _settings(), 2))
    ref = np.asarray(rl_fused(vol, psf, terms, _settings(), 2))
    err = np.abs(ours - ref).max() / np.abs(ref).max()
    assert err <= 1e-5, f"bx=256 rel err {err:.2e}"


def test_rl_iter_two_y_tiles(rng):
    """nyb=2: every y tile is an edge variant (no mid)."""
    shape = (10, 248, 650)  # g_y = 256 exactly -> yp=256, nyb=2
    psf = gaussian_psf(PSF_SHAPE, (1.0, 1.6, 1.6))
    vol = _blurred(rng, psf, shape)
    terms = separable_decompose(psf)
    assert rl_iter_supported(shape, psf.shape)
    ours = np.asarray(rl_fused_iter(vol, psf, terms, _settings(), 2))
    ref = np.asarray(rl_fused(vol, psf, terms, _settings(), 2))
    err = np.abs(ours - ref).max() / np.abs(ref).max()
    assert err <= 1e-5, f"nyb=2 rel err {err:.2e}"


def test_iter_unsupported_geometries_guarded():
    assert not rl_iter_supported((10, 32, 32), (5, 9, 9))  # tiny y/x
    assert not rl_iter_supported((12, 280, 650), (21, 9, 9))  # rz > bz
    assert not rl_iter_supported((12, 280, 650), (5, 9, 131))  # 2rx > 128
    # Both orientations scored; the swapped one can rescue a thin-y
    # volume with a long x.
    assert iter_best_layout((12, 650, 280), (5, 9, 9)) is not None


def test_rl_iter_through_backend_dispatch(rng):
    """separable_backend='fused_iter' routes through richardson_lucy."""
    psf = gaussian_psf(PSF_SHAPE, (1.0, 1.6, 1.6))
    vol = _blurred(rng, psf)
    ours = np.asarray(
        richardson_lucy(
            vol, psf,
            _settings(separable_backend="fused_iter", iterations=2),
        )
    )
    ref = np.asarray(
        richardson_lucy(
            vol, psf,
            _settings(separable_backend="fused", iterations=2),
        )
    )
    err = np.abs(ours - ref).max() / np.abs(ref).max()
    assert err <= 1e-5, f"dispatch rel err {err:.2e}"


def test_rl_iter_unsupported_backend_errors():
    psf = gaussian_psf((5, 9, 9), (1.0, 1.5, 1.5))
    with pytest.raises(ValueError, match="fused_iter"):
        richardson_lucy(
            np.ones((10, 32, 32), np.float32),
            psf,
            _settings(separable_backend="fused_iter", iterations=2),
        )
