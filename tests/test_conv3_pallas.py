"""Fused Pallas conv3 kernel: parity vs the dense circulant oracle."""

import numpy as np
import pytest

import shrimpy_tpu.ops.deconv as dc
from shrimpy_tpu.ops.conv3_pallas import conv3_circular_pallas


def _dense_chain(vol, mats, flip):
    cz, cy, cx, tz, ty, tx = [m.astype(np.float64) for m in mats]
    a, b, c = (tz, ty, tx) if flip else (cz, cy, cx)
    out = np.zeros_like(vol, dtype=np.float64)
    for i in range(a.shape[0]):
        w = np.einsum("ab,byx->ayx", a[i], vol.astype(np.float64))
        w = np.einsum("ab,zbx->zax", b[i], w)
        out += np.einsum("ab,zyb->zya", c[i], w)
    return out


@pytest.mark.parametrize("flip", [False, True])
def test_conv3_pallas_matches_circulant(rng, flip):
    vol = rng.random((12, 40, 40), dtype=np.float32)
    psf = dc.gaussian_psf((5, 9, 9), (1.0, 1.5, 1.5))
    terms = dc.separable_decompose(psf / psf.sum())
    mats = dc._sep_matrices(terms, vol.shape, (2, 4, 4))
    ref = _dense_chain(vol, mats, flip)
    ours = np.asarray(conv3_circular_pallas(vol, terms, flip=flip, interpret=True))
    assert np.abs(ours - ref).max() / np.abs(ref).max() <= 1e-5


@pytest.mark.parametrize("flip", [False, True])
def test_conv3_pallas_asymmetric_taps(rng, flip):
    """Asymmetric taps distinguish convolution from correlation — the
    shifted-FMA indexing must implement the circulant CONVOLUTION
    (flip=False) and its adjoint (flip=True)."""
    from tests.test_deconv_separable import asymmetric_psf

    vol = rng.random((12, 40, 40), dtype=np.float32)
    psf = asymmetric_psf((5, 9, 9))
    terms = dc.separable_decompose(psf / psf.sum())
    mats = dc._sep_matrices(terms, vol.shape, (2, 4, 4))
    ref = _dense_chain(vol, mats, flip)
    ours = np.asarray(conv3_circular_pallas(vol, terms, flip=flip, interpret=True))
    assert np.abs(ours - ref).max() / np.abs(ref).max() <= 1e-5


@pytest.mark.parametrize("flip", [False, True])
def test_convzy_pallas_asymmetric_taps(rng, flip):
    """Same guard for the fused z+y kernel (z taps ride leading-dim
    slices and are the easiest place to mis-index)."""
    from shrimpy_tpu.ops.conv3_pallas import convzy_circular_pallas

    from tests.test_deconv_separable import asymmetric_psf

    vol = rng.random((12, 40, 40), dtype=np.float32)
    psf = asymmetric_psf((5, 9, 9))
    terms = dc.separable_decompose(psf / psf.sum())
    (wz, wy, wx) = terms[0]
    mats = dc._sep_matrices(terms, vol.shape, (2, 4, 4))
    cz, cy, cx, tz, ty, tx = [m.astype(np.float64) for m in mats]
    az, ay = ((tz, ty) if flip else (cz, cy))
    ref = np.einsum("ab,byx->ayx", az[0], vol.astype(np.float64))
    ref = np.einsum("ab,zbx->zax", ay[0], ref)
    ours = np.asarray(
        convzy_circular_pallas(vol, wz, wy, flip=flip, interpret=True)
    )
    assert np.abs(ours - ref).max() / np.abs(ref).max() <= 1e-5


def test_conv3_pallas_odd_shapes(rng):
    """Non-tile-aligned extents are padded and cropped transparently."""
    vol = rng.random((7, 37, 53), dtype=np.float32)
    psf = dc.gaussian_psf((3, 5, 5), (0.8, 1.0, 1.0))
    terms = dc.separable_decompose(psf / psf.sum())
    mats = dc._sep_matrices(terms, vol.shape, (1, 2, 2))
    ref = _dense_chain(vol, mats, False)
    ours = np.asarray(conv3_circular_pallas(vol, terms, interpret=True))
    assert np.abs(ours - ref).max() / np.abs(ref).max() <= 1e-5
