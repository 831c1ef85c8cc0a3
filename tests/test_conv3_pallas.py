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


def test_conv3_pallas_odd_shapes(rng):
    """Non-tile-aligned extents are padded and cropped transparently."""
    vol = rng.random((7, 37, 53), dtype=np.float32)
    psf = dc.gaussian_psf((3, 5, 5), (0.8, 1.0, 1.0))
    terms = dc.separable_decompose(psf / psf.sum())
    mats = dc._sep_matrices(terms, vol.shape, (1, 2, 2))
    ref = _dense_chain(vol, mats, False)
    ours = np.asarray(conv3_circular_pallas(vol, terms, interpret=True))
    assert np.abs(ours - ref).max() / np.abs(ref).max() <= 1e-5
