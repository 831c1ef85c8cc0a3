"""Phase cross-correlation: known-shift recovery.

Mirrors the reference's PCC tests (``tests/test_dynatrack.py:84-117``):
a shifted copy of a random/blob volume must yield the exact integer
shift, with the reference's sign convention (positive = moving image
displaced in the positive direction).
"""

import numpy as np
import pytest

from shrimpy_tpu.io.synthetic import gaussian_blob
from shrimpy_tpu.ops.pcc import phase_cross_correlation


def _roll(img, shift):
    return np.roll(img, shift, axis=tuple(range(img.ndim)))


@pytest.mark.parametrize("shift", [(3, -5), (0, 0), (-7, 2)])
def test_pcc_2d_known_shift(rng, shift):
    ref = rng.random((64, 48), dtype=np.float32)
    mov = _roll(ref, shift)
    est = phase_cross_correlation(ref, mov)
    np.testing.assert_array_equal(est, np.array(shift, dtype=np.float32))


@pytest.mark.parametrize("shift", [(2, -3, 4), (0, 1, 0)])
def test_pcc_3d_known_shift(rng, shift):
    ref = rng.random((16, 32, 24), dtype=np.float32)
    mov = _roll(ref, shift)
    est = phase_cross_correlation(ref, mov)
    np.testing.assert_array_equal(est, np.array(shift, dtype=np.float32))


@pytest.mark.parametrize("ndim", [2, 3])
def test_pcc_matmul_transform_matches_xla(rng, ndim):
    """The matmul-DFT correlation (auto default) recovers the same
    subpixel shift as the jnp.fft path."""
    shape = (48, 40) if ndim == 2 else (12, 32, 24)
    ref = rng.random(shape, dtype=np.float32)
    mov = _roll(ref, tuple([2] + [-3] * (ndim - 1)))
    for upsample in (None, "parabolic", "dft"):
        mm = phase_cross_correlation(
            ref, mov, upsample=upsample, transform="matmul"
        )
        xla = phase_cross_correlation(
            ref, mov, upsample=upsample, transform="xla"
        )
        np.testing.assert_allclose(mm, xla, atol=1e-4)


def test_pcc_blob_translation_non_periodic():
    """Non-periodic translation of a compact blob is still recovered."""
    shape = (24, 64, 64)
    ref = gaussian_blob(shape, (12.0, 32.0, 32.0), (3.0, 5.0, 5.0))
    mov = gaussian_blob(shape, (14.0, 27.0, 38.0), (3.0, 5.0, 5.0))
    est = phase_cross_correlation(ref, mov)
    np.testing.assert_array_equal(est, [2.0, -5.0, 6.0])


def test_pcc_subpixel_parabolic():
    shape = (32, 96, 96)
    ref = gaussian_blob(shape, (16.0, 48.0, 48.0), (3.0, 6.0, 6.0))
    mov = gaussian_blob(shape, (16.4, 45.7, 50.3), (3.0, 6.0, 6.0))
    est = phase_cross_correlation(ref, mov, upsample="parabolic")
    np.testing.assert_allclose(est, [0.4, -2.3, 2.3], atol=0.15)


def test_pcc_mismatched_shapes_pad_crop():
    """Operands of different shapes are matched (reflect pad / center crop)."""
    rng = np.random.default_rng(7)
    ref = rng.random((30, 40), dtype=np.float32)
    mov = _roll(ref, (4, -6))[:28, :40]
    est = phase_cross_correlation(ref, mov)
    # y-axis estimate remains exact; x unchanged
    assert est[1] == -6.0


def test_pcc_maximum_shift_pads_fft():
    """maximum_shift > 1 widens the FFT search grid and still recovers a
    genuine (non-wrapped) translation of a compact object."""
    shape = (40, 40)
    ref = gaussian_blob((1, *shape), (0.0, 20.0, 20.0), (1.0, 4.0, 4.0))[0]
    mov = gaussian_blob((1, *shape), (0.0, 26.0, 13.0), (1.0, 4.0, 4.0))[0]
    est = phase_cross_correlation(ref, mov, maximum_shift=2.0)
    np.testing.assert_array_equal(est, [6.0, -7.0])


def test_pcc_dft_subpixel():
    """Matrix-DFT upsampling resolves sub-pixel shifts to ~1/10 px."""
    shape = (32, 96, 96)
    ref = gaussian_blob(shape, (16.0, 48.0, 48.0), (3.0, 6.0, 6.0))
    mov = gaussian_blob(shape, (16.4, 45.7, 50.3), (3.0, 6.0, 6.0))
    est = phase_cross_correlation(ref, mov, upsample="dft", upsample_factor=20)
    np.testing.assert_allclose(est, [0.4, -2.3, 2.3], atol=0.08)


def test_pcc_dft_integer_shift_stays_exact(rng):
    ref = rng.random((48, 64), dtype=np.float32)
    mov = _roll(ref, (3, -5))
    est = phase_cross_correlation(ref, mov, upsample="dft", upsample_factor=10)
    np.testing.assert_allclose(est, [3.0, -5.0], atol=0.05)
