"""Matmul-DFT transforms (ops/dft.py) vs the numpy FFT oracle.

The dft2z RL backend rides these einsum transforms on the MXU; they
must be the exact DFT (same convention as ``np.fft.rfftn``/``irfftn``
over the last two axes) across direct (N <= 256) and four-step sizes.
"""

import numpy as np
import pytest

from shrimpy_tpu.ops.dft import _balanced_factors, irdft2, rdft2

# (batch, gy, gx): exercises direct-y/direct-x, four-step-y (300 = 15*20),
# four-step-x (384 = 16*24), and a 5-smooth non-square mix.
SHAPES = [(3, 48, 64), (2, 144, 128), (1, 300, 384), (2, 45, 512)]


@pytest.mark.parametrize("shape", SHAPES)
def test_rdft2_matches_numpy(shape, rng):
    x = rng.standard_normal(shape).astype(np.float32)
    ref = np.fft.rfftn(x, axes=(-2, -1))
    got = np.asarray(rdft2(x))
    assert got.shape == ref.shape
    err = np.max(np.abs(got - ref)) / np.max(np.abs(ref))
    assert err <= 1e-5, f"{shape}: forward rel err {err:.2e}"


@pytest.mark.parametrize("shape", SHAPES)
def test_irdft2_matches_numpy(shape, rng):
    # A spectrum of a real signal (exactly Hermitian) — irdft2 must
    # match irfftn's projection convention on it.
    s = np.fft.rfftn(
        rng.standard_normal(shape).astype(np.float32), axes=(-2, -1)
    ).astype(np.complex64)
    ref = np.fft.irfftn(s, s=shape[-2:], axes=(-2, -1))
    got = np.asarray(irdft2(s, shape[-1]))
    err = np.max(np.abs(got - ref)) / np.max(np.abs(ref))
    assert err <= 1e-5, f"{shape}: inverse rel err {err:.2e}"


def test_round_trip_is_identity(rng):
    x = rng.standard_normal((2, 300, 384)).astype(np.float32)
    back = np.asarray(irdft2(rdft2(x), 384))
    err = np.max(np.abs(back - x)) / np.max(np.abs(x))
    assert err <= 1e-5, err


def test_linearity_of_spectral_products(rng):
    """conv theorem sanity: irdft2(rdft2(a) * rdft2(b)) == circular
    convolution of a and b (the exact contract the RL band update
    relies on)."""
    a = rng.standard_normal((1, 60, 64)).astype(np.float32)
    b = rng.standard_normal((1, 60, 64)).astype(np.float32)
    got = np.asarray(irdft2(np.asarray(rdft2(a)) * np.asarray(rdft2(b)), 64))
    ref = np.fft.irfftn(
        np.fft.rfftn(a, axes=(-2, -1)) * np.fft.rfftn(b, axes=(-2, -1)),
        s=(60, 64),
        axes=(-2, -1),
    )
    err = np.max(np.abs(got - ref)) / np.max(np.abs(ref))
    assert err <= 1e-5, err


@pytest.mark.parametrize(
    "shape",
    [
        (16, 24, 32),   # all direct
        (27, 300, 384),  # four-step y and x
        (16, 24, 31),   # odd (prime) x length -> direct + odd Hermitian tail
        (13, 37, 40),   # prime z and y lengths
    ],
)
def test_rdft3_round_trip_matches_numpy(shape, rng):
    from shrimpy_tpu.ops.dft import irdft3, rdft3

    x = rng.standard_normal(shape).astype(np.float32)
    ref = np.fft.rfftn(x)
    got = np.asarray(rdft3(x))
    assert got.shape == ref.shape
    err = np.max(np.abs(got - ref)) / np.max(np.abs(ref))
    assert err <= 1e-5, f"{shape}: rdft3 rel err {err:.2e}"
    back = np.asarray(irdft3(got, shape[-1]))
    rerr = np.max(np.abs(back - x)) / np.max(np.abs(x))
    assert rerr <= 1e-5, f"{shape}: round-trip rel err {rerr:.2e}"


@pytest.mark.parametrize("axis", [-1, -2, -3])
def test_cdft_matches_numpy_fft(axis, rng):
    from shrimpy_tpu.ops.dft import cdft

    shape = (6, 300, 32)
    x = (
        rng.standard_normal(shape) + 1j * rng.standard_normal(shape)
    ).astype(np.complex64)
    ref = np.fft.fft(x, axis=axis)
    got = np.asarray(cdft(x, axis))
    err = np.max(np.abs(got - ref)) / np.max(np.abs(ref))
    assert err <= 1e-5, f"axis {axis}: fwd rel err {err:.2e}"
    iref = np.fft.ifft(x, axis=axis)
    igot = np.asarray(cdft(x, axis, inverse=True))
    ierr = np.max(np.abs(igot - iref)) / np.max(np.abs(iref))
    assert ierr <= 1e-5, f"axis {axis}: inv rel err {ierr:.2e}"


@pytest.mark.parametrize(
    "shape", [(1, 1, 1), (1, 4, 1), (2, 1, 6), (1, 1, 8), (3, 257, 2)]
)
def test_rdft3_degenerate_lengths(shape, rng):
    """Length-1/2 axes and prime lengths (257 -> direct matrix) are
    exact in both directions."""
    from shrimpy_tpu.ops.dft import irdft3, rdft3

    x = rng.standard_normal(shape).astype(np.float32)
    ref = np.fft.rfftn(x)
    got = np.asarray(rdft3(x))
    err = np.max(np.abs(got - ref)) / max(np.max(np.abs(ref)), 1e-12)
    back = np.asarray(irdft3(got.astype(np.complex64), shape[-1]))
    rerr = np.max(np.abs(back - x)) / max(np.max(np.abs(x)), 1e-12)
    assert err <= 1e-5 and rerr <= 1e-5, (shape, err, rerr)


def test_balanced_factors():
    assert _balanced_factors(300) == (15, 20)
    assert _balanced_factors(384) == (16, 24)
    assert _balanced_factors(1024) == (32, 32)
    assert _balanced_factors(1500) == (30, 50)
    n1, n2 = _balanced_factors(1920)
    assert n1 * n2 == 1920 and n1 <= n2


def test_pair_apis_match_complex_wrappers(rng):
    """rdft2_pair/irdft2_pair are the cores the complex wrappers ride;
    the pair forms must agree with the wrappers and with numpy (used
    directly at jit boundaries where complex64 cannot cross, e.g. the
    axon tunnel)."""
    from shrimpy_tpu.ops.dft import irdft2, irdft2_pair, rdft2, rdft2_pair

    x = rng.standard_normal((3, 20, 36)).astype(np.float32)
    yr, yi = rdft2_pair(x)
    ref = np.fft.rfftn(x, axes=(-2, -1))
    got = np.asarray(yr) + 1j * np.asarray(yi)
    assert np.max(np.abs(got - ref)) / np.max(np.abs(ref)) <= 1e-5
    np.testing.assert_array_equal(np.asarray(rdft2(x)), got.astype(np.complex64))

    back_pair = np.asarray(irdft2_pair(yr, yi, 36))
    back_cplx = np.asarray(irdft2(rdft2(x), 36))
    np.testing.assert_array_equal(back_pair, back_cplx)
    assert np.max(np.abs(back_pair - x)) <= 1e-5 * np.max(np.abs(x))
