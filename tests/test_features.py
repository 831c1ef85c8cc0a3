"""Supporting kernels: blur/otsu/centroid/percentile vs trusted oracles.

Mirrors the reference's kernel test tier
(``tests/test_dynatrack.py:589-812``).
"""

import numpy as np
import pytest
from scipy import ndimage

from shrimpy_tpu.io.synthetic import gaussian_blob
from shrimpy_tpu.ops.features import (
    binary_mask,
    center_of_mass,
    gaussian_blur,
    histogram_percentile,
    multi_otsu,
    multi_otsu_reference,
    otsu_component_mask,
)


def test_gaussian_blur_matches_scipy(rng):
    vol = rng.random((10, 24, 24), dtype=np.float32) * 10.0
    ours = np.asarray(gaussian_blur(vol, (1.5, 2.0, 2.0)))
    oracle = ndimage.gaussian_filter(
        vol.astype(np.float64), (1.5, 2.0, 2.0), mode="reflect", truncate=4.0
    )
    assert np.abs(ours - oracle).max() / np.abs(oracle).max() <= 1e-3


def test_gaussian_blur_zero_sigma_is_noop(rng):
    vol = rng.random((6, 16, 16), dtype=np.float32)
    out = np.asarray(gaussian_blur(vol, 0.0))
    np.testing.assert_allclose(out, vol, atol=1e-6)


def test_histogram_percentile(rng):
    vol = rng.normal(100.0, 15.0, size=(16, 64, 64)).astype(np.float32)
    span = vol.max() - vol.min()
    for q in (50.0, 99.0, 99.99):
        ours = float(histogram_percentile(vol, q))
        # The histogram estimate rounds up to the next actual sample
        # (sparse tails have gaps wider than a bin), so the oracle is the
        # 'higher' order statistic, matched to within one bin width.
        oracle = float(np.percentile(vol, q, method="higher"))
        assert abs(ours - oracle) <= span / 4096 + 1e-3 * span


def test_multi_otsu_matches_bruteforce(rng):
    # Three well-separated intensity modes.
    vol = np.concatenate(
        [
            rng.normal(10, 2, 4000),
            rng.normal(100, 5, 2000),
            rng.normal(200, 8, 1000),
        ]
    ).astype(np.float32)
    bins = 64  # keep the O(bins^2) oracle cheap
    ours = np.asarray(multi_otsu(vol, bins=bins))
    oracle = multi_otsu_reference(vol, bins=bins)
    np.testing.assert_allclose(ours, oracle, atol=1e-3)
    # And they actually separate the modes.
    assert 10 < ours[0] < 100
    assert 100 < ours[1] < 200


def test_center_of_mass():
    vol = gaussian_blob((16, 32, 32), (5.0, 20.0, 12.0), (1.5, 2.0, 2.0))
    com = np.asarray(center_of_mass(vol))
    np.testing.assert_allclose(com, [5.0, 20.0, 12.0], atol=0.1)


def test_center_of_mass_empty_falls_back_to_center():
    com = np.asarray(center_of_mass(np.zeros((8, 16, 16), np.float32)))
    np.testing.assert_allclose(com, [3.5, 7.5, 7.5])


def test_binary_mask_and_otsu_component(rng):
    vol = gaussian_blob((12, 32, 32), (6.0, 16.0, 16.0), (2.0, 3.0, 3.0), 200.0)
    vol += rng.normal(0, 1.0, vol.shape).astype(np.float32)
    mask, _ = otsu_component_mask(vol, component=0, sigma=1.0)
    mask = np.asarray(mask)
    # The bright class contains the blob center, not the background rim.
    assert mask[6, 16, 16] == 1.0
    assert mask[0, 0, 0] == 0.0
    com = np.asarray(center_of_mass(mask))
    np.testing.assert_allclose(com, [6.0, 16.0, 16.0], atol=1.0)

    simple = np.asarray(binary_mask(vol, 100.0))
    assert simple.dtype == np.float32
    assert simple.max() == 1.0
