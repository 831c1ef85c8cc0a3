"""Sharded pipeline: mesh construction + batch/space sharding parity.

Runs on the virtual 8-device CPU mesh (conftest), the SURVEY.md §4
strategy for multi-chip coverage without hardware.
"""

import jax
import numpy as np
import pytest

from shrimpy_tpu.config import DeconvolveSettings, DeskewSettings, ReconstructSettings
from shrimpy_tpu.ops.deconv import gaussian_psf
from shrimpy_tpu.parallel import make_mesh, reconstruct_batch
from shrimpy_tpu.parallel.pipeline import output_shape

SETTINGS = ReconstructSettings(
    deskew=DeskewSettings(ls_angle_deg=30.0, px_to_scan_ratio=0.386),
    deconvolve=DeconvolveSettings(iterations=3),
)


def _batch(rng, b=8, shape=(24, 16, 128)):
    return rng.random((b, *shape), dtype=np.float32) * 50.0


def test_make_mesh_shapes():
    mesh = make_mesh(8)
    assert mesh.devices.shape == (8, 1)
    mesh2 = make_mesh(8, space=2)
    assert mesh2.devices.shape == (4, 2)
    with pytest.raises(ValueError):
        make_mesh(8, space=3)
    with pytest.raises(ValueError):
        make_mesh(100)


def test_batch_sharded_matches_single_device(rng):
    raw = _batch(rng)
    psf = gaussian_psf((5, 5, 5), (1.0, 1.0, 1.0))
    plain = np.asarray(reconstruct_batch(raw, SETTINGS, psf=psf))
    mesh = make_mesh(8)
    sharded = np.asarray(reconstruct_batch(raw, SETTINGS, psf=psf, mesh=mesh))
    assert plain.shape[0] == raw.shape[0]
    assert plain.shape[1:] == output_shape(raw.shape[1:], SETTINGS)
    # FFT partitioning reorders reductions; parity is ~1e-4 relative.
    np.testing.assert_allclose(sharded, plain, rtol=2e-3, atol=1e-3)


def test_space_sharding_matches(rng):
    raw = _batch(rng, b=4)
    psf = gaussian_psf((5, 5, 5), (1.0, 1.0, 1.0))
    plain = np.asarray(reconstruct_batch(raw, SETTINGS, psf=psf))
    mesh = make_mesh(8, space=2)
    sharded = np.asarray(reconstruct_batch(raw, SETTINGS, psf=psf, mesh=mesh))
    np.testing.assert_allclose(sharded, plain, rtol=2e-3, atol=1e-3)


def test_space_sharding_flattened_batch(rng):
    """B divisible by device count -> whole-volume-per-device FFT path."""
    raw = _batch(rng, b=8)
    psf = gaussian_psf((5, 5, 5), (1.0, 1.0, 1.0))
    plain = np.asarray(reconstruct_batch(raw, SETTINGS, psf=psf))
    mesh = make_mesh(8, space=2)
    sharded = np.asarray(reconstruct_batch(raw, SETTINGS, psf=psf, mesh=mesh))
    np.testing.assert_allclose(sharded, plain, rtol=2e-3, atol=1e-3)


def test_pallas_kernels_through_shard_map(rng):
    """The PRODUCTION kernels (Pallas deskew + fused RL, interpret mode
    on CPU) run under the mesh via shard_map and match the same
    kernels single-device — round 1 forced XLA fallbacks here."""
    settings = ReconstructSettings(
        deskew=DeskewSettings(
            ls_angle_deg=30.0, px_to_scan_ratio=0.386, backend="pallas"
        ),
        deconvolve=DeconvolveSettings(
            iterations=2, separable_backend="fused"
        ),
    )
    psf = gaussian_psf((3, 7, 7), (0.8, 1.2, 1.2))
    # Deskewed shape must satisfy the fused-RL constraints (y >= one
    # slab, x >= bx + 256): raw scan 80 -> ny ~ 200, x = 768.
    raw = rng.random((2, 80, 12, 768), dtype=np.float32) * 50.0
    plain = np.asarray(reconstruct_batch(raw, settings, psf=psf))
    mesh = make_mesh(8, space=4)
    sharded = np.asarray(reconstruct_batch(raw, settings, psf=psf, mesh=mesh))
    np.testing.assert_allclose(sharded, plain, rtol=1e-4, atol=1e-4)


def test_deskew_only_pipeline(rng):
    from shrimpy_tpu.ops.deskew import deskew_volume

    settings = ReconstructSettings(deskew=SETTINGS.deskew)
    raw = _batch(rng, b=8, shape=(20, 12, 128))
    out = np.asarray(reconstruct_batch(raw, settings, mesh=make_mesh(8)))
    ref = np.asarray(deskew_volume(raw[3], settings.deskew))
    np.testing.assert_allclose(out[3], ref, rtol=1e-5, atol=1e-5)
