"""Sharded pipeline: mesh construction + batch/space sharding parity.

Runs on the virtual 8-device CPU mesh (conftest), the SURVEY.md §4
strategy for multi-chip coverage without hardware.
"""

import jax
import numpy as np
import pytest

# Heavyweight module (big compiles / end-to-end): excluded from the
# quick review-loop tier (docs/testing.md).
pytestmark = pytest.mark.slow

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


@pytest.mark.parametrize("transform", ["xla", "matmul"])
def test_slab_fft_round_trip_and_parity(rng, transform):
    """fft3_sharded on the space axis equals a whole-volume fftn for
    both local transform implementations, and inverts exactly."""
    from functools import partial

    from jax.sharding import PartitionSpec as P

    from shrimpy_tpu.parallel.fft import fft3_sharded, ifft3_sharded

    mesh = make_mesh(8, space=4)
    x = rng.random((2, 8, 16, 64), dtype=np.float32).astype(np.complex64)

    def body(blk):
        return fft3_sharded(blk, "space", transform)

    shard = jax.jit(jax.shard_map(
        body, mesh=mesh,
        in_specs=P("batch", None, None, "space"),
        out_specs=P("batch", None, None, "space"),
        check_vma=False,
    ))
    got = np.asarray(shard(x))
    ref = np.fft.fftn(x, axes=(1, 2, 3))
    assert np.max(np.abs(got - ref)) / np.max(np.abs(ref)) <= 1e-5

    def inv_body(blk):
        return ifft3_sharded(blk, "space", transform)

    inv = jax.jit(jax.shard_map(
        inv_body, mesh=mesh,
        in_specs=P("batch", None, None, "space"),
        out_specs=P("batch", None, None, "space"),
        check_vma=False,
    ))
    back = np.asarray(inv(shard(x)))
    assert np.max(np.abs(back - x)) / np.max(np.abs(x)) <= 1e-5


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


def test_shard_volumes_distributed_fft_rl(rng):
    """>HBM mode (SURVEY 5.7): volumes stay X-sharded over 'space'
    through the volumetric stages — the FFT RL partitions under GSPMD
    as a distributed slab FFT — and match the single-device FFT path."""
    import jax

    settings = ReconstructSettings(
        deconvolve=DeconvolveSettings(iterations=3, algorithm="fft"),
        shard_volumes=True,
    )
    psf = gaussian_psf((3, 5, 5), (0.8, 1.0, 1.0))
    raw = rng.random((2, 8, 16, 256), dtype=np.float32) * 50.0

    plain_settings = ReconstructSettings(
        deconvolve=DeconvolveSettings(iterations=3, algorithm="fft")
    )
    plain = np.asarray(reconstruct_batch(raw, plain_settings, psf=psf))

    mesh = make_mesh(8, space=4)
    out = reconstruct_batch(raw, settings, psf=psf, mesh=mesh)
    # The output really is X-sharded (no whole-volume reshard happened).
    spec = out.sharding.spec
    assert "space" in str(spec), spec
    np.testing.assert_allclose(np.asarray(out), plain, rtol=2e-4, atol=2e-4)


def test_shard_volumes_rejects_separable():
    import pytest as _pytest

    with _pytest.raises(ValueError, match="volume-local"):
        ReconstructSettings(
            deconvolve=DeconvolveSettings(algorithm="separable"),
            shard_volumes=True,
        )


def test_shard_volumes_phase_slab_fft(rng):
    """Phase inverse on X-sharded volumes (distributed slab FFT with
    the transfer function sliced per shard) matches single-device."""
    from shrimpy_tpu.config.schemas import PhaseSettings

    phase = PhaseSettings(
        transfer_function={
            "yx_pixel_size": 0.116, "z_pixel_size": 0.25, "z_padding": 0,
        }
    )
    raw = rng.random((2, 8, 16, 256), dtype=np.float32) * 100

    plain = np.asarray(
        reconstruct_batch(raw, ReconstructSettings(phase=phase))
    )
    out = np.asarray(reconstruct_batch(
        raw,
        ReconstructSettings(phase=phase, shard_volumes=True),
        mesh=make_mesh(8, space=4),
    ))
    # atol covers f32 op-order noise between the two exact transform
    # implementations (whole-volume rdft3 vs slab cdft) on ~1e2 values.
    np.testing.assert_allclose(out, plain, rtol=2e-4, atol=1e-4)


def test_mesh_divisibility_errors_are_actionable(rng):
    psf = gaussian_psf((5, 5, 5), (1.0, 1.0, 1.0))
    with pytest.raises(ValueError, match="batch size 3 must be divisible"):
        reconstruct_batch(
            _batch(rng, b=3), SETTINGS, psf=psf, mesh=make_mesh(8, space=2)
        )
    with pytest.raises(ValueError, match="X extent .* must be divisible"):
        reconstruct_batch(
            _batch(rng, b=4, shape=(24, 16, 130)), SETTINGS, psf=psf,
            mesh=make_mesh(8, space=4),
        )


def test_explicit_fused_backend_unsupported_geometry_raises(rng):
    settings = ReconstructSettings(
        deconvolve=DeconvolveSettings(
            iterations=2, separable_backend="fused"
        ),
    )
    psf = gaussian_psf((3, 5, 5), (0.8, 1.0, 1.0))
    raw = rng.random((1, 8, 16, 64), dtype=np.float32)  # x far below bx+256
    with pytest.raises(ValueError, match="fused"):
        reconstruct_batch(raw, settings, psf=psf)


def test_pipeline_nonsep_fallback_honors_fft_backend(rng):
    """The runtime pipeline's non-separable fallback routes through the
    same fft-backend dispatch as richardson_lucy — fft_backend/
    fft_z_chunk must not be silently inert in the product path
    (pipeline.py::_deconv_fn)."""
    import numpy as np

    from shrimpy_tpu.config import DeconvolveSettings, ReconstructSettings
    from shrimpy_tpu.ops.deconv import richardson_lucy
    from shrimpy_tpu.parallel.pipeline import _deconv_fn

    # Genuinely non-separable PSF (shear cross-terms).
    zz, yy, xx = np.meshgrid(
        np.arange(5) - 2.0, np.arange(7) - 3.0, np.arange(7) - 3.0,
        indexing="ij",
    )
    psf = np.exp(
        -0.5 * (((zz + 0.8 * yy) / 1.0) ** 2 + ((yy + 0.7 * xx) / 1.5) ** 2
                + (xx / 2.0) ** 2)
    ).astype(np.float32)
    psf /= psf.sum()

    vol = rng.random((8, 24, 20), dtype=np.float32) * 50.0
    for backend in ("fft2z", "fft3"):
        deconv = DeconvolveSettings(
            iterations=3, algorithm="fft", fft_backend=backend, fft_z_chunk=2
        )
        settings = ReconstructSettings(deconvolve=deconv)
        fn = _deconv_fn(settings, psf)
        ours = np.asarray(fn(vol))
        oracle = np.asarray(richardson_lucy(vol, psf, deconv))
        np.testing.assert_allclose(ours, oracle, rtol=0, atol=1e-5)
