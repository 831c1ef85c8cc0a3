"""Registration: scipy-oracle affine apply + estimate recovery.

BASELINE.json configs[2]: estimate + apply the transform between two
volumes of one position.
"""

import numpy as np
import pytest

from shrimpy_tpu.config import RegistrationSettings
from shrimpy_tpu.io.synthetic import gaussian_blob
from shrimpy_tpu.ops.register import (
    affine_apply,
    affine_apply_reference_scipy,
    estimate_registration,
    ncc_loss,
)


def test_affine_apply_matches_scipy(rng):
    vol = rng.random((12, 24, 20), dtype=np.float32) * 50.0
    matrix = np.eye(3) + rng.normal(0, 0.05, (3, 3))
    offset = rng.normal(0, 2.0, 3)
    ours = np.asarray(affine_apply(vol, matrix, offset))
    oracle = affine_apply_reference_scipy(vol, matrix, offset)
    scale = np.abs(oracle).max()
    assert np.abs(ours - oracle).max() / scale <= 1e-3


def _rotation_zyx(axis: int, deg: float) -> np.ndarray:
    """3-D rotation matrix about one ZYX axis."""
    c, s = np.cos(np.deg2rad(deg)), np.sin(np.deg2rad(deg))
    m = np.eye(3)
    i, j = [a for a in range(3) if a != axis]
    m[i, i] = c
    m[i, j] = -s
    m[j, i] = s
    m[j, j] = c
    return m


def test_blocked_path_engages_for_rotations(rng):
    from shrimpy_tpu.ops.register import _blocked_plan

    m = _rotation_zyx(0, 3.0)  # in-plane (yx) rotation
    plan = _blocked_plan(m, np.zeros(3), (64, 256, 256), (64, 256, 256))
    assert plan is not None
    # Large rotations exceed the candidate envelope -> gather fallback.
    assert (
        _blocked_plan(
            _rotation_zyx(0, 60.0), np.zeros(3), (64, 256, 256), (64, 256, 256)
        )
        is None
    )


@pytest.mark.parametrize("deg", [1.0, 3.0, 5.0])
def test_blocked_rotation_matches_scipy(rng, deg):
    """In-plane rotations (the registration-grade full-affine case) ride
    the gather-free blocked path and match scipy to f32 tolerance."""
    from shrimpy_tpu.ops.register import _blocked_plan

    vol = rng.random((12, 48, 40), dtype=np.float32) * 50.0
    center = (np.asarray(vol.shape) - 1) / 2.0
    m = _rotation_zyx(0, deg)
    offset = center - m @ center  # rotate about the volume center
    assert _blocked_plan(m, offset, vol.shape, vol.shape) is not None
    ours = np.asarray(affine_apply(vol, m, offset))
    oracle = affine_apply_reference_scipy(vol, m, offset)
    assert np.abs(ours - oracle).max() / np.abs(oracle).max() <= 1e-4


def test_blocked_full_affine_matches_scipy(rng):
    """Rotation + anisotropic scale + shear + translation (all three
    axes coupled, negative drifts included)."""
    vol = rng.random((10, 40, 36), dtype=np.float32) * 50.0
    m = (
        _rotation_zyx(0, 2.0)
        @ _rotation_zyx(1, 1.0)
        @ np.diag([1.04, 0.97, 1.02])
    )
    m[1, 0] += 0.03  # extra shear
    offset = np.array([1.7, -2.3, 0.9])
    ours = np.asarray(affine_apply(vol, m, offset))
    oracle = affine_apply_reference_scipy(vol, m, offset)
    assert np.abs(ours - oracle).max() / np.abs(oracle).max() <= 1e-4


def test_blocked_output_shape_and_boundaries(rng):
    """Output grids larger than the input read zeros outside
    (grid-constant) through the blocked path too."""
    vol = rng.random((8, 24, 20), dtype=np.float32) * 10.0
    m = _rotation_zyx(0, 4.0)
    offset = np.array([-2.0, 3.0, -4.0])
    out_shape = (10, 30, 28)
    ours = np.asarray(affine_apply(vol, m, offset, out_shape))
    oracle = affine_apply_reference_scipy(vol, m, offset, out_shape)
    assert ours.shape == out_shape
    assert np.abs(ours - oracle).max() / (np.abs(oracle).max() or 1.0) <= 1e-4


def test_affine_apply_identity(rng):
    vol = rng.random((8, 16, 16), dtype=np.float32)
    out = np.asarray(affine_apply(vol, np.eye(3), np.zeros(3)))
    np.testing.assert_allclose(out, vol, atol=1e-5)


def _scene(center):
    shape = (16, 32, 32)
    vol = gaussian_blob(shape, center, (2.0, 3.0, 3.0), amplitude=100.0)
    vol += gaussian_blob(
        shape,
        (center[0] - 3, center[1] + 6, center[2] - 5),
        (1.5, 2.0, 2.0),
        amplitude=60.0,
    )
    return vol


def test_estimate_pcc_translation():
    fixed = _scene((8.0, 16.0, 18.0))
    moving = _scene((9.0, 13.0, 22.0))  # displaced by (+1, -3, +4)
    result = estimate_registration(fixed, moving, RegistrationSettings(method="pcc"))
    np.testing.assert_allclose(
        result.translation_seed, [1.0, -3.0, 4.0], atol=0.5
    )
    # Applying the estimated transform aligns moving onto fixed.
    warped = np.asarray(affine_apply(moving, result.matrix, result.offset))
    assert float(ncc_loss(warped, fixed)) < 0.05


def test_refine_improves_on_seed():
    fixed = _scene((8.0, 16.0, 18.0))
    # moving = slightly scaled + translated rendition
    shape = (16, 32, 32)
    moving = gaussian_blob(shape, (9.5, 14.0, 21.0), (2.2, 3.3, 3.3), amplitude=100.0)
    moving += gaussian_blob(shape, (6.2, 20.6, 15.5), (1.6, 2.2, 2.2), amplitude=60.0)

    seed = estimate_registration(fixed, moving, RegistrationSettings(method="pcc"))
    refined = estimate_registration(
        fixed,
        moving,
        RegistrationSettings(
            method="pcc+refine", refine_iterations=60, learning_rate=0.02, loss="ncc"
        ),
    )
    warped_seed = np.asarray(affine_apply(moving, seed.matrix, seed.offset))
    warped_ref = np.asarray(affine_apply(moving, refined.matrix, refined.offset))
    loss_seed = float(ncc_loss(warped_seed, fixed))
    loss_ref = float(ncc_loss(warped_ref, fixed))
    assert loss_ref < loss_seed, (loss_seed, loss_ref)
    assert np.isfinite(refined.final_loss)


def test_refine_divergence_falls_back_to_seed(rng):
    """Weakly-structured data (rolled noise: similarity basin ~1 px)
    must not let the affine refinement wander; the guard keeps the PCC
    translation when refinement worsens the loss."""
    import numpy as np

    from shrimpy_tpu.config.schemas import RegistrationSettings

    base = (rng.random((16, 64, 64), dtype=np.float32) * 100).astype(np.float32)
    mov = np.roll(base, (1, 3, -2), (0, 1, 2))
    res = estimate_registration(base, mov, RegistrationSettings())
    np.testing.assert_allclose(res.offset, [1.0, 3.0, -2.0], atol=0.2)
    # Either refinement held the basin or the guard restored identity.
    np.testing.assert_allclose(np.diag(res.matrix), 1.0, atol=0.05)


def test_refine_not_biased_by_border_zeros():
    """Content filling the FOV (the label-free case): refinement must
    not shrink the map toward the volume interior. The warp renders
    out-of-support samples as 0; scoring those zeros against real fixed
    content used to reward inward-pulling transforms (~9% scale error
    from a near-exact PCC seed) while the loss genuinely decreased —
    the loss now masks out-of-support voxels."""
    from scipy.ndimage import shift as nd_shift

    z, y, x = np.meshgrid(
        np.arange(16) / 4.0, np.arange(32) / 5.0, np.arange(32) / 6.0,
        indexing="ij",
    )
    # Smooth, border-filling scene (no compact support).
    fixed = (
        100.0 * (np.sin(z + 0.3) * np.cos(y) + np.cos(x + z))
    ).astype(np.float32) + 200.0
    moving = nd_shift(
        fixed, (-2.0, 3.0, -1.0), order=1, mode="grid-constant"
    ).astype(np.float32)
    # Truth: affine_apply(moving, I, offset=(-2, 3, -1)) ~ fixed.
    res = estimate_registration(
        fixed, moving,
        RegistrationSettings(
            method="pcc+refine", refine_iterations=150,
            learning_rate=0.05, loss="mse", downsample_yx=1,
        ),
    )
    np.testing.assert_allclose(np.diag(res.matrix), 1.0, atol=0.02)
    np.testing.assert_allclose(res.offset, [-2.0, 3.0, -1.0], atol=0.3)


def test_translation_fast_path_matches_scipy(rng):
    """The gather-free translation warp (identity matrix) matches the
    scipy oracle at subpixel shifts, including boundary zeroing."""
    import numpy as np

    vol = rng.random((8, 24, 32), dtype=np.float32) * 100
    for offset in ([2.0, -3.0, 4.0], [0.5, -1.25, 2.75], [-7.9, 10.2, -30.0]):
        ours = np.asarray(affine_apply(vol, np.eye(3, dtype=np.float32), offset))
        ref = affine_apply_reference_scipy(
            vol, np.eye(3), np.asarray(offset, np.float64)
        )
        np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-4)


def test_triangular_fast_path_matches_scipy_exactly(rng):
    """A triangular inverse map applies through sequential 1-D shear
    passes (masked rolls) and equals joint trilinear (the scipy
    oracle) to machine precision — the exact gather-free path the
    pcc+refine default parameterization rides."""
    from shrimpy_tpu.ops.register import triangular_kind

    vol = rng.random((12, 24, 20), dtype=np.float32) * 50.0
    lower = np.array(
        [[1.003, 0.0, 0.0],
         [0.004, 0.998, 0.0],
         [-0.002, 0.006, 1.002]], np.float32
    )
    upper = np.ascontiguousarray(lower.T)
    for matrix in (lower, upper, np.diag([1.01, 0.99, 1.0]).astype(np.float32)):
        assert triangular_kind(matrix) is not None
        for offset in ([0.0, 0.0, 0.0], [2.3, -1.7, 0.4]):
            ours = np.asarray(affine_apply(vol, matrix, offset))
            oracle = affine_apply_reference_scipy(
                vol, matrix, np.asarray(offset, np.float64)
            )
            err = np.abs(ours - oracle).max()
            assert err <= 1e-4, (matrix.tolist(), offset, err)


def test_triangular_fast_path_output_shape(rng):
    """Grow/shrink output extents stay exact (the work grid covers
    max(in, out) per axis before cropping)."""
    vol = rng.random((10, 16, 14), dtype=np.float32) * 10.0
    matrix = np.array(
        [[1.01, 0.0, 0.0], [0.01, 0.99, 0.0], [0.0, -0.02, 1.0]], np.float32
    )
    offset = np.array([1.2, -0.7, 2.4], np.float32)
    for out_shape in [(14, 20, 18), (6, 10, 8), (10, 16, 14)]:
        ours = np.asarray(affine_apply(vol, matrix, offset, out_shape))
        oracle = affine_apply_reference_scipy(vol, matrix, offset, out_shape)
        assert np.abs(ours - oracle).max() <= 1e-4


def test_translation_fast_path_shrink_output(rng):
    """Regression: a smaller output with a positive offset must still
    read source voxels beyond the output extent (the round-2 path
    cropped the input first and zeroed them)."""
    vol = rng.random((20, 30, 40), dtype=np.float32) * 10
    offset = np.array([4.3, 2.1, -1.7], np.float32)
    out_shape = (12, 20, 30)
    ours = np.asarray(affine_apply(vol, np.eye(3, dtype=np.float32), offset, out_shape))
    ref = affine_apply_reference_scipy(vol, np.eye(3), offset, out_shape)
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-4)


def test_refine_triangular_parameterization_stays_triangular():
    """The default pcc+refine parameterization produces an EXACTLY
    triangular matrix (upper entries identically zero), so apply-time
    dispatch stays on the gather-free shear path."""
    from shrimpy_tpu.ops.register import triangular_kind

    fixed = _scene((8.0, 16.0, 18.0))
    shape = (16, 32, 32)
    moving = gaussian_blob(shape, (9.5, 14.0, 21.0), (2.2, 3.3, 3.3), amplitude=100.0)
    moving += gaussian_blob(shape, (6.2, 20.6, 15.5), (1.6, 2.2, 2.2), amplitude=60.0)
    res = estimate_registration(
        fixed, moving,
        RegistrationSettings(method="pcc+refine", refine_iterations=40),
    )
    assert triangular_kind(res.matrix) is not None
    warped = np.asarray(affine_apply(moving, res.matrix, res.offset))
    assert float(ncc_loss(warped, fixed)) < 0.2
