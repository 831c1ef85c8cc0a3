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
