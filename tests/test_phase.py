"""Phase reconstruction: transfer-function properties + inverse recovery.

Strategy (SURVEY.md §4 tier 1): the WOTF must satisfy its structural
physics (Hermitian symmetry -> real intensity; zero DC response; odd
axial character of phase contrast), and the Tikhonov inverse must
recover a simulated weak phase object where the TF has support.
"""

import numpy as np
import pytest

from shrimpy_tpu.config import (
    PhaseApplyInverseSettings,
    PhaseSettings,
    PhaseTransferFunctionSettings,
)
from shrimpy_tpu.io.synthetic import gaussian_blob
from shrimpy_tpu.ops.phase import (
    apply_inverse_transfer_function,
    compute_transfer_function,
    reconstruct_phase,
    simulate_defocus_stack,
)

TF_SETTINGS = PhaseTransferFunctionSettings(
    wavelength_illumination=0.450,
    index_of_refraction_media=1.4,
    numerical_aperture_detection=1.35,
    numerical_aperture_illumination=0.52,
    yx_pixel_size=0.116,
    z_pixel_size=0.2,
    z_padding=0,
)


def test_tf_requires_injected_pixel_sizes():
    s = PhaseTransferFunctionSettings()  # pixel sizes not injected
    with pytest.raises(ValueError, match="yx_pixel_size"):
        compute_transfer_function((8, 16, 16), s)


def test_tf_hermitian_and_dc_free():
    tf = compute_transfer_function((12, 24, 24), TF_SETTINGS)
    assert tf.shape == (12, 24, 24)
    # Hermitian: H(-nu) == conj(H(nu)) -> real-valued intensity.
    mirror = np.conj(np.roll(tf[::-1, ::-1, ::-1], (1, 1, 1), axis=(0, 1, 2)))
    np.testing.assert_allclose(tf, mirror, atol=1e-5)
    # A weak phase object produces no DC contrast.
    assert abs(tf[0, 0, 0]) < 1e-6
    # Non-trivial support.
    assert np.abs(tf).max() > 1e-3


def test_forward_stack_is_real_contrast():
    rng = np.random.default_rng(0)
    phi = rng.normal(size=(12, 24, 24))
    tf = compute_transfer_function((12, 24, 24), TF_SETTINGS)
    stack = simulate_defocus_stack(phi, tf, background=1.0)
    assert np.isfinite(stack).all()
    # contrast is real and modulates around the background
    assert stack.std() > 0
    assert abs(stack.mean() - 1.0) < 1e-3


def test_inverse_recovers_simulated_phase_object():
    shape = (16, 32, 32)
    phi = gaussian_blob(shape, (8.0, 16.0, 16.0), (2.0, 4.0, 4.0), amplitude=0.1)
    phi -= phi.mean()
    tf = compute_transfer_function(shape, TF_SETTINGS)
    stack = simulate_defocus_stack(phi, tf, background=1.0)

    recon = np.asarray(
        apply_inverse_transfer_function(
            stack, tf, PhaseApplyInverseSettings(regularization_strength=1e-4)
        )
    )
    # Recovery where the TF has support: high correlation with the truth.
    corr = np.corrcoef(recon.ravel(), phi.ravel())[0, 1]
    assert corr > 0.8, f"correlation {corr:.3f}"


def test_invert_phase_contrast_flips_sign():
    shape = (12, 24, 24)
    phi = gaussian_blob(shape, (6.0, 12.0, 12.0), (2.0, 3.0, 3.0), amplitude=0.05)
    phi -= phi.mean()
    tf = compute_transfer_function(shape, TF_SETTINGS)
    stack = simulate_defocus_stack(phi, tf)

    settings = PhaseApplyInverseSettings(regularization_strength=1e-4)
    plain = np.asarray(apply_inverse_transfer_function(stack, tf, settings))
    inv_tf = compute_transfer_function(
        shape, TF_SETTINGS.model_copy(update={"invert_phase_contrast": True})
    )
    flipped = np.asarray(apply_inverse_transfer_function(stack, inv_tf, settings))
    np.testing.assert_allclose(flipped, -plain, atol=1e-5)


def test_reconstruct_phase_with_z_padding():
    shape = (10, 24, 24)
    settings = PhaseSettings(
        transfer_function=TF_SETTINGS.model_copy(update={"z_padding": 4}).model_dump(),
        apply_inverse={"regularization_strength": 1e-3},
    )
    rng = np.random.default_rng(1)
    stack = 1.0 + 0.01 * rng.normal(size=shape).astype(np.float32)
    out = np.asarray(reconstruct_phase(stack, settings))
    assert out.shape == shape
    assert np.isfinite(out).all()


def test_matmul_transform_matches_xla(rng):
    """The matmul-DFT phase apply (auto default) is the same Tikhonov
    inverse as the XLA-FFT path — exact up to f32 op order. Covers an
    odd (non-5-smooth) x length and z padding, since phase grids come
    straight from data shapes."""
    for shape, zpad in [((12, 28, 30), 0), ((10, 24, 25), 3)]:
        phi = gaussian_blob(
            shape,
            tuple(s / 2.0 for s in shape),
            (2.0, 3.0, 3.0),
            amplitude=0.05,
        )
        phi -= phi.mean()
        tf_settings = TF_SETTINGS.model_copy(update={"z_padding": zpad})
        tf = compute_transfer_function(shape, tf_settings)
        stack = simulate_defocus_stack(phi, compute_transfer_function(shape, TF_SETTINGS))
        xla = np.asarray(apply_inverse_transfer_function(
            stack, tf,
            PhaseApplyInverseSettings(
                regularization_strength=1e-3, transform="xla"
            ),
            z_padding=zpad,
        ))
        mm = np.asarray(apply_inverse_transfer_function(
            stack, tf,
            PhaseApplyInverseSettings(
                regularization_strength=1e-3, transform="matmul"
            ),
            z_padding=zpad,
        ))
        rel = np.abs(mm - xla).max() / max(np.abs(xla).max(), 1e-12)
        assert rel <= 1e-4, f"{shape} zpad={zpad}: rel {rel:.2e}"


def test_na_validation():
    with pytest.raises(ValueError):
        PhaseTransferFunctionSettings(
            numerical_aperture_detection=1.5, index_of_refraction_media=1.33
        )
