"""3-D phase reconstruction: weak-object transfer function + Tikhonov inverse.

First-party TPU replacement for the reference's delegation to
``waveorder.models.phase_thick_3d`` (reference
``shrimpy/dynatrack/preprocessing.py:188-218`` computes the transfer
function once on CPU, caches it, and moves it to the device;
``preprocessing.py:296-317`` applies the Tikhonov inverse per volume).
The same split is kept here: the transfer function is computed host-side
in float64 (cached per shape+settings), and the per-volume inverse is a
single jit-compiled FFT program on TPU.

Physics
-------
Partially-coherent brightfield (thick weak object, first Born): with a
circular incoherent source of NA ``numerical_aperture_illumination`` and
a circular detection pupil of NA ``numerical_aperture_detection``, the
defocus stack of a weak phase object phi(r) satisfies, in 3-D Fourier
space::

    I(nu) ~ B delta(nu) + H_im(nu) * Phi(nu)

with the phase WOTF built from source-weighted pupil correlations
(Streibl 1985, the same model waveorder implements)::

    C_z(f)  = corr( S P G_z,  P G_z )          (per defocus z)
    H_im(nu) = i * ( C(nu) - conj(C(-nu)) ) / sum(S)

where ``G_z = exp(i 2 pi eta z)`` is the angular-spectrum defocus kernel
with ``eta = sqrt((n/lambda)^2 - |f|^2)``. ``H_im`` is Hermitian, so a
real phase object produces a real intensity stack.

Reconstruction (``apply_inverse``) is the single-sided Tikhonov
deconvolution the reference uses (``reconstruction_algorithm:
"Tikhonov"``, ``regularization_strength`` — ``dynatrack_demo.yaml``
phase block)::

    phi = Re IFFT[ conj(H_im) F(I - mean I) / (|H_im|^2 + reg) ]
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

from shrimpy_tpu.config.schemas import (
    PhaseApplyInverseSettings,
    PhaseSettings,
    PhaseTransferFunctionSettings,
)
from shrimpy_tpu.ops.dft import default_transform as dft_default_transform
from shrimpy_tpu.ops.dft import irdft3 as dft_irdft3
from shrimpy_tpu.ops.dft import rdft3 as dft_rdft3


def _settings_key(s: PhaseTransferFunctionSettings) -> tuple:
    return (
        s.wavelength_illumination,
        s.index_of_refraction_media,
        s.numerical_aperture_detection,
        s.numerical_aperture_illumination,
        s.z_padding,
        s.invert_phase_contrast,
        s.yx_pixel_size,
        s.z_pixel_size,
    )


@lru_cache(maxsize=8)
def _compute_tf_cached(zyx_shape: tuple[int, int, int], key: tuple) -> np.ndarray:
    (
        wavelength,
        n_media,
        na_det,
        na_ill,
        z_padding,
        invert,
        yx_px,
        z_px,
    ) = key
    if yx_px is None or z_px is None:
        raise ValueError(
            "phase transfer function requires yx_pixel_size and z_pixel_size "
            "(normally injected from dataset metadata — see "
            "inject_derived_parameters)"
        )
    nz, ny, nx = zyx_shape
    nzp = nz + 2 * z_padding

    # Transverse frequency grid (cycles / um).
    fy = np.fft.fftfreq(ny, d=yx_px)
    fx = np.fft.fftfreq(nx, d=yx_px)
    f2 = fy[:, None] ** 2 + fx[None, :] ** 2
    f = np.sqrt(f2)

    k_media = n_media / wavelength  # cycles / um in the medium
    source = (f <= na_ill / wavelength).astype(np.float64)
    pupil = (f <= na_det / wavelength).astype(np.float64)
    # Angular-spectrum axial frequency; evanescent components excluded.
    eta = np.sqrt(np.maximum(k_media**2 - f2, 0.0))
    propagating = (f2 < k_media**2).astype(np.float64)
    pupil = pupil * propagating

    # Defocus coordinates in FFT (origin-at-0) order so the 3-D TF has no
    # linear phase ramp.
    z = np.fft.fftfreq(nzp, d=1.0 / (nzp * z_px))

    # Per-defocus pupil correlations via FFT (each slice two 2-D FFTs).
    g = np.exp(2j * np.pi * eta[None, :, :] * z[:, None, None])  # (nzp, ny, nx)
    a = source[None] * pupil[None] * g
    b = pupil[None] * g
    fa = np.fft.fft2(a, axes=(-2, -1))
    fb = np.fft.fft2(b, axes=(-2, -1))
    corr = np.fft.ifft2(fa * np.conj(fb), axes=(-2, -1))  # C_z(f)

    c3 = np.fft.fft(corr, axis=0)  # C(nu_z, nu_y, nu_x)
    # conj(C(-nu)) on the periodic grid: reverse each axis about index 0.
    c3_mirror = np.conj(
        np.roll(c3[::-1, ::-1, ::-1], shift=(1, 1, 1), axis=(0, 1, 2))
    )
    h_im = 1j * (c3 - c3_mirror)

    denom = source.sum()
    if denom == 0:
        raise ValueError("empty illumination source: check NA / pixel size")
    h_im = h_im / denom
    if invert:
        h_im = -h_im
    return h_im.astype(np.complex64)


def compute_transfer_function(
    zyx_shape: tuple[int, int, int], settings: PhaseTransferFunctionSettings
) -> np.ndarray:
    """Phase WOTF ``H_im`` for a (Z, Y, X) stack, padded by ``z_padding``.

    Returned shape is ``(nz + 2 * z_padding, ny, nx)`` complex64, FFT
    (origin-at-0) frequency ordering on every axis. Host-side fp64
    computation, cached per (shape, settings) — the counterpart of the
    reference's cached ``calculate_transfer_function``
    (``preprocessing.py:188-218``).
    """
    return _compute_tf_cached(tuple(zyx_shape), _settings_key(settings))


def tf_as_real(tf: np.ndarray) -> np.ndarray:
    """Complex TF -> stacked (2, Z, Y, X) float32 (re, im).

    Host->device transfers of complex arrays are unsupported on some
    TPU transports; the TF crosses as reals and is recombined on device.
    """
    tf = np.asarray(tf)
    return np.stack([tf.real, tf.imag]).astype(np.float32)


# z_padding changes shapes (static); reg is a traced scalar so sweeping
# the regularization does NOT recompile the whole 3-D FFT program.
@partial(jax.jit, static_argnames=("z_padding", "transform"))
def _apply_inverse_jit(
    stack, tf_ri, z_padding: int, reg: float, transform: str = "xla"
):
    stack = stack.astype(jnp.float32)
    tf = tf_ri[0] + 1j * tf_ri[1]  # recombined on device (see tf_as_real)
    if z_padding:
        stack = jnp.pad(stack, ((z_padding, z_padding), (0, 0), (0, 0)), mode="reflect")
    # Remove the DC background (the delta term of the weak-object model).
    stack = stack - jnp.mean(stack)
    if transform == "matmul":
        # MXU matmul-DFT on the x half-spectrum (ops/dft.py). The WOTF
        # transfer function of a real optical system is exactly
        # Hermitian (tf[-k] == conj(tf[k]), verified in tests), so the
        # filtered spectrum keeps the symmetry and the half-spectrum
        # inverse equals real(ifftn(...)) on the full spectrum.
        gx = stack.shape[-1]
        spectrum = dft_rdft3(stack)
        tfh = tf[..., : gx // 2 + 1]
        recon = jnp.conj(tfh) * spectrum / (jnp.abs(tfh) ** 2 + reg)
        phi = dft_irdft3(recon, gx)
    else:
        spectrum = jnp.fft.fftn(stack)
        recon = jnp.conj(tf) * spectrum / (jnp.abs(tf) ** 2 + reg)
        phi = jnp.real(jnp.fft.ifftn(recon))
    if z_padding:
        phi = phi[z_padding:-z_padding]
    return phi


def _resolve_transform(settings: PhaseApplyInverseSettings) -> str:
    """Platform-resolve the apply-inverse transform knob."""
    t = settings.transform
    return dft_default_transform() if t == "auto" else t


def apply_inverse_transfer_function(
    stack_zyx,
    tf: np.ndarray | jnp.ndarray,
    settings: PhaseApplyInverseSettings | None = None,
    *,
    z_padding: int = 0,
) -> jnp.ndarray:
    """Tikhonov phase reconstruction of a brightfield defocus stack.

    ``tf`` is the output of :func:`compute_transfer_function` for
    ``stack.shape`` (+ padding). Counterpart of the reference's
    ``apply_inverse_transfer_function`` call (``preprocessing.py:296-317``).
    """
    settings = settings or PhaseApplyInverseSettings()
    return _apply_inverse_jit(
        jnp.asarray(stack_zyx),
        jnp.asarray(tf_as_real(np.asarray(tf))),
        z_padding,
        settings.regularization_strength,
        _resolve_transform(settings),
    )


def reconstruct_phase(stack_zyx, settings: PhaseSettings) -> jnp.ndarray:
    """One-call phase reconstruction: compute/cache TF, apply inverse."""
    tf_settings = settings.transfer_function
    zyx_shape = tuple(np.asarray(stack_zyx).shape)
    tf = compute_transfer_function(zyx_shape, tf_settings)
    return apply_inverse_transfer_function(
        stack_zyx,
        tf,
        settings.apply_inverse,
        z_padding=tf_settings.z_padding,
    )


def simulate_defocus_stack(
    phi_zyx: np.ndarray,
    tf: np.ndarray,
    *,
    background: float = 1.0,
    z_padding: int = 0,
) -> np.ndarray:
    """Forward model: weak phase object -> brightfield defocus stack.

    ``I = background + Re IFFT[ H_im * FFT(phi) ]``. Used by tests to
    validate the inverse end-to-end (fp64, host-side).
    """
    phi = np.asarray(phi_zyx, dtype=np.float64)
    if z_padding:
        phi = np.pad(phi, ((z_padding, z_padding), (0, 0), (0, 0)), mode="constant")
    spectrum = np.fft.fftn(phi)
    intensity = background + np.real(np.fft.ifftn(tf.astype(np.complex128) * spectrum))
    if z_padding:
        intensity = intensity[z_padding:-z_padding]
    return intensity.astype(np.float32)
