"""Richardson-Lucy deconvolution with measured PSFs (FFT-based, XLA).

The reference delegates deconvolution to the external biahub library
(reference ``README.md:126-128``; the measured-PSF source pipeline is
``scripts/measure_psf.py:20-288``). Here RL is a first-party TPU
implementation: the multiplicative update runs as a ``jax.lax.scan``
over iterations, with each iteration two rFFT convolutions fused by XLA
into one compiled program (BASELINE.json configs[1]: 20 iterations,
measured PSF).

Algorithm
---------
Classic Richardson-Lucy with a linear-convolution-correct padded grid:

1. the image is padded by the PSF half-width with ``pad_mode``
   (default ``reflect`` — avoids the hard-zero boundary ringing of a
   naive FFT RL) and then up to a 5-smooth FFT-fast shape
   (TPU-lane-friendly on the last axis);
2. the PSF is normalized to unit sum and embedded at the grid origin
   (``ifftshift`` placement) so its OTF applies zero phase at DC;
3. ``est <- est * corr(psf, image / conv(psf, est))`` for ``n``
   iterations, where ``conv``/``corr`` are circular on the padded grid
   (``corr`` = multiplication by ``conj(OTF)``);
4. the result is cropped back to the original extent.

Starting estimate is the (padded) image itself — the standard
microscopy choice; the fixed point does not depend on it.

All internal math is float32 (TPU FFTs run fp32); the fp64 oracle
:func:`richardson_lucy_reference` mirrors the identical update in numpy
for parity tests.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from shrimpy_tpu.config.schemas import DeconvolveSettings
from shrimpy_tpu.utils.fft import next_fast_len, next_fast_len_tpu


def _padded_grid_shape(
    image_shape: tuple[int, ...], psf_shape: tuple[int, ...], tpu_lanes: bool = True
) -> tuple[tuple[int, ...], tuple[tuple[int, int], ...]]:
    """FFT grid shape and per-axis (lo, hi) image padding.

    Pads by the PSF half-width on each side (enough context for the
    boundary condition), then rounds up to a 5-smooth length (last axis
    additionally to a 128-lane multiple when ``tpu_lanes``).
    """
    assert len(image_shape) == len(psf_shape)
    grid = []
    pads = []
    for ax, (n, k) in enumerate(zip(image_shape, psf_shape)):
        half = k // 2
        target = n + 2 * half
        last = ax == len(image_shape) - 1
        fast = next_fast_len_tpu(target) if (tpu_lanes and last) else next_fast_len(target)
        extra = fast - target
        lo = half + extra // 2
        hi = half + extra - extra // 2
        grid.append(fast)
        pads.append((lo, hi))
    return tuple(grid), tuple(pads)


def _embed_psf(psf: jnp.ndarray, grid: tuple[int, ...]) -> jnp.ndarray:
    """Unit-sum PSF embedded at the origin of the FFT grid.

    The PSF center (``shape//2`` voxel, the convention of measured PSFs
    cropped around the bead peak) lands on grid index 0 via roll, so the
    OTF carries no linear phase at DC.
    """
    psf = psf.astype(jnp.float32)
    psf = psf / jnp.sum(psf)
    pad = [(0, g - s) for g, s in zip(grid, psf.shape)]
    embedded = jnp.pad(psf, pad)
    shifts = [-(s // 2) for s in psf.shape]
    return jnp.roll(embedded, shifts, axis=tuple(range(psf.ndim)))


@partial(jax.jit, static_argnames=("iterations", "grid", "pads", "epsilon", "pad_mode"))
def _rl_jit(
    image: jnp.ndarray,
    psf: jnp.ndarray,
    *,
    iterations: int,
    grid: tuple[int, ...],
    pads: tuple[tuple[int, int], ...],
    epsilon: float,
    pad_mode: str,
):
    image = image.astype(jnp.float32)
    padded = jnp.pad(image, pads, mode=pad_mode)
    otf = jnp.fft.rfftn(_embed_psf(psf, grid))

    data = jnp.maximum(padded, 0.0)
    est0 = jnp.maximum(padded, epsilon)

    def step(est, _):
        conv = jnp.fft.irfftn(jnp.fft.rfftn(est) * otf, s=grid)
        ratio = data / jnp.maximum(conv, epsilon)
        corr = jnp.fft.irfftn(jnp.fft.rfftn(ratio) * jnp.conj(otf), s=grid)
        return est * corr, None

    est, _ = jax.lax.scan(step, est0, None, length=iterations)
    crop = tuple(slice(lo, lo + n) for (lo, _), n in zip(pads, image.shape))
    return est[crop]


def richardson_lucy(
    image,
    psf,
    settings: DeconvolveSettings | None = None,
    *,
    iterations: int | None = None,
) -> jnp.ndarray:
    """Richardson-Lucy deconvolution of ``image`` by ``psf`` (same ndim).

    jit-compiled per (image shape, psf shape, settings); returns a
    float32 device array of ``image.shape``.
    """
    settings = settings or DeconvolveSettings()
    iters = iterations if iterations is not None else settings.iterations
    image = jnp.asarray(image)
    psf = jnp.asarray(psf)
    assert image.ndim == psf.ndim, (image.shape, psf.shape)
    grid, pads = _padded_grid_shape(tuple(image.shape), tuple(psf.shape))
    return _rl_jit(
        image,
        psf,
        iterations=iters,
        grid=grid,
        pads=pads,
        epsilon=settings.epsilon,
        pad_mode=settings.pad_mode,
    )


def richardson_lucy_reference(
    image: np.ndarray,
    psf: np.ndarray,
    iterations: int = 20,
    *,
    epsilon: float = 1e-6,
    pad_mode: str = "reflect",
) -> np.ndarray:
    """Trusted fp64 numpy oracle: the identical update rule on the same grid."""
    image = np.asarray(image, dtype=np.float64)
    psf = np.asarray(psf, dtype=np.float64)
    grid, pads = _padded_grid_shape(tuple(image.shape), tuple(psf.shape))

    padded = np.pad(image, pads, mode=pad_mode)
    psf_n = psf / psf.sum()
    embedded = np.zeros(grid, dtype=np.float64)
    embedded[tuple(slice(0, s) for s in psf.shape)] = psf_n
    embedded = np.roll(
        embedded, [-(s // 2) for s in psf.shape], axis=tuple(range(psf.ndim))
    )
    otf = np.fft.rfftn(embedded)

    data = np.maximum(padded, 0.0)
    est = np.maximum(padded, epsilon)
    for _ in range(iterations):
        conv = np.fft.irfftn(np.fft.rfftn(est) * otf, s=grid, axes=tuple(range(len(grid))))
        ratio = data / np.maximum(conv, epsilon)
        est = est * np.fft.irfftn(np.fft.rfftn(ratio) * np.conj(otf), s=grid, axes=tuple(range(len(grid))))

    crop = tuple(slice(lo, lo + n) for (lo, _), n in zip(pads, image.shape))
    return est[crop].astype(np.float32)


def gaussian_psf(
    shape_zyx: tuple[int, int, int], sigma_zyx: tuple[float, float, float]
) -> np.ndarray:
    """Separable Gaussian PSF (unit sum), centered at ``shape//2``.

    Stand-in for a measured PSF in demos/tests; real pipelines load the
    bead-characterized PSF written by :mod:`shrimpy_tpu.psf` (the
    counterpart of reference ``scripts/measure_psf.py``).
    """
    axes = []
    for n, sigma in zip(shape_zyx, sigma_zyx):
        u = np.arange(n, dtype=np.float64) - n // 2
        axes.append(np.exp(-0.5 * (u / sigma) ** 2))
    psf = axes[0][:, None, None] * axes[1][None, :, None] * axes[2][None, None, :]
    return (psf / psf.sum()).astype(np.float32)
