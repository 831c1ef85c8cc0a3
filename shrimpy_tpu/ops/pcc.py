"""FFT phase cross-correlation (PCC) under jit.

Re-implements the reference's shift estimator
(``shrimpy/dynatrack/tracking.py:309-378``) with identical conventions:

* operands cast to float32; FFT shape per axis =
  5-smooth ``next_fast_len(max(ref, mov) * maximum_shift)``
  (``tracking.py:336-339``);
* operands reflect-padded / center-cropped to that shape
  (``tracking.py:349-350``);
* correlation surface ``fftshift(|irfftn(rfftn(ref) * conj(rfftn(mov)))|)``;
* peak-to-shift convention ``shift = shape//2 - argmax`` per axis
  (``tracking.py:373-374``) — positive shift means the moving image is
  displaced in the positive direction relative to the reference.

The whole pipeline is one jit-compiled XLA program per (shape,
maximum_shift): pad -> rFFT -> conj-multiply -> irFFT -> fftshift ->
argmax, all fused on device. An optional parabolic sub-pixel refinement
(not present in the reference, useful for registration) is provided via
``upsample='parabolic'``.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from shrimpy_tpu.utils.fft import fast_fft_shape, match_shape


@partial(jax.jit, static_argnames=("fft_shape", "subpixel"))
def _pcc_jit(ref, mov, fft_shape: tuple[int, ...], subpixel: bool):
    # Mean-subtract, then zero-pad (or center-crop) to the FFT grid.
    # Zero padding keeps the enlarged-search correlation linear — reflect
    # padding would plant mirror copies of the scene that create spurious
    # correlation peaks when maximum_shift > 1.
    ref = ref.astype(jnp.float32)
    mov = mov.astype(jnp.float32)
    ref = match_shape(ref - jnp.mean(ref), fft_shape, mode="constant")
    mov = match_shape(mov - jnp.mean(mov), fft_shape, mode="constant")

    f_ref = jnp.fft.rfftn(ref)
    f_mov = jnp.fft.rfftn(mov)
    corr = jnp.fft.irfftn(f_ref * jnp.conj(f_mov), s=fft_shape)
    corr = jnp.fft.fftshift(jnp.abs(corr))

    flat_peak = jnp.argmax(corr)
    peak = jnp.unravel_index(flat_peak, corr.shape)
    center = jnp.array([s // 2 for s in corr.shape])
    shift = center - jnp.stack(peak)

    if not subpixel:
        return shift.astype(jnp.float32)

    # Parabolic 1-D refinement per axis around the integer peak.
    refined = []
    for ax in range(corr.ndim):
        n = corr.shape[ax]
        p = peak[ax]
        idx_m = jnp.maximum(p - 1, 0)
        idx_p = jnp.minimum(p + 1, n - 1)

        def take(i, ax=ax):
            sel = list(peak)
            sel[ax] = i
            return corr[tuple(sel)]

        cm, c0, cp = take(idx_m), take(p), take(idx_p)
        denom = cm - 2.0 * c0 + cp
        delta = jnp.where(jnp.abs(denom) > 1e-12, 0.5 * (cm - cp) / denom, 0.0)
        delta = jnp.clip(delta, -0.5, 0.5)
        # interior peaks only; at the rim keep the integer estimate
        delta = jnp.where((p > 0) & (p < n - 1), delta, 0.0)
        refined.append(shift[ax].astype(jnp.float32) - delta)
    return jnp.stack(refined)


def phase_cross_correlation(
    ref,
    mov,
    maximum_shift: float = 1.0,
    *,
    upsample: str | None = None,
) -> np.ndarray:
    """Pixel shift of ``mov`` relative to ``ref`` (axis order preserved).

    Parameters mirror the reference's ``_phase_cross_corr``
    (``tracking.py:309-330``). Returns a float numpy vector (integers
    unless ``upsample='parabolic'``).
    """
    ref = jnp.asarray(ref)
    mov = jnp.asarray(mov)
    assert ref.ndim == mov.ndim
    fft_shape = fast_fft_shape(
        tuple(max(a, b) for a, b in zip(ref.shape, mov.shape)), maximum_shift
    )
    shift = _pcc_jit(ref, mov, fft_shape, upsample == "parabolic")
    return np.asarray(shift)
