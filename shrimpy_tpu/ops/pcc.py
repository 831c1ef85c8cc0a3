"""FFT phase cross-correlation (PCC) under jit.

Re-implements the reference's shift estimator
(``shrimpy/dynatrack/tracking.py:309-378``) with matching FFT-grid and
peak conventions, and ONE deliberate divergence in padding:

* operands cast to float32; FFT shape per axis =
  5-smooth ``next_fast_len(max(ref, mov) * maximum_shift)``
  (``tracking.py:336-339``);
* operands are mean-subtracted and ZERO-padded (mode='constant') to
  that shape — the reference reflect-pads (``tracking.py:349-350``).
  Reflect padding plants mirror copies of the scene in the enlarged
  search grid, creating spurious correlation peaks when
  ``maximum_shift > 1``; zero padding keeps the correlation linear.
  Integer-shift results can therefore differ from the reference on
  boundary-heavy scenes with ``maximum_shift > 1`` (see PARITY.md);
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

from shrimpy_tpu.ops.dft import cdft as dft_cdft
from shrimpy_tpu.ops.dft import default_transform as dft_default_transform
from shrimpy_tpu.ops.dft import irdft2 as dft_irdft2
from shrimpy_tpu.ops.dft import irdft3 as dft_irdft3
from shrimpy_tpu.ops.dft import rdft2 as dft_rdft2
from shrimpy_tpu.ops.dft import rdft3 as dft_rdft3
from shrimpy_tpu.utils.fft import fast_fft_shape, match_shape


@partial(jax.jit, static_argnames=("fft_shape", "subpixel", "transform"))
def _pcc_jit(
    ref, mov, fft_shape: tuple[int, ...], subpixel: bool,
    transform: str = "xla",
):
    # Mean-subtract, then zero-pad (or center-crop) to the FFT grid.
    # Zero padding keeps the enlarged-search correlation linear — reflect
    # padding would plant mirror copies of the scene that create spurious
    # correlation peaks when maximum_shift > 1.
    ref = ref.astype(jnp.float32)
    mov = mov.astype(jnp.float32)
    ref = match_shape(ref - jnp.mean(ref), fft_shape, mode="constant")
    mov = match_shape(mov - jnp.mean(mov), fft_shape, mode="constant")

    if transform == "matmul" and ref.ndim in (2, 3):
        # MXU matmul-DFT (ops/dft.py) — exact; the cross-power of two
        # real signals is Hermitian so the half-spectrum carries it.
        fwd = dft_rdft3 if ref.ndim == 3 else dft_rdft2
        inv = dft_irdft3 if ref.ndim == 3 else dft_irdft2
        corr = inv(fwd(ref) * jnp.conj(fwd(mov)), fft_shape[-1])
    else:
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


@partial(
    jax.jit,
    static_argnames=("fft_shape", "factor", "halfwidth", "transform"),
)
def _dft_refine_jit(
    ref, mov, coarse_shift, fft_shape, factor: int, halfwidth: int,
    transform: str = "xla",
):
    """Local matrix-DFT upsampling around the coarse peak.

    The Guizar-Sicairos single-step DFT refinement: evaluate the
    cross-correlation on a ``(2*halfwidth*factor)``-point grid of
    1/factor-pixel spacing centered on the integer shift, via small
    matrix DFT products per axis (no large inverse FFT).
    """
    ref = match_shape(ref.astype(jnp.float32) - jnp.mean(ref), fft_shape, mode="constant")
    mov = match_shape(mov.astype(jnp.float32) - jnp.mean(mov), fft_shape, mode="constant")
    if transform == "matmul" and ref.ndim <= 3:
        # Forward spectra as MXU matmul-DFT einsums (the upsampling
        # matrices below are already matmuls).
        def fftn_m(x):
            y = x.astype(jnp.complex64)
            for ax in range(-x.ndim, 0):
                y = dft_cdft(y, ax)
            return y

        cross = fftn_m(ref) * jnp.conj(fftn_m(mov))
    else:
        cross = jnp.fft.fftn(ref) * jnp.conj(jnp.fft.fftn(mov))

    n_pts = 2 * halfwidth * factor + 1
    # Correlation value at displacement d: sum_k cross[k] exp(-2i pi k.d/N)
    # (cross carries e^{+2i pi k d0/N} for a true shift d0, so the
    # negative kernel peaks at d = +d0 — our sign convention).
    mats = []
    for ax, n in enumerate(fft_shape):
        freqs = jnp.fft.fftfreq(n)  # cycles/sample
        offs = coarse_shift[ax] + (
            jnp.arange(n_pts, dtype=jnp.float32) - halfwidth * factor
        ) / factor
        mats.append(jnp.exp(-2j * jnp.pi * offs[:, None] * freqs[None, :]))

    out = cross
    for ax, m in enumerate(mats):
        out = jnp.tensordot(m, out, axes=([1], [ax]))
        out = jnp.moveaxis(out, 0, ax)
    surface = jnp.abs(out)
    peak = jnp.unravel_index(jnp.argmax(surface), surface.shape)
    deltas = jnp.stack(
        [(p.astype(jnp.float32) - halfwidth * factor) / factor for p in peak]
    )
    return coarse_shift.astype(jnp.float32) + deltas


def phase_cross_correlation(
    ref,
    mov,
    maximum_shift: float = 1.0,
    *,
    upsample: str | None = None,
    upsample_factor: int = 10,
    transform: str = "auto",
) -> np.ndarray:
    """Pixel shift of ``mov`` relative to ``ref`` (axis order preserved).

    Parameters mirror the reference's ``_phase_cross_corr``
    (``tracking.py:309-330``). ``upsample``:

    * None — integer shift (the reference's behavior);
    * ``'parabolic'`` — 3-point parabolic refinement per axis;
    * ``'dft'`` — local matrix-DFT upsampling to ``1/upsample_factor``
      px (Guizar-Sicairos), the registration-grade estimator.

    ``transform``: "matmul" (the "auto" resolution on TPU, for 2-D/3-D
    inputs) runs the correlation transforms as MXU matmul-DFT einsums
    (ops/dft.py); "xla" keeps jnp.fft ("auto" elsewhere).
    """
    ref = jnp.asarray(ref)
    mov = jnp.asarray(mov)
    assert ref.ndim == mov.ndim
    fft_shape = fast_fft_shape(
        tuple(max(a, b) for a, b in zip(ref.shape, mov.shape)), maximum_shift
    )
    if transform == "auto":
        transform = dft_default_transform()
    shift = _pcc_jit(ref, mov, fft_shape, upsample == "parabolic", transform)
    if upsample == "dft":
        shift = _dft_refine_jit(
            ref, mov, jnp.asarray(shift), fft_shape, int(upsample_factor), 1,
            transform,
        )
    return np.asarray(shift)
