"""Normalized cross-correlation template matching under jit.

TPU-native re-implementation of the reference's archived
``template_matching`` tracking method (reference
``shrimpy/mantis/archive/pycromanager/autotracker.py:162-184``), which
runs ``skimage.feature.match_template`` (valid-mode normalized
cross-correlation) of a reference-sliced template against the moving
volume, takes the NCC peak, and reports ``peak - template_start`` as
the shift.

The NCC surface is computed the classic Lewis way:

* numerator: valid-mode cross-correlation of the moving volume with the
  zero-mean template — one forward/inverse transform pair (MXU
  matmul-DFT on TPU, ``jnp.fft`` elsewhere; XLA TPU FFT is ~14x off
  roofline, see ops/dft.py);
* denominator: per-window variance of the moving volume from windowed
  sums of ``M`` and ``M**2`` (cumulative-sum integral images — exact
  strided slices, no gathers), times the template's sum of squared
  deviations;
* windows with no variance (flat patches) get NCC 0, matching
  skimage's masked division.

Everything is one jit program per (moving shape, template shape).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from shrimpy_tpu.ops.dft import default_transform as dft_default_transform
from shrimpy_tpu.ops.dft import irdft2 as dft_irdft2
from shrimpy_tpu.ops.dft import irdft3 as dft_irdft3
from shrimpy_tpu.ops.dft import rdft2 as dft_rdft2
from shrimpy_tpu.ops.dft import rdft3 as dft_rdft3
from shrimpy_tpu.utils.fft import fast_fft_shape


def _window_sums(x: jax.Array, win: tuple[int, ...]) -> jax.Array:
    """Valid-mode windowed sums via per-axis integral images.

    Output shape ``x.shape - win + 1``; axis k uses a cumulative sum
    with a prepended zero so ``sum[i] = c[i+w] - c[i]``.
    """
    out = x
    for ax, w in enumerate(win):
        c = jnp.cumsum(out, axis=ax)
        zero = jnp.zeros_like(jax.lax.slice_in_dim(c, 0, 1, axis=ax))
        c = jnp.concatenate([zero, c], axis=ax)
        n = out.shape[ax]
        hi = jax.lax.slice_in_dim(c, w, n + 1, axis=ax)
        lo = jax.lax.slice_in_dim(c, 0, n + 1 - w, axis=ax)
        out = hi - lo
    return out


@partial(jax.jit, static_argnames=("fft_shape", "transform"))
def _ncc_surface_jit(
    mov: jax.Array,
    tmpl: jax.Array,
    fft_shape: tuple[int, ...],
    transform: str,
) -> jax.Array:
    mov = mov.astype(jnp.float32)
    tmpl = tmpl.astype(jnp.float32)
    n = float(np.prod(tmpl.shape))
    tz = tmpl - jnp.mean(tmpl)
    ssd_t = jnp.sum(tz * tz)

    # Valid-mode correlation sum_j M[i+j] * Tz[j] via circular
    # correlation on the 5-smooth grid; with fft_shape >= mov shape the
    # first (m - t + 1) samples per axis are the linear valid region.
    pad_m = [(0, s - ms) for s, ms in zip(fft_shape, mov.shape)]
    pad_t = [(0, s - ts) for s, ts in zip(fft_shape, tmpl.shape)]
    mov_p = jnp.pad(mov, pad_m)
    tz_p = jnp.pad(tz, pad_t)
    if transform == "matmul" and mov.ndim in (2, 3):
        fwd = dft_rdft3 if mov.ndim == 3 else dft_rdft2
        inv = dft_irdft3 if mov.ndim == 3 else dft_irdft2
        corr = inv(fwd(mov_p) * jnp.conj(fwd(tz_p)), fft_shape[-1])
    else:
        corr = jnp.fft.irfftn(
            jnp.fft.rfftn(mov_p) * jnp.conj(jnp.fft.rfftn(tz_p)), s=fft_shape
        )
    valid = tuple(ms - ts + 1 for ms, ts in zip(mov.shape, tmpl.shape))
    num = jax.lax.slice(corr, (0,) * corr.ndim, valid)

    # Per-window variance of the moving volume (integral images).
    s1 = _window_sums(mov, tmpl.shape)
    s2 = _window_sums(mov * mov, tmpl.shape)
    var = s2 - s1 * s1 / n
    denom2 = jnp.maximum(var, 0.0) * ssd_t
    # Flat windows (or a flat template) carry no signal: NCC := 0 there,
    # matching skimage's eps-masked division.
    safe = denom2 > jnp.asarray(np.sqrt(np.finfo(np.float32).eps), jnp.float32)
    return jnp.where(safe, num / jnp.sqrt(jnp.where(safe, denom2, 1.0)), 0.0)


def match_template(mov, tmpl, *, transform: str = "auto") -> np.ndarray:
    """Valid-mode NCC surface of ``tmpl`` over ``mov``.

    Shape ``mov.shape - tmpl.shape + 1``; values in [-1, 1] up to
    float32 roundoff (``skimage.feature.match_template`` semantics,
    reference ``autotracker.py:177``).
    """
    mov = jnp.asarray(mov)
    tmpl = jnp.asarray(tmpl)
    assert mov.ndim == tmpl.ndim
    if any(t > m for t, m in zip(tmpl.shape, mov.shape)):
        raise ValueError(
            f"template {tmpl.shape} does not fit moving volume {mov.shape}"
        )
    if transform == "auto":
        transform = dft_default_transform()
    fft_shape = fast_fft_shape(mov.shape, 1.0)
    return np.asarray(_ncc_surface_jit(mov, tmpl, fft_shape, transform))


def template_match_shift(
    ref,
    mov,
    slice_zyx: tuple[tuple[int, int], ...],
    *,
    transform: str = "auto",
) -> np.ndarray:
    """Shift of ``mov`` relative to ``ref`` from a template NCC peak.

    ``slice_zyx`` gives per-axis ``(start, stop)`` of the template
    region inside the REFERENCE stack. The template is matched against
    the moving volume and the shift is ``peak - start`` per axis
    (reference ``autotracker.py:162-184``): positive means the imaged
    object moved in the positive axis direction — the same convention
    as :func:`shrimpy_tpu.ops.pcc.phase_cross_correlation`.
    """
    ref = np.asarray(ref)
    starts = []
    sel = []
    for ax, (start, stop) in enumerate(slice_zyx):
        if not 0 <= start < stop <= ref.shape[ax]:
            raise ValueError(
                f"template slice {slice_zyx[ax]} out of bounds for axis "
                f"{ax} of size {ref.shape[ax]}"
            )
        starts.append(start)
        sel.append(slice(start, stop))
    surface = match_template(mov, ref[tuple(sel)], transform=transform)
    peak = np.unravel_index(int(np.argmax(surface)), surface.shape)
    return np.asarray(peak, dtype=np.float64) - np.asarray(starts, dtype=np.float64)
