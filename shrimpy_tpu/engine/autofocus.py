"""Autofocus: demo-PFS simulation + focus-metric computation.

Two pieces of the reference's autofocus surface:

* :class:`DemoAutofocus` — the simulated PFS with configurable success
  rate and deterministic failure indices (reference
  ``mantis_engine.py:348-386``; failures raise SkipEvent upstream).
* :func:`focus_from_transverse_band` — in-focus slice selection by
  midband spatial-frequency power, the metric the archived O3
  remote-refocus uses via waveorder (reference archive
  ``acq_engine.py:1094-1113``: NA_det=1.35, lambda=0.55 um, midband
  fractions over the transverse OTF support). First-party jit
  implementation.
"""

from __future__ import annotations

import logging
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from shrimpy_tpu.engine.plan import AutofocusPlan

logger = logging.getLogger(__name__)


class DemoAutofocus:
    """Simulated PFS: deterministic failures + seeded random success."""

    def __init__(self, plan: AutofocusPlan, n_positions: int):
        self.plan = plan
        self.n_positions = n_positions
        self._rng = np.random.default_rng(plan.seed)

    def engage(self, t: int, p_index: int) -> bool:
        """True when focus locks; False on failure (caller skips/pads)."""
        if not self.plan.enabled:
            return True
        flat = t * self.n_positions + p_index
        if self.plan.fail_at_indices is not None and flat in self.plan.fail_at_indices:
            logger.warning("autofocus: deterministic failure at t=%d p=%d", t, p_index)
            return False
        if self._rng.random() > self.plan.success_rate:
            logger.warning("autofocus: simulated failure at t=%d p=%d", t, p_index)
            return False
        return True


@partial(jax.jit, static_argnames=("band", "transform"))
def _focus_metric_jit(
    stack, pixel_size_um, lambda_um, na_det, band, transform: str = "xla"
):
    """Midband transverse-frequency power per z-slice."""
    stack = stack.astype(jnp.float32)
    nz, ny, nx = stack.shape
    fy = jnp.fft.fftfreq(ny, d=pixel_size_um)
    cutoff = 2.0 * na_det / lambda_um  # incoherent transverse cutoff
    lo, hi = band
    centered = stack - jnp.mean(stack, axis=(1, 2), keepdims=True)
    if transform == "matmul":
        # MXU matmul-DFT on the x half-spectrum (ops/dft.py): the
        # input is real, so |F[-k]| == |F[k]| and the midband power is
        # the half-spectrum sum with interior x bins double-weighted
        # (the mask depends only on |f|, which is mirror-symmetric).
        from shrimpy_tpu.ops.dft import rdft2

        nxr = nx // 2 + 1
        fx = jnp.fft.rfftfreq(nx, d=pixel_size_um)
        f = jnp.sqrt(fy[:, None] ** 2 + fx[None, :] ** 2)
        mask = (f >= lo * cutoff) & (f <= hi * cutoff)
        cx = np.full(nxr, 2.0, np.float32)
        cx[0] = 1.0
        if nx % 2 == 0:
            cx[-1] = 1.0
        power = jnp.abs(rdft2(centered)) ** 2
        return jnp.sum(power * (mask[None] * cx[None, None]), axis=(1, 2))
    # rfft2 + interior-bin double-weighting (same algebra as the matmul
    # branch): the input is real and the mask mirror-symmetric, so the
    # full complex fft2 did 2x the transform work for the same sums.
    nxr = nx // 2 + 1
    fx = jnp.fft.rfftfreq(nx, d=pixel_size_um)
    f = jnp.sqrt(fy[:, None] ** 2 + fx[None, :] ** 2)
    mask = (f >= lo * cutoff) & (f <= hi * cutoff)
    cx = np.full(nxr, 2.0, np.float32)
    cx[0] = 1.0
    if nx % 2 == 0:
        cx[-1] = 1.0
    power = jnp.abs(jnp.fft.rfft2(centered)) ** 2
    return jnp.sum(power * (mask[None] * cx[None, None]), axis=(1, 2))


def focus_from_transverse_band(
    stack_zyx,
    *,
    pixel_size_um: float,
    wavelength_um: float = 0.55,
    na_det: float = 1.35,
    band: tuple[float, float] = (0.125, 0.25),
    threshold: float = 0.0,
    transform: str = "auto",
) -> int | None:
    """Index of the in-focus slice: argmax of midband spectral power.

    Returns None when the peak is not prominent (max power below
    ``threshold`` times the median) — the caller extends the scan range,
    as the archived O3 ladder does (``acq_engine.py:1136-1149``).

    ``transform``: "matmul" (the "auto" resolution on TPU) computes the
    spectra as MXU matmul-DFT einsums; "xla" keeps jnp.fft.
    """
    if transform == "auto":
        from shrimpy_tpu.ops.dft import default_transform

        transform = default_transform()
    power = np.asarray(
        _focus_metric_jit(
            jnp.asarray(stack_zyx),
            jnp.float32(pixel_size_um),
            jnp.float32(wavelength_um),
            jnp.float32(na_det),
            band,
            transform,
        )
    )
    idx = int(np.argmax(power))
    if threshold > 0:
        med = float(np.median(power))
        if med <= 0:
            # A zero median with a positive peak is the MOST prominent
            # case (most slices carry no midband power at all), not a
            # failure; only an all-zero stack has no focus.
            return idx if power[idx] > 0 else None
        if power[idx] < threshold * med:
            return None
    return idx
