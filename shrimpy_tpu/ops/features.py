"""Supporting tracking kernels: blur, multi-Otsu, centroids, percentile.

First-party JAX equivalents of the reference's torch kernel library
(reference ``shrimpy/dynatrack/tracking.py:386-649``): separable 3-D
Gaussian blur (``:386-422``), vectorized multi-Otsu thresholding
(``:425-501``), binary masking (``:504-542``), area and intensity
centroids (``:545-649``), and the histogram-based percentile that avoids
materializing a sorted copy of whole volumes (``:572-593``). All are
pure jit-compiled functions over arrays.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# Separable Gaussian blur
# ---------------------------------------------------------------------------


def _gaussian_kernel(sigma: float) -> np.ndarray:
    """1-D unit-sum Gaussian taps, radius = round(4 sigma) (scipy default)."""
    radius = max(1, int(4.0 * sigma + 0.5))
    u = np.arange(-radius, radius + 1, dtype=np.float64)
    k = np.exp(-0.5 * (u / sigma) ** 2)
    return (k / k.sum()).astype(np.float32)


def _conv_along(x: jnp.ndarray, taps: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Edge-mirrored 1-D convolution along ``axis``.

    numpy's 'symmetric' (edge sample repeated) is what scipy.ndimage
    calls mode='reflect' — the blur oracle's boundary condition.
    """
    radius = taps.shape[0] // 2
    moved = jnp.moveaxis(x, axis, -1)
    lead = moved.shape[:-1]
    n = moved.shape[-1]
    flat = moved.reshape(-1, 1, n)
    padded = jnp.pad(flat, ((0, 0), (0, 0), (radius, radius)), mode="symmetric")
    out = jax.lax.conv_general_dilated(
        padded,
        taps.reshape(1, 1, -1),
        window_strides=(1,),
        padding="VALID",
    )
    return jnp.moveaxis(out.reshape(*lead, n), -1, axis)


@partial(jax.jit, static_argnames=("sigma_zyx",))
def _blur_jit(vol, sigma_zyx: tuple[float, float, float]):
    out = vol.astype(jnp.float32)
    for axis, sigma in enumerate(sigma_zyx):
        if sigma > 0:
            out = _conv_along(out, jnp.asarray(_gaussian_kernel(sigma)), axis)
    return out


def gaussian_blur(vol, sigma) -> jnp.ndarray:
    """Separable N-D Gaussian blur; ``sigma`` scalar or per-axis tuple.

    Oracle: ``scipy.ndimage.gaussian_filter(mode='reflect')``.
    """
    vol = jnp.asarray(vol)
    if np.isscalar(sigma):
        sigma = (float(sigma),) * vol.ndim
    return _blur_jit(vol, tuple(float(s) for s in sigma))


# ---------------------------------------------------------------------------
# Histogram percentile (reference tracking.py:572-593)
# ---------------------------------------------------------------------------


def _histogram(flat, bins: int):
    """(lo, span, int32 counts) shared by the percentile and Otsu
    kernels. int32 counts: a float32 accumulator stops incrementing at
    2**24, which a production-size stack's background bin easily
    exceeds (212M voxels)."""
    lo = jnp.min(flat)
    span = jnp.maximum(jnp.max(flat) - lo, 1e-12)
    idx = jnp.clip(((flat - lo) / span * bins).astype(jnp.int32), 0, bins - 1)
    counts = jnp.zeros(bins, jnp.int32).at[idx].add(1)
    return lo, span, counts


@partial(jax.jit, static_argnames=("bins",))
def _percentile_jit(vol, q, bins: int):
    flat = vol.astype(jnp.float32).ravel()
    # Integer counts + integer cumsum: exact CDF (a float32 cumsum loses
    # whole counts at 1e5+ voxels, which matters in sparse tails).
    lo, span, counts = _histogram(flat, bins)
    cdf = jnp.cumsum(counts)
    target = q / 100.0 * flat.shape[0]
    # Smallest bin whose cumulative count reaches the target -> upper edge.
    bin_idx = jnp.argmax(cdf.astype(jnp.float32) >= target)
    return lo + (bin_idx + 1) / bins * span


def histogram_percentile(vol, q: float, bins: int = 4096) -> jnp.ndarray:
    """Approximate percentile via a fixed-bin histogram.

    Avoids materializing a sorted copy of whole deskewed volumes, the
    exact concern of the reference (``tracking.py:572-593`` replaces
    ``torch.quantile`` for the same reason). Max error = one bin width.
    """
    return _percentile_jit(jnp.asarray(vol), jnp.float32(q), bins)


# ---------------------------------------------------------------------------
# Multi-Otsu (reference tracking.py:425-501)
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("bins",))
def _multi_otsu_jit(vol, bins: int):
    flat = vol.astype(jnp.float32).ravel()
    lo, span, hist = _histogram(flat, bins)
    p = hist.astype(jnp.float32) / flat.shape[0]
    centers = lo + (jnp.arange(bins, dtype=jnp.float32) + 0.5) / bins * span

    # Cumulative zeroth/first moments: w(t) = sum p[:t], mu(t) = sum p*c[:t].
    w = jnp.concatenate([jnp.zeros(1), jnp.cumsum(p)])
    mu = jnp.concatenate([jnp.zeros(1), jnp.cumsum(p * centers)])

    def class_term(a, b):
        """sum over classes of w_k * mu_k^2 for the bin interval [a, b)."""
        wk = w[b] - w[a]
        muk = mu[b] - mu[a]
        return jnp.where(wk > 0, muk**2 / jnp.maximum(wk, 1e-12), 0.0)

    # Vectorized search over all (t1 < t2) bin pairs — the reference's
    # "all bin pairs" strategy (tracking.py:425-501) mapped to one
    # broadcasted (bins x bins) evaluation.
    t1 = jnp.arange(bins)[:, None]
    t2 = jnp.arange(bins)[None, :]
    var = class_term(0, t1) + class_term(t1, t2) + class_term(t2, bins)
    var = jnp.where(t1 < t2, var, -jnp.inf)
    flat_best = jnp.argmax(var)
    b1, b2 = jnp.unravel_index(flat_best, var.shape)
    # Threshold = upper edge of the last bin of each class.
    return jnp.stack([lo + b1 / bins * span, lo + b2 / bins * span])


def multi_otsu(vol, classes: int = 3, bins: int = 256) -> jnp.ndarray:
    """Multi-Otsu thresholds (3 classes -> 2 thresholds), vectorized.

    Maximizes the inter-class variance over all bin pairs on the VPU
    instead of looping (reference ``tracking.py:425-501``). Oracle:
    ``skimage.filters.threshold_multiotsu`` semantics (brute-force numpy
    in tests).
    """
    if classes != 3:
        raise NotImplementedError("multi_otsu supports classes=3 (reference parity)")
    return _multi_otsu_jit(jnp.asarray(vol), bins)


def multi_otsu_reference(vol: np.ndarray, bins: int = 256) -> np.ndarray:
    """Brute-force fp64 oracle over the identical histogram."""
    flat = np.asarray(vol, dtype=np.float64).ravel()
    lo, hi = flat.min(), flat.max()
    span = max(hi - lo, 1e-12)
    idx = np.clip(((flat - lo) / span * bins).astype(np.int64), 0, bins - 1)
    p = np.bincount(idx, minlength=bins).astype(np.float64) / flat.size
    centers = lo + (np.arange(bins) + 0.5) / bins * span
    w = np.concatenate([[0.0], np.cumsum(p)])
    mu = np.concatenate([[0.0], np.cumsum(p * centers)])

    best, best_pair = -np.inf, (0, 1)
    for a in range(bins):
        for b in range(a + 1, bins):
            total = 0.0
            for lo_i, hi_i in ((0, a), (a, b), (b, bins)):
                wk = w[hi_i] - w[lo_i]
                if wk > 0:
                    muk = mu[hi_i] - mu[lo_i]
                    total += muk * muk / wk
            if total > best:
                best, best_pair = total, (a, b)
    a, b = best_pair
    return np.array([lo + a / bins * span, lo + b / bins * span])


# ---------------------------------------------------------------------------
# Masks and centroids (reference tracking.py:504-649)
# ---------------------------------------------------------------------------


@jax.jit
def binary_mask(vol, threshold) -> jnp.ndarray:
    """``vol > threshold`` as float32 (reference ``tracking.py:504-542``)."""
    return (jnp.asarray(vol) > threshold).astype(jnp.float32)


@jax.jit
def center_of_mass(weights) -> jnp.ndarray:
    """Intensity-weighted centroid in voxel coordinates (ZYX... order).

    Works for masks (area centroid) and intensity images alike
    (reference ``tracking.py:545-649``). Returns NaN-free center (falls
    back to the geometric center when the total weight is zero).
    """
    w = jnp.asarray(weights, dtype=jnp.float32)
    total = jnp.sum(w)
    coords = []
    for axis in range(w.ndim):
        grid = jnp.arange(w.shape[axis], dtype=jnp.float32)
        shape = [1] * w.ndim
        shape[axis] = w.shape[axis]
        proj = jnp.sum(w * grid.reshape(shape))
        center_default = (w.shape[axis] - 1) / 2.0
        coords.append(
            jnp.where(total > 0, proj / jnp.maximum(total, 1e-12), center_default)
        )
    return jnp.stack(coords)


def otsu_component_mask(vol, component: int = 0, sigma: float = 0.0, bins: int = 256):
    """Blur -> multi-Otsu -> threshold ABOVE the selected component.

    The reference's ``otsu_component`` selects which 3-class Otsu
    threshold to binarize against (``_multiotsu_threshold`` returns
    ``thresholds[component]`` and ``_binary_mask`` masks
    ``img > threshold``, ``tracking.py:425-542``): 0 = the LOWER
    threshold (middle + bright classes), 1 = the UPPER threshold
    (brightest class only). A config carried over from the reference
    must segment the same voxels.
    """
    vol = jnp.asarray(vol, dtype=jnp.float32)
    if sigma > 0:
        vol = gaussian_blur(vol, sigma)
    t1, t2 = multi_otsu(vol, bins=bins)
    if component == 0:
        return (vol > t1).astype(jnp.float32), vol
    if component == 1:
        return (vol > t2).astype(jnp.float32), vol
    raise ValueError(
        f"otsu_component must be 0 (lower threshold) or 1 (upper), "
        f"got {component}"
    )
