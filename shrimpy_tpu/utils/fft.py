"""FFT sizing and shape-matching helpers.

The reference pads phase-cross-correlation FFTs to 5-smooth ("fast")
lengths and pads/crops the operands to a common shape with reflect
padding / center cropping (reference ``shrimpy/dynatrack/tracking.py:248-306``).
On TPU the FFT also prefers the last axis to be a multiple of the 128-lane
register width, so :func:`next_fast_len` optionally rounds up to an even
multiple as well.

All functions here are shape-static and jit-friendly: sizes are computed
in Python (trace time), only the padding/cropping itself runs on device.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def next_fast_len(n: int) -> int:
    """Smallest 5-smooth integer >= ``n`` (prime factors only 2, 3, 5).

    Mirrors the behavior of ``scipy.fft.next_fast_len`` (reference
    ``tracking.py:248-264`` reimplements it the same way).
    """
    if n <= 1:
        return 1
    while True:
        m = n
        for p in (2, 3, 5):
            while m % p == 0:
                m //= p
        if m == 1:
            return n
        n += 1


def next_fast_len_tpu(n: int, lane_multiple: int = 128) -> int:
    """Smallest 5-smooth multiple of ``lane_multiple`` >= ``n``.

    TPU vector registers are 8x128; FFTs over a last axis that is a
    multiple of 128 map onto full lanes. Because 128 = 2**7 is itself
    5-smooth, a 5-smooth multiple of 128 always exists.
    """
    from shrimpy_tpu.utils.shapes import round_up

    n = round_up(max(n, lane_multiple), lane_multiple)
    while True:
        m = n
        for p in (2, 3, 5):
            while m % p == 0:
                m //= p
        if m == 1:
            return n
        n += lane_multiple


def center_crop(x: jnp.ndarray, shape: tuple[int, ...]) -> jnp.ndarray:
    """Crop the center of ``x`` to ``shape`` (every dim <= x's)."""
    assert x.ndim == len(shape)
    starts = tuple((cur - s) // 2 for cur, s in zip(x.shape, shape))
    assert all(s >= 0 for s in starts), (x.shape, shape)
    slicing = tuple(slice(s, s + d) for s, d in zip(starts, shape))
    return x[slicing]


def pad_to_shape(
    x: jnp.ndarray, shape: tuple[int, ...], mode: str = "reflect"
) -> jnp.ndarray:
    """Pad ``x`` symmetrically to ``shape`` (every dim >= x's).

    Reflect padding requires pad < axis size; a short axis (e.g. a
    single-plane volume matched against a deep stack) degrades that
    axis to edge padding instead of raising inside jit.
    """
    assert x.ndim == len(shape)
    diffs = [s - a for s, a in zip(shape, x.shape)]
    assert all(d >= 0 for d in diffs), (x.shape, shape)
    if all(d == 0 for d in diffs):
        return x
    pad_width = tuple((d // 2, d - d // 2) for d in diffs)
    if mode == "reflect":
        ok = [
            (lo < n and hi < n) or (lo == hi == 0)
            for (lo, hi), n in zip(pad_width, x.shape)
        ]
        if not all(ok):
            # Pad the too-short axes by edge first, then reflect the rest.
            edge_w = tuple(
                (0, 0) if good else w for good, w in zip(ok, pad_width)
            )
            rest_w = tuple(
                w if good else (0, 0) for good, w in zip(ok, pad_width)
            )
            x = jnp.pad(x, edge_w, mode="edge")
            if any(w != (0, 0) for w in rest_w):
                x = jnp.pad(x, rest_w, mode=mode)
            return x
    return jnp.pad(x, pad_width, mode=mode)


def match_shape(
    x: jnp.ndarray, shape: tuple[int, ...], mode: str = "reflect"
) -> jnp.ndarray:
    """Pad or crop ``x`` per-axis to exactly ``shape``.

    Same pad-then-crop composition as the reference's ``_match_shape``
    (``tracking.py:299-306``): reflect-pad any short axis, center-crop
    any long axis.
    """
    if any(s > d for s, d in zip(shape, x.shape)):
        padded = tuple(max(d, s) for d, s in zip(x.shape, shape))
        x = pad_to_shape(x, padded, mode=mode)
    if any(s < d for s, d in zip(shape, x.shape)):
        x = center_crop(x, tuple(shape))
    return x


def fast_fft_shape(
    shape: tuple[int, ...], maximum_shift: float = 1.0, tpu_lanes: bool = False
) -> tuple[int, ...]:
    """FFT shape for cross-correlating volumes of ``shape``.

    Per-axis: scale by ``maximum_shift`` (the reference's normalized
    search range, ``tracking.py:336-339``), then round up to a fast
    length; with ``tpu_lanes`` the last axis is additionally rounded to
    a multiple of 128.
    """
    out = []
    for i, s in enumerate(shape):
        n = int(max(1, round(s * maximum_shift)))
        if tpu_lanes and i == len(shape) - 1:
            out.append(next_fast_len_tpu(n))
        else:
            out.append(next_fast_len(n))
    return tuple(out)
