"""Matmul DFT: Fourier transforms as MXU einsums.

XLA's TPU FFT lowers to a generic decomposition that measures ~14x off
the chip's bandwidth roofline (docs/kernels.md), which makes the
non-separable Richardson-Lucy fallback the slowest path in the system.
A DFT is a matrix product, and the MXU executes matmuls at near peak —
so the transform is evaluated as a four-step Cooley-Tukey
factorization (exact for ANY length: composite lengths factor, small
or near-prime ones take the direct matrix):

    N = N1 * N2, n = N2*n1 + n2, k = N1*k2 + k1
    X[k] = sum_{n2} W_N2^{n2 k2} * ( W_N^{n2 k1} * sum_{n1} x[n1,n2] W_N1^{n1 k1} )

i.e. reshape the axis to (N1, N2), contract N1 against an N1 x N1 DFT
matrix, multiply by an (N1, N2) twiddle, contract N2 against an N2 x N2
DFT matrix, and emit the factor axes swapped.  Cost is 2*(N1+N2)
complex MACs per element instead of the direct N — and every MAC rides
the MXU.  Small axes (N <= _DIRECT_MAX) use the direct N x N matrix,
which keeps the contraction deep enough to fill the systolic array.

Complex arithmetic is written out as explicit real einsums over
(re, im) pairs so a real-valued input (forward rfft) costs 2 real
matmuls instead of 4, and a real-valued output (inverse irfft) skips
the imaginary epilogue.  All matrices are built in float64 and cast to
float32; contractions default to 3-pass bf16 (``Precision.HIGHEST`` on
the final RL budget is ~f32-exact but 2x slower — the default HIGH
passes the oracle parity tests below 1e-5).

Role: transform backend for the non-separable RL fallback
(``ops/deconv.py`` ``fft_backend='dft2z'``).  The reference delegates
heavy PSFs to torch's cuFFT deconvolution (reference
``shrimpy/dynatrack/preprocessing.py:359-416``); on TPU the matmul
formulation is the hardware-native equivalent.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

# Largest axis evaluated as a single direct DFT matrix (non-TPU).
# Above this the four-step factorization has fewer MACs: direct work
# grows ~N per element while four-step grows ~2*sqrt(N).
_DIRECT_MAX = 256

# On TPU the MAC count is the wrong model: the four-step's ~sqrt(N)
# stage matrices (e.g. 40x40 at N=1500) run the MXU's 128x128 tiles at
# ~10% utilization and the factor-interleave emit is a whole-volume
# transposed reshape (HBM-bound), while the direct N x N contraction
# streams at near-full tile occupancy. Measured on v5e at the nonsep
# RL grid (144, 1500, 1024): direct matrices take the dft2z iteration
# 366 -> 239 ms (unbalanced big-stage x tiny-radix factors were also
# tried and do NOT beat direct — the interleave emit is the overhead).
_DIRECT_MAX_TPU = 4096


def _direct_max() -> int:
    return _DIRECT_MAX_TPU if jax.default_backend() == "tpu" else _DIRECT_MAX

#: Default contraction precision. HIGH = 3-pass bf16 (~f32 effective
#: for unit-magnitude DFT entries); HIGHEST doubles the passes.
PRECISION = jax.lax.Precision.HIGH


def default_transform() -> str:
    """Platform-resolved transform implementation for "auto" knobs.

    "matmul" on TPU (XLA's TPU FFT is ~14x off the bandwidth roofline;
    the MXU einsum formulation is faster despite more FLOPs); "xla"
    elsewhere (CPU/GPU FFTs are near-optimal and O(N log N)). Same
    idiom as the deskew backend's platform dispatch
    (``parallel/pipeline.py``).
    """
    return "matmul" if jax.default_backend() == "tpu" else "xla"


def _balanced_factors(n: int) -> tuple[int, int]:
    """Factor ``n = n1 * n2`` minimizing ``n1 + n2`` (n1 <= n2)."""
    best = (1, n)
    for n1 in range(2, int(np.sqrt(n)) + 1):
        if n % n1 == 0:
            best = (n1, n // n1)
    return best


@lru_cache(maxsize=64)
def _direct_mats(n: int, inverse: bool) -> tuple[np.ndarray, np.ndarray]:
    """(re, im) of the direct N x N DFT matrix (1/N folded into inverse)."""
    k = np.arange(n)
    sign = 2j * np.pi / n if inverse else -2j * np.pi / n
    m = np.exp(sign * np.outer(k, k))
    if inverse:
        m = m / n
    return m.real.astype(np.float32), m.imag.astype(np.float32)


@lru_cache(maxsize=64)
def _direct_irdft_mats(n: int) -> tuple[np.ndarray, np.ndarray]:
    """(re, im) of the (N//2+1, N) half-spectrum inverse real-DFT matrix.

    ``x = Re(S @ M)`` with ``M[k, n] = c_k W^{+nk} / N`` and ``c_k = 2``
    for the interior bins (they stand in for their conjugate mirrors),
    1 for DC and (even N) Nyquist — the direct-route inverse skips the
    Hermitian-tail reconstruction entirely.
    """
    gxr = n // 2 + 1
    m = np.exp(2j * np.pi / n * np.outer(np.arange(gxr), np.arange(n))) / n
    c = np.full(gxr, 2.0)
    c[0] = 1.0
    if n % 2 == 0:
        c[-1] = 1.0
    m = m * c[:, None]
    return m.real.astype(np.float32), m.imag.astype(np.float32)


def _is_direct(n: int) -> bool:
    """Whether a length-``n`` axis takes the direct-matrix route."""
    return n <= _direct_max() or _balanced_factors(n)[0] < 4


@lru_cache(maxsize=64)
def _four_step_mats(
    n: int, inverse: bool
) -> tuple[int, int, np.ndarray, np.ndarray, np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """(n1, n2, F1re, F1im, TWre, TWim, F2re, F2im); 1/N folded into F1."""
    n1, n2 = _balanced_factors(n)
    s = 1.0 if inverse else -1.0
    f1 = np.exp(s * 2j * np.pi / n1 * np.outer(np.arange(n1), np.arange(n1)))
    f2 = np.exp(s * 2j * np.pi / n2 * np.outer(np.arange(n2), np.arange(n2)))
    tw = np.exp(s * 2j * np.pi / n * np.outer(np.arange(n1), np.arange(n2)))
    if inverse:
        f1 = f1 / n
    return (
        n1,
        n2,
        f1.real.astype(np.float32),
        f1.imag.astype(np.float32),
        tw.real.astype(np.float32),
        tw.imag.astype(np.float32),
        f2.real.astype(np.float32),
        f2.imag.astype(np.float32),
    )


def _cmul_contract(sub, xr, xi, mr, mi, precision, imag_out=True):
    """Complex contraction via real einsums.

    ``xi is None`` marks a real input (2 einsums); ``imag_out=False``
    marks a real-only output (skips the imaginary epilogue).
    """
    ein = lambda a, b: jnp.einsum(sub, a, b, precision=precision)
    if xi is None:
        rr = ein(xr, mr)
        ri = ein(xr, mi) if imag_out else None
        return rr, ri
    rr = ein(xr, mr) - ein(xi, mi)
    ri = (ein(xr, mi) + ein(xi, mr)) if imag_out else None
    return rr, ri


def _cmul_elem(ar, ai, br, bi):
    """Elementwise complex multiply on (re, im) pairs."""
    return ar * br - ai * bi, ar * bi + ai * br


# einsum programs per (axis, stage). Axis -1 transforms the last axis
# of (..., s, N); axis -2 transforms the second-to-last of (..., N, s).
# Stage 1 contracts n1 ('a') to k1 ('k'); stage 2 contracts n2 ('b') to
# k2 ('j') and emits (k2, k1) so the flat output index is N1*k2 + k1.
_SUBS = {
    (-1, 1): "...ab,ak->...kb",
    (-1, 2): "...kb,bj->...jk",
    (-2, 1): "...abs,ak->...kbs",
    (-2, 2): "...kbs,bj->...jks",
}
_DIRECT_SUBS = {-1: "...a,ak->...k", -2: "...as,ak->...ks"}


def _cdft(xr, xi, axis: int, inverse: bool, precision, imag_out=True):
    """Complex DFT along ``axis`` (-1 or -2) of an (re, im) pair."""
    assert axis in (-1, -2), axis
    n = xr.shape[axis]
    # Direct matrix for small axes AND near-prime lengths (a 1xN or
    # 2x(N/2) "factorization" costs as much as direct with worse MXU
    # utilization). Phase stacks have arbitrary data shapes, so prime
    # lengths do occur; the direct matrix is exact for any N.
    if _is_direct(n):
        mr, mi = _direct_mats(n, inverse)
        return _cmul_contract(
            _DIRECT_SUBS[axis], xr, xi, mr, mi, precision, imag_out
        )
    n1, n2, f1r, f1i, twr, twi, f2r, f2i = _four_step_mats(n, inverse)
    shape = xr.shape
    ax = len(shape) + axis
    split = shape[:ax] + (n1, n2) + shape[ax + 1 :]
    xr = xr.reshape(split)
    xi = xi.reshape(split) if xi is not None else None
    if axis == -2:
        twr = twr[:, :, None]
        twi = twi[:, :, None]
    ar, ai = _cmul_contract(_SUBS[(axis, 1)], xr, xi, f1r, f1i, precision)
    br, bi = _cmul_elem(ar, ai, twr, twi)
    yr, yi = _cmul_contract(
        _SUBS[(axis, 2)], br, bi, f2r, f2i, precision, imag_out
    )
    yr = yr.reshape(shape)
    yi = yi.reshape(shape) if yi is not None else None
    return yr, yi


def rdft2_pair(
    x: jnp.ndarray, *, precision=None
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """:func:`rdft2` returning an (re, im) float32 pair.

    Spares the ``lax.complex`` materialization at a jit boundary —
    standalone-jit probes show pair outputs 16-33% faster at the dft2z
    working shapes. INSIDE one jit program the saving vanishes (XLA
    already carries complex64 as decomposed re/im; a pair-native
    dft2z RL backend measured 195.3 vs 192.6 ms/iter — no win, see
    docs/kernels.md). Use at real jit boundaries, e.g. device->host
    spectral shipping where the axon tunnel cannot transfer complex.
    """
    precision = PRECISION if precision is None else precision
    gx = x.shape[-1]
    gxr = gx // 2 + 1
    x = x.astype(jnp.float32)
    if _is_direct(gx):
        # Direct route: contract straight to the half spectrum.
        mr, mi = _direct_mats(gx, False)
        xr, xi = _cmul_contract(
            _DIRECT_SUBS[-1], x, None, mr[:, :gxr], mi[:, :gxr], precision
        )
    else:
        # Four-step with stage-2 column truncation: the flat output
        # index is k = N1*k2 + k1, so only k2 < ceil(gxr / N1) columns
        # can produce bins below gxr — slicing F2 there skips ~half of
        # stage 2's einsum work for the half spectrum.
        n1, n2, f1r, f1i, twr, twi, f2r, f2i = _four_step_mats(gx, False)
        k2_keep = (gxr - 1) // n1 + 1
        split = x.shape[:-1] + (n1, n2)
        ar, ai = _cmul_contract(
            _SUBS[(-1, 1)], x.reshape(split), None, f1r, f1i, precision
        )
        br, bi = _cmul_elem(ar, ai, twr, twi)
        yr, yi = _cmul_contract(
            _SUBS[(-1, 2)], br, bi,
            f2r[:, :k2_keep], f2i[:, :k2_keep], precision,
        )
        flat = x.shape[:-1] + (k2_keep * n1,)
        xr = yr.reshape(flat)[..., :gxr]
        xi = yi.reshape(flat)[..., :gxr]
    return _cdft(xr, xi, -2, False, precision)


def rdft2(x: jnp.ndarray, *, precision=None) -> jnp.ndarray:
    """``jnp.fft.rfftn(x, axes=(-2, -1))`` as MXU einsums.

    ``x`` is real (..., gy, gx); returns complex64
    (..., gy, gx//2 + 1). Any lengths are exact (composite lengths ride
    the four-step factorization, near-prime ones the direct matrix).
    """
    yr, yi = rdft2_pair(x, precision=precision)
    return jax.lax.complex(yr, yi)


def irdft2_pair(
    sr: jnp.ndarray, si: jnp.ndarray, gx: int, *, precision=None
) -> jnp.ndarray:
    """:func:`irdft2` consuming an (re, im) float32 pair (see
    :func:`rdft2_pair` for when pair carries help)."""
    precision = PRECISION if precision is None else precision
    gxr = sr.shape[-1]
    assert gxr == gx // 2 + 1, (gxr, gx)
    sr, si = _cdft(sr, si, -2, True, precision)
    if _is_direct(gx):
        # Direct route: half-spectrum inverse matrix (interior bins
        # doubled) — no Hermitian-tail materialization.
        mr, mi = _direct_irdft_mats(gx)
        yr, _ = _cmul_contract(
            _DIRECT_SUBS[-1], sr, si, mr, mi, precision, imag_out=False
        )
        return yr
    # Hermitian tail: S[gx - k] = conj(S[k]) for k in [1, gx - gxr].
    tr = sr[..., 1 : gx - gxr + 1][..., ::-1]
    ti = -si[..., 1 : gx - gxr + 1][..., ::-1]
    fr = jnp.concatenate([sr, tr], axis=-1)
    fi = jnp.concatenate([si, ti], axis=-1)
    yr, _ = _cdft(fr, fi, -1, True, precision, imag_out=False)
    return yr


def irdft2(s: jnp.ndarray, gx: int, *, precision=None) -> jnp.ndarray:
    """``jnp.fft.irfftn(s, s=(gy, gx), axes=(-2, -1))`` as MXU einsums.

    ``s`` is complex (..., gy, gx//2 + 1); the missing half-spectrum is
    reconstructed by Hermitian symmetry (the inverse therefore matches
    irfftn's convention of projecting onto a real output).
    """
    return irdft2_pair(s.real, s.imag, gx, precision=precision)


def cdft(
    x: jnp.ndarray, axis: int = -1, *, inverse: bool = False, precision=None
) -> jnp.ndarray:
    """``jnp.fft.fft``/``ifft`` along one axis as MXU einsums.

    ``x`` is complex (or real, promoted); ``axis`` counts from the end
    and supports -1, -2, -3 (-3 rides the -2 program on a view with the
    trailing two axes flattened).
    """
    precision = PRECISION if precision is None else precision
    ax = axis if axis < 0 else axis - x.ndim
    assert ax in (-1, -2, -3) and -ax <= x.ndim, (axis, x.shape)
    x = x.astype(jnp.complex64)
    shape = x.shape
    if ax == -3:
        flat = shape[:-2] + (shape[-2] * shape[-1],)
        xr, xi = x.real.reshape(flat), x.imag.reshape(flat)
        yr, yi = _cdft(xr, xi, -2, inverse, precision)
        return jax.lax.complex(yr, yi).reshape(shape)
    yr, yi = _cdft(x.real, x.imag, ax, inverse, precision)
    return jax.lax.complex(yr, yi)


def rdft3(x: jnp.ndarray, *, precision=None) -> jnp.ndarray:
    """``jnp.fft.rfftn(x)`` of a 3-D real volume as MXU einsums.

    Returns complex64 (gz, gy, gx//2 + 1). The z transform reuses the
    axis=-2 program on a (gz, gy * gxr) view.
    """
    assert x.ndim == 3, x.shape
    precision = PRECISION if precision is None else precision
    s = rdft2(x, precision=precision)
    gz, gy, gxr = s.shape
    zr, zi = _cdft(
        s.real.reshape(gz, gy * gxr),
        s.imag.reshape(gz, gy * gxr),
        -2,
        False,
        precision,
    )
    return jax.lax.complex(zr, zi).reshape(gz, gy, gxr)


def irdft3(s: jnp.ndarray, gx: int, *, precision=None) -> jnp.ndarray:
    """``jnp.fft.irfftn(s, s=(gz, gy, gx))`` of a half-spectrum volume.

    Exact inverse of :func:`rdft3`; like ``irfftn`` it projects onto a
    real output via Hermitian reconstruction of the missing x half.
    """
    assert s.ndim == 3, s.shape
    precision = PRECISION if precision is None else precision
    gz, gy, gxr = s.shape
    zr, zi = _cdft(
        s.real.reshape(gz, gy * gxr),
        s.imag.reshape(gz, gy * gxr),
        -2,
        True,
        precision,
    )
    s2 = jax.lax.complex(zr, zi).reshape(gz, gy, gxr)
    return irdft2(s2, gx, precision=precision)
