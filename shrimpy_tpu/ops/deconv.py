"""Richardson-Lucy deconvolution with measured PSFs (TPU-native).

The reference delegates deconvolution to the external biahub library
(reference ``README.md:126-128``; the measured-PSF source pipeline is
``scripts/measure_psf.py:20-288``). Here RL is a first-party TPU
implementation with three backends, all running the multiplicative
update as a ``jax.lax.scan`` (BASELINE.json configs[1]: 20 iterations,
measured PSF):

* **separable / matmul** (default for rank-decomposable PSFs): each
  circular convolution is a chain of per-axis circulant matmuls on the
  MXU — ~25x the FFT path on v5e, where XLA's FFT is far from the
  roofline; long axes switch to block-banded stencils.
* **separable / zy_pallas** (opt-in): fused z+y Pallas kernel + dense-x
  einsum (see ops/conv3_pallas.py for status).
* **fft** (fallback for non-separable PSFs): rFFT convolution on a
  5-smooth padded grid.

FFT algorithm
-------------
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

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from shrimpy_tpu.config.schemas import DeconvolveSettings
from shrimpy_tpu.ops.dft import default_transform as dft_default_transform
from shrimpy_tpu.ops.dft import irdft2 as dft_irdft2
from shrimpy_tpu.ops.dft import irdft3 as dft_irdft3
from shrimpy_tpu.ops.dft import rdft2 as dft_rdft2
from shrimpy_tpu.ops.rl_outer import run_rl_outer
from shrimpy_tpu.ops.dft import rdft3 as dft_rdft3
from shrimpy_tpu.utils.cache import LruCache
from shrimpy_tpu.utils.fft import next_fast_len, next_fast_len_tpu


def _padded_grid_shape(
    image_shape: tuple[int, ...],
    psf_shape: tuple[int, ...],
    tpu_lanes: bool = True,
    transform: str = "xla",
) -> tuple[tuple[int, ...], tuple[tuple[int, int], ...]]:
    """FFT grid shape and per-axis (lo, hi) image padding.

    Pads by the PSF half-width on each side (enough context for the
    boundary condition), then rounds up to a transform-fast length:

    - ``transform="xla"``: a 5-smooth length (the FFT's complexity
      model; last axis additionally to a 128-lane multiple when
      ``tpu_lanes``).
    - ``transform="matmul"``: the matmul-DFT backends (``ops/dft.py``)
      are exact at ANY length, so 5-smooth rounding only adds MACs —
      round to hardware tiles instead: sublane multiples of 8 on the
      leading axes, a 128-lane multiple on the last. Measured on v5e
      this takes the nonsep dft2z iteration 239 -> 201 ms at the
      (128, 1444, 800) bench geometry (grid (144, 1480, 896) vs the
      5-smooth (144, 1500, 1024)).
    """
    from shrimpy_tpu.utils.shapes import round_up

    assert len(image_shape) == len(psf_shape)
    assert transform in ("xla", "matmul"), transform
    grid = []
    pads = []
    for ax, (n, k) in enumerate(zip(image_shape, psf_shape)):
        half = k // 2
        target = n + 2 * half
        last = ax == len(image_shape) - 1
        if transform == "matmul":
            fast = round_up(target, 128 if last else 8)
        elif tpu_lanes and last:
            fast = next_fast_len_tpu(target)
        else:
            fast = next_fast_len(target)
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


@partial(
    jax.jit,
    static_argnames=(
        "iterations", "grid", "pads", "epsilon", "pad_mode", "transform",
        "accelerated",
    ),
)
def _rl_jit(
    image: jnp.ndarray,
    psf: jnp.ndarray,
    init: jnp.ndarray | None = None,
    *,
    iterations: int,
    grid: tuple[int, ...],
    pads: tuple[tuple[int, int], ...],
    epsilon: float,
    pad_mode: str,
    transform: str = "xla",
    accelerated: bool = False,
):
    # transform="matmul" (backend "dft3", 3-D volumes only) evaluates
    # every transform as MXU matmul-DFT einsums (ops/dft.py): the
    # fastest non-separable option where the full 3-D spectrum fits
    # HBM; dft2z's z-banded layout covers the bigger carries.
    if transform == "matmul":
        fwd = dft_rdft3
        inv = lambda a: dft_irdft3(a, grid[-1])
    else:
        fwd = jnp.fft.rfftn
        inv = lambda a: jnp.fft.irfftn(a, s=grid)

    image = image.astype(jnp.float32)
    padded = jnp.pad(image, pads, mode=pad_mode)
    otf = fwd(_embed_psf(psf, grid))

    data = jnp.maximum(padded, 0.0)
    # Warm start (algorithm="hybrid"): iterate from the provided
    # image-shaped estimate instead of the flat data start. The data
    # term stays the ORIGINAL image — init only moves the starting
    # point, so the fixed point is unchanged.
    est0 = jnp.maximum(
        padded if init is None
        else jnp.pad(init.astype(jnp.float32), pads, mode=pad_mode),
        epsilon,
    )

    def step(est, _):
        conv = inv(fwd(est) * otf)
        ratio = data / jnp.maximum(conv, epsilon)
        corr = inv(fwd(ratio) * jnp.conj(otf))
        return est * corr, None

    est = run_rl_outer([(step, iterations)], est0, accelerated)
    crop = tuple(slice(lo, lo + n) for (lo, _), n in zip(pads, image.shape))
    return est[crop]


@partial(
    jax.jit,
    static_argnames=(
        "iterations", "grid", "pads", "epsilon", "pad_mode", "z_chunk",
        "accelerated",
    ),
)
def _rl_dftz_jit(
    image: jnp.ndarray,
    psf: jnp.ndarray,
    init: jnp.ndarray | None = None,
    *,
    iterations: int,
    grid: tuple[int, int, int],
    pads: tuple[tuple[int, int], ...],
    epsilon: float,
    pad_mode: str,
    z_chunk: int,
    accelerated: bool = False,
):
    """RL with chunked matmul-DFT (y, x) transforms and an exact z-DFT.

    Same circular update and grid as :func:`_rl_fft2z_jit`, but instead
    of the banded z sum — whose kz sliding-window reads cost ~kz x the
    spectral buffer in HBM traffic per half-step — the z axis goes
    through a dense (Gz x Gz) matmul-DFT (``ops/dft.py`` cdft; Gz is
    ~144 at production, deep enough for the MXU), turning the banded
    convolution into ONE elementwise OTF multiply per half-step:

        Conv^3d = OTFz . DFTz(Est^2d);  Corr^3d = conj(OTFz) . DFTz(Ratio^2d)

    with ``OTFz[w] = sum_t hband[t] W_Gz^{w (t - rz)}`` built chunk-wise
    on the fly (never resident). Memory stays bounded like fft2z: the
    2-D transforms remain z-chunked and the only full-grid buffers are
    est, data and two spectral buffers (the z transform cannot run in
    place) — ~13 GB at the production carry.
    """
    from shrimpy_tpu.ops.dft import cdft as dft_cdft

    gz, gy, gx = grid
    gxr = gx // 2 + 1
    kz = int(psf.shape[0])
    rz = kz // 2
    c = z_chunk
    n_chunks = gz // c
    assert n_chunks * c == gz, (gz, c)

    image = image.astype(jnp.float32)
    padded = jnp.pad(image, pads, mode=pad_mode)
    data = jnp.maximum(padded, 0.0)
    # Warm start: see _rl_jit — init moves the starting point only.
    est0 = jnp.maximum(
        padded if init is None
        else jnp.pad(init.astype(jnp.float32), pads, mode=pad_mode),
        epsilon,
    )

    psf = psf.astype(jnp.float32)
    psf = psf / jnp.sum(psf)
    planes = jnp.pad(
        psf, ((0, 0), (0, gy - psf.shape[1]), (0, gx - psf.shape[2]))
    )
    planes = jnp.roll(
        planes, (-(psf.shape[1] // 2), -(psf.shape[2] // 2)), axis=(1, 2)
    )
    hband = dft_rdft2(planes)  # (kz, gy, gxr)
    # z-DFT factors of the embedded psf z-profile: plane t sits at
    # z = (t - rz) mod gz (the _embed_psf roll convention).
    wf = np.exp(
        -2j * np.pi
        * np.outer(np.arange(gz), np.arange(kz) - rz)
        / gz
    ).astype(np.complex64)  # (gz, kz)

    def fwd2_chunks(vol, out):
        """Chunked rfft2 of a real (gz, gy, gx) volume into ``out``."""

        def body(i, acc):
            ch = jax.lax.dynamic_slice_in_dim(vol, i * c, c, 0)
            return jax.lax.dynamic_update_slice_in_dim(
                acc, dft_rdft2(ch), i * c, 0
            )

        return jax.lax.fori_loop(0, n_chunks, body, out)

    def zdft(s, inverse):
        flat = s.reshape(gz, gy * gxr)
        return dft_cdft(flat, -2, inverse=inverse).reshape(gz, gy, gxr)

    def otf_mul(a, conj_: bool):
        """B[w] = A[w] * OTFz[w], chunk-wise (OTFz is never resident)."""

        def body(i, b):
            wchunk = jax.lax.dynamic_slice_in_dim(
                jnp.asarray(wf), i * c, c, 0
            )
            otf = jnp.einsum("wt,tyx->wyx", wchunk, hband)
            if conj_:
                otf = jnp.conj(otf)
            a_ch = jax.lax.dynamic_slice_in_dim(a, i * c, c, 0)
            return jax.lax.dynamic_update_slice_in_dim(
                b, a_ch * otf, i * c, 0
            )

        return jax.lax.fori_loop(0, n_chunks, body, a)

    def step(est, _):
        spec = jnp.zeros((gz, gy, gxr), jnp.complex64)
        spec = fwd2_chunks(est, spec)
        conv_spec = zdft(otf_mul(zdft(spec, False), False), True)

        # Per chunk: real conv -> ratio -> ratio spectrum overwrites
        # conv_spec in place (row i is consumed before it is written).
        def body_ratio(i, cs):
            ch = jax.lax.dynamic_slice_in_dim(cs, i * c, c, 0)
            conv = dft_irdft2(ch, gx)
            dchunk = jax.lax.dynamic_slice_in_dim(data, i * c, c, 0)
            ratio = dchunk / jnp.maximum(conv, epsilon)
            return jax.lax.dynamic_update_slice_in_dim(
                cs, dft_rdft2(ratio), i * c, 0
            )

        ratio_spec = jax.lax.fori_loop(0, n_chunks, body_ratio, conv_spec)
        corr_spec = zdft(otf_mul(zdft(ratio_spec, False), True), True)

        def body_mult(i, e):
            ch = jax.lax.dynamic_slice_in_dim(corr_spec, i * c, c, 0)
            corr = dft_irdft2(ch, gx)
            echunk = jax.lax.dynamic_slice_in_dim(e, i * c, c, 0)
            return jax.lax.dynamic_update_slice_in_dim(
                e, echunk * corr, i * c, 0
            )

        return jax.lax.fori_loop(0, n_chunks, body_mult, est), None

    est = run_rl_outer([(step, iterations)], est0, accelerated)
    crop = tuple(slice(lo, lo + n) for (lo, _), n in zip(pads, image.shape))
    return est[crop]


def _fft2z_chunk(grid_z: int, requested: int) -> int:
    """Largest divisor of ``grid_z`` that is <= ``requested`` (>= 1).

    The z-banded FFT path streams z in equal chunks; grid z lengths are
    5-smooth so a small divisor always exists.
    """
    best = 1
    for d in range(1, min(requested, grid_z) + 1):
        if grid_z % d == 0:
            best = d
    return best


@partial(
    jax.jit,
    static_argnames=(
        "iterations", "grid", "pads", "epsilon", "pad_mode", "z_chunk",
        "transform", "accelerated",
    ),
)
def _rl_fft2z_jit(
    image: jnp.ndarray,
    psf: jnp.ndarray,
    init: jnp.ndarray | None = None,
    *,
    iterations: int,
    grid: tuple[int, int, int],
    pads: tuple[tuple[int, int], ...],
    epsilon: float,
    pad_mode: str,
    z_chunk: int,
    transform: str = "xla",
    accelerated: bool = False,
):
    """RL on the fft grid with the z axis outside the transform.

    Mathematically identical to :func:`_rl_jit` on the identical padded
    grid: the 3-D circular convolution factors as, per output plane z,

        conv[z] = sum_{dz=-rz..rz} kz[dz] * conv2_yx(est[(z-dz) mod Gz])

    because the embedded PSF occupies only ``kz = 2*rz+1`` z planes.  In
    the (y, x) Fourier domain that is a banded circular sum over per-
    plane OTFs ``H[dz] = rfft2(embed_yx(psf[rz+dz]))``:

        Conv^[z] = sum_dz H[dz] . Est^[(z-dz) mod Gz]
        Corr^[z] = sum_dz conj(H[dz]) . Ratio^[(z+dz) mod Gz]   (adjoint)

    Why: XLA's single-chip 3-D FFT working set OOMs at the production
    carry (128, 2888, 1600).  Here every FFT is a batched 2-D transform
    over ``z_chunk`` planes, so the FFT scratch is bounded by the chunk;
    the only full-grid buffers are est, data and ONE (Gz+2rz)-plane
    spectral buffer that the ratio overwrites in place (a rolling rz-row
    halo carries the est rows the band still needs).  Peak HBM at the
    production carry is ~10 GB vs >16 GB for the 3-D transform.

    Non-separable fallback of the deconvolution stage (reference
    ``shrimpy/dynatrack/preprocessing.py`` routes heavy PSFs to a
    generic FFT deconvolution; same role here, bounded for TPU HBM).
    """
    gz, gy, gx = grid
    gxr = gx // 2 + 1
    kz = int(psf.shape[0])
    rz = kz // 2
    c = z_chunk
    n_chunks = gz // c
    assert n_chunks * c == gz, (gz, c)

    # transform="matmul" swaps every 2-D FFT for the MXU matmul-DFT
    # (ops/dft.py): identical math on the identical grid, several times
    # faster on TPU where the XLA FFT is far off the roofline.
    if transform == "matmul":
        fwd2 = dft_rdft2
        inv2 = lambda a: dft_irdft2(a, gx)
    else:
        fwd2 = lambda a: jnp.fft.rfftn(a, axes=(1, 2))
        inv2 = lambda a: jnp.fft.irfftn(a, s=(gy, gx), axes=(1, 2))

    image = image.astype(jnp.float32)
    padded = jnp.pad(image, pads, mode=pad_mode)
    data = jnp.maximum(padded, 0.0)
    # Warm start: see _rl_jit — init moves the starting point only.
    est0 = jnp.maximum(
        padded if init is None
        else jnp.pad(init.astype(jnp.float32), pads, mode=pad_mode),
        epsilon,
    )

    # Per-z-plane OTFs: psf plane rz+dz embedded at the (y, x) origin
    # (same roll convention as _embed_psf, so DC carries no phase).
    psf = psf.astype(jnp.float32)
    psf = psf / jnp.sum(psf)
    planes = jnp.pad(
        psf,
        ((0, 0), (0, gy - psf.shape[1]), (0, gx - psf.shape[2])),
    )
    planes = jnp.roll(
        planes,
        (-(psf.shape[1] // 2), -(psf.shape[2] // 2)),
        axis=(1, 2),
    )
    hband = fwd2(planes)  # (kz, gy, gxr)
    hconj = jnp.conj(hband)

    def rfft2_chunks(vol):
        """(gz, gy, gx) -> (gz + 2rz, gy, gxr) spectral buffer whose
        first/last rz planes are circular wrap copies (so banded reads
        never index out of bounds)."""

        def body(i, hat):
            ch = jax.lax.dynamic_slice_in_dim(vol, i * c, c, 0)
            return jax.lax.dynamic_update_slice_in_dim(
                hat, fwd2(ch), rz + i * c, 0
            )

        hat = jnp.zeros((gz + 2 * rz, gy, gxr), jnp.complex64)
        hat = jax.lax.fori_loop(0, n_chunks, body, hat)
        return _wrap_copies(hat)

    def _wrap_copies(hat):
        if rz == 0:
            return hat
        hat = hat.at[:rz].set(hat[gz : gz + rz])
        return hat.at[gz + rz :].set(hat[rz : 2 * rz])

    def band(window, taps):
        """sum_t taps[t] * window[t : t+c] over the kz static taps."""
        acc = taps[0] * jax.lax.dynamic_slice_in_dim(window, 0, c, 0)
        for t in range(1, kz):
            acc = acc + taps[t] * jax.lax.dynamic_slice_in_dim(
                window, t, c, 0
            )
        return acc

    def step(est, _):
        hat = rfft2_chunks(est)

        # Half-step 1: conv -> ratio; Ratio^ overwrites Est^ in place,
        # a rolling rz-plane halo keeps the Est rows later chunks read.
        def body_b(i, carry):
            hat, halo = carry
            upper = jax.lax.dynamic_slice_in_dim(hat, rz + i * c, c + rz, 0)
            window = jnp.concatenate([halo, upper], axis=0)
            # conv[z=ic+s] = sum_dz kz[dz] est[z-dz]; window row s+rz-dz
            # => taps in reversed hband order.
            acc = band(window, hband[::-1])
            conv = inv2(acc)
            dchunk = jax.lax.dynamic_slice_in_dim(data, i * c, c, 0)
            ratio = dchunk / jnp.maximum(conv, epsilon)
            new_halo = jax.lax.dynamic_slice_in_dim(window, c, rz, 0)
            hat = jax.lax.dynamic_update_slice_in_dim(
                hat, fwd2(ratio), rz + i * c, 0
            )
            return hat, new_halo

        hat, _ = jax.lax.fori_loop(0, n_chunks, body_b, (hat, hat[:rz]))
        hat = _wrap_copies(hat)

        # Half-step 2: corr[z=ic+s] = sum_dz kz[dz] ratio[z+dz]; window
        # row s+rz+dz => conj taps in natural order.  Read-only on hat.
        def body_c(i, est):
            window = jax.lax.dynamic_slice_in_dim(hat, i * c, c + 2 * rz, 0)
            corr = inv2(band(window, hconj))
            echunk = jax.lax.dynamic_slice_in_dim(est, i * c, c, 0)
            return jax.lax.dynamic_update_slice_in_dim(
                est, echunk * corr, i * c, 0
            )

        return jax.lax.fori_loop(0, n_chunks, body_c, est), None

    est = run_rl_outer([(step, iterations)], est0, accelerated)
    crop = tuple(slice(lo, lo + n) for (lo, _), n in zip(pads, image.shape))
    return est[crop]


# ---------------------------------------------------------------------------
# Separable fast path: RL as circulant banded-matrix products on the MXU
# ---------------------------------------------------------------------------
#
# TPU FFTs are far from the chip's bandwidth/compute roofline, so the
# FFT RL update is ~25x slower than its circulant-matmul equivalent:
# a circular 1-D convolution along axis N is multiplication by an N x N
# circulant matrix, which the MXU executes at near peak. For a PSF that
# decomposes as a sum of K separable terms (Gaussian-like microscopy
# PSFs have small K), each RL convolution becomes 3K banded matmuls —
# identical math to the circular FFT convolution on the same grid
# (verified <= 1e-6 vs the fp64 oracle at HIGHEST matmul precision; the
# default bf16 matmul precision loses ~1e-2 over 20 iterations and is
# never used here).


_SEP_CAND_CACHE = LruCache(maxsize=4)


def _separable_candidates(
    psf: np.ndarray, max_terms: int
) -> list[tuple[float, np.ndarray, np.ndarray, np.ndarray]]:
    """SVD-cascade separable candidates, strongest first: unfold Z vs
    YX, then split each YX mode.

    Memoized on (psf bytes, max_terms): plan_separable_terms probes the
    same PSF at strict then extended rank and again for truncation —
    without the cache the full SVD cascade runs up to three times per
    pipeline build on this box's single CPU core.
    """
    psf = np.asarray(psf, dtype=np.float64)
    cache_key = (psf.tobytes(), psf.shape, max_terms)
    if cache_key in _SEP_CAND_CACHE:
        return _SEP_CAND_CACHE[cache_key]
    nz, ny, nx = psf.shape
    u, s, vt = np.linalg.svd(psf.reshape(nz, ny * nx), full_matrices=False)
    candidates: list[tuple[float, np.ndarray, np.ndarray, np.ndarray]] = []
    for r in range(min(len(s), max_terms)):
        if s[r] <= 0:
            break
        plane = vt[r].reshape(ny, nx)
        pu, ps, pvt = np.linalg.svd(plane, full_matrices=False)
        for q in range(min(len(ps), max_terms)):
            weight = s[r] * ps[q]
            if weight <= 0:
                break
            candidates.append((weight, u[:, r], pu[:, q] * ps[q] * s[r], pvt[q]))
    candidates.sort(key=lambda c: -c[0])
    _SEP_CAND_CACHE[cache_key] = candidates
    return candidates


def separable_decompose(
    psf: np.ndarray, tol: float = 1e-4, max_terms: int = 6
) -> list[tuple[np.ndarray, np.ndarray, np.ndarray]] | None:
    """Greedy rank-K separable decomposition ``psf ~ sum_k wz_k x wy_k x wx_k``.

    SVD cascade: unfold Z vs YX, then split each YX mode; terms are
    added in decreasing singular-value order until the reconstruction
    relative error (Frobenius) drops below ``tol``. Returns None when
    ``max_terms`` terms cannot reach ``tol`` (caller falls back to FFT
    or to :func:`separable_truncate` denoising).
    """
    psf = np.asarray(psf, dtype=np.float64)
    candidates = _separable_candidates(psf, max_terms)
    norm = np.linalg.norm(psf)
    recon = np.zeros_like(psf)
    terms: list[tuple[np.ndarray, np.ndarray, np.ndarray]] = []
    for _, wz, wy, wx in candidates[: max_terms * max_terms]:
        terms.append(
            (wz.astype(np.float32), wy.astype(np.float32), wx.astype(np.float32))
        )
        recon = recon + np.einsum("z,y,x->zyx", wz, wy, wx)
        if np.linalg.norm(psf - recon) / max(norm, 1e-30) <= tol:
            if len(terms) > max_terms:
                return None
            return terms
    return None


def separable_truncate(
    psf: np.ndarray,
    max_terms: int = 6,
    plateau_rtol: float | None = None,
    stop_below: float | None = None,
) -> tuple[list[tuple[np.ndarray, np.ndarray, np.ndarray]], float]:
    """Best-effort top-K separable truncation: ``(terms, rel_residual)``.

    Measured bead PSFs carry iid measurement noise that no finite-rank
    decomposition can (or should) capture — SVD truncation acts as the
    PSF denoiser, the standard hygiene for measured kernels. The
    deconvolution then runs with the rank-K (denoised) PSF on the fast
    separable path; ``rel_residual`` (Frobenius, relative) tells the
    caller how much was discarded so genuinely non-separable structure
    (e.g. heavy aberration rings) still routes to the exact FFT path.

    Reference context: PSFs come from bead characterization
    (``scripts/measure_psf.py:20-288``); averaging + truncation is the
    denoising step the raw measurement needs before deconvolution.
    """
    psf = np.asarray(psf, dtype=np.float64)
    candidates = _separable_candidates(psf, max_terms)[:max_terms]
    norm = np.linalg.norm(psf)
    recon = np.zeros_like(psf)
    terms: list[tuple[np.ndarray, np.ndarray, np.ndarray]] = []
    residual = 1.0
    for _, wz, wy, wx in candidates:
        new = recon + np.einsum("z,y,x->zyx", wz, wy, wx)
        new_residual = float(np.linalg.norm(psf - new) / max(norm, 1e-30))
        if (
            plateau_rtol is not None
            and terms
            and residual - new_residual < plateau_rtol * residual
            and (stop_below is None or residual <= stop_below)
        ):
            # Noise plateau: structure terms drop the residual by tens
            # of percent, iid-noise terms by ~1% each — more rank past
            # the knee is pure per-iteration cost, not signal (measured
            # drop sequence of a noisy light-sheet PSF: 81/71/35/15/5/4%).
            break
        terms.append(
            (wz.astype(np.float32), wy.astype(np.float32), wx.astype(np.float32))
        )
        recon = new
        residual = new_residual
    return terms, residual


def plan_separable_terms(
    psf_np: np.ndarray, settings: "DeconvolveSettings"
) -> list[tuple[np.ndarray, np.ndarray, np.ndarray]] | None:
    """Resolve the separable term set for a PSF under ``settings``.

    1. strict decomposition within ``separable_tol`` (exact fast path);
    2. strict decomposition at extended rank (``max_extended_terms``):
       structured/aberrated PSFs often need rank 7-10, and the fused
       kernel's measured per-term marginal cost (27.6 ms/iter/term at
       the production carry vs an FFT iteration's ~1.6 s there — true
       crossover near rank 56, docs/kernels.md) keeps every extended
       rank far below the FFT path — logged;
    3. if that fails and ``psf_denoise != 'off'``: rank-K truncation
       (up to extended rank; terms accumulate until the residual-drop
       PLATEAU past the sufficiency target — the knee where further
       rank models iid noise, not structure), accepted when the
       discarded residual is below
       ``psf_denoise_max_residual`` (noise-like) — logged, because the
       working PSF becomes the denoised one;
    4. otherwise None (caller uses the FFT path, also logged so the
       cliff is never silent).
    """
    import logging

    logger = logging.getLogger(__name__)
    psf_unit = np.asarray(psf_np, np.float64)
    psf_unit = psf_unit / psf_unit.sum()
    terms = separable_decompose(
        psf_unit, tol=settings.separable_tol, max_terms=settings.max_separable_terms
    )
    if terms is not None:
        return terms
    extended = max(settings.max_extended_terms, settings.max_separable_terms)
    if extended > settings.max_separable_terms:
        terms = separable_decompose(
            psf_unit, tol=settings.separable_tol, max_terms=extended
        )
        if terms is not None:
            logger.warning(
                "PSF needs extended rank %d (> max_separable_terms=%d) to "
                "reach tol=%g; separable path with per-iteration cost "
                "~0.8x rank-1 per term (FFT crossover ~rank 56, measured)",
                len(terms), settings.max_separable_terms,
                settings.separable_tol,
            )
            return terms
    if settings.psf_denoise == "off":
        logger.warning(
            "PSF not separable within tol=%g and psf_denoise='off': using "
            "the FFT path (~45x a rank-1 separable iteration, measured)",
            settings.separable_tol,
        )
        return None
    terms, residual = separable_truncate(
        psf_unit,
        max_terms=extended,
        plateau_rtol=0.08,
        # Never plateau-stop ABOVE the acceptance threshold: slow-decay
        # structure (6-7% per term) can still cross it with more rank.
        stop_below=settings.psf_denoise_max_residual,
    )
    if residual <= settings.psf_denoise_max_residual:
        logger.warning(
            "PSF not strictly separable: denoised to rank-%d (discarded "
            "residual %.2e Frobenius, treated as measurement noise); "
            "deconvolving with the truncated PSF on the separable path",
            len(terms),
            residual,
        )
        return terms
    logger.warning(
        "PSF rank-%d residual %.2e exceeds psf_denoise_max_residual=%g "
        "(non-separable structure beyond extended rank): using the FFT "
        "path (~45x a rank-1 separable iteration, measured)",
        len(terms),
        residual,
        settings.psf_denoise_max_residual,
    )
    return None


_NONNEG_CP_CACHE = LruCache(maxsize=8)


def nonneg_cp_decompose(
    psf: np.ndarray, n_terms: int, sweeps: int = 200
) -> tuple[list[tuple[np.ndarray, np.ndarray, np.ndarray]], float]:
    """Nonnegative rank-K CP decomposition ``psf ~ sum_k a_k x b_k x c_k``
    with ``a_k, b_k, c_k >= 0``, via HALS (hierarchical alternating
    least squares with nonneg projection). Returns ``(terms, rel_residual)``.

    Two properties make this the right warm-phase operator for
    :func:`rl_hybrid` where the greedy signed SVD cascade
    (:func:`_separable_candidates`) is not:

    * **Stability by construction.** A nonnegative kernel keeps the RL
      update positivity-preserving. Signed rank-K truncations are
      explosively unstable on scenes with dark regions (measured: the
      cascade's rank-7 truncation of the bench PSF reaches -8e18
      within 4 iterations on a benign scene; on a dark-octant scene
      every signed rank >= 2 diverges geometrically from iteration 1 —
      the eps ratio floor amplifies the negative lobes). Microscopy
      backgrounds ARE dark regions; a signed warm kernel is unusable.
    * **Better accuracy per term.** HALS optimizes all K terms jointly
      where the cascade is greedy: measured on the bench PSF
      (tilted_gaussian_psf), nonneg K=4 reaches residual 0.105 vs the
      signed cascade's 0.283, K=8 0.032 vs 0.088; on the (15,31,31)
      production-support variant K=8 reaches 0.101 vs 0.312. Fewer
      warm terms = directly fewer ms/iter (27.6 ms/term on v5e).

    Factors are initialized from |cascade| modes (a good basin) and
    swept column-wise; a column that HALS zeroes is a dead term
    (contributes nothing — harmless). Memoized per (psf, K): the
    pipeline builder and richardson_lucy may plan the same PSF.
    """
    psf = np.asarray(psf, np.float64)
    key = (psf.tobytes(), psf.shape, n_terms, sweeps)
    if key in _NONNEG_CP_CACHE:
        return _NONNEG_CP_CACHE[key]
    nz, ny, nx = psf.shape
    cands = _separable_candidates(np.abs(psf) + 1e-30, n_terms)
    rng = np.random.default_rng(0)
    a = np.zeros((nz, n_terms))
    b = np.zeros((ny, n_terms))
    c = np.zeros((nx, n_terms))
    for k in range(n_terms):
        if k < len(cands):
            w, wz, wy, wx = cands[k]
            a[:, k] = np.abs(wz)
            b[:, k] = np.abs(wy) * abs(w) ** 0.5
            c[:, k] = np.abs(wx)
        else:
            a[:, k] = rng.random(nz)
            b[:, k] = rng.random(ny)
            c[:, k] = rng.random(nx)
    t1 = psf.reshape(nz, -1)
    t2 = np.moveaxis(psf, 1, 0).reshape(ny, -1)
    t3 = np.moveaxis(psf, 2, 0).reshape(nx, -1)
    for _ in range(sweeps):
        for m, tm, p, q in ((a, t1, b, c), (b, t2, a, c), (c, t3, a, b)):
            kr = (p[:, None, :] * q[None, :, :]).reshape(-1, n_terms)
            gram = (p.T @ p) * (q.T @ q)
            w = tm @ kr
            for k in range(n_terms):
                num = w[:, k] - m @ gram[:, k] + m[:, k] * gram[k, k]
                m[:, k] = np.maximum(num / max(gram[k, k], 1e-30), 0.0)
    recon = np.einsum("zk,yk,xk->zyx", a, b, c)
    residual = float(np.linalg.norm(psf - recon) / np.linalg.norm(psf))
    terms = [
        (
            a[:, k].astype(np.float32),
            b[:, k].astype(np.float32),
            c[:, k].astype(np.float32),
        )
        for k in range(n_terms)
    ]
    result = (terms, residual)
    _NONNEG_CP_CACHE[key] = result
    return result


def plan_hybrid_terms(
    psf_np: np.ndarray, settings: "DeconvolveSettings"
) -> tuple[list[tuple[np.ndarray, np.ndarray, np.ndarray]], float]:
    """Warm-phase term set for ``algorithm='hybrid'``: the smallest
    NONNEGATIVE rank-K CP factorization whose residual is usefully
    small, accepted at ANY residual.

    Unlike :func:`plan_separable_terms` there is no acceptance bar —
    the warm operator only has to point the early iterations in
    roughly the right direction; the exact tail owns correctness
    (:func:`rl_hybrid`). Nonnegativity is REQUIRED (not a preference):
    see :func:`nonneg_cp_decompose` — signed truncations diverge on
    dark regions. K stops growing once the residual clears 0.15
    (measured: warm iterations at residual ~0.1 advance the exact
    trajectory by ~0.9-1.0 exact iterations each; chasing lower
    residual buys little trajectory and costs 27.6 ms/iter per term
    on v5e) or at extended rank.
    """
    import logging

    psf_unit = np.asarray(psf_np, np.float64)
    psf_unit = psf_unit / psf_unit.sum()
    extended = max(settings.max_extended_terms, settings.max_separable_terms)
    best: tuple[list, float] | None = None
    # The settings cap itself is always a rung: with e.g.
    # max_extended_terms=10 the ladder must probe rank 10, not stop at
    # the last built-in rung below it (8).
    ladder = sorted({n for n in (2, 4, 6, 8, 12, 16, 24, extended)})
    for n in ladder:
        if n > extended and best is not None:
            break
        terms, residual = nonneg_cp_decompose(psf_unit, min(n, extended))
        if best is None or residual < best[1]:
            best = (terms, residual)
        if residual <= 0.15:
            break
    terms, residual = best
    logging.getLogger(__name__).info(
        "hybrid warm phase: nonneg rank-%d CP PSF (residual %.2e "
        "Frobenius); exact FFT/DFT tail corrects the model error",
        len(terms), residual,
    )
    return terms, residual


def rl_hybrid(image, psf_np, warm_terms, settings, iterations: int):
    """Warm-started non-separable RL: ``hybrid_separable_iters`` cheap
    separable iterations on the rank-truncated PSF initialize
    ``iterations`` exact FFT/DFT-path iterations.

    Why this is sound: RL is a fixed-point iteration whose fixed point
    is set ONLY by the data term and the operator — the init moves the
    starting point, never the limit. Early RL iterations restore bulk
    contrast, work the truncated operator (Frobenius residual typically
    0.05-0.2 for genuinely non-separable PSFs) does nearly as well as
    the exact one; the exact tail then converges on the TRUE operator's
    trajectory. Contrast with deconvolving with the truncated PSF
    outright, whose limit is biased by the model error and never
    recovers the discarded structure.

    Cost model (v5e, production carry (128, 2888, 1600)): an exact
    dft2z iteration is ~1.09 s; a rank-4 fused separable iteration is
    ~0.12 s (35.3 ms + 27.6 ms/term, docs/kernels.md). Quality
    (tests/test_deconv.py hybrid trajectory tests, bench PSF at warm
    rank 4 / residual 0.105, dark-region scene): each warm iteration
    advances the exact trajectory by ~0.9-1.0 exact iterations —
    hybrid(s=24, e=8) matches plain exact RL-30, hybrid(s=16, e=6)
    beats RL-20 — at ~1/9 the per-iteration cost, so an RL-20-quality
    restoration runs ~2.5x faster end to end.

    Reference context: biahub routes non-separable PSFs to a generic
    FFT deconvolution (reference ``shrimpy/dynatrack/preprocessing.py:296-317``
    uses the PSF as given); the hybrid is a capability add for the
    same inputs, opt-in via ``DeconvolveSettings.algorithm='hybrid'``.
    ``acceleration`` applies to both phases (the Biggs alpha restarts
    at the boundary — the startup runs two plain updates there).
    """
    warm = None
    if settings.hybrid_separable_iters:
        warm = rl_separable(
            image, psf_np, warm_terms, settings,
            settings.hybrid_separable_iters,
        )
        # Safety net: the nonneg warm operator preserves positivity in
        # exact arithmetic, but the exact tail's correctness must not
        # depend on warm-phase numerics — any non-finite or negative
        # warm voxel falls back to the flat data start there. One
        # elementwise pass, noise against the iterations.
        img_pos = jnp.maximum(jnp.asarray(image).astype(jnp.float32), 0.0)
        warm = jnp.where(
            jnp.isfinite(warm) & (warm >= 0.0), warm, img_pos
        )
    return rl_fft(image, psf_np, settings, iterations, init=warm)


def _circulant(n: int, taps: np.ndarray) -> np.ndarray:
    """N x N circulant matrix applying a centered circular convolution."""
    k = len(taps)
    r = k // 2
    mat = np.zeros((n, n), np.float32)
    rows = np.arange(n)
    for i in range(k):
        mat[rows, (rows - (i - r)) % n] += taps[i]
    return mat


# Block size of the banded stencil scheme. Although the dense circulant
# is quadratic in N and the stencil constant, the MXU runs big dense
# matmuls so much closer to peak that dense wins until N ~ 1.5k
# (measured on v5e: y=2944 banded 23 ms vs dense 33 ms; x=820 dense
# 10 ms vs banded-896 20 ms).
_BLOCK = 128
_DENSE_MAX = 1536


def _banded_stencil(taps: np.ndarray, block: int | None = None) -> np.ndarray:
    """(B, 3B) stencil: out block = T @ [prev; cur; next] input blocks.

    Exactly the rows of the circulant restricted to one block — valid
    for every block of a circular axis when neighbors wrap (roll),
    provided the band half-width fits in one block (taps <= 2B+1).
    """
    block = block or _BLOCK
    k = len(taps)
    r = k // 2
    assert r <= block, "PSF band exceeds one block"
    t = np.zeros((block, 3 * block), np.float32)
    rows = np.arange(block)
    for i in range(k):
        t[rows, block + rows - (i - r)] += taps[i]
    return t


def _axis_is_banded(n: int, radius: int = 0) -> bool:
    """Banded beats dense past the measured MXU crossover — but only
    when the band fits one block (the stencil scheme needs
    ``taps <= 2*_BLOCK + 1``); fat PSFs stay dense instead of
    tripping the stencil assert."""
    return n > _DENSE_MAX and radius <= _BLOCK


_SEP_MATS_NP_CACHE = LruCache(maxsize=8)
_SEP_MATS_DEV_CACHE = LruCache(maxsize=8)


def _sep_matrices_device(terms, grid, radii) -> tuple:
    """Operator stacks for the matmul path, cached per (terms, grid).

    The host construction (SVD cascade -> dense circulants) is cached
    unconditionally; device arrays are cached only OUTSIDE traces —
    inside jit/shard_map tracing, jnp.asarray yields trace-local
    tracers that must never outlive the trace (they bake into that
    compilation as constants instead).
    """
    key = (
        tuple(tuple(np.asarray(w, np.float64).tobytes() for w in t) for t in terms),
        tuple(grid),
        tuple(radii),
    )
    if key not in _SEP_MATS_NP_CACHE:
        _SEP_MATS_NP_CACHE[key] = _sep_matrices(terms, grid, radii)
    host = _SEP_MATS_NP_CACHE[key]
    if isinstance(jnp.zeros(()), jax.core.Tracer):  # tracing: no caching
        return tuple(jnp.asarray(m) for m in host)
    if key not in _SEP_MATS_DEV_CACHE:
        _SEP_MATS_DEV_CACHE[key] = tuple(jnp.asarray(m) for m in host)
    return _SEP_MATS_DEV_CACHE[key]


def _sep_matrices(
    terms: list[tuple[np.ndarray, np.ndarray, np.ndarray]],
    grid: tuple[int, int, int],
    radii: tuple[int, int, int],
) -> tuple[np.ndarray, ...]:
    """Stacked per-axis conv operators for conv and its adjoint.

    Dense axes: (K, N, N) circulants. Banded axes
    (N % _BLOCK == 0): (K, B, 3B) stencils.
    """
    conv, corr = [], []
    for axis in range(3):
        n = grid[axis]
        taps = [t[axis] for t in terms]
        if _axis_is_banded(n, radii[axis]):
            assert n % _BLOCK == 0, (n, "banded axis must be block-aligned")
            conv.append(np.stack([_banded_stencil(w) for w in taps]))
            corr.append(np.stack([_banded_stencil(w[::-1]) for w in taps]))
        else:
            conv.append(np.stack([_circulant(n, w) for w in taps]))
            corr.append(np.stack([_circulant(n, w[::-1]) for w in taps]))
    return (*conv, *corr)


_EINSUM_BY_AXIS = ("ab,byx->ayx", "ab,zbx->zax", "ab,zyb->zya")

_PRECISIONS = {
    "default": jax.lax.Precision.DEFAULT,
    "high": jax.lax.Precision.HIGH,
    "highest": jax.lax.Precision.HIGHEST,
}


# Einsum strings for the banded block matmul per axis: blocks stay in
# place (no transposes) — the conv axis is split as (nb, B) in situ.
_BANDED_MID = ("ab,nbyx->nayx", "ab,znbx->znax", "ab,zynb->zyna")


def _apply_axis(v, mat, axis: int, prec=jax.lax.Precision.HIGHEST, radius: int = 0):
    """Circular conv along ``axis``: dense circulant or banded stencil."""
    if mat.ndim == 2 and mat.shape[0] == mat.shape[1] and mat.shape[0] == v.shape[axis]:
        return jnp.einsum(_EINSUM_BY_AXIS[axis], mat, v, precision=prec)
    # Block-banded: split the axis in place into (nb, B) blocks. The
    # middle stencil is one batched B x B matmul; neighbor contributions
    # only touch the band (radius rows), so they are tiny (B x r)
    # matmuls over circularly-shifted block tails/heads — no transposes,
    # no full-volume rolls.
    block = mat.shape[0]
    r = radius or block  # radius 0 -> conservative full-block fallback
    n = v.shape[axis]
    nb = n // block
    blocked_shape = v.shape[:axis] + (nb, block) + v.shape[axis + 1 :]
    blocks = v.reshape(blocked_shape)
    nb_axis = axis  # index of the nb dimension in `blocks`
    b_axis = axis + 1

    t_prev = mat[:, block - r : block]  # (B, r): prev block's last rows
    t_mid = mat[:, block : 2 * block]
    t_next = mat[:, 2 * block : 2 * block + r]  # (B, r): next block's head

    mid_str = _BANDED_MID[axis]
    out = jnp.einsum(mid_str, t_mid, blocks, precision=prec)

    def slice_b(arr, start, size):
        idx = [slice(None)] * arr.ndim
        idx[b_axis] = slice(start, start + size)
        return arr[tuple(idx)]

    prev_tails = jnp.roll(slice_b(blocks, block - r, r), 1, axis=nb_axis)
    next_heads = jnp.roll(slice_b(blocks, 0, r), -1, axis=nb_axis)
    edge_str = mid_str.replace("b", "c")  # contract r-sized dim
    out = out + jnp.einsum(edge_str, t_prev, prev_tails, precision=prec)
    out = out + jnp.einsum(edge_str, t_next, next_heads, precision=prec)
    return out.reshape(v.shape)


@partial(
    jax.jit,
    static_argnames=(
        "iterations", "pads", "epsilon", "pad_mode", "precision", "radii",
        "accelerated",
    ),
)
def _rl_sep_jit(
    image,
    cz,
    cy,
    cx,
    tz,
    ty,
    tx,
    *,
    iterations: int,
    pads: tuple[tuple[int, int], ...],
    epsilon: float,
    pad_mode: str,
    precision: str = "high",
    radii: tuple[int, int, int] = (0, 0, 0),
    accelerated: bool = False,
):
    image = image.astype(jnp.float32)
    padded = jnp.pad(image, pads, mode=pad_mode)
    data = jnp.maximum(padded, 0.0)
    est0 = jnp.maximum(padded, epsilon)
    prec = _PRECISIONS[precision]

    def conv3(v, az, ay, ax_):
        # y -> x -> z: measured 33% faster than z-first on v5e (fewer
        # layout transitions between the axis matmuls).
        k = az.shape[0]
        out = jnp.zeros_like(v)
        for i in range(k):
            w = _apply_axis(v, ay[i], 1, prec, radii[1])
            w = _apply_axis(w, ax_[i], 2, prec, radii[2])
            out = out + _apply_axis(w, az[i], 0, prec, radii[0])
        return out

    def step(est, _):
        conv = conv3(est, cz, cy, cx)
        ratio = data / jnp.maximum(conv, epsilon)
        return est * conv3(ratio, tz, ty, tx), None

    est = run_rl_outer([(step, iterations)], est0, accelerated)
    crop = tuple(slice(lo, lo + n) for (lo, _), n in zip(pads, image.shape))
    return est[crop]


def _toeplitz_banded(n: int, taps: np.ndarray) -> np.ndarray:
    """N x N banded Toeplitz: centered LINEAR (zero-boundary) conv."""
    k = len(taps)
    r = k // 2
    mat = np.zeros((n, n), np.float32)
    rows = np.arange(n)
    for i in range(k):
        cols = rows - (i - r)
        ok = (cols >= 0) & (cols < n)
        mat[rows[ok], cols[ok]] += taps[i]
    return mat


# Grid-y extent above which the zero-boundary kernel backend beats the
# circulant matmuls on TPU (measured v5e: wins 28% at y=2908, loses at
# y<=1371 where its layout inflation dominates).
_LINEAR_MIN_Y = 2000


def _resolve_separable_backend(
    backend: str,
    image_shape: tuple[int, ...],
    psf_shape: tuple[int, ...],
    n_terms: int = 1,
) -> str:
    if backend != "auto":
        return backend
    if jax.default_backend() != "tpu":
        return "matmul"
    radii = tuple(k // 2 for k in psf_shape)
    g_shape = tuple(n + 2 * r for n, r in zip(image_shape, radii))
    # Whole-iteration kernel: lowest HBM traffic, but opt-in until the
    # hardware bake-off lands (SHRIMPY_RL_FUSE_ITER=1; docs/kernels.md).
    # The layout VMEM bound scales with the decomposition's term count,
    # so auto must size it with the REAL n_terms: a multi-term PSF that
    # fits at n_terms=1 but not at 3 falls through to 'fused' here
    # instead of failing rl_separable's supported re-check.
    if os.environ.get("SHRIMPY_RL_FUSE_ITER", "0") == "1":
        from shrimpy_tpu.ops.rl_fused_iter import iter_best_layout

        best_it = iter_best_layout(
            tuple(image_shape), tuple(psf_shape), n_terms=n_terms
        )
        if (
            best_it is not None
            and 3 * int(np.prod(best_it[0]["shape"])) * 4 <= 11e9
        ):
            return "fused_iter"
    # The fully fused RL kernel is the fast path whenever the geometry
    # satisfies its constraints (radii fit the block scheme, the y/x
    # extents cover one slab) and ~4 carry-sized buffers fit HBM.
    from shrimpy_tpu.ops.rl_fused import fused_best_layout

    # Evaluate the layout rl_fused would ACTUALLY run (it picks the
    # less-padded of the two y<->x orientations): guarding on the
    # unswapped layout alone mis-sizes the HBM bound and skips
    # geometries only the swapped orientation supports.
    best = fused_best_layout(tuple(image_shape), tuple(psf_shape))
    if (
        best is not None
        and 3 * int(np.prod(best[0]["shape"])) * 4 <= 11e9
    ):
        return "fused"
    g_y = image_shape[1] + 2 * (psf_shape[1] // 2)
    if g_y < _LINEAR_MIN_Y:
        return "matmul"
    # The padded carry has only _LP_BZ halo rows of z pad: a z radius
    # beyond it would clip slab starts and misalign tap weighting in
    # the edge z tiles (the fused layout guards the same bound).
    from shrimpy_tpu.ops.conv3_pallas import _LP_BZ

    if radii[0] > _LP_BZ:
        return "matmul"
    from shrimpy_tpu.ops.conv3_pallas import _LP_BY

    if radii[1] > _LP_BY - 3:
        # Past ~by-3 the quantized y halo slab clips under real rows
        # (lp_layout rejects it loudly); the matmul grid has no bound.
        return "matmul"
    # HBM guard: the padded-carry layout holds ~6 live volume-sized
    # buffers; past ~12 GB the tighter matmul grid is the one that fits.
    from shrimpy_tpu.ops.conv3_pallas import lp_layout

    layout = lp_layout(g_shape, radii[0], radii[1])
    if 6 * int(np.prod(layout["shape"])) * 4 > 12e9:
        return "matmul"
    return "linear_pallas"


# -- zero-boundary fused-kernel RL backend ----------------------------------

_RL_LINEAR_CACHE = LruCache(maxsize=8)


def _rl_sep_linear(image, psf_np, terms, settings, iterations):
    """RL on a permanently zero-padded carry (no in-loop padding).

    Zero-boundary (linear) convolution semantics: the multiplicative RL
    update keeps the pad region exactly zero through every iteration
    (zeros are absorbing; data pads are zero so ratios re-zero too), so
    the z+y Pallas kernel reads the padded carry directly — no wrap or
    alignment pads inside the scan. x runs as a banded-Toeplitz einsum.
    """
    import jax as _jax

    from shrimpy_tpu.ops.conv3_pallas import (
        _convzy_linear_jit,
        lp_layout,
        lp_pad,
        lp_y_stencil,
    )

    from shrimpy_tpu.ops.conv3_pallas import _LP_BZ

    pads = tuple((k // 2, k // 2) for k in psf_np.shape)
    if psf_np.shape[0] // 2 > _LP_BZ:
        raise ValueError(
            f"linear_pallas supports PSF z radius <= {_LP_BZ} (got "
            f"{psf_np.shape[0] // 2}); use separable_backend='matmul'"
        )
    g_shape = tuple(n + lo + hi for n, (lo, hi) in zip(image.shape, pads))
    key = (
        tuple(image.shape),
        psf_np.tobytes(),
        _terms_digest(terms),
        iterations,
        settings.epsilon,
        settings.pad_mode,
        settings.matmul_precision,
        settings.acceleration,
        "linear",
    )
    if key not in _RL_LINEAR_CACHE:
        accel = settings.acceleration == "biggs"
        interpret = _jax.default_backend() != "tpu"
        prec = _PRECISIONS[settings.matmul_precision]
        rz, ry, rx = (k // 2 for k in psf_np.shape)
        layout = lp_layout(g_shape, rz, ry)
        dims = layout["dims"]
        interior = layout["interior"]
        nx_p = layout["nx_p"]

        term_meta = []
        txs, txs_f = [], []
        for wz, wy, wx in terms:
            term_meta.append(
                {
                    "kz": tuple(float(v) for v in wz),
                    "kz_f": tuple(float(v) for v in wz[::-1]),
                    # HOST numpy in the cached closure: a jnp.asarray
                    # made while an OUTER trace is active is that
                    # trace's tracer, and a cache hit from a later
                    # trace would die with UnexpectedTracerError (the
                    # rl_fused kernel fixed the same hazard). They
                    # become constants inside run()'s own jit.
                    "gy": np.asarray(lp_y_stencil(wy, layout)),
                    "gy_f": np.asarray(lp_y_stencil(wy[::-1], layout)),
                    "radii": (len(wz) // 2, len(wy) // 2),
                }
            )
            txs.append(_toeplitz_banded(nx_p, wx))
            txs_f.append(_toeplitz_banded(nx_p, wx[::-1]))
        txs = np.stack(txs)
        txs_f = np.stack(txs_f)
        epsilon = settings.epsilon
        pad_mode = settings.pad_mode

        def conv3(v, flip):
            out = jnp.zeros_like(v)
            for k, tm in enumerate(term_meta):
                h = _convzy_linear_jit(
                    v,
                    tm["gy_f"] if flip else tm["gy"],
                    kz_key=tm["kz_f"] if flip else tm["kz"],
                    radii=tm["radii"],
                    dims=dims,
                    interpret=interpret,
                )
                tx = jnp.asarray((txs_f if flip else txs)[k])
                out = out + jnp.einsum("ab,zyb->zya", tx, h, precision=prec)
            return out

        @_jax.jit
        def run(img):
            g_vol = jnp.pad(img.astype(jnp.float32), pads, mode=pad_mode)
            data = lp_pad(jnp.maximum(g_vol, 0.0), layout)
            est0 = lp_pad(jnp.maximum(g_vol, epsilon), layout)

            def step(est, _):
                conv = conv3(est, False)
                ratio = data / jnp.maximum(conv, epsilon)
                return est * conv3(ratio, True), None

            est = run_rl_outer([(step, iterations)], est0, accel)
            g_out = est[interior]
            crop = tuple(
                slice(lo, lo + n) for (lo, _), n in zip(pads, img.shape)
            )
            return g_out[crop]

        _RL_LINEAR_CACHE[key] = run
    return _RL_LINEAR_CACHE[key](image)


# -- z+y fused Pallas conv backend -----------------------------------------

_RL_ZY_CACHE = LruCache(maxsize=8)


def _rl_sep_zy(image, psf_np, terms, settings, iterations):
    """RL with the fused z+y Pallas kernel + dense-x XLA einsum.

    Grid = image + 2*half exactly (the kernel handles circular halos by
    wrap-padding internally; no block alignment needed). Semantics match
    the circulant oracle on this grid.
    """
    import jax as _jax

    from shrimpy_tpu.ops.conv3_pallas import _convzy_pallas_jit, _y_stencil

    pads = tuple((k // 2, k // 2) for k in psf_np.shape)
    grid = tuple(n + lo + hi for n, (lo, hi) in zip(image.shape, pads))
    key = (
        tuple(image.shape),
        psf_np.tobytes(),
        _terms_digest(terms),
        iterations,
        settings.epsilon,
        settings.pad_mode,
        settings.matmul_precision,
        settings.acceleration,
    )
    if key not in _RL_ZY_CACHE:
        accel = settings.acceleration == "biggs"
        interpret = _jax.default_backend() != "tpu"
        prec = _PRECISIONS[settings.matmul_precision]
        rz, ry, rx = (k // 2 for k in psf_np.shape)
        term_meta = []
        cxs, cxs_f = [], []
        for wz, wy, wx in terms:
            term_meta.append(
                {
                    "kz": tuple(float(v) for v in wz),
                    "kz_f": tuple(float(v) for v in wz[::-1]),
                    # HOST numpy in the cached closure (see the
                    # linear backend above for why).
                    "gy": np.asarray(_y_stencil(wy, 128, len(wy) // 2)),
                    "gy_f": np.asarray(_y_stencil(wy[::-1], 128, len(wy) // 2)),
                    "radii": (len(wz) // 2, len(wy) // 2),
                }
            )
            cxs.append(_circulant(grid[2], wx))
            cxs_f.append(_circulant(grid[2], wx[::-1]))
        cxs = np.stack(cxs)
        cxs_f = np.stack(cxs_f)
        epsilon = settings.epsilon
        pad_mode = settings.pad_mode

        def conv3(v, flip):
            out = jnp.zeros_like(v)
            for k, tm in enumerate(term_meta):
                h = _convzy_pallas_jit(
                    v,
                    tm["gy_f"] if flip else tm["gy"],
                    kz_key=tm["kz_f"] if flip else tm["kz"],
                    radii=tm["radii"],
                    interpret=interpret,
                )
                cx = jnp.asarray((cxs_f if flip else cxs)[k])
                out = out + jnp.einsum("ab,zyb->zya", cx, h, precision=prec)
            return out

        @_jax.jit
        def run(img):
            padded = jnp.pad(img.astype(jnp.float32), pads, mode=pad_mode)
            data = jnp.maximum(padded, 0.0)
            est0 = jnp.maximum(padded, epsilon)

            def step(est, _):
                conv = conv3(est, False)
                ratio = data / jnp.maximum(conv, epsilon)
                return est * conv3(ratio, True), None

            est = run_rl_outer([(step, iterations)], est0, accel)
            crop = tuple(
                slice(lo, lo + n) for (lo, _), n in zip(pads, img.shape)
            )
            return est[crop]

        _RL_ZY_CACHE[key] = run
    return _RL_ZY_CACHE[key](image)


def _sep_pads(
    image_shape: tuple[int, ...], psf_shape: tuple[int, ...]
) -> tuple[tuple[int, int], ...]:
    """Half-PSF padding per axis; banded axes round up to block multiples
    (extra padding uses the same pad_mode and is cropped after —
    semantics match the dense circulant on the same grid)."""
    pads = []
    for n, k in zip(image_shape, psf_shape):
        half = k // 2
        base = n + 2 * half
        if _axis_is_banded(base, half):
            target = -(-base // _BLOCK) * _BLOCK
            extra = target - base
            pads.append((half + extra // 2, half + extra - extra // 2))
        else:
            pads.append((half, half))
    return tuple(pads)


def _crop_psf_support(psf_np: np.ndarray, rel_tol: float) -> np.ndarray:
    """Trim near-zero border planes, preserving the ``k // 2`` centre.

    Measured PSFs arrive in fixed patch sizes (31-41 voxels per axis,
    the bead-extraction geometry) whose outer planes carry ~no mass;
    the kernel radius — hence every backend's cost and the fused/
    linear kernels' z-radius bounds — follows the PATCH size unless the
    support is cropped. Symmetric margins (the min of both sides per
    axis) keep the centre voxel at ``k // 2``; discarded relative mass
    is bounded by ``rel_tol`` per voxel (measured 4e-5 total for a
    Gaussian in a 31-voxel patch at the 1e-5 default).
    """
    if rel_tol <= 0:
        return psf_np
    # Magnitude threshold: user-supplied PSFs (psf_path .npy) may carry
    # negative sidelobes or over-subtracted background; a signed
    # comparison would count those planes as empty and crop arbitrary
    # negative mass past the rel_tol contract.
    mask = np.abs(psf_np) > rel_tol * float(np.abs(psf_np).max())
    slices = []
    for ax in range(psf_np.ndim):
        other = tuple(a for a in range(psf_np.ndim) if a != ax)
        hit = np.argwhere(mask.any(axis=other)).ravel()
        if hit.size == 0:
            return psf_np
        margin = min(int(hit.min()), psf_np.shape[ax] - 1 - int(hit.max()))
        slices.append(slice(margin, psf_np.shape[ax] - margin))
    return psf_np[tuple(slices)]


def _pad_psf_to_odd(psf_np: np.ndarray) -> np.ndarray:
    """Append a zero plane to even-length PSF axes.

    An even-length axis has no symmetric centre: ``taps[::-1]`` around
    ``k // 2`` is then NOT the adjoint (one-voxel offset, verified on
    circulant operators), so the separable backends would run RL's
    correlation step shifted. Appending one trailing zero keeps the
    ``k // 2`` centre element identical (conv unchanged) while making
    every axis odd — the convention all backends and oracles assume.
    """
    pad = [(0, 1 - n % 2) for n in psf_np.shape]
    if not any(hi for _, hi in pad):
        return psf_np
    return np.pad(psf_np, pad)


def _terms_digest(terms) -> tuple:
    """Hashable identity of a separable term set (cache-key component:
    the same PSF bytes under different rank budgets yields different
    terms, which MUST compile to different operators)."""
    return tuple(
        tuple(np.asarray(w, np.float64).tobytes() for w in t) for t in terms
    )


_RL_DONATED_CACHE = LruCache(maxsize=8)


def richardson_lucy(
    image,
    psf,
    settings: DeconvolveSettings | None = None,
    *,
    iterations: int | None = None,
) -> jnp.ndarray:
    """Richardson-Lucy deconvolution of ``image`` by ``psf`` (same ndim).

    Dispatches per ``settings.algorithm``: the circulant-matmul
    separable path when the PSF rank-decomposes within
    ``separable_tol`` (or always for ``"separable"``), the FFT path
    otherwise. jit-compiled per (image shape, psf shape, settings);
    returns a float32 device array of ``image.shape``.
    """
    settings = settings or DeconvolveSettings()
    iters = iterations if iterations is not None else settings.iterations
    image = jnp.asarray(image)
    psf_np = np.asarray(psf, dtype=np.float32)
    psf_np = _pad_psf_to_odd(_crop_psf_support(psf_np, settings.psf_crop_tol))
    assert image.ndim == psf_np.ndim, (image.shape, psf_np.shape)

    if settings.algorithm in ("separable", "hybrid") and psf_np.ndim != 3:
        raise ValueError(
            f"algorithm='{settings.algorithm}' needs a 3-D PSF (got "
            f"{psf_np.ndim}-D); use algorithm='fft'"
        )
    terms = None
    hybrid_terms = None
    if settings.algorithm in ("auto", "separable") and psf_np.ndim == 3:
        terms = plan_separable_terms(psf_np, settings)
        if terms is None and settings.algorithm == "separable":
            raise ValueError(
                "PSF is not separable within separable_tol="
                f"{settings.separable_tol} (<= {settings.max_separable_terms} terms) "
                "and rank-truncation denoising would discard more than "
                f"psf_denoise_max_residual={settings.psf_denoise_max_residual}; "
                "use algorithm='fft' or raise the tolerance"
            )
    elif settings.algorithm == "hybrid" and settings.hybrid_separable_iters:
        hybrid_terms, _ = plan_hybrid_terms(psf_np, settings)

    # donate_input: hand the caller's device buffer to the program —
    # the raw volume is dead once the padded carries are built, so
    # donation frees one volume of HBM for the iteration arena (what
    # fits the Biggs-accelerated production carry single-chip; schema
    # docs). Implemented ONCE here at the dispatch boundary so every
    # backend honors it identically: the donated outer jit inlines the
    # backend's own cached jit. Skipped under an enclosing trace
    # (pipeline callers), where buffer liveness is already automatic.
    if getattr(settings, "donate_input", False) and not isinstance(
        image, jax.core.Tracer
    ):
        key = (
            tuple(image.shape), str(image.dtype), psf_np.tobytes(),
            settings.model_dump_json(), iters,
        )
        if key not in _RL_DONATED_CACHE:
            inner = settings.model_copy(update={"donate_input": False})

            def run(img):
                if hybrid_terms is not None:
                    return rl_hybrid(img, psf_np, hybrid_terms, inner, iters)
                if terms is not None:
                    return rl_separable(img, psf_np, terms, inner, iters)
                return rl_fft(img, psf_np, inner, iters)

            _RL_DONATED_CACHE[key] = jax.jit(run, donate_argnums=0)
        return _RL_DONATED_CACHE[key](image)

    if hybrid_terms is not None:
        return rl_hybrid(image, psf_np, hybrid_terms, settings, iters)

    if terms is not None:
        return rl_separable(image, psf_np, terms, settings, iters)

    return rl_fft(image, psf_np, settings, iters)


def rl_separable(image, psf_np, terms, settings, iterations: int):
    """Separable-path RL: resolve the backend for THIS image shape and
    run it. The single dispatch point shared by :func:`richardson_lucy`
    and the pipeline (``parallel/pipeline.py``), so a new backend or a
    changed pads/grid convention can never leave one caller behind.
    """
    backend = _resolve_separable_backend(
        settings.separable_backend,
        tuple(image.shape),
        tuple(psf_np.shape),
        n_terms=len(terms),
    )
    if backend == "fused_iter":
        from shrimpy_tpu.ops.rl_fused_iter import (
            rl_fused_iter,
            rl_iter_supported,
        )

        if not rl_iter_supported(
            tuple(image.shape), tuple(psf_np.shape), n_terms=len(terms)
        ):
            raise ValueError(
                "geometry/PSF outside the fused_iter kernel's constraints "
                f"(image {tuple(image.shape)}, psf {tuple(psf_np.shape)}); "
                "use separable_backend='fused' or 'matmul'"
            )
        return rl_fused_iter(image, psf_np, terms, settings, iterations)
    if backend == "fused":
        from shrimpy_tpu.ops.rl_fused import rl_fused, rl_fused_supported

        if not rl_fused_supported(tuple(image.shape), tuple(psf_np.shape)):
            raise ValueError(
                "geometry/PSF outside the fused kernel's constraints "
                f"(image {tuple(image.shape)}, psf {tuple(psf_np.shape)}); "
                "use separable_backend='linear_pallas' or 'matmul'"
            )
        return rl_fused(image, psf_np, terms, settings, iterations)
    if backend == "linear_pallas":
        return _rl_sep_linear(image, psf_np, terms, settings, iterations)
    if backend == "zy_pallas":
        return _rl_sep_zy(image, psf_np, terms, settings, iterations)
    pads = _sep_pads(tuple(image.shape), tuple(psf_np.shape))
    grid = tuple(n + lo + hi for n, (lo, hi) in zip(image.shape, pads))
    radii = tuple(k // 2 for k in psf_np.shape)
    mats = _sep_matrices_device(terms, grid, radii)
    return _rl_sep_jit(
        image,
        *mats,
        iterations=iterations,
        pads=pads,
        epsilon=settings.epsilon,
        pad_mode=settings.pad_mode,
        precision=settings.matmul_precision,
        radii=radii,
        accelerated=settings.acceleration == "biggs",
    )


def resolve_fft_backend(settings: DeconvolveSettings, ndim: int) -> str:
    """The concrete backend ``fft_backend='auto'`` resolves to.

    Single source of truth shared by :func:`rl_fft` and the bench
    record (bench config 6 labels its measurement with this), so the
    recorded backend can never diverge from what actually ran.
    dft2z (matmul-DFT) only where the MXU justifies it — on CPU/GPU the
    O(N log N) FFT wins (``ops/dft.py::default_transform``).
    """
    fft_backend = settings.fft_backend
    if fft_backend == "auto":
        matmul = dft_default_transform() == "matmul"
        fft_backend = (
            ("dft2z" if matmul else "fft2z") if ndim == 3 else "fft3"
        )
    return fft_backend


def rl_fft(image, psf_np, settings, iterations: int, init=None):
    """FFT-path RL honoring ``settings.fft_backend`` (auto/fft3/fft2z).

    The single dispatch point for the non-separable fallback — used by
    :func:`richardson_lucy` AND the runtime pipeline
    (``parallel/pipeline.py``), so ``fft_backend``/``fft_z_chunk`` are
    never silently inert in either path. ``init`` (image-shaped,
    positive) warm-starts the iteration in place of the flat data
    start — the data term stays ``image`` (see :func:`rl_hybrid`).
    """
    fft_backend = resolve_fft_backend(settings, image.ndim)
    grid, pads = _padded_grid_shape(
        tuple(image.shape),
        tuple(psf_np.shape),
        transform="matmul" if fft_backend in ("dft2z", "dft3", "dftz") else "xla",
    )
    if fft_backend in ("fft2z", "dft2z", "dft3", "dftz") and image.ndim != 3:
        raise ValueError(
            f"fft_backend='{fft_backend}' needs a 3-D volume (got "
            f"{image.ndim}-D); use fft_backend='fft3'"
        )
    accelerated = settings.acceleration == "biggs"
    if fft_backend == "dftz":
        return _rl_dftz_jit(
            image,
            jnp.asarray(psf_np),
            init,
            iterations=iterations,
            grid=grid,
            pads=pads,
            epsilon=settings.epsilon,
            pad_mode=settings.pad_mode,
            z_chunk=_fft2z_chunk(grid[0], settings.fft_z_chunk),
            accelerated=accelerated,
        )
    if fft_backend in ("fft2z", "dft2z"):
        return _rl_fft2z_jit(
            image,
            jnp.asarray(psf_np),
            init,
            iterations=iterations,
            grid=grid,
            pads=pads,
            epsilon=settings.epsilon,
            pad_mode=settings.pad_mode,
            z_chunk=_fft2z_chunk(grid[0], settings.fft_z_chunk),
            transform="matmul" if fft_backend == "dft2z" else "xla",
            accelerated=accelerated,
        )
    return _rl_jit(
        image,
        jnp.asarray(psf_np),
        init,
        iterations=iterations,
        grid=grid,
        pads=pads,
        epsilon=settings.epsilon,
        pad_mode=settings.pad_mode,
        transform="matmul" if fft_backend == "dft3" else "xla",
        accelerated=accelerated,
    )


def richardson_lucy_reference_separable(
    image: np.ndarray,
    psf: np.ndarray,
    iterations: int = 20,
    *,
    epsilon: float = 1e-6,
    pad_mode: str = "reflect",
    tol: float = 1e-4,
    max_terms: int = 6,
    pads: tuple[tuple[int, int], ...] | None = None,
    boundary: str = "circular",
    terms: list | None = None,
    psf_crop_tol: float = 1e-5,
) -> np.ndarray:
    """Trusted fp64 oracle of the separable matmul paths.

    ``pads`` overrides the grid (the pallas backends use exact half-PSF
    pads without block rounding). ``boundary``: "circular" (circulant
    matrices — the matmul/zy backends) or "zero" (banded Toeplitz — the
    linear_pallas/fused backends). ``terms`` overrides the internal
    decomposition (used to oracle the rank-truncated denoised path).
    """
    image = np.asarray(image, dtype=np.float64)
    # psf_crop_tol must MATCH the backend under test (the production
    # path crops at settings.psf_crop_tol) or oracle and backend see
    # different effective PSFs.
    psf = _pad_psf_to_odd(
        _crop_psf_support(np.asarray(psf, np.float64), psf_crop_tol)
    )
    psf_unit = psf / psf.sum()
    if terms is None:
        terms = separable_decompose(psf_unit, tol=tol, max_terms=max_terms)
    assert terms is not None, "PSF not separable within tol"
    if pads is None:
        pads = _sep_pads(tuple(image.shape), tuple(psf.shape))
    grid = tuple(n + lo + hi for n, (lo, hi) in zip(image.shape, pads))
    build = _circulant if boundary == "circular" else _toeplitz_banded
    # Always-dense fp64 matrices (the banded/kernel forms are exact
    # block decompositions of these, so one oracle covers all paths).
    mats = []
    for which in (1, -1):
        for axis in range(3):
            mats.append(
                np.stack(
                    [
                        build(grid[axis], t[axis][::which]).astype(np.float64)
                        for t in terms
                    ]
                )
            )
    cz, cy, cx, tz, ty, tx = mats

    def conv3(v, az, ay, ax_):
        out = np.zeros_like(v)
        for i in range(az.shape[0]):
            w = np.einsum("ab,byx->ayx", az[i], v)
            w = np.einsum("ab,zbx->zax", ay[i], w)
            out = out + np.einsum("ab,zyb->zya", ax_[i], w)
        return out

    padded = np.pad(image, pads, mode=pad_mode)
    data = np.maximum(padded, 0.0)
    est = np.maximum(padded, epsilon)
    for _ in range(iterations):
        conv = conv3(est, cz, cy, cx)
        est = est * conv3(data / np.maximum(conv, epsilon), tz, ty, tx)
    crop = tuple(slice(lo, lo + n) for (lo, _), n in zip(pads, image.shape))
    return est[crop].astype(np.float32)


def richardson_lucy_reference(
    image: np.ndarray,
    psf: np.ndarray,
    iterations: int = 20,
    *,
    epsilon: float = 1e-6,
    pad_mode: str = "reflect",
    psf_crop_tol: float = 1e-5,
    grid_transform: str = "xla",
) -> np.ndarray:
    """Trusted fp64 numpy oracle: the identical update rule on the same grid.

    ``psf_crop_tol`` must match the backend under test (production
    crops at ``settings.psf_crop_tol``). ``grid_transform`` must match
    the backend's transform family ("matmul" for dft2z/dftz/dft3) — the
    grid is transform-dependent, and the circular update's wrap
    distance with it."""
    image = np.asarray(image, dtype=np.float64)
    psf = _pad_psf_to_odd(
        _crop_psf_support(np.asarray(psf, np.float64), psf_crop_tol)
    )
    grid, pads = _padded_grid_shape(
        tuple(image.shape), tuple(psf.shape), transform=grid_transform
    )

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
