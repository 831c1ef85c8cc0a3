"""Oblique-plane light-sheet deskew (shear-affine trilinear resample).

Replaces the reference's delegation to ``biahub.deskew.fast_deskew_zyx``
(reference ``shrimpy/dynatrack/preprocessing.py:277-294``,
``scripts/measure_psf.py:223-250``, parameter surface documented in
``config/mda/mantis/dynatrack_demo.yaml`` deskew block) with a
first-party TPU implementation.

Geometry
--------
Raw volumes are indexed ``raw[s, t, x]`` — (SCAN, TILT, COVERSLIP), the
mantis light-sheet axis labels (``scripts/measure_psf.py:91``). The
light sheet is inclined at ``theta = ls_angle_deg`` to the coverslip and
the sample is scanned along the coverslip. In units of the camera pixel
size, raw pixel ``(s, t, x)`` sits at lab coordinates::

    z_lab = t * sin(theta)
    y_lab = s / r + t * cos(theta)       r = px_to_scan_ratio
    x_lab = x

The deskewed volume samples the lab frame on a unit grid:
``out[zo, yo, xo]`` = trilinear sample of the raw volume at::

    t = zo / sin(theta)
    s = r * ((yo + y_offset) - zo / tan(theta))
    x = xo

which is the inverse shear-affine transform

    ``(s, t, x)^T = M @ (zo, yo, xo)^T + b``   (see
    :func:`deskew_affine_matrix`) — exactly the matrix the scipy oracle
    ``scipy.ndimage.affine_transform`` consumes, so parity is tested
    against scipy at order=1 (BASELINE.json configs[0]).

``keep_overhang`` (reference semantics: include the partially-sampled
triangular overhang regions):

* ``True``  — the output spans the full parallelogram footprint,
  ``y_offset = 0``; out-of-range samples fill with 0.
* ``False`` — the output is cropped to the fully-sampled band
  ``y_lab in [(nt-1)*cos(theta), (ns-1)/r]`` so every voxel is a valid
  interpolation (no fill), ``y_offset = (nt-1)*cos(theta)``.

``average_n_slices = n`` bins the deskewed z-axis in groups of ``n`` by
mean (a partial final group is averaged over its actual size), matching
the reference's decimated-z output (``measure_psf.py:223-235``).

TPU mapping
-----------
The shear structure makes the per-output-z sampling *separable*: the
tilt coordinate ``t`` depends only on ``zo``, and the scan coordinate
``s`` is affine in ``yo`` with a per-z offset. The XLA path expresses
the resample as four row-gathers (contiguous X-rows — TPU-lane friendly)
plus a fused lerp, which XLA compiles to gather + elementwise fusion; a
fused Pallas kernel (:mod:`shrimpy_tpu.ops.deskew_pallas`) exploits the
same structure with explicit VMEM staging.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from shrimpy_tpu.config.schemas import DeskewSettings


def _geometry(
    raw_shape_szx: tuple[int, int, int], settings: DeskewSettings
) -> dict:
    """Static deskew geometry: output extents and the y crop offset."""
    theta = math.radians(settings.ls_angle_deg)
    r = settings.require_ratio()
    ns, nt, nx = raw_shape_szx
    sin_t, cos_t = math.sin(theta), math.cos(theta)

    if settings.keep_overhang:
        # Full parallelogram footprint; the rim blends toward cval=0
        # exactly as scipy's order-1 'constant' boundary does.
        nz_full = int(math.ceil((nt - 1) * sin_t)) + 1
        y_offset = 0.0
        ny = int(math.ceil((ns - 1) / r + (nt - 1) * cos_t)) + 1
    else:
        # Fully-sampled band only: every output voxel is a valid
        # interpolation of in-range raw samples (floor, not ceil).
        nz_full = int(math.floor((nt - 1) * sin_t)) + 1
        y_offset = (nt - 1) * cos_t
        ny = int(math.floor((ns - 1) / r - (nt - 1) * cos_t)) + 1
        if ny < 1:
            raise ValueError(
                "deskew: the fully-sampled band is empty for raw shape "
                f"{raw_shape_szx} at ls_angle_deg={settings.ls_angle_deg}, "
                f"px_to_scan_ratio={r}; use keep_overhang=True"
            )
    return {
        "theta": theta,
        "r": r,
        "sin_t": sin_t,
        "cos_t": cos_t,
        "nz_full": nz_full,
        "ny": ny,
        "nx": nx,
        "y_offset": y_offset,
    }


def get_deskewed_shape(
    raw_shape_szx: tuple[int, int, int],
    settings: DeskewSettings,
    pixel_size_um: float | None = None,
) -> tuple[tuple[int, int, int], tuple[float, float, float]]:
    """Output ``(Z, Y, X)`` shape and voxel size (um) of the deskew.

    The counterpart of biahub's ``get_deskewed_data_shape`` as used at
    reference ``preprocessing.py:167-178``. Voxel size is
    ``(n_avg * px, px, px)`` with ``px`` the camera pixel size: THIS
    implementation's output z grid is one camera pixel per slice — the
    resample takes ``t = zo / sin(theta)`` so ``z_lab(zo) = zo * px``
    (and consistently, ``nz_full = (nt-1)*sin(theta) + 1`` slices span
    the physical z extent ``(nt-1)*px*sin(theta)``). The earlier
    ``px*sin(theta)`` figure described a tilt-pitch z grid this kernel
    never produced and understated the physical z spacing 2x at 30 deg.
    """
    g = _geometry(raw_shape_szx, settings)
    n = settings.average_n_slices
    nz = -(-g["nz_full"] // n)
    px = pixel_size_um if pixel_size_um is not None else (settings.pixel_size_um or 1.0)
    voxel = (n * px, px, px)
    return (nz, g["ny"], g["nx"]), voxel


def deskew_affine_matrix(
    raw_shape_szx: tuple[int, int, int], settings: DeskewSettings
) -> tuple[np.ndarray, np.ndarray, tuple[int, int, int]]:
    """``(matrix, offset, output_shape)`` of the inverse map for scipy.

    ``scipy.ndimage.affine_transform(raw, matrix, offset, output_shape,
    order=1, mode='grid-constant', cval=0)`` with these values is the CPU
    oracle for :func:`deskew_volume` (before z-averaging).
    """
    g = _geometry(raw_shape_szx, settings)
    m = np.array(
        [
            [-g["r"] / math.tan(g["theta"]), g["r"], 0.0],
            [1.0 / g["sin_t"], 0.0, 0.0],
            [0.0, 0.0, 1.0],
        ]
    )
    offset = np.array([g["r"] * g["y_offset"], 0.0, 0.0])
    return m, offset, (g["nz_full"], g["ny"], g["nx"])


def _average_z_groups(vol: jnp.ndarray, n: int) -> jnp.ndarray:
    """Mean over groups of ``n`` z-slices; partial tail averaged over its size."""
    if n <= 1:
        return vol
    nz = vol.shape[0]
    n_groups = -(-nz // n)
    pad = n_groups * n - nz
    padded = jnp.pad(vol, ((0, pad), (0, 0), (0, 0)))
    sums = padded.reshape(n_groups, n, *vol.shape[1:]).sum(axis=1)
    counts = jnp.minimum(
        jnp.arange(1, n_groups + 1) * n, nz
    ) - jnp.arange(n_groups) * n
    return sums / counts[:, None, None].astype(vol.dtype)


@partial(jax.jit, static_argnames=("ls_angle_deg", "px_to_scan_ratio", "keep_overhang", "average_n_slices"))
def _deskew_xla(
    raw: jnp.ndarray,
    *,
    ls_angle_deg: float,
    px_to_scan_ratio: float,
    keep_overhang: bool,
    average_n_slices: int,
) -> jnp.ndarray:
    settings = DeskewSettings(
        ls_angle_deg=ls_angle_deg,
        px_to_scan_ratio=px_to_scan_ratio,
        keep_overhang=keep_overhang,
        average_n_slices=average_n_slices,
    )
    g = _geometry(raw.shape, settings)
    ns, nt, _ = raw.shape
    nz, ny = g["nz_full"], g["ny"]

    raw = raw.astype(jnp.float32)

    # Tilt coordinate: depends only on output z.
    zo = jnp.arange(nz, dtype=jnp.float32)
    t = zo / g["sin_t"]
    t0f = jnp.floor(t)
    frac_t = t - t0f
    t0i = t0f.astype(jnp.int32)
    t1i = t0i + 1
    # Out-of-range tilt planes contribute 0 (scipy 'constant' boundary).
    wt0 = jnp.where((t0i >= 0) & (t0i <= nt - 1), 1.0 - frac_t, 0.0)[:, None, None]
    wt1 = jnp.where((t1i >= 0) & (t1i <= nt - 1), frac_t, 0.0)[:, None, None]
    t0 = jnp.clip(t0i, 0, nt - 1)
    t1 = jnp.clip(t1i, 0, nt - 1)

    # Scan coordinate: affine in output y with a per-z offset.
    yo = jnp.arange(ny, dtype=jnp.float32)
    s = g["r"] * ((yo[None, :] + g["y_offset"]) - zo[:, None] / math.tan(g["theta"]))
    s0f = jnp.floor(s)
    ws = s - s0f  # (nz, ny)
    s0 = s0f.astype(jnp.int32)
    s1 = s0 + 1

    if keep_overhang:
        # Out-of-range samples contribute 0 (cval) with zeroed weights —
        # matches scipy's order-1 'constant' boundary: a sample between
        # the last voxel and cval blends toward 0.
        valid_s0 = (s0 >= 0) & (s0 <= ns - 1)
        valid_s1 = (s1 >= 0) & (s1 <= ns - 1)
        s0c = jnp.clip(s0, 0, ns - 1)
        s1c = jnp.clip(s1, 0, ns - 1)
        w00 = jnp.where(valid_s0, (1 - ws), 0.0)
        w01 = jnp.where(valid_s1, ws, 0.0)
    else:
        # Fully-sampled band: indices are in range by construction (up to
        # float round-off at the rim, so clip defensively).
        s0c = jnp.clip(s0, 0, ns - 1)
        s1c = jnp.clip(s1, 0, ns - 1)
        w00, w01 = (1 - ws), ws

    # Four row-gathers: (nz, ny) indices into the scan/tilt grid, each
    # pulling a contiguous X-row. take_along_axis keeps XLA on the fast
    # gather path.
    def sample(t_idx: jnp.ndarray) -> jnp.ndarray:
        # t_idx: (nz,) tilt plane per output z -> planes (nz, ns, nx)
        planes = jnp.take(raw, t_idx, axis=1)  # (ns, nz, nx)
        planes = jnp.moveaxis(planes, 0, 1)  # (nz, ns, nx)
        row0 = jnp.take_along_axis(planes, s0c[:, :, None], axis=1)
        row1 = jnp.take_along_axis(planes, s1c[:, :, None], axis=1)
        return w00[:, :, None] * row0 + w01[:, :, None] * row1

    out = wt0 * sample(t0) + wt1 * sample(t1)
    return _average_z_groups(out, average_n_slices)


def deskew_volume(raw_szx, settings: DeskewSettings) -> jnp.ndarray:
    """Deskew a raw (scan, tilt, x) volume -> (Z, Y, X) lab-frame volume.

    Dispatches on ``settings.backend``: the fused Pallas kernel when
    requested (or on TPU under ``"auto"``), else the jit-compiled XLA
    gather path (cached per raw shape + settings).
    """
    use_pallas = settings.backend == "pallas" or (
        settings.backend == "auto" and jax.default_backend() == "tpu"
    )
    if use_pallas:
        from shrimpy_tpu.ops.deskew_pallas import deskew_volume_pallas

        return deskew_volume_pallas(raw_szx, settings)
    return _deskew_xla(
        jnp.asarray(raw_szx),
        ls_angle_deg=settings.ls_angle_deg,
        px_to_scan_ratio=settings.require_ratio(),
        keep_overhang=settings.keep_overhang,
        average_n_slices=settings.average_n_slices,
    )


def deskew_reference_scipy(raw_szx: np.ndarray, settings: DeskewSettings) -> np.ndarray:
    """Trusted CPU oracle: scipy.ndimage.affine_transform at order=1."""
    from scipy import ndimage

    m, offset, out_shape = deskew_affine_matrix(raw_szx.shape, settings)
    # 'grid-constant' (not 'constant'): rim samples blend linearly toward
    # cval=0, matching the masked-weight blending of the XLA/Pallas
    # kernels; scipy's plain 'constant' snaps any out-of-extent
    # coordinate to cval without interpolation.
    out = ndimage.affine_transform(
        raw_szx.astype(np.float64),
        m,
        offset=offset,
        output_shape=out_shape,
        order=1,
        mode="grid-constant",
        cval=0.0,
    )
    if settings.average_n_slices > 1:
        n = settings.average_n_slices
        nz = out.shape[0]
        groups = [
            out[i : min(i + n, nz)].mean(axis=0) for i in range(0, nz, n)
        ]
        out = np.stack(groups)
    return out.astype(np.float32)
