"""Fused Pallas deskew kernel (shear-affine resample on the MXU).

The core TPU deliverable named in SURVEY.md §7: the oblique-plane
deskew exploits the shear structure — the tilt coordinate depends only
on output z, and the scan coordinate is affine in output y — so the
resample is NOT a general gather. For each (z, y-block) output tile:

1. the two needed tilt planes' scan-row band (``S_SPAN`` rows, affine
   in y so the band is contiguous) is DMA'd HBM -> VMEM;
2. the trilinear weights collapse into a tiny banded interpolation
   matrix ``G`` (built in-register from iota comparisons, two non-zeros
   per row);
3. the tile is produced by two ``(B x S_SPAN) @ (S_SPAN x X)`` MXU
   matmuls blended by the tilt weights.

One pass over the data (the XLA path materializes per-z tilt-plane
copies), all FLOPs on the MXU at float32 precision. Geometry and
weights are precomputed host-side by :func:`_plan`; semantics are
identical to :func:`shrimpy_tpu.ops.deskew.deskew_volume` (same scipy
oracle, reference ``preprocessing.py:277-294``).
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from shrimpy_tpu.config.schemas import DeskewSettings
from shrimpy_tpu.ops.deskew import _average_z_groups, _geometry

BLOCK_Y = 128
LANES = 128


def _round_up(n: int, m: int) -> int:
    return -(-n // m) * m


def _plan(raw_shape_szx: tuple[int, int, int], settings: DeskewSettings) -> dict:
    """Host-side geometry: per-(z, y) indices/weights, per-block DMA starts."""
    g = _geometry(raw_shape_szx, settings)
    ns, nt, nx = raw_shape_szx
    nz, ny = g["nz_full"], g["ny"]
    r, theta = g["r"], g["theta"]

    ny_pad = _round_up(ny, BLOCK_Y)
    nyb = ny_pad // BLOCK_Y
    # +8: DMA starts are quantized down to sublane multiples (Mosaic
    # requires provably 8-divisible dynamic slice starts).
    span = int(math.ceil(r * (BLOCK_Y - 1))) + 3 + 8
    span = _round_up(span, 8)
    ns_eff = max(ns, span)  # raw is zero-padded in scan if shorter

    zz = np.arange(nz, dtype=np.float64)
    yy = np.arange(ny_pad, dtype=np.float64)

    # Tilt plane indices / weights (depend on z only).
    t = zz / g["sin_t"]
    t0 = np.floor(t).astype(np.int64)
    frac_t = t - t0
    wt0 = np.where((t0 >= 0) & (t0 <= nt - 1), 1.0 - frac_t, 0.0)
    wt1 = np.where((t0 + 1 >= 0) & (t0 + 1 <= nt - 1), frac_t, 0.0)
    t_idx = np.stack(
        [np.clip(t0, 0, nt - 1), np.clip(t0 + 1, 0, nt - 1)], axis=1
    ).astype(np.int32)
    wt = np.stack([wt0, wt1], axis=1).astype(np.float32)

    # Scan coordinate (z, y): affine in y.
    s = r * ((yy[None, :] + g["y_offset"]) - zz[:, None] / math.tan(theta))
    s0 = np.floor(s).astype(np.int64)
    ws = (s - s0).astype(np.float64)

    # Per-(z, y-block) DMA start: the band's first needed row, clamped
    # and quantized down to a sublane (8) multiple.
    s_first = s0[:, ::BLOCK_Y]  # (nz, nyb) — min s0 within each block
    s_lo = np.clip(s_first, 0, max(ns_eff - span, 0)).astype(np.int64)
    s_lo = ((s_lo // 8) * 8).astype(np.int32)

    # Interpolation weights with validity masks (zero outside the raw
    # scan extent or outside the DMA'd band — matches the XLA/scipy
    # 'grid-constant' boundary blending).
    s_lo_full = np.repeat(s_lo, BLOCK_Y, axis=1)[:, :ny_pad]
    local = s0 - s_lo_full
    valid0 = (s0 >= 0) & (s0 <= ns - 1) & (local >= 0) & (local <= span - 1)
    valid1 = (s0 + 1 >= 0) & (s0 + 1 <= ns - 1) & (local + 1 >= 0) & (
        local + 1 <= span - 1
    )
    w00 = np.where(valid0, 1.0 - ws, 0.0).astype(np.float32)
    w01 = np.where(valid1, ws, 0.0).astype(np.float32)
    # Padded y rows (>= ny) produce zeros.
    w00[:, ny:] = 0.0
    w01[:, ny:] = 0.0
    # Independent local columns for the two taps: when one side is
    # clipped (weight already zeroed) the other must still point at its
    # true row.
    s0_local = np.clip(local, 0, span - 1).astype(np.int32)
    s1_local = np.clip(local + 1, 0, span - 1).astype(np.int32)

    # Pack the per-(z, y) metadata into one (nz, nyb, 8, BLOCK_Y) f32
    # tensor so its VMEM block is (1, 1, 8, 128) — the TPU lowering
    # requires the last two block dims to be (8, 128)-aligned. Rows:
    # 0 = w00, 1 = w01, 2 = s0_local, 3 = s1_local (exact small ints in
    # f32), 4 = wt0 (broadcast), 5 = wt1 (broadcast), 6-7 unused.
    meta = np.zeros((nz, nyb, 8, BLOCK_Y), np.float32)
    meta[:, :, 0, :] = w00.reshape(nz, nyb, BLOCK_Y)
    meta[:, :, 1, :] = w01.reshape(nz, nyb, BLOCK_Y)
    meta[:, :, 2, :] = s0_local.reshape(nz, nyb, BLOCK_Y)
    meta[:, :, 3, :] = s1_local.reshape(nz, nyb, BLOCK_Y)
    meta[:, :, 4, :] = wt[:, 0][:, None, None]
    meta[:, :, 5, :] = wt[:, 1][:, None, None]

    return {
        "nz": nz,
        "ny": ny,
        "ny_pad": ny_pad,
        "nyb": nyb,
        "span": span,
        "ns_eff": ns_eff,
        "nx": nx,
        "s_lo": s_lo,
        "t_idx": t_idx,
        "meta": meta,
    }


def _kernel(
    s_lo_ref,  # (nz, nyb) int32, scalar-prefetch
    t_idx_ref,  # (nz, 2) int32, scalar-prefetch
    raw_ref,  # (T, S_eff, Xp) f32, HBM
    meta_ref,  # (1, 1, 8, BLOCK_Y) f32: w00/w01/s0/s1/wt0/wt1 rows
    out_ref,  # (1, BLOCK_Y, Xp) f32
    vm,  # (2 slots, 2 tilt planes, span, Xp)
    sems,  # DMA sems, (2, 2)
    *,
    nyb: int,
):
    z = pl.program_id(0)
    yb = pl.program_id(1)
    s = z * nyb + yb
    total = pl.num_programs(0) * nyb
    span = vm.shape[2]

    def band_dma(step, plane):
        """DMA of `plane`'s scan band for flat step index `step`."""
        z2 = step // nyb
        yb2 = jax.lax.rem(step, nyb)
        s_lo = pl.multiple_of(s_lo_ref[z2, yb2], 8)
        slot = jax.lax.rem(step, 2)
        return pltpu.make_async_copy(
            raw_ref.at[t_idx_ref[z2, plane], pl.ds(s_lo, span), :],
            vm.at[slot, plane],
            sems.at[slot, plane],
        )

    # One-step-deep double buffering: step s+1's bands transfer while
    # step s computes (the round-1 kernel waited on its own DMAs inside
    # every step — pure serialization, ~2x on the production volume).
    @pl.when(s == 0)
    def _():
        band_dma(0, 0).start()
        band_dma(0, 1).start()

    @pl.when(s + 1 < total)
    def _():
        band_dma(s + 1, 0).start()
        band_dma(s + 1, 1).start()

    meta = meta_ref[0, 0]  # (8, BLOCK_Y)
    s0 = meta[2, :].astype(jnp.int32)
    s1 = meta[3, :].astype(jnp.int32)
    # Banded interpolation matrix: two non-zeros per output row.
    cols = jax.lax.broadcasted_iota(jnp.int32, (BLOCK_Y, span), 1)
    gmat = jnp.where(cols == s0[:, None], meta[0, :][:, None], 0.0) + jnp.where(
        cols == s1[:, None], meta[1, :][:, None], 0.0
    )

    slot = jax.lax.rem(s, 2)
    band_dma(s, 0).wait()
    band_dma(s, 1).wait()
    r0 = jnp.dot(
        gmat, vm[slot, 0], preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    r1 = jnp.dot(
        gmat, vm[slot, 1], preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    out_ref[0] = meta[4, 0] * r0 + meta[5, 0] * r1


@partial(
    jax.jit,
    static_argnames=(
        "ls_angle_deg", "px_to_scan_ratio", "keep_overhang",
        "average_n_slices", "interpret",
    ),
)
def _deskew_pallas_jit(
    raw,
    *,
    ls_angle_deg: float,
    px_to_scan_ratio: float,
    keep_overhang: bool,
    average_n_slices: int,
    interpret: bool,
):
    settings = DeskewSettings(
        ls_angle_deg=ls_angle_deg,
        px_to_scan_ratio=px_to_scan_ratio,
        keep_overhang=keep_overhang,
        average_n_slices=average_n_slices,
    )
    plan = _plan(tuple(raw.shape), settings)
    nz, ny_pad, nyb = plan["nz"], plan["ny_pad"], plan["nyb"]
    span, ns_eff, nx = plan["span"], plan["ns_eff"], plan["nx"]
    xp = _round_up(nx, LANES)

    # (T, S_eff, Xp) layout: per-tilt-plane scan rows are contiguous for
    # the banded DMA; X padded to full lanes.
    raw_t = jnp.moveaxis(raw.astype(jnp.float32), 1, 0)
    raw_t = jnp.pad(
        raw_t,
        ((0, 0), (0, ns_eff - raw.shape[0]), (0, xp - nx)),
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nz, nyb),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # raw, DMA'd manually
            pl.BlockSpec(
                (1, 1, 8, BLOCK_Y),
                lambda z, yb, *_: (z, yb, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, BLOCK_Y, xp), lambda z, yb, *_: (z, yb, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((2, 2, span, xp), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )

    out = pl.pallas_call(
        partial(_kernel, nyb=nyb),
        out_shape=jax.ShapeDtypeStruct((nz, ny_pad, xp), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(
        jnp.asarray(plan["s_lo"]),
        jnp.asarray(plan["t_idx"]),
        raw_t,
        jnp.asarray(plan["meta"]),
    )
    out = out[:, : plan["ny"], :nx]
    return _average_z_groups(out, average_n_slices)


def deskew_volume_pallas(
    raw_szx, settings: DeskewSettings, *, interpret: bool | None = None
) -> jnp.ndarray:
    """Fused Pallas deskew; semantics of
    :func:`shrimpy_tpu.ops.deskew.deskew_volume`.

    ``interpret`` defaults to True off-TPU (tests on the CPU mesh run
    the kernel in the Pallas interpreter).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _deskew_pallas_jit(
        jnp.asarray(raw_szx),
        ls_angle_deg=settings.ls_angle_deg,
        px_to_scan_ratio=settings.require_ratio(),
        keep_overhang=settings.keep_overhang,
        average_n_slices=settings.average_n_slices,
        interpret=interpret,
    )
