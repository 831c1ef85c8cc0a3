"""Fused Pallas deskew kernel (shear-affine resample on the MXU).

The core TPU deliverable named in SURVEY.md §7: the oblique-plane
deskew exploits the shear structure — the tilt coordinate depends only
on output z, and the scan coordinate is affine in output y — so the
resample is NOT a general gather. For each (z-block, y-block) output
tile:

1. ONE 3-D DMA stages the union band: the ``T_SPAN`` tilt planes and
   ``S_SPAN`` scan rows that cover all ``BLOCK_Z`` output slices of the
   tile (both extents are affine in z, so the union is a contiguous
   box), double-buffered against the previous step's compute;
2. per output z, the trilinear weights collapse into a tiny banded
   interpolation matrix ``G`` (built in-register from iota comparisons,
   two non-zeros per row);
3. each slice is produced by two ``(B x S_SPAN) @ (S_SPAN x X)`` MXU
   matmuls blended by the tilt weights.

One pass over the data (the XLA path materializes per-z tilt-plane
copies), all FLOPs on the MXU at float32 precision. Batching BLOCK_Z
slices per grid step amortizes the per-step dispatch + DMA-issue
overhead that dominated the per-z kernel (24 us/step at 2944 steps on
the production volume). Geometry and weights are precomputed host-side
by :func:`_plan`; semantics are identical to
:func:`shrimpy_tpu.ops.deskew.deskew_volume` (same scipy oracle,
reference ``preprocessing.py:277-294``).
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
from shrimpy_tpu.ops.deskew import _geometry

BLOCK_Y = 128
BLOCK_Z = 8
LANES = 128
# meta rows per z: w00, w01, s0_local, s1_local, wt0, wt1, t_local0, t_local1
_META_ROWS = 8


from shrimpy_tpu.utils.shapes import round_up as _round_up  # noqa: E501 — shared alignment helper


def _plan(raw_shape_szx: tuple[int, int, int], settings: DeskewSettings) -> dict:
    """Host-side geometry: per-(z, y) indices/weights, per-block DMA boxes."""
    g = _geometry(raw_shape_szx, settings)
    ns, nt, nx = raw_shape_szx
    nz, ny = g["nz_full"], g["ny"]
    r, theta = g["r"], g["theta"]

    ny_pad = _round_up(ny, BLOCK_Y)
    nyb = ny_pad // BLOCK_Y
    # z-averaging is folded into the kernel: each grid step consumes
    # bz_raw full-rate slices and emits bz_raw/A averaged rows, so the
    # 1/A-sized output is all that ever exists in HBM (the XLA path
    # materialized the full-rate volume first — 3x the memory and write
    # bandwidth at the reference's average_n_slices=3).
    a_avg = max(1, int(settings.average_n_slices))
    bz_raw = a_avg * max(1, -(-BLOCK_Z // a_avg))
    n_groups = -(-nz // a_avg)
    nz_pad = _round_up(n_groups * a_avg, bz_raw)
    nzb = nz_pad // bz_raw

    # Union scan band across a z block: s shifts by r/tan(theta) per z.
    # +8: DMA starts are quantized down to sublane multiples (Mosaic
    # requires provably 8-divisible dynamic slice starts).
    z_drift = (bz_raw - 1) * r / math.tan(theta)
    span = int(math.ceil(r * (BLOCK_Y - 1) + z_drift)) + 3 + 8
    span = _round_up(span, 8)
    ns_eff = max(ns, span)  # raw is zero-padded in scan if shorter

    # Union tilt window across a z block: t = z / sin(theta).
    t_span = int(math.ceil((bz_raw - 1) / g["sin_t"])) + 2

    zz = np.arange(nz_pad, dtype=np.float64)
    yy = np.arange(ny_pad, dtype=np.float64)

    # Tilt plane indices / weights (depend on z only).
    t = zz / g["sin_t"]
    t0 = np.floor(t).astype(np.int64)
    frac_t = t - t0
    wt0 = np.where((t0 >= 0) & (t0 <= nt - 1), 1.0 - frac_t, 0.0)
    wt1 = np.where((t0 + 1 >= 0) & (t0 + 1 <= nt - 1), frac_t, 0.0)
    wt0[nz:] = 0.0
    wt1[nz:] = 0.0
    # Per-block tilt window start (t0 is nondecreasing in z).
    t_lo = np.clip(t0.reshape(nzb, bz_raw)[:, 0], 0, None).astype(np.int32)
    nt_eff = int(max(nt, (t_lo + t_span).max()))
    t_local0 = np.clip(
        np.clip(t0, 0, nt - 1) - np.repeat(t_lo, bz_raw), 0, t_span - 1
    )
    t_local1 = np.clip(
        np.clip(t0 + 1, 0, nt - 1) - np.repeat(t_lo, bz_raw), 0, t_span - 1
    )
    # Group-mean scale folded into the tilt weights: averaged out row g
    # is sum_z (1/count_g) * slice_z; the partial tail group divides by
    # its actual size (matching _average_z_groups).
    counts = np.minimum(
        (np.arange(nz_pad) // a_avg + 1) * a_avg, nz
    ) - (np.arange(nz_pad) // a_avg) * a_avg
    scale = np.where(counts > 0, 1.0 / np.maximum(counts, 1), 0.0)
    wt0 = wt0 * scale
    wt1 = wt1 * scale

    # Scan coordinate (z, y): affine in y.
    s = r * ((yy[None, :] + g["y_offset"]) - zz[:, None] / math.tan(theta))
    s0 = np.floor(s).astype(np.int64)
    ws = (s - s0).astype(np.float64)

    # Per-(z-block, y-block) DMA start: the union band's first needed
    # row (minimum over the block's z — s decreases with z — and its
    # first y), quantized down to a sublane (8) multiple. The scan
    # extent is then padded so every band fits WITHOUT an upper clamp:
    # clamping s_lo to ns - span shifted the last y-block's band off
    # the final raw rows whenever (ns - span) % 8 != 0, silently
    # zero-weighting the s+1 tap of the outermost output rows (caught
    # at the production geometry, err 0.64 — small volumes fit in one
    # span and never exercised the clamp).
    s_first = s0[:, ::BLOCK_Y].reshape(nzb, bz_raw, nyb).min(axis=1)
    s_lo = (np.clip(s_first, 0, None) // 8) * 8
    # keep_overhang output rows past the sampled scan extent map to
    # s >= ns: their taps carry only zero weights (the valid masks
    # below), so their bands need no real data. Clamp every band start
    # to round_up(ns, 8) - span instead of zero-padding the raw volume
    # out to s_lo.max() + span — at a (300, 2048, 2048) raw stack the
    # overhang padding alone was a 17.8 GB HBM allocation (OOM). The
    # clamp target is 8-aligned (span is a multiple of 8) and coverage
    # is exact: a valid tap has s0 <= ns - 1 <= ns8 - 1 = clamped
    # start + span - 1, and clamping only lowers a start, never above a
    # block's minimum tap — unlike the round-2 `ns - span` clamp, whose
    # non-aligned quantization shifted bands off the final raw rows.
    ns8 = _round_up(ns, 8)
    s_lo = np.minimum(s_lo, max(ns8 - span, 0)).astype(np.int32)
    ns_eff = max(ns_eff, ns8)

    # Interpolation weights with validity masks (zero outside the raw
    # scan extent or outside the DMA'd band — matches the XLA/scipy
    # 'grid-constant' boundary blending).
    s_lo_full = np.repeat(
        np.repeat(s_lo, bz_raw, axis=0), BLOCK_Y, axis=1
    )[:nz_pad, :ny_pad]
    local = s0 - s_lo_full
    valid0 = (s0 >= 0) & (s0 <= ns - 1) & (local >= 0) & (local <= span - 1)
    valid1 = (s0 + 1 >= 0) & (s0 + 1 <= ns - 1) & (local + 1 >= 0) & (
        local + 1 <= span - 1
    )
    w00 = np.where(valid0, 1.0 - ws, 0.0).astype(np.float32)
    w01 = np.where(valid1, ws, 0.0).astype(np.float32)
    # Padded y/z rows produce zeros.
    w00[:, ny:] = 0.0
    w01[:, ny:] = 0.0
    w00[nz:, :] = 0.0
    w01[nz:, :] = 0.0
    # Independent local columns for the two taps: when one side is
    # clipped (weight already zeroed) the other must still point at its
    # true row.
    s0_local = np.clip(local, 0, span - 1).astype(np.int32)
    s1_local = np.clip(local + 1, 0, span - 1).astype(np.int32)

    # Pack the per-(z, y) metadata into one
    # (nzb, nyb, BLOCK_Z * _META_ROWS, BLOCK_Y) f32 tensor so its VMEM
    # block has (8, 128)-aligned trailing dims. Rows per z (all exact
    # small ints in f32 where integral): 0 = w00, 1 = w01, 2 = s0_local,
    # 3 = s1_local, 4 = wt0, 5 = wt1, 6 = t_local0, 7 = t_local1.
    meta = np.zeros((nzb, nyb, bz_raw * _META_ROWS, BLOCK_Y), np.float32)
    w00_b = w00.reshape(nz_pad, nyb, BLOCK_Y)
    w01_b = w01.reshape(nz_pad, nyb, BLOCK_Y)
    s0_b = s0_local.reshape(nz_pad, nyb, BLOCK_Y)
    s1_b = s1_local.reshape(nz_pad, nyb, BLOCK_Y)
    for zi in range(bz_raw):
        zg = np.arange(nzb) * bz_raw + zi
        base = zi * _META_ROWS
        meta[:, :, base + 0, :] = w00_b[zg]
        meta[:, :, base + 1, :] = w01_b[zg]
        meta[:, :, base + 2, :] = s0_b[zg]
        meta[:, :, base + 3, :] = s1_b[zg]
        meta[:, :, base + 4, :] = wt0[zg][:, None, None]
        meta[:, :, base + 5, :] = wt1[zg][:, None, None]
        meta[:, :, base + 6, :] = t_local0[zg][:, None, None]
        meta[:, :, base + 7, :] = t_local1[zg][:, None, None]

    return {
        "nz": nz,
        "nz_pad": nz_pad,
        "nzb": nzb,
        "bz_raw": bz_raw,
        "a_avg": a_avg,
        "n_groups": n_groups,
        "ny": ny,
        "ny_pad": ny_pad,
        "nyb": nyb,
        "span": span,
        "t_span": t_span,
        "ns_eff": ns_eff,
        "nt_eff": nt_eff,
        "nx": nx,
        "s_lo": s_lo,
        "t_lo": t_lo,
        "meta": meta,
    }


def _kernel(
    s_lo_ref,  # (nzb, nyb) int32, scalar-prefetch
    t_lo_ref,  # (nzb,) int32, scalar-prefetch
    raw_ref,  # (T_eff, S_eff, Xp) f32, HBM
    meta_ref,  # (1, 1, bz_raw * 8, BLOCK_Y) f32 (bz_raw >= BLOCK_Z
    #            when average_n_slices does not divide BLOCK_Z)
    out_ref,  # (bz_raw // a_avg, BLOCK_Y, Xp) f32 (averaged rows)
    vm,  # (2, t_span, span, Xp) f32 scratch
    sems,  # DMA sems, (2,)
    *,
    nyb: int,
    bz_raw: int,
    a_avg: int,
):
    zb = pl.program_id(0)
    yb = pl.program_id(1)
    s = zb * nyb + yb
    total = pl.num_programs(0) * nyb
    t_span, span = vm.shape[1], vm.shape[2]

    def box_dma(step):
        """Union-band DMA (tilt window x scan band) for flat step."""
        zb2 = step // nyb
        yb2 = jax.lax.rem(step, nyb)
        s_lo = pl.multiple_of(s_lo_ref[zb2, yb2], 8)
        t_lo = t_lo_ref[zb2]
        slot = jax.lax.rem(step, 2)
        return pltpu.make_async_copy(
            raw_ref.at[pl.ds(t_lo, t_span), pl.ds(s_lo, span), :],
            vm.at[slot],
            sems.at[slot],
        )

    # One-step-deep double buffering: step s+1's box transfers while
    # step s computes.
    @pl.when(s == 0)
    def _():
        box_dma(0).start()

    @pl.when(s + 1 < total)
    def _():
        box_dma(s + 1).start()

    box_dma(s).wait()
    slot = jax.lax.rem(s, 2)
    meta = meta_ref[0, 0]  # (bz_raw * 8, BLOCK_Y)
    cols = jax.lax.broadcasted_iota(jnp.int32, (BLOCK_Y, span), 1)
    for zi in range(bz_raw):
        base = zi * _META_ROWS
        s0 = meta[base + 2, :].astype(jnp.int32)
        s1 = meta[base + 3, :].astype(jnp.int32)
        # Banded interpolation matrix: two non-zeros per output row.
        gmat = jnp.where(
            cols == s0[:, None], meta[base + 0, :][:, None], 0.0
        ) + jnp.where(cols == s1[:, None], meta[base + 1, :][:, None], 0.0)
        t0 = meta[base + 6, 0].astype(jnp.int32)
        t1 = meta[base + 7, 0].astype(jnp.int32)
        r0 = jnp.dot(
            gmat, vm[slot, t0], preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        r1 = jnp.dot(
            gmat, vm[slot, t1], preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        # The tilt weights carry the 1/group-size scale, so averaging
        # is plain accumulation into the group's out row.
        term = meta[base + 4, 0] * r0 + meta[base + 5, 0] * r1
        if zi % a_avg == 0:
            out_ref[zi // a_avg] = term
        else:
            out_ref[zi // a_avg] = out_ref[zi // a_avg] + term


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
    nzb, nyb = plan["nzb"], plan["nyb"]
    bz_raw, a_avg = plan["bz_raw"], plan["a_avg"]
    bz_out = bz_raw // a_avg
    span, t_span = plan["span"], plan["t_span"]
    ns_eff, nt_eff, nx = plan["ns_eff"], plan["nt_eff"], plan["nx"]
    xp = _round_up(nx, LANES)

    # (T_eff, S_eff, Xp) layout: per-tilt-plane scan rows are contiguous
    # for the box DMA; X padded to full lanes.
    raw_t = jnp.moveaxis(raw.astype(jnp.float32), 1, 0)
    raw_t = jnp.pad(
        raw_t,
        (
            (0, nt_eff - raw.shape[1]),
            (0, ns_eff - raw.shape[0]),
            (0, xp - nx),
        ),
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nzb, nyb),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # raw, DMA'd manually
            pl.BlockSpec(
                (1, 1, bz_raw * _META_ROWS, BLOCK_Y),
                lambda zb, yb, *_: (zb, yb, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (bz_out, BLOCK_Y, xp),
            lambda zb, yb, *_: (zb, yb, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((2, t_span, span, xp), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    out = pl.pallas_call(
        partial(_kernel, nyb=nyb, bz_raw=bz_raw, a_avg=a_avg),
        out_shape=jax.ShapeDtypeStruct(
            (nzb * bz_out, plan["ny_pad"], xp), jnp.float32
        ),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
        interpret=interpret,
    )(
        jnp.asarray(plan["s_lo"]),
        jnp.asarray(plan["t_lo"]),
        raw_t,
        jnp.asarray(plan["meta"]),
    )
    # Averaging already happened in-kernel (group scale in the tilt
    # weights); crop to the averaged z extent.
    return out[: plan["n_groups"], : plan["ny"], :nx]


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
