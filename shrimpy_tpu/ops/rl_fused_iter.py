"""Whole-iteration fused Richardson-Lucy kernel (TPU Pallas).

One pallas_call computes an ENTIRE RL iteration (both half-steps) on
the padded carry via a z-lagged two-stage pipeline:

* **Stage A** (grid step k < nzb): compute the RATIO for z-chunk k over
  a y/x-halo'd slab — z-taps (VPU) over the est ring -> banded-y MXU
  dot -> staggered 2-block x MXU dots -> ``data / max(conv, eps)`` —
  and store it in a 4-slot VMEM ratio ring. The slab extends one
  (ry, 128)-halo past the output tile so stage B never touches HBM for
  ratio values.
* **Stage B** (grid step k >= 1): compute the adjoint conv of the
  ratio for z-chunk k-1 straight out of the VMEM ratio ring (slots
  k-2, k-1, k — chunk k was produced by stage A earlier in the SAME
  kernel body) and write ``est_old * conv^T(ratio)``; est_old is read
  from the est ring slab, so the half-step has no aux input at all.

Why: ``rl_fused`` (one pallas_call per HALF-step) moves ~6.7 carry
volumes of HBM per iteration (2 halo'd slab reads + data read + est
aux read + ratio write + est write) and measures DMA-bound at the
production grid (x-dot precision cuts save ~1.4% — the MXU is hidden
under the DMA stream). Fusing both half-steps deletes the ratio
volume's HBM round-trip AND the est aux read: ~4.3 carry volumes per
iteration (double-halo'd est slab ~1.9 + data slab ~1.4 + est write
1.0), at the price of recomputing the ratio's y/x halos (~1.3x the
stage-A compute). This is option (d) of the round-2 verdict's x-pass
bake-off list.

MEASURED VERDICT (round 4, v5e): the theory loses. 63.15 ms/iter at
the production carry (128, 2888, 1600) vs rl_fused's 35.64, and 31.46
vs 19.42 at (128, 2888, 820) — the halo recompute plus the ratio
ring's serialization of the two half-step pipelines costs ~1.8x more
than the saved DMA. Kept as an opt-in reference implementation
(``SHRIMPY_RL_FUSE_ITER=1``); the bake-off row is in docs/kernels.md
(round-3 x-pass table, row f).

Numerics are the same 3-pass bf16 (Precision.HIGH) dot scheme as
``rl_fused`` — stage A's ratio is held in f32 VMEM exactly as the HBM
ratio buffer was, so the update sequence is algebraically identical
(dot tile shapes differ, so results agree to f32 round-off, not
bitwise). Interpret mode runs plain f32 dots for the same
clone-safety reason documented in rl_fused.py.

Layout constraints (fall back to ``rl_fused`` otherwise): staggered
x only (2*rx <= 128), rz <= bz, 4*ry small enough for the double-halo
slab (ry <= 56), at least 2 tiles in y and x, and the VMEM rings must
fit the 100 MB budget (the layout chooser sizes bx accordingly —
production runs bx=1024, ~82 MB).

Reference parity: same zero-boundary RL semantics as rl_fused (fp64
oracle ``richardson_lucy_reference_separable(boundary="zero")``); the
deconvolution role mirrors the reference pipeline's biahub RL stage
(reference ``shrimpy/dynatrack/preprocessing.py:100-102``).
"""

from __future__ import annotations

import logging
import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from shrimpy_tpu.utils.cache import LruCache
from shrimpy_tpu.utils.shapes import round_up as _round_up
from shrimpy_tpu.ops.rl_fused import (
    _cat_pieces,
    _split_hi_lo,
    fused_pad,
    x_stencil_pieces_staggered,
)

logger = logging.getLogger(__name__)

_BY = 128
_BZ = 8
_PASSES = int(os.environ.get("SHRIMPY_RL_DOT_PASSES", "3"))
# VMEM feasibility budget for the rings + pipeline buffers (bytes);
# headroom under the kernel's 100 MB compiler cap for stencils and
# Mosaic's own staging.
_VMEM_BUDGET = 92 * 2**20


def _iter_vmem_bytes(dims: dict, n_terms: int) -> int:
    bz, bx = dims["bz"], dims["bx"]
    sy1, sy2, sx1, sx2 = dims["sy1"], dims["sy2"], dims["sx1"], dims["sx2"]
    ring_e = 4 * bz * sy2 * sx2 * 4
    ring_d = 4 * bz * sy1 * sx1 * 4
    ring_r = 4 * bz * sy1 * sx1 * 4
    out_pipe = 2 * bz * _BY * bx * 4
    yz_a = n_terms * 2 * sy1 * sx2 * 2
    yz_b = n_terms * 2 * _BY * sx1 * 2
    return ring_e + ring_d + ring_r + out_pipe + yz_a + yz_b


def _iter_cost(nx_p: int, bx: int, sy1: int, sy2: int) -> float:
    """Relative traffic-per-column model: double-halo est slab + data
    slab + est write, times the rounded x extent."""
    xa = _round_up(nx_p, bx)
    est_amp = (sy2 / _BY) * ((bx + 256) / bx)
    dat_amp = (sy1 / _BY) * ((bx + 128) / bx)
    return xa * (est_amp + dat_amp + 1.0)


def iter_layout(
    g_shape: tuple[int, int, int],
    radii: tuple[int, int, int],
    *,
    bz: int | None = None,
    bx: int | None = None,
    n_terms: int = 1,
) -> dict | None:
    """Carry layout for the whole-iteration kernel, or None when the
    geometry violates its constraints (caller falls back to rl_fused).

    The carry is ALWAYS staggered: est lives at x offset +rx so both
    stages run one-sided K=256 x windows (stage A's conv window is
    [c, c+2rx] to the right; stage B's adjoint window [c-2rx, c] to
    the left), giving the ratio slab a single left 128 halo and the
    est slab a symmetric 256 total halo.
    """
    gz, gy, gx = g_shape
    rz, ry, rx = radii
    bz = bz or int(os.environ.get("SHRIMPY_RL_BZ", "0")) or _BZ
    if rz > bz or ry > 56 or 2 * rx > 128:
        return None
    ysh1 = (-ry) % 8
    ysh2 = (-2 * ry) % 8
    sy1 = _round_up(_BY + 2 * ry + ysh1, 16)
    sy2 = _round_up(_BY + 4 * ry + ysh2, 16)
    zp = _round_up(gz, bz)
    yp = _round_up(gy, _BY)
    nyb = yp // _BY
    if nyb < 2 or yp < sy2:
        return None
    nx_p = _round_up(gx + rx, 128)
    if bx is None and os.environ.get("SHRIMPY_RLI_BX"):
        bx = int(os.environ["SHRIMPY_RLI_BX"])  # bake-off override
    if bx is None:
        feasible = [
            c
            for c in (1536, 1280, 1024, 768, 512, 384, 256)
            if _round_up(nx_p, c) >= c + 256
            and _round_up(nx_p, c) // c >= 2
            and _iter_vmem_bytes(
                {"bz": bz, "bx": c, "sy1": sy1, "sy2": sy2,
                 "sx1": c + 128, "sx2": c + 256},
                n_terms,
            )
            <= _VMEM_BUDGET
        ]
        if not feasible:
            return None
        bx = min(feasible, key=lambda c: _iter_cost(nx_p, c, sy1, sy2))
    xa = _round_up(nx_p, bx)
    nxb = xa // bx
    sx1, sx2 = bx + 128, bx + 256
    if nxb < 2 or xa < sx2:
        return None
    dims = {
        "bz": bz, "bx": bx, "sy1": sy1, "sy2": sy2, "sx1": sx1, "sx2": sx2,
    }
    if _iter_vmem_bytes(dims, n_terms) > _VMEM_BUDGET:
        return None
    return {
        "bz": bz, "by": _BY, "bx": bx,
        "sy1": sy1, "sy2": sy2, "sx1": sx1, "sx2": sx2,
        "ysh1": ysh1, "ysh2": ysh2,
        "staggered": True, "x_off": rx,
        "shape": (zp, yp, xa),
        "interior": (slice(0, gz), slice(0, gy), slice(0, gx)),
        "interior_est": (slice(0, gz), slice(0, gy), slice(rx, rx + gx)),
        "dims": (zp, yp, xa, sy1, sy2, ysh1, ysh2, bx, bz),
        "score": zp * yp * _iter_cost(nx_p, bx, sy1, sy2),
    }


def iter_best_layout(
    image_shape: tuple[int, int, int],
    psf_shape: tuple[int, int, int],
    *,
    n_terms: int = 1,
) -> tuple[dict, bool] | None:
    """Best (layout, swap_yx) over both volume orientations (same
    rationale as rl_fused.fused_best_layout: the longer of (y, x) on
    lanes pads less)."""
    radii = tuple(k // 2 for k in psf_shape)
    g = tuple(n + 2 * r for n, r in zip(image_shape, radii))
    cands = []
    l0 = iter_layout(g, radii, n_terms=n_terms)
    if l0 is not None:
        cands.append((l0["score"], 0, l0, False))
    g_sw = (g[0], g[2], g[1])
    r_sw = (radii[0], radii[2], radii[1])
    l1 = iter_layout(g_sw, r_sw, n_terms=n_terms)
    if l1 is not None:
        cands.append((l1["score"], 1, l1, True))
    if not cands:
        return None
    _, _, layout, swap = min(cands)
    return layout, swap


def y_stencil_general(
    taps: np.ndarray, out_rows: int, in_rows: int, offs: dict[int, int]
) -> np.ndarray:
    """(3, 2, out_rows, in_rows) bf16 hi/lo: (first, mid, last)
    variants of the banded y stencil for arbitrary out/in slab row
    counts. ``offs[v]`` = (out-slab start row) - (in-slab start row)
    in absolute y for variant v; out-of-range input rows are dropped
    (zero-boundary). Convention matches rl_fused.y_stencil_variants:
    ``out[n] = sum_i k[i] * in[n + ry - i]`` in absolute rows."""
    taps = np.asarray(taps, np.float64)
    ry = len(taps) // 2
    out = np.zeros((3, out_rows, in_rows), np.float64)
    rows = np.arange(out_rows)
    for v, off in offs.items():
        for i, k in enumerate(taps):
            cols = rows + ry - i + off
            ok = (cols >= 0) & (cols < in_rows)
            out[v, rows[ok], cols[ok]] += k
    return np.stack([_split_hi_lo(out[v]) for v in range(3)])


def rl_iter_supported(
    image_shape, psf_shape, *, n_terms: int = 1
) -> bool:
    return (
        iter_best_layout(
            tuple(image_shape), tuple(psf_shape), n_terms=n_terms
        )
        is not None
    )


@partial(
    jax.jit,
    static_argnames=(
        "kz_a", "kz_b", "radii", "dims", "eps", "interpret", "passes"
    ),
)
def _rl_iter_pass(
    est,
    data,
    gy_a,
    gx_a,
    gxc_a,
    gy_b,
    gx_b,
    gxc_b,
    *,
    kz_a: tuple,  # per-term conv z taps (convolution-ordered)
    kz_b: tuple,  # per-term adjoint z taps (flipped)
    radii: tuple,
    dims: tuple,
    eps: float,
    interpret: bool,
    passes: int | None = None,
):
    """One full RL iteration: est_new = est * conv^T(data / conv(est)).

    ``est`` is the staggered padded carry (interior at x offset +rx);
    ``data`` the ratio-aligned carry (offset 0). Returns the new est
    carry. Stencils: gy_a (3, 2T, sy1, sy2) stage-A y variants;
    gx_a (T, 2, 2, 128, 128) + gxc_a (T, 2, 256, 128) the direction=+1
    staggered x pieces; gy_b/gx_b/gxc_b the stage-B (by, sy1) /
    direction=-1 counterparts.
    """
    if passes is None:
        passes = _PASSES
    rz, ry, rx = radii
    zp, yp, xa, sy1, sy2, ysh1, ysh2, bx, bz = dims
    by = _BY
    sx1, sx2 = bx + 128, bx + 256
    nzb, nyb, nxb = zp // bz, yp // by, xa // bx
    n_terms = len(kz_a)
    total_c = nyb * nxb * nzb
    jblocks = bx // 128
    jb1 = jblocks + 1  # ratio-slab x blocks

    def kernel(
        est_ref, data_ref, gya_ref, gxa_ref, gxca_ref, gyb_ref, gxb_ref,
        gxcb_ref, out_ref, ring_e, ring_d, ring_r, yza, yzb, sems,
    ):
        yi = pl.program_id(0)
        xi = pl.program_id(1)
        kk = pl.program_id(2)  # z grid runs 0..nzb (one extra step)
        col = yi * nxb + xi
        c = col * nzb + kk  # stage-A chunk sequence index (kk < nzb)
        stage_a = kk < nzb
        stage_b = kk > 0

        def est_dma(j):
            col2 = j // nzb
            y2 = col2 // nxb
            x2 = jax.lax.rem(col2, nxb)
            k2 = jax.lax.rem(j, nzb)
            y0 = pl.multiple_of(
                jnp.clip(y2 * by - 2 * ry - ysh2, 0, yp - sy2), 8
            )
            x0 = pl.multiple_of(
                jnp.clip(x2 * bx - 128, 0, xa - sx2), 128
            )
            return pltpu.make_async_copy(
                est_ref.at[
                    pl.ds(k2 * bz, bz), pl.ds(y0, sy2), pl.ds(x0, sx2)
                ],
                ring_e.at[jax.lax.rem(j, 4)],
                sems.at[0, jax.lax.rem(j, 4)],
            )

        def data_dma(j):
            col2 = j // nzb
            y2 = col2 // nxb
            x2 = jax.lax.rem(col2, nxb)
            k2 = jax.lax.rem(j, nzb)
            y0 = pl.multiple_of(
                jnp.clip(y2 * by - ry - ysh1, 0, yp - sy1), 8
            )
            x0 = pl.multiple_of(
                jnp.clip(x2 * bx - 128, 0, xa - sx1), 128
            )
            return pltpu.make_async_copy(
                data_ref.at[
                    pl.ds(k2 * bz, bz), pl.ds(y0, sy1), pl.ds(x0, sx1)
                ],
                ring_d.at[jax.lax.rem(j, 4)],
                sems.at[1, jax.lax.rem(j, 4)],
            )

        @pl.when(stage_a & (c == 0))
        def _():
            est_dma(0).start()
            data_dma(0).start()
            if total_c > 1:
                est_dma(1).start()
                data_dma(1).start()
            est_dma(0).wait()
            data_dma(0).wait()

        @pl.when(stage_a & (c + 2 < total_c))
        def _():
            est_dma(c + 2).start()
            data_dma(c + 2).start()

        @pl.when(stage_a & (c + 1 < total_c))
        def _():
            est_dma(c + 1).wait()
            data_dma(c + 1).wait()

        dims_dot = (((1,), (0,)), ((), ()))
        dot = partial(
            jax.lax.dot_general,
            dimension_numbers=dims_dot,
            preferred_element_type=jnp.float32,
        )
        ysel = jnp.where(yi == 0, 0, jnp.where(yi == nyb - 1, 2, 1))

        def x_window_dots(scr, gx_ref_, start0, edge_gate, prods):
            """Append per-piece window dots for an edge out block.

            ``start0``: dynamic first-window-block slab offset (lanes,
            128-aligned); the second block sits at start0+128 clipped
            into the slab and is zero-gated via ``edge_gate`` (False =
            the second block is beyond the array: zero-boundary).
            """
            # Piece path start for m=1, clipped inside the slab.
            sx_in = scr.shape[-1]
            start1 = pl.multiple_of(
                jnp.clip(start0 + 128, 0, sx_in - 128), 128
            )
            for t in range(n_terms):
                if interpret:
                    b0 = scr[t, 0, :, pl.ds(start0, 128)]
                    b1 = scr[t, 0, :, pl.ds(start1, 128)]
                    b1 = jnp.where(edge_gate, b1, 0.0)
                    p0 = gx_ref_[t, 0, 0, :, :].astype(jnp.float32) + gx_ref_[
                        t, 0, 1, :, :
                    ].astype(jnp.float32)
                    p1 = gx_ref_[t, 1, 0, :, :].astype(jnp.float32) + gx_ref_[
                        t, 1, 1, :, :
                    ].astype(jnp.float32)
                    prods.append(dot(b0, p0))
                    prods.append(dot(b1, p1))
                    continue
                zero = jnp.zeros((), jnp.bfloat16)
                b0h = scr[t, 0, :, pl.ds(start0, 128)]
                b0l = scr[t, 1, :, pl.ds(start0, 128)]
                b1h = scr[t, 0, :, pl.ds(start1, 128)]
                b1l = scr[t, 1, :, pl.ds(start1, 128)]
                b1h = jnp.where(edge_gate, b1h, zero)
                b1l = jnp.where(edge_gate, b1l, zero)
                p0h = gx_ref_[t, 0, 0, :, :]
                p1h = gx_ref_[t, 1, 0, :, :]
                prods += [dot(b0h, p0h), dot(b0l, p0h)]
                prods += [dot(b1h, p1h), dot(b1l, p1h)]
                if passes >= 3:
                    prods.append(dot(b0h, gx_ref_[t, 0, 1, :, :]))
                    prods.append(dot(b1h, gx_ref_[t, 1, 1, :, :]))
            return prods

        def tree_sum(prods):
            while len(prods) > 1:
                prods = [a + b for a, b in zip(prods[::2], prods[1::2])] + (
                    [prods[-1]] if len(prods) % 2 else []
                )
            return prods[0]

        # ---------------- Stage A: ratio for chunk kk ----------------
        @pl.when(stage_a)
        def _():
            slot_p = jax.lax.rem(c + 3, 4)
            slot_c = jax.lax.rem(c, 4)
            slot_n = jax.lax.rem(c + 1, 4)
            slot_d = slot_c
            slot_r = jax.lax.rem(kk, 4)
            is_prev_ok = kk > 0
            is_next_ok = kk < nzb - 1
            # est slab is 128 left-shifted relative to the ratio slab
            # ONLY at the clamped last x tile (see iter_layout doc).
            delta_e = jnp.where(xi == nxb - 1, 1, 0)
            for z in range(bz):
                for t in range(n_terms):
                    kz = np.asarray(kz_a[t], np.float32)
                    tz = None
                    for d in range(2 * rz + 1):
                        src = z - rz + d
                        co = (src + bz) // bz - 1
                        lr = (src + bz) % bz
                        slot = (slot_p, slot_c, slot_n)[co + 1]
                        gate = (is_prev_ok, None, is_next_ok)[co + 1]
                        tap = float(kz[2 * rz - d])
                        term = ring_e[slot, lr, :, :] * tap
                        if gate is not None:
                            term = jnp.where(gate, term, 0.0)
                        tz = term if tz is None else tz + term
                    gy_hi = gya_ref[ysel, 2 * t, :, :]
                    gy_lo = gya_ref[ysel, 2 * t + 1, :, :]
                    if interpret:
                        gy_full = gy_hi.astype(jnp.float32) + gy_lo.astype(
                            jnp.float32
                        )
                        yz = dot(gy_full, tz)
                        yza[t, 0, :, :] = yz
                    else:
                        tz_hi = tz.astype(jnp.bfloat16)
                        tz_lo = (tz - tz_hi.astype(jnp.float32)).astype(
                            jnp.bfloat16
                        )
                        yz = dot(gy_hi, tz_hi) + dot(gy_hi, tz_lo)
                        if passes >= 3:
                            yz = yz + dot(gy_lo, tz_hi)
                        yz_hi = yz.astype(jnp.bfloat16)
                        yz_lo = (yz - yz_hi.astype(jnp.float32)).astype(
                            jnp.bfloat16
                        )
                        yza[t, 0, :, :] = yz_hi
                        yza[t, 1, :, :] = yz_lo
                for j in range(jb1):
                    prods = []
                    if j < jb1 - 1:
                        # Interior ratio block: contiguous K=256 window
                        # at a (possibly) shifted slab offset.
                        start = pl.multiple_of(
                            jnp.clip((j + delta_e) * 128, 0, sx2 - 256), 128
                        )
                        for t in range(n_terms):
                            bh = yza[t, 0, :, pl.ds(start, 256)]
                            if interpret:
                                ch = gxca_ref[t, 0, :, :].astype(
                                    jnp.float32
                                ) + gxca_ref[t, 1, :, :].astype(jnp.float32)
                                prods.append(dot(bh, ch))
                                continue
                            bl = yza[t, 1, :, pl.ds(start, 256)]
                            ch = gxca_ref[t, 0, :, :]
                            prods += [dot(bh, ch), dot(bl, ch)]
                            if passes >= 3:
                                prods.append(dot(bh, gxca_ref[t, 1, :, :]))
                    else:
                        # Last ratio block: at the clamped last x tile
                        # its second window block leaves the array
                        # (zero-boundary) — single-piece path, gated.
                        start0 = pl.multiple_of(
                            jnp.clip((j + delta_e) * 128, 0, sx2 - 128), 128
                        )
                        prods = x_window_dots(
                            yza, gxa_ref, start0, xi < nxb - 1, prods
                        )
                    acc = tree_sum(prods)
                    sl = slice(j * 128, (j + 1) * 128)
                    ring_r[slot_r, z, :, sl] = ring_d[
                        slot_d, z, :, sl
                    ] / jnp.maximum(acc, eps)

        # -------- Stage B: adjoint + multiply for chunk kk - 1 --------
        @pl.when(stage_b)
        def _():
            m_prev_ok = kk > 1  # out chunk m = kk-1 has a z-predecessor
            m_next_ok = kk <= nzb - 1  # chunk kk exists (ratio ring has it)
            slot_rp = jax.lax.rem(kk + 2, 4)  # chunk kk-2
            slot_rc = jax.lax.rem(kk + 3, 4)  # chunk kk-1
            slot_rn = jax.lax.rem(kk, 4)      # chunk kk
            c_out = col * nzb + kk - 1
            slot_e = jax.lax.rem(c_out, 4)
            delta_b = jnp.where(xi == 0, -1, 0)
            # est-slab offsets of the out tile (epilogue read).
            row_off = pl.multiple_of(
                jnp.where(
                    yi == 0,
                    0,
                    jnp.where(yi == nyb - 1, sy2 - by, 2 * ry + ysh2),
                ),
                8,
            )
            col_base = jnp.where(
                xi == 0, 0, jnp.where(xi == nxb - 1, 256, 128)
            )
            for z in range(bz):
                for t in range(n_terms):
                    kz = np.asarray(kz_b[t], np.float32)
                    tz = None
                    for d in range(2 * rz + 1):
                        src = z - rz + d
                        co = (src + bz) // bz - 1
                        lr = (src + bz) % bz
                        slot = (slot_rp, slot_rc, slot_rn)[co + 1]
                        gate = (m_prev_ok, None, m_next_ok)[co + 1]
                        tap = float(kz[2 * rz - d])
                        term = ring_r[slot, lr, :, :] * tap
                        if gate is not None:
                            term = jnp.where(gate, term, 0.0)
                        tz = term if tz is None else tz + term
                    gy_hi = gyb_ref[ysel, 2 * t, :, :]
                    gy_lo = gyb_ref[ysel, 2 * t + 1, :, :]
                    if interpret:
                        gy_full = gy_hi.astype(jnp.float32) + gy_lo.astype(
                            jnp.float32
                        )
                        yz = dot(gy_full, tz)
                        yzb[t, 0, :, :] = yz
                    else:
                        tz_hi = tz.astype(jnp.bfloat16)
                        tz_lo = (tz - tz_hi.astype(jnp.float32)).astype(
                            jnp.bfloat16
                        )
                        yz = dot(gy_hi, tz_hi) + dot(gy_hi, tz_lo)
                        if passes >= 3:
                            yz = yz + dot(gy_lo, tz_hi)
                        yz_hi = yz.astype(jnp.bfloat16)
                        yz_lo = (yz - yz_hi.astype(jnp.float32)).astype(
                            jnp.bfloat16
                        )
                        yzb[t, 0, :, :] = yz_hi
                        yzb[t, 1, :, :] = yz_lo
                for jb in range(jblocks):
                    prods = []
                    if jb > 0:
                        start = pl.multiple_of(
                            jnp.clip((jb + delta_b) * 128, 0, sx1 - 256), 128
                        )
                        for t in range(n_terms):
                            bh = yzb[t, 0, :, pl.ds(start, 256)]
                            if interpret:
                                ch = gxcb_ref[t, 0, :, :].astype(
                                    jnp.float32
                                ) + gxcb_ref[t, 1, :, :].astype(jnp.float32)
                                prods.append(dot(bh, ch))
                                continue
                            bl = yzb[t, 1, :, pl.ds(start, 256)]
                            ch = gxcb_ref[t, 0, :, :]
                            prods += [dot(bh, ch), dot(bl, ch)]
                            if passes >= 3:
                                prods.append(dot(bh, gxcb_ref[t, 1, :, :]))
                    else:
                        # First out block: at the UNclamped first x
                        # tile its first window block is beyond the
                        # array's left edge (zero-boundary) — gated.
                        start0 = pl.multiple_of(
                            jnp.clip((jb + delta_b) * 128, 0, sx1 - 128), 128
                        )
                        # m=0 piece gated off at xi == 0; the piece
                        # order is (window block 0, window block 1) so
                        # reuse x_window_dots with inverted roles: here
                        # the FIRST block is the edge case. Compose
                        # manually for clarity.
                        for t in range(n_terms):
                            if interpret:
                                b0 = yzb[t, 0, :, pl.ds(start0, 128)]
                                b0 = jnp.where(xi > 0, b0, 0.0)
                                start1 = pl.multiple_of(
                                    jnp.clip(
                                        (jb + delta_b + 1) * 128,
                                        0,
                                        sx1 - 128,
                                    ),
                                    128,
                                )
                                b1 = yzb[t, 0, :, pl.ds(start1, 128)]
                                p0 = gxb_ref[t, 0, 0, :, :].astype(
                                    jnp.float32
                                ) + gxb_ref[t, 0, 1, :, :].astype(
                                    jnp.float32
                                )
                                p1 = gxb_ref[t, 1, 0, :, :].astype(
                                    jnp.float32
                                ) + gxb_ref[t, 1, 1, :, :].astype(
                                    jnp.float32
                                )
                                prods += [dot(b0, p0), dot(b1, p1)]
                                continue
                            zero = jnp.zeros((), jnp.bfloat16)
                            b0h = yzb[t, 0, :, pl.ds(start0, 128)]
                            b0l = yzb[t, 1, :, pl.ds(start0, 128)]
                            b0h = jnp.where(xi > 0, b0h, zero)
                            b0l = jnp.where(xi > 0, b0l, zero)
                            start1 = pl.multiple_of(
                                jnp.clip(
                                    (jb + delta_b + 1) * 128, 0, sx1 - 128
                                ),
                                128,
                            )
                            b1h = yzb[t, 0, :, pl.ds(start1, 128)]
                            b1l = yzb[t, 1, :, pl.ds(start1, 128)]
                            p0h = gxb_ref[t, 0, 0, :, :]
                            p1h = gxb_ref[t, 1, 0, :, :]
                            prods += [dot(b0h, p0h), dot(b0l, p0h)]
                            prods += [dot(b1h, p1h), dot(b1l, p1h)]
                            if passes >= 3:
                                prods.append(dot(b0h, gxb_ref[t, 0, 1, :, :]))
                                prods.append(dot(b1h, gxb_ref[t, 1, 1, :, :]))
                    acc = tree_sum(prods)
                    col_off = pl.multiple_of(col_base + jb * 128, 128)
                    est_old = ring_e[
                        slot_e, z, pl.ds(row_off, by), pl.ds(col_off, 128)
                    ]
                    out_ref[z, :, slice(jb * 128, (jb + 1) * 128)] = (
                        est_old * acc
                    )

    grid = (nyb, nxb, nzb + 1)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (bz, by, bx),
            lambda y, x, z: (jnp.maximum(z - 1, 0), y, x),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((zp, yp, xa), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((4, bz, sy2, sx2), jnp.float32),  # est ring
            pltpu.VMEM((4, bz, sy1, sx1), jnp.float32),  # data ring
            pltpu.VMEM((4, bz, sy1, sx1), jnp.float32),  # ratio ring
            pltpu.VMEM(
                (n_terms, 2, sy1, sx2),
                jnp.float32 if interpret else jnp.bfloat16,
            ),
            pltpu.VMEM(
                (n_terms, 2, by, sx1),
                jnp.float32 if interpret else jnp.bfloat16,
            ),
            pltpu.SemaphoreType.DMA((2, 4)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2**20,
        ),
        interpret=interpret,
    )(est, data, gy_a, gx_a, gxc_a, gy_b, gx_b, gxc_b)


def _iter_stencils(terms, layout):
    """Bake both stages' stencils as HOST numpy (trace-safe, see
    rl_fused's cache comment). Returns a dict of arrays + tap keys."""
    ry = len(np.asarray(terms[0][1])) // 2
    rx = len(np.asarray(terms[0][2])) // 2
    sy1, sy2 = layout["sy1"], layout["sy2"]
    ysh1, ysh2 = layout["ysh1"], layout["ysh2"]
    offs_a = {0: 0, 1: ry + ysh2 - ysh1, 2: sy2 - sy1}
    offs_b = {0: 0, 1: ry + ysh1, 2: sy1 - _BY}
    kz_a, kz_b, gy_a, gy_b, gx_a, gx_b = [], [], [], [], [], []
    for wz, wy, wx in terms:
        wz, wy, wx = (np.asarray(w, np.float64) for w in (wz, wy, wx))
        kz_a.append(tuple(float(v) for v in wz))
        kz_b.append(tuple(float(v) for v in wz[::-1]))
        gy_a.append(y_stencil_general(wy, sy1, sy2, offs_a))
        gy_b.append(y_stencil_general(wy[::-1], _BY, sy1, offs_b))
        gx_a.append(x_stencil_pieces_staggered(wx, rx, 1))
        gx_b.append(x_stencil_pieces_staggered(wx[::-1], rx, -1))
    bf16 = np.dtype(jnp.bfloat16)
    gxa_np = np.stack(gx_a).astype(bf16)
    gxb_np = np.stack(gx_b).astype(bf16)
    return {
        "kz_a": tuple(kz_a),
        "kz_b": tuple(kz_b),
        "gy_a": np.concatenate(gy_a, axis=1).astype(bf16),
        "gy_b": np.concatenate(gy_b, axis=1).astype(bf16),
        "gx_a": gxa_np,
        "gx_b": gxb_np,
        "gxc_a": _cat_pieces(gxa_np).astype(bf16),
        "gxc_b": _cat_pieces(gxb_np).astype(bf16),
    }


_RL_ITER_CACHE = LruCache(maxsize=8)


def rl_fused_iter(image, psf_np, terms, settings, iterations):
    """Richardson-Lucy on the whole-iteration fused kernel.

    Semantics identical to ``rl_fused`` (zero-boundary conv on the
    half-PSF padded G grid; fp64 oracle
    ``richardson_lucy_reference_separable(boundary="zero")``)."""
    interpret = jax.default_backend() != "tpu"
    if settings.matmul_precision == "highest":
        logger.warning(
            "the fused-iteration RL backend runs manual 3-pass bf16 "
            "dots (Precision.HIGH); matmul_precision='highest' is not "
            "available in-kernel — set separable_backend='matmul' if "
            "HIGHEST is required"
        )
    best = iter_best_layout(
        tuple(image.shape), tuple(psf_np.shape), n_terms=len(terms)
    )
    assert best is not None, "caller must check rl_iter_supported"
    layout, swap = best
    if swap:
        psf_np = np.ascontiguousarray(psf_np.transpose(0, 2, 1))
        terms = [(wz, wx, wy) for wz, wy, wx in terms]
    radii = tuple(k // 2 for k in psf_np.shape)
    pads = tuple((r, r) for r in radii)
    terms_key = tuple(
        tuple(np.asarray(w, np.float64).tobytes() for w in t) for t in terms
    )
    key = (
        tuple(image.shape), psf_np.tobytes(), terms_key, iterations,
        settings.epsilon, settings.pad_mode, swap, "fused_iter",
        getattr(settings, "acceleration", "none"),
        layout["shape"], layout["bz"], layout["bx"],
        layout["sy1"], layout["sy2"],
    )
    if key not in _RL_ITER_CACHE:
        accel = getattr(settings, "acceleration", "none") == "biggs"
        st = _iter_stencils(terms, layout)
        eps = settings.epsilon
        pad_mode = settings.pad_mode
        dims = layout["dims"]
        interior_est = layout["interior_est"]
        kz_a, kz_b = st["kz_a"], st["kz_b"]
        gy_a_np, gy_b_np = st["gy_a"], st["gy_b"]
        gx_a_np, gx_b_np = st["gx_a"], st["gx_b"]
        gxc_a_np, gxc_b_np = st["gxc_a"], st["gxc_b"]

        @jax.jit
        def run(img):
            gy_a = jnp.asarray(gy_a_np)
            gy_b = jnp.asarray(gy_b_np)
            gx_a = jnp.asarray(gx_a_np)
            gx_b = jnp.asarray(gx_b_np)
            gxc_a = jnp.asarray(gxc_a_np)
            gxc_b = jnp.asarray(gxc_b_np)
            if swap:
                img = jnp.transpose(img, (0, 2, 1))
            g_vol = jnp.pad(img.astype(jnp.float32), pads, mode=pad_mode)
            data = fused_pad(jnp.maximum(g_vol, 0.0), layout)
            est0 = fused_pad(
                jnp.maximum(g_vol, eps), layout, est=True
            )

            def step(est, _):
                est = _rl_iter_pass(
                    est, data, gy_a, gx_a, gxc_a, gy_b, gx_b, gxc_b,
                    kz_a=kz_a, kz_b=kz_b, radii=radii, dims=dims,
                    eps=eps, interpret=interpret, passes=_PASSES,
                )
                return est, None

            from shrimpy_tpu.ops.rl_outer import run_rl_outer

            est = run_rl_outer([(step, iterations)], est0, accel)
            g_out = est[interior_est]
            crop = tuple(
                slice(lo, lo + n) for (lo, _), n in zip(pads, img.shape)
            )
            out = g_out[crop]
            return jnp.transpose(out, (0, 2, 1)) if swap else out

        _RL_ITER_CACHE[key] = run
    return _RL_ITER_CACHE[key](image)
