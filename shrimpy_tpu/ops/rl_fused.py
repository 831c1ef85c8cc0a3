"""Fully fused Richardson-Lucy iteration kernel (TPU Pallas).

One pallas_call computes an ENTIRE RL half-step on the zero-boundary
padded carry: z-taps (VPU) -> banded-y MXU dot -> block-tridiagonal-x
MXU dots -> elementwise epilogue (ratio or multiplicative update), so a
full RL iteration is exactly two kernel launches and zero XLA
elementwise passes. This replaces the round-1 ``linear_pallas`` backend
(z+y kernel + dense nx x nx Toeplitz einsum + XLA elementwise), whose
dense x-matmul alone cost ~19 ms per conv at the production grid.

Design points (all measured/probed on v5e, see scripts/probe_mosaic.py
and scripts/bench_rl.py):

* **Rolling-z ring DMA**: the grid is (y, x, z) with z innermost; each
  step DMAs only its own (bz, sy, sx) chunk (NO z halo) into a 4-slot
  VMEM ring and reads the z window from the neighbors' slots — the
  2x z-halo re-read of the round-1 kernel is gone, and the chunk DMA
  is prefetched two steps ahead (double-buffering measured 25 -> 17 ms
  on the old kernel; the ring removes another ~35% of read traffic).
* **Manual 3-pass bf16 dots** (hi/lo split, f32 accumulation): Mosaic
  supports only DEFAULT/HIGHEST dot precision in-kernel; the explicit
  split reproduces ``Precision.HIGH`` (bf16x3, rel err ~5e-6 per dot)
  at half the MXU passes of HIGHEST.
* **Zero-boundary edges via stencil variants, not pad blocks**: the
  carry has NO dedicated halo pads — out-of-range taps are dropped by
  edge-variant y stencils / zero-weighted x pieces / zero-weighted z
  chunk terms, which IS the zero-boundary convolution. Only tile
  rounding pads remain (e.g. production grid wastes 1.39x instead of
  the round-1 layout's 1.9x).
* **x as block-tridiagonal 128x128 MXU dots**: out block j consumes
  slab blocks j-1, j, j+1 through three static stencil pieces; slab
  block positions shift by one at the first/last x tile (DMA clamp),
  handled by a dynamic 128-aligned lane slice (probed OK on Mosaic).

RL's multiplicative update keeps the carry's rounding pads exactly
zero (zeros are absorbing; the ratio/mult epilogues re-zero any conv
spill because ``data``/``est`` are zero there), so no in-loop padding
or masking exists anywhere.

Reference parity: this implements the same zero-boundary RL update as
``richardson_lucy_reference_separable(boundary="zero")`` (fp64 oracle);
the deconvolution semantics mirror the reference pipeline's biahub RL
role (reference ``shrimpy/dynatrack/preprocessing.py:100-102``,
``scripts/measure_psf.py:20-288`` for the measured-PSF source).
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

logger = logging.getLogger(__name__)

_BZ = 8
_BY = 128
# bf16 dot passes: 3 == Precision.HIGH (both rounding corrections), 2
# drops the stencil-side correction (rel err ~3e-3/conv — only safe for
# EARLY RL iterations, whose trajectory error the later 3-pass
# iterations contract away; see rl_fused's low_precision_iters).
_PASSES = int(os.environ.get("SHRIMPY_RL_DOT_PASSES", "3"))
# Staggered-carry x pass (K=256 interior dots, one-sided 128 halo)
# when the x radius allows it; "0" forces the legacy K=384 layout
# (bake-off knob, docs/kernels.md).
_STAGGER = os.environ.get("SHRIMPY_RL_STAGGER", "1") != "0"
# Per-axis precision experiment: override the bf16 pass count of the
# X dots alone (0 = follow `passes`). Bake-off knob only — read once
# at import so in-process jit caches stay consistent.
_X_PASSES = int(os.environ.get("SHRIMPY_RL_X_PASSES", "0"))
# Biggs-Andrews acceleration fused INTO the kernel passes ("1",
# default): the extrapolated point y = max(x + alpha*dx, 0) is built
# in the ratio pass's DMA ring and the mult pass's epilogue emits
# x_new/dx/g and the step-length reduction partials, so an accelerated
# iteration is still exactly two kernel launches and zero XLA
# elementwise passes. "0" falls back to the generic XLA-epilogue outer
# loop (ops/rl_outer.py) — the bake-off/regression knob; the measured
# cost of the generic epilogue on this backend is ~43 ms/iter of
# HBM-bound elementwise + backedge copies against a 35.4 ms/iter
# kernel (docs/kernels.md).
_FUSE_ACCEL = os.environ.get("SHRIMPY_RL_FUSE_ACCEL", "1") != "0"


from shrimpy_tpu.utils.shapes import round_up as _round_up  # noqa: E501 — shared alignment helper


def _x_cost(nx_p: int, bx: int, staggered: bool = False) -> float:
    """Relative per-pass cost model for an x-tile choice: MXU (banded-y
    amp + tridiagonal-x, 3-pass each) plus DMA read amplification,
    scaled by the rounded x extent. The staggered layout's interior x
    dot is K=256 instead of K=384 (9.0 -> 6.0) and its slab halo is
    one-sided (128 instead of 256)."""
    xa = _round_up(nx_p, bx)
    halo = 128 if staggered else 256
    amp = (bx + halo) / bx
    x_dot = 6.0 if staggered else 9.0
    return xa * (3.75 * amp + x_dot + 2.2 * amp)


def fused_layout(
    g_shape: tuple[int, int, int],
    radii: tuple[int, int, int],
    *,
    bz: int | None = None,
    bx: int | None = None,
    staggered: bool | None = None,
) -> dict | None:
    """Carry layout for the fused kernel, or None when the geometry
    does not satisfy the kernel's constraints (caller falls back).

    ``staggered`` (default: auto, rx <= 64) places the *est* carry at x
    offset rx relative to the data/ratio carries, which turns each RL
    half-step's x window one-sided ([c, c+2rx] for the conv pass,
    [c-2rx, c] for the adjoint) so it fits an aligned 2-block K=256 MXU
    window with a single 128-wide slab halo — 2/3 the x-dot MXU work of
    the symmetric K=384 layout (the production bottleneck, see
    docs/kernels.md bake-off table).
    """
    gz, gy, gx = g_shape
    rz, ry, rx = radii
    bz = bz or int(os.environ.get("SHRIMPY_RL_BZ", "0")) or _BZ
    if rz > bz or ry > 120 or rx > 128:
        return None
    if staggered is None:
        staggered = _STAGGER and 2 * rx <= 128
    if staggered and 2 * rx > 128:
        return None
    y_shift = (-ry) % 8
    sy = _round_up(_BY + 2 * ry + y_shift, 16)
    zp = _round_up(gz, bz)
    yp = _round_up(gy, _BY)
    nx_p = _round_up(gx + (rx if staggered else 0), 128)
    if yp < sy:
        return None  # slab taller than the array: tiny-y volume
    halo = 128 if staggered else 256
    if bx is None and os.environ.get("SHRIMPY_RL_BX"):
        bx = int(os.environ["SHRIMPY_RL_BX"])  # experiment override
    if bx is None:
        # Cost-scored x tile: bigger tiles cut halo amplification, but
        # their rounding can inflate the grid (e.g. the production
        # x=1664 fits bx=256 exactly while bx=512 pads 23%). Model
        # validated against v5e measurements at xa=3072: predicted
        # 48.1/45.5/44.1/42.8 ms/iter for bx=512/768/1024/1536 vs
        # measured 48.1/45.9/43.0/42.5. VMEM at bx=1536: ring 37 MB +
        # pipelined tiles ~25 MB — inside the 100 MB cap.
        feasible = [
            c for c in (1536, 1024, 768, 512, 384, 256, 128)
            if _round_up(nx_p, c) >= c + halo
        ]
        if not feasible:
            return None
        bx = min(feasible, key=lambda c: _x_cost(nx_p, c, staggered))
    xa = _round_up(nx_p, bx)
    sx = bx + halo
    if xa < sx:
        return None
    x_off = rx if staggered else 0
    return {
        "bz": bz, "by": _BY, "bx": bx,
        "sy": sy, "sx": sx, "y_shift": y_shift,
        "staggered": staggered, "x_off": x_off,
        "shape": (zp, yp, xa),
        "interior": (slice(0, gz), slice(0, gy), slice(0, gx)),
        "interior_est": (
            slice(0, gz), slice(0, gy), slice(x_off, x_off + gx)
        ),
        "dims": (zp, yp, xa, sy, y_shift, bx, bz),
        "score": zp * yp * _x_cost(nx_p, bx, staggered),
    }


def fused_best_layout(
    image_shape: tuple[int, int, int],
    psf_shape: tuple[int, int, int],
    *,
    bz: int | None = None,
) -> tuple[dict, bool] | None:
    """Best (layout, swap_yx) over both volume orientations.

    Putting the longer of (y, x) on lanes usually wins: lane-dim
    rounding is 128-to-512-grained while sublanes round to 128, so the
    production (z,y,x)=(128,2888,1620) volume wastes 15% less when the
    2888 axis rides the lanes.
    """
    radii = tuple(k // 2 for k in psf_shape)
    g = tuple(n + 2 * r for n, r in zip(image_shape, radii))
    cands = []
    l0 = fused_layout(g, radii, bz=bz)
    if l0 is not None:
        cands.append((l0["score"], 0, l0, False))
    g_sw = (g[0], g[2], g[1])
    r_sw = (radii[0], radii[2], radii[1])
    l1 = fused_layout(g_sw, r_sw, bz=bz)
    if l1 is not None:
        cands.append((l1["score"], 1, l1, True))
    if not cands:
        return None
    _, _, layout, swap = min(cands)
    return layout, swap


def fused_pad(vol_g: jnp.ndarray, layout: dict, *, est: bool = False) -> jnp.ndarray:
    """Embed a G-shaped volume into the zero carry layout.

    ``est=True`` places it at the est-carry x offset (staggered
    layouts keep est at x offset rx; identical to ``est=False`` on
    symmetric layouts)."""
    out = jnp.zeros(layout["shape"], jnp.float32)
    where = layout["interior_est" if est else "interior"]
    return out.at[where].set(vol_g.astype(jnp.float32))


def _split_hi_lo(mat: np.ndarray) -> np.ndarray:
    """(2, ...) bf16 stack: hi = bf16(x), lo = bf16(x - f32(hi))."""
    m32 = np.asarray(mat, np.float32)
    hi = m32.astype(jnp.bfloat16)
    lo = (m32 - np.asarray(hi, np.float32)).astype(jnp.bfloat16)
    return np.stack([np.asarray(hi), np.asarray(lo)])


def y_stencil_variants(taps: np.ndarray, layout: dict) -> np.ndarray:
    """(3, 2, by, sy) bf16: (first, mid, last) y-tile stencils, hi/lo.

    Convolution convention: ``out[n] = sum_i k[i] * in[n + ry - i]``.
    Out-of-range input rows are dropped — zero-boundary semantics.
    """
    taps = np.asarray(taps, np.float64)
    ry = len(taps) // 2
    by, sy, shift = layout["by"], layout["sy"], layout["y_shift"]
    yp = layout["shape"][1]
    nyb = yp // by
    # Slab start offsets relative to the tile's first out row:
    #   mid:   start = yi*by - ry - shift       -> col = a + ry + (ry+shift) - i
    #   first: start clamped to 0 (yi = 0)      -> col = a + ry - i
    #   last:  start = yp - sy                  -> col = a + ry - i + (sy - by)
    offs = {
        0: 0,                      # first
        1: ry + shift,             # mid
        2: sy - by if nyb > 1 else 0,  # last (== first when single tile)
    }
    out = np.zeros((3, by, sy), np.float64)
    rows = np.arange(by)
    for v, off in offs.items():
        for i, k in enumerate(taps):
            cols = rows + ry - i + off
            ok = (cols >= 0) & (cols < sy)
            out[v, rows[ok], cols[ok]] += k
    return np.stack([_split_hi_lo(out[v]) for v in range(3)])


def x_stencil_pieces(taps: np.ndarray, rx: int) -> np.ndarray:
    """(3, 2, 128, 128) bf16: block-tridiagonal x pieces, hi/lo.

    Out block j of a tile consumes slab blocks j-1 (P0), j (P1),
    j+1 (P2):  P_m[r, c] = k[i]  at  r = c + rx - i + (1 - m) * 128.
    """
    taps = np.asarray(taps, np.float64)
    assert len(taps) == 2 * rx + 1
    pieces = np.zeros((3, 128, 128), np.float64)
    for m in range(3):
        for c in range(128):
            for i, k in enumerate(taps):
                r = c + rx - i + (1 - m) * 128
                if 0 <= r < 128:
                    pieces[m, r, c] += k
    return np.stack([_split_hi_lo(pieces[m]) for m in range(3)])


def x_stencil_pieces_staggered(
    taps: np.ndarray, rx: int, direction: int
) -> np.ndarray:
    """(2, 2, 128, 128) bf16: staggered 2-block x pieces, hi/lo.

    The staggered carry keeps est at x offset rx relative to
    data/ratio, so each pass's input window is one-sided and spans two
    aligned slab blocks (K=256):

    - ``direction=+1`` (conv pass, in = est@+rx, out @0, slab DMA at
      tile start): in window [c, c+2rx], S = 2*rx.
    - ``direction=-1`` (adjoint pass, in @0, out = est@+rx, slab DMA
      one block left): in window [c-2rx, c], S = 128.

    P_m[r, c] = k[i]  at  r = c + S - i - 128*m, m in {0, 1}.
    """
    taps = np.asarray(taps, np.float64)
    assert len(taps) == 2 * rx + 1 and 2 * rx <= 128
    s_off = 2 * rx if direction > 0 else 128
    pieces = np.zeros((2, 128, 128), np.float64)
    for m in range(2):
        for c in range(128):
            for i, k in enumerate(taps):
                r = c + s_off - i - 128 * m
                if 0 <= r < 128:
                    pieces[m, r, c] += k
    return np.stack([_split_hi_lo(pieces[m]) for m in range(2)])


@partial(
    jax.jit,
    static_argnames=(
        "kz_key", "radii", "dims", "mode", "eps", "interpret", "passes",
        "stagger",
    ),
)
def _rl_fused_pass(
    carry,
    aux,
    gy_all,
    gx_all,
    gx_cat,
    *extra,
    kz_key: tuple,   # per-term z taps (already convolution-ordered)
    radii: tuple,    # (rz, ry, rx)
    dims: tuple,
    mode: str,       # "ratio" | "mult" | "plain" | "*_accel"
    eps: float,
    interpret: bool,
    passes: int | None = None,
    stagger: int = 0,  # 0 = symmetric K=384; +1/-1 = staggered K=256
):
    """One fused conv3 + epilogue pass over the padded carry.

    mode="ratio": out = aux / max(conv(carry), eps)   (aux = data)
    mode="mult":  out = aux * conv(carry)             (aux = est)
    mode="plain": out = conv(carry)                   (aux ignored)

    Biggs-Andrews accelerated variants (the extrapolated point
    ``y = max(x + alpha*dx, 0)`` never exists in HBM — docs/kernels.md):

    mode="ratio_accel": ``carry`` is the estimate x, ``extra`` is
    ``(dx_bf16, alpha_1x1)``; each DMA'd chunk is combined ONCE in the
    VMEM ring (``ring = max(ring + alpha*ring_dx, 0)``) right after its
    arrival wait, so the convolution reads y —
    out = aux / max(conv(y), eps).

    mode="mult_accel": ``carry`` is the ratio, ``aux`` is x, ``extra``
    is ``(dx_bf16, g_prev_bf16, alpha_1x1)``; the epilogue recomputes
    y per tile, writes ``x_new = y * conv(ratio)`` (aliased onto x),
    the new step ``dx = x_new - x`` (bf16, aliased onto dx), the new
    gradient ``g = x_new - y`` (bf16, aliased onto g_prev), and
    accumulates the step-length partials ``sum(g*g_prev)`` /
    ``sum(g*g)`` per lane into a resident (8, 128) f32 output — the
    only XLA work left per accelerated iteration is a 256-element
    reduction and the alpha scalar update.

    ``stagger=+1``: input carry holds est at x offset +rx, output at
    offset 0 (one-sided right window); ``stagger=-1``: the adjoint
    direction (input at 0, output at +rx, one-sided left window). Both
    use 2-block K=256 x dots with a single 128-wide slab halo.
    """
    if passes is None:
        passes = _PASSES
    x_passes = passes if _X_PASSES == 0 else _X_PASSES
    rz, ry, rx = radii
    zp, yp, xa, sy, y_shift, bx, bz = dims
    by = _BY
    sx = bx + (256 if stagger == 0 else 128)
    nzb, nyb, nxb = zp // bz, yp // by, xa // bx
    n_terms = len(kz_key)
    total = nyb * nxb * nzb
    jblocks = bx // 128

    def kernel(*refs):
        if mode == "ratio_accel":
            (in_ref, aux_ref, gy_ref, gx_ref, gxc_ref, dxin_ref,
             alpha_ref, out_ref, ring, yz_scr, sems, ring_dx,
             sems_dx) = refs
        elif mode == "mult_accel":
            (in_ref, aux_ref, gy_ref, gx_ref, gxc_ref, dx_ref, gp_ref,
             alpha_ref, out_ref, dxo_ref, go_ref, part_ref, ring,
             yz_scr, sems) = refs
        else:
            (in_ref, aux_ref, gy_ref, gx_ref, gxc_ref, out_ref, ring,
             yz_scr, sems) = refs
        yi = pl.program_id(0)
        xi = pl.program_id(1)
        k = pl.program_id(2)
        s = (yi * nxb + xi) * nzb + k

        def chunk_coords(j):
            col = j // nzb
            y2 = col // nxb
            x2 = jax.lax.rem(col, nxb)
            k2 = jax.lax.rem(j, nzb)
            y0 = pl.multiple_of(
                jnp.clip(y2 * by - ry - y_shift, 0, yp - sy), 8
            )
            # Symmetric/adjoint slabs start one block left of the
            # tile; the staggered conv pass (+1) starts AT the tile
            # (its window is one-sided to the right).
            x_lead = 0 if stagger > 0 else 128
            x0 = pl.multiple_of(
                jnp.clip(x2 * bx - x_lead, 0, xa - sx), 128
            )
            return k2, y0, x0

        def chunk_dma(j):
            """DMA for global chunk-sequence index j into ring slot j%4."""
            k2, y0, x0 = chunk_coords(j)
            return pltpu.make_async_copy(
                in_ref.at[
                    pl.ds(k2 * bz, bz), pl.ds(y0, sy), pl.ds(x0, sx)
                ],
                ring.at[jax.lax.rem(j, 4)],
                sems.at[jax.lax.rem(j, 4)],
            )

        if mode == "ratio_accel":
            def chunk_dma_dx(j):
                k2, y0, x0 = chunk_coords(j)
                return pltpu.make_async_copy(
                    dxin_ref.at[
                        pl.ds(k2 * bz, bz), pl.ds(y0, sy), pl.ds(x0, sx)
                    ],
                    ring_dx.at[jax.lax.rem(j, 4)],
                    sems_dx.at[jax.lax.rem(j, 4)],
                )

            def start_chunk(j):
                chunk_dma(j).start()
                chunk_dma_dx(j).start()

            def arrive_chunk(j):
                """Wait both chunk DMAs, then build the extrapolated
                point IN the ring: y = max(x + alpha*dx, 0). Runs
                exactly once per chunk (chunk 0 at s==0, chunk j>=1 at
                s==j-1), always before any tap reads the slot. At
                alpha == 0 this is max(x, 0) == x bitwise (the
                estimate and its pads are nonnegative), which keeps
                the <=2-iteration startup identical to plain RL."""
                chunk_dma(j).wait()
                chunk_dma_dx(j).wait()
                slot = jax.lax.rem(j, 4)
                alpha = alpha_ref[0, 0]
                ring[slot] = jnp.maximum(
                    ring[slot] + alpha * ring_dx[slot].astype(jnp.float32),
                    0.0,
                )
        else:
            def start_chunk(j):
                chunk_dma(j).start()

            def arrive_chunk(j):
                chunk_dma(j).wait()

        @pl.when(s == 0)
        def _():
            start_chunk(0)
            if total > 1:
                start_chunk(1)
            arrive_chunk(0)
            if mode == "mult_accel":
                part_ref[...] = jnp.zeros((8, 128), jnp.float32)

        @pl.when(s + 2 < total)
        def _():
            start_chunk(s + 2)

        @pl.when(s + 1 < total)
        def _():
            arrive_chunk(s + 1)

        dims_dot = (((1,), (0,)), ((), ()))
        dot = partial(
            jax.lax.dot_general,
            dimension_numbers=dims_dot,
            preferred_element_type=jnp.float32,
        )

        slot_p = jax.lax.rem(s + 3, 4)  # (s-1) mod 4
        slot_c = jax.lax.rem(s, 4)
        slot_n = jax.lax.rem(s + 1, 4)
        # Beyond-array z windows contribute zero (zero boundary). These
        # gate via jnp.where, NOT multiplication: the gated slot can
        # hold never-DMA'd scratch whose garbage bits may be NaN, and
        # NaN * 0 == NaN.
        is_prev_ok = k > 0
        is_next_ok = k < nzb - 1
        ysel = jnp.where(yi == 0, 0, jnp.where(yi == nyb - 1, 2, 1))
        # Slab-block shift at the clamped first/last x tiles. Each
        # staggered direction clamps on only ONE side.
        if stagger > 0:
            delta = jnp.where(xi == nxb - 1, 1, 0)
        elif stagger < 0:
            delta = jnp.where(xi == 0, -1, 0)
        else:
            delta = jnp.where(xi == 0, -1, jnp.where(xi == nxb - 1, 1, 0))
        first_x = xi > 0
        last_x = xi < nxb - 1

        for z in range(bz):
            # --- z taps from the ring window (convolution order) ----
            for t in range(n_terms):
                kz = np.asarray(kz_key[t], np.float32)
                tz = None
                for d in range(2 * rz + 1):
                    src = z - rz + d
                    co = (src + bz) // bz - 1  # chunk offset (static)
                    lr = (src + bz) % bz
                    slot = (slot_p, slot_c, slot_n)[co + 1]
                    gate = (is_prev_ok, None, is_next_ok)[co + 1]
                    tap = float(kz[2 * rz - d])
                    term = ring[slot, lr, :, :] * tap
                    if gate is not None:
                        term = jnp.where(gate, term, 0.0)
                    tz = term if tz is None else tz + term
                # Precision regimes: Mosaic runs manual bf16 hi/lo
                # splits (Precision.HIGH); interpret mode runs plain
                # f32 dots. The split of an ARITHMETIC CHAIN is not
                # clone-safe once interpret's ref-discharge turns the
                # kernel into pure XLA ops: the compiler may
                # rematerialize the chain per use with different FMA
                # contraction, and a 1-ulp difference across a bf16
                # rounding tie makes a stored hi inconsistent with its
                # lo (a full bf16-ulp error — observed on the z-tap
                # blend; optimization_barrier does NOT prevent the
                # cloning). On Mosaic the VMEM scratch is physical, so
                # the hardware path is safe — its bf16x3 numerics are
                # validated on the real MXU by scripts/bench_rl.py
                # parity_fused (2.6e-5 over RL-20).
                # --- banded y dot -------------------------------------
                gy_hi = gy_ref[ysel, 2 * t, :, :]
                gy_lo = gy_ref[ysel, 2 * t + 1, :, :]
                if interpret:
                    gy_full = gy_hi.astype(jnp.float32) + gy_lo.astype(
                        jnp.float32
                    )
                    yz = dot(gy_full, tz)
                else:
                    # (by, sy) @ (sy, sx): split the data side.
                    tz_hi = tz.astype(jnp.bfloat16)
                    tz_lo = (
                        tz - tz_hi.astype(jnp.float32)
                    ).astype(jnp.bfloat16)
                    yz = dot(gy_hi, tz_hi) + dot(gy_hi, tz_lo)
                    if passes >= 3:
                        yz = yz + dot(gy_lo, tz_hi)
                # Stage in VMEM: Mosaic supports dynamic lane slicing
                # only through refs, and the x dots below read
                # 128-blocks at a tile-dependent offset.
                if interpret:
                    yz_scr[t, 0, :, :] = yz
                else:
                    yz_hi = yz.astype(jnp.bfloat16)
                    yz_lo = (
                        yz - yz_hi.astype(jnp.float32)
                    ).astype(jnp.bfloat16)
                    yz_scr[t, 0, :, :] = yz_hi
                    yz_scr[t, 1, :, :] = yz_lo

            # --- block-tridiagonal x dots + epilogue ----------------
            if stagger == 0:
                interior_j = lambda j: 0 < j < jblocks - 1  # noqa: E731
                n_pieces, kcat = 3, 384
            elif stagger > 0:
                interior_j = lambda j: j < jblocks - 1  # noqa: E731
                n_pieces, kcat = 2, 256
            else:
                interior_j = lambda j: j > 0  # noqa: E731
                n_pieces, kcat = 2, 256
            for j in range(jblocks):
                prods = []
                if interior_j(j):
                    # Interior out block: one concatenated K=384 (K=256
                    # staggered) dot per pass (window and pieces are
                    # contiguous).
                    start = pl.multiple_of(
                        jnp.clip((j + delta) * 128, 0, sx - kcat), 128
                    )
                    for t in range(n_terms):
                        bh = yz_scr[t, 0, :, pl.ds(start, kcat)]
                        if interpret:
                            ch = gxc_ref[t, 0, :, :].astype(
                                jnp.float32
                            ) + gxc_ref[t, 1, :, :].astype(jnp.float32)
                            prods.append(dot(bh, ch))
                            continue
                        bl = yz_scr[t, 1, :, pl.ds(start, kcat)]
                        ch = gxc_ref[t, 0, :, :]
                        # (Stacking hi/lo into one (2*by, K) dot to share
                        # the stencil weight load measured 42.51 vs 42.49
                        # ms/iter — no win; Mosaic already amortizes.)
                        prods += [dot(bh, ch), dot(bl, ch)]
                        if x_passes >= 3:
                            prods.append(dot(bh, gxc_ref[t, 1, :, :]))
                else:
                    for m in range(n_pieces):
                        start = pl.multiple_of(
                            jnp.clip((j + m + delta) * 128, 0, sx - 128), 128
                        )
                        # Zero-gate the beyond-array pieces at the
                        # clamped edge tiles (zero-boundary x).
                        gate = None
                        if stagger == 0:
                            if j == 0 and m == 0:
                                gate = first_x
                            if j == jblocks - 1 and m == 2:
                                gate = last_x
                        elif stagger > 0:
                            # Only j = jblocks-1 reaches here; its
                            # second window block leaves the slab at
                            # the clamped LAST tile.
                            if m == 1:
                                gate = last_x
                        else:
                            # Only j = 0; its first window block leaves
                            # the slab at the clamped FIRST tile.
                            if m == 0:
                                gate = first_x
                        for t in range(n_terms):
                            bh = yz_scr[t, 0, :, pl.ds(start, 128)]
                            if interpret:
                                if gate is not None:
                                    bh = jnp.where(gate, bh, 0.0)
                                px = gx_ref[t, m, 0, :, :].astype(
                                    jnp.float32
                                ) + gx_ref[t, m, 1, :, :].astype(jnp.float32)
                                prods.append(dot(bh, px))
                                continue
                            bl = yz_scr[t, 1, :, pl.ds(start, 128)]
                            if gate is not None:
                                zero = jnp.zeros((), jnp.bfloat16)
                                bh = jnp.where(gate, bh, zero)
                                bl = jnp.where(gate, bl, zero)
                            px_hi = gx_ref[t, m, 0, :, :]
                            prods += [dot(bh, px_hi), dot(bl, px_hi)]
                            if x_passes >= 3:
                                prods.append(dot(bh, gx_ref[t, m, 1, :, :]))
                # Tree sum keeps the MXU accumulation chain shallow.
                while len(prods) > 1:
                    prods = [
                        a + b for a, b in zip(prods[::2], prods[1::2])
                    ] + ([prods[-1]] if len(prods) % 2 else [])
                acc = prods[0]
                sl = slice(j * 128, (j + 1) * 128)
                if mode in ("ratio", "ratio_accel"):
                    out_ref[z, :, sl] = aux_ref[z, :, sl] / jnp.maximum(
                        acc, eps
                    )
                elif mode == "mult":
                    out_ref[z, :, sl] = aux_ref[z, :, sl] * acc
                elif mode == "mult_accel":
                    # Biggs epilogue: rebuild the extrapolated point y
                    # from the x/dx tiles (bitwise the ratio pass's y:
                    # same inputs, same one-rounding expression), apply
                    # the RL update, and emit the next acceleration
                    # state in place. In the rounding pads x = dx = 0
                    # so every output and both partial terms are 0 —
                    # the carry's zero invariant and the reductions
                    # are pad-clean.
                    alpha = alpha_ref[0, 0]
                    x_t = aux_ref[z, :, sl]
                    dxf = dx_ref[z, :, sl].astype(jnp.float32)
                    y_t = jnp.maximum(x_t + alpha * dxf, 0.0)
                    x_new = y_t * acc
                    out_ref[z, :, sl] = x_new
                    dxo_ref[z, :, sl] = (x_new - x_t).astype(jnp.bfloat16)
                    gb = (x_new - y_t).astype(jnp.bfloat16)
                    gbf = gb.astype(jnp.float32)
                    gpf = gp_ref[z, :, sl].astype(jnp.float32)
                    go_ref[z, :, sl] = gb
                    part_ref[0:1, :] += jnp.sum(
                        gbf * gpf, axis=0, keepdims=True
                    )
                    part_ref[1:2, :] += jnp.sum(
                        gbf * gbf, axis=0, keepdims=True
                    )
                else:
                    out_ref[z, :, sl] = acc

    # The mult pass updates est in place: aux (est) tiles are read in
    # the same grid order the out tiles are written, so block reads and
    # writes never touch the same memory in the wrong order. This caps
    # peak HBM at 3 carry-sized buffers per RL iteration (data + est +
    # ratio) — the production carry is 3.3 GB, and a 4th copy OOMs.
    # mult_accel extends the same pattern to the acceleration state:
    # dx and g_prev tiles alias their successors, so accelerated peak
    # HBM is 4 carry volumes (data + x + ratio + dx/2 + g/2).
    tile_spec = lambda: pl.BlockSpec(  # noqa: E731
        (bz, by, bx), lambda y, x, z: (z, y, x), memory_space=pltpu.VMEM
    )
    full_vmem = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)  # noqa: E731
    in_specs = [
        pl.BlockSpec(memory_space=pl.ANY),
        tile_spec(),
        full_vmem(),
        full_vmem(),
        full_vmem(),
    ]
    out_specs = tile_spec()
    out_shape = jax.ShapeDtypeStruct((zp, yp, xa), jnp.float32)
    scratch = [
        pltpu.VMEM((4, bz, sy, sx), jnp.float32),
        pltpu.VMEM(
            (n_terms, 2, by, sx),
            jnp.float32 if interpret else jnp.bfloat16,
        ),
        pltpu.SemaphoreType.DMA((4,)),
    ]
    aliases = {1: 0} if mode == "mult" else {}
    if mode == "ratio_accel":
        # + dx carry (ANY, ring-DMA'd like the estimate) + alpha (SMEM)
        in_specs += [
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ]
        scratch += [
            pltpu.VMEM((4, bz, sy, sx), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((4,)),
        ]
    elif mode == "mult_accel":
        # + dx, g_prev tiles + alpha; outputs (x_new, dx_new, g,
        # partials). The (8, 128) partials output has no blocking so
        # it stays VMEM-resident across the whole sequential grid —
        # the accumulation pattern.
        in_specs += [tile_spec(), tile_spec(), pl.BlockSpec(memory_space=pltpu.SMEM)]
        out_specs = (tile_spec(), tile_spec(), tile_spec(), full_vmem())
        out_shape = (
            jax.ShapeDtypeStruct((zp, yp, xa), jnp.float32),
            jax.ShapeDtypeStruct((zp, yp, xa), jnp.bfloat16),
            jax.ShapeDtypeStruct((zp, yp, xa), jnp.bfloat16),
            jax.ShapeDtypeStruct((8, 128), jnp.float32),
        )
        aliases = {1: 0, 5: 1, 6: 2}
    return pl.pallas_call(
        kernel,
        grid=(nyb, nxb, nzb),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2**20,
        ),
        input_output_aliases=aliases,
        interpret=interpret,
    )(carry, aux, gy_all, gx_all, gx_cat, *extra)


def conv3_fused(carry, aux, terms, layout, *, flip=False, mode="plain",
                eps=1e-6, interpret=None):
    """Zero-boundary separable conv3 (+ optional epilogue) on a padded
    carry. ``terms`` are (wz, wy, wx) tap triples; ``flip=True``
    applies the adjoint (taps reversed).

    On a staggered layout the x offsets alternate by direction: the
    conv pass (flip=False) reads est at offset rx and writes at 0; the
    adjoint (flip=True) reads at 0 and writes at offset rx. Callers
    place inputs with :func:`fused_pad` (``est=flip == False``)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    rz = len(terms[0][0]) // 2
    ry = len(terms[0][1]) // 2
    rx = len(terms[0][2]) // 2
    stagger = 0
    if layout.get("staggered"):
        stagger = -1 if flip else 1
    kz_key, gys, gxs = [], [], []
    for wz, wy, wx in terms:
        wz, wy, wx = (np.asarray(w)[::-1] if flip else np.asarray(w)
                      for w in (wz, wy, wx))
        kz_key.append(tuple(float(v) for v in wz))
        gys.append(y_stencil_variants(wy, layout))
        gxs.append(
            x_stencil_pieces_staggered(wx, rx, stagger)
            if stagger
            else x_stencil_pieces(wx, rx)
        )
    # gy_all: (3, 2*T, by, sy); gx_all: (T, n_pieces, 2, 128, 128)
    gy_all = jnp.asarray(
        np.concatenate(gys, axis=1), dtype=jnp.bfloat16
    )
    gx_np = np.stack(gxs)
    gx_all = jnp.asarray(gx_np, dtype=jnp.bfloat16)
    gx_cat = jnp.asarray(_cat_pieces(gx_np), dtype=jnp.bfloat16)
    return _rl_fused_pass(
        carry, aux, gy_all, gx_all, gx_cat,
        kz_key=tuple(kz_key), radii=(rz, ry, rx), dims=layout["dims"],
        mode=mode, eps=eps, interpret=interpret, stagger=stagger,
    )


def _cat_pieces(gx_stack: np.ndarray) -> np.ndarray:
    """(T, P, 2, 128, 128) pieces -> (T, 2, P*128, 128) row-concatenated
    window stencils (the interior out blocks use one K=P*128 dot)."""
    return np.concatenate(
        [gx_stack[:, m] for m in range(gx_stack.shape[1])], axis=2
    )


_RL_FUSED_CACHE = LruCache(maxsize=8)


def rl_fused_supported(image_shape, psf_shape) -> bool:
    return fused_best_layout(tuple(image_shape), tuple(psf_shape)) is not None


def rl_fused(image, psf_np, terms, settings, iterations):
    """Richardson-Lucy on the fused-kernel padded carry.

    Semantics identical to the ``linear_pallas`` backend (zero-boundary
    conv on the half-PSF padded G grid): the fp64 oracle is
    ``richardson_lucy_reference_separable(boundary="zero")``. The
    volume is transposed y<->x up front when that orientation pads
    less (see :func:`fused_best_layout`); the two transposes cost two
    XLA passes per whole RL run.
    """
    interpret = jax.default_backend() != "tpu"
    if settings.matmul_precision == "highest":
        logger.warning(
            "the fused RL backend runs manual 3-pass bf16 dots "
            "(Precision.HIGH); matmul_precision='highest' is not "
            "available in-kernel — set separable_backend='matmul' if "
            "HIGHEST is required"
        )
    best = fused_best_layout(tuple(image.shape), tuple(psf_np.shape))
    assert best is not None, "caller must check rl_fused_supported"
    layout, swap = best
    if swap:
        psf_np = np.ascontiguousarray(psf_np.transpose(0, 2, 1))
        terms = [(wz, wx, wy) for wz, wy, wx in terms]
    radii = tuple(k // 2 for k in psf_np.shape)
    pads = tuple((r, r) for r in radii)

    low_iters = min(
        getattr(settings, "fused_low_precision_iters", 0), iterations
    )
    # The decomposition settings determine `terms` from the same PSF
    # bytes, so the terms themselves must key the cache: same PSF with
    # a different rank budget is a different baked kernel.
    terms_key = tuple(
        tuple(np.asarray(w, np.float64).tobytes() for w in t) for t in terms
    )
    key = (
        tuple(image.shape), psf_np.tobytes(), terms_key, iterations,
        low_iters, settings.epsilon, settings.pad_mode, swap, "fused",
        getattr(settings, "acceleration", "none"),
        # _FUSE_ACCEL picks the accelerated loop's implementation
        # (in-kernel vs generic rl_outer); bake-off monkeypatches flip
        # it in-process, so it must key the compiled closure.
        _FUSE_ACCEL,
        # Layout dims key the cache too: SHRIMPY_RL_BX/BZ are re-read
        # per call inside fused_layout, so an in-process bake-off that
        # changes them must not get the previous layout's compiled
        # closure back.
        layout["shape"], layout["bz"], layout["bx"], layout["sy"],
        layout["y_shift"], bool(layout.get("staggered")),
    )
    if key not in _RL_FUSED_CACHE:
        accel = getattr(settings, "acceleration", "none") == "biggs"
        rz, ry, rx = radii
        stagger = bool(layout.get("staggered"))
        kz_c, kz_f, gy_c, gy_f, gx_c, gx_f = [], [], [], [], [], []
        for wz, wy, wx in terms:
            wz, wy, wx = (np.asarray(w, np.float64) for w in (wz, wy, wx))
            kz_c.append(tuple(float(v) for v in wz))
            kz_f.append(tuple(float(v) for v in wz[::-1]))
            gy_c.append(y_stencil_variants(wy, layout))
            gy_f.append(y_stencil_variants(wy[::-1], layout))
            if stagger:
                gx_c.append(x_stencil_pieces_staggered(wx, rx, 1))
                gx_f.append(x_stencil_pieces_staggered(wx[::-1], rx, -1))
            else:
                gx_c.append(x_stencil_pieces(wx, rx))
                gx_f.append(x_stencil_pieces(wx[::-1], rx))
        # Keep stencils as HOST numpy in the cached closure: rl_fused
        # may be called while tracing (lax.map / shard_map bodies), and
        # jnp constants created there are trace-local tracers — caching
        # them leaks dead tracers into the next trace. run() converts
        # per trace (tiny arrays, baked as constants).
        bf16 = np.dtype(jnp.bfloat16)
        gy_conv_np = np.concatenate(gy_c, axis=1).astype(bf16)
        gy_flip_np = np.concatenate(gy_f, axis=1).astype(bf16)
        gxc_np = np.stack(gx_c).astype(bf16)
        gxf_np = np.stack(gx_f).astype(bf16)
        gxcat_c_np = _cat_pieces(gxc_np).astype(bf16)
        gxcat_f_np = _cat_pieces(gxf_np).astype(bf16)
        eps = settings.epsilon
        pad_mode = settings.pad_mode
        dims = layout["dims"]
        interior_est = layout["interior_est"]
        kzc, kzf = tuple(kz_c), tuple(kz_f)
        stg_c = 1 if stagger else 0   # conv/ratio pass direction
        stg_f = -1 if stagger else 0  # adjoint/mult pass direction

        def run(img):
            gy_conv = jnp.asarray(gy_conv_np)
            gy_flip = jnp.asarray(gy_flip_np)
            gx_conv = jnp.asarray(gxc_np)
            gx_flip = jnp.asarray(gxf_np)
            gxcat_conv = jnp.asarray(gxcat_c_np)
            gxcat_flip = jnp.asarray(gxcat_f_np)
            if swap:
                img = jnp.transpose(img, (0, 2, 1))
            g_vol = jnp.pad(img.astype(jnp.float32), pads, mode=pad_mode)
            data = fused_pad(jnp.maximum(g_vol, 0.0), layout)
            est0 = fused_pad(jnp.maximum(g_vol, eps), layout, est=True)

            def make_step(passes):
                def step(est, _):
                    ratio = _rl_fused_pass(
                        est, data, gy_conv, gx_conv, gxcat_conv,
                        kz_key=kzc, radii=radii, dims=dims,
                        mode="ratio", eps=eps, interpret=interpret,
                        passes=passes, stagger=stg_c,
                    )
                    est = _rl_fused_pass(
                        ratio, est, gy_flip, gx_flip, gxcat_flip,
                        kz_key=kzf, radii=radii, dims=dims,
                        mode="mult", eps=eps, interpret=interpret,
                        passes=passes, stagger=stg_f,
                    )
                    return est, None

                return step

            # Precision schedule: the first low_iters iterations run
            # 2-pass dots (the stencil-side bf16 correction dropped);
            # the remaining 3-pass (HIGH) iterations contract the
            # early-phase trajectory error away (RL is a fixed-point
            # iteration whose late iterations govern the result).
            # _PASSES (SHRIMPY_RL_DOT_PASSES) sets the standard
            # iterations' dot precision — 3 (HIGH) in production, 2
            # only for bake-offs. Acceleration state (Biggs-Andrews)
            # persists across the phase boundary either way.
            phases = (
                (2, low_iters),
                (_PASSES, iterations - low_iters),
            )
            if accel and _FUSE_ACCEL:
                # In-kernel Biggs: the extrapolation rides the two
                # kernel launches (ratio_accel builds y in the DMA
                # ring; mult_accel's epilogue emits x/dx/g and the
                # alpha partials), so an accelerated iteration costs
                # two launches + a 256-element XLA reduction — no
                # HBM-bound elementwise epilogue (the generic
                # rl_outer path measured ~43 ms/iter of epilogue
                # against the 35.4 ms/iter kernel; docs/kernels.md).
                def make_body(passes):
                    def body(carry, _):
                        x, dx, gp, den_prev, alpha = carry
                        a2 = alpha.reshape(1, 1)
                        ratio = _rl_fused_pass(
                            x, data, gy_conv, gx_conv, gxcat_conv,
                            dx, a2,
                            kz_key=kzc, radii=radii, dims=dims,
                            mode="ratio_accel", eps=eps,
                            interpret=interpret, passes=passes,
                            stagger=stg_c,
                        )
                        x_new, dx_new, g_new, parts = _rl_fused_pass(
                            ratio, x, gy_flip, gx_flip, gxcat_flip,
                            dx, gp, a2,
                            kz_key=kzf, radii=radii, dims=dims,
                            mode="mult_accel", eps=eps,
                            interpret=interpret, passes=passes,
                            stagger=stg_f,
                        )
                        num = jnp.sum(parts[0])
                        den = jnp.sum(parts[1])
                        alpha_next = jnp.clip(
                            num / (den_prev + 1e-30), 0.0, 0.999
                        )
                        return (
                            x_new, dx_new, g_new, den, alpha_next
                        ), None

                    return body

                zeros16 = jnp.zeros(est0.shape, jnp.bfloat16)
                carry = (
                    est0, zeros16, zeros16,
                    jnp.float32(0.0), jnp.float32(0.0),
                )
                for passes_n, length in phases:
                    if length:
                        carry, _ = jax.lax.scan(
                            make_body(passes_n), carry, None, length
                        )
                est = carry[0]
            else:
                from shrimpy_tpu.ops.rl_outer import run_rl_outer

                est = run_rl_outer(
                    [
                        (make_step(2), low_iters),
                        (make_step(_PASSES), iterations - low_iters),
                    ],
                    est0,
                    accel,
                )
            g_out = est[interior_est]
            crop = tuple(
                slice(lo, lo + n) for (lo, _), n in zip(pads, img.shape)
            )
            out = g_out[crop]
            return jnp.transpose(out, (0, 2, 1)) if swap else out

        # (donate_input is honored one level up, at richardson_lucy's
        # dispatch boundary — uniformly for every backend.)
        _RL_FUSED_CACHE[key] = jax.jit(run)
    return _RL_FUSED_CACHE[key](image)
