"""Pallas kernels for the separable Richardson-Lucy convolutions.

Three kernels, in increasing production relevance:

1. :func:`conv3_circular_pallas` — all three axes as shifted VPU FMAs
   over wrap-padded tiles. Exact f32 but slower than the XLA matmul
   chain on v5e (~98 vs ~55 ms/conv3: lane-offset slices lower to
   vector rotates and the tap chains serialize). Kept as the exact-f32
   reference backend.
2. :func:`convzy_circular_pallas` — z taps (free leading-dim slices) +
   banded-y MXU matmul, circular via per-call wrap pads; 2x as a
   standalone conv but the pads erase the win inside the RL scan.
3. ``_convzy_linear_jit`` + the ``lp_*`` layout helpers — the
   PRODUCTION backend for large grids (``separable_backend
   'linear_pallas'``): zero-boundary conv over a permanently padded
   carry. RL's multiplicative update makes zeros absorbing, so the
   carry's pads stay exactly zero across iterations and NO in-loop
   padding exists; tile DMAs are tiling-aligned by construction.
   Measured RL-20 at (128, 2888, 800): 1.30 s vs 1.80 s matmul.

All parity-tested against fp64 circulant/Toeplitz oracles
(tests/test_conv3_pallas.py, tests/test_deconv_separable.py).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


from shrimpy_tpu.utils.shapes import round_up as _round_up


def _choose_tiles(nz: int, ny: int, nx: int, radii) -> tuple[int, int, int]:
    """Tile sizes: the INPUT SLAB under ~4 MB (the live set — slab +
    t1 + t2 + out — then lands around ~10 MB of VMEM)."""
    rz, ry, rx = radii
    bx = min(_round_up(nx, 128), 256)
    by = min(_round_up(ny, 8), 128)
    bz = 8
    while (bz + 2 * rz) * (by + 2 * ry) * (bx + 2 * rx) * 4 > 4 * 2**20 and bz > 2:
        bz //= 2
    return bz, by, bx


def _make_kernel(taps, radii, tiles, slab):
    rz, ry, rx = radii
    bz, by, bx = tiles
    sy, sx = slab  # halo'd y/x slab sizes, rounded to (8, 128) tiling

    def kernel(in_ref, out_ref, vm, t1, t2, sem):
        zi = pl.program_id(0)
        yi = pl.program_id(1)
        xi = pl.program_id(2)
        # DMA starts land on (by, bx) multiples (tiling-aligned); the
        # slab sizes are rounded up to the (8, 128) memref tiling.
        dma = pltpu.make_async_copy(
            in_ref.at[
                pl.ds(zi * bz, bz + 2 * rz),
                pl.ds(yi * by, sy),
                pl.ds(xi * bx, sx),
            ],
            vm,
            sem,
        )
        dma.start()
        dma.wait()

        # In-place scratch accumulation keeps the live set to
        # vm + t1 + t2 + out (an unrolled expression DAG blew VMEM).
        out_ref[...] = jnp.zeros((bz, by, bx), jnp.float32)
        # Shifted-FMA indexing: slab offset d maps to input index
        # (out - r + d), so tap index 2r-d makes each axis a CONVOLUTION
        # (circulant convention; plain k[d] would compute the adjoint
        # for asymmetric taps).
        for kz, ky, kx in taps:
            # x taps: shifted FMA over the lane dimension. (Slab rows
            # beyond by+2ry are padding junk, never consumed below.)
            t1[...] = float(kx[2 * rx]) * vm[:, :, 0:bx]
            for dx in range(1, 2 * rx + 1):
                t1[...] = t1[...] + float(kx[2 * rx - dx]) * vm[:, :, dx : dx + bx]
            # y taps: shifted FMA over sublanes.
            t2[...] = float(ky[2 * ry]) * t1[:, 0:by, :]
            for dy in range(1, 2 * ry + 1):
                t2[...] = t2[...] + float(ky[2 * ry - dy]) * t1[:, dy : dy + by, :]
            # z taps accumulate straight into the output tile.
            for dz in range(2 * rz + 1):
                out_ref[...] = (
                    out_ref[...] + float(kz[2 * rz - dz]) * t2[dz : dz + bz, :, :]
                )

    return kernel


@partial(
    jax.jit,
    static_argnames=("taps_key", "radii", "interpret"),
)
def _conv3_pallas_jit(vol, *, taps_key, radii, interpret):
    """``taps_key``: hashable tuple-of-tuples of float taps (per term,
    per axis) — baked into the kernel as immediates."""
    taps = [
        tuple(np.asarray(t, np.float32) for t in term) for term in taps_key
    ]
    rz, ry, rx = radii
    nz, ny, nx = vol.shape
    bz, by, bx = _choose_tiles(nz, ny, nx, radii)
    nz_p, ny_p, nx_p = (_round_up(n, b) for n, b in zip(vol.shape, (bz, by, bx)))
    sy = _round_up(by + 2 * ry, 8)
    sx = _round_up(bx + 2 * rx, 128)

    # Circular semantics: wrap-pad by the radii; tile/slab rounding pads
    # with zeros that are cropped after.
    vp = jnp.pad(vol.astype(jnp.float32), ((rz, rz), (ry, ry), (rx, rx)), mode="wrap")
    vp = jnp.pad(
        vp,
        (
            (0, nz_p - nz),
            (0, (ny_p + sy - by) - (ny + 2 * ry)),
            (0, (nx_p + sx - bx) - (nx + 2 * rx)),
        ),
    )

    kernel = _make_kernel(taps, radii, (bz, by, bx), (sy, sx))
    out = pl.pallas_call(
        kernel,
        grid=(nz_p // bz, ny_p // by, nx_p // bx),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (bz, by, bx), lambda z, y, x: (z, y, x), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((nz_p, ny_p, nx_p), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((bz + 2 * rz, sy, sx), jnp.float32),
            pltpu.VMEM((bz + 2 * rz, sy, bx), jnp.float32),
            pltpu.VMEM((bz + 2 * rz, by, bx), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(vp)
    return out[:nz, :ny, :nx]


# ---------------------------------------------------------------------------
# Fused z-taps + banded-y MXU kernel (the production RL conv backend)
# ---------------------------------------------------------------------------
#
# Measured on v5e at the production grid (136 x 2944 x 820): this
# kernel + a dense-x XLA einsum = ~28 ms per 3-axis conv vs ~55 ms for
# the all-XLA circulant path. The z taps are free leading-dim slices in
# VMEM; the y conv is one banded (by x by+2ry) MXU matmul per z-slice;
# x stays a dense circulant einsum in XLA (already MXU-efficient).


# y tile height shared by _convzy_pallas_jit's block scheme and the
# caller-built stencils (convzy_circular_pallas).
_CIRC_BY = 128


def _y_stencil(taps: np.ndarray, by: int, ry: int) -> np.ndarray:
    """(by, by+2ry) window stencil: out[a] = sum_i taps[i] * w[a + 2ry - i]."""
    g = np.zeros((by, by + 2 * ry), np.float32)
    rows = np.arange(by)
    for i, v in enumerate(np.asarray(taps, np.float32)):
        g[rows, rows + (2 * ry - i)] += v
    return g


@partial(jax.jit, static_argnames=("kz_key", "radii", "interpret"))
def _convzy_pallas_jit(vol, gy, *, kz_key, radii, interpret):
    kz = np.asarray(kz_key, np.float32)
    rz, ry = radii
    nz, ny, nx = vol.shape
    bz, by, bx = 8, _CIRC_BY, min(_round_up(nx, 128), 512)
    nz_p, ny_p, nx_p = (_round_up(n, b) for n, b in zip(vol.shape, (bz, by, bx)))
    sy = by + 2 * ry
    sy_dma = _round_up(sy, 8)

    def kernel(in_ref, gy_ref, out_ref, vm, sem):
        zi = pl.program_id(0)
        yi = pl.program_id(1)
        xi = pl.program_id(2)
        dma = pltpu.make_async_copy(
            in_ref.at[
                pl.ds(zi * bz, bz + 2 * rz),
                pl.ds(yi * by, sy_dma),
                pl.ds(xi * bx, bx),
            ],
            vm,
            sem,
        )
        dma.start()
        dma.wait()
        # z taps: leading-dim slices are free (no lane/sublane movement).
        # Slab row d maps to input row (out_row - rz + d): weight with
        # kz[2rz - d] so the sum is a CONVOLUTION, matching the
        # circulant/_convzy_linear_jit convention (asymmetric PSFs flip
        # otherwise).
        tz = sum(
            float(kz[2 * rz - d]) * vm[d : d + bz, :, :]
            for d in range(2 * rz + 1)
        )
        g = gy_ref[...]
        for z in range(bz):
            out_ref[z] = jax.lax.dot_general(
                g,
                tz[z, 0:sy, :],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )

    # Circular halo via wrap-pad; tile rounding pads with zeros that are
    # only consumed by cropped output rows.
    vp = jnp.pad(vol.astype(jnp.float32), ((rz, rz), (ry, ry), (0, 0)), mode="wrap")
    vp = jnp.pad(
        vp,
        (
            (0, nz_p - nz),
            (0, (ny_p + sy_dma - by) - (ny + 2 * ry)),
            (0, nx_p - nx),
        ),
    )
    out = pl.pallas_call(
        kernel,
        grid=(nz_p // bz, ny_p // by, nx_p // bx),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((by, sy), lambda z, y, x: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (bz, by, bx), lambda z, y, x: (z, y, x), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((nz_p, ny_p, nx_p), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((bz + 2 * rz, sy_dma, bx), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(vp, gy)
    return out[:nz, :ny, :nx]


def convzy_circular_pallas(
    vol,
    kz_taps,
    ky_taps,
    *,
    flip: bool = False,
    interpret: bool | None = None,
):
    """Circular conv along z and y only (x handled by the caller)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    kz = np.asarray(kz_taps, np.float32)
    ky = np.asarray(ky_taps, np.float32)
    if flip:
        kz, ky = kz[::-1], ky[::-1]
    ry = len(ky) // 2
    # 128 = _convzy_pallas_jit's internal y tile (by); the stencil
    # must be built for the SAME tile height the kernel blocks on.
    gy = jnp.asarray(_y_stencil(ky, _CIRC_BY, ry))
    return _convzy_pallas_jit(
        jnp.asarray(vol),
        gy,
        kz_key=tuple(float(v) for v in kz),
        radii=(len(kz) // 2, ry),
        interpret=interpret,
    )


# ---------------------------------------------------------------------------
# Zero-boundary z+y kernel over a permanently-padded carry (RL fast path)
# ---------------------------------------------------------------------------
#
# Richardson-Lucy's update is multiplicative, so zeros are absorbing:
# a carry stored on a zero-padded grid keeps its pads zero through every
# iteration for free. That removes ALL in-loop padding — this kernel
# reads the padded carry directly with aligned DMAs (pad_top_z = bz,
# pad_top_y = by so tile starts stay tiling-aligned; the constant
# sub-8 y misalignment of the halo start is folded into the stencil).

_LP_BZ, _LP_BY, _LP_BX = 8, 128, 512


def lp_layout(
    g_shape: tuple[int, int, int], rz: int, ry: int
) -> dict:
    """Padded-carry layout for the linear (zero-boundary) RL backend.

    Guards the kernel's radius contract HERE (not just at the deconv
    call sites): out-of-bound radii don't fail loudly downstream — the
    halo slab start clips under REAL output rows and the result is
    silently wrong (measured rel err ~1.5 at ry=129).
    """
    gz, gy, gx = g_shape
    bz, by = _LP_BZ, _LP_BY
    if rz > bz:
        raise ValueError(
            f"linear_pallas supports PSF z radius <= {bz} (got {rz})"
        )
    if ry > by - 3:
        # sy = round_up(by + 2*ry + shift, 8) with the slab start
        # quantized down by up to 7 rows: ry past ~by-3 can push the
        # clipped slab under real rows.
        raise ValueError(
            f"linear_pallas supports PSF y radius <= {by - 3} (got {ry})"
        )
    nz_p = _round_up(gz, bz)
    ny_p = _round_up(gy, by)
    # x has no halo in the z+y kernel, so pad only to the 128-lane
    # multiple and pick the largest tile that divides it while keeping
    # the DMA slab within VMEM comfort (~6 MB). (Padding to a fixed 512
    # multiple inflated small volumes by up to 2x.)
    nx_p = _round_up(gx, 128)
    sy_probe = _round_up(by + 2 * ry + 8, 8)
    slab_rows = (bz + 2 * rz) * sy_probe * 4
    bx_cap = max(128, (6 * 2**20 // slab_rows) // 128 * 128)
    bx = next(
        b
        for b in range(min(nx_p, min(bx_cap, _LP_BX * 2)), 0, -128)
        if nx_p % b == 0
    )
    # y halo DMA: src start (by + y0 - ry) quantized down to 8; the
    # constant shift folds into the stencil columns.
    y_shift = (by - ry) % 8
    sy = _round_up(by + 2 * ry + y_shift, 8)
    shape = (bz + nz_p + bz, by + ny_p + by, nx_p)
    return {
        "bz": bz, "by": by, "bx": bx,
        "nz_p": nz_p, "ny_p": ny_p, "nx_p": nx_p,
        "sy": sy, "y_shift": y_shift,
        "shape": shape,
        "dims": (nz_p, ny_p, nx_p, sy, y_shift, bx),
        "interior": (
            slice(bz, bz + gz), slice(by, by + gy), slice(0, gx)
        ),
    }


def lp_pad(vol_g, layout) -> jnp.ndarray:
    """Embed a G-shaped volume into the padded carry layout (zeros)."""
    gz, gy, gx = vol_g.shape
    out = jnp.zeros(layout["shape"], jnp.float32)
    return out.at[layout["interior"]].set(vol_g.astype(jnp.float32))


@partial(
    jax.jit, static_argnames=("kz_key", "radii", "dims", "interpret", "precision")
)
def _convzy_linear_jit(
    carry, gy_mat, *, kz_key, radii, dims, interpret, precision="highest"
):
    """Zero-boundary z+y conv: padded carry in -> padded layout out.

    Edge tiles (whose outputs are entirely pad rows) read clamped slabs
    with shifted alignment — harmless, because every consumer re-zeros
    the pads (data/est multiplications by stored zeros).

    The halo'd slab DMA is double-buffered: each grid step prefetches
    the NEXT step's slab before computing on its own (grid steps run
    sequentially on a TPU core), hiding the HBM read behind the MXU
    dots (measured 25 -> ~14 ms per call at the production grid).
    """
    kz = np.asarray(kz_key, np.float32)
    rz, ry = radii
    nz_p, ny_p, nx_p, sy, y_shift, bx = dims
    bz, by = _LP_BZ, _LP_BY
    shape = (bz + nz_p + bz, by + ny_p + by, nx_p)
    nzb = shape[0] // bz
    nyb = shape[1] // by
    nxb = nx_p // bx
    z_max = shape[0] - (bz + 2 * rz)
    y_max = shape[1] - sy
    total = nzb * nyb * nxb
    prec = {
        "default": jax.lax.Precision.DEFAULT,
        "high": jax.lax.Precision.HIGH,
        "highest": jax.lax.Precision.HIGHEST,
    }[precision]

    def kernel(in_ref, gy_ref, out_ref, vm, sem):
        zi = pl.program_id(0)
        yi = pl.program_id(1)
        xi = pl.program_id(2)
        flat = (zi * nyb + yi) * nxb + xi
        slot = jax.lax.rem(flat, 2)

        def slab_dma(z, y, x, s):
            z0 = jnp.clip(z * bz - rz, 0, z_max)
            y0 = pl.multiple_of(jnp.clip(y * by - ry - y_shift, 0, y_max), 8)
            return pltpu.make_async_copy(
                in_ref.at[
                    pl.ds(z0, bz + 2 * rz),
                    pl.ds(y0, sy),
                    pl.ds(x * bx, bx),
                ],
                vm.at[s],
                sem.at[s],
            )

        @pl.when(flat == 0)
        def _():
            slab_dma(zi, yi, xi, slot).start()

        @pl.when(flat + 1 < total)
        def _():
            nxt = flat + 1
            x2 = jax.lax.rem(nxt, nxb)
            y2 = jax.lax.rem(nxt // nxb, nyb)
            z2 = nxt // (nxb * nyb)
            slab_dma(z2, y2, x2, 1 - slot).start()

        slab_dma(zi, yi, xi, slot).wait()
        # Slab row d maps to input row (out_row - rz + d): weight with
        # kz[2rz - d] so the sum is a CONVOLUTION (circulant convention),
        # not a correlation.
        tz = sum(
            float(kz[2 * rz - d]) * vm[slot, d : d + bz, :, :]
            for d in range(2 * rz + 1)
        )
        g = gy_ref[...]
        for z in range(bz):
            out_ref[z] = jax.lax.dot_general(
                g,
                tz[z, :, :],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=prec,
            )

    return pl.pallas_call(
        kernel,
        grid=(nzb, nyb, nxb),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((by, sy), lambda z, y, x: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (bz, by, bx), lambda z, y, x: (z, y, x), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct(shape, jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, bz + 2 * rz, sy, bx), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 2**20
        ),
        interpret=interpret,
    )(carry, gy_mat)


def lp_y_stencil(taps: np.ndarray, layout) -> np.ndarray:
    """(by, sy) stencil for the padded-carry layout.

    For an out row a (tile-local), the window row for tap i sits at
    local column a + (2ry - i) + y_shift... shifted by the quantized
    halo start. Edge clamping at the array top moves the start by up to
    (ry + y_shift); those rows are always zero pads so the mismatch
    contributes nothing.
    """
    by, sy = layout["by"], layout["sy"]
    ry = (len(taps)) // 2
    shift = layout["y_shift"]
    g = np.zeros((by, sy), np.float32)
    rows = np.arange(by)
    for i, v in enumerate(np.asarray(taps, np.float32)):
        g[rows, rows + (2 * ry - i) + shift] += v
    return g


def conv3_circular_pallas(
    vol,
    terms: list[tuple[np.ndarray, np.ndarray, np.ndarray]],
    *,
    flip: bool = False,
    interpret: bool | None = None,
):
    """Circular separable conv of ``vol`` by ``sum_k kz_k x ky_k x kx_k``.

    ``flip=True`` applies the adjoint (taps reversed — RL's correlation
    step). Matches the circulant-matmul path bit-for-bit in semantics.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    key = tuple(
        tuple(
            tuple(float(v) for v in (np.asarray(t)[::-1] if flip else np.asarray(t)))
            for t in term
        )
        for term in terms
    )
    radii = tuple(len(np.asarray(terms[0][a])) // 2 for a in range(3))
    for term in terms[1:]:
        if tuple(len(np.asarray(t)) // 2 for t in term) != radii:
            # The kernel bakes one (rz, ry, rx); a term with different
            # tap lengths would be convolved around the wrong centre.
            raise ValueError(
                "all separable terms must share per-axis tap lengths"
            )
    return _conv3_pallas_jit(
        jnp.asarray(vol), taps_key=key, radii=radii, interpret=interpret
    )
