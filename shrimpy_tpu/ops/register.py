"""Cross-modality affine registration: PCC seed + differentiable refinement.

The reference registers label-free <-> fluorescence volumes with a fixed
3x3 ``image_to_stage_matrix_xyz`` plus PCC translation estimates
(reference ``shrimpy/dynatrack/tracking.py:1172-1198``); heavy offline
registration is delegated to biahub (``README.md:126-128``). Here the
estimate itself is first-party and differentiable — the JAX-native
upgrade: seed the translation with phase cross-correlation, then refine
a full affine transform by gradient descent (optax Adam) on a
similarity loss, with the warp expressed as an XLA one-shot gather
(trilinear ``map_coordinates``-style resample) so the whole refinement
loop is one compiled ``lax.scan`` (BASELINE.json configs[2]).

Conventions
-----------
``matrix`` (3x3) and ``offset`` (3,) map **output** (fixed-frame) voxel
coordinates to **input** (moving-frame) voxel coordinates, ZYX order —
the same inverse-map convention as ``scipy.ndimage.affine_transform``
and :mod:`shrimpy_tpu.ops.deskew`, so the scipy oracle applies directly.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax

from shrimpy_tpu.config.schemas import RegistrationSettings
from shrimpy_tpu.ops.pcc import phase_cross_correlation


# ---------------------------------------------------------------------------
# Affine apply (trilinear resample)
# ---------------------------------------------------------------------------


def _trilinear_sample(vol: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """Sample ``vol`` at fractional ZYX ``coords`` (3, ...), zero outside.

    Straight trilinear interpolation with out-of-range corners weighted
    to zero — matches scipy's order=1 'grid-constant' boundary. The
    eight corner reads are flat 1-D ``take``s of precomputed linear
    indices: measured 1.74x faster than 3-D advanced indexing on v5e
    (XLA lowers the flat form to a simpler gather).
    """
    nz, ny, nx = vol.shape
    floors = jnp.floor(coords)
    fracs = coords - floors
    base = floors.astype(jnp.int32)
    flat = vol.reshape(-1)

    out = jnp.zeros(coords.shape[1:], dtype=vol.dtype)
    for dz in (0, 1):
        for dy in (0, 1):
            idx0 = base[0] + dz
            idx1 = base[1] + dy
            w_zy = jnp.where(dz, fracs[0], 1.0 - fracs[0]) * jnp.where(
                dy, fracs[1], 1.0 - fracs[1]
            )
            valid_zy = (idx0 >= 0) & (idx0 < nz) & (idx1 >= 0) & (idx1 < ny)
            lin_zy = (
                jnp.clip(idx0, 0, nz - 1) * ny + jnp.clip(idx1, 0, ny - 1)
            ) * nx
            for dx in (0, 1):
                idx2 = base[2] + dx
                w = w_zy * jnp.where(dx, fracs[2], 1.0 - fracs[2])
                valid = valid_zy & (idx2 >= 0) & (idx2 < nx)
                lin = lin_zy + jnp.clip(idx2, 0, nx - 1)
                vals = jnp.take(flat, lin.reshape(-1)).reshape(out.shape)
                out = out + jnp.where(valid, w, 0.0) * vals
    return out


@partial(jax.jit, static_argnames=("output_shape",))
def _translate_apply_jit(
    vol,
    offset,
    output_shape: tuple[int, int, int],
):
    """Pure-translation warp without gathers: 8 masked rolls + lerp.

    ``out[u] = vol[u + offset]`` (the identity-matrix case of the
    inverse map). Each trilinear corner is a whole-volume roll by an
    integer shift (runtime-valued — XLA lowers dynamic rolls to slices,
    no gather) with out-of-range voxels masked to zero ('grid-constant'
    boundary). ~3 orders of magnitude faster than the gather warp on
    TPU (gathers serialize; rolls are bandwidth-bound copies).

    The rolls run on the per-axis ``max(in, out)`` work grid and crop
    at the end: cropping the INPUT to a smaller output extent first
    would lose in-range source voxels beyond the crop (out[u] may read
    vol[u + offset] past the output extent).
    """
    vol = vol.astype(jnp.float32)
    # vol.shape is static inside jit: the work grid needs no extra arg.
    work = tuple(max(s, o) for s, o in zip(vol.shape, output_shape))
    if tuple(vol.shape) != work:
        pads = [(0, w - s) for s, w in zip(vol.shape, work)]
        vol = jnp.pad(vol, pads)
    offset = offset.astype(jnp.float32)
    base = jnp.floor(offset).astype(jnp.int32)
    frac = offset - jnp.floor(offset)

    out = jnp.zeros(work, jnp.float32)
    iotas = [
        jax.lax.broadcasted_iota(jnp.int32, work, a) for a in range(3)
    ]
    for dz in (0, 1):
        for dy in (0, 1):
            for dx in (0, 1):
                shift = base + jnp.array([dz, dy, dx], jnp.int32)
                w = (
                    jnp.where(dz, frac[0], 1.0 - frac[0])
                    * jnp.where(dy, frac[1], 1.0 - frac[1])
                    * jnp.where(dx, frac[2], 1.0 - frac[2])
                )
                rolled = jnp.roll(vol, tuple(-shift), axis=(0, 1, 2))
                valid = jnp.ones(work, jnp.bool_)
                for a in range(3):
                    src = iotas[a] + shift[a]
                    # The pad region holds zeros, so reads there are
                    # equivalent to grid-constant cval=0; only wrapped
                    # rolls must be masked.
                    valid &= (src >= 0) & (src < work[a])
                out = out + jnp.where(valid, w * rolled, 0.0)
    return out[tuple(slice(0, o) for o in output_shape)]


# Gather-free triangular warps stay off the gather path only while the
# per-axis integer-shift range is small (near-identity refined
# transforms need ~3-6 rolls per axis); beyond this the masked-roll
# sum loses to the one-shot gather.
_MAX_ROLLS_PER_AXIS = 16


def triangular_kind(matrix) -> str | None:
    """'lower'/'upper' when the CONCRETE matrix is exactly triangular
    (diagonal counts as lower), else None (traced or full matrices)."""
    try:
        m = np.asarray(matrix)
    except (jax.errors.TracerArrayConversionError, TypeError):
        return None
    if m.shape != (3, 3):
        return None
    if not np.all(np.isfinite(m)):
        return None
    if np.all(m[np.triu_indices(3, 1)] == 0.0):
        return "lower"
    if np.all(m[np.tril_indices(3, -1)] == 0.0):
        return "upper"
    return None


def _axis_shift_bounds(matrix, offset, axis, work) -> tuple[int, int]:
    """Concrete [lo, hi] of ``floor(in_a) - out_a`` over the work grid."""
    m = np.asarray(matrix, np.float64)
    t = float(np.asarray(offset, np.float64)[axis])
    lo = hi = t
    for j in range(3):
        coef = m[axis, j] - (1.0 if j == axis else 0.0)
        span = coef * (work[j] - 1)
        lo += min(0.0, span)
        hi += max(0.0, span)
    return int(np.floor(lo)), int(np.floor(hi))


def _shear_pass_1d(arr, axis, scale, off_grid, d_lo, d_hi):
    """Resample ``arr`` along ``axis`` at ``in = scale*i + off`` via
    masked rolls (linear interpolation, zero boundary).

    ``off_grid`` broadcasts against ``arr`` with the pass axis sized 1;
    ``[d_lo, d_hi]`` bounds ``floor(in) - i`` (concrete ints).
    """
    n = arr.shape[axis]
    i = jax.lax.broadcasted_iota(jnp.int32, arr.shape, axis)
    coord = scale * i.astype(jnp.float32) + off_grid
    fl = jnp.floor(coord)
    frac = coord - fl
    d = fl.astype(jnp.int32) - i
    out = jnp.zeros_like(arr)
    for k in range(d_lo, d_hi + 2):
        rolled = jnp.roll(arr, -k, axis=axis)
        src = i + k
        valid = (src >= 0) & (src < n)
        # rolled(k) is the LOW corner where d == k and the HIGH corner
        # where d == k-1; invalid corners contribute zero while the
        # partner keeps its weight (scipy grid-constant semantics).
        w = jnp.where(d == k, 1.0 - frac, 0.0) + jnp.where(
            d == k - 1, frac, 0.0
        )
        out = out + jnp.where(valid, w * rolled, 0.0)
    return out


@partial(
    jax.jit,
    static_argnames=("output_shape", "kind", "bounds"),
)
def _triangular_apply_jit(
    vol,
    matrix,
    offset,
    output_shape: tuple[int, int, int],
    kind: str,
    bounds: tuple,
):
    """Exact trilinear warp for a triangular inverse map, gather-free.

    A triangular map factors into three 1-D axis resamples whose
    composition equals joint trilinear interpolation EXACTLY: each
    pass's sampling coordinate depends only on output coordinates, and
    tensor-product interpolation is separable in the triangular order
    (z->y->x for lower-triangular, x->y->z for upper). Each 1-D pass
    runs as a handful of masked global rolls (the integer shift
    ``floor(in_a) - out_a`` of a near-identity transform takes only a
    few values across the grid), so the whole warp is bandwidth-bound
    copies — no gather. Oracle: scipy affine_transform order=1
    grid-constant, machine precision (tests/test_register.py).
    """
    vol = vol.astype(jnp.float32)
    work = tuple(max(s, o) for s, o in zip(vol.shape, output_shape))
    if tuple(vol.shape) != work:
        pads = [(0, w - s) for s, w in zip(vol.shape, work)]
        vol = jnp.pad(vol, pads)
    matrix = matrix.astype(jnp.float32)
    offset = offset.astype(jnp.float32)

    axes = (0, 1, 2) if kind == "lower" else (2, 1, 0)
    arr = vol
    iotas = [
        jax.lax.broadcasted_iota(jnp.int32, work, a).astype(jnp.float32)
        for a in range(3)
    ]
    for a in axes:
        off_grid = offset[a]
        for j in range(3):
            if j != a:
                off_grid = off_grid + matrix[a, j] * iotas[j]
        d_lo, d_hi = bounds[a]
        arr = _shear_pass_1d(arr, a, matrix[a, a], off_grid, d_lo, d_hi)
    return arr[tuple(slice(0, o) for o in output_shape)]


# Blocked candidate-window path (full-affine, gather-free) -----------------
#
# Joint trilinear interpolation of an affine map is a per-element sum
# over the 8 corners of ``floor(in(u))`` — a gather in general. But
# over a SMALL output block, the integer offset ``floor(in_a(u)) -
# u_a`` only spans a few values per axis when the matrix is close to a
# (permuted) identity — rotations of a few degrees, mild scales/shears:
# exactly the refined cross-modality maps of this domain. So: tile the
# output into (8, 32, 128) blocks; per block, dynamic-slice ONE input
# window positioned by the map at the block corner; then accumulate
# ``weight_k(u) * window[u_loc + k]`` over the static candidate set
# ``k`` — every read is a static slice of the window, every weight an
# iota expression, everything fuses into VPU FMAs. Exact: the same
# corner sum as joint trilinear, just enumerated by candidate instead
# of gathered (the triangular fast path plays the same trick one axis
# at a time; this is the 3-D product version, affordable because the
# block bounds the per-axis spread).

_BLOCK_ZYX = (8, 32, 128)
# Upper bound on the per-block candidate product (K_z*K_y*K_x): maps
# whose spread exceeds this (large rotations/scales) fall back to the
# gather. At 1024 the VPU FMA work is still a few ms at (64, 256, 256)
# vs ~300 ms for the gather; beyond it the window DMA amp also grows.
_MAX_CANDIDATES = 1024


def _blocked_plan(matrix, offset, in_shape, output_shape):
    """Host-side plan: block grid, candidate ranges, pad extents.

    Returns None when the map is outside this path's envelope.

    Geometry: per block, the window anchor is
    ``floor(in_a(block corner)) + floor(S_min_a)`` where ``S_a(u) =
    in_a(u) - in_a(corner) - u_loc_a`` is the identity-relative drift,
    with signed bounds ``S_min_a <= S_a <= S_max_a`` attained at block
    corners (affine). Then ``k_a(u) = floor(in_a(u) - anchor_a) -
    u_loc_a`` satisfies ``0 <= k_a <= 1 + ceil(S_max_a) -
    floor(S_min_a)`` — the static candidate range.
    """
    m = np.asarray(matrix, np.float64)
    t = np.asarray(offset, np.float64)
    if m.shape != (3, 3) or not (
        np.all(np.isfinite(m)) and np.all(np.isfinite(t))
    ):
        return None
    block = tuple(min(b, o) for b, o in zip(_BLOCK_ZYX, output_shape))
    grid = tuple(-(-o // b) for o, b in zip(output_shape, block))
    # Output domain actually evaluated: padded to block multiples.
    dom = tuple(g * b for g, b in zip(grid, block))

    k_hi = []
    s_min = []
    for a in range(3):
        smin = sum(
            min(0.0, m[a, j] - (1.0 if j == a else 0.0)) * (block[j] - 1)
            for j in range(3)
        )
        smax = sum(
            max(0.0, m[a, j] - (1.0 if j == a else 0.0)) * (block[j] - 1)
            for j in range(3)
        )
        # One-candidate margin each side: the runtime coordinates are
        # f32, and a knife-edge voxel whose exact d sits on the bound
        # can round one step outside the exact range — its corner
        # weight would silently vanish. The margin costs only the
        # (cheap, all-zero-weight) edge candidates.
        s_min.append(int(np.floor(smin)) - 1)
        k_hi.append(1 + int(np.ceil(smax)) - int(np.floor(smin)) + 2)
    n_cand = int(np.prod([k + 1 for k in k_hi]))
    if n_cand > _MAX_CANDIDATES:
        return None
    # Window extent: reads go up to u_loc_max + k_hi.
    win = tuple(b + k for b, k in zip(block, k_hi))

    # Pads so every window slice is in-bounds (affine extremes are at
    # the PADDED output domain's corners; dynamic_slice must never
    # clamp or the window would disagree with the weight coordinates).
    corners = np.array(
        [
            [z, y, x]
            for z in (0.0, dom[0] - 1.0)
            for y in (0.0, dom[1] - 1.0)
            for x in (0.0, dom[2] - 1.0)
        ],
        np.float64,
    )
    ins = corners @ m.T + t
    lo = np.floor(ins.min(axis=0)).astype(int)
    hi = np.floor(ins.max(axis=0)).astype(int)
    # anchor ranges over [lo + s_min, hi + s_min]; slice end over
    # [.., hi + s_min + win].
    pad_lo = tuple(
        int(max(0, -(l + s))) + 1 for l, s in zip(lo, s_min)
    )
    pad_hi = tuple(
        int(max(0, h + s + w - n)) + 1
        for h, s, w, n in zip(hi, s_min, win, in_shape)
    )
    return {
        "block": block,
        "k_hi": tuple(k_hi),
        "s_min": tuple(s_min),
        "win": win,
        "pad_lo": pad_lo,
        "pad_hi": pad_hi,
        "grid": grid,
    }


@partial(jax.jit, static_argnames=("output_shape", "plan_key"))
def _affine_apply_blocked_jit(
    vol, matrix, offset, output_shape: tuple[int, int, int], plan_key
):
    """Gather-free full-affine warp (see the plan note above).

    ``plan_key`` is the hashable plan tuple (block, k_hi, s_min, win,
    pads, grid) — static so the candidate loops unroll.
    """
    block, k_hi, s_min, win, pad_lo, pad_hi, grid = plan_key
    vol = vol.astype(jnp.float32)
    vol_p = jnp.pad(vol, list(zip(pad_lo, pad_hi)))
    matrix = matrix.astype(jnp.float32)
    offset = offset.astype(jnp.float32)
    pad_lo_f = jnp.asarray(pad_lo, jnp.float32)

    # Local output-coordinate iotas over one block (shared, static).
    iotas = [
        jax.lax.broadcasted_iota(jnp.int32, block, a).astype(jnp.float32)
        for a in range(3)
    ]

    def one_block(bidx):
        base = [
            bidx[a].astype(jnp.float32) * block[a] for a in range(3)
        ]
        corner_in = [
            matrix[a, 0] * base[0]
            + matrix[a, 1] * base[1]
            + matrix[a, 2] * base[2]
            + offset[a]
            + pad_lo_f[a]
            for a in range(3)
        ]
        anchor = [
            jnp.floor(corner_in[a]).astype(jnp.int32) + s_min[a]
            for a in range(3)
        ]
        window = jax.lax.dynamic_slice(vol_p, tuple(anchor), win)
        # Input coords of the block's voxels relative to the anchor.
        loc = [
            corner_in[a]
            - anchor[a].astype(jnp.float32)
            + matrix[a, 0] * iotas[0]
            + matrix[a, 1] * iotas[1]
            + matrix[a, 2] * iotas[2]
            for a in range(3)
        ]
        fl = [jnp.floor(loc[a]) for a in range(3)]
        frac = [loc[a] - fl[a] for a in range(3)]
        # Candidate index: floor(loc) - u_loc in [0, k_hi] by the plan.
        d = [
            fl[a].astype(jnp.int32) - iotas[a].astype(jnp.int32)
            for a in range(3)
        ]

        acc = jnp.zeros(block, jnp.float32)
        for kz in range(k_hi[0] + 1):
            wz = jnp.where(d[0] == kz, 1.0 - frac[0], 0.0) + jnp.where(
                d[0] == kz - 1, frac[0], 0.0
            )
            for ky in range(k_hi[1] + 1):
                wy = jnp.where(d[1] == ky, 1.0 - frac[1], 0.0) + jnp.where(
                    d[1] == ky - 1, frac[1], 0.0
                )
                wzy = wz * wy
                for kx in range(k_hi[2] + 1):
                    wx = jnp.where(
                        d[2] == kx, 1.0 - frac[2], 0.0
                    ) + jnp.where(d[2] == kx - 1, frac[2], 0.0)
                    piece = jax.lax.slice(
                        window,
                        (kz, ky, kx),
                        (kz + block[0], ky + block[1], kx + block[2]),
                    )
                    acc = acc + wzy * wx * piece
        return acc

    # Sequential map over the block grid, then stitch. (lax.map keeps
    # the program one fused block body; blocks are plenty of vector
    # work each.)
    idx = jnp.stack(
        jnp.meshgrid(
            jnp.arange(grid[0]), jnp.arange(grid[1]), jnp.arange(grid[2]),
            indexing="ij",
        ),
        axis=-1,
    ).reshape(-1, 3)
    blocks = jax.lax.map(lambda b: one_block((b[0], b[1], b[2])), idx)
    out = blocks.reshape(*grid, *block)
    out = out.transpose(0, 3, 1, 4, 2, 5).reshape(
        grid[0] * block[0], grid[1] * block[1], grid[2] * block[2]
    )
    return out[
        : output_shape[0], : output_shape[1], : output_shape[2]
    ]


@partial(jax.jit, static_argnames=("output_shape",))
def _affine_apply_jit(vol, matrix, offset, output_shape: tuple[int, int, int]):
    vol = vol.astype(jnp.float32)
    zz, yy, xx = jnp.meshgrid(
        jnp.arange(output_shape[0], dtype=jnp.float32),
        jnp.arange(output_shape[1], dtype=jnp.float32),
        jnp.arange(output_shape[2], dtype=jnp.float32),
        indexing="ij",
    )
    out_coords = jnp.stack([zz, yy, xx])  # (3, Z, Y, X)
    in_coords = (
        jnp.einsum("ij,j...->i...", matrix.astype(jnp.float32), out_coords)
        + offset.astype(jnp.float32).reshape(3, 1, 1, 1)
    )
    return _trilinear_sample(vol, in_coords)


def affine_apply(
    vol,
    matrix,
    offset=(0.0, 0.0, 0.0),
    output_shape: tuple[int, int, int] | None = None,
) -> jnp.ndarray:
    """Warp ``vol`` by the inverse map ``in = matrix @ out + offset`` (ZYX).

    Oracle: ``scipy.ndimage.affine_transform(vol, matrix, offset,
    output_shape, order=1, mode='grid-constant')``. Fast-path
    dispatch on a CONCRETE matrix:

    - identity matrix -> gather-free translation warp (masked rolls);
    - exactly triangular matrix (the ``pcc+refine`` default
      parameterization) with a small per-axis shift range -> exact
      sequential 1-D shear passes (masked rolls, still no gather);
    - any other concrete near-identity map (small rotations/scales/
      shears — candidate product <= 1024 per (8, 32, 128) block) -> the
      blocked candidate-window warp (static slices + fused VPU FMAs,
      still no gather);
    - anything else (or a traced matrix) -> the one-shot trilinear
      gather.
    """
    vol = jnp.asarray(vol)
    in_shape = tuple(vol.shape)
    output_shape = tuple(output_shape or vol.shape)
    try:
        is_translation = bool(
            np.array_equal(np.asarray(matrix), np.eye(3, dtype=np.float32))
        )
    except (jax.errors.TracerArrayConversionError, TypeError):
        is_translation = False  # traced matrix: general path
    if is_translation:
        return _translate_apply_jit(
            vol, jnp.asarray(offset, dtype=jnp.float32), output_shape
        )
    kind = triangular_kind(matrix)
    if kind is not None:
        try:
            off_np = np.asarray(offset)
        except (jax.errors.TracerArrayConversionError, TypeError):
            off_np = None
        if off_np is not None:
            work = tuple(
                max(s, o) for s, o in zip(in_shape, output_shape)
            )
            bounds = tuple(
                _axis_shift_bounds(matrix, off_np, a, work)
                for a in range(3)
            )
            if all(hi + 2 - lo <= _MAX_ROLLS_PER_AXIS for lo, hi in bounds):
                return _triangular_apply_jit(
                    vol,
                    jnp.asarray(matrix, dtype=jnp.float32),
                    jnp.asarray(offset, dtype=jnp.float32),
                    output_shape,
                    kind,
                    bounds,
                )
    # Full-affine concrete maps (rotations): the blocked candidate-
    # window path when the per-block spread is small enough.
    try:
        m_np = np.asarray(matrix)
        off_np = np.asarray(offset)
    except (jax.errors.TracerArrayConversionError, TypeError):
        m_np = None
        off_np = None
    if m_np is not None and off_np is not None:
        plan = _blocked_plan(m_np, off_np, in_shape, output_shape)
        if plan is not None:
            plan_key = (
                plan["block"], plan["k_hi"], plan["s_min"], plan["win"],
                plan["pad_lo"], plan["pad_hi"], plan["grid"],
            )
            return _affine_apply_blocked_jit(
                vol,
                jnp.asarray(matrix, dtype=jnp.float32),
                jnp.asarray(offset, dtype=jnp.float32),
                output_shape,
                plan_key,
            )
    return _affine_apply_jit(
        vol, jnp.asarray(matrix), jnp.asarray(offset, dtype=jnp.float32), output_shape
    )


# ---------------------------------------------------------------------------
# Similarity losses
# ---------------------------------------------------------------------------


def mse_loss(
    a: jnp.ndarray, b: jnp.ndarray, w: jnp.ndarray | None = None
) -> jnp.ndarray:
    """MSE, optionally weighted (``w`` masks out-of-support voxels)."""
    if w is None:
        return jnp.mean((a - b) ** 2)
    return jnp.sum(w * (a - b) ** 2) / jnp.maximum(jnp.sum(w), 1.0)


def ncc_loss(
    a: jnp.ndarray, b: jnp.ndarray, w: jnp.ndarray | None = None
) -> jnp.ndarray:
    """1 - normalized cross-correlation (robust to intensity scaling —
    the point for cross-modality label-free vs fluorescence data),
    optionally weighted."""
    if w is None:
        a = a - jnp.mean(a)
        b = b - jnp.mean(b)
        denom = jnp.sqrt(jnp.sum(a**2) * jnp.sum(b**2)) + 1e-8
        return 1.0 - jnp.sum(a * b) / denom
    n = jnp.maximum(jnp.sum(w), 1.0)
    a = a - jnp.sum(w * a) / n
    b = b - jnp.sum(w * b) / n
    denom = jnp.sqrt(jnp.sum(w * a**2) * jnp.sum(w * b**2)) + 1e-8
    return 1.0 - jnp.sum(w * a * b) / denom


# ---------------------------------------------------------------------------
# Estimate: PCC seed + differentiable refinement
# ---------------------------------------------------------------------------


@dataclass
class RegistrationResult:
    matrix: np.ndarray  # (3, 3) ZYX inverse map
    offset: np.ndarray  # (3,)
    translation_seed: np.ndarray  # (3,) PCC estimate
    final_loss: float | None  # None when no refinement ran ('pcc' mode)


@partial(
    jax.jit,
    static_argnames=(
        "iterations", "loss_name", "learning_rate", "down", "param"
    ),
)
def _refine_jit(
    fixed,
    moving,
    offset0,
    iterations: int,
    loss_name: str,
    learning_rate: float,
    down: int,
    param: str = "triangular",
):
    fixed = fixed.astype(jnp.float32)
    moving = moving.astype(jnp.float32)
    if down > 1:
        fixed_s = fixed[:, ::down, ::down]
    else:
        fixed_s = fixed
    out_shape = fixed_s.shape
    loss_fn = ncc_loss if loss_name == "ncc" else mse_loss

    # Parameterize the inverse map as identity + delta; the downsampled
    # grid maps back to full-res moving coordinates via the scale matrix.
    scale = jnp.diag(jnp.array([1.0, float(down), float(down)], jnp.float32))
    # dm is expressed in EDGE-PIXEL units: a raw matrix entry of lr
    # displaces the volume edge by lr * extent pixels per Adam step —
    # far outside the similarity basin (~the image's correlation
    # length), so the optimizer would jump out of a perfect PCC seed.
    # Dividing by the extent makes one unit of dm == one pixel of
    # displacement at the far edge, commensurate with the offset.
    coord_scale = float(max(fixed.shape))

    ones = jnp.ones_like(moving)

    def objective(params):
        dm = params["dm"]
        if param == "triangular":
            # Lower-triangular refinement: the result applies through
            # the exact gather-free shear path (see RegistrationSettings
            # .parameterization).
            dm = jnp.tril(dm)
        matrix = scale + dm / coord_scale
        offset = params["off"]
        warped = _affine_apply_jit(moving, matrix, offset, out_shape)
        # Score ONLY in-support voxels: the warp renders out-of-support
        # samples as 0, and comparing those zeros against real fixed
        # content rewards transforms that pull samples inward — the
        # loss genuinely decreases while the map shrinks away from a
        # correct PCC seed (measured ~9% scale error on border-filling
        # data). The support mask is the same warp applied to ones,
        # held out of the gradient (piecewise-constant in the params).
        support = _affine_apply_jit(ones, matrix, offset, out_shape)
        w = jax.lax.stop_gradient(
            (support > 0.999).astype(jnp.float32)
        )
        return loss_fn(warped, fixed_s, w)

    params0 = {
        "dm": jnp.zeros((3, 3), jnp.float32),
        "off": offset0.astype(jnp.float32),
    }
    opt = optax.adam(learning_rate)
    opt_state0 = opt.init(params0)

    def step(carry, _):
        params, opt_state = carry
        loss, grads = jax.value_and_grad(objective)(params)
        updates, opt_state = opt.update(grads, opt_state)
        params = optax.apply_updates(params, updates)
        return (params, opt_state), loss

    (params, _), _losses = jax.lax.scan(
        step, (params0, opt_state0), None, length=iterations
    )
    seed_loss = objective(params0)
    # Evaluate the FINAL parameters (the scan's last recorded loss is
    # pre-update, which would let a diverging last step slip past the
    # caller's guard).
    final_loss = objective(params)
    dm = params["dm"]
    if param == "triangular":
        dm = jnp.tril(dm)
    matrix = scale + dm / coord_scale
    # Rescale to a full-resolution inverse map: out coords at full res are
    # (z, y, x) = (z_s, down*y_s, down*x_s) -> divide the y/x columns.
    col_scale = jnp.array([1.0, 1.0 / down, 1.0 / down], jnp.float32)
    matrix_full = matrix * col_scale[None, :]
    return matrix_full, params["off"], final_loss, seed_loss


def estimate_registration(
    fixed,
    moving,
    settings: RegistrationSettings | None = None,
) -> RegistrationResult:
    """Estimate the affine map aligning ``moving`` onto ``fixed`` (ZYX).

    ``pcc``: translation only. ``pcc+refine``: PCC translation seed, then
    full-affine gradient refinement on the configured similarity loss.
    The returned (matrix, offset) feed :func:`affine_apply`:
    ``affine_apply(moving, matrix, offset)`` ~ ``fixed``.
    """
    settings = settings or RegistrationSettings()
    fixed = jnp.asarray(fixed)
    moving = jnp.asarray(moving)
    assert fixed.ndim == moving.ndim == 3

    # Seed precision: 'pcc' mode returns the seed as the answer, so it
    # pays for DFT upsampling; 'pcc+refine' polishes with gradients, so
    # the cheaper parabolic subpixel seed suffices (on v5e the DFT
    # upsample costs ~6s of extra compile for no accuracy gain after
    # refinement).
    shift = phase_cross_correlation(
        fixed,
        moving,
        maximum_shift=settings.maximum_shift,
        upsample="parabolic" if settings.method == "pcc+refine" else "dft",
        upsample_factor=20,
    )
    # PCC: positive shift = moving displaced positively relative to fixed,
    # so the inverse map offset is +shift... the moving-frame coordinate of
    # fixed voxel u is u + shift.
    offset0 = jnp.asarray(shift, dtype=jnp.float32)

    if settings.method == "pcc":
        # No refinement ran: final_loss is None (NaN would serialize as
        # the non-RFC token `NaN` in the register CLI's transform JSON).
        return RegistrationResult(
            matrix=np.eye(3, dtype=np.float32),
            offset=np.asarray(offset0),
            translation_seed=np.asarray(shift),
            final_loss=None,
        )

    matrix, offset, final_loss, seed_loss = _refine_jit(
        fixed,
        moving,
        offset0,
        settings.refine_iterations,
        settings.loss,
        settings.learning_rate,
        settings.downsample_yx,
        getattr(settings, "parameterization", "triangular"),
    )
    # NaN-safe: a non-finite refined loss must also fall back.
    if not (float(final_loss) <= float(seed_loss)):
        # Refinement made things worse (weakly-structured data can have
        # a similarity basin narrower than the optimizer's reach): keep
        # the PCC translation, loudly.
        import logging

        logging.getLogger(__name__).warning(
            "affine refinement diverged (loss %.4f > seed %.4f); "
            "keeping the PCC translation-only estimate",
            float(final_loss), float(seed_loss),
        )
        return RegistrationResult(
            matrix=np.eye(3, dtype=np.float32),
            offset=np.asarray(offset0),
            translation_seed=np.asarray(shift),
            final_loss=float(seed_loss),
        )
    return RegistrationResult(
        matrix=np.asarray(matrix),
        offset=np.asarray(offset),
        translation_seed=np.asarray(shift),
        final_loss=float(final_loss),
    )


def affine_apply_reference_scipy(
    vol: np.ndarray, matrix: np.ndarray, offset: np.ndarray, output_shape=None
) -> np.ndarray:
    """Trusted CPU oracle for :func:`affine_apply`."""
    from scipy import ndimage

    return ndimage.affine_transform(
        np.asarray(vol, dtype=np.float64),
        np.asarray(matrix, dtype=np.float64),
        offset=np.asarray(offset, dtype=np.float64),
        output_shape=output_shape or vol.shape,
        order=1,
        mode="grid-constant",
        cval=0.0,
    ).astype(np.float32)
