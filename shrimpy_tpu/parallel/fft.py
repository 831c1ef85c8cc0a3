"""Distributed slab FFT over a device-mesh axis (SURVEY §5.7).

3-D FFTs of volumes whose X extent is sharded across the mesh's
``space`` axis — the >HBM path: no device ever holds a whole volume.
The decomposition is the classic slab scheme:

* Z and Y transforms are device-local (each shard holds full Z/Y);
* the X transform rides two ``all_to_all`` transposes over ICI:
  reshard Y (split) against X (gather) -> local X FFT -> reshard back.

All transforms are complex (``fft``/``ifft``); callers embed real data.
Used from inside ``shard_map`` bodies — ``axis_name`` is the mesh axis.
The local FFT calls always see natural dim0-major layouts, which is
also what keeps this path portable (XLA's own GSPMD-partitioned FFTs
reach the CPU backend with layouts its FFT thunk rejects).

``transform`` picks the local 1-D transform implementation: "matmul"
(the default via "auto") evaluates each transform as MXU matmul-DFT
einsums (ops/dft.py) — exact, and several times faster on TPU where
XLA's FFT runs far off the bandwidth roofline; "xla" keeps jnp.fft.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from shrimpy_tpu.ops.dft import cdft, default_transform


def _fft1(block: jnp.ndarray, axis: int, inverse: bool, transform: str):
    if transform == "auto":
        transform = default_transform()
    if transform == "matmul":
        return cdft(block, axis, inverse=inverse)
    fn = jnp.fft.ifft if inverse else jnp.fft.fft
    return fn(block, axis=axis)


def fft3_sharded(
    block: jnp.ndarray, axis_name: str, transform: str = "auto"
) -> jnp.ndarray:
    """Forward 3-D FFT of ``(..., Z, Y, X_local)`` blocks.

    Returns the same layout with frequency content: the local X chunk
    holds this device's contiguous slice of the X frequency axis (the
    layout GSPMD's ``P(..., axis)`` would give the global spectrum).
    Requires ``Y % axis_size == 0``.
    """
    f = _fft1(block, -3, False, transform)
    f = _fft1(f, -2, False, transform)
    g = jax.lax.all_to_all(
        f, axis_name, split_axis=f.ndim - 2, concat_axis=f.ndim - 1, tiled=True
    )
    g = _fft1(g, -1, False, transform)
    return jax.lax.all_to_all(
        g, axis_name, split_axis=g.ndim - 1, concat_axis=g.ndim - 2, tiled=True
    )


def ifft3_sharded(
    block: jnp.ndarray, axis_name: str, transform: str = "auto"
) -> jnp.ndarray:
    """Inverse of :func:`fft3_sharded` (same layout contract)."""
    g = jax.lax.all_to_all(
        block,
        axis_name,
        split_axis=block.ndim - 2,
        concat_axis=block.ndim - 1,
        tiled=True,
    )
    g = _fft1(g, -1, True, transform)
    f = jax.lax.all_to_all(
        g, axis_name, split_axis=g.ndim - 1, concat_axis=g.ndim - 2, tiled=True
    )
    f = _fft1(f, -2, True, transform)
    return _fft1(f, -3, True, transform)
