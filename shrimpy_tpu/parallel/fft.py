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
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def fft3_sharded(block: jnp.ndarray, axis_name: str) -> jnp.ndarray:
    """Forward 3-D FFT of ``(..., Z, Y, X_local)`` blocks.

    Returns the same layout with frequency content: the local X chunk
    holds this device's contiguous slice of the X frequency axis (the
    layout GSPMD's ``P(..., axis)`` would give the global spectrum).
    Requires ``Y % axis_size == 0``.
    """
    f = jnp.fft.fft(block, axis=-3)
    f = jnp.fft.fft(f, axis=-2)
    g = jax.lax.all_to_all(
        f, axis_name, split_axis=f.ndim - 2, concat_axis=f.ndim - 1, tiled=True
    )
    g = jnp.fft.fft(g, axis=-1)
    return jax.lax.all_to_all(
        g, axis_name, split_axis=g.ndim - 1, concat_axis=g.ndim - 2, tiled=True
    )


def ifft3_sharded(block: jnp.ndarray, axis_name: str) -> jnp.ndarray:
    """Inverse of :func:`fft3_sharded` (same layout contract)."""
    g = jax.lax.all_to_all(
        block,
        axis_name,
        split_axis=block.ndim - 2,
        concat_axis=block.ndim - 1,
        tiled=True,
    )
    g = jnp.fft.ifft(g, axis=-1)
    f = jax.lax.all_to_all(
        g, axis_name, split_axis=g.ndim - 1, concat_axis=g.ndim - 2, tiled=True
    )
    f = jnp.fft.ifft(f, axis=-2)
    return jnp.fft.ifft(f, axis=-3)
