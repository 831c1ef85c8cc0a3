"""Replay source: hardware-free frames from a pre-acquired OME-Zarr.

The counterpart of the reference's ``ReplayCamera``
(``shrimpy/replay_camera.py:86-591``): serves volumes/frames from a
single-FOV or HCS-plate store, with a one-volume LRU cache
(``replay_camera.py:293-308``) and timepoint wrap-around so a replay
plan can run longer than the source recording. The simulated stage
offset (``offset_px_zyx``) rolls the served volume — the seam that lets
tracking corrections visibly re-center a drifting sample in demo mode
(the reference tracks the z-stage the same way, ``:400-438``).
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from shrimpy_tpu.io import ngff


class ReplaySource:
    """Volume server over an OME-Zarr store (FOV or HCS plate)."""

    def __init__(self, path: str | Path):
        self.store = ngff.open_ngff(path)
        self.positions = self.store.positions()
        first = next(iter(self.positions.values()))
        self.shape_tczyx = first.shape
        self.channel_names = first.channel_names or [
            str(i) for i in range(self.shape_tczyx[1])
        ]
        self.zyx_scale = first.zyx_scale
        self._cache_key: tuple | None = None
        self._cache_vol: np.ndarray | None = None

    @property
    def position_keys(self) -> list[str]:
        return list(self.positions)

    @property
    def n_timepoints(self) -> int:
        return self.shape_tczyx[0]

    def channel_index(self, name: str) -> int:
        return self.channel_names.index(name)

    def volume(
        self,
        position: str,
        t: int,
        c: int,
        *,
        offset_px_zyx: tuple[int, int, int] = (0, 0, 0),
    ) -> np.ndarray:
        """One ZYX volume; ``t`` wraps modulo the source depth.

        ``offset_px_zyx`` simulates the stage offset: the volume is
        rolled by minus the offset (the FOV follows the stage).
        """
        key = (position, t % self.n_timepoints, c)
        if key != self._cache_key:
            pos = self.positions[position]
            self._cache_vol = np.asarray(pos.volume(key[1], c))
            self._cache_key = key
        vol = self._cache_vol
        if any(offset_px_zyx):
            vol = np.roll(
                vol, tuple(-int(round(o)) for o in offset_px_zyx), axis=(0, 1, 2)
            )
        return vol

    def frame(
        self,
        position: str,
        t: int,
        c: int,
        z: int,
        *,
        offset_px_zyx: tuple[int, int, int] = (0, 0, 0),
    ) -> np.ndarray:
        """A single YX plane (snap path, ``replay_camera.py:310-334``)."""
        vol = self.volume(position, t, c, offset_px_zyx=offset_px_zyx)
        return vol[int(np.clip(z, 0, vol.shape[0] - 1))]
