"""Device meshes for the reconstruction pipeline.

The reference has no multi-device collectives — its parallel axes are
positions x timepoints x channels (embarrassingly parallel volumes) plus
process-level parallelism (SURVEY.md §2.9/5.7, reference
``docs/data_structure.md:63-66`` HPC sbatch fan-out). On TPU those axes
map onto a 2-D ``(batch, space)`` mesh:

* ``batch`` — independent (position, timepoint, channel) volumes, the
  "data parallel" axis; no collectives cross it.
* ``space`` — optional sharding of each volume's X axis for volumes
  whose working set exceeds one chip's HBM; the deskew resample is
  pointwise in X so it stays local, while the FFT stages (RL, phase)
  ride XLA's collective FFT over ICI.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(
    n_devices: int | None = None, *, space: int = 1, devices=None
) -> Mesh:
    """A ``(batch, space)`` mesh over the first ``n_devices`` devices.

    ``space=1`` (default) gives pure volume-parallelism; ``space>1``
    additionally shards each volume's X axis across ``space`` chips.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = n_devices or len(devices)
    if n > len(devices):
        raise ValueError(f"requested {n} devices, have {len(devices)}")
    if n % space:
        raise ValueError(f"n_devices={n} not divisible by space={space}")
    grid = np.array(devices[:n]).reshape(n // space, space)
    return Mesh(grid, ("batch", "space"))
