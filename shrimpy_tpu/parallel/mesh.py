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


def init_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Multi-host initialization (DCN) for pod-scale plates.

    Call once per host before :func:`make_mesh`; with no arguments JAX
    auto-detects the cluster environment (TPU pod metadata). Positions
    and timepoints then shard across all hosts' devices — the pod-scale
    version of the reference's SLURM fan-out over positions
    (reference ``docs/data_structure.md:63-66``).
    """
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def make_mesh(
    n_devices: int | None = None, *, space: int = 1, devices=None
) -> Mesh:
    """A ``(batch, space)`` mesh over the first ``n_devices`` devices.

    ``space=1`` (default) gives pure volume-parallelism; ``space>1``
    additionally shards each volume's X axis across ``space`` chips.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices) if n_devices is None else n_devices
    if n < 1:
        # `or` would make 0 silently mean 'all devices' and a negative
        # value would slice/reshape into a smaller mesh with no error.
        raise ValueError(f"n_devices must be >= 1, got {n}")
    if n > len(devices):
        raise ValueError(f"requested {n} devices, have {len(devices)}")
    if space < 1:
        raise ValueError(f"space must be >= 1, got {space}")
    if n % space:
        raise ValueError(f"n_devices={n} not divisible by space={space}")
    grid = np.array(devices[:n]).reshape(n // space, space)
    return Mesh(grid, ("batch", "space"))
