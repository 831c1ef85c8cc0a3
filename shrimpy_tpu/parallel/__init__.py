"""Device-mesh sharding of the reconstruction pipeline."""

from shrimpy_tpu.parallel.mesh import make_mesh  # noqa: F401
from shrimpy_tpu.parallel.pipeline import (  # noqa: F401
    build_reconstruct_step,
    reconstruct_batch,
)
