"""Streaming reconstruction runtime: OME-Zarr in -> TPU -> OME-Zarr out."""

from shrimpy_tpu.runtime.stream import (  # noqa: F401
    WorkItem,
    plan_work,
    reconstruct_store,
)
