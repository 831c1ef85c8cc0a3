from shrimpy_tpu.utils.fft import (
    center_crop,
    match_shape,
    next_fast_len,
    pad_to_shape,
)
from shrimpy_tpu.utils.timing import StageTimer, memory_report, stage_timer

__all__ = [
    "StageTimer",
    "center_crop",
    "match_shape",
    "memory_report",
    "next_fast_len",
    "pad_to_shape",
    "stage_timer",
]
