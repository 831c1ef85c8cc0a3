from shrimpy_tpu.ops.deskew import (
    deskew_affine_matrix,
    deskew_volume,
    get_deskewed_shape,
)
from shrimpy_tpu.ops.pcc import phase_cross_correlation

__all__ = [
    "deskew_affine_matrix",
    "deskew_volume",
    "get_deskewed_shape",
    "phase_cross_correlation",
]
