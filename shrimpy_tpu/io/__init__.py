from shrimpy_tpu.io.ngff import (
    NgffPosition,
    NgffStore,
    create_fov,
    create_hcs,
    open_ngff,
)
from shrimpy_tpu.io.synthetic import (
    coordinate_encoded_plate,
    coordinate_encoded_value,
    synthetic_blob_fov,
    synthetic_ls_stack,
)

__all__ = [
    "NgffPosition",
    "NgffStore",
    "coordinate_encoded_plate",
    "coordinate_encoded_value",
    "create_fov",
    "create_hcs",
    "open_ngff",
    "synthetic_blob_fov",
    "synthetic_ls_stack",
]
