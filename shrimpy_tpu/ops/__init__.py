from shrimpy_tpu.ops.deconv import (
    richardson_lucy,
    richardson_lucy_reference,
    richardson_lucy_reference_separable,
    separable_decompose,
)
from shrimpy_tpu.ops.deskew import (
    deskew_affine_matrix,
    deskew_volume,
    get_deskewed_shape,
)
from shrimpy_tpu.ops.deskew_pallas import deskew_volume_pallas
from shrimpy_tpu.ops.features import (
    binary_mask,
    center_of_mass,
    gaussian_blur,
    histogram_percentile,
    multi_otsu,
    otsu_component_mask,
)
from shrimpy_tpu.ops.dft import cdft, irdft2, irdft3, rdft2, rdft3
from shrimpy_tpu.ops.pcc import phase_cross_correlation
from shrimpy_tpu.ops.phase import (
    apply_inverse_transfer_function,
    compute_transfer_function,
    reconstruct_phase,
)
from shrimpy_tpu.ops.register import affine_apply, estimate_registration

__all__ = [
    "affine_apply",
    "apply_inverse_transfer_function",
    "binary_mask",
    "cdft",
    "center_of_mass",
    "compute_transfer_function",
    "irdft2",
    "irdft3",
    "rdft2",
    "rdft3",
    "deskew_affine_matrix",
    "deskew_volume",
    "deskew_volume_pallas",
    "estimate_registration",
    "gaussian_blur",
    "get_deskewed_shape",
    "histogram_percentile",
    "multi_otsu",
    "otsu_component_mask",
    "phase_cross_correlation",
    "reconstruct_phase",
    "richardson_lucy",
    "richardson_lucy_reference",
    "richardson_lucy_reference_separable",
    "separable_decompose",
]
