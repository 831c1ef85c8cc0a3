"""Neural models: virtual staining (named architectures + training)."""

from shrimpy_tpu.models.vsunet import (  # noqa: F401
    VirtualStainer,
    VSModelSettings,
    VSUNet,
    VSUNeXt2,
    build_model,
)
