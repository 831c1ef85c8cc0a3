"""Neural models: virtual staining UNet."""

from shrimpy_tpu.models.vsunet import (  # noqa: F401
    VSUNet,
    VirtualStainer,
    VSModelSettings,
)
